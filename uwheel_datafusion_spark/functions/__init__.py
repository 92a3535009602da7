from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    bucket_ms,
    ms_to_ts_literal,
    to_epoch_ms,
    ts_to_ms,
)
from uwheel_datafusion_spark.functions.quant import (
    QUANT_SCALE,
    micros_to_value,
    value_to_micros,
)

__all__ = [
    "DAY_MS",
    "HOUR_MS",
    "MINUTE_MS",
    "QUANT_SCALE",
    "bucket_ms",
    "micros_to_value",
    "ms_to_ts_literal",
    "to_epoch_ms",
    "ts_to_ms",
    "value_to_micros",
]
