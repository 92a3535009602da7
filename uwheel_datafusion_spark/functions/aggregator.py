"""User-extensible aggregator protocol (SURVEY §1.3 / §2.10).

uwheel's compile-time ``Aggregator`` trait is lift / combine / lower:
lift a raw value into a partial, combine partials associatively, lower
a partial to the final aggregate. The reference only instantiates
``F64SumAggregator`` (/root/reference/src/main.rs:15,99); uwheel ships
sum/min/max/avg/all. Our built-ins cover those via the rollup schema —
this module is the extension point for aggregates the built-ins can't
express (sum of squares for variance, logical any/all, custom sketches).

Spark-idiomatic split of the three roles:

- **lift + in-slot combine** = a Spark aggregate *expression* evaluated
  per time slot by the distributed rollup build (stays JVM-side, one
  shuffle, map-side partial aggregation — never a Python UDF);
- **cross-slot combine + lower** = plain Python over the ≤ n_slots
  partial rows a range decomposition touches (driver-side, same place
  µWheel folds its wheel slots).

So a custom aggregator scales exactly like the built-in wheel: the
raw-data pass is distributed, the per-query fold touches pre-aggregated
slots only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import MINUTE_MS, bucket_ms, ts_to_ms


@dataclass(frozen=True)
class PyAggregator:
    """lift/combine/lower over minute slots.

    slot_expr:  Spark aggregate Column computing the slot partial from
                raw values (the distributed lift + in-slot combine).
    combine:    associative Python fn over slot partials.
    lower:      partial -> final aggregate.
    identity:   combine identity; an all-identity fold lowers to None
                (the ``Option`` contract of combine_range_and_lower,
                /root/reference/src/main.rs:212).
    """

    name: str
    slot_expr: Column
    combine: Callable[[Any, Any], Any]
    lower: Callable[[Any], Any]
    identity: Any


def build_custom_rollup(
    df: DataFrame, ts_col: str, agg: PyAggregator, watermark_ms: int, advanced_ms: int
) -> DataFrame:
    """Minute rollup of the custom partial: one scan + one shuffle,
    identical plan shape to WheelIndex.build's built-in rollup."""
    ms = ts_to_ms(ts_col)
    return (
        df.filter((ms >= watermark_ms) & (ms < advanced_ms))
        .groupBy(bucket_ms(ms, MINUTE_MS).alias("bucket_ms"))
        .agg(agg.slot_expr.alias("partial"))
    )


class CustomSlotIndex:
    """Driver-resident custom-aggregate wheel: dict of minute-slot
    partials, folded per query (O(slots-in-range); use the prefix-sum
    DriverWheelIndex for the invertible built-ins)."""

    def __init__(self, rollup: DataFrame, agg: PyAggregator) -> None:
        self.agg = agg
        self._slots = {r["bucket_ms"]: r["partial"] for r in rollup.collect()}

    def query(self, start_ms: int, end_ms: int):
        if start_ms % MINUTE_MS or end_ms % MINUTE_MS:
            raise ValueError("custom index requires minute-aligned endpoints")
        acc, hit = self.agg.identity, False
        for b in range(start_ms, end_ms, MINUTE_MS):
            p = self._slots.get(b)
            if p is not None:
                acc = self.agg.combine(acc, p)
                hit = True
        return self.agg.lower(acc) if hit else None


def sum_of_squares_aggregator(value_col: str) -> PyAggregator:
    """Example custom aggregator (enables E[x²]-style variance):
    exact scaled-long sum of squares — not expressible from the
    built-in (sum, cnt, min, max) rollup schema."""
    c = F.col(value_col)
    scaled = F.round(c * c * 1_000_000).cast("long")
    return PyAggregator(
        name="sum_sq",
        slot_expr=F.sum(scaled),
        combine=lambda a, b: a + b,
        lower=lambda p: float(p) / 1_000_000,
        identity=0,
    )
