"""Keyed wheel index — hypertable-style continuous aggregate.

The reference wheel is single-series (`RwWheel<F64SumAggregator>` over
one measure, /root/reference/src/main.rs:99-103). Real time-series
workloads shard the same index by a dimension key (TimescaleDB's
continuous aggregates, InfluxDB series): ONE distributed rollup on
(key, minute-bucket) — exactly one shuffle, map-side partials — then a
per-key O(1) driver index serves `query(key, start, end)` at the same
µs latency class as the unkeyed wheel.

Scale contract:
- the rollup is bounded by |keys| × horizon-minutes, not corpus rows;
- the collected hot-serving dict is the LOW-CARDINALITY path (an ops
  dashboard's handful of series). For high-cardinality keys, keep the
  same rollup distributed and filter on (key, bucket range) — the
  rollup parquet is partitioned by key prefix so probes prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import value_to_micros
from uwheel_datafusion_spark.functions.time import MINUTE_MS, ts_to_ms
from uwheel_datafusion_spark.operators.driver_index import DriverWheelIndex
from uwheel_datafusion_spark.operators.wheel import bucket_ms


class KeyedWheelIndex:
    """dict of per-key DriverWheelIndex, built in one distributed pass."""

    def __init__(
        self,
        indexes: dict,
        watermark_ms: int,
        advanced_ms: int,
    ) -> None:
        self._indexes = indexes
        self.watermark_ms = watermark_ms
        self.advanced_ms = advanced_ms

    @classmethod
    def build(
        cls,
        df: DataFrame,
        key_col: str,
        ts_col: str,
        value_col: str,
        watermark_ms: int,
        advance_to_ms: int,
    ) -> "KeyedWheelIndex":
        from pyspark.sql.types import LongType

        if isinstance(df.schema[ts_col].dataType, LongType):
            # raw epoch-ns (TIMESTAMP(NANOS) parquet): predicates stay on
            # the raw column so the horizon filter reaches row-group
            # stats; exact integer `div` (ns exceeds double's 2^53)
            ms = F.expr(f"`{ts_col}` div 1000000")
            horizon = (F.col(ts_col) >= watermark_ms * 1_000_000) & (
                F.col(ts_col) < advance_to_ms * 1_000_000
            )
        else:
            ms = ts_to_ms(F.col(ts_col))
            horizon = (ms >= watermark_ms) & (ms < advance_to_ms)
        rollup = (
            df.filter(horizon)
            .select(
                F.col(key_col).alias("key"),
                bucket_ms(ms, MINUTE_MS).alias("bucket_ms"),
                value_to_micros(F.col(value_col).cast("double")).alias("v_micros"),
                F.col(value_col).cast("double").alias("value"),
            )
            .groupBy("key", "bucket_ms")
            .agg(
                F.sum("v_micros").alias("sum_micros"),
                F.count(F.lit(1)).alias("cnt"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )
        by_key: dict = {}
        for r in rollup.collect():
            by_key.setdefault(r["key"], []).append(r)
        indexes = {
            k: DriverWheelIndex.from_minute_rows(rows, watermark_ms, advance_to_ms)
            for k, rows in by_key.items()
        }
        return cls(indexes, watermark_ms, advance_to_ms)

    def keys(self) -> list:
        return sorted(self._indexes)

    def index(self, key) -> DriverWheelIndex | None:
        return self._indexes.get(key)

    def query_all(self, key, start_ms: int, end_ms: int) -> dict | None:
        idx = self._indexes.get(key)
        return None if idx is None else idx.query_all(start_ms, end_ms)

    def size_bytes(self) -> int:
        return sum(i.size_bytes() for i in self._indexes.values())
