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
from uwheel_datafusion_spark.functions.time import (
    MINUTE_MS,
    ts_range_pred,
    ts_to_ms,
)
from uwheel_datafusion_spark.operators.driver_index import DriverWheelIndex
from uwheel_datafusion_spark.operators.wheel import bucket_ms

#: hot-serving ceiling: collecting the (key × minute) rollup to the
#: driver is only sane for dashboard-cardinality keys. Above this the
#: build refuses and callers use the distributed rollup instead
#: (``build_rollup`` + ``query_rollup_df``), which never collects.
MAX_HOT_KEYS = 10_000


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

    @staticmethod
    def build_rollup(
        df: DataFrame,
        key_col: str,
        ts_col: str,
        value_col: str,
        watermark_ms: int,
        advance_to_ms: int,
    ) -> DataFrame:
        """The distributed (key, minute-bucket) rollup — ONE shuffle,
        map-side partials; safe at any key cardinality (never collects).
        The horizon predicate stays on the timestamp column itself so
        it reaches parquet row-group stats."""
        ms = ts_to_ms(F.col(ts_col))
        return (
            df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
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

    @classmethod
    def build(
        cls,
        df: DataFrame,
        key_col: str,
        ts_col: str,
        value_col: str,
        watermark_ms: int,
        advance_to_ms: int,
        max_keys: int = MAX_HOT_KEYS,
    ) -> "KeyedWheelIndex":
        rollup = cls.build_rollup(
            df, key_col, ts_col, value_col, watermark_ms, advance_to_ms
        )
        # two actions follow (cardinality guard, collect) — persist so
        # the distributed rollup job runs once, not twice
        rollup.persist()
        try:
            # guard BEFORE collecting: a high-cardinality key would OOM
            # the driver. countDistinct over the rollup is cheap (rollup
            # rows, not fact rows).
            n_keys = rollup.select(F.countDistinct("key")).first()[0]
            if n_keys > max_keys:
                raise ValueError(
                    f"{n_keys} distinct keys exceeds the hot-serving cap "
                    f"({max_keys}); use build_rollup() + query_rollup_df() "
                    f"(distributed, collect-free) for high-cardinality keys"
                )
            by_key: dict = {}
            for r in rollup.collect():
                by_key.setdefault(r["key"], []).append(r)
        finally:
            rollup.unpersist()
        indexes = {
            k: DriverWheelIndex.from_minute_rows(rows, watermark_ms, advance_to_ms)
            for k, rows in by_key.items()
        }
        return cls(indexes, watermark_ms, advance_to_ms)

    @staticmethod
    def gapfill_rollup_df(
        rollup: DataFrame,
        watermark_ms: int,
        advance_to_ms: int,
        granularity_ms: int = 3_600_000,
    ) -> DataFrame:
        """Per-key gap-filled rollup + LOCF — TimescaleDB's
        ``time_bucket_gapfill`` + ``locf`` over EVERY series at once:
        one row per (key, slot) across the horizon, empty slots cnt=0
        with the key's last seen sum carried forward.

        Scale shape: densification is an ``explode(sequence)`` fan-out
        from the distinct-key frame — map-side row generation, NOT a
        cross join (no BroadcastNestedLoopJoin); then one equi-join on
        (key, bucket) against the re-aggregated rollup and one LOCF
        window partitioned by key. Output is |keys| × slots rows —
        bounded by the horizon, not the fact table."""
        from pyspark.sql import Window

        from uwheel_datafusion_spark.functions.quant import micros_to_value

        n = (advance_to_ms - watermark_ms) // granularity_ms
        agg = (
            rollup.groupBy(
                "key", bucket_ms(F.col("bucket_ms"), granularity_ms).alias("bucket_ms")
            )
            .agg(
                F.sum("sum_micros").alias("sum_micros"),
                F.sum("cnt").alias("cnt"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(
                "key",
                "bucket_ms",
                micros_to_value(F.col("sum_micros")).alias("sum_value"),
                "cnt",
                "min_value",
                "max_value",
            )
        )
        dense = (
            rollup.select("key")
            .distinct()
            .select(
                "key",
                F.explode(F.sequence(F.lit(0), F.lit(int(n - 1)))).alias("i"),
            )
            .select(
                "key",
                (
                    F.lit(watermark_ms)
                    + F.col("i").cast("long") * F.lit(granularity_ms).cast("long")
                ).alias("bucket_ms"),
            )
        )
        filled = dense.join(agg, ["key", "bucket_ms"], "left")
        w = (
            Window.partitionBy("key")
            .orderBy("bucket_ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return filled.select(
            "key",
            "bucket_ms",
            "sum_value",
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
            "min_value",
            "max_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_locf"),
        )

    #: key-hash partition fanout of the persisted rollup. CRC32 because
    #: Spark's crc32() and Python's zlib.crc32 implement the same
    #: standard polynomial, so the probe can compute its partition
    #: driver-side without a Spark job.
    N_KEY_BUCKETS = 64

    @staticmethod
    def _key_bucket(key) -> int:
        import zlib

        return zlib.crc32(str(key).encode("utf-8")) % KeyedWheelIndex.N_KEY_BUCKETS

    @staticmethod
    def save_rollup_parquet(rollup: DataFrame, path: str) -> None:
        """Persist a ``build_rollup`` frame partitioned by (key-hash
        bucket, UTC date) — the on-disk layout the module docstring
        promises: a (key, bucket range) probe statically prunes to ONE
        key partition × the touched days, so file listing is
        O(days-touched), not O(|keys| × days), at any cardinality."""
        (
            rollup.withColumn(
                "kb",
                F.crc32(F.col("key").cast("string").cast("binary"))
                % F.lit(KeyedWheelIndex.N_KEY_BUCKETS),
            )
            .withColumn(
                "dt",
                F.date_format(
                    F.timestamp_millis(F.col("bucket_ms")), "yyyy-MM-dd"
                ),
            )
            .repartition("kb", "dt")
            .write.mode("overwrite")
            .partitionBy("kb", "dt")
            .parquet(path)
        )

    @staticmethod
    def load_rollup_parquet(spark, path: str) -> DataFrame:
        """Reopen a persisted keyed rollup; the kb/dt partition columns
        are KEPT so query_rollup_df's static predicates prune at
        planning time."""
        return spark.read.parquet(path)

    @staticmethod
    def query_rollup_df(
        rollup: DataFrame, key, start_ms: int, end_ms: int
    ) -> DataFrame:
        """Distributed per-key range aggregate over a ``build_rollup``
        frame — the high-cardinality serving path: a (key, bucket range)
        probe that prunes to one key's slots, no driver state. On a
        reopened (kb/dt-partitioned) rollup the probe conjoins the
        STATIC key-bucket and day-range predicates, so Catalyst prunes
        partitions at planning time."""
        from uwheel_datafusion_spark.functions.quant import micros_to_value
        from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

        pred = (F.col("key") == key) & _bucket_range_pred(
            rollup, start_ms, end_ms
        )
        if "kb" in rollup.columns:
            pred = pred & (F.col("kb") == KeyedWheelIndex._key_bucket(key))
        return (
            rollup.filter(pred)
            .agg(
                F.sum("sum_micros").alias("_sum_micros"),
                # empty range ⇒ cnt 0 (not NULL), matching the
                # DriverWheelIndex serving path's query_count contract;
                # value aggregates stay NULL ≙ its None lowering
                F.coalesce(F.sum("cnt"), F.lit(0).cast("long")).alias("cnt"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(
                micros_to_value(F.col("_sum_micros")).alias("sum_value"),
                "cnt",
                "min_value",
                "max_value",
                # avg on the scaled-long sum: deterministic vs the oracle
                (
                    F.col("_sum_micros").cast("double")
                    / F.col("cnt").cast("double")
                    / 1_000_000
                ).alias("avg_value"),
            )
        )

    @staticmethod
    def query_rollup_grouped_df(
        rollup: DataFrame, start_ms: int, end_ms: int
    ) -> DataFrame:
        """Distributed range aggregate for EVERY series at once — the
        collect-free serving path the ``MAX_HOT_KEYS`` guard points
        high-cardinality callers to: one bucket-range filter (partition
        prunable on a persisted rollup) + one groupBy over rollup rows
        (bounded by |keys| × slots-in-range, never fact rows). Output:
        ``(key, sum_value, cnt, min_value, max_value, avg_value)``, one
        row per series with data in [start, end)."""
        from uwheel_datafusion_spark.functions.quant import micros_to_value
        from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

        return (
            rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
            .groupBy("key")
            .agg(
                F.sum("sum_micros").alias("_sum_micros"),
                F.sum("cnt").alias("cnt"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(
                "key",
                micros_to_value(F.col("_sum_micros")).alias("sum_value"),
                "cnt",
                "min_value",
                "max_value",
                (
                    F.col("_sum_micros").cast("double")
                    / F.col("cnt").cast("double")
                    / 1_000_000
                ).alias("avg_value"),
            )
        )

    @staticmethod
    def query_rollup_batch_df(
        rollup: DataFrame, probes: "list[tuple]"
    ) -> DataFrame:
        """Micro-batched keyed serving: N ``(key, start_ms, end_ms)``
        probes answered in ONE Spark job — the keyed twin of
        WheelIndex.range_agg_batch_df (per-query jobs pay a flat
        ~50-100 ms scheduler cost; a serving tier batches the
        concurrent stream instead). The probe frame broadcasts and
        joins on key EQUALITY (hash join — the key is selective, no
        block trick needed) plus bucket containment; one fold per
        query_id. Returns one row per probe in input order:
        ``(query_id, sum_value, cnt, min_value, max_value, avg_value)``
        with nulls/0 for keys or ranges with no data."""
        from pyspark.sql.types import (
            LongType,
            StructField,
            StructType,
            IntegerType,
        )

        from uwheel_datafusion_spark.functions.quant import micros_to_value

        spark = rollup.sparkSession
        # probe key column typed from the ROLLUP's key (string-only
        # probes would crash for integer series keys)
        key_type = rollup.schema["key"].dataType
        schema = StructType(
            [
                StructField("query_id", IntegerType()),
                StructField("pkey", key_type),
                StructField("run_s", LongType()),
                StructField("run_e", LongType()),
            ]
        )
        pdf = spark.createDataFrame(
            [(i, k, s, e) for i, (k, s, e) in enumerate(probes)], schema
        )
        qids = pdf.select("query_id")
        joined = rollup.join(
            F.broadcast(pdf),
            (rollup["key"] == pdf["pkey"])
            & (rollup["bucket_ms"] >= pdf["run_s"])
            & (rollup["bucket_ms"] < pdf["run_e"]),
        )
        agg = joined.groupBy("query_id").agg(
            F.sum("sum_micros").alias("_sum_micros"),
            F.sum("cnt").alias("cnt"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        # orderBy makes the documented input-order contract REAL (the
        # left join's output order is partitioning-dependent; caught by
        # the sf100 scale run's dual check)
        return (
            qids.join(agg, "query_id", "left")
            .select(
                "query_id",
                micros_to_value(F.col("_sum_micros")).alias("sum_value"),
                F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
                "min_value",
                "max_value",
                (
                    F.col("_sum_micros").cast("double")
                    / F.col("cnt").cast("double")
                    / 1_000_000
                ).alias("avg_value"),
            )
            .orderBy("query_id")
        )

    def keys(self) -> list:
        return sorted(self._indexes)

    def index(self, key) -> DriverWheelIndex | None:
        return self._indexes.get(key)

    def query_all(self, key, start_ms: int, end_ms: int) -> dict | None:
        idx = self._indexes.get(key)
        return None if idx is None else idx.query_all(start_ms, end_ms)

    def size_bytes(self) -> int:
        return sum(i.size_bytes() for i in self._indexes.values())
