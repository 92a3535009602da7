"""Shared rollup persistence — ONE on-disk contract for every
mergeable-partial family (wheel 'all', distinct pairs/HLL, histogram
quantile, OHLC): parquet partitioned by UTC date of the slot start.

Any frame with a ``bucket_ms`` column qualifies. Serving probes that
filter with ``wheel._bucket_range_pred`` automatically conjoin static
``dt`` bounds on a reopened rollup, so range queries list
O(days-touched) partitions at any scale — the same layout/pruning
story WheelIndex.save pioneered, factored out so new aggregator
families inherit it instead of re-implementing it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_rollup(rollup: DataFrame, path: str) -> None:
    """Persist a rollup (any mergeable-partial frame keyed by
    ``bucket_ms``) as parquet partitioned by UTC date."""
    (
        rollup.withColumn(
            "dt",
            F.date_format(F.timestamp_millis(F.col("bucket_ms")), "yyyy-MM-dd"),
        )
        .repartition("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def load_rollup(spark, path: str) -> DataFrame:
    """Reopen a persisted rollup; the ``dt`` partition column is KEPT
    so ``_bucket_range_pred`` prunes day partitions at planning time."""
    return spark.read.parquet(path)
