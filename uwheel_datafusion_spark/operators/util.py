"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Give downstream map-heavy stages at least one partition per
    core. A small table arrives as ONE parquet file → one task, and
    expensive per-row expressions (md5-chain minhash, quantized dot
    products) serialize on a single core — a 32× slowdown observed at
    sf0.1. At 100 TB the scan already yields thousands of partitions,
    so the branch never fires and no shuffle is added. The repartition
    hashes on ``key`` so co-keyed downstream joins can reuse it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df
