"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FileSystem
    API — the check every index sidecar (tombstones, stats partials)
    must use instead of driver-local ``os.path``: on HDFS/S3 (the
    100 TB deployment target) ``os.path.isdir`` is ALWAYS false, so a
    local-only check silently resurrects deleted rows (right-to-
    erasure leak — ADVICE r9). Resolves ``path`` against the session's
    Hadoop configuration, so file:/, hdfs://, s3a:// all behave
    identically to what ``spark.read`` itself would see."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


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
