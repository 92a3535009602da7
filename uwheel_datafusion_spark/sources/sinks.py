"""Training-shard sink: partitioned, shard-controlled parquet writes.

The reference writes nothing (results are consumed in-process —
SURVEY §2.1 "Sinks: ABSENT"); this module is the engine's output side
for the training-data north star. Two scale concerns drive the shape:

- **Partition by split**, so downstream training jobs reading one
  split prune the other partitions at the directory level (verified by
  `PartitionFilters` in the reader's scan).
- **Bounded shard count & size**: `repartition(n_shards, split, h)`
  with a deterministic hash of the document key gives ≤ n_shards files
  per split of roughly even size — avoiding both the tiny-files
  problem (one file per task) and single-giant-file stragglers. The
  hash reuses operators.sampling's portable mix, so shard membership
  is reproducible run-to-run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators.sampling import hash_bucket_sql


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    split_col: str = "split",
    n_shards: int = 8,
) -> None:
    """Write ``df`` as parquet partitioned by ``split_col`` with at
    most ``n_shards`` files per split."""
    shard = F.expr(hash_bucket_sql(key_col, n_shards)).alias("_shard")
    (
        df.repartition(n_shards, F.col(split_col), shard)
        .write.partitionBy(split_col)
        .mode("overwrite")
        .parquet(path)
    )


def read_split(spark: SparkSession, path: str, split: str) -> DataFrame:
    """Read one split; the equality filter on the partition column
    prunes the other split directories at planning time."""
    return spark.read.parquet(path).filter(F.col("split") == split)


def shard_files(path: str, split: str) -> list[str]:
    d = os.path.join(path, f"split={split}")
    if not os.path.isdir(d):
        return []
    return [f for f in os.listdir(d) if f.endswith(".parquet")]
