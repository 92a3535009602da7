"""Bucketed (co-located) tables — the shuffle-free fact ⋈ fact layout.

At 100 TB the dominant cost of a fact-to-fact equi-join
(lineitem ⋈ orders on the order key) is the pairwise shuffle of both
sides. Spark's answer is BUCKETING: persist each table hash-
partitioned by the join key into N buckets (`bucketBy` + optional
in-bucket `sortBy` → `saveAsTable`); a later join on the bucket key
reads matching buckets task-for-task — NO Exchange on either side
(SortMergeJoin over pre-bucketed scans, plus bucket pruning on
key-equality filters). This is the Spark equivalent of the co-located
join every warehouse (Hive, Presto/Trino bucketed tables) relies on,
and the layout the repo's join audits (PLANS.md) repeatedly name as
the 100 TB fix — here made concrete and plan-verified
(tests/test_bucketing.py asserts the Exchange-free plan).

Production notes encoded in the helper contract:
- both sides must agree on bucket count AND key (mismatch → Spark
  shuffles the smaller-bucketed side; still correct, half the win);
- bucket files are per (task, bucket) — write with ONE shuffle
  (`repartition(key)`) so each bucket is a single file per partition,
  not tasks × buckets small files;
- `spark.sql.sources.bucketing.enabled` (default true) must be on for
  the reader to exploit the layout; `bucketing.autoBucketedScan` may
  disable it when no join benefits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet). One
    repartition by the bucket key keeps file counts at one file per
    (partition, bucket) instead of tasks × buckets."""
    w = (
        df.repartition(num_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: plans with
    zero Exchange operators when both sides were written by
    write_bucketed_table with the same (key, num_buckets)."""
    return spark.table(left_table).join(spark.table(right_table), on)
