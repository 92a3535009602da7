"""Bucketed co-located join (sources/bucketing): the 100 TB
fact ⋈ fact layout, plan-verified — the join over two same-bucketed
tables must contain NO Exchange (the whole point), agree with the
plain-join result, and prune buckets on key-equality filters."""

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.sources.bucketing import (
    colocated_join,
    write_bucketed_table,
)
from uwheel_datafusion_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    """orders + lineitem bucketed by order key into a tmp-located
    database (keeps spark-warehouse out of the repo)."""
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    lineitem = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(orders, "bucketdb.orders_b", "o_orderkey", 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bucketdb.lineitem_b",
        "o_orderkey",
        8,
    )
    yield "bucketdb.orders_b", "bucketdb.lineitem_b", orders, lineitem
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    """At smoke scale the planner prefers a broadcast join (bucketing
    'disabled by query planner' — broadcasting a few MB beats reading
    buckets task-aligned). The layout exists FOR the scale where no
    side fits in memory, so emulate it: with broadcast off, the join
    must plan as SortMergeJoin over the bucketed scans with ZERO
    Exchange on either side."""
    ot, lt, _, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_df = colocated_join(spark, ot, lt, "o_orderkey")
        plan = join_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        q = join_df.agg(F.sum("l_quantity").alias("q")).first()["q"]
        assert q is not None
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    ot, lt, orders, lineitem = bucketed_tables
    got = (
        colocated_join(spark, ot, lt, "o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
        .first()
    )
    want = (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
        .first()
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"]) and got["n"] > 0


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    """Key-equality filters prune to ONE bucket. autoBucketedScan
    normally drops the bucketed layout when it sees no join to
    exploit; pruning is a second, filter-side benefit, so pin it with
    the auto fallback off."""
    ot, _, orders, _ = bucketed_tables
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        some_key = orders.select("o_orderkey").first()["o_orderkey"]
        plan = (
            spark.table(ot)
            .filter(F.col("o_orderkey") == some_key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # bucketed scan reports how many of the 8 buckets survive
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(conf, prev)
