"""plans/metrics: executed-plan observability. The numbers it returns
are the engine's own SQLMetrics, so the tests pin them against facts we
can compute independently (exact scan/filter row counts, shuffle record
counts == group cardinality, map-side combine visible as shuffle rows ≪
scan rows)."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.plans.metrics import profile
from uwheel_datafusion_spark.sources.registry import load_table


def test_scan_and_filter_row_metrics_exact(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    n_total = ev.count()
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    p = profile(
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert p.scan_rows() == n_total
    assert p.total("numOutputRows", node_contains="Filter") == n_clicks
    assert p.count_nodes("Exchange") == 1
    assert p.shuffle_bytes() > 0


def test_map_side_combine_shrinks_shuffle(spark, sf_correctness):
    """The partial aggregate means the exchange carries ≤ one row per
    (input partition, group), not one per input row — THE property that
    makes groupBy survive 100 TB, here read off the engine's metrics."""
    ev = load_table(spark, sf_correctness, "events")
    n_rows = ev.count()
    n_groups = ev.select("user_id").distinct().count()
    p = profile(ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")))
    shuffled = p.shuffle_records()
    assert 0 < shuffled < n_rows / 5
    assert shuffled >= n_groups  # at least one partial row per group


def test_broadcast_join_has_no_fact_exchange(spark, sf_correctness):
    """A dim⋈fact broadcast join shuffles NOTHING on the fact side —
    the only Exchange is the broadcast itself (a different node type)."""
    o = load_table(spark, sf_correctness, "orders")
    c = load_table(spark, sf_correctness, "customer")
    p = profile(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_name"
        )
    )
    assert p.count_nodes("BroadcastHashJoin") == 1
    # no shuffle exchange anywhere in the plan
    assert p.shuffle_records() == 0


def test_report_renders(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    p = profile(ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")))
    text = p.report()
    assert "Scan" in text and "Exchange" in text and "numOutputRows" in text
