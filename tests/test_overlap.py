"""Interval-overlap join (operators/overlap): the gate is oracle-
checked; here we pin the corner semantics the oracle's data may not
exercise — touching-but-not-overlapping exclusion, exactly-once
emission for pairs spanning many shared bins, the keyed variant, and
the no-nested-loop plan property."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators.overlap import interval_overlap_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_micro_semantics_exactly_once(spark):
    left = _mk(
        spark,
        [
            (1, 0, 10_000),        # overlaps r1 (one shared bin)
            (2, 0, 100_000),       # long: spans many bins; overlaps r2
            (3, 20_000, 30_000),   # touches r3 end-to-start: NOT a pair
            (4, 50_000, 50_001),   # 1ms span inside r2
        ],
        "lid long, s long, e long",
    )
    right = _mk(
        spark,
        [
            (101, 5_000, 8_000),
            (102, 40_000, 90_000),
            (103, 30_000, 35_000),
        ],
        "rid long, ws long, we long",
    )
    got = sorted(
        (r["lid"], r["rid"], r["overlap_ms"])
        for r in interval_overlap_join(
            left, right, "s", "e", "ws", "we", bin_ms=1_000
        ).collect()
    )
    # pair (2,102) shares 50 one-second bins — must appear ONCE
    assert got == [
        (1, 101, 3_000),
        (2, 101, 3_000),
        (2, 102, 50_000),
        (2, 103, 5_000),
        (4, 102, 1),
    ]


def test_keyed_variant_restricts_pairs(spark):
    left = _mk(
        spark,
        [("a", 0, 10), ("b", 0, 10)],
        "k string, s long, e long",
    )
    right = _mk(
        spark,
        [("a", 5, 15), ("c", 5, 15)],
        "k string, ws long, we long",
    )
    got = [
        (r["k"], r["overlap_ms"])
        for r in interval_overlap_join(
            left, right, "s", "e", "ws", "we", bin_ms=10, on="k"
        ).collect()
    ]
    assert got == [("a", 5)]


def test_plans_as_hash_join_not_nested_loop(spark):
    left = _mk(spark, [(1, 0, 10_000)], "lid long, s long, e long")
    right = _mk(spark, [(2, 0, 10_000)], "rid long, ws long, we long")
    plan = (
        interval_overlap_join(left, right, "s", "e", "ws", "we", bin_ms=1_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_empty_and_inverted_intervals_dropped(spark):
    left = _mk(
        spark,
        [(1, 10, 10), (2, 20, 5)],  # empty and inverted
        "lid long, s long, e long",
    )
    right = _mk(spark, [(9, 0, 100)], "rid long, ws long, we long")
    assert (
        interval_overlap_join(
            left, right, "s", "e", "ws", "we", bin_ms=10
        ).count()
        == 0
    )
