"""Funnel + cohort retention (operators/funnel, operators/retention):
the gate queries are oracle-checked against DuckDB; here we pin the
greedy-chain semantics on a crafted micro-fixture (boundary inclusion,
stall, pre-stage events ignored) and the retention matrix invariants
the oracle equality can't articulate (density, bounds, cohort
partition)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import DAY_MS, to_epoch_ms
from uwheel_datafusion_spark.operators.funnel import funnel_counts_df
from uwheel_datafusion_spark.operators.retention import cohort_retention_df
from uwheel_datafusion_spark.sources.registry import load_table

T0 = datetime(2024, 1, 10)


def _mk_events(spark, rows):
    """rows: (user, step, seconds_after_T0)"""
    data = [
        (u, s, T0 + timedelta(seconds=sec)) for (u, s, sec) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_greedy_micro_semantics(spark):
    W = 15_000  # 15 s window
    ev = _mk_events(
        spark,
        [
            # u1: clean chain inside windows
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            # u2: click outside the window -> stalls at stage 1
            (2, "view", 0), (2, "click", 100),
            # u3: purchase BEFORE the click must not count; later one does
            (3, "view", 0), (3, "purchase", 5), (3, "click", 10),
            (3, "purchase", 12),
            # u4: both steps exactly at the window edge (<= is inclusive)
            (4, "view", 0), (4, "click", 15), (4, "purchase", 30),
            # u5: click strictly-after is required (same ts as view fails)
            (5, "view", 0), (5, "click", 0),
        ],
    )
    s_ms = to_epoch_ms(T0) - 1000
    e_ms = to_epoch_ms(T0) + 1_000_000
    got = {
        r["stage"]: r["n_keys"]
        for r in funnel_counts_df(
            ev, "ts", "user_id", "event_type",
            ["view", "click", "purchase"], W, s_ms, e_ms,
        ).collect()
    }
    # stage1: u1..u5 all viewed; stage2: u1,u3,u4; stage3: u1,u3,u4
    assert got == {1: 5, 2: 3, 3: 3}


def test_funnel_monotone_on_fixture(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    s_ms = to_epoch_ms(datetime(2024, 1, 1))
    e_ms = to_epoch_ms(datetime(2024, 2, 1))
    rows = {
        r["stage"]: r["n_keys"]
        for r in funnel_counts_df(
            ev, "ts", "user_id", "event_type",
            ["view", "click", "purchase"], 30 * 60_000, s_ms, e_ms,
        ).collect()
    }
    assert rows[1] >= rows[2] >= rows[3] >= 0 and rows[1] > 0


def test_retention_matrix_invariants(spark, sf_correctness):
    from uwheel_datafusion_spark.functions.time import (
        bucket_ms,
        ts_range_pred,
        ts_to_ms,
    )

    ev = load_table(spark, sf_correctness, "events")
    s_ms = to_epoch_ms(datetime(2024, 1, 1))
    e_ms = to_epoch_ms(datetime(2024, 2, 1))
    day_pairs = (
        ev.filter(ts_range_pred(ev, "ts", s_ms, e_ms))
        .select(
            bucket_ms(ts_to_ms(F.col("ts")), DAY_MS).alias("bucket_ms"),
            F.col("user_id").alias("key"),
        )
        .distinct()
    )
    offsets = [1, 7, 14]
    m = cohort_retention_df(day_pairs, offsets).collect()
    cohorts = {r["cohort_ms"] for r in m}
    # dense grid: every cohort × offset present exactly once
    assert len(m) == len(cohorts) * len(offsets)
    # bounds: 0 ≤ retained ≤ cohort size
    assert all(0 <= r["n_retained"] <= r["n_cohort"] for r in m)
    # cohort sizes partition the distinct-user universe
    total_users = day_pairs.select("key").distinct().count()
    per_cohort = {r["cohort_ms"]: r["n_cohort"] for r in m}
    assert sum(per_cohort.values()) == total_users
