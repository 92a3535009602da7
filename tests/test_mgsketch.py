"""Misra-Gries heavy-hitter sketch (operators/mgsketch): the verified
gate query is oracle-checked (test_oracle_parity); here we pin the
sketch-level invariants the gate can't see — the MG bound inequality,
per-slot size cap, served/upper sandwich vs exact counts, cascade
completeness (error budget doubles, answers stay exact), and the
structural guard refusing an unsound threshold/budget combination."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    to_epoch_ms,
    ts_range_pred,
)
from uwheel_datafusion_spark.operators.mgsketch import (
    build_mg_rollup,
    cascade_mg,
    range_heavy_hitters_verified,
    range_hh_candidates,
)
from uwheel_datafusion_spark.sources.registry import load_table

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
S, E = to_epoch_ms(datetime(2024, 1, 5)), to_epoch_ms(datetime(2024, 1, 25))
M = 9
KEY_SQL = "CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id END"


def _events(spark, sf_correctness):
    return load_table(spark, sf_correctness, "events")


def _exact_counts(ev, s_ms, e_ms):
    return (
        ev.filter(ts_range_pred(ev, "ts", s_ms, e_ms))
        .select(F.expr(KEY_SQL).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_bound_inequality_and_size_cap(spark, sf_correctness):
    """Per fresh slot: ≤ m rows kept and bound ≤ n_slot/(m+1) — the
    inequality the completeness proof stands on."""
    ev = _events(spark, sf_correctness)
    rollup = build_mg_rollup(
        ev, "ts", F.expr(KEY_SQL), WM, ADV, m=M, slot_ms=HOUR_MS, cache=False
    )
    from uwheel_datafusion_spark.functions.time import bucket_ms, ts_to_ms

    slot_n = (
        ev.filter(ts_range_pred(ev, "ts", WM, ADV))
        .groupBy(bucket_ms(ts_to_ms(F.col("ts")), HOUR_MS).alias("bucket_ms"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_slot = rollup.groupBy("bucket_ms").agg(
        F.count(F.lit(1)).alias("rows"), F.max("bound").alias("bound")
    )
    bad = (
        per_slot.join(slot_n, "bucket_ms")
        .filter(
            (F.col("rows") > M) | (F.col("bound") * (M + 1) > F.col("n"))
        )
        .count()
    )
    assert bad == 0


def test_served_upper_sandwich_exact_counts(spark, sf_correctness):
    """For every reported key: served ≤ true ≤ upper (served is a
    lower bound from kept slots; upper adds the total error)."""
    ev = _events(spark, sf_correctness)
    rollup = build_mg_rollup(
        ev, "ts", F.expr(KEY_SQL), WM, ADV, m=M, slot_ms=HOUR_MS, cache=False
    )
    cands = range_hh_candidates(rollup, S, E)
    joined = cands.join(_exact_counts(ev, S, E), "key", "inner")
    bad = joined.filter(
        (F.col("served") > F.col("cnt")) | (F.col("cnt") > F.col("upper"))
    ).count()
    assert bad == 0
    assert cands.count() > 0


def test_verified_equals_direct_exact(spark, sf_correctness):
    """The end-to-end sketch→candidates→verify path returns EXACTLY
    the direct GROUP BY/HAVING heavy hitters (threshold n/5, hot key
    holds ~50% so the result is non-empty)."""
    ev = _events(spark, sf_correctness)
    rollup = build_mg_rollup(
        ev, "ts", F.expr(KEY_SQL), WM, ADV, m=M, slot_ms=HOUR_MS, cache=False
    )
    got = {
        (r["key"], r["cnt"])
        for r in range_heavy_hitters_verified(
            ev, "ts", F.expr(KEY_SQL), rollup, S, E, m=M, count_frac_den=5
        ).collect()
    }
    exact = _exact_counts(ev, S, E)
    n = exact.agg(F.sum("cnt")).first()[0]
    want = {
        (r["key"], r["cnt"])
        for r in exact.filter(F.col("cnt") * 5 >= F.lit(n)).collect()
    }
    assert got == want and len(want) >= 1


def test_cascade_completeness(spark, sf_correctness):
    """Hour→day cascade: error budget doubles but the verified answer
    (threshold n/4, budget 2n/10) is still exactly the direct result —
    the mergeable-summaries composition holds end-to-end."""
    ev = _events(spark, sf_correctness)
    hour = build_mg_rollup(
        ev, "ts", F.expr(KEY_SQL), WM, ADV, m=M, slot_ms=HOUR_MS, cache=False
    )
    day = cascade_mg(hour, DAY_MS, M)
    got = {
        (r["key"], r["cnt"])
        for r in range_heavy_hitters_verified(
            ev, "ts", F.expr(KEY_SQL), day, S, E,
            m=M, count_frac_den=4, cascade_levels=1,
        ).collect()
    }
    exact = _exact_counts(ev, S, E)
    n = exact.agg(F.sum("cnt")).first()[0]
    want = {
        (r["key"], r["cnt"])
        for r in exact.filter(F.col("cnt") * 4 >= F.lit(n)).collect()
    }
    assert got == want and len(want) >= 1
    # cascaded rollup stays capped at m rows/slot
    assert (
        day.groupBy("bucket_ms").count().filter(F.col("count") > M).count()
        == 0
    )


def test_unsound_budget_refused(spark, sf_correctness):
    """Threshold at/below the error budget must raise, not silently
    under-report."""
    ev = _events(spark, sf_correctness)
    rollup = build_mg_rollup(
        ev, "ts", F.expr(KEY_SQL), WM, ADV, m=M, slot_ms=HOUR_MS, cache=False
    )
    with pytest.raises(AssertionError):
        range_heavy_hitters_verified(
            ev, "ts", F.expr(KEY_SQL), rollup, S, E, m=M, count_frac_den=10
        )
    with pytest.raises(AssertionError):
        range_heavy_hitters_verified(
            ev, "ts", F.expr(KEY_SQL), rollup, S, E,
            m=M, count_frac_den=5, cascade_levels=1,
        )
