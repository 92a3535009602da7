"""Distinct-count aggregator family (operators/distinct): the exact
pair partial is gate-checked against DuckDB (test_oracle_parity); here
we pin what the gate can't — the HLL sketch path's tolerance vs exact,
the sketch cascade invariant (A4 for register-max), and the empty-range
contracts of both paths."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import DAY_MS, HOUR_MS, to_epoch_ms
from uwheel_datafusion_spark.operators.distinct import (
    build_distinct_pairs,
    build_hll_rollup,
    cascade_hll,
    grouped_distinct_exact,
    range_distinct_exact,
    range_distinct_hll,
)
from uwheel_datafusion_spark.sources.registry import load_table

from datetime import datetime

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
S, E = to_epoch_ms(datetime(2024, 1, 5)), to_epoch_ms(datetime(2024, 1, 25))


def _events(spark, sf_correctness):
    return load_table(spark, sf_correctness, "events")


def test_exact_range_matches_direct_count_distinct(spark, sf_correctness):
    ev = _events(spark, sf_correctness)
    pairs = build_distinct_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    got = range_distinct_exact(pairs, S, E).first()["n_distinct"]
    from uwheel_datafusion_spark.functions.time import ts_range_pred

    want = (
        ev.filter(ts_range_pred(ev, "ts", S, E))
        .agg(F.count_distinct("user_id").alias("n"))
        .first()["n"]
    )
    assert got == want > 0


def test_exact_grouped_matches_direct(spark, sf_correctness):
    ev = _events(spark, sf_correctness)
    pairs = build_distinct_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    got = {
        r["bucket_ms"]: r["n_distinct"]
        for r in grouped_distinct_exact(pairs, DAY_MS).collect()
    }
    from uwheel_datafusion_spark.functions.time import bucket_ms, ts_range_pred, ts_to_ms

    want = {
        r["b"]: r["n"]
        for r in ev.filter(ts_range_pred(ev, "ts", WM, ADV))
        .groupBy(bucket_ms(ts_to_ms(F.col("ts")), DAY_MS).alias("b"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 5


def test_hll_estimate_within_tolerance(spark, sf_correctness):
    """lgK=12 ⇒ ~1.6% standard error; pin a 5% band per day AND for the
    unioned range (union must not degrade beyond sketch geometry)."""
    ev = _events(spark, sf_correctness)
    pairs = build_distinct_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    hll = build_hll_rollup(ev, "ts", "user_id", WM, ADV, cache=False)

    exact_r = range_distinct_exact(pairs, S, E).first()["n_distinct"]
    approx_r = range_distinct_hll(hll, S, E).first()["n_distinct_approx"]
    assert abs(approx_r - exact_r) <= 0.05 * exact_r

    exact_d = {
        r["bucket_ms"]: r["n_distinct"]
        for r in grouped_distinct_exact(pairs, DAY_MS).collect()
    }
    approx_d = {
        r["bucket_ms"]: r["n"]
        for r in cascade_hll(hll, DAY_MS)
        .select("bucket_ms", F.hll_sketch_estimate("hll").alias("n"))
        .collect()
    }
    assert approx_d.keys() == exact_d.keys()
    for b, want in exact_d.items():
        assert abs(approx_d[b] - want) <= max(0.05 * want, 2)


def test_hll_cascade_equals_direct_build(spark, sf_correctness):
    """A4 for sketches: hour sketches unioned from minute sketches give
    the same estimates as sketches built directly at hour grain
    (register-max is associative/commutative — exact, not approximate,
    equality of estimates)."""
    ev = _events(spark, sf_correctness)
    minute = build_hll_rollup(ev, "ts", "user_id", WM, ADV, cache=False)
    cascaded = {
        r["bucket_ms"]: r["n"]
        for r in cascade_hll(minute, HOUR_MS)
        .select("bucket_ms", F.hll_sketch_estimate("hll").alias("n"))
        .collect()
    }
    direct = {
        r["bucket_ms"]: r["n"]
        for r in build_hll_rollup(
            ev, "ts", "user_id", WM, ADV, slot_ms=HOUR_MS, cache=False
        )
        .select("bucket_ms", F.hll_sketch_estimate("hll").alias("n"))
        .collect()
    }
    assert cascaded == direct and len(direct) > 24


def test_empty_range_is_zero_both_paths(spark, sf_correctness):
    ev = _events(spark, sf_correctness)
    pairs = build_distinct_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    hll = build_hll_rollup(ev, "ts", "user_id", WM, ADV, cache=False)
    # a range before the watermark covers no buckets
    s, e = WM - 2 * DAY_MS, WM - DAY_MS
    assert range_distinct_exact(pairs, s, e).first()["n_distinct"] == 0
    assert range_distinct_hll(hll, s, e).first()["n_distinct_approx"] == 0


def test_watermark_horizon_respected(spark, sf_correctness):
    """Pairs outside [watermark, advance) never enter the partial —
    the wheel's late/ahead drop semantics for the set aggregator."""
    ev = _events(spark, sf_correctness)
    narrow = build_distinct_pairs(
        ev, "ts", "user_id", S, E, cache=False
    )
    lo = narrow.agg(F.min("bucket_ms").alias("m")).first()["m"]
    hi = narrow.agg(F.max("bucket_ms").alias("m")).first()["m"]
    assert lo >= S and hi < E


def test_keyed_distinct_matches_direct(spark, sf_correctness):
    from uwheel_datafusion_spark.operators.distinct import (
        build_keyed_distinct_pairs,
        keyed_grouped_distinct_exact,
    )
    from uwheel_datafusion_spark.functions.time import bucket_ms, ts_range_pred, ts_to_ms

    ev = _events(spark, sf_correctness)
    pairs = build_keyed_distinct_pairs(
        ev, "ts", "user_id", "event_type", WM, ADV, cache=False
    )
    got = {
        (r["grp"], r["bucket_ms"]): r["n_distinct"]
        for r in keyed_grouped_distinct_exact(pairs, DAY_MS).collect()
    }
    want = {
        (r["grp"], r["b"]): r["n"]
        for r in ev.filter(ts_range_pred(ev, "ts", WM, ADV))
        .groupBy(
            F.col("event_type").alias("grp"),
            bucket_ms(ts_to_ms(F.col("ts")), DAY_MS).alias("b"),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len({g for g, _ in got}) > 1


def test_hll_rollup_save_load_roundtrip(spark, sf_correctness, tmp_path):
    """Persisted sketch rollups reopen to identical estimates, and a
    range probe on the reopened table prunes day partitions."""
    from uwheel_datafusion_spark.operators.distinct import load_rollup, save_rollup

    ev = _events(spark, sf_correctness)
    hll = build_hll_rollup(ev, "ts", "user_id", WM, ADV, cache=False)
    path = str(tmp_path / "hll_rollup")
    save_rollup(hll, path)
    reopened = load_rollup(spark, path)

    want = range_distinct_hll(hll, S, E).first()["n_distinct_approx"]
    got = range_distinct_hll(reopened, S, E).first()["n_distinct_approx"]
    assert got == want > 0

    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    probe = reopened.filter(_bucket_range_pred(reopened, S, E))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # planning-time partition pruning: the static dt bounds must reach
    # the scan's PartitionFilters (O(days-touched) listings at scale)
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200]


def test_hll_extend_equals_full_build(spark, sf_correctness):
    """Incremental maintenance (insert+advance): building on half the
    horizon then extending with the other half gives estimates exactly
    equal to one build over the full horizon."""
    from uwheel_datafusion_spark.operators.distinct import extend_hll_rollup

    ev = _events(spark, sf_correctness)
    mid = WM + (ADV - WM) // 2
    first = build_hll_rollup(ev, "ts", "user_id", WM, mid, cache=False)
    extended = extend_hll_rollup(first, ev, "ts", "user_id", mid, ADV)
    full = build_hll_rollup(ev, "ts", "user_id", WM, ADV, cache=False)

    got = {
        r["bucket_ms"]: r["n"]
        for r in extended.select(
            "bucket_ms", F.hll_sketch_estimate("hll").alias("n")
        ).collect()
    }
    want = {
        r["bucket_ms"]: r["n"]
        for r in full.select(
            "bucket_ms", F.hll_sketch_estimate("hll").alias("n")
        ).collect()
    }
    assert got == want and len(want) > 1000
