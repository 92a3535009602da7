"""Bottom-k sample rollup (operators/bottomk): the served sample is
gate-checked against DuckDB (test_oracle_parity); here we pin what the
gate can't — the merge-exactness property (rollup-served sample ==
direct bottom-k on raw rows for EVERY slot split), the A4 cascade,
per-slot bounds, the KMV estimator band, empty-range contract, and
the dt-partitioned persistence round-trip with pruning."""

from datetime import datetime

from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    to_epoch_ms,
    ts_range_pred,
)
from uwheel_datafusion_spark.operators.bottomk import (
    build_bottomk_rollup,
    cascade_bottomk,
    range_kmv_estimate_df,
    range_sample_df,
)
from uwheel_datafusion_spark.operators.sampling import _mix_sql
from uwheel_datafusion_spark.sources.registry import load_table

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
S, E = to_epoch_ms(datetime(2024, 1, 5)), to_epoch_ms(datetime(2024, 1, 25))
K = 20


def _events(spark, sf_correctness):
    return load_table(spark, sf_correctness, "events")


def _direct_bottomk(ev, s_ms, e_ms, k):
    """Direct computation on raw rows — what any rollup split must
    reproduce exactly."""
    return (
        ev.filter(ts_range_pred(ev, "ts", s_ms, e_ms))
        .select(F.col("user_id").cast("long").alias("key"))
        .distinct()
        .withColumn("h", F.expr(_mix_sql("key")))
        .orderBy("h", "key")
        .limit(k)
        .select("h", "key")
    )


def test_served_sample_equals_direct_for_every_split(spark, sf_correctness):
    """Merge exactness: minute-, hour-, and day-grain rollups all serve
    the identical sample (the survival argument in the module
    docstring, checked empirically across slot splits)."""
    ev = _events(spark, sf_correctness)
    want = [(r["h"], r["key"]) for r in _direct_bottomk(ev, S, E, K).collect()]
    assert len(want) == K
    for slot in (MINUTE_MS, HOUR_MS, DAY_MS):
        rollup = build_bottomk_rollup(
            ev, "ts", "user_id", WM, ADV, k=K, slot_ms=slot, cache=False
        )
        got = [
            (r["h"], r["key"])
            for r in range_sample_df(rollup, S, E, K).collect()
        ]
        assert got == want, f"slot_ms={slot}"


def test_rollup_bounded_k_rows_per_slot(spark, sf_correctness):
    ev = _events(spark, sf_correctness)
    rollup = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=HOUR_MS, cache=False
    )
    over = (
        rollup.groupBy("bucket_ms")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > K)
        .count()
    )
    assert over == 0


def test_cascade_equals_direct_coarse_build(spark, sf_correctness):
    """A4 for samples: minute→hour cascade is bit-equal to an hour
    build, and serving from the cascaded rollup equals serving from
    the fine one."""
    ev = _events(spark, sf_correctness)
    minute = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=MINUTE_MS, cache=False
    )
    hour_direct = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=HOUR_MS, cache=False
    )
    hour_cascaded = cascade_bottomk(minute, HOUR_MS, K)
    sym_diff = hour_cascaded.exceptAll(hour_direct).unionAll(
        hour_direct.exceptAll(hour_cascaded)
    )
    assert sym_diff.count() == 0


def test_kmv_estimate_within_band(spark, sf_correctness):
    """KMV n̂ = (k−1)/h₍ₖ₎ from the same rollup: sanity band vs exact.
    k=20 has theoretical RSE ≈ 1/√(k−2) ≈ 23%; pin a loose 3σ band so
    the test is stable while still catching estimator regressions."""
    ev = _events(spark, sf_correctness)
    rollup = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=HOUR_MS, cache=False
    )
    est = range_kmv_estimate_df(rollup, S, E, K).first()["n_distinct_kmv"]
    exact = (
        ev.filter(ts_range_pred(ev, "ts", S, E))
        .agg(F.count_distinct("user_id").alias("n"))
        .first()["n"]
    )
    assert exact > 0
    assert abs(est - exact) <= 0.7 * exact, (est, exact)


def test_empty_range_and_small_range_contracts(spark, sf_correctness):
    ev = _events(spark, sf_correctness)
    rollup = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=HOUR_MS, cache=False
    )
    # empty range → empty sample, estimate 0
    before = WM - DAY_MS
    assert range_sample_df(rollup, before, WM, K).count() == 0
    assert (
        range_kmv_estimate_df(rollup, before, WM, K).first()["n_distinct_kmv"]
        == 0
    )
    # a range with < k distinct keys → the sample IS the key set and
    # the estimator returns the exact count
    one_min = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=MINUTE_MS, cache=False
    )
    tiny_s, tiny_e = WM, WM + 2 * MINUTE_MS
    n_keys = (
        ev.filter(ts_range_pred(ev, "ts", tiny_s, tiny_e))
        .select("user_id")
        .distinct()
        .count()
    )
    if n_keys < K:
        got = range_sample_df(one_min, tiny_s, tiny_e, K).count()
        assert got == n_keys
        assert (
            range_kmv_estimate_df(one_min, tiny_s, tiny_e, K).first()[
                "n_distinct_kmv"
            ]
            == n_keys
        )


def test_persistence_round_trip_with_pruning(spark, sf_correctness, tmp_path):
    """save/load via the shared dt-partitioned contract; the reopened
    rollup serves the identical sample and the probe's plan prunes to
    the touched day partitions."""
    from uwheel_datafusion_spark.operators.rollup_io import (
        load_rollup,
        save_rollup,
    )

    ev = _events(spark, sf_correctness)
    rollup = build_bottomk_rollup(
        ev, "ts", "user_id", WM, ADV, k=K, slot_ms=HOUR_MS, cache=False
    )
    path = str(tmp_path / "bottomk_rollup")
    save_rollup(rollup, path)
    reopened = load_rollup(spark, path)
    want = [(r["h"], r["key"]) for r in range_sample_df(rollup, S, E, K).collect()]
    got = [
        (r["h"], r["key"]) for r in range_sample_df(reopened, S, E, K).collect()
    ]
    assert got == want
    plan = range_sample_df(reopened, S, E, K)._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "dt" in plan
