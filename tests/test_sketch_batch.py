"""Batched sketch-family serving == the per-range twins, one job.

Mirrors tests/test_wheel.py's batch-vs-probe parity: every batched
query must return exactly what its single-range serving function
returns, including null rows for empty ranges and in-input-order
query ids.
"""

import pytest

from uwheel_datafusion_spark.functions.time import DAY_MS, HOUR_MS
from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS
from uwheel_datafusion_spark.operators.ohlc import (
    build_ohlc_rollup,
    range_ohlc_df,
)
from uwheel_datafusion_spark.operators.quantile_rollup import (
    build_histogram_rollup,
    range_quantile_df,
)
from uwheel_datafusion_spark.operators.sketch_batch import (
    range_ohlc_batch_df,
    range_quantile_batch_df,
)
from uwheel_datafusion_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"

# mixed shapes: day, 6h, unoccupied (before watermark data starts is
# clamped out by build, so use a far-future aligned slot), week
_RANGES = [
    (EVENTS_WM_MS, EVENTS_WM_MS + DAY_MS),
    (EVENTS_WM_MS + 3 * DAY_MS, EVENTS_WM_MS + 3 * DAY_MS + 6 * HOUR_MS),
    (EVENTS_ADV_MS + 30 * DAY_MS, EVENTS_ADV_MS + 31 * DAY_MS),  # empty
    (EVENTS_WM_MS, EVENTS_WM_MS + 7 * DAY_MS),
]


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def test_quantile_batch_matches_per_range(spark, events):
    rollup = build_histogram_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_quantile_batch_df(rollup, _RANGES, 0.5).collect()
    assert [r["query_id"] for r in batch] == list(range(len(_RANGES)))
    for qid, (s, e) in enumerate(_RANGES):
        single = range_quantile_df(rollup, s, e, 0.5).collect()[0]
        assert batch[qid]["approx_quantile"] == single["approx_quantile"], (
            qid,
            _RANGES[qid],
        )
    # the empty range really is null
    assert batch[2]["approx_quantile"] is None
    rollup.unpersist()


def test_ohlc_batch_matches_per_range(spark, events):
    rollup = build_ohlc_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_ohlc_batch_df(rollup, _RANGES).collect()
    assert [r["query_id"] for r in batch] == list(range(len(_RANGES)))
    for qid, (s, e) in enumerate(_RANGES):
        single = range_ohlc_df(rollup, s, e).collect()[0]
        for col in ("open", "high", "low", "close", "cnt"):
            assert batch[qid][col] == single[col], (qid, col)
    assert batch[2]["open"] is None and batch[2]["cnt"] == 0
    rollup.unpersist()


def test_batch_single_job_plan(spark, events):
    """The batched plan must hash-join the broadcast run frame — no
    BroadcastNestedLoopJoin (rollup rows × ranges) anywhere."""
    rollup = build_histogram_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS, cache=False
    )
    plan = range_quantile_batch_df(
        rollup, _RANGES, 0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_twa_batch_matches_per_range(spark, events):
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_twa_batch_df,
    )
    from uwheel_datafusion_spark.operators.twa import (
        build_twa_rollup,
        range_twa_df,
    )

    rollup = build_twa_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_twa_batch_df(rollup, _RANGES).collect()
    for qid, (s, e) in enumerate(_RANGES):
        single = range_twa_df(rollup, s, e).collect()[0]
        assert batch[qid]["twa"] == single["twa"], (qid,)
        assert batch[qid]["cnt"] == single["cnt"]
    assert batch[2]["twa"] is None and batch[2]["cnt"] == 0
    rollup.unpersist()


def test_counter_batch_matches_per_range(spark, events):
    from uwheel_datafusion_spark.operators.counter import (
        build_counter_rollup,
        range_increase_df,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_increase_batch_df,
    )

    rollup = build_counter_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_increase_batch_df(rollup, _RANGES).collect()
    for qid, (s, e) in enumerate(_RANGES):
        single = range_increase_df(rollup, s, e).collect()[0]
        for col in ("increase", "rate_per_sec", "cnt"):
            assert batch[qid][col] == single[col], (qid, col)
    assert batch[2]["increase"] is None and batch[2]["cnt"] == 0
    rollup.unpersist()


def test_distinct_batch_matches_per_range(spark, events):
    from uwheel_datafusion_spark.operators.distinct import (
        build_distinct_pairs,
        range_distinct_exact,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_distinct_batch_df,
    )

    pairs = build_distinct_pairs(
        events, "ts", "user_id", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_distinct_batch_df(pairs, _RANGES).collect()
    for qid, (s, e) in enumerate(_RANGES):
        single = range_distinct_exact(pairs, s, e).collect()[0]
        assert batch[qid]["n_distinct"] == single["n_distinct"], (qid,)
    assert batch[2]["n_distinct"] == 0
    pairs.unpersist()


def test_kmv_batch_matches_per_range(spark, events):
    from uwheel_datafusion_spark.operators.bottomk import (
        build_bottomk_rollup,
        range_kmv_estimate_df,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_kmv_batch_df,
    )

    k = 64
    rollup = build_bottomk_rollup(
        events, "ts", "user_id", EVENTS_WM_MS, EVENTS_ADV_MS, k=k
    )
    batch = range_kmv_batch_df(rollup, _RANGES, k).collect()
    for qid, (s, e) in enumerate(_RANGES):
        single = range_kmv_estimate_df(rollup, s, e, k).collect()[0]
        assert batch[qid]["n_distinct_kmv"] == single["n_distinct_kmv"], (qid,)
    assert batch[2]["n_distinct_kmv"] == 0
    rollup.unpersist()


def test_heavy_hitters_batch_matches_per_range(spark, events):
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.mgsketch import (
        build_mg_rollup,
        range_heavy_hitters_verified,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_heavy_hitters_batch_verified,
    )

    HOUR = 3_600_000
    key = F.expr("CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id END")
    rollup = build_mg_rollup(
        events, "ts", key, EVENTS_WM_MS, EVENTS_ADV_MS, m=9, slot_ms=HOUR
    )
    batch = range_heavy_hitters_batch_verified(
        events, "ts", key, rollup, _RANGES, m=9, count_frac_den=5,
        slot_ms=HOUR,
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], set()).add((r["key"], r["cnt"]))
    for qid, (s, e) in enumerate(_RANGES):
        single = {
            (r["key"], r["cnt"])
            for r in range_heavy_hitters_verified(
                events, "ts", key, rollup, s, e, m=9, count_frac_den=5
            ).collect()
        }
        assert got.get(qid, set()) == single, (qid, _RANGES[qid])
    # empty range emits no rows
    assert 2 not in got
    rollup.unpersist()


def test_heavy_hitters_batch_plan_no_nested_loop(spark, events):
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.mgsketch import build_mg_rollup
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_heavy_hitters_batch_verified,
    )

    HOUR = 3_600_000
    key = F.expr("CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id END")
    rollup = build_mg_rollup(
        events, "ts", key, EVENTS_WM_MS, EVENTS_ADV_MS, m=9, slot_ms=HOUR,
        cache=False,
    )
    plan = range_heavy_hitters_batch_verified(
        events, "ts", key, rollup, _RANGES, m=9, count_frac_den=5,
        slot_ms=HOUR,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


_KEYED_PROBES = [
    ("view", EVENTS_WM_MS, EVENTS_WM_MS + DAY_MS),
    ("click", EVENTS_WM_MS + 3 * DAY_MS,
     EVENTS_WM_MS + 3 * DAY_MS + 6 * HOUR_MS),
    ("view", EVENTS_ADV_MS + 30 * DAY_MS, EVENTS_ADV_MS + 31 * DAY_MS),  # empty
    ("no_such_type", EVENTS_WM_MS, EVENTS_WM_MS + 7 * DAY_MS),  # unknown key
    ("purchase", EVENTS_WM_MS, EVENTS_WM_MS + 7 * DAY_MS),
]


def test_keyed_quantile_batch_matches_per_key_range(spark, events):
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        build_keyed_histogram_rollup,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        keyed_range_quantile_batch_df,
    )
    from pyspark.sql import functions as F

    rollup = build_keyed_histogram_rollup(
        events, "ts", "value", "event_type", EVENTS_WM_MS, EVENTS_ADV_MS,
        cache=False,
    )
    batch = keyed_range_quantile_batch_df(rollup, _KEYED_PROBES, 0.5).collect()
    assert [r["query_id"] for r in batch] == list(range(len(_KEYED_PROBES)))
    for qid, (k, s, e) in enumerate(_KEYED_PROBES):
        single = range_quantile_df(
            rollup.filter(F.col("grp") == k).drop("grp"), s, e, 0.5
        ).collect()[0]
        assert batch[qid]["approx_quantile"] == single["approx_quantile"], (
            qid, _KEYED_PROBES[qid],
        )
    assert batch[2]["approx_quantile"] is None  # empty range
    assert batch[3]["approx_quantile"] is None  # unknown key


def test_keyed_ohlc_batch_matches_per_key_range(spark, events):
    from uwheel_datafusion_spark.operators.ohlc import build_keyed_ohlc_rollup
    from uwheel_datafusion_spark.operators.sketch_batch import (
        keyed_range_ohlc_batch_df,
    )
    from pyspark.sql import functions as F

    rollup = build_keyed_ohlc_rollup(
        events, "ts", "value", "event_type", EVENTS_WM_MS, EVENTS_ADV_MS,
        cache=False,
    )
    batch = keyed_range_ohlc_batch_df(rollup, _KEYED_PROBES).collect()
    assert [r["query_id"] for r in batch] == list(range(len(_KEYED_PROBES)))
    for qid, (k, s, e) in enumerate(_KEYED_PROBES):
        single = range_ohlc_df(
            rollup.filter(F.col("grp") == k).drop("grp"), s, e
        ).collect()[0]
        assert tuple(batch[qid])[1:] == tuple(single), (
            qid, _KEYED_PROBES[qid],
        )
    assert batch[3]["close"] is None and batch[3]["cnt"] == 0


def test_keyed_twa_counter_batch_match_per_key_range(spark, events):
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.counter import (
        build_keyed_counter_rollup,
        range_increase_df,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        keyed_range_increase_batch_df,
        keyed_range_twa_batch_df,
    )
    from uwheel_datafusion_spark.operators.twa import (
        build_keyed_twa_rollup,
        range_twa_df,
    )

    ktw = build_keyed_twa_rollup(
        events, "ts", "value", "event_type", EVENTS_WM_MS, EVENTS_ADV_MS,
        cache=False,
    )
    batch = keyed_range_twa_batch_df(ktw, _KEYED_PROBES).collect()
    assert [r["query_id"] for r in batch] == list(range(len(_KEYED_PROBES)))
    for qid, (k, s, e) in enumerate(_KEYED_PROBES):
        single = range_twa_df(
            ktw.filter(F.col("grp") == k).drop("grp"), s, e
        ).collect()[0]
        assert (batch[qid]["twa"], batch[qid]["cnt"]) == (
            single["twa"], single["cnt"],
        ), (qid, _KEYED_PROBES[qid])
    assert batch[3]["twa"] is None and batch[3]["cnt"] == 0

    kct = build_keyed_counter_rollup(
        events, "ts", "value", "event_type", EVENTS_WM_MS, EVENTS_ADV_MS,
        cache=False,
    )
    cbatch = keyed_range_increase_batch_df(kct, _KEYED_PROBES).collect()
    for qid, (k, s, e) in enumerate(_KEYED_PROBES):
        single = range_increase_df(
            kct.filter(F.col("grp") == k).drop("grp"), s, e
        ).collect()[0]
        assert tuple(cbatch[qid])[1:] == tuple(single), (
            qid, _KEYED_PROBES[qid],
        )


def test_m4_batch_matches_per_range(spark, events):
    """N dashboard panels in one job: each query's pixel rows equal
    its m4_downsample_df twin; the empty range contributes no rows;
    the plan stays on the broadcast hash join."""
    from uwheel_datafusion_spark.operators.ohlc import m4_downsample_df
    from uwheel_datafusion_spark.operators.sketch_batch import (
        range_m4_batch_df,
    )

    rollup = build_ohlc_rollup(
        events, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    batch = range_m4_batch_df(rollup, _RANGES, n_pixels=48)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
        )
    for qid, (s, e) in enumerate(_RANGES):
        want = sorted(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
            for r in m4_downsample_df(rollup, s, e, n_pixels=48).collect()
        )
        assert got.get(qid, []) == want, qid
    assert 2 not in got  # empty range: a chart with no pixels
    rollup.unpersist()


def test_keyed_m4_batch_matches_per_key_range(spark, events):
    """N per-series panels in one job: each probe's pixel rows equal
    the single-series m4_downsample_df over that key's slots; empty /
    unknown-key probes emit no pixels."""
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.ohlc import (
        build_keyed_ohlc_rollup,
        m4_downsample_df,
    )
    from uwheel_datafusion_spark.operators.sketch_batch import (
        keyed_range_m4_batch_df,
    )

    rollup = build_keyed_ohlc_rollup(
        events, "ts", "value", "event_type", EVENTS_WM_MS, EVENTS_ADV_MS,
        cache=False,
    )
    batch = keyed_range_m4_batch_df(rollup, _KEYED_PROBES, n_pixels=48)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
        )
    for qid, (k, s, e) in enumerate(_KEYED_PROBES):
        want = sorted(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
            for r in m4_downsample_df(
                rollup.filter(F.col("grp") == k).drop("grp"), s, e,
                n_pixels=48,
            ).collect()
        )
        assert got.get(qid, []) == want, (qid, _KEYED_PROBES[qid])
    assert 2 not in got and 3 not in got
