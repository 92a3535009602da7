"""Opt-in seconds wheel ([uwheel-pub] seconds level; the reference
workload never needs it — generators are minute-aligned,
src/main.rs:168-169,194-195): with granularity "second" the index
serves second-aligned sub-minute endpoints without touching the fact
table, and the hybrid plan's edge scans shrink to < 2 seconds each.

Checks: cascade invariant (minute from second == direct minute build),
hybrid plan shape (second runs in the interior, no edge scan for
second-aligned endpoints), and a differential vs SQL full scan on
seeded UNALIGNED ranges."""

import random
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    HOUR_MS,
    MINUTE_MS,
    SECOND_MS,
    ms_to_ts_literal,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.plans.range_plan import decompose_hybrid, decompose_range
from uwheel_datafusion_spark.sources.registry import load_table

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
GRAINS = ("second", "minute", "hour", "day")


@pytest.fixture(scope="module")
def swheel(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "events")
    return WheelIndex.build(df, "ts", "value", WM, ADV, granularities=GRAINS)


@pytest.fixture(scope="module")
def events_view(spark, sf_smoke):
    load_table(spark, sf_smoke, "events").createOrReplaceTempView("events_s")
    return "events_s"


def test_second_rollup_present_and_cascade_exact(spark, swheel, sf_smoke):
    """Minute rollup cascaded from seconds == direct minute build
    (tick/rotate A4 holds one level deeper)."""
    assert set(swheel.rollups) == set(GRAINS)
    direct = WheelIndex.build(
        load_table(spark, sf_smoke, "events"), "ts", "value", WM, ADV
    )
    a = {tuple(r) for r in swheel.rollups["minute"].collect()}
    b = {tuple(r) for r in direct.rollups["minute"].collect()}
    assert a == b
    # seconds slots are at least as numerous as minute slots
    assert swheel.stats.slot_counts["second"] >= swheel.stats.slot_counts["minute"]


def test_hybrid_plan_uses_second_runs():
    """Second-aligned ragged endpoints need NO edge scan with a seconds
    wheel; without one they need fact-scan edges."""
    s = WM + 10 * MINUTE_MS + 5 * SECOND_MS
    e = WM + 3 * HOUR_MS + 30 * SECOND_MS
    with_seconds = decompose_hybrid(s, e, GRAINS)
    assert with_seconds.edge_scans == []
    assert with_seconds.interior is not None
    grains_used = {r.granularity for r in with_seconds.interior.runs}
    assert "second" in grains_used and "hour" in grains_used
    without = decompose_hybrid(s, e, ("minute", "hour", "day"))
    assert len(without.edge_scans) == 2  # sub-minute residue both ends
    # sub-second residue still needs a scan even with the seconds wheel
    ragged_ms = decompose_hybrid(s + 1, e, GRAINS)
    assert len(ragged_ms.edge_scans) == 1
    assert ragged_ms.edge_scans[0][1] - ragged_ms.edge_scans[0][0] < SECOND_MS


def test_decompose_range_accepts_second_alignment():
    s = WM + 59 * SECOND_MS
    e = WM + 2 * MINUTE_MS
    p = decompose_range(s, e, GRAINS)
    assert p.fallback is None
    assert sum(r.n_slots * r.slot_ms for r in p.runs) == e - s


def test_explain_shows_seconds_for_ragged_edges(swheel):
    s = WM + 30 * SECOND_MS
    e = WM + 2 * HOUR_MS
    text = swheel.explain(s, e)
    assert "second[" in text and "FALLBACK" not in text and "scan[" not in text


def test_differential_unaligned_ranges(spark, swheel, events_view):
    """range_agg_df on second-aligned (minute-UNALIGNED) ranges ==
    SQL full scan, exactly (scaled-long policy)."""
    rng = random.Random(7)
    horizon_s = (ADV - WM) // SECOND_MS
    cases = []
    for _ in range(8):
        a = rng.randrange(0, horizon_s)
        b = rng.randrange(0, horizon_s)
        if a == b:
            b += 1
        cases.append((WM + min(a, b) * SECOND_MS, WM + max(a, b) * SECOND_MS))
    cases.append((WM + SECOND_MS, WM + 2 * SECOND_MS))  # single second
    for s, e in cases:
        got = swheel.range_agg_df(s, e).first()
        truth = spark.sql(
            f"""
            SELECT SUM(CAST(round(value*1000000) AS BIGINT)) AS sm,
                   COUNT(*) AS c
            FROM {events_view}
            WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}'
              AND ts < TIMESTAMP '{ms_to_ts_literal(e)}'
            """
        ).first()
        if truth["c"] == 0:
            assert got["sum_value"] is None, (s, e)
        else:
            assert round(got["sum_value"] * 1e6) == truth["sm"], (s, e)
            assert got["cnt"] == truth["c"], (s, e)


def test_hybrid_df_serves_subsecond_residue(spark, swheel, events_view, sf_smoke):
    """Endpoints unaligned even to seconds: the seconds wheel covers
    [ceil_s(start), floor_s(end)) and only ms residue hits the fact
    table — results still exactly match the full scan."""
    fact = load_table(spark, sf_smoke, "events")
    s = WM + 90_500  # 1m30.5s
    e = WM + 2 * HOUR_MS + 300  # +0.3s
    got = swheel.range_agg_hybrid_df(fact, "ts", "value", s, e).first()
    truth = spark.sql(
        f"""
        SELECT SUM(CAST(round(value*1000000) AS BIGINT)) AS sm, COUNT(*) AS c
        FROM {events_view}
        WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}'
          AND ts < TIMESTAMP '{ms_to_ts_literal(e)}'
        """
    ).first()
    if truth["c"] == 0:
        assert got["sum_value"] is None
    else:
        assert round(got["sum_value"] * 1e6) == truth["sm"]
        assert got["cnt"] == truth["c"]
