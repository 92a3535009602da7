"""Histogram quantile rollup (operators/quantile_rollup): hard error
bound, cascade equality, empty-range semantics — the quantile member
of the mergeable-sketch aggregator family."""

import random
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.quantile_rollup import (
    build_histogram_rollup,
    cascade_histogram,
    grouped_quantile_df,
    range_quantile_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 1, 3))


@pytest.fixture(scope="module")
def synth(spark):
    """Heavy-tailed synthetic values over a 2-day horizon (seeded)."""
    rng = random.Random(19)
    rows = []
    for i in range(4000):
        ts = WM + rng.randrange(0, ADV - WM)
        v = rng.paretovariate(2.0) * 10 - 5  # skewed, includes negatives
        rows.append((ts, v))
    df = spark.createDataFrame(rows, "ts_ms long, value double").select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    return df


def _exact_disc(values, q):
    s = sorted(values)
    import math

    return s[max(0, math.ceil(q * len(s)) - 1)]


def test_range_quantile_hard_error_bound(spark, synth):
    """|approx − exact rank-q value| ≤ bin_width for every q tested —
    the deterministic guarantee the gate asserts in-query."""
    w = 2.0
    rollup = build_histogram_rollup(
        synth, "ts", "value", WM, ADV, bin_width=w, cache=False
    )
    s, e = WM + 3 * HOUR_MS, WM + 40 * HOUR_MS
    vals = [
        r["value"]
        for r in synth.filter(
            (F.col("ts") >= F.timestamp_millis(F.lit(s)).cast("timestamp_ntz"))
            & (F.col("ts") < F.timestamp_millis(F.lit(e)).cast("timestamp_ntz"))
        ).collect()
    ]
    for q in (0.1, 0.5, 0.9, 0.99):
        approx = range_quantile_df(rollup, s, e, q, bin_width=w).first()[
            "approx_quantile"
        ]
        exact = _exact_disc(vals, q)
        assert abs(approx - exact) <= w, (q, approx, exact)


def test_cascade_equals_direct_coarse_build(spark, synth):
    """A4 for histograms: day histogram from minute rollup == built
    directly at day grain (count-add associativity, exact)."""
    fine = build_histogram_rollup(synth, "ts", "value", WM, ADV, cache=False)
    direct = build_histogram_rollup(
        synth, "ts", "value", WM, ADV, slot_ms=DAY_MS, cache=False
    )
    cascaded = cascade_histogram(fine, DAY_MS)
    a = {(r["bucket_ms"], r["bin"]): r["cnt"] for r in cascaded.collect()}
    b = {(r["bucket_ms"], r["bin"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_empty_range_is_null_and_grouped_shape(spark, synth):
    rollup = build_histogram_rollup(synth, "ts", "value", WM, ADV, cache=False)
    row = range_quantile_df(rollup, ADV, ADV + DAY_MS, 0.5).first()
    assert row["approx_quantile"] is None
    grouped = grouped_quantile_df(rollup, DAY_MS, 0.5).collect()
    assert len(grouped) == 2  # two days in the horizon
    assert all(r["approx_quantile"] is not None for r in grouped)


def test_persisted_quantile_rollup_prunes_days(spark, synth, tmp_path):
    """Shared rollup_io persistence: a reopened histogram rollup serves
    the same quantile and its probe carries static dt partition
    filters (the O(days-touched) listing contract, same as the wheel
    and distinct rollups)."""
    import re

    from uwheel_datafusion_spark.operators.rollup_io import (
        load_rollup,
        save_rollup,
    )

    rollup = build_histogram_rollup(synth, "ts", "value", WM, ADV, cache=False)
    path = str(tmp_path / "hist_rollup")
    save_rollup(rollup, path)
    reopened = load_rollup(spark, path)
    s, e = WM, WM + DAY_MS
    mem = range_quantile_df(rollup, s, e, 0.5).first()["approx_quantile"]
    disk_df = range_quantile_df(reopened, s, e, 0.5)
    assert disk_df.first()["approx_quantile"] == mem
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    pfs = re.findall(r"PartitionFilters: \[(.*?)(?:\]|, Pushed)", plan)
    assert pfs and all("dt" in p for p in pfs), plan


def test_multi_quantile_one_pass_matches_per_q(spark, synth):
    """range_quantiles_df: the whole percentile table from one
    bin-merge — each column equals the single-q walk, including the
    all-null row for an empty range."""
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        range_quantiles_df,
    )

    rollup = build_histogram_rollup(synth, "ts", "value", WM, ADV, cache=False)
    qs = [0.1, 0.5, 0.9, 0.99]
    s, e = WM, WM + DAY_MS
    row = range_quantiles_df(rollup, s, e, qs).first()
    for q in qs:
        want = range_quantile_df(rollup, s, e, q).first()["approx_quantile"]
        assert row[f"approx_q{round(q * 100)}"] == want, q
    empty = range_quantiles_df(rollup, ADV + DAY_MS, ADV + 2 * DAY_MS, qs).first()
    assert all(v is None for v in empty)
