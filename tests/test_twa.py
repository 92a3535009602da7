"""Time-weighted average rollup (operators/twa): cascade equality,
range serving vs a direct Python integral, degenerate buckets."""

import random
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import py_value_to_micros
from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.twa import (
    build_twa_rollup,
    cascade_twa,
    grouped_twa_df,
    range_twa_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 1, 4))


@pytest.fixture(scope="module")
def samples(spark):
    rng = random.Random(23)
    rows = []
    for _ in range(2500):
        ts = WM + rng.randrange(0, ADV - WM)
        rows.append((ts, round(rng.uniform(-10, 10), 4)))
    # duplicate-timestamp ties and an isolated single-sample day edge
    rows += [(WM + 777_000, 3.25), (WM + 777_000, -3.25)]
    return spark.createDataFrame(rows, "ts_ms long, value double").select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
        F.col("ts_ms"),
    )


def _python_twa(raw, s, e):
    """Direct LOCF integral over (ts, value) samples in [s, e)."""
    pts = sorted((t, v) for t, v in raw if s <= t < e)
    if not pts:
        return None, 0
    if pts[0][0] == pts[-1][0]:
        return pts[0][1], len(pts)
    area = sum(
        py_value_to_micros(v0) * (t1 - t0)
        for (t0, v0), (t1, _v1) in zip(pts, pts[1:])
    )
    return area / 1e6 / (pts[-1][0] - pts[0][0]), len(pts)


def test_cascade_equals_direct_build(spark, samples):
    fine = build_twa_rollup(samples, "ts", "value", WM, ADV, cache=False)
    direct = build_twa_rollup(
        samples, "ts", "value", WM, ADV, slot_ms=DAY_MS, cache=False
    )
    a = {r["bucket_ms"]: tuple(r)[1:] for r in cascade_twa(fine, DAY_MS).collect()}
    b = {r["bucket_ms"]: tuple(r)[1:] for r in direct.collect()}
    assert a == b and len(a) == 3


def test_range_twa_matches_direct_integral(spark, samples):
    fine = build_twa_rollup(samples, "ts", "value", WM, ADV, cache=False)
    raw = [(r["ts_ms"], r["value"]) for r in samples.collect()]
    for s, e in [
        (WM, ADV),
        (WM + 3 * HOUR_MS, WM + 50 * HOUR_MS),
        (WM + DAY_MS, WM + 2 * DAY_MS),
    ]:
        got = range_twa_df(fine, s, e).first()
        want_twa, want_cnt = _python_twa(raw, s, e)
        assert got["cnt"] == want_cnt
        assert got["twa"] == pytest.approx(want_twa, rel=1e-12)


def test_grouped_matches_range_per_day(spark, samples):
    fine = build_twa_rollup(samples, "ts", "value", WM, ADV, cache=False)
    per_day = {
        r["bucket_ms"]: (r["twa"], r["cnt"])
        for r in grouped_twa_df(fine, DAY_MS).collect()
    }
    for d, (twa, cnt) in per_day.items():
        one = range_twa_df(fine, d, d + DAY_MS).first()
        assert (one["twa"], one["cnt"]) == (twa, cnt)


def test_empty_and_single_sample(spark):
    df = spark.createDataFrame(
        [(WM + 500_000, 42.0)], "ts_ms long, value double"
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    fine = build_twa_rollup(df, "ts", "value", WM, ADV, cache=False)
    one = range_twa_df(fine, WM, WM + DAY_MS).first()
    assert one["twa"] == 42.0 and one["cnt"] == 1  # zero-duration ⇒ value
    empty = range_twa_df(fine, WM + DAY_MS, ADV).first()
    assert empty["twa"] is None and empty["cnt"] == 0
