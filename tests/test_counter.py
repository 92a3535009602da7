"""Counter increase/rate rollup (operators/counter): reset handling,
cascade equality, range serving vs a direct Python fold."""

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
from uwheel_datafusion_spark.operators.counter import (
    build_counter_rollup,
    cascade_counter,
    grouped_increase_df,
    range_increase_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 1, 3))


@pytest.fixture(scope="module")
def counter_samples(spark):
    """A realistic counter: mostly monotonic, with two forced resets."""
    rng = random.Random(31)
    rows, v, t = [], 0.0, WM
    while t < ADV - 60_000:
        t += rng.randrange(10_000, 180_000)
        v += rng.uniform(0, 5)
        rows.append((t, round(v, 3)))
    # forced resets: counter restarts near zero mid-horizon
    rows[len(rows) // 3] = (rows[len(rows) // 3][0], 0.25)
    rows[2 * len(rows) // 3] = (rows[2 * len(rows) // 3][0], 1.5)
    return rows, spark.createDataFrame(
        rows, "ts_ms long, value double"
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )


def _python_increase(raw, s, e):
    pts = sorted((t, v) for t, v in raw if s <= t < e)
    vm = [py_value_to_micros(v) for _, v in pts]
    inc = sum(b - a if b >= a else b for a, b in zip(vm, vm[1:]))
    return inc / 1e6, len(pts)


def test_cascade_equals_direct_build(spark, counter_samples):
    _, df = counter_samples
    fine = build_counter_rollup(df, "ts", "value", WM, ADV, cache=False)
    direct = build_counter_rollup(
        df, "ts", "value", WM, ADV, slot_ms=DAY_MS, cache=False
    )
    a = {
        r["bucket_ms"]: tuple(r)[1:]
        for r in cascade_counter(fine, DAY_MS).collect()
    }
    b = {r["bucket_ms"]: tuple(r)[1:] for r in direct.collect()}
    assert a == b and len(a) == 2


def test_range_increase_matches_python_fold(spark, counter_samples):
    raw, df = counter_samples
    fine = build_counter_rollup(df, "ts", "value", WM, ADV, cache=False)
    for s, e in [
        (WM, ADV),
        (WM + 2 * HOUR_MS, WM + 30 * HOUR_MS),
        (WM + DAY_MS, ADV),
    ]:
        got = range_increase_df(fine, s, e).first()
        want_inc, want_cnt = _python_increase(raw, s, e)
        assert got["cnt"] == want_cnt
        assert got["increase"] == pytest.approx(want_inc, abs=1e-9)
        span_pts = sorted(t for t, _ in raw if s <= t < e)
        want_rate = want_inc / ((span_pts[-1] - span_pts[0]) / 1e3)
        assert got["rate_per_sec"] == pytest.approx(want_rate, rel=1e-12)


def test_monotonic_counter_increase_is_last_minus_first(spark):
    """No resets ⇒ increase over the range is exactly last − first."""
    rows = [(WM + i * 60_000, float(i) * 2.5) for i in range(100)]
    df = spark.createDataFrame(rows, "ts_ms long, value double").select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    fine = build_counter_rollup(df, "ts", "value", WM, ADV, cache=False)
    got = range_increase_df(fine, WM, ADV).first()
    assert got["increase"] == 99 * 2.5


def test_empty_and_single(spark):
    df = spark.createDataFrame(
        [(WM + 1_000, 5.0)], "ts_ms long, value double"
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    fine = build_counter_rollup(df, "ts", "value", WM, ADV, cache=False)
    one = range_increase_df(fine, WM, ADV).first()
    assert one["increase"] == 0.0 and one["rate_per_sec"] is None
    assert one["cnt"] == 1
    empty = range_increase_df(fine, WM + DAY_MS, ADV).first()
    assert empty["increase"] is None and empty["cnt"] == 0
