"""first/last/OHLC rollup (operators/ohlc): cascade equality, range
combine, duplicate-timestamp tie-break determinism."""

import random
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.ohlc import (
    build_ohlc_rollup,
    cascade_ohlc,
    range_ohlc_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 1, 4))


@pytest.fixture(scope="module")
def ticks(spark):
    """Synthetic tick data WITH duplicate timestamps (the tie case)."""
    rng = random.Random(5)
    rows = []
    for _ in range(3000):
        ts = WM + rng.randrange(0, (ADV - WM) // 1000) * 1000  # second res
        rows.append((ts, round(rng.uniform(-50, 50), 3)))
    # forced ties: two values at the exact same ms
    rows += [(WM + 1234_000, 7.5), (WM + 1234_000, -7.5)]
    return spark.createDataFrame(rows, "ts_ms long, value double").select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )


def test_cascade_equals_direct_build(spark, ticks):
    fine = build_ohlc_rollup(ticks, "ts", "value", WM, ADV, cache=False)
    direct = build_ohlc_rollup(
        ticks, "ts", "value", WM, ADV, slot_ms=DAY_MS, cache=False
    )
    a = {r["bucket_ms"]: tuple(r)[1:] for r in cascade_ohlc(fine, DAY_MS).collect()}
    b = {r["bucket_ms"]: tuple(r)[1:] for r in direct.collect()}
    assert a == b


def test_range_combine_matches_raw(spark, ticks):
    fine = build_ohlc_rollup(ticks, "ts", "value", WM, ADV, cache=False)
    s, e = WM + 5 * HOUR_MS, WM + 50 * HOUR_MS
    got = range_ohlc_df(fine, s, e).first()
    raw = [
        (r["t"], r["value"])
        for r in ticks.select(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("t"), "value"
        )
        .filter((F.col("t") >= s) & (F.col("t") < e))
        .collect()
    ]
    opens = sorted(raw)  # (ts, value) asc — first element is the open pick
    closes = sorted(raw, reverse=True)
    assert got["open"] == opens[0][1]
    assert got["close"] == closes[0][1]
    assert got["high"] == max(v for _, v in raw)
    assert got["low"] == min(v for _, v in raw)
    assert got["cnt"] == len(raw)


def test_empty_range_and_tie_break(spark, ticks):
    fine = build_ohlc_rollup(ticks, "ts", "value", WM, ADV, cache=False)
    empty = range_ohlc_df(fine, ADV, ADV + DAY_MS).first()
    assert empty["cnt"] == 0 and empty["open"] is None
    # the forced same-ms tie: open at that minute must be the SMALLER
    # value, close the LARGER (deterministic (ts, value) ordering)
    s, e = WM + 1234_000 - 34_000, WM + 1260_000
    tie = range_ohlc_df(fine, s, e).first()
    raw = sorted(
        (r["t"], r["value"])
        for r in ticks.select(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("t"), "value"
        )
        .filter((F.col("t") >= s) & (F.col("t") < e))
        .collect()
    )
    assert tie["open"] == raw[0][1]
    assert tie["close"] == raw[-1][1]
    # and if the earliest/latest ts is the forced tie ms, the pick is
    # the smaller (open) / larger (close) value at that ms
    same_ms = sorted(v for t, v in raw if t == WM + 1234_000)
    assert same_ms == [-7.5, 7.5]


def test_m4_downsample_equals_direct_pixel_build(spark, sf_correctness):
    """M4 from the minute rollup == a direct OHLC build at the pixel
    grain (alignment contract met: the pixel width divides into whole
    minutes), and the pixel count is bounded by n_pixels."""
    from uwheel_datafusion_spark.operators.ohlc import (
        build_ohlc_rollup,
        m4_downsample_df,
    )
    from uwheel_datafusion_spark.sources.registry import load_table

    s = WM
    e = WM + 2 * 86_400_000  # 2 days at 96 px → 30-minute pixels
    ev = load_table(spark, sf_correctness, "events")
    minute = build_ohlc_rollup(ev, "ts", "value", WM, ADV, cache=False)
    got = {
        r["px_ms"]: (r["open"], r["high"], r["low"], r["close"], r["cnt"])
        for r in m4_downsample_df(minute, s, e, n_pixels=96).collect()
    }
    px_ms = (e - s) // 96
    direct = build_ohlc_rollup(
        ev, "ts", "value", s, e, slot_ms=px_ms, cache=False
    )
    want = {
        r["bucket_ms"]: (r["open"], r["high"], r["low"], r["close"], r["cnt"])
        for r in direct.collect()
    }
    assert got == want and 0 < len(got) <= 96


def test_m4_keyed_downsample_equals_per_key_direct(spark, sf_correctness):
    """Keyed M4 from the keyed minute rollup == a direct keyed OHLC
    build at the pixel grain: every series' pixels in one re-combine,
    fact rows untouched."""
    from uwheel_datafusion_spark.operators.ohlc import (
        build_keyed_ohlc_rollup,
        m4_downsample_keyed_df,
    )
    from uwheel_datafusion_spark.sources.registry import load_table

    s = WM
    e = WM + 2 * 86_400_000  # 2 days at 96 px → 30-minute pixels
    ev = load_table(spark, sf_correctness, "events")
    minute = build_keyed_ohlc_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    got = {
        (r["grp"], r["px_ms"]): (
            r["open"], r["high"], r["low"], r["close"], r["cnt"]
        )
        for r in m4_downsample_keyed_df(minute, s, e, n_pixels=96).collect()
    }
    px_ms = (e - s) // 96
    direct = build_keyed_ohlc_rollup(
        ev, "ts", "value", "event_type", s, e, slot_ms=px_ms, cache=False
    )
    want = {
        (r["grp"], r["bucket_ms"]): (
            r["open"], r["high"], r["low"], r["close"], r["cnt"]
        )
        for r in direct.collect()
    }
    n_grp = len({g for g, _ in got})
    assert got == want and 0 < len(got) <= 96 * n_grp
