"""Property-based differential for the counter seam-stitching combine
(operators/counter): hypothesis drives (ts, value) multisets on a
SMALL timestamp grid, so timestamp collisions, resets exactly at
bucket boundaries, and single-sample buckets occur constantly — the
adversarial cases the seeded-random fixture rarely hits. Oracle = the
direct Python fold over the (ts, value)-sorted sequence."""

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import py_value_to_micros
from uwheel_datafusion_spark.functions.time import (
    HOUR_MS,
    MINUTE_MS,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.counter import (
    build_counter_rollup,
    cascade_counter,
    range_increase_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = WM + 4 * HOUR_MS

# ts on a 7.5-minute grid inside 4 hours (33 distinct instants →
# collisions guaranteed at 10+ samples); values on a coarse grid so
# equal-(ts, value) duplicates also occur
_rows = st.lists(
    st.tuples(
        st.integers(0, 32).map(lambda i: WM + i * 450_000),
        st.integers(0, 20).map(lambda i: i * 0.5),
    ),
    min_size=0,
    max_size=40,
)


def _python_increase(rows, s, e):
    pts = sorted((t, v) for t, v in rows if s <= t < e)
    vm = [py_value_to_micros(v) for _, v in pts]
    inc = sum(b - a if b >= a else b for a, b in zip(vm, vm[1:]))
    return inc / 1e6, len(pts)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_range_increase_matches_python_fold(spark, rows):
    df = spark.createDataFrame(
        rows or [(WM - 1, 0.0)],  # out-of-horizon sentinel for empty
        "ts_ms long, value double",
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    fine = build_counter_rollup(
        df, "ts", "value", WM, ADV, slot_ms=MINUTE_MS, cache=False
    )
    for s, e in [(WM, ADV), (WM + HOUR_MS, WM + 3 * HOUR_MS)]:
        got = range_increase_df(fine, s, e).first()
        want_inc, want_cnt = _python_increase(rows, s, e)
        assert got["cnt"] == want_cnt
        if want_cnt:
            assert got["increase"] == pytest.approx(want_inc, abs=1e-9)
    # cascade invariant on the same example: minute→hour == direct hour
    direct = build_counter_rollup(
        df, "ts", "value", WM, ADV, slot_ms=HOUR_MS, cache=False
    )
    a = sorted(tuple(r) for r in cascade_counter(fine, HOUR_MS).collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b
