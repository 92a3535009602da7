"""Property-based differential for the TWA boundary-stitching combine
(operators/twa): hypothesis drives (ts, value) multisets on a small
timestamp grid — duplicate instants, single-sample buckets, samples
exactly on bucket seams — against the direct Python LOCF integral,
plus the minute→hour cascade invariant on every example."""

from datetime import datetime

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import py_value_to_micros
from uwheel_datafusion_spark.functions.time import (
    HOUR_MS,
    MINUTE_MS,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.twa import (
    build_twa_rollup,
    cascade_twa,
    range_twa_df,
)

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = WM + 4 * HOUR_MS

# ts on a 7.5-minute grid (seam hits at every hour boundary); values
# on a coarse signed grid so duplicates and sign flips occur
_rows = st.lists(
    st.tuples(
        st.integers(0, 32).map(lambda i: WM + i * 450_000),
        st.integers(-10, 10).map(lambda i: i * 0.5),
    ),
    min_size=0,
    max_size=40,
)


def _python_twa(rows, s, e):
    pts = sorted((t, v) for t, v in rows if s <= t < e)
    if not pts:
        return None, 0
    if pts[0][0] == pts[-1][0]:
        # zero extent: TWA lowers to the FIRST value at the instant —
        # the convention _lower_twa pins and every gate oracle encodes
        # (CASE WHEN rn = 1 ...). The combine algebra is unaffected:
        # partials keep both edges, and the seam carries last_v.
        return pts[0][1], len(pts)
    area = sum(
        py_value_to_micros(v0) * (t1 - t0)
        for (t0, v0), (t1, _v1) in zip(pts, pts[1:])
    )
    return area / 1e6 / (pts[-1][0] - pts[0][0]), len(pts)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
@example(rows=[(WM, 0.0), (WM, 0.5)])  # all-one-instant bucket with
# distinct values: pins the degenerate first-value lowering
def test_range_twa_matches_python_integral(spark, rows):
    df = spark.createDataFrame(
        rows or [(WM - 1, 0.0)], "ts_ms long, value double"
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    fine = build_twa_rollup(
        df, "ts", "value", WM, ADV, slot_ms=MINUTE_MS, cache=False
    )
    for s, e in [(WM, ADV), (WM + HOUR_MS, WM + 3 * HOUR_MS)]:
        got = range_twa_df(fine, s, e).first()
        want_twa, want_cnt = _python_twa(rows, s, e)
        assert got["cnt"] == want_cnt
        if want_cnt:
            assert got["twa"] == pytest.approx(want_twa, abs=1e-9)
        else:
            assert got["twa"] is None
    direct = build_twa_rollup(
        df, "ts", "value", WM, ADV, slot_ms=HOUR_MS, cache=False
    )
    a = sorted(tuple(r) for r in cascade_twa(fine, HOUR_MS).collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b
