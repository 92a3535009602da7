"""WheelEngine facade: one register_table call wires every serving
layer; each recognized SQL shape routes to its rewrite and matches
plain spark.sql on the same view."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.engine import WheelEngine
from uwheel_datafusion_spark.functions.time import (
    ms_to_ts_literal,
    to_epoch_ms,
)
from uwheel_datafusion_spark.sources.registry import load_table

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
S = WM
E = WM + 7 * 86_400_000


@pytest.fixture(scope="module")
def engine(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    return WheelEngine(spark).register_table(
        "events", ev, ts_col="ts", value_col="value",
        watermark_ms=WM, advance_to_ms=ADV,
        key_col="event_type", distinct_col="user_id",
        count_key_col="user_id", quantiles=True,
    )


def _rng(q: str) -> str:
    return (
        f"{q} WHERE ts >= '{ms_to_ts_literal(S)}' "
        f"AND ts < '{ms_to_ts_literal(E)}'"
    )


def test_every_shape_routes_and_matches(spark, engine):
    cases = [
        (_rng("SELECT SUM(value) AS s FROM events"), "index"),
        (
            _rng("SELECT date_trunc('day', ts) AS b, SUM(value) AS s, "
                 "COUNT(*) AS c FROM events") + " GROUP BY 1",
            "rollup",
        ),
        (
            _rng("SELECT event_type, date_trunc('day', ts) AS b, "
                 "SUM(value) AS s FROM events") + " GROUP BY 1, 2",
            "keyed_rollup",
        ),
        (
            _rng("SELECT date_trunc('day', ts) AS b, "
                 "COUNT(DISTINCT user_id) AS n FROM events") + " GROUP BY 1",
            "distinct_rollup",
        ),
        (
            _rng("SELECT event_type, date_trunc('day', ts) AS b, "
                 "COUNT(DISTINCT user_id) AS n FROM events")
            + " GROUP BY 1, 2",
            "keyed_distinct_rollup",
        ),
        (
            _rng("SELECT user_id, COUNT(*) AS cnt FROM events")
            + " GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 5",
            "count_rollup",
        ),
        (_rng("SELECT APPROX_MEDIAN(value) AS m FROM events"),
         "quantile_rollup"),
        (
            _rng("SELECT event_type, date_trunc('day', ts) AS b, "
                 "APPROX_MEDIAN(value) AS m FROM events") + " GROUP BY 1, 2",
            "keyed_quantile_rollup",
        ),
    ]
    for q, want_path in cases:
        df = engine.sql(q)
        assert engine.router.last_decision.path == want_path, (
            q, engine.router.last_decision,
        )
        if want_path in ("quantile_rollup", "keyed_quantile_rollup"):
            # approx function: value checked against the rollup twin in
            # test_router; here just shape + non-null
            assert df.collect()[0][0] is not None
            continue
        got = sorted(map(tuple, df.collect()))
        want = sorted(map(tuple, spark.sql(q).collect()))
        # the engine's scaled-long sums are EXACT where Spark's raw
        # double SUM accumulates fp error — compare to 1e-9 relative
        # (the exact-equality contract vs DuckDB lives in the gate)
        assert len(got) == len(want), q
        for g_row, w_row in zip(got, want):
            assert len(g_row) == len(w_row)
            for g, w in zip(g_row, w_row):
                if isinstance(g, float) and isinstance(w, float):
                    assert g == pytest.approx(w, rel=1e-9), q
                else:
                    assert g == w, q


def test_scalar_and_explain_and_index_handle(engine):
    q = _rng("SELECT SUM(value) FROM events")
    v = engine.sql_scalar(q)
    assert v is not None
    assert "wheel" in engine.explain(q).lower() or "index" in engine.explain(
        q
    ).lower()
    # the index handle exposes the probe/batch surface
    assert engine.index("events").probe(S, E)["sum_value"] is not None


def test_register_table_accepts_parquet_path(spark, sf_smoke):
    eng = WheelEngine(spark).register_table(
        "events_by_path", f"{sf_smoke}/events.parquet",
        ts_col="ts", value_col="value",
        watermark_ms=WM, advance_to_ms=ADV,
    )
    q = _rng("SELECT SUM(value) FROM events_by_path")
    v = eng.sql_scalar(q)
    assert eng.router.last_decision.path == "index"
    assert v == pytest.approx(spark.sql(q).first()[0], rel=1e-9)
