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
        ohlc=True, twa=True, counter=True,
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
            _rng("SELECT min_by(value, ts) AS open, max(value) AS high, "
                 "min(value) AS low, max_by(value, struct(ts, value)) "
                 "AS close, count(*) AS cnt FROM events"),
            "ohlc_rollup",
        ),
        (_rng("SELECT TWA(value, ts) AS twa FROM events"), "twa_rollup"),
        (
            _rng("SELECT COUNTER_INCREASE(value, ts) AS increase "
                 "FROM events"),
            "counter_rollup",
        ),
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
        if want_path in (
            "quantile_rollup", "keyed_quantile_rollup", "ohlc_rollup",
            "twa_rollup", "counter_rollup",
        ):
            # values checked against the rollup twins in test_router
            # (TWA/COUNTER_* are dialect functions plain spark.sql
            # can't run; min_by ties are nondeterministic in the raw
            # scan); here just routing + non-null
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


def test_batch_serves_all_six_families(spark, engine):
    """eng.batch(table, family, ranges): N ranges, ONE job per family,
    values equal to the per-range serving twins."""
    from uwheel_datafusion_spark.operators import sketch_batch as sb
    from uwheel_datafusion_spark.operators.counter import range_increase_df
    from uwheel_datafusion_spark.operators.distinct import (
        range_distinct_exact,
    )
    from uwheel_datafusion_spark.operators.ohlc import range_ohlc_df
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        range_quantile_df,
    )
    from uwheel_datafusion_spark.operators.twa import range_twa_df

    day = 86_400_000
    ranges = [
        (WM, WM + day),
        (WM + 3 * day, WM + 3 * day + 6 * 3_600_000),
        (ADV + 30 * day, ADV + 31 * day),  # empty (past horizon? no —
        # sketch batches accept any aligned range; empty → null row)
        (WM + 7 * day, WM + 14 * day),
    ]
    layers = engine._layers["events"]

    # agg: one row per range, equal to the driver index probes
    agg = {r["query_id"]: r for r in engine.batch("events", "agg", ranges).collect()}
    di = engine.index("events").to_driver_index()
    for i, (s, e) in enumerate(ranges):
        if ADV >= e > s >= WM:
            assert agg[i]["cnt"] == di.query_count(s, e)

    for fam, twin, key in (
        ("quantile", lambda s, e: range_quantile_df(layers["quantile"], s, e, 0.5), "approx_quantile"),
        ("ohlc", lambda s, e: range_ohlc_df(layers["ohlc"], s, e), "close"),
        ("twa", lambda s, e: range_twa_df(layers["twa"], s, e), "twa"),
        ("counter", lambda s, e: range_increase_df(layers["counter"], s, e), "increase"),
    ):
        got = {r["query_id"]: r[key] for r in engine.batch("events", fam, ranges).collect()}
        assert len(got) == len(ranges), fam
        for i, (s, e) in enumerate(ranges):
            assert got[i] == twin(s, e).collect()[0][key], (fam, i)

    # distinct: exact per-range counts
    got_d = {
        r["query_id"]: r["n_distinct"]
        for r in engine.batch("events", "distinct", ranges).collect()
    }
    for i, (s, e) in enumerate(ranges):
        want_n = range_distinct_exact(layers["distinct"], s, e).first()[0]
        assert got_d[i] == want_n

    # unregistered family → clear error
    with pytest.raises(ValueError, match="register_table"):
        WheelEngine(spark).batch("events", "quantile", ranges)
    with pytest.raises(ValueError, match="unknown batch family"):
        engine.batch("events", "histogram", ranges)

    # m4: multi-row per range, equal to the single-range downsampler
    from uwheel_datafusion_spark.operators.ohlc import m4_downsample_df

    got_m4: dict = {}
    for r in engine.batch("events", "m4", ranges, n_pixels=48).collect():
        got_m4.setdefault(r["query_id"], []).append(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
        )
    for i, (s, e) in enumerate(ranges):
        want = sorted(
            (r["px_ms"], r["open"], r["high"], r["low"], r["close"], r["cnt"])
            for r in m4_downsample_df(
                layers["ohlc"], s, e, n_pixels=48
            ).collect()
        )
        assert got_m4.get(i, []) == want, i


def test_batch_keyed_families(spark, engine):
    """eng.batch keyed families: (key, range) probes in one job, equal
    to the keyed per-probe twins."""
    from uwheel_datafusion_spark.operators.ohlc import range_ohlc_df
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        range_quantile_df,
    )

    day = 86_400_000
    probes = [
        ("view", WM, WM + day),
        ("click", WM + 3 * day, WM + 3 * day + 6 * 3_600_000),
        ("no_such", WM, WM + 7 * day),
    ]
    layers = engine._layers["events"]

    ka = {r["query_id"]: r for r in engine.batch("events", "keyed_agg", probes).collect()}
    assert len(ka) == len(probes)
    for i, (k, s, e) in enumerate(probes):
        truth = spark.sql(
            f"SELECT COUNT(*) FROM events WHERE event_type = '{k}' "
            f"AND ts >= timestamp_millis({s}) AND ts < timestamp_millis({e})"
        ).first()[0]
        assert ka[i]["cnt"] == truth

    kq = {r["query_id"]: r["approx_quantile"]
          for r in engine.batch("events", "keyed_quantile", probes).collect()}
    ko = {r["query_id"]: tuple(r)[1:]
          for r in engine.batch("events", "keyed_ohlc", probes).collect()}
    for i, (k, s, e) in enumerate(probes):
        hq = layers["keyed_quantile"].filter(F.col("grp") == k).drop("grp")
        assert kq[i] == range_quantile_df(hq, s, e, 0.5).first()[0]
        ho = layers["keyed_ohlc"].filter(F.col("grp") == k).drop("grp")
        assert ko[i] == tuple(range_ohlc_df(ho, s, e).first())
    assert kq[2] is None and ko[2][-1] == 0  # unknown key → null/0

    # keyed stitch families through the same call
    from uwheel_datafusion_spark.operators.counter import range_increase_df
    from uwheel_datafusion_spark.operators.twa import range_twa_df

    kt = {r["query_id"]: (r["twa"], r["cnt"])
          for r in engine.batch("events", "keyed_twa", probes).collect()}
    kc = {r["query_id"]: tuple(r)[1:]
          for r in engine.batch("events", "keyed_counter", probes).collect()}
    for i, (k, s, e) in enumerate(probes):
        ht = layers["keyed_twa"].filter(F.col("grp") == k).drop("grp")
        row = range_twa_df(ht, s, e).first()
        assert kt[i] == (row["twa"], row["cnt"])
        hc = layers["keyed_counter"].filter(F.col("grp") == k).drop("grp")
        assert kc[i] == tuple(range_increase_df(hc, s, e).first())


def test_batch_keyed_m4(spark, engine):
    """eng.batch('events', 'keyed_m4', probes): per-series panels equal
    the keyed batch twin's rows (and ride the keyed_ohlc layer)."""
    from uwheel_datafusion_spark.operators.sketch_batch import (
        keyed_range_m4_batch_df,
    )

    day = 86_400_000
    probes = [
        ("view", WM, WM + day),
        ("purchase", WM, WM + 7 * day),
        ("no_such", WM, WM + day),
    ]
    got = sorted(
        map(
            tuple,
            engine.batch("events", "keyed_m4", probes, n_pixels=48).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            keyed_range_m4_batch_df(
                engine._layers["events"]["keyed_ohlc"], probes, n_pixels=48
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert not any(r[0] == 2 for r in got)  # unknown key: no pixels


def test_sql_many_batches_panel_groups(spark, engine):
    """sql_many: a dashboard's statements group by (table, family,
    params) onto the batch tier; every panel's frame is value- and
    schema-identical to the one-statement sql() serving path, and
    batchable panels derive from ONE cached batch frame per group
    (pinned via the InMemoryTableScan in their plans)."""
    day = 86_400_000
    panels = []
    for k in range(3):  # three OHLC panels, distinct ranges
        panels.append(_rng_at(
            "SELECT min_by(value, ts) AS open, MAX(value) AS high, "
            "MIN(value) AS low, max_by(value, ts) AS close "
            "FROM events", S + k * day, S + (k + 3) * day,
        ))
    for k in range(2):  # two TWA panels
        panels.append(_rng_at(
            "SELECT TWA(value, ts) AS twa, COUNT(*) AS cnt FROM events",
            S + k * day, S + (k + 2) * day,
        ))
    panels.append(_rng_at(
        "SELECT COUNTER_INCREASE(value, ts) AS increase FROM events",
        S, S + 2 * day,
    ))
    panels.append(_rng_at(
        "SELECT APPROX_MEDIAN(value) AS med FROM events", S, S + 5 * day
    ))
    # non-batchable shapes ride along unchanged
    panels.append(_rng("SELECT SUM(value) AS s FROM events"))  # index path
    panels.append(
        _rng("SELECT date_trunc('day', ts) AS b, SUM(value) AS s "
             "FROM events") + " GROUP BY 1"
    )

    frames = engine.sql_many(panels)
    assert len(frames) == len(panels)
    for q, f in zip(panels, frames):
        want = engine.sql(q)
        assert f.columns == want.columns, q
        got_rows = sorted(map(tuple, f.collect()))
        want_rows = sorted(map(tuple, want.collect()))
        assert got_rows == want_rows, q
    # batchable panels are LOCAL relations sliced from one collect per
    # group — collecting a panel costs no further Spark job
    for f in frames[:7]:
        plan = f._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def _rng_at(q: str, s_ms: int, e_ms: int) -> str:
    return (
        f"{q} WHERE ts >= '{ms_to_ts_literal(s_ms)}' "
        f"AND ts < '{ms_to_ts_literal(e_ms)}'"
    )


def test_sql_many_rows_matches_sql(spark, engine):
    """The serving form: sql_many_rows returns each panel's collected
    Rows (aliases preserved) with no per-panel Spark job; values match
    the one-statement path exactly."""
    day = 86_400_000
    panels = [
        _rng_at("SELECT TWA(value, ts) AS twa, COUNT(*) AS cnt FROM events",
                S, S + 2 * day),
        _rng_at("SELECT min_by(value, ts) AS open, max(value) AS high, "
                "min(value) AS low, max_by(value, struct(ts, value)) AS close "
                "FROM events", S, S + 3 * day),
        _rng("SELECT SUM(value) AS s FROM events"),
    ]
    got = engine.sql_many_rows(panels)
    for q, rows in zip(panels, got):
        want = engine.sql(q).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in want], q
        assert rows[0].asDict() == want[0].asDict(), q
