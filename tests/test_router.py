"""WheelSqlRouter (SURVEY §4.1 last row / §7.6) and the hybrid
unaligned-range serving path: matched reference-shaped SQL is rewritten
onto the index; everything else reaches spark.sql unchanged — and both
paths agree with the full scan."""

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import QUANT_SCALE
from uwheel_datafusion_spark.functions.time import (
    MINUTE_MS,
    ms_to_ts_literal,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.plans.sql_router import WheelSqlRouter
from uwheel_datafusion_spark.sources.registry import load_table

from datetime import datetime

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))
S = to_epoch_ms(datetime(2024, 1, 3, 4, 17))
E = to_epoch_ms(datetime(2024, 1, 20, 7, 42))


@pytest.fixture(scope="module")
def router(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "events")
    idx = WheelIndex.build(df, "ts", "value", WM, ADV)
    load_table(spark, sf_smoke, "events").createOrReplaceTempView("events")
    r = WheelSqlRouter(spark)
    r.register_index("events", "ts", "value", idx)
    return r


def _q(agg: str, s_ms: int, e_ms: int, col: str = "value") -> str:
    return (
        f"SELECT {agg}({col}) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s_ms)}' AND ts < '{ms_to_ts_literal(e_ms)}'"
    )


def _scan_truth(spark, s_ms, e_ms):
    return spark.sql(
        f"""SELECT SUM(CAST(round(value*1000000) AS BIGINT)) AS sm, COUNT(*) AS c,
                   MIN(value) AS mn, MAX(value) AS mx
            FROM events WHERE ts >= '{ms_to_ts_literal(s_ms)}'
              AND ts < '{ms_to_ts_literal(e_ms)}'"""
    ).first()


def test_matched_query_takes_index_path(router):
    got = router.sql_scalar(_q("SUM", S, E))
    assert router.last_decision.path == "index"
    truth = _scan_truth(router.spark, S, E)
    assert got == pytest.approx(truth["sm"] / QUANT_SCALE, abs=0)
    assert router.sql_scalar(_q("COUNT", S, E, "*")) == truth["c"]
    assert router.sql_scalar(_q("MIN", S, E)) == truth["mn"]
    assert router.sql_scalar(_q("MAX", S, E)) == truth["mx"]


def test_dataframe_form(router):
    df = router.sql(_q("SUM", S, E))
    assert router.last_decision.path == "index"
    assert df.columns == ["sum_value"]
    truth = _scan_truth(router.spark, S, E)
    assert df.first()[0] == truth["sm"] / QUANT_SCALE


def test_multi_aggregate_select_list_one_index_hit(router):
    """All five lowerings of the 'all' partial in ONE rewritten query —
    `SELECT SUM(v), COUNT(*), MIN(v), MAX(v), AVG(v) … WHERE range`
    routes to the index and matches the full-scan answer column-wise."""
    q = (
        f"SELECT SUM(value) AS s, COUNT(*) AS c, MIN(value) AS mn, "
        f"MAX(value) AS mx, AVG(value) AS av FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(S)}' AND ts < '{ms_to_ts_literal(E)}'"
    )
    df = router.sql(q)
    assert router.last_decision.path == "index"
    assert [a for _, a in router.last_decision.items] == ["s", "c", "mn", "mx", "av"]
    row = df.first()
    assert df.columns == ["s", "c", "mn", "mx", "av"]
    truth = _scan_truth(router.spark, S, E)
    assert row["s"] == truth["sm"] / QUANT_SCALE
    assert row["c"] == truth["c"]
    assert row["mn"] == truth["mn"] and row["mx"] == truth["mx"]
    assert row["av"] == pytest.approx(truth["sm"] / QUANT_SCALE / truth["c"])
    # the scalar entry point stays single-aggregate by contract
    with pytest.raises(ValueError, match="non-scalar"):
        router.sql_scalar(q)
    # default aliases when none given
    q2 = (
        f"SELECT SUM(value), COUNT(*) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(S)}' AND ts < '{ms_to_ts_literal(E)}'"
    )
    df2 = router.sql(q2)
    assert router.last_decision.path == "index"
    assert df2.columns == ["sum_value", "count_value"]


def test_group_by_time_bucket_served_from_rollup(router, spark):
    """The continuous-aggregate shape: GROUP BY date_trunc('hour', ts)
    within an hour-aligned range is rewritten onto the HOUR rollup —
    same rows as the full scan (quantized sums), and the served plan
    never scans the fact table."""
    s = WM + 2 * 86_400_000
    e = WM + 5 * 86_400_000
    q = (
        f"SELECT date_trunc('hour', ts) AS h, SUM(value) AS s, COUNT(*) AS c "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(q)
    assert router.last_decision.path == "rollup"
    assert router.last_decision.granularity == "hour"
    got = {
        r["h"]: (round(r["s"] * 1e6), r["c"]) for r in df.collect()
    }
    truth = {
        r["h"]: (r["sm"], r["c"])
        for r in spark.sql(
            f"""SELECT date_trunc('hour', ts) AS h,
                       SUM(CAST(round(value*1000000) AS BIGINT)) AS sm,
                       COUNT(*) AS c
                FROM events WHERE ts >= '{ms_to_ts_literal(s)}'
                  AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"""
        ).collect()
    }
    assert got == truth and len(got) > 0
    # the rewritten plan reads the cached rollup, not the fact table
    # (lineage still names the parquet in the LOGICAL plan; execution
    # substitutes the materialized InMemoryRelation)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert "FileScan parquet" not in plan.split("InMemoryTableScan")[0]
    # unaligned range → edge buckets would be partial → full SQL
    router.sql(q.replace(ms_to_ts_literal(s), ms_to_ts_literal(s + MINUTE_MS)))
    assert router.last_decision.path == "sql"
    # GROUP BY over a different key → not the rewrite shape (decision
    # only: the query itself is invalid SQL either way)
    assert router.explain(
        "SELECT date_trunc('hour', ts) AS h, SUM(value) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        "GROUP BY event_type"
    ).startswith("SQL")


def test_unaligned_falls_back_to_sql(router):
    q = _q("SUM", S + 500, E)  # sub-minute start
    got = router.sql_scalar(q)
    assert router.last_decision.path == "sql"
    assert "not minute-aligned" in router.last_decision.reason
    assert got is not None


def test_unmatched_shape_falls_back(router):
    df = router.sql("SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type")
    assert router.last_decision.path == "sql"
    assert df.count() == 5


def test_out_of_horizon_falls_back(router):
    router.sql_scalar(_q("SUM", WM - MINUTE_MS, E))
    assert router.last_decision.path == "sql"
    assert "horizon" in router.last_decision.reason


def test_explain(router):
    assert router.explain(_q("AVG", S, E)).startswith("INDEX")
    assert router.explain("SELECT 1").startswith("SQL")


def test_hybrid_unaligned_range(spark, sf_smoke, router):
    """Index interior + fact-scan edges == full scan, for ragged
    endpoints 37s / 11s inside the minutes."""
    idx = router._indexes["events"][2]
    fact = load_table(spark, sf_smoke, "events")
    s, e = S + 37_000, E - 11_000
    row = idx.range_agg_hybrid_df(fact, "ts", "value", s, e).first()
    truth = _scan_truth(spark, s, e)
    assert row["cnt"] == truth["c"]
    assert row["sum_value"] == truth["sm"] / QUANT_SCALE
    assert row["min_value"] == truth["mn"]
    assert row["max_value"] == truth["mx"]


def test_hybrid_subminute_range(spark, sf_smoke, router):
    """Whole range inside one minute slot: pure edge scan."""
    idx = router._indexes["events"][2]
    fact = load_table(spark, sf_smoke, "events")
    s = S + 5_000
    row = idx.range_agg_hybrid_df(fact, "ts", "value", s, s + 20_000).first()
    truth = _scan_truth(spark, s, s + 20_000)
    assert row["cnt"] == (truth["c"] or 0)


def test_week_rollup_route_and_values(router):
    """Monday-aligned date_trunc('week') GROUP BY routes to the day
    rollup's Monday-week re-aggregation and matches the full scan."""
    s = to_epoch_ms(datetime(2024, 1, 1))  # 2024-01-01 is a Monday
    e = to_epoch_ms(datetime(2024, 1, 29))
    df = router.sql(
        f"SELECT date_trunc('week', ts) AS b, SUM(value) AS sv, COUNT(*) AS c "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    d = router.last_decision
    assert d.path == "rollup" and d.granularity == "week", d
    got = {r["b"]: (r["sv"], r["c"]) for r in df.collect()}
    truth = {
        r["b"]: (r["sm"] / QUANT_SCALE, r["c"])
        for r in router.spark.sql(
            f"""SELECT date_trunc('week', ts) AS b,
                       SUM(CAST(round(value*1000000) AS BIGINT)) AS sm,
                       COUNT(*) AS c
                FROM events WHERE ts >= '{ms_to_ts_literal(s)}'
                  AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"""
        ).collect()
    }
    assert got == truth
    assert len(got) == 4


def test_week_unaligned_falls_back(router):
    """A Thursday start is NOT Monday-week-aligned: route to sql."""
    s = to_epoch_ms(datetime(2024, 1, 4))
    e = to_epoch_ms(datetime(2024, 1, 25))
    router.sql(
        f"SELECT date_trunc('week', ts) AS b, SUM(value) AS sv "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    assert router.last_decision.path == "sql"
    assert "aligned" in router.last_decision.reason


def test_month_rollup_route_and_values(router):
    """Calendar-month GROUP BY folds the day rollup onto month starts
    and matches the full scan (the events fixture spans one month, so
    exactly one bucket)."""
    s = to_epoch_ms(datetime(2024, 1, 1))
    e = to_epoch_ms(datetime(2024, 2, 1))
    df = router.sql(
        f"SELECT date_trunc('month', ts) AS b, SUM(value) AS sv, COUNT(*) AS c "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    d = router.last_decision
    assert d.path == "rollup" and d.granularity == "month", d
    rows = df.collect()
    assert len(rows) == 1
    truth = _scan_truth(router.spark, s, e)
    assert rows[0]["sv"] == truth["sm"] / QUANT_SCALE
    assert rows[0]["c"] == truth["c"]
    assert rows[0]["b"].month == 1 and rows[0]["b"].day == 1


def test_month_midmonth_endpoint_falls_back(router):
    """A mid-month endpoint is not month-aligned: route to sql."""
    s = to_epoch_ms(datetime(2024, 1, 1))
    e = to_epoch_ms(datetime(2024, 1, 15))
    router.sql(
        f"SELECT date_trunc('month', ts) AS b, SUM(value) AS sv "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    assert router.last_decision.path == "sql"
    assert "aligned" in router.last_decision.reason


def test_year_needs_jan1_not_just_day1(router):
    """Feb 1 is month-aligned but NOT year-aligned: year falls back."""
    s = to_epoch_ms(datetime(2024, 1, 1))
    e = to_epoch_ms(datetime(2024, 2, 1))
    router.sql(
        f"SELECT date_trunc('year', ts) AS b, SUM(value) AS sv "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    assert router.last_decision.path == "sql"
    assert "aligned" in router.last_decision.reason


def test_keyed_distinct_route_and_values(spark, sf_smoke, router):
    """GROUP BY key + date_trunc + COUNT(DISTINCT) routes to the keyed
    distinct-pairs rollup and matches the full scan; an unregistered
    (table, key, col) triple falls back to sql."""
    from uwheel_datafusion_spark.operators.distinct import (
        build_keyed_distinct_pairs,
    )
    from uwheel_datafusion_spark.sources.registry import load_table

    ev = load_table(spark, sf_smoke, "events")
    router.register_keyed_distinct_rollup(
        "events", "event_type", "user_id", "ts",
        build_keyed_distinct_pairs(ev, "ts", "user_id", "event_type", WM, ADV,
                                   cache=False),
        WM, ADV,
    )
    s = to_epoch_ms(datetime(2024, 1, 5))
    e = to_epoch_ms(datetime(2024, 1, 9))
    df = router.sql(
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"COUNT(DISTINCT user_id) AS nu FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1, 2"
    )
    assert router.last_decision.path == "keyed_distinct_rollup"
    got = {(r["event_type"], r["b"]): r["nu"] for r in df.collect()}
    truth = {
        (r["event_type"], r["b"]): r["nu"]
        for r in router.spark.sql(
            f"""SELECT event_type, date_trunc('day', ts) AS b,
                       COUNT(DISTINCT user_id) AS nu
                FROM events WHERE ts >= '{ms_to_ts_literal(s)}'
                  AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1, 2"""
        ).collect()
    }
    assert got == truth and got
    # unregistered distinct column → verbatim sql
    router.sql(
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"COUNT(DISTINCT value) AS nv FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1, 2"
    )
    assert router.last_decision.path == "sql"


def test_keyed_rollup_route_and_fallbacks(spark, sf_smoke, router):
    """GROUP BY key + date_trunc routes to the keyed rollup and
    matches the scan; wrong key or unaligned range falls back."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    rollup = KeyedWheelIndex.build_rollup(
        ev, "event_type", "ts", "value", WM, ADV
    )
    router.register_keyed_rollup(
        "events", "event_type", "ts", "value", rollup, WM, ADV
    )
    s, e = WM, WM + 5 * 86_400_000
    q = (
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"SUM(value) AS sv, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1, 2"
    )
    df = router.sql(q)
    assert router.last_decision.path == "keyed_rollup", router.last_decision
    got = {(r["event_type"], r["b"]): (r["sv"], r["c"]) for r in df.collect()}
    truth = {
        (r["k"], r["b"]): (r["sm"] / QUANT_SCALE, r["c"])
        for r in spark.sql(
            f"""SELECT event_type AS k, date_trunc('day', ts) AS b,
                   SUM(CAST(round(value*1000000) AS BIGINT)) AS sm, COUNT(*) AS c
                FROM events WHERE ts >= '{ms_to_ts_literal(s)}'
                  AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1, 2"""
        ).collect()
    }
    assert got == truth

    # wrong key column → sql fallback
    router.sql(q.replace("event_type", "user_id"))
    assert router.last_decision.path == "sql"
    # unaligned range → sql fallback
    router.sql(
        f"SELECT event_type, date_trunc('day', ts) AS b, SUM(value) AS sv "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s + 60_000)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1, 2"
    )
    assert router.last_decision.path == "sql"


def test_distinct_rollup_route_and_fallbacks(spark, sf_smoke, router):
    """COUNT(DISTINCT) GROUP BY date_trunc routes to the pairs rollup
    and matches the scan; unregistered column falls back to sql."""
    from uwheel_datafusion_spark.operators.distinct import build_distinct_pairs

    ev = load_table(spark, sf_smoke, "events")
    pairs = build_distinct_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    router.register_distinct_rollup("events", "user_id", "ts", pairs, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000
    q = (
        f"SELECT date_trunc('day', ts) AS b, COUNT(DISTINCT user_id) AS n "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(q)
    assert router.last_decision.path == "distinct_rollup", router.last_decision
    got = {r["b"]: r["n"] for r in df.collect()}
    truth = {r["b"]: r["n"] for r in spark.sql(q).collect()}
    assert got == truth and len(got) == 7

    router.sql(q.replace("user_id", "event_type"))  # unregistered col
    assert router.last_decision.path == "sql"


def test_count_rollup_topk_route_and_fallbacks(spark, sf_smoke, router):
    """GROUP BY key ORDER BY COUNT(*) DESC LIMIT n routes to the
    count-pairs rollup and matches the scan (same deterministic tie
    order); wrong ORDER BY / unaligned range / unregistered key fall
    back to sql."""
    from uwheel_datafusion_spark.operators.distinct import build_count_pairs

    ev = load_table(spark, sf_smoke, "events")
    pairs = build_count_pairs(ev, "ts", "user_id", WM, ADV, cache=False)
    router.register_count_rollup("events", "user_id", "ts", pairs, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000
    q = (
        f"SELECT user_id, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 5"
    )
    df = router.sql(q)
    assert router.last_decision.path == "count_rollup", router.last_decision
    got = [(r["user_id"], r["cnt"]) for r in df.collect()]
    truth = [(r["user_id"], r["cnt"]) for r in spark.sql(q).collect()]
    assert got == truth and len(got) == 5

    # ORDER BY a non-count column → sql
    router.sql(
        f"SELECT user_id, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY user_id ORDER BY user_id DESC LIMIT 5"
    )
    assert router.last_decision.path == "sql"

    # unaligned endpoint → sql
    router.sql(
        f"SELECT user_id, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s + 1)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY user_id ORDER BY cnt DESC LIMIT 5"
    )
    assert router.last_decision.path == "sql"

    # unregistered key column → sql
    router.sql(
        f"SELECT event_type, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY event_type ORDER BY cnt DESC LIMIT 5"
    )
    assert router.last_decision.path == "sql"

    # count-only ORDER BY (no tie-break) still rewrites
    router.sql(
        f"SELECT user_id, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1 ORDER BY COUNT(*) DESC LIMIT 5"
    )
    assert router.last_decision.path == "count_rollup"


def test_quantile_rollup_median_route_and_fallbacks(spark, sf_smoke, router):
    """APPROX_MEDIAN routes to the histogram rollup — scalar and
    GROUP BY date_trunc forms — and matches the deterministic
    histogram-median arithmetic; unaligned range / unregistered column
    fall back to sql."""
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        build_histogram_rollup,
        grouped_quantile_df,
        range_quantile_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    hist = build_histogram_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_histogram_rollup(
        "events", "value", "ts", hist, WM, ADV
    )
    s, e = WM, WM + 7 * 86_400_000

    # scalar form, via both .sql and .sql_scalar
    q = (
        f"SELECT APPROX_MEDIAN(value) AS m FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = router.sql(q).collect()[0]["m"]
    assert router.last_decision.path == "quantile_rollup"
    want = range_quantile_df(hist, s, e, 0.5).collect()[0][0]
    assert got == want
    assert router.sql_scalar(q) == want

    # grouped form
    qd = (
        f"SELECT date_trunc('day', ts) AS b, APPROX_MEDIAN(value) AS m "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(qd)
    assert router.last_decision.path == "quantile_rollup"
    got_days = {
        (r["b"], r["m"]) for r in df.collect()
    }
    want_days = {
        (r["bucket_ms"], r["approx_quantile"])
        for r in grouped_quantile_df(hist, 86_400_000, 0.5).filter(
            (F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e)
        ).collect()
    }
    from uwheel_datafusion_spark.functions.time import to_epoch_ms as _to_ms

    got_days_ms = {(int(b.timestamp() * 1000), m) for b, m in got_days}
    assert got_days_ms == want_days
    # grouped form is non-scalar
    with pytest.raises(ValueError):
        router.sql_scalar(qd)

    # unaligned endpoint → sql
    router.sql(
        f"SELECT APPROX_MEDIAN(value) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s + 1)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    assert router.last_decision.path == "sql"

    # unregistered value column → sql
    router.sql(
        f"SELECT APPROX_MEDIAN(user_id) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    assert router.last_decision.path == "sql"


def test_quantile_rollup_percentile_cont(spark, sf_smoke, router):
    """APPROX_PERCENTILE_CONT(col, q) routes like APPROX_MEDIAN with
    the literal q driving the CDF walk; the fallback shim lets the
    DataFusion spelling run on plain Spark too."""
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        build_histogram_rollup,
        range_quantile_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    hist = build_histogram_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_histogram_rollup("events", "value", "ts", hist, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000
    for q in (0.1, 0.9):
        got = router.sql_scalar(
            f"SELECT APPROX_PERCENTILE_CONT(value, {q}) FROM events "
            f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
        )
        assert router.last_decision.path == "quantile_rollup"
        want = range_quantile_df(hist, s, e, q).collect()[0][0]
        assert got == want, q

    # unregistered column falls back AND still executes via the shim
    row = router.sql(
        f"SELECT APPROX_PERCENTILE_CONT(user_id, 0.5) AS p FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    ).collect()[0]
    assert router.last_decision.path == "sql"
    assert row["p"] is not None


def test_quarter_rollup_alignment(spark, sf_smoke, router):
    """Quarter buckets fold from the day rollup; a month-aligned but
    not quarter-aligned endpoint falls back to sql."""
    s = to_epoch_ms(datetime(2024, 1, 1))
    e_bad = to_epoch_ms(datetime(2024, 2, 1))  # month-aligned only
    router.sql(
        f"SELECT date_trunc('quarter', ts) AS b, SUM(value) AS s FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e_bad)}' GROUP BY 1"
    )
    assert router.last_decision.path == "sql"
    assert "quarter-aligned" in router.last_decision.reason


def test_keyed_quantile_rollup_route(spark, sf_smoke, router):
    """Per-series APPROX_MEDIAN routes to the keyed histogram rollup
    and matches the keyed serving function; an unregistered key falls
    back."""
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        build_keyed_histogram_rollup,
        keyed_grouped_quantile_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    khist = build_keyed_histogram_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    router.register_keyed_histogram_rollup(
        "events", "event_type", "value", "ts", khist, WM, ADV
    )
    s, e = WM, WM + 7 * 86_400_000
    df = router.sql(
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"APPROX_MEDIAN(value) AS m FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1, 2"
    )
    assert router.last_decision.path == "keyed_quantile_rollup"
    got = {
        (r["event_type"], int(r["b"].timestamp() * 1000), r["m"])
        for r in df.collect()
    }
    want = {
        (r["grp"], r["bucket_ms"], r["approx_quantile"])
        for r in keyed_grouped_quantile_df(khist, 86_400_000, 0.5)
        .filter((F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e))
        .collect()
    }
    assert got == want

    router.sql(
        f"SELECT user_id, date_trunc('day', ts) AS b, "
        f"APPROX_MEDIAN(value) AS m FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1, 2"
    )
    assert router.last_decision.path == "sql"


def _ms(b):
    return int(b.timestamp() * 1000)


def test_ohlc_rollup_route_and_fallbacks(spark, sf_smoke, router):
    """The candlestick shape (min_by/max/min/max_by) routes to the
    OHLC rollup — scalar and GROUP BY date_trunc forms — and matches
    the operators/ohlc serving frames; unservable forms fall back
    verbatim (min_by/max_by are Spark builtins, so they still run)."""
    from uwheel_datafusion_spark.operators.ohlc import (
        build_ohlc_rollup,
        cascade_ohlc,
        range_ohlc_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    rollup = build_ohlc_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_ohlc_rollup("events", "value", "ts", rollup, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000

    q = (
        f"SELECT min_by(value, ts) AS open, max(value) AS high, "
        f"min(value) AS low, max_by(value, struct(ts, value)) AS close, "
        f"count(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = router.sql(q).collect()[0]
    assert router.last_decision.path == "ohlc_rollup"
    want = range_ohlc_df(rollup, s, e).collect()[0]
    assert tuple(got) == tuple(want)

    # grouped day form matches the cascade
    qd = (
        f"SELECT date_trunc('day', ts) AS b, min_by(value, ts) AS open, "
        f"max(value) AS high, min(value) AS low, max_by(value, ts) AS close "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(qd)
    assert router.last_decision.path == "ohlc_rollup"
    got_days = {
        (_ms(r["b"]), r["open"], r["high"], r["low"], r["close"])
        for r in df.collect()
    }
    want_days = {
        (r["bucket_ms"], r["open"], r["high"], r["low"], r["close"])
        for r in cascade_ohlc(rollup, 86_400_000)
        .filter((F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e))
        .collect()
    }
    assert got_days == want_days

    # unaligned endpoint → verbatim fallback, still runs and agrees
    # with the full-scan truth
    q_un = (
        f"SELECT min_by(value, ts) AS open, max(value) AS high, "
        f"min(value) AS low, max_by(value, ts) AS close, count(*) AS cnt "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s + 1)}' "
        f"AND ts < '{ms_to_ts_literal(e)}'"
    )
    got_fb = router.sql(q_un).collect()[0]
    assert router.last_decision.path == "sql"
    want_fb = spark.sql(q_un).collect()[0]
    assert tuple(got_fb) == tuple(want_fb)

    # wrong order key → sql
    router.sql(
        f"SELECT min_by(value, user_id) AS open, max(value) AS high, "
        f"min(value) AS low, max_by(value, user_id) AS close FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    assert router.last_decision.path == "sql"


def test_twa_rollup_route_and_fallback(spark, sf_smoke, router):
    """TWA(value, ts) routes to the TWA rollup (scalar + grouped); a
    router WITHOUT the registration lowers the same query to the
    generated lag-window scan, which must agree exactly with the
    rollup path (the lowering implements the same LOCF integral)."""
    from uwheel_datafusion_spark.operators.twa import (
        build_twa_rollup,
        grouped_twa_df,
        range_twa_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    rollup = build_twa_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_twa_rollup("events", "value", "ts", rollup, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000

    q = (
        f"SELECT TWA(value, ts) AS twa, COUNT(*) AS cnt FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = router.sql(q).collect()[0]
    assert router.last_decision.path == "twa_rollup"
    want = range_twa_df(rollup, s, e).collect()[0]
    assert (got["twa"], got["cnt"]) == (want["twa"], want["cnt"])

    # TIME_WEIGHTED_AVG spelling routes too
    q2 = q.replace("TWA(", "TIME_WEIGHTED_AVG(")
    assert router.sql(q2).collect()[0]["twa"] == want["twa"]
    assert router.last_decision.path == "twa_rollup"

    qd = (
        f"SELECT date_trunc('day', ts) AS b, TWA(value, ts) AS twa "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(qd)
    assert router.last_decision.path == "twa_rollup"
    got_days = {(_ms(r["b"]), r["twa"]) for r in df.collect()}
    want_days = {
        (r["bucket_ms"], r["twa"])
        for r in grouped_twa_df(rollup, 86_400_000)
        .filter((F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e))
        .collect()
    }
    assert got_days == want_days

    # unregistered router → lag-window fallback, exact same numbers
    bare = WheelSqlRouter(spark)
    got_fb = bare.sql(q).collect()[0]
    assert bare.last_decision.path == "sql"
    assert bare.last_decision.fallback_sql is not None
    assert (got_fb["twa"], got_fb["cnt"]) == (want["twa"], want["cnt"])
    fb_days = {(_ms(r["b"]), r["twa"]) for r in bare.sql(qd).collect()}
    assert fb_days == want_days


def test_counter_rollup_route_and_fallback(spark, sf_smoke, router):
    """COUNTER_INCREASE/COUNTER_RATE route to the counter rollup; the
    unregistered lowering (lag-window scan) agrees exactly."""
    from uwheel_datafusion_spark.operators.counter import (
        build_counter_rollup,
        grouped_increase_df,
        range_increase_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    rollup = build_counter_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_counter_rollup("events", "value", "ts", rollup, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000

    q = (
        f"SELECT COUNTER_INCREASE(value, ts) AS increase, "
        f"COUNTER_RATE(value, ts) AS rate_per_sec, COUNT(*) AS cnt "
        f"FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = router.sql(q).collect()[0]
    assert router.last_decision.path == "counter_rollup"
    want = range_increase_df(rollup, s, e).collect()[0]
    assert tuple(got) == tuple(want)

    qd = (
        f"SELECT date_trunc('day', ts) AS b, "
        f"COUNTER_INCREASE(value, ts) AS increase FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    df = router.sql(qd)
    assert router.last_decision.path == "counter_rollup"
    got_days = {(_ms(r["b"]), r["increase"]) for r in df.collect()}
    want_days = {
        (r["bucket_ms"], r["increase"])
        for r in grouped_increase_df(rollup, 86_400_000)
        .filter((F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e))
        .collect()
    }
    assert got_days == want_days

    # unregistered router → lag-window fallback, exact same numbers
    bare = WheelSqlRouter(spark)
    got_fb = bare.sql(q).collect()[0]
    assert bare.last_decision.path == "sql"
    assert tuple(got_fb) == tuple(want)
    fb_days = {(_ms(r["b"]), r["increase"]) for r in bare.sql(qd).collect()}
    assert fb_days == want_days


def test_keyed_stitch_router_cells(spark, sf_smoke, router):
    """Per-series candlestick / TWA / counter SQL shapes (SELECT key,
    date_trunc, items ... GROUP BY 1, 2) route to the keyed rollups and
    match the operators' keyed serving frames; keyed TWA/counter
    fallbacks (keyed lag-window lowering) agree exactly."""
    from uwheel_datafusion_spark.operators.counter import (
        build_keyed_counter_rollup,
        keyed_grouped_increase_df,
    )
    from uwheel_datafusion_spark.operators.ohlc import (
        build_keyed_ohlc_rollup,
        cascade_keyed_ohlc,
    )
    from uwheel_datafusion_spark.operators.twa import (
        build_keyed_twa_rollup,
        keyed_grouped_twa_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    day = 86_400_000
    s, e = WM, WM + 7 * day
    rng = (
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1, 2"
    )
    in_rng = (F.col("bucket_ms") >= s) & (F.col("bucket_ms") < e)

    koh = build_keyed_ohlc_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    router.register_keyed_ohlc_rollup(
        "events", "event_type", "value", "ts", koh, WM, ADV
    )
    df = router.sql(
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"min_by(value, ts) AS open, max(value) AS high, "
        f"min(value) AS low, max_by(value, ts) AS close {rng}"
    )
    assert router.last_decision.path == "keyed_ohlc_rollup"
    got = {
        (r["event_type"], _ms(r["b"]), r["open"], r["close"])
        for r in df.collect()
    }
    want = {
        (r["grp"], r["bucket_ms"], r["open"], r["close"])
        for r in cascade_keyed_ohlc(koh, day).filter(in_rng).collect()
    }
    assert got == want and len(want) > 0

    ktw = build_keyed_twa_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    router.register_keyed_twa_rollup(
        "events", "event_type", "value", "ts", ktw, WM, ADV
    )
    q_twa = (
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"TWA(value, ts) AS twa, COUNT(*) AS cnt {rng}"
    )
    df = router.sql(q_twa)
    assert router.last_decision.path == "keyed_twa_rollup"
    got = {
        (r["event_type"], _ms(r["b"]), r["twa"], r["cnt"])
        for r in df.collect()
    }
    want = {
        (r["grp"], r["bucket_ms"], r["twa"], r["cnt"])
        for r in keyed_grouped_twa_df(ktw, day).filter(in_rng).collect()
    }
    assert got == want

    kct = build_keyed_counter_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    router.register_keyed_counter_rollup(
        "events", "event_type", "value", "ts", kct, WM, ADV
    )
    q_ctr = (
        f"SELECT event_type, date_trunc('day', ts) AS b, "
        f"COUNTER_INCREASE(value, ts) AS increase, "
        f"COUNTER_RATE(value, ts) AS rate_per_sec {rng}"
    )
    df = router.sql(q_ctr)
    assert router.last_decision.path == "keyed_counter_rollup"
    got = {
        (r["event_type"], _ms(r["b"]), r["increase"], r["rate_per_sec"])
        for r in df.collect()
    }
    want = {
        (r["grp"], r["bucket_ms"], r["increase"], r["rate_per_sec"])
        for r in keyed_grouped_increase_df(kct, day).filter(in_rng).collect()
    }
    assert got == want

    # keyed fallbacks (unregistered router): keyed lag-window lowering
    # must agree exactly with the rollup-served values
    bare = WheelSqlRouter(spark)
    fb = {
        (r["event_type"], _ms(r["b"]), r["twa"], r["cnt"])
        for r in bare.sql(q_twa).collect()
    }
    assert bare.last_decision.path == "sql"
    assert fb == {
        (r["grp"], r["bucket_ms"], r["twa"], r["cnt"])
        for r in keyed_grouped_twa_df(ktw, day).filter(in_rng).collect()
    }
    fb_c = {
        (r["event_type"], _ms(r["b"]), r["increase"], r["rate_per_sec"])
        for r in bare.sql(q_ctr).collect()
    }
    assert fb_c == want


def test_m4_route_and_fallback(spark, sf_smoke, router):
    """M4(value, ts, n) routes to the OHLC rollup as a per-pixel
    candle re-combine; a router WITHOUT the registration lowers the
    dialect query to a generated min_by/max_by scan with the same
    pixel geometry — both paths agree bit-for-bit."""
    from uwheel_datafusion_spark.operators.ohlc import (
        build_ohlc_rollup,
        m4_downsample_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    rollup = build_ohlc_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_ohlc_rollup("events", "value", "ts", rollup, WM, ADV)
    s, e = WM, WM + 2 * 86_400_000  # 2 days at 96 px → 30-min pixels

    q = (
        f"SELECT M4(value, ts, 96) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = sorted(map(tuple, router.sql(q).collect()))
    assert router.last_decision.path == "m4_rollup"
    want = sorted(
        map(tuple, m4_downsample_df(rollup, s, e, n_pixels=96).collect())
    )
    assert got == want and len(got) > 0

    # no registration → generated fallback scan, same pixels
    bare = WheelSqlRouter(spark)
    got_fb = sorted(map(tuple, bare.sql(q).collect()))
    assert bare.last_decision.path == "sql"
    assert "no OHLC rollup" in bare.last_decision.reason
    assert got_fb == want

    # unaligned endpoint → fallback, still the same raw-truth pixels
    q_un = (
        f"SELECT M4(value, ts, 96) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s + 1)}' "
        f"AND ts < '{ms_to_ts_literal(e)}'"
    )
    df_un = router.sql(q_un)
    assert router.last_decision.path == "sql"
    assert df_un.count() > 0

    # scalar entry refuses the multi-row family
    with pytest.raises(ValueError):
        router.sql_scalar(q)


def test_keyed_m4_route_and_fallback(spark, sf_smoke, router):
    """SELECT key, M4(value, ts, n) … GROUP BY key routes to the keyed
    OHLC rollup (every series' panel in one re-combine); without the
    registration the keyed rank-window lowering produces identical
    pixels."""
    from uwheel_datafusion_spark.operators.ohlc import (
        build_keyed_ohlc_rollup,
        m4_downsample_keyed_df,
    )

    ev = load_table(spark, sf_smoke, "events")
    rollup = build_keyed_ohlc_rollup(
        ev, "ts", "value", "event_type", WM, ADV, cache=False
    )
    router.register_keyed_ohlc_rollup(
        "events", "event_type", "value", "ts", rollup, WM, ADV
    )
    s, e = WM, WM + 2 * 86_400_000

    q = (
        f"SELECT event_type AS sym, M4(value, ts, 96) FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}' "
        f"GROUP BY 1"
    )
    got = sorted(map(tuple, router.sql(q).collect()))
    assert router.last_decision.path == "keyed_m4_rollup"
    want = sorted(
        map(
            tuple,
            m4_downsample_keyed_df(rollup, s, e, n_pixels=96)
            .withColumnRenamed("grp", "sym")
            .collect(),
        )
    )
    assert got == want and len(got) > 0

    bare = WheelSqlRouter(spark)
    got_fb = sorted(map(tuple, bare.sql(q).collect()))
    assert bare.last_decision.path == "sql"
    assert "no keyed OHLC rollup" in bare.last_decision.reason
    assert got_fb == want


def test_ungrouped_fallback_plan_is_not_a_global_sort(spark, sf_smoke):
    """VERDICT r06 #2: the ungrouped TWA/counter lowering used to emit
    a no-PARTITION-BY lag window — every fact row of the range through
    ONE task's sort. The slot-partial rewrite must hash-partition the
    fact rows (sub-slot window) BEFORE anything single-partition: in
    the executed plan (printed top-down), the segment between the last
    SinglePartition exchange and the parquet scan must contain a
    hashpartitioning exchange."""
    load_table(spark, sf_smoke, "events").createOrReplaceTempView("events")
    bare = WheelSqlRouter(spark)
    s, e = WM, WM + 7 * 86_400_000
    for fn in ("TWA(value, ts)", "COUNTER_INCREASE(value, ts)"):
        q = (
            f"SELECT {fn} AS x FROM events "
            f"WHERE ts >= '{ms_to_ts_literal(s)}' "
            f"AND ts < '{ms_to_ts_literal(e)}'"
        )
        df = bare.sql(q)
        assert bare.last_decision.path == "sql"
        assert bare.last_decision.fallback_sql is not None
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FileScan parquet" in plan, plan
        below_single = plan.rsplit("SinglePartition", 1)[-1]
        assert "Exchange hashpartitioning" in below_single, (
            f"{fn}: fact rows reach a single-partition operator without "
            f"a prior hash-partitioned stage\n{plan}"
        )


def test_granularity_finer_than_slot_falls_back(spark, sf_smoke):
    """ADVICE r06 #2: an hour-slot rollup must NOT serve a per-minute
    GROUP BY — the cascade would emit hour buckets mislabeled as
    minutes. Finer-than-slot granularities fall back to SQL (and the
    fallback agrees with a raw scan)."""
    from uwheel_datafusion_spark.functions.time import HOUR_MS
    from uwheel_datafusion_spark.operators.twa import build_twa_rollup

    ev = load_table(spark, sf_smoke, "events")
    ev.createOrReplaceTempView("events")
    r = WheelSqlRouter(spark)
    rollup = build_twa_rollup(
        ev, "ts", "value", WM, ADV, slot_ms=HOUR_MS, cache=False
    )
    r.register_twa_rollup(
        "events", "value", "ts", rollup, WM, ADV, slot_ms=HOUR_MS
    )
    s, e = WM, WM + 86_400_000
    q_min = (
        f"SELECT date_trunc('minute', ts) AS b, TWA(value, ts) AS twa "
        f"FROM events WHERE ts >= '{ms_to_ts_literal(s)}' "
        f"AND ts < '{ms_to_ts_literal(e)}' GROUP BY 1"
    )
    r.sql(q_min)
    assert r.last_decision.path == "sql"
    assert "finer than the rollup slot grain" in r.last_decision.reason
    # hour+ grains still serve from the hour-slot rollup
    r.sql(q_min.replace("'minute'", "'hour'"))
    assert r.last_decision.path == "twa_rollup"
    r.sql(q_min.replace("'minute'", "'day'"))
    assert r.last_decision.path == "twa_rollup"


def test_leading_dot_quantile_literal_routes(spark, sf_smoke, router):
    """ADVICE r06 #5: APPROX_PERCENTILE_CONT(v, .5) is valid SQL and
    must take the histogram-rollup rewrite, not silently fall back."""
    from uwheel_datafusion_spark.operators.quantile_rollup import (
        build_histogram_rollup,
    )

    ev = load_table(spark, sf_smoke, "events")
    hist = build_histogram_rollup(ev, "ts", "value", WM, ADV, cache=False)
    router.register_histogram_rollup("events", "value", "ts", hist, WM, ADV)
    s, e = WM, WM + 7 * 86_400_000
    q = (
        f"SELECT APPROX_PERCENTILE_CONT(value, .5) AS med FROM events "
        f"WHERE ts >= '{ms_to_ts_literal(s)}' AND ts < '{ms_to_ts_literal(e)}'"
    )
    got = router.sql(q).collect()[0]["med"]
    assert router.last_decision.path == "quantile_rollup"
    want = router.sql(q.replace(", .5", ", 0.5")).collect()[0]["med"]
    assert router.last_decision.path == "quantile_rollup"
    assert got == want
