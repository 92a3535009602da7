"""Catalyst-visible wheel rewrite (round 13 — SURVEY §7.6 stretch):
the JVM optimizer rule must rewrite an aligned SUM-range plan onto the
materialized rollup (fact table NEVER scanned), bail to the scan on
every shape it cannot prove, and uninstall cleanly."""

import os

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark import WheelIndex
from uwheel_datafusion_spark.functions.time import ms_to_ts_literal
from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS
from uwheel_datafusion_spark.plans import catalyst_rule as cr
from uwheel_datafusion_spark.sources.registry import load_table

MINUTE_MS = 60_000

pytestmark = pytest.mark.skipif(
    not cr.javac_available(), reason="no JDK javac in this environment"
)


def _plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_catalyst_rule_rewrites_aligned_sum(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    idx = WheelIndex.build(
        ev, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS
    )
    idx.save(str(tmp_path / "wheel"))
    rollup = spark.read.parquet(str(tmp_path / "wheel" / "agg_minute"))
    ev.createOrReplaceTempView("events_cat13")
    s = EVENTS_WM_MS + 24 * 60 * MINUTE_MS
    e = EVENTS_WM_MS + 20 * 24 * 60 * MINUTE_MS
    q = (
        "SELECT SUM(value) AS s FROM events_cat13 "
        f"WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}' "
        f"AND ts < TIMESTAMP '{ms_to_ts_literal(e)}'"
    )
    baseline = spark.sql(q).collect()[0]["s"]
    cls = cr.install(spark, "events_cat13", rollup)
    try:
        df = spark.sql(q)
        plan = _plan_str(df)
        # THE pin: the fact table is never scanned; the rollup is
        # (plan toString truncates paths, so pin on the ReadSchema —
        # the scan reads the rollup's columns, not the fact's)
        assert "events.parquet" not in plan, plan
        assert "bucket_ms:bigint,sum_micros:bigint" in plan, plan
        # the 100 TB read path: the injected per-query pruning reaches
        # the rollup scan — dt bounds as PARTITION filters (day dirs
        # listed, not read) and the bucket_ms range as pushed filters
        # (parquet row-group stats)
        assert "PartitionFilters: [" in plan and "dt#" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0], plan
        assert "GreaterThanOrEqual(bucket_ms" in plan, plan
        got = df.collect()[0]["s"]
        # the rewritten plan sums per-minute double sums — identical
        # up to float re-association; the driver index's exact-micros
        # sum is the bit-exact reference
        di = idx.to_driver_index()
        exact = di.query_sum(s, e)
        assert got == pytest.approx(exact, rel=1e-9)
        assert baseline == pytest.approx(exact, rel=1e-9)
        # DataFrame-API plans (no SQL string at all) rewrite too —
        # the point of being a real optimizer rule
        dfq = (
            spark.table("events_cat13")
            .filter(
                (F.col("ts") >= F.lit(ms_to_ts_literal(s)).cast(
                    "timestamp_ntz"
                ))
                & (F.col("ts") < F.lit(ms_to_ts_literal(e)).cast(
                    "timestamp_ntz"
                ))
            )
            .agg(F.sum("value").alias("s"))
        )
        assert "events.parquet" not in _plan_str(dfq)
        assert dfq.collect()[0]["s"] == pytest.approx(exact, rel=1e-9)
        # UNALIGNED endpoint: the rule must bail — fact scan stays
        q2 = (
            "SELECT SUM(value) AS s FROM events_cat13 "
            f"WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}' "
            f"AND ts < TIMESTAMP '{ms_to_ts_literal(e + 30_000)}'"
        )
        assert "events.parquet" in _plan_str(spark.sql(q2))
        # non-SUM aggregate: bail (COUNT over rollup rows would count
        # buckets, not events)
        q3 = (
            "SELECT COUNT(*) AS c FROM events_cat13 "
            f"WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}' "
            f"AND ts < TIMESTAMP '{ms_to_ts_literal(e)}'"
        )
        assert "events.parquet" in _plan_str(spark.sql(q3))
        # grouping: bail
        q4 = (
            "SELECT event_type, SUM(value) AS s FROM events_cat13 "
            f"WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s)}' "
            f"AND ts < TIMESTAMP '{ms_to_ts_literal(e)}' GROUP BY 1"
        )
        assert "events.parquet" in _plan_str(spark.sql(q4))
    finally:
        cr.uninstall(spark, cls)
    # after uninstall the aligned query scans the fact again
    assert "events.parquet" in _plan_str(spark.sql(q))
