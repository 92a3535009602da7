"""Z-order layout (sources/zorder): the claim is FILE SKIPPING — a
z-ordered table answers selective predicates on EVERY z-ordered column
from a small fraction of files, where a time-sorted layout serves
non-time predicates from all of them. Audited with parquet footer
stats (pyarrow; the same min/max an engine's pushdown uses) and
checked for read-back correctness."""

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.sources.registry import load_table
from uwheel_datafusion_spark.sources.zorder import (
    overlapping_fraction,
    zorder_write,
    zvalue_expr,
)

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_correctness, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = (
        load_table(spark, sf_correctness, "events")
        .withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))
        .select("ts_ms", "user_id", "value")
    )
    linear = str(base / "linear")
    zed = str(base / "zed")
    # time-sorted layout: the default any append-only pipeline produces
    (
        ev.repartitionByRange(N_FILES, "ts_ms")
        .sortWithinPartitions("ts_ms")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(ev, zed, ["ts_ms", "user_id"], n_files=N_FILES)
    return spark, ev, linear, zed


def test_zvalue_expr_interleaves_bits(spark):
    # 2 cols, 2 bits: x=0b11, y=0b01 → z = x0<<0 | y0<<1 | x1<<2 | y1<<3
    #                                    = 1 + 2 + 4 + 0 = 7
    row = spark.sql(
        f"SELECT {zvalue_expr(['x', 'y'], 2)} AS z FROM (SELECT 3 AS x, 1 AS y)"
    ).first()
    assert row["z"] == 7


def test_zvalue_bit_budget_enforced():
    with pytest.raises(ValueError, match="bit budget"):
        zvalue_expr(["a", "b", "c"], 21)


def test_user_probe_prunes_zorder_not_linear(layouts):
    spark, ev, linear, zed = layouts
    lo, hi = 100, 110  # narrow user slice
    lin_frac = overlapping_fraction(linear, "user_id", lo, hi)
    z_frac = overlapping_fraction(zed, "user_id", lo, hi)
    # time-sorted files all span the full user range; z-ordered files
    # cover user sub-ranges, so most are skippable
    assert lin_frac == 1.0
    assert z_frac <= 0.5, f"z-order pruned nothing: {z_frac}"


def test_time_range_still_prunes_on_zorder(layouts):
    spark, ev, linear, zed = layouts
    bounds = ev.agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")
    ).first()
    span = bounds["mx"] - bounds["mn"]
    lo = bounds["mn"] + span // 2
    hi = lo + span // 20  # 5% time slice
    z_frac = overlapping_fraction(zed, "ts_ms", lo, hi)
    # locality holds in the time dimension too (not as tight as a pure
    # time sort, but far from all-files)
    assert z_frac <= 0.5, f"z-order lost time locality: {z_frac}"


def test_zorder_readback_is_correct(layouts):
    spark, ev, linear, zed = layouts
    truth = ev.filter(
        (F.col("user_id") >= 100) & (F.col("user_id") <= 110)
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr("CAST(round(value*1000000) AS BIGINT)")).alias("s"),
    ).first()
    got = (
        spark.read.parquet(zed)
        .filter((F.col("user_id") >= 100) & (F.col("user_id") <= 110))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.expr("CAST(round(value*1000000) AS BIGINT)")).alias("s"),
        )
        .first()
    )
    assert (got["c"], got["s"]) == (truth["c"], truth["s"])
    assert got["c"] > 0


def test_scan_plan_pushes_predicate(layouts):
    spark, ev, linear, zed = layouts
    df = spark.read.parquet(zed).filter(F.col("user_id") == 105)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan


def test_zvalue_deinterleave_property(spark):
    """Property (hypothesis): the Morton key round-trips — de-
    interleaving bit position b·n+c recovers bit b of column c, for
    every column, across random values and widths."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=2, max_value=3),
        st.lists(st.integers(min_value=0, max_value=255), min_size=3, max_size=3),
    )
    def check(n_cols, vals):
        bits = 8
        vals = vals[:n_cols]
        expr = zvalue_expr([f"c{i}" for i in range(n_cols)], bits)
        cols = ", ".join(
            f"CAST({v} AS BIGINT) AS c{i}" for i, v in enumerate(vals)
        )
        z = spark.sql(f"SELECT {expr} AS z FROM (SELECT {cols})").first()["z"]
        for c in range(n_cols):
            recovered = 0
            for b in range(bits):
                recovered |= ((z >> (b * n_cols + c)) & 1) << b
            assert recovered == vals[c], (vals, n_cols, z)

    check()
