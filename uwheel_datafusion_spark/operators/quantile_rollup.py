"""Quantile aggregator via equi-width histogram partials — the third
mergeable-sketch family (after the exact-pair and HLL distinct rollups,
operators/distinct.py).

Like COUNT(DISTINCT), a quantile's per-bucket result does not combine
across buckets, so it cannot ride the sum/cnt/min/max rollup (SURVEY
§1.3: the partial must be a mergeable summary, the reference's
aggregator-framework contract). The mergeable partial here is an
equi-width histogram: per time slot, counts per value bin
``(bucket_ms, bin, cnt)`` with ``bin = floor(value / bin_width)``.

- **Merge** = add counts per bin (associative + commutative), so any
  bucket-aligned range — and any coarser grain (A4 cascade) — combines
  exactly like the wheel's monoid partials.
- **Serve** = walk the merged CDF: the q-quantile's bin is the first
  whose cumulative count reaches ``ceil(q·n)``; answer the bin
  midpoint. The rank-q element provably lies inside that bin, so the
  error is bounded by ``bin_width`` — a hard bound, not probabilistic
  (the gate asserts it in-query, the same pattern as the HLL 5 % band).
- **Scale shape**: rollup size = slots × occupied bins, flat in row
  count; serving touches only the covered slots' bins (the probe
  predicate also prunes day partitions on a reopened rollup via
  wheel._bucket_range_pred). The non-mergeable alternatives — exact
  sort (operators/sampling.exact_deciles) and percentile_approx — both
  re-scan fact rows per query.

The fixed-grid histogram is the right first sketch because it is
deterministic and therefore ORACLE-EXACT: DuckDB replays the identical
integer binning + window arithmetic bit-for-bit (no RNG, no merge-order
sensitivity). KLL/t-digest give adaptive error for heavy-tailed data
but are merge-order-sensitive, so they would demote the gate to a
tolerance check; named here as the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    MINUTE_MS,
    bucket_ms,
    ts_range_pred,
    ts_to_ms,
)

DEFAULT_BIN_WIDTH = 1.0

#: single-partition serving cutoff: below this many (slot, bin) cells
#: a cached one-partition rollup probes fastest (one task); above it,
#: parallelism wins (see build_histogram_rollup)
SMALL_ROLLUP_CELLS = 500_000


def build_histogram_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    bin_width: float = DEFAULT_BIN_WIDTH,
    cache: bool = True,
) -> DataFrame:
    """One scan (watermark range pushed to parquet stats) + one shuffle
    on (bucket, bin) with map-side partial counts."""
    rollup = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
        )
        .groupBy("bucket_ms", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Serving layout is ADAPTIVE (sf100 scale-run lesson): the cell
    # count is bounded by slots × occupied bins — flat in FACT rows,
    # but not small in absolute terms (31 d of minutes × 100 bins ≈
    # 4.4 M cells once the facts densify them). A small rollup serves
    # fastest from ONE cached partition (single-task probes, no
    # near-empty launches); a dense one must keep its parallelism or
    # every probe serializes a multi-million-row merge onto one core
    # (measured: 970 ms/probe single-partition vs a parallel merge —
    # the bin merge is map-side combinable to ≤ bins rows/partition).
    if not cache:
        return rollup
    cached = rollup.cache()
    if cached.count() <= SMALL_ROLLUP_CELLS:
        small = cached.coalesce(1).cache()
        small.count()
        cached.unpersist()
        return small
    return cached


def cascade_histogram(rollup: DataFrame, slot_ms: int) -> DataFrame:
    """A4 tick/rotate for histograms: coarse slots merge fine ones by
    adding per-bin counts — exactly equal to a direct coarse build."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return rollup.groupBy(coarse, "bin").agg(F.sum("cnt").alias("cnt"))


def range_quantile_df(
    rollup: DataFrame,
    start_ms: int,
    end_ms: int,
    q: float,
    bin_width: float = DEFAULT_BIN_WIDTH,
) -> DataFrame:
    """Approximate q-quantile over the bucket-aligned ``[start, end)``:
    merge covered slots' bins, pick the first bin whose cumulative
    count reaches ``q·n``, answer its midpoint. 1-row
    ``(approx_quantile double)``; null for an empty range. Work is
    bounded by occupied bins, never fact rows."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    bins = (
        rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # single-pass CDF walk: pack the (tiny) merged-bin set into one
    # sorted array and find the threshold bin with one higher-order
    # aggregate — two stages total (bin merge + global agg) instead of
    # the window formulation's extra single-partition sort stages; at
    # serving time the per-job stage count IS the latency
    packed = bins.agg(
        F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("bc"),
        F.sum("cnt").alias("total"),
    )
    walk = f"""
        aggregate(
            bc,
            struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS b),
            (acc, x) -> struct(
                acc.cum + x.cnt,
                CASE WHEN acc.b IS NULL
                          AND (acc.cum + x.cnt) >= {q} * total
                     THEN x.bin ELSE acc.b END),
            acc -> acc.b)
    """
    return packed.select(
        ((F.expr(walk) + F.lit(0.5)) * F.lit(bin_width)).alias("approx_quantile")
    )


def range_quantiles_df(
    rollup: DataFrame,
    start_ms: int,
    end_ms: int,
    qs: "list[float]",
    bin_width: float = DEFAULT_BIN_WIDTH,
) -> DataFrame:
    """All requested quantiles of the bucket-aligned ``[start, end)``
    in ONE job: the bins merge once, the sorted array packs once, and
    each q walks the same (tiny) in-memory array — a full percentile
    table (p10/p50/p90/p99…) costs exactly one bin-merge shuffle, not
    len(qs) serving queries. 1-row output, one
    ``approx_q<percent>`` double column per q (e.g. q=0.25 →
    ``approx_q25``); nulls for an empty range."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    bins = (
        rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    packed = bins.agg(
        F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("bc"),
        F.sum("cnt").alias("total"),
    )
    cols = []
    for q in qs:
        walk = f"""
            aggregate(
                bc,
                struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS b),
                (acc, x) -> struct(
                    acc.cum + x.cnt,
                    CASE WHEN acc.b IS NULL
                              AND (acc.cum + x.cnt) >= {q} * total
                         THEN x.bin ELSE acc.b END),
                acc -> acc.b)
        """
        name = f"approx_q{round(q * 100):d}"
        cols.append(
            ((F.expr(walk) + F.lit(0.5)) * F.lit(bin_width)).alias(name)
        )
    return packed.select(*cols)


def grouped_quantile_df(
    rollup: DataFrame,
    slot_ms: int,
    q: float,
    bin_width: float = DEFAULT_BIN_WIDTH,
) -> DataFrame:
    """Per-coarse-bucket approximate q-quantile
    ``(bucket_ms, approx_quantile)`` — the day/hour serving shape, one
    CDF walk per bucket over its occupied bins."""
    coarse = cascade_histogram(rollup, slot_ms)
    w_cum = (
        Window.partitionBy("bucket_ms")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("bucket_ms")
    cdf = coarse.select(
        "bucket_ms",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return cdf.groupBy("bucket_ms").agg(
        (
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin")
                    )
                )
                + F.lit(0.5)
            )
            * F.lit(bin_width)
        ).alias("approx_quantile")
    )


def build_keyed_histogram_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    bin_width: float = DEFAULT_BIN_WIDTH,
    cache: bool = True,
) -> DataFrame:
    """Keyed (per-series) histogram partial ``(grp, bucket_ms, bin,
    cnt)`` — one logical histogram wheel per key sharing a single
    build shuffle (the keyed_wheel/keyed-distinct pattern applied to
    the quantile family)."""
    rollup = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            F.col(key_col).alias("grp"),
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
        )
        .groupBy("grp", "bucket_ms", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return rollup.cache() if cache else rollup


def keyed_grouped_quantile_df(
    rollup: DataFrame,
    slot_ms: int,
    q: float,
    bin_width: float = DEFAULT_BIN_WIDTH,
) -> DataFrame:
    """Per-(series, coarse-bucket) approximate q-quantile
    ``(grp, bucket_ms, approx_quantile)`` — one CDF walk per (series,
    bucket) over its occupied bins; collect-free at any key
    cardinality, same ±bin_width hard bound as the unkeyed family."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    merged = rollup.groupBy("grp", coarse, "bin").agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy("grp", "bucket_ms")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("grp", "bucket_ms")
    cdf = merged.select(
        "grp",
        "bucket_ms",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return cdf.groupBy("grp", "bucket_ms").agg(
        (
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin")
                    )
                )
                + F.lit(0.5)
            )
            * F.lit(bin_width)
        ).alias("approx_quantile")
    )
