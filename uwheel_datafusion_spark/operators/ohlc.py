"""first/last/OHLC aggregator — the time-series candlestick family.

TimescaleDB's ``first(value, time)`` / ``last(value, time)`` and
continuous-aggregate OHLC (open-high-low-close) are the canonical
"aggregator whose partial carries its own timestamp": open/close do
not combine by sum or min — the partial must remember WHEN its value
occurred so coarser buckets can pick the earliest/latest (SURVEY §1.3
lift/combine/lower, the same contract as the wheel's 'all' partial).

Per-slot partial: ``(bucket_ms, open_ts_ms, open, high, low,
close_ts_ms, close, cnt)``.

- **lift**: a row lifts to (ts, v, v, v, ts, v, 1);
- **combine**: open of the merge = open of the partial with the
  smaller ``open_ts_ms`` (tie → smaller value, fully deterministic);
  close symmetric with larger ts; high/low/cnt are max/min/sum — all
  associative + commutative, so the A4 cascade (day from minute by
  re-aggregation) is exactly equal to a direct coarse build;
- **lower**: the candlestick columns themselves.

Determinism note: duplicate timestamps inside a bucket are real (ms
resolution), so open/close are defined as "min value among rows at the
earliest ts" (resp. max value at the latest ts) — expressible
identically in Spark (`min_by`/`max_by` over a (ts, value) struct) and
in the DuckDB oracle (window on (ts, value) ordering), which is what
makes the family hash-gateable.

Scale shape: one scan (watermark pushed to parquet stats) + one
shuffle; rollup rows = occupied slots; range/grouped serving touches
only covered slots (day-partition prunable via wheel._bucket_range_pred
on a persisted rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    MINUTE_MS,
    bucket_ms,
    ts_range_pred,
    ts_to_ms,
)

_PARTIAL_COLS = (
    "bucket_ms",
    "open_ts_ms",
    "open",
    "high",
    "low",
    "close_ts_ms",
    "close",
    "cnt",
)


def build_ohlc_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Lift + first combine: one scan, one shuffle on the bucket key.

    ``min_by/max_by`` over a ``struct(ts, value)`` key implements the
    deterministic tie-break (earliest ts, then smallest value for open;
    latest ts, then largest value for close) in a single aggregation —
    no window, no second pass."""
    ms = ts_to_ms(F.col(ts_col))
    v = F.col(value_col).cast("double")
    okey = F.struct(ms.alias("t"), v.alias("v"))  # asc ⇒ earliest, smallest
    ckey = F.struct(ms.alias("t"), v.alias("v"))  # desc via max_by
    rollup = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ms, slot_ms).alias("bucket_ms"),
            ms.alias("ts_ms"),
            v.alias("value"),
            okey.alias("okey"),
            ckey.alias("ckey"),
        )
        .groupBy("bucket_ms")
        .agg(
            F.min_by(F.col("ts_ms"), F.col("okey")).alias("open_ts_ms"),
            F.min_by(F.col("value"), F.col("okey")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("ts_ms"), F.col("ckey")).alias("close_ts_ms"),
            F.max_by(F.col("value"), F.col("ckey")).alias("close"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    # one cached partition: the rollup is tiny regardless of fact size;
    # a range probe should be a single task (cf. WheelIndex build)
    return rollup.coalesce(1).cache() if cache else rollup


def _combine(grouped) -> DataFrame:
    okey = F.struct(
        F.col("open_ts_ms").alias("t"), F.col("open").alias("v")
    )
    ckey = F.struct(
        F.col("close_ts_ms").alias("t"), F.col("close").alias("v")
    )
    return grouped.agg(
        F.min_by(F.col("open_ts_ms"), okey).alias("open_ts_ms"),
        F.min_by(F.col("open"), okey).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by(F.col("close_ts_ms"), ckey).alias("close_ts_ms"),
        F.max_by(F.col("close"), ckey).alias("close"),
        F.sum("cnt").alias("cnt"),
    )


def cascade_ohlc(rollup: DataFrame, slot_ms: int) -> DataFrame:
    """A4 tick/rotate: coarse candles combine fine partials — open from
    the earliest fine open, close from the latest fine close. Exactly
    equal to a direct coarse build (combine is associative; ties break
    on the same (ts, value) key at every level)."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return _combine(rollup.groupBy(coarse))


def m4_downsample_df(
    rollup: DataFrame,
    start_ms: int,
    end_ms: int,
    n_pixels: int,
    slot_ms: int = MINUTE_MS,
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB'14 — the
    standard error-free line-chart downsampler: per pixel column keep
    first/last/min/max, which is exactly an OHLC candle) served from
    the rollup: re-combine slot partials into pixel buckets — the
    dashboard never touches the fact table.

    Pixel width is ``(end−start)/n_pixels`` rounded UP to a multiple
    of the rollup grain (slot-quantized, like detect_gaps_df: a
    non-multiple width would split slots across pixels, which a
    partial can't express). The trailing pixel may therefore cover
    less time; the produced buckets are exact M4 for the quantized
    width. Output: one row per non-empty pixel,
    ``(px_ms, open, high, low, close, cnt)``."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    assert n_pixels >= 1
    span = end_ms - start_ms
    px_ms = max(1, -(-span // n_pixels))  # ceil division
    px_ms = -(-px_ms // slot_ms) * slot_ms  # round up to slot multiple
    part = rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
    px = (
        F.lit(start_ms)
        + F.floor((F.col("bucket_ms") - F.lit(start_ms)) / F.lit(px_ms)).cast(
            "long"
        )
        * F.lit(px_ms)
    ).alias("px_ms")
    return _combine(part.groupBy(px)).select(
        "px_ms", "open", "high", "low", "close", "cnt"
    )


def m4_downsample_keyed_df(
    rollup: DataFrame,
    start_ms: int,
    end_ms: int,
    n_pixels: int,
    slot_ms: int = MINUTE_MS,
) -> DataFrame:
    """Per-series M4: one pixel column per (series, pixel) — the
    multi-line dashboard shape (every symbol's chart from ONE query).
    Same quantization contract as :func:`m4_downsample_df`; the
    re-combine groups by ``(grp, px_ms)`` so the single shuffle is
    over rollup rows (occupied slots × series), never fact rows.
    Output: ``(grp, px_ms, open, high, low, close, cnt)``."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    assert n_pixels >= 1
    span = end_ms - start_ms
    px_ms = max(1, -(-span // n_pixels))
    px_ms = -(-px_ms // slot_ms) * slot_ms
    part = rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
    px = (
        F.lit(start_ms)
        + F.floor((F.col("bucket_ms") - F.lit(start_ms)) / F.lit(px_ms)).cast(
            "long"
        )
        * F.lit(px_ms)
    ).alias("px_ms")
    return _combine(part.groupBy("grp", px)).select(
        "grp", "px_ms", "open", "high", "low", "close", "cnt"
    )


def range_ohlc_df(rollup: DataFrame, start_ms: int, end_ms: int) -> DataFrame:
    """Candlestick of the bucket-aligned ``[start, end)``: combine the
    covered slots' partials (A5 combine+lower). 1-row; nulls/0 for an
    empty range."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    part = rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
    return _combine(part.groupBy()).select(
        "open", "high", "low", "close",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
    )


def build_keyed_ohlc_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Keyed (per-series) candle partial ``(grp, bucket_ms, open_ts_ms,
    open, high, low, close_ts_ms, close, cnt)`` — one candle wheel per
    series sharing a single build shuffle (the keyed_wheel pattern
    applied to the OHLC family; per-symbol candlesticks are the
    canonical multi-series workload)."""
    ms = ts_to_ms(F.col(ts_col))
    v = F.col(value_col).cast("double")
    key = F.struct(ms.alias("t"), v.alias("v"))
    rollup = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            F.col(key_col).alias("grp"),
            bucket_ms(ms, slot_ms).alias("bucket_ms"),
            ms.alias("ts_ms"),
            v.alias("value"),
            key.alias("k"),
        )
        .groupBy("grp", "bucket_ms")
        .agg(
            F.min_by(F.col("ts_ms"), F.col("k")).alias("open_ts_ms"),
            F.min_by(F.col("value"), F.col("k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("ts_ms"), F.col("k")).alias("close_ts_ms"),
            F.max_by(F.col("value"), F.col("k")).alias("close"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return rollup.cache() if cache else rollup


def cascade_keyed_ohlc(rollup: DataFrame, slot_ms: int) -> DataFrame:
    """A4 tick/rotate per series: same associative combine as
    cascade_ohlc, grouped by (grp, coarse bucket)."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return _combine(rollup.groupBy("grp", coarse))
