"""Trailing-window anomaly detection over rollup series — alerting
served from the wheel, never the fact table.

The monitored series is a rollup lowering (here: per-slot event
counts, the wheel's ``cnt`` — integers). A slot is anomalous when its
value deviates from the trailing window's mean by more than k standard
deviations. The naive formulation (float mean/stddev) is not
hash-gateable: float summation order differs across engines. Instead
the k-sigma test is cross-multiplied into EXACT integer arithmetic:

    |x − S/w| > k·σ,  σ² = (w·ΣX² − S²)/w²
    ⇔ (w·x − S)² > k²·(w·ΣX² − S²)

with S = trailing sum, ΣX² = trailing sum of squares, w = window
slots — all integers (DECIMAL(38,0) guards the squares), so Spark and
an ANSI-SQL oracle agree bit-for-bit.

Gap semantics: an empty slot is a COUNT OF ZERO, not a missing
observation — the series is densified against the full slot grid
before the window (an occupied-slots-only window would silently
shorten the trailing period across gaps; for LOCF-style value series
use the wheel's gapfill instead). Slots whose trailing window is not
fully inside the horizon emit ``is_anomaly = NULL`` (insufficient
history), not false.

Scale shape: inputs are rollup rows (slots, not facts). The dense
grid is a ``sequence``/``explode`` over the horizon (no driver loop),
the window is a single ordered pass; for one global series that is one
small single-partition window over slot rows — bounded by the rollup,
which is the point. Keyed variants partition the window by series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def densify_counts(
    counts: DataFrame,
    start_ms: int,
    end_ms: int,
    slot_ms: int,
    spark=None,
) -> DataFrame:
    """``(bucket_ms, cnt)`` with EVERY slot of ``[start, end)``
    present (missing slots → 0)."""
    session = spark or counts.sparkSession
    grid = session.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_ms),
                F.lit(end_ms - slot_ms),
                F.lit(slot_ms),
            )
        ).alias("bucket_ms")
    )
    return grid.join(counts, "bucket_ms", "left").select(
        "bucket_ms", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )


def trailing_zscore_flags(
    dense: DataFrame, window_slots: int, k_sigma: int
) -> DataFrame:
    """Per slot: ``(bucket_ms, cnt, is_anomaly)`` with the exact
    integer k-sigma test over the ``window_slots`` PRECEDING slots
    (the current slot is excluded — it is the tested observation).
    ``is_anomaly`` is NULL while fewer than ``window_slots`` slots
    precede."""
    w = (
        Window.orderBy("bucket_ms")
        .rowsBetween(-window_slots, -1)
    )
    x = F.col("cnt").cast(_DEC)
    s = F.sum(F.col("cnt").cast(_DEC)).over(w)
    ss = F.sum((F.col("cnt") * F.col("cnt")).cast(_DEC)).over(w)
    n = F.count(F.lit(1)).over(w)
    wl = F.lit(window_slots).cast(_DEC)
    lhs = (wl * x - s) * (wl * x - s)
    rhs = F.lit(k_sigma * k_sigma).cast(_DEC) * (wl * ss - s * s)
    flag = F.when(n < window_slots, F.lit(None).cast("boolean")).otherwise(
        lhs > rhs
    )
    return dense.select(
        "bucket_ms", "cnt", flag.alias("is_anomaly")
    )


def densify_keyed_counts(
    counts: DataFrame,
    start_ms: int,
    end_ms: int,
    slot_ms: int,
) -> DataFrame:
    """``(key, bucket_ms, cnt)`` with every slot present for every
    DISTINCT key observed anywhere in the series (a key absent from a
    slot had 0 events). The grid is keys × sequence — map-only over
    the small distinct-keys frame."""
    keys = counts.select("key").distinct()
    grid = keys.select(
        "key",
        F.explode(
            F.sequence(
                F.lit(start_ms), F.lit(end_ms - slot_ms), F.lit(slot_ms)
            )
        ).alias("bucket_ms"),
    )
    return grid.join(counts, ["key", "bucket_ms"], "left").select(
        "key",
        "bucket_ms",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
    )


def keyed_trailing_zscore_flags(
    dense: DataFrame, window_slots: int, k_sigma: int
) -> DataFrame:
    """Per-series anomaly flags: the same exact integer k-sigma test
    with the trailing window PARTITIONED BY the series key — the
    distributed shape (one hash shuffle on key; each series' window
    runs within its partition)."""
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ms")
        .rowsBetween(-window_slots, -1)
    )
    x = F.col("cnt").cast(_DEC)
    s = F.sum(F.col("cnt").cast(_DEC)).over(w)
    ss = F.sum((F.col("cnt") * F.col("cnt")).cast(_DEC)).over(w)
    n = F.count(F.lit(1)).over(w)
    wl = F.lit(window_slots).cast(_DEC)
    lhs = (wl * x - s) * (wl * x - s)
    rhs = F.lit(k_sigma * k_sigma).cast(_DEC) * (wl * ss - s * s)
    flag = F.when(n < window_slots, F.lit(None).cast("boolean")).otherwise(
        lhs > rhs
    )
    return dense.select("key", "bucket_ms", "cnt", flag.alias("is_anomaly"))


def keyed_zscore_oracle(
    start_ms: int,
    end_ms: int,
    slot_ms: int,
    window_slots: int,
    k_sigma: int,
    ts_lit_lo: str,
    ts_lit_hi: str,
    key: str,
    table: str = "events",
) -> str:
    """DuckDB replay of the keyed variant (keys × grid, partitioned
    window, integer test)."""
    return f"""
        WITH grid AS (
            SELECT CAST(x AS BIGINT) AS bucket_ms
            FROM generate_series({start_ms}, {end_ms - slot_ms}, {slot_ms})
                 AS t(x)
        ),
        c AS (
            SELECT {key} AS key,
                   (epoch_ms(ts) // {slot_ms}) * {slot_ms} AS bucket_ms,
                   COUNT(*) AS cnt
            FROM {table}
            WHERE ts >= {ts_lit_lo} AND ts < {ts_lit_hi}
            GROUP BY 1, 2
        ),
        dense AS (
            SELECT k.key, g.bucket_ms, COALESCE(c.cnt, 0) AS cnt
            FROM (SELECT DISTINCT key FROM c) k
            CROSS JOIN grid g
            LEFT JOIN c ON c.key = k.key AND c.bucket_ms = g.bucket_ms
        ),
        win AS (
            SELECT key, bucket_ms, cnt,
                   SUM(CAST(cnt AS DECIMAL(38,0))) OVER tw AS s,
                   SUM(CAST(cnt * cnt AS DECIMAL(38,0))) OVER tw AS ss,
                   COUNT(*) OVER tw AS n
            FROM dense
            WINDOW tw AS (
                PARTITION BY key ORDER BY bucket_ms
                ROWS BETWEEN {window_slots} PRECEDING AND 1 PRECEDING
            )
        )
        SELECT key, bucket_ms, cnt,
               CASE WHEN n < {window_slots} THEN NULL ELSE
                   ({window_slots} * CAST(cnt AS DECIMAL(38,0)) - s)
                   * ({window_slots} * CAST(cnt AS DECIMAL(38,0)) - s)
                   > {k_sigma * k_sigma} * ({window_slots} * ss - s * s)
               END AS is_anomaly
        FROM win
    """


def zscore_oracle(
    start_ms: int,
    end_ms: int,
    slot_ms: int,
    window_slots: int,
    k_sigma: int,
    ts_lit_lo: str,
    ts_lit_hi: str,
    table: str = "events",
) -> str:
    """DuckDB replay: same dense grid, same integer cross-multiplied
    test."""
    return f"""
        WITH grid AS (
            SELECT CAST(x AS BIGINT) AS bucket_ms
            FROM generate_series({start_ms}, {end_ms - slot_ms}, {slot_ms})
                 AS t(x)
        ),
        c AS (
            SELECT (epoch_ms(ts) // {slot_ms}) * {slot_ms} AS bucket_ms,
                   COUNT(*) AS cnt
            FROM {table}
            WHERE ts >= {ts_lit_lo} AND ts < {ts_lit_hi}
            GROUP BY 1
        ),
        dense AS (
            SELECT g.bucket_ms, COALESCE(c.cnt, 0) AS cnt
            FROM grid g LEFT JOIN c USING (bucket_ms)
        ),
        win AS (
            SELECT bucket_ms, cnt,
                   SUM(CAST(cnt AS DECIMAL(38,0))) OVER tw AS s,
                   SUM(CAST(cnt * cnt AS DECIMAL(38,0))) OVER tw AS ss,
                   COUNT(*) OVER tw AS n
            FROM dense
            WINDOW tw AS (
                ORDER BY bucket_ms
                ROWS BETWEEN {window_slots} PRECEDING AND 1 PRECEDING
            )
        )
        SELECT bucket_ms, cnt,
               CASE WHEN n < {window_slots} THEN NULL ELSE
                   ({window_slots} * CAST(cnt AS DECIMAL(38,0)) - s)
                   * ({window_slots} * CAST(cnt AS DECIMAL(38,0)) - s)
                   > {k_sigma * k_sigma} * ({window_slots} * ss - s * s)
               END AS is_anomaly
        FROM win
    """
