"""Sliding- and session-window aggregation (SURVEY §2.9, last row).

The reference's uwheel crate exposes a sliding-window API that the
benchmark binary never exercises [uwheel-pub]; Spark has both window
shapes built in (``F.window(ts, size, slide)`` and
``F.session_window``). We gate them against exact DuckDB oracles:

- sliding: each event belongs to ``size/slide`` epoch-aligned windows —
  the oracle enumerates them with a ``generate_series`` cross join,
  which is precisely the expansion Spark's ``window()`` performs;
- session: gaps-and-islands at **microsecond** precision (Spark merges
  sessions on the µs timestamp; an ms-floored oracle would disagree on
  sub-ms boundary gaps), lowered to ms only for output.

Scale notes: sliding-window groupBy shuffles size/slide× the input —
at 100 TB prefer the wheel rollups plus a range query per window (the
whole point of the index); these operators are the general form for
when per-key windows are needed. Session windows shuffle once on the
session key; Spark merges sessions inside the state store / sort.

All expressions are built-in JVM functions — whole-stage codegen, no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import micros_to_value, value_to_micros
from uwheel_datafusion_spark.functions.time import ts_to_ms

#: the gated configuration: 1-hour windows sliding by 15 minutes
SLIDE_SIZE_MS = 3_600_000
SLIDE_STEP_MS = 900_000
#: session gap for the gated session-window query
SESSION_GAP_MS = 1_800_000


def _sum_scaled(expr: str = "value") -> str:
    return (
        f"(CAST(SUM(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    size_ms: int = SLIDE_SIZE_MS,
    step_ms: int = SLIDE_STEP_MS,
) -> DataFrame:
    """Overlapping tumble: one output row per (epoch-aligned) window of
    ``size_ms`` every ``step_ms``. Requires size % step == 0 (Spark
    enforces the same for its window expansion)."""
    if size_ms % step_ms:
        raise ValueError("window size must be a multiple of the slide step")
    w = F.window(F.col(ts_col), f"{size_ms // 1000} seconds", f"{step_ms // 1000} seconds")
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_to_micros(F.col(value_col))).alias("sum_micros"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            ts_to_ms(F.col("w.start")).alias("w_start_ms"),
            ts_to_ms(F.col("w.end")).alias("w_end_ms"),
            F.col("cnt"),
            micros_to_value(F.col("sum_micros")).alias("sum_value"),
            F.col("min_value"),
            F.col("max_value"),
        )
    )


def sliding_window_oracle(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    size_ms: int = SLIDE_SIZE_MS,
    step_ms: int = SLIDE_STEP_MS,
) -> str:
    """Enumerate each event's size/step containing windows:
    w = floor(ms/step)*step − k·step, k ∈ [0, size/step)."""
    k_max = size_ms // step_ms - 1
    return f"""
        WITH e AS (SELECT epoch_ms({ts_col}) AS ms, {value_col} AS value FROM {table}),
        win AS (
            SELECT (e.ms // {step_ms}) * {step_ms} - ks.k * {step_ms} AS w_start_ms,
                   e.value
            FROM e CROSS JOIN generate_series(0, {k_max}) AS ks(k)
        )
        SELECT w_start_ms,
               w_start_ms + {size_ms} AS w_end_ms,
               COUNT(*) AS cnt,
               {_sum_scaled('value')} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM win
        GROUP BY w_start_ms
    """


def session_window_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ms: int = SESSION_GAP_MS,
) -> DataFrame:
    """Per-key session windows: consecutive events merge while the gap
    between them is < gap_ms; session end = last event + gap."""
    sw = F.session_window(F.col(ts_col), f"{gap_ms // 1000} seconds")
    return (
        events.groupBy(F.col(key_col), sw.alias("s"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_to_micros(F.col(value_col))).alias("sum_micros"),
        )
        .select(
            F.col(key_col),
            ts_to_ms(F.col("s.start")).alias("session_start_ms"),
            ts_to_ms(F.col("s.end")).alias("session_end_ms"),
            F.col("cnt"),
            micros_to_value(F.col("sum_micros")).alias("sum_value"),
        )
    )


def session_window_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ms: int = SESSION_GAP_MS,
) -> str:
    """Gaps-and-islands at µs precision (matching Spark's merge rule:
    new session iff ts − prev_ts >= gap), ms-floored for output."""
    gap_us = gap_ms * 1000
    return f"""
        WITH e AS (
            SELECT {key_col} AS k, epoch_us({ts_col}) AS us, {value_col} AS value
            FROM {table}
        ),
        m AS (
            SELECT k, us, value,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY k ORDER BY us)
        ),
        s AS (
            SELECT k, us, value,
                   SUM(new_s) OVER (
                       PARTITION BY k ORDER BY us
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM m
        )
        SELECT k AS {key_col},
               MIN(us) // 1000 AS session_start_ms,
               MAX(us) // 1000 + {gap_ms} AS session_end_ms,
               COUNT(*) AS cnt,
               {_sum_scaled('value')} AS sum_value
        FROM s
        GROUP BY k, sid
    """
