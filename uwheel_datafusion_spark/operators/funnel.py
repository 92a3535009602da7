"""Ordered funnel / sequence-match (ClickHouse ``windowFunnel``-class
operator, re-expressed relationally).

"How many users did view → click → purchase, each step within W of
the previous one?" — the event-pipeline query that looks stateful but
lowers to a chain of per-key min-aggregations: stage 1 is each user's
earliest step-1 event; stage i>1 is the earliest step-i event strictly
after that user's stage-(i−1) time and within W of it. This "earliest
qualifying event" semantics is deterministic (no tie policy needed
beyond the timestamp itself: MIN over a set), replays identically in
ANSI SQL, and is the standard greedy funnel definition.

Why greedy-earliest is sound for step counting: if ANY chain completes
stages 1..i, the greedy chain does too — by induction, greedy's
stage-(i−1) time is ≤ the witness chain's, so the witness's stage-i
event is still strictly-after greedy's stage-(i−1)… but possibly
OUTSIDE greedy's tighter window start. The two definitions differ in
corner cases, so we do NOT claim witness semantics: the operator's
contract IS the greedy chain (the common product-analytics choice —
ClickHouse's strict-order mode matches), and the oracle replays
exactly that.

Scale shape: one shuffle per stage on the user key (k−1 hash
equi-joins of per-user 1-row frames after the first min-agg — each
frame ≤ |users| rows, not |events|), then one count. All built-ins;
no window over the event stream, no state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import ts_range_pred, ts_to_ms


def funnel_stage_times(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    step_col: str,
    steps: list[str],
    window_ms: int,
    start_ms: int,
    end_ms: int,
) -> DataFrame:
    """Per-key greedy stage times over ``[start, end)``: one row per
    key that completed stage 1, with nullable epoch-ms columns
    ``t1..tk`` (tᵢ null ⇒ the chain stalled before stage i)."""
    base = df.filter(ts_range_pred(df, ts_col, start_ms, end_ms)).select(
        F.col(key_col).alias("key"),
        F.col(step_col).alias("_step"),
        ts_to_ms(F.col(ts_col)).alias("_ms"),
    )
    cur = (
        base.filter(F.col("_step") == steps[0])
        .groupBy("key")
        .agg(F.min("_ms").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            base.filter(F.col("_step") == step)
            .select("key", F.col("_ms").alias("_cand"))
            .join(cur.select("key", F.col(prev).alias("_p")), "key")
            .filter(
                (F.col("_cand") > F.col("_p"))
                & (F.col("_cand") <= F.col("_p") + F.lit(window_ms))
            )
            .groupBy("key")
            .agg(F.min("_cand").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "key", "left")
    return cur


def funnel_counts_df(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    step_col: str,
    steps: list[str],
    window_ms: int,
    start_ms: int,
    end_ms: int,
) -> DataFrame:
    """Funnel summary: one row per stage (1-indexed) with the number
    of keys whose greedy chain reached it — the conversion funnel."""
    times = funnel_stage_times(
        df, ts_col, key_col, step_col, steps, window_ms, start_ms, end_ms
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"), F.col(f"_n{i}").alias("n_keys")
            )
            for i in range(1, len(steps) + 1)
        ]
    )
    return counts.select(F.explode(stages).alias("s")).select(
        F.col("s.stage").alias("stage"), F.col("s.n_keys").alias("n_keys")
    )


def funnel_counts_oracle(
    steps: list[str],
    window_ms: int,
    ts_lit_lo: str,
    ts_lit_hi: str,
    table: str = "events",
    key: str = "user_id",
    step_col: str = "event_type",
) -> str:
    """DuckDB replay of the greedy chain as CTE-per-stage."""
    ctes = [
        f"""
        s1 AS (
            SELECT {key} AS key, MIN(epoch_ms(ts)) AS t
            FROM {table}
            WHERE ts >= {ts_lit_lo} AND ts < {ts_lit_hi}
              AND {step_col} = '{steps[0]}'
            GROUP BY 1
        )"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"""
        s{i} AS (
            SELECT e.{key} AS key, MIN(epoch_ms(e.ts)) AS t
            FROM {table} e
            JOIN s{i - 1} p ON p.key = e.{key}
            WHERE e.ts >= {ts_lit_lo} AND e.ts < {ts_lit_hi}
              AND e.{step_col} = '{step}'
              AND epoch_ms(e.ts) > p.t
              AND epoch_ms(e.ts) <= p.t + {window_ms}
            GROUP BY 1
        )"""
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS stage, (SELECT COUNT(*) FROM s{i}) AS n_keys"
        for i in range(1, len(steps) + 1)
    )
    return f"WITH {', '.join(ctes)} {unions}"
