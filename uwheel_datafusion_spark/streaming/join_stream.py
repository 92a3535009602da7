"""Stream-stream interval join (SURVEY §2.9 beyond-parity surface).

The batch engine answers "right event within W after the left event on
the same key" with the binned equi-join (operators/rangejoin — the
100 TB shuffle shape). The STREAMING twin is expressed declaratively:
Structured Streaming supports inner stream-stream joins whose
condition combines a key equality with an event-time range, provided
both sides carry watermarks — Spark derives how long each side's rows
must be buffered in the state store *from the range condition itself*
(left rows are droppable once the right watermark passes
``l.ts + W``, right rows once the left watermark passes ``r.ts``), so
state is bounded by watermark delay × input rate, not by history.

Semantics match ``binned_interval_join`` exactly for rows inside the
watermark horizon: same pair predicate ``0 < r.ts − l.ts ≤ W``, same
output columns ``(on, left_id, right_id, gap_ms)`` — pinned by the
streaming-equals-batch parity test (tests/test_streaming.py), the same
evidence style the wheel/sessionizer/dedup streaming paths use.

Scale shape: the stream-stream join hash-partitions both sides by the
join key across executors (one shuffle each side, exactly like the
batch equi-join legs); state-store size is governed by the watermark
delay, and late rows beyond it are dropped — the streaming analogue of
the wheel's write-ahead/late-reject watermark pair (SURVEY A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import ensure_event_time, ts_to_ms


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_ms: int,
    left_id: str,
    right_id: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming pairs (l, r) with ``l.on == r.on`` and
    ``0 < r.ts − l.ts ≤ window_ms``; output
    ``(on, <left_id>, <right_id>, gap_ms)`` — the exact batch
    ``binned_interval_join`` contract, as an unbounded stream.

    Both inputs must be streaming DataFrames; the watermark delay
    bounds disorder tolerance AND state retention (a left row is held
    ~``delay + window_ms`` of event time, a right row ~``delay``)."""
    l = ensure_event_time(left, left_ts).select(
        F.col(on).alias("_k"),
        F.col(left_id),
        F.col(left_ts).alias("_lt"),
    ).withWatermark("_lt", watermark_delay)
    r = ensure_event_time(right, right_ts).select(
        F.col(on).alias("_rk"),
        F.col(right_id),
        F.col(right_ts).alias("_rt"),
    ).withWatermark("_rt", watermark_delay)
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("_rt") > F.col("_lt"))
        & (
            F.col("_rt")
            <= F.col("_lt") + F.expr(f"INTERVAL {window_ms} MILLISECONDS")
        )
    )
    gap = ts_to_ms(F.col("_rt")) - ts_to_ms(F.col("_lt"))
    return (
        l.join(r, cond, "inner")
        .select(
            F.col("_k").alias(on),
            F.col(left_id),
            F.col(right_id),
            gap.alias("gap_ms"),
        )
    )
