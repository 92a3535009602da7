"""Binned range (interval) join.

A time-range join — "right row within (left.ts, left.ts + W]" — is a
non-equi condition, so naïve Spark planning gives a BroadcastNestedLoop
or cartesian product: O(|L|·|R|) per key and a guaranteed 100 TB
failure. The standard scale fix (same idea DuckDB/Trino apply
internally, and what their docs call an IEJoin/binned range join) is to
**quantize the range into W-wide bins**: a right row at time t can only
match left rows binned at floor(t/W) or floor(t/W)−1, so the join
becomes a UNION of two *equi*-joins on (key, bin) plus a residual
filter — hash-partitionable, AQE-skew-splittable, shuffle ∝ input, not
input².

Pairs are not duplicated across the two legs: the legs join *disjoint*
bin offsets (0 and 1), and the residual `0 < gap ≤ W` is applied to
both. The reference has no joins at all (SURVEY §2.3) — this operator
belongs to the beyond-parity scale surface, next to the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import ts_to_ms


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_ms: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Pairs (l, r) with l.on == r.on and
    ``0 < r.ts − l.ts ≤ window_ms``. Output: on, <left_id>, <right_id>,
    gap_ms — ids keep their input column names."""
    lms = ts_to_ms(left_ts)
    rms = ts_to_ms(right_ts)
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_id),
        lms.alias("_lms"),
        F.floor(lms / window_ms).cast("long").alias("_lbin"),
    )
    r = right.select(
        F.col(on).alias("_rk"),
        F.col(right_id),
        rms.alias("_rms"),
        F.floor(rms / window_ms).cast("long").alias("_rbin"),
    )
    legs = [
        l.join(r, (l["_k"] == r["_rk"]) & (l["_lbin"] + shift == r["_rbin"]))
        for shift in (0, 1)
    ]
    pairs = legs[0].unionByName(legs[1])
    gap = F.col("_rms") - F.col("_lms")
    return (
        pairs.filter((gap > 0) & (gap <= window_ms))
        .select(
            F.col("_k").alias(on),
            F.col(left_id),
            F.col(right_id),
            gap.alias("gap_ms"),
        )
    )


def purchase_click_followups_oracle(window_ms: int = 300_000) -> str:
    """DuckDB states the non-equi join directly (its optimizer builds
    the range-join plan internally — the declarative twin)."""
    return f"""
        SELECT a.user_id,
               a.event_id AS purchase_event_id,
               b.event_id AS click_event_id,
               epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND epoch_ms(b.ts) - epoch_ms(a.ts) > 0
         AND epoch_ms(b.ts) - epoch_ms(a.ts) <= {window_ms}
        WHERE a.event_type = 'purchase' AND b.event_type = 'click'
    """
