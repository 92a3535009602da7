"""Binned interval-overlap join — intervals × intervals.

The binned range join (operators/rangejoin) handles point-in-window
pairs; this operator generalizes to two INTERVAL sides: pairs whose
half-open spans ``[ls, le)`` and ``[rs, re)`` overlap
(``ls < re AND rs < le``) — the "which sessions overlapped an outage
window" class of query. Naïve planning is again a nested loop; the
scale shape is the same quantization trick, extended to spans:

- each interval explodes to the W-wide bins it covers
  (``sequence(floor(s/W), floor((e−1)/W))`` — exact long arithmetic);
- candidate pairs come from ONE hash equi-join on the bin id
  (plus any key columns);
- each overlapping pair is claimed by exactly one bin —
  ``max(bin(ls), bin(rs))`` — so no distinct pass is needed: the
  dedup is a cheap residual predicate, not a shuffle. (Proof: if the
  intervals overlap, that bin lies within BOTH intervals' bin ranges:
  wlog bin(ls) ≥ bin(rs); ls < re ⇒ bin(ls) ≤ bin(re−1).)
- the exact overlap predicate is re-checked as a residual.

Cost: shuffle ∝ Σ interval-length/W per side — pick W near the typical
interval length so the explode factor stays O(1). A pathologically
long interval explodes to many bins (the usual skew caveat; cap or
split such spans upstream, AQE skew-join handles moderate cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _explode_bins(df: DataFrame, s: str, e: str, bin_ms: int) -> DataFrame:
    """One row per W-bin the half-open ``[s, e)`` interval covers
    (``e − 1`` because the end is exclusive). Empty/negative intervals
    are dropped (no bins)."""
    return df.filter(F.col(s) < F.col(e)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(s) / bin_ms).cast("long"),
                F.floor((F.col(e) - 1) / bin_ms).cast("long"),
            )
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_ms: int,
    on: str | None = None,
) -> DataFrame:
    """All (left row, right row) pairs whose epoch-ms intervals
    ``[l_start, l_end)`` and ``[r_start, r_end)`` overlap, optionally
    also matching on an equality key ``on``. Output: all left columns,
    all right columns (names must not collide), plus ``overlap_ms``
    (> 0). Exactly-once per pair via the bin-ownership rule — no
    distinct."""
    lb = _explode_bins(left, l_start, l_end, bin_ms)
    rb = _explode_bins(right, r_start, r_end, bin_ms).withColumnRenamed(
        "_bin", "_rbin"
    )
    keys = (lb["_bin"] == rb["_rbin"]) & (
        (lb[on] == rb[on]) if on else F.lit(True)
    )
    ls, le = F.col(l_start), F.col(l_end)
    rs, re_ = F.col(r_start), F.col(r_end)
    owner = F.greatest(
        F.floor(ls / bin_ms).cast("long"), F.floor(rs / bin_ms).cast("long")
    )
    joined = lb.join(rb, keys, "inner").filter(
        (ls < re_) & (rs < le) & (F.col("_bin") == owner)
    )
    overlap = F.least(le, re_) - F.greatest(ls, rs)
    out = joined.withColumn("overlap_ms", overlap)
    for c in ("_bin", "_rbin"):
        out = out.drop(c)
    if on:
        out = out.drop(rb[on])
    return out
