"""Misra-Gries / Space-Saving heavy-hitter sketch rollup — the bounded
-size upgrade of the exact count-pair partial (operators/distinct.
build_count_pairs names this exact seam: "the sketch upgrade for
extreme cardinality is Misra-Gries/count-min with candidate
re-verification").

Partial: per slot, the top-``m`` keys by count plus one error bound —
the (m+1)-th largest per-slot count (0 when the slot has ≤ m keys).
Truncating exact per-slot counts to top-m IS a Misra-Gries summary
(Agarwal et al., "Mergeable Summaries", PODS'12 — public literature),
and the bound obeys the MG inequality

    bound_b ≤ n_b / (m+1)        (m+1 keys each count ≥ bound_b)

so over any covered slot set,  Σ bound_b ≤ n_range / (m+1).

Serving: for key x over slots B,  served(x) = Σ_{b∈B, x kept} cnt  is
a LOWER bound on x's true range count, and

    true(x) ≤ served(x) + Σ_{b∈B} bound_b − Σ_{b∈B, x kept} bound_b
            = upper(x)

(x's count in a slot that dropped it is < that slot's bound). A key
never kept anywhere has upper = Σ bound — so for any threshold
``T > n_range/(m+1)`` the candidate set {x : upper(x) ≥ T} provably
contains EVERY true heavy hitter ≥ T, including keys the sketch never
stored. Candidates are then re-verified with one semi-join back to the
fact range (the LSH candidate→verify shape), so the final answer is
EXACT and oracle-checkable — while the rollup itself stays ≤ (m+1)
rows per slot, flat in key cardinality (the count-pair table is not).

Cascade (A4): union fine summaries per coarse slot, sum per-key
counts, re-truncate to top-m; the new bound = Σ fine bounds + the
(m+1)-th merged count (the mergeable-summaries composition — error
adds, the upper-bound invariant survives, pinned by tests).

Scale shape: build = the count-pairs shuffle + one WindowGroupLimit
(map tasks keep ≤ m+1 rows per slot before the exchange); serving
touches ≤ (m+1)·slots rows, day-prunes on a reopened rollup, and the
verify pass scans the fact range once with a broadcast candidate set.
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


def _truncate_to_mg(counts: DataFrame, m: int, carry_bound, total_col=None) -> DataFrame:
    """Keep top-m (cnt desc, key asc) per bucket; ``bound`` = carried
    error + the (m+1)-th count (0 if absent). ``counts`` has columns
    (bucket_ms, key, cnt) plus optionally a prior ``bound`` to carry
    (cascade); ``carry_bound`` is a Column of per-row carried error
    (lit(0) for a fresh build).

    ``total_col``: per-row Column holding the slot's EXACT total row
    count, carried through truncation as ``slot_total`` (None on a
    fresh build ⇒ the window sum over the un-truncated counts, which
    is exact). slot_total is additive across slots, so a range's exact
    n comes from the rollup — sparing the verify path a fact scan."""
    w = Window.partitionBy("bucket_ms").orderBy(
        F.col("cnt").desc(), F.col("key")
    )
    wb = Window.partitionBy("bucket_ms")
    ranked = counts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_carry", carry_bound
    )
    total = F.sum("cnt").over(wb) if total_col is None else total_col
    ranked = ranked.withColumn("slot_total", total.cast("long"))
    spill = F.max(F.when(F.col("_rn") == m + 1, F.col("cnt"))).over(wb)
    carried = F.max("_carry").over(wb)
    return (
        ranked.withColumn(
            "bound",
            (F.coalesce(spill, F.lit(0)) + carried).cast("long"),
        )
        .filter(F.col("_rn") <= m)
        .select("bucket_ms", "key", "cnt", "bound", "slot_total")
    )


def build_mg_rollup(
    df: DataFrame,
    ts_col: str,
    key: F.Column,
    watermark_ms: int,
    advance_to_ms: int,
    m: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Partial: ≤ m rows ``(bucket_ms, key, cnt, bound)`` per slot
    (``bound`` repeated on each of the slot's rows), over the indexed
    horizon ``[watermark, advance)``. ``key`` is a Column expression —
    hot-key derivations compose here without a pre-projection."""
    counts = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            key.alias("key"),
        )
        .groupBy("bucket_ms", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rollup = _truncate_to_mg(counts, m, F.lit(0))
    # one cached partition: the rollup is tiny regardless of fact size;
    # a range probe should be a single task (cf. WheelIndex build)
    return rollup.coalesce(1).cache() if cache else rollup


def cascade_mg(rollup: DataFrame, slot_ms: int, m: int) -> DataFrame:
    """Tick/rotate (A4) by the mergeable-summaries composition: sum
    per-key counts within the coarse slot, carry Σ fine bounds, then
    re-truncate to top-m (which adds the (m+1)-th merged count to the
    carried bound). The upper-bound invariant survives; error adds."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    has_totals = "slot_total" in rollup.columns
    per_slot = ["bucket_ms", "bound"] + (["slot_total"] if has_totals else [])
    fine_bounds = (
        rollup.select(*per_slot)
        .distinct()
        .groupBy(coarse)
        .agg(
            F.sum("bound").alias("_fb"),
            *([F.sum("slot_total").alias("_ft")] if has_totals else []),
        )
    )
    merged = (
        rollup.groupBy(coarse, F.col("key"))
        .agg(F.sum("cnt").alias("cnt"))
        .join(fine_bounds, "bucket_ms")
    )
    out = _truncate_to_mg(
        merged, m, F.col("_fb"),
        total_col=F.col("_ft") if has_totals else F.lit(None),
    )
    # a totals-less input (e.g. a streaming snapshot) cascades without
    # the column rather than with a wrong window-sum of truncated counts
    return out if has_totals else out.drop("slot_total")


def range_hh_candidates(
    rollup: DataFrame, start_ms: int, end_ms: int
) -> DataFrame:
    """Per-key lower/upper count bounds over the bucket-aligned
    ``[start, end)``: ``(key, served, upper)``. Keys absent from every
    covered summary have (unreported) upper = Σ bounds — so a caller
    filtering ``upper >= T`` gets a PROVABLY complete candidate set
    only for ``T > Σ bounds``; ``range_heavy_hitters_verified``
    enforces that. The total-bound scalar attaches via a 1-row
    broadcast (plans as a single-row BroadcastNestedLoopJoin — the
    benign scalar-threshold shape, allowlisted in the join audit like
    tpch_q11's)."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    inr = rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
    total = (
        inr.select("bucket_ms", "bound")
        .distinct()
        .agg(F.sum("bound").alias("_total_bound"))
        .withColumn("_j", F.lit(1))
    )
    per_key = (
        inr.groupBy("key")
        .agg(F.sum("cnt").alias("served"))
        .withColumn("_j", F.lit(1))
    )
    # upper = served + Σ bounds: per slot, true_b ≤ served_b + bound_b
    # whether the key was kept (cascaded counts may undercount by the
    # carried error ≤ bound) or dropped (count ≤ bound). The tighter
    # "subtract bounds where present" form is only sound on a fresh
    # (never-cascaded) rollup, so it is deliberately NOT used.
    return per_key.join(F.broadcast(total), "_j").select(
        "key",
        "served",
        (
            F.col("served") + F.coalesce(F.col("_total_bound"), F.lit(0))
        ).alias("upper"),
    )


def range_heavy_hitters_verified(
    fact: DataFrame,
    ts_col: str,
    key: F.Column,
    rollup: DataFrame,
    start_ms: int,
    end_ms: int,
    m: int,
    count_frac_den: int,
    cascade_levels: int = 0,
) -> DataFrame:
    """EXACT heavy hitters over the range: every key whose true range
    count satisfies ``cnt * count_frac_den >= n_range``, computed as
    MG candidates + one exact re-verification scan. Completeness needs
    the threshold to exceed the rollup's total error budget
    ``(cascade_levels+1) · n/(m+1)`` (each cascade level adds up to
    n/(m+1): its re-truncation spill) — asserted structurally, so the
    sketch can never silently under-report. Output ``(key, cnt)``,
    exact — the oracle is the direct GROUP BY/HAVING.

    When the rollup carries ``slot_total`` (build_mg_rollup emits it:
    exact per-slot row counts, additive), the range's exact n comes
    from the rollup — the query runs ONE fact scan (the verify), not
    two; a totals-less rollup (older save, streaming snapshot) falls
    back to counting the fact range."""
    assert count_frac_den * (cascade_levels + 1) < m + 1, (
        f"threshold n/{count_frac_den} must exceed the MG error budget "
        f"{cascade_levels + 1}·n/{m + 1}: need "
        f"count_frac_den·(cascade_levels+1) < m+1"
    )
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    # Serving shape (guide §2.4 / §5): the in-range summary is ≤ (m+1)
    # rows per covered slot — the same bounded-collect class as wheel
    # probes and ANN LUTs — so candidates, n_range and the total error
    # bound fold on the DRIVER from ONE tiny action on the (cached,
    # single-partition) rollup. The verify pass is then ONE fact-range
    # scan with the candidate set and threshold inlined as literals.
    # The old shape composed the same math relationally: per query it
    # stacked two broadcast exchanges of n_range, a broadcast of the
    # candidate frame and a scalar BroadcastNestedLoopJoin on top of
    # the verify scan — measured 601 → ~300 ms per probe at sf0.1.
    # Integer-exact either way; identical output (a NULL key never
    # survives the old inner join and never matches IN, both drop it).
    inr_rows = (
        rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
        .select(
            "bucket_ms",
            "key",
            "cnt",
            "bound",
            *(["slot_total"] if "slot_total" in rollup.columns else []),
        )
        .collect()
    )
    per_slot: dict = {}
    served: dict = {}
    for r in inr_rows:
        per_slot[r["bucket_ms"]] = (
            r["bound"],
            r["slot_total"] if "slot_total" in rollup.columns else None,
        )
        served[r["key"]] = served.get(r["key"], 0) + r["cnt"]
    total_bound = sum(b for b, _ in per_slot.values())
    if "slot_total" in rollup.columns:
        n = sum(t for _, t in per_slot.values())
    else:
        n = (
            fact.filter(ts_range_pred(fact, ts_col, start_ms, end_ms))
            .count()
        )
    cand_keys = [
        k
        for k, s in served.items()
        if (s + total_bound) * count_frac_den >= n
    ]
    in_range = fact.filter(
        ts_range_pred(fact, ts_col, start_ms, end_ms)
    ).select(key.alias("key"))
    matched = (
        in_range.filter(F.col("key").isin(*cand_keys))
        if cand_keys
        else in_range.filter(F.lit(False))
    )
    return (
        matched.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * count_frac_den >= F.lit(n))
        .select("key", "cnt")
    )
