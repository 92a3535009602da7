"""Bottom-k distinct sample over time ranges — the mergeable
deterministic-sampling aggregator family (KMV / bottom-k sketch).

The reference's aggregator framework is compile-time pluggable (SURVEY
§1.3); sampling is the aggregator a training-data pipeline wants whose
partial is a bounded SET: "give me k representative distinct keys from
any time range" without touching the fact table at query time. Random
sampling cannot be a wheel partial (per-slot random draws don't merge
into a uniform range draw, and no oracle can replay an RNG across
engines — see operators/sampling's rationale). The classic mergeable
answer is the **bottom-k sketch**: keep, per slot, the k distinct keys
with the smallest values of a fixed uniform hash.

Why merging is EXACT (not approximate): a key's hash never changes, so
if key x is among the k smallest hashes over the distinct keys of a
range, then in every slot that contains x fewer than k keys hash below
x — hence x survives that slot's bottom-k partial. Bottom-k of the
union of per-slot bottom-k partials therefore equals bottom-k of the
range's distinct keys exactly, for ANY slot split. The same argument
gives the A4 cascade (minute → hour → day partials by re-ranking) and
makes the served sample independent of partitioning, cluster size, and
merge order — reproducible at 100 TB.

Hash: operators/sampling's portable Knuth multiplicative mix — exact
int64 arithmetic that renders identically in Spark SQL and DuckDB, so
the served sample is oracle-checkable bit-for-bit (ties broken by key;
the mix is a fixed public constant, not a per-run seed).

Scale shape: build = one pushdown scan + one distinct shuffle + a
WindowGroupLimit rank (map tasks keep ≤ k rows per slot *before* the
exchange, so the shuffle carries ≤ k·slots rows per task, not the
corpus). Rollup size ≤ k rows/slot — flat in key cardinality, like the
HLL sketch (operators/distinct) but carrying the sample members
themselves. Serving/cascade touch slot rows only and day-prune on a
reopened rollup (operators/rollup_io + wheel._bucket_range_pred).

Bonus estimator: the k-th smallest normalized hash gives the KMV
distinct-count estimate n̂ = (k−1)/h₍ₖ₎ — same rollup, second
aggregator (tests pin a tolerance band vs exact, like the HLL 5% band;
the mix's |key| mod 1000003 pre-fold caps resolvable cardinality well
below that prime, fine for per-range sampling grain).
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
from uwheel_datafusion_spark.operators.sampling import _mix_sql, _P2

DEFAULT_K = 20


def _ranked_bottomk(pairs: DataFrame, k: int) -> DataFrame:
    """Keep the k smallest (h, key) per bucket_ms. Plans as
    WindowGroupLimit: per-partition top-k before the single exchange."""
    w = Window.partitionBy("bucket_ms").orderBy("h", "key")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def build_bottomk_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    k: int = DEFAULT_K,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Partial: ≤ k rows ``(bucket_ms, h, key)`` per slot — the k
    distinct keys with the smallest portable-mix hash among the slot's
    keys, over the indexed horizon ``[watermark, advance)`` (watermark
    semantics as WheelIndex.build: late/ahead rows excluded by the
    pushdown range)."""
    pairs = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).cast("long").alias("key"),
        )
        .distinct()
        .withColumn("h", F.expr(_mix_sql("key")))
    )
    rollup = _ranked_bottomk(pairs, k)
    # one cached partition: the rollup is tiny regardless of fact size;
    # a range probe should be a single task (cf. WheelIndex build)
    return rollup.coalesce(1).cache() if cache else rollup


def cascade_bottomk(rollup: DataFrame, slot_ms: int, k: int) -> DataFrame:
    """Tick/rotate (A4) for samples: coarse-grain partials by
    re-ranking the union of fine partials — exactly equal to a direct
    coarse build (see module docstring for the survival argument).
    ``k`` must not exceed the build k (a coarser sample can't invent
    members the fine partials dropped)."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    # column order matches build_bottomk_rollup (bucket_ms, key, h) so
    # cascaded and direct rollups are interchangeable frames
    merged = rollup.select(coarse, "key", "h").distinct()
    return _ranked_bottomk(merged, k)


def range_sample_df(
    rollup: DataFrame, start_ms: int, end_ms: int, k: int
) -> DataFrame:
    """The k smallest-hash distinct keys in the bucket-aligned
    ``[start, end)``, served from the rollup: one bucket-range filter
    (day-prunable on a reopened rollup) + distinct over ≤ k·slots rows
    + a driver-merged TakeOrdered — never the fact table. Exactly the
    bottom-k of the range's distinct keys (see module docstring);
    fewer than k rows iff the range holds fewer distinct keys.
    ``k`` bounded by the build k, as in cascade_bottomk."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    return (
        rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
        .select("h", "key")
        .distinct()
        .orderBy("h", "key")
        .limit(k)
    )


def range_kmv_estimate_df(
    rollup: DataFrame, start_ms: int, end_ms: int, k: int
) -> DataFrame:
    """KMV distinct-count estimate over the bucket-aligned range from
    the same rollup: n̂ = (k−1) / (h₍ₖ₎ / P), P the mix modulus. Falls
    back to the exact count of surviving keys when the range holds
    fewer than k distinct keys (the sample IS the key set then).
    1-row ``(n_distinct_kmv bigint)``."""
    sample = range_sample_df(rollup, start_ms, end_ms, k)
    agg = sample.agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")
    )
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("hk").cast("double") / F.lit(float(_P2)))
    )
    return agg.select(
        F.round(est).cast("long").alias("n_distinct_kmv")
    )


def bottomk_sample_oracle(
    table: str,
    ts_lit_lo: str,
    ts_lit_hi: str,
    key: str,
    k: int,
) -> str:
    """DuckDB oracle for range_sample_df on raw rows: distinct keys in
    the half-open ts range, ordered by (mix, key), LIMIT k — the direct
    computation the rollup path must equal bit-for-bit."""
    return f"""
        SELECT h, key FROM (
            SELECT CAST({key} AS BIGINT) AS key,
                   {_mix_sql(f'CAST({key} AS BIGINT)')} AS h
            FROM (
                SELECT DISTINCT {key}
                FROM {table}
                WHERE ts >= {ts_lit_lo} AND ts < {ts_lit_hi}
            )
        )
        ORDER BY h, key
        LIMIT {k}
    """
