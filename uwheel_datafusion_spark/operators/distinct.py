"""Distinct-count over time ranges — the mergeable-sketch aggregator family.

The reference's aggregator framework is compile-time pluggable (SURVEY
§1.3; the repo already serves its sum/cnt/min/max/avg/all/top-N
built-ins from the wheel rollups, /root/reference/src/main.rs:86-103
pins the use-sites). ``COUNT(DISTINCT)`` is the canonical aggregator
whose partial is NOT a number: per-bucket distinct counts do not add
across buckets, so it cannot ride the existing sum/cnt rollup. Two
partials work, mirroring the exact-deciles / percentile_approx pairing
in operators/sampling.py (exact oracle path + approximate scale path):

- **exact pairs path** (oracle-gateable): the per-minute partial is the
  distinct ``(bucket_ms, key)`` SET kept as rows. Any bucket-aligned
  range re-distincts across its covered buckets, so answers are exact
  no matter how the range splits. Build = one shuffle (the distinct) —
  the same cost class as the wheel build; the pair table is bounded by
  sum over buckets of per-bucket cardinality, far below the fact table
  whenever keys repeat within a minute.
- **HLL sketch path** (the 100 TB serving shape): the per-minute
  partial is Spark's built-in HLL++ sketch (`hll_sketch_agg`,
  DataSketches binary, ~KB per bucket regardless of key cardinality).
  Range serving = ``hll_union_agg`` over covered slots + estimate;
  coarser wheels (hour/day) cascade by sketch union — the tick/rotate
  invariant (A4) holds exactly because HLL register-max is associative
  and commutative, so a cascaded sketch is bit-equivalent in estimate
  to one built directly at the coarse grain (pinned by
  tests/test_distinct.py). Relative error ≈ 1.04/√2^lgK (~1.6% at the
  default lgK=12); tests pin a 5% band against exact.

Serving either path needs only bucket-range filters — at 100 TB the
rollups persist partitioned by day (like WheelIndex.save) and probes
prune to the touched partitions.
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

#: Spark default for hll_sketch_agg; kept explicit so the build and any
#: cross-session union agree on sketch geometry.
DEFAULT_LG_K = 12


def build_distinct_pairs(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Exact partial: distinct ``(bucket_ms, key)`` rows at ``slot_ms``
    grain over the indexed horizon ``[watermark, advance)`` (watermark
    semantics match WheelIndex.build: late rows dropped, ahead rows not
    finalized — here both simply excluded by the pushdown range)."""
    pairs = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).alias("key"),
        )
        .distinct()
    )
    return pairs.cache() if cache else pairs


def range_distinct_exact(
    pairs: DataFrame, start_ms: int, end_ms: int
) -> DataFrame:
    """Exact distinct keys in the bucket-aligned ``[start, end)``:
    1-row ``(n_distinct bigint)``; 0 for an empty range (unlike the
    wheel's Option<f64> nulls, a distinct count of nothing IS 0).
    On a reopened (dt-partitioned) rollup the predicate also prunes
    day partitions (see wheel._bucket_range_pred)."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    return pairs.filter(_bucket_range_pred(pairs, start_ms, end_ms)).agg(
        F.count_distinct("key").alias("n_distinct")
    )


def grouped_distinct_exact(pairs: DataFrame, slot_ms: int) -> DataFrame:
    """Exact per-coarse-bucket distinct counts
    ``(bucket_ms, n_distinct)`` — the day/hour rollup serving shape."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return (
        pairs.groupBy(coarse)
        .agg(F.count_distinct("key").alias("n_distinct"))
    )


def build_hll_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    lg_k: int = DEFAULT_LG_K,
    cache: bool = True,
) -> DataFrame:
    """Sketch partial: one HLL++ binary per slot,
    ``(bucket_ms, hll binary)``. One scan + one shuffle, rollup size
    ~KB/slot independent of cardinality — the index that stays small at
    100 TB where the exact pair table would not."""
    rollup = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).alias("key"),
        )
        .groupBy("bucket_ms")
        .agg(F.hll_sketch_agg("key", lg_k).alias("hll"))
    )
    # NOTE: no coalesce(1) here — a single-partition cached rollup would
    # serialize every union/probe onto one task, the opposite of the
    # scale path this rollup exists for. At 100 TB, persist via
    # save_rollup (dt-partitioned) instead of caching.
    # one cached partition: the rollup is tiny regardless of fact size;
    # a range probe should be a single task (cf. WheelIndex build)
    return rollup.coalesce(1).cache() if cache else rollup


def cascade_hll(rollup: DataFrame, slot_ms: int) -> DataFrame:
    """Tick/rotate for sketches (A4): coarse-grain sketches by unioning
    fine ones — no re-scan of the fact table, exact same estimates as a
    direct coarse build (register-max associativity)."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return rollup.groupBy(coarse).agg(F.hll_union_agg("hll").alias("hll"))


def range_distinct_hll(
    rollup: DataFrame, start_ms: int, end_ms: int
) -> DataFrame:
    """Approximate distinct keys in the bucket-aligned ``[start, end)``:
    union the covered slots' sketches, estimate once. 1-row
    ``(n_distinct_approx bigint)``, 0 for an empty range. On a reopened
    (dt-partitioned) rollup the predicate also prunes day partitions."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    return (
        rollup.filter(_bucket_range_pred(rollup, start_ms, end_ms))
        .agg(
            F.coalesce(
                F.hll_sketch_estimate(F.hll_union_agg("hll")), F.lit(0)
            ).alias("n_distinct_approx")
        )
    )


def build_count_pairs(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Counted variant of the pair partial: ``(bucket_ms, key, cnt)``
    — the mergeable partial for range-servable HEAVY HITTERS (counts
    add across buckets, so any aligned range re-aggregates exactly).
    Bounded by per-bucket key cardinality like the distinct pairs; the
    sketch upgrade for extreme cardinality is Misra-Gries/count-min
    with candidate re-verification."""
    pairs = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).alias("key"),
        )
        .groupBy("bucket_ms", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return pairs.cache() if cache else pairs


def range_topk_keys_df(
    pairs: DataFrame, start_ms: int, end_ms: int, k: int
) -> DataFrame:
    """Top-k keys by total count within the bucket-aligned
    ``[start, end)``, served from the count-pair rollup: one bucket
    -range filter (day-prunable on a reopened rollup) + one groupBy
    over pair rows + a driver-merged TakeOrdered — never the fact
    table. Deterministic: (cnt desc, key asc) ordering."""
    from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

    return (
        pairs.filter(_bucket_range_pred(pairs, start_ms, end_ms))
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(k)
    )


def build_keyed_distinct_pairs(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    group_col: str,
    watermark_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    cache: bool = True,
) -> DataFrame:
    """Keyed (hypertable-style, like operators/keyed_wheel) exact
    partial: distinct ``(group, bucket_ms, key)`` rows — one logical
    distinct-wheel per group value sharing a single build shuffle."""
    pairs = (
        df.filter(ts_range_pred(df, ts_col, watermark_ms, advance_to_ms))
        .select(
            F.col(group_col).alias("grp"),
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).alias("key"),
        )
        .distinct()
    )
    return pairs.cache() if cache else pairs


def keyed_grouped_distinct_exact(pairs: DataFrame, slot_ms: int) -> DataFrame:
    """Per-(group, coarse-bucket) exact distinct counts
    ``(grp, bucket_ms, n_distinct)``."""
    coarse = (F.col("bucket_ms") - F.col("bucket_ms") % F.lit(slot_ms)).alias(
        "bucket_ms"
    )
    return (
        pairs.groupBy("grp", coarse)
        .agg(F.count_distinct("key").alias("n_distinct"))
    )


# Persistence: the shared dt-partitioned contract (same layout as
# WheelIndex.save — serving probes prune to touched day partitions at
# any scale). Re-exported here for backward compatibility; the
# histogram-quantile and OHLC rollups use the same pair of functions.
from uwheel_datafusion_spark.operators.rollup_io import (  # noqa: E402,F401
    load_rollup,
    save_rollup,
)


def extend_hll_rollup(
    rollup: DataFrame,
    df: DataFrame,
    ts_col: str,
    key_col: str,
    from_ms: int,
    advance_to_ms: int,
    slot_ms: int = MINUTE_MS,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Incremental insert+advance for the sketch rollup (the
    WheelIndex.extend analogue, /root/reference/src/main.rs:128-140
    semantics): sketch the new rows in ``[from, advance)`` and union
    into the existing slots. Register-max associativity makes the
    result estimate-identical to a from-scratch build over the combined
    horizon (pinned in tests) — the property that lets a 100 TB rollup
    absorb daily increments without ever re-scanning history."""
    delta = build_hll_rollup(
        df, ts_col, key_col, from_ms, advance_to_ms, slot_ms, lg_k, cache=False
    )
    return (
        rollup.select("bucket_ms", "hll")
        .unionByName(delta.select("bucket_ms", "hll"))
        .groupBy("bucket_ms")
        .agg(F.hll_union_agg("hll").alias("hll"))
    )
