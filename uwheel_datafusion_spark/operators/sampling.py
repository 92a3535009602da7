"""Deterministic sampling / splitting / distribution operators for
training-data pipelines (beyond-parity north star, alongside textops).

Random sampling is useless for a reproducible 100 TB pipeline: Spark's
`df.sample` and DuckDB's `USING SAMPLE` draw from different RNGs, so no
oracle can match, and re-runs see different rows. The scalable,
reproducible alternative — and what production corpus pipelines use —
is **hash-based bucketing on a stable key**: a pure-arithmetic mix of
the key selects the same rows on every engine, every partitioning,
every run. All operators here are map-only projections/filters (no
shuffle, full pushdown, whole-stage codegen) except the exact-quantile
one, which documents its scale path.

Mix function: ``h(k) = ((k mod 1000003) * 2654435761 + 987654321)
mod 1000000007`` — Knuth multiplicative hashing; every intermediate
stays < 2^52, so int64 arithmetic is exact (no overflow) under Spark
ANSI mode and DuckDB alike, and the same expression renders in both
dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from uwheel_datafusion_spark.functions.quant import (
    micros_to_value,
    sql_micros_to_value,
    sql_value_to_micros,
    value_to_micros,
)

_P1 = 1_000_003  # prime folding the key into multiply-safe range
_KNUTH = 2_654_435_761  # 2^32 · golden-ratio conjugate
_OFF = 987_654_321
_P2 = 1_000_000_007


def hash_bucket_sql(key: str, buckets: int = 100) -> str:
    """Portable SQL: stable bucket in [0, buckets) for a bigint key.
    Renders identically in Spark SQL and DuckDB (abs, +, *, % — both
    engines use C-style truncating %, so folding through abs keeps
    every intermediate non-negative and the bucket in range for
    negative keys too; INT64_MIN is out of contract)."""
    return (
        f"(((abs({key}) % {_P1}) * {_KNUTH} + {_OFF}) % {_P2} % {buckets})"
    )


def hash_rank_sql(key: str) -> str:
    """Portable SQL: the full Knuth-mix RANK in [0, 1e9+7) for a
    bigint key — hash_bucket_sql without the bucket fold. Ordering by
    (this, key) is a seeded deterministic shuffle of the rows that
    renders identically in Spark SQL and DuckDB: the k-means training
    samplers (round 13 — VERDICT r12 next #2/#3) seed their centroid
    init from prefixes of this order (so the init stops being the n
    lowest vec_ids, which on clustered corpora can all land in one
    latent cluster), and take their training SAMPLE by thresholding it
    (:func:`hash_sample_threshold` — a map-only filter; a rank-PREFIX
    sample would need a global TakeOrdered whose single-task merge of
    partitions×N rows breaks at 10⁹-row corpora)."""
    return f"(((abs({key}) % {_P1}) * {_KNUTH} + {_OFF}) % {_P2})"


def hash_sample_threshold(target_n: int, corpus_n: int) -> int:
    """The rank cutoff T such that ``hash_rank < T`` keeps ≈``target_n``
    of ``corpus_n`` rows — exact int64 ceiling arithmetic that both
    engines reproduce bit-for-bit (T = ceil(P2·target/corpus); every
    intermediate < 2^63 for any real corpus). The selected SET is a
    deterministic function of the keys alone — partitioning-, order-
    and engine-invariant — and selecting it is one scan-adjacent
    predicate: no sort, no shuffle, no driver merge."""
    if target_n >= corpus_n:
        return _P2  # keep everything
    return (_P2 * target_n + corpus_n - 1) // corpus_n


def hash_sample(
    df: DataFrame, key_col: str, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < ``pct`` — a deterministic ~pct%
    sample, stable across runs/engines/partitionings. Map-only: the
    filter is a scan-adjacent projection predicate, no shuffle."""
    bucket = F.expr(hash_bucket_sql(key_col, buckets))
    return df.filter(bucket < pct)


def split_column(key_col: str, train_pct: int = 80, val_pct: int = 10) -> F.Column:
    """'train' / 'val' / 'test' label from the stable hash bucket."""
    b = F.expr(hash_bucket_sql(key_col))
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_column_sql(key_col: str, train_pct: int = 80, val_pct: int = 10) -> str:
    b = hash_bucket_sql(key_col)
    return (
        f"CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END"
    )


def train_val_test_summary(docs: DataFrame) -> DataFrame:
    """Assign each document a deterministic split and summarize size
    per split (doc count + exact char volume). One narrow shuffle on a
    3-value key; the assignment itself is map-only and would be
    written out as a column (or partition dir) at scale."""
    return (
        docs.select(
            split_column("doc_id").alias("split"),
            F.col("n_chars"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def train_val_test_summary_oracle(table: str = "documents") -> str:
    return f"""
        SELECT {split_column_sql('doc_id')} AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM {table}
        GROUP BY 1
    """


def hash_sample_oracle(table: str = "documents", pct: int = 10) -> str:
    return f"""
        SELECT doc_id, lang, source, n_chars
        FROM {table}
        WHERE {hash_bucket_sql('doc_id')} < {pct}
    """


def value_histogram(
    events: DataFrame, value_col: str = "value", bin_width: float = 5.0
) -> DataFrame:
    """Fixed-width histogram of a double measure. Binning is done on
    scaled longs (exact integer floor-div), so bin assignment is
    bit-identical across engines; the bin lower edge lowers to double
    once. Map-side partial aggregation ⇒ one tiny shuffle of
    (n_bins × cores) rows regardless of input size."""
    w_micros = int(round(bin_width * 1_000_000))
    bin_idx = F.floor(value_to_micros(value_col) / w_micros).cast("long")
    return (
        events.select(bin_idx.alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin_idx",
            micros_to_value(F.col("bin_idx") * w_micros).alias("bin_lo"),
            "n_rows",
        )
    )


def value_histogram_oracle(
    table: str = "events", value_col: str = "value", bin_width: float = 5.0
) -> str:
    w_micros = int(round(bin_width * 1_000_000))
    scaled = sql_value_to_micros(value_col)
    # DuckDB // on BIGINT is floor division, same as Spark FLOOR(/)
    return f"""
        SELECT bin_idx,
               {sql_micros_to_value(f'bin_idx * {w_micros}')} AS bin_lo,
               COUNT(*) AS n_rows
        FROM (SELECT CAST({scaled} // {w_micros} AS BIGINT) AS bin_idx FROM {table})
        GROUP BY bin_idx
    """


def exact_deciles(
    orders: DataFrame, value_col: str = "o_totalprice", key_col: str = "o_orderkey"
) -> DataFrame:
    """Exact decile values of a measure: rank every row by (scaled
    value, unique key) and select ranks ceil(n·k/10), k = 1…10 — the
    same discrete-quantile definition rendered on both engines, so
    results match bit-for-bit (no interpolation arithmetic to disagree
    on).

    Scale note: the global row_number forces a total order (single
    reduce partition after a distributed range-sort). Exact quantiles
    over 100 TB pay that price by definition; the production path at
    scale is `percentile_approx` (t-digest, fully distributed), which
    tests assert stays within tolerance of this exact operator."""
    vm = value_to_micros(value_col)
    w = W.orderBy(vm, F.col(key_col))
    ranked = orders.select(
        vm.alias("_vm"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("_n"),
    )
    k = F.col("decile")
    target = F.ceil(F.col("_n") * k / 10).cast("long")
    deciles = ranked.crossJoin(
        F.broadcast(
            ranked.sparkSession.range(1, 11).select(F.col("id").alias("decile"))
        )
    ).filter(F.col("_rn") == target)
    return deciles.select(
        "decile", micros_to_value(F.col("_vm")).alias("decile_value")
    )


def exact_deciles_oracle(
    table: str = "orders", value_col: str = "o_totalprice", key_col: str = "o_orderkey"
) -> str:
    scaled = sql_value_to_micros(value_col)
    return f"""
        SELECT d.decile,
               {sql_micros_to_value('r._vm')} AS decile_value
        FROM (
            SELECT {scaled} AS _vm,
                   row_number() OVER (ORDER BY {scaled}, {key_col}) AS _rn,
                   COUNT(*) OVER () AS _n
            FROM {table}
        ) r
        JOIN (SELECT unnest(range(1, 11)) AS decile) d
          ON r._rn = CAST(ceil(r._n * d.decile / 10) AS BIGINT)
    """


def _mix_sql(key: str) -> str:
    """The full-range mix (no bucket mod): a deterministic pseudo-random
    total order key, identical in both dialects."""
    return f"(((abs({key}) % {_P1}) * {_KNUTH} + {_OFF}) % {_P2})"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by the
    deterministic hash order (mix(key), key) — the reproducible version
    of 'sample N documents per language'.

    Scale shape: ONE hash shuffle on the stratum key + per-partition
    top-n (Spark plans rank-filter windows as WindowGroupLimit: each
    map task keeps only n rows per stratum before the shuffle, so the
    exchange carries ≤ n·|strata| rows per task, not the corpus). A
    dominant stratum therefore costs n rows per upstream task, not a
    skewed full-stratum partition."""
    order = F.expr(_mix_sql(key_col))
    w = W.partitionBy(strata_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def stratified_sample_summary(
    docs: DataFrame, n_per_stratum: int = 25
) -> DataFrame:
    """Gate shape: the sampled doc rows, projected to stable columns."""
    return stratified_sample(docs, "lang", "doc_id", n_per_stratum).select(
        "doc_id", "lang", "source", "n_chars"
    )


def stratified_sample_summary_oracle(
    table: str = "documents", n_per_stratum: int = 25
) -> str:
    return f"""
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {_mix_sql('doc_id')}, doc_id
                   ) AS _rn
            FROM {table}
        )
        WHERE _rn <= {n_per_stratum}
    """


# --------------------------------------------------------------------------
# leakage-free train/val/test split (cluster-aware)
# --------------------------------------------------------------------------
#
# A doc-id-hash split (train_val_test_summary above) puts exact/near
# duplicates of a training document into the EVAL split — the standard
# train/test contamination failure (the reason dedup papers — Lee et
# al. 2022 §6 — measure eval overlap). The leakage-free split decides
# the split once per CONTENT CLUSTER (here: exact-content digest
# groups, the same digests dedup.exact_dup_groups keys on) and every
# member inherits the canonical member's assignment, so no cluster
# ever straddles a split boundary. At 100 TB this is one
# (digest, doc_id) shuffle for the cluster map and one join — both on
# the same digest key, so the exchange is reused.


def leakage_free_split_summary(
    docs: DataFrame,
    text_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Cluster-aware split assignment + audit: per split, the doc
    count, cluster count, and ``n_rescued`` — members whose OWN
    doc_id-hash split would have differed from their cluster's
    (exactly the documents a naive split would leak across the
    boundary)."""
    from uwheel_datafusion_spark.functions.dialect import SPARK as _D

    digest = F.expr(_D.md5(f"coalesce({text_col}, '')"))
    tagged = docs.select("doc_id", digest.alias("digest"))
    canon = tagged.groupBy("digest").agg(
        F.min("doc_id").alias("canonical_id")
    )
    joined = tagged.join(canon, "digest")
    cluster_split = split_column("canonical_id", train_pct, val_pct)
    own_split = split_column("doc_id", train_pct, val_pct)
    return (
        joined.select(
            cluster_split.alias("split"),
            (cluster_split != own_split).cast("long").alias("rescued"),
            "canonical_id",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_id").alias("n_clusters"),
            F.sum("rescued").alias("n_rescued"),
        )
    )


def leakage_free_split_summary_oracle(
    table: str = "documents",
    text_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    from uwheel_datafusion_spark.functions.dialect import DUCK as _D

    digest = _D.md5(f"coalesce({text_col}, '')")
    cs = split_column_sql("canonical_id", train_pct, val_pct)
    os_ = split_column_sql("doc_id", train_pct, val_pct)
    return f"""
        WITH tagged AS (
            SELECT doc_id, {digest} AS digest FROM {table}
        ),
        canon AS (
            SELECT digest, MIN(doc_id) AS canonical_id
            FROM tagged GROUP BY 1
        ),
        joined AS (
            SELECT t.doc_id, c.canonical_id
            FROM tagged t JOIN canon c USING (digest)
        )
        SELECT {cs} AS split,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT canonical_id) AS n_clusters,
               CAST(SUM(CASE WHEN {cs} <> {os_} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rescued
        FROM joined
        GROUP BY 1
    """
