"""Deduplication operators for training-data pipelines.

Five families, each designed for 100 TB scale first and oracle-exact
determinism second:

- **exact**: md5-groupBy — one shuffle on the digest, no full-text
  shuffle (the digest is 32 bytes regardless of document size).
- **n-gram Jaccard (exact)**: inverted-index (posting-list) self-join
  on shingles — the scalable exact-similarity join (never a cross
  join; candidate pairs are generated only for docs sharing a
  shingle). Skew note: a shingle shared by k docs yields k² join rows,
  so frequent-shingle removal (stop-shingles) is the production knob;
  AQE skew-join handles the remainder.
- **MinHash**: k seeded affine hashes over the portable 32-bit token
  hash (functions.dialect.hash32) — pure integer math, deterministic,
  identical in the DuckDB oracle.
- **MinHash-LSH**: band signatures → equi-join on (band_idx, band
  value). This is the sub-quadratic candidate generator; with fixed
  hash constants it is fully deterministic, so even the LSH output is
  oracle-checked (not rows-only).
- **SimHash**: 16-bit fingerprints via md5-nibble bit votes; near-dup
  pairs by Hamming distance with a pigeonhole band join (4 bands of 4
  bits — any pair within distance 3 must agree on ≥1 band), verified
  by exact bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.dialect import DUCK, SPARK, Dialect
from uwheel_datafusion_spark.operators.util import ensure_min_parallelism

# fixed MinHash constants (any odd a works; deterministic by design —
# the reference's unseeded RNG non-reproducibility is a bug we fix,
# SURVEY §2.8 F5)
MINHASH_PRIME = 2_147_483_647
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 1_234_567),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (134_775_813, 1_023),
    (1_099_087_573, 511),
    (48_271, 3),
)
# 8 minhashes → 2 bands × 4 rows: candidate threshold ≈ (1/b)^(1/r) ≈ 0.84
# Jaccard — tuned for near-dup detection; 2-row bands drown in candidates
# when the corpus shares vocabulary (measured: 80% of all pairs at sf0.01).
N_BANDS = 2
ROWS_PER_BAND = 4

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 bands × 8 bits; pigeonhole-complete for dist ≤ 3
SIMHASH_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_MAX = 3


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content digest. Returns every group with its size and
    canonical (min) doc_id — dedup = keep canonical, drop the rest.
    At scale: shuffle moves only (digest, doc_id) pairs."""
    d = SPARK
    return (
        docs.select("doc_id", F.expr(d.md5(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def exact_dup_groups_oracle(table: str = "documents", text_col: str = "text") -> str:
    d = DUCK
    return f"""
        SELECT {d.md5(text_col)} AS text_md5,
               COUNT(*) AS n_copies,
               MIN(doc_id) AS keep_doc_id
        FROM {table}
        GROUP BY 1
    """


# --------------------------------------------------------------------------
# exact n-gram Jaccard via posting-list join
# --------------------------------------------------------------------------


def _fan_out(docs: DataFrame) -> DataFrame:
    """See operators.util.ensure_min_parallelism — the md5-chain
    hashing expressions must not serialize on a single-file scan."""
    return ensure_min_parallelism(docs, "doc_id")


def _shingle_sets(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    d = SPARK
    # tokenize ONCE into a materialized array column: shingles
    # references its tokens argument n+1 times per window position and
    # neither engine eliminates common subexpressions inside lambdas,
    # so an inline split(text) re-tokenizes the document per position —
    # quadratic in document length (spans.py measured 12 s → 0.6 s at
    # sf0.1 for exactly this expression family)
    sh = d.array_distinct(d.shingles("_ts", n))
    return (
        _fan_out(docs)
        .select("doc_id", F.expr(d.split(text_col)).alias("_ts"))
        .select("doc_id", F.expr(sh).alias("shingles"))
        .withColumn("n_shingles", F.size("shingles"))
    )


#: Hard fence for the full posting self-join: a frequent shingle with f
#: postings contributes f² join rows, so corpora beyond this many docs
#: must go through prefix_filter_jaccard_pairs() (PPJoin-class prefix
#: filtering — provably lossless, bounded candidate set).
MAX_EXACT_POSTING_DOCS = 100_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_docs: int = MAX_EXACT_POSTING_DOCS,
) -> DataFrame:
    """Exact Jaccard-similarity join: explode distinct shingles to a
    posting list, self-join on the shingle, count commons per pair, compute
    jaccard = |∩| / (|A|+|B|−|∩|). Output (doc_a, doc_b, n_common,
    jaccard) for pairs ≥ threshold.

    This is the CORRECTNESS BASELINE: the posting self-join is
    hash-partitioned on the shingle (no cross join), but a frequent
    shingle with f postings still yields f² join rows — quadratic in
    the worst case. Mirroring keyed_wheel's hot-serving cap, it
    refuses above ``max_docs`` documents; the scale path with the same
    exact-pair contract is prefix_filter_jaccard_pairs()."""
    # bounded fence probe: LIMIT max_docs+1 short-circuits the scan at
    # the cap instead of fully evaluating (possibly uncached) upstream
    # frames just to decide admission
    if docs.limit(max_docs + 1).count() > max_docs:
        raise ValueError(
            f"ngram_jaccard_pairs is the exact posting-join baseline and "
            f"refuses > {max_docs} docs; use "
            f"prefix_filter_jaccard_pairs() — the PPJoin-class prefix-"
            f"filtered scale path (lossless, bounded candidates)"
        )
    sets = _shingle_sets(docs, text_col, n)
    posting = sets.select(
        "doc_id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    # NOT cached: both join sides shuffle on the shingle with identical
    # subplans, so ReuseExchange already computes the postings once; an
    # explicit cache() would break that reuse
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def ngram_jaccard_pairs_oracle(
    table: str = "documents", text_col: str = "text", n: int = 3, threshold: float = 0.5
) -> str:
    d = DUCK
    sh = d.array_distinct(d.shingles("_ts", n))
    return f"""
        WITH toked AS (
            SELECT doc_id, {d.split(text_col)} AS _ts FROM {table}
        ),
        sets AS (
            SELECT doc_id, {sh} AS shingles FROM toked
        ),
        sized AS (SELECT doc_id, len(shingles) AS n_shingles FROM sets),
        posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sets),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM posting a JOIN posting b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_common,
               CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
        FROM common
        JOIN sized sa ON sa.doc_id = doc_a
        JOIN sized sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= {threshold}
    """


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Prefix-filtered exact Jaccard join (AllPairs/PPJoin family,
    Bayardo et al. WWW'07 / Xiao et al. ICDE'08 — public literature):
    the LOSSLESS candidate reduction for threshold similarity joins.

    Order every shingle by global document frequency (rarest first,
    tie on the shingle string); for a set of size s and threshold
    t = num/den, any pair with J ≥ t shares ≥ ceil(t·s) shingles, so
    its globally-FIRST common shingle must lie within each side's
    first ``p = s − ceil(t·s) + 1`` shingles — joining only prefixes
    finds every qualifying pair. Candidates then verify exactly, so the
    output EQUALS the full posting join (which is the gate's oracle:
    equality is the losslessness theorem, checked per run).

    Scale shape vs the plain posting join: the posting self-join
    explodes every shingle on both sides — frequent (boilerplate)
    shingles dominate the join quadratically. Here frequent shingles
    sort LAST and fall outside most prefixes, so the join touches the
    rare end of the distribution; the frequency table is one extra
    count shuffle. Threshold is a fraction (num/den) so prefix lengths
    are exact integer arithmetic on both engines.
    """
    from pyspark.sql import Window

    sets = _shingle_sets(docs, text_col, n)
    posting = sets.select(
        "doc_id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    freq = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))
    ranked = posting.join(freq, "shingle")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("df_cnt").asc(), F.col("shingle").asc()
    )
    # p = s − ceil(s·num/den) + 1, all-integer
    p = (
        F.col("n_shingles")
        - F.expr(
            f"(n_shingles * {threshold_num} + {threshold_den} - 1)"
            f" div {threshold_den}"
        )
        + 1
    )
    prefix = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= p)
        .select("doc_id", "shingle")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification on candidates only (array intersect; at
    # cluster scale, a candidate-semi-filtered posting recount avoids
    # shipping the arrays — same result either way)
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .filter(
            F.col("n_common") * threshold_den
            >= (F.col("na") + F.col("nb") - F.col("n_common")) * threshold_num
        )
    )
    return verified.select("doc_a", "doc_b", "n_common", "jaccard")


# --------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# --------------------------------------------------------------------------


def _token_hashes_expr(d: Dialect, text_col: str) -> str:
    return d.token_hashes(d.array_distinct(d.split(text_col)))


def _minhash_exprs(d: Dialect, hashes: str) -> list[str]:
    """k affine min-hashes over an ALREADY-MATERIALIZED bigint list
    (column/CTE reference). Inlining the md5 chain here instead would
    re-hash every token k times — materialize once, derive k times."""
    out = []
    for a, b in MINHASH_COEFFS:
        transformed = d.transform(hashes, "h", f"(h * {a} + {b}) % {MINHASH_PRIME}")
        out.append(f"COALESCE({d.array_min(transformed)}, {MINHASH_PRIME})")
    return out


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """k=8 MinHash values per document (map-only, no shuffle; the
    token-hash array is computed once per row, then k affine mins)."""
    docs = _fan_out(docs)
    hashed = docs.select(
        "doc_id", F.expr(_token_hashes_expr(SPARK, text_col)).alias("_hs")
    )
    exprs = _minhash_exprs(SPARK, "_hs")
    return hashed.select(
        "doc_id", *[F.expr(e).alias(f"mh{i}") for i, e in enumerate(exprs)]
    )


def minhash_signatures_oracle(table: str = "documents", text_col: str = "text") -> str:
    cols = ",\n  ".join(
        f"{e} AS mh{i}" for i, e in enumerate(_minhash_exprs(DUCK, "_hs"))
    )
    return f"""
        WITH hashed AS (
            SELECT doc_id, {_token_hashes_expr(DUCK, text_col)} AS _hs FROM {table}
        )
        SELECT doc_id, {cols} FROM hashed
    """


def _band_hash_expr(j: int) -> str:
    """Combine the band's ROWS_PER_BAND minhashes into one bigint key
    (Horner mix mod p — stays in int64, identical in both dialects)."""
    expr = f"mh{j * ROWS_PER_BAND}"
    for r in range(1, ROWS_PER_BAND):
        expr = f"(({expr}) * 31 + mh{j * ROWS_PER_BAND + r}) % {MINHASH_PRIME}"
    return expr


def lsh_band_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The LSH *index* relation: one row per (doc_id, band_idx,
    band_hash) — N_BANDS rows per document, flat in corpus size. This
    is what gets PERSISTED for incremental dedup: the historical corpus
    is represented by this table alone (≈ tens of bytes per doc), so a
    new ingest batch never re-reads corpus text."""
    sig = minhash_signatures(docs, text_col)
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.expr(_band_hash_expr(j)).alias("band_hash"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def lsh_band_table_oracle(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of lsh_band_table — used by the streaming index
    parity gate (streamed bands must be row-identical to batch)."""
    sig_sql = minhash_signatures_oracle(table, text_col)
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, CAST({j} AS BIGINT) AS band_idx, "
        f"{_band_hash_expr(j)} AS band_hash FROM sig"
        for j in range(N_BANDS)
    )
    return f"WITH sig AS ({sig_sql}) {band_selects}"


def save_lsh_index(bands: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the band table partitioned by band_idx; EXTEND the index
    with a new ingest batch by writing its bands with mode='append' —
    the incremental join below needs no compaction. At cluster scale,
    bucket by band_hash inside each band partition
    (sources/bucketing.write_bucketed_table) so the probe join is
    co-located and shuffle-free."""
    bands.write.mode(mode).partitionBy("band_idx").parquet(path)


def load_lsh_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def lsh_incremental_candidates(
    new_docs: DataFrame,
    index_bands: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental ingest dedup — THE production shape: each new crawl
    batch is checked against the FULL historical corpus through the
    persisted band table, without re-scanning or re-hashing the corpus.
    Returns (new_doc_id, corpus_doc_id) candidate pairs.

    Scale shape: the new batch's bands are small (N_BANDS rows/doc) and
    hash-join against the index on (band_idx, band_hash) — with the
    index bucketed on band_hash this is a broadcast (small batch) or
    co-located join; corpus text is never touched. Candidates then
    verify exactly (Jaccard on the pair's shingles) like every LSH
    path here — verification reads only the candidate docs."""
    new_bands = lsh_band_table(new_docs, text_col).select(
        F.col("doc_id").alias("new_doc_id"), "band_idx", "band_hash"
    )
    return (
        new_bands.join(
            index_bands.select(
                F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )


def lsh_incremental_candidates_oracle(
    corpus_pred: str, new_pred: str, table: str = "documents",
    text_col: str = "text",
) -> str:
    """Oracle twin over one table split by predicates (the gate splits
    the fixture into 'corpus' and 'new batch' by doc_id hash)."""
    sig_sql = minhash_signatures_oracle(table, text_col)
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_idx, {_band_hash_expr(j)} AS band_hash FROM sig"
        for j in range(N_BANDS)
    )
    # predicates are applied inside per-side subqueries (where doc_id
    # is unambiguous) rather than string-qualified into the join scope:
    # blind 'doc_id' → 'n.doc_id' substitution broke on predicates that
    # were already qualified or contained doc_id as an identifier
    # substring
    return f"""
        WITH sig AS ({sig_sql}),
        bands AS ({band_selects})
        SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
        FROM (SELECT * FROM bands WHERE {new_pred}) n
        JOIN (SELECT * FROM bands WHERE {corpus_pred}) c
          ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
    """


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH: N_BANDS bands × ROWS_PER_BAND rows; docs sharing any band become a candidate
    pair. Sub-quadratic: the join key is (band_idx, band_hash) — at
    scale this is the only way a Jaccard join touches 100 TB without
    a quadratic blowup. Deterministic constants ⇒ exact oracle.

    ``max_bucket_size`` drops buckets with more members (boilerplate
    mega-buckets: a bucket of b docs emits b·(b−1)/2 pairs, so one
    viral template can dominate the whole job). Dropped buckets are
    near-useless for dedup — their members pair up through their other,
    discriminative bands. The cap is applied identically in the oracle.
    """
    bands = lsh_band_table(docs, text_col)
    # materialize once: the self-join would otherwise recompute the
    # md5-chain minhash expressions on BOTH sides
    bands = bands.cache()
    if max_bucket_size is not None:
        small = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_bucket_size)
            .select("band_idx", "band_hash")
        )
        bands = bands.join(small, ["band_idx", "band_hash"], "left_semi")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_candidates_oracle(
    table: str = "documents",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> str:
    sig_sql = minhash_signatures_oracle(table, text_col)
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_idx, {_band_hash_expr(j)} AS band_hash FROM sig"
        for j in range(N_BANDS)
    )
    bucket_filter = ""
    if max_bucket_size is not None:
        bucket_filter = f"""
        , small AS (
            SELECT band_idx, band_hash FROM bands
            GROUP BY band_idx, band_hash
            HAVING COUNT(*) <= {max_bucket_size}
        )"""
        joined = "bands a JOIN small s ON a.band_idx = s.band_idx AND a.band_hash = s.band_hash"
        # restrict both sides to surviving buckets
        return f"""
            WITH sig AS ({sig_sql}),
            bands AS ({band_selects}){bucket_filter},
            kept AS (SELECT a.doc_id, a.band_idx, a.band_hash FROM {joined})
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        """
    return f"""
        WITH sig AS ({sig_sql}),
        bands AS ({band_selects})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    """


# --------------------------------------------------------------------------
# SimHash fingerprints + Hamming near-dup pairs
# --------------------------------------------------------------------------


def _simhash_expr(d: Dialect, hashes: str) -> str:
    """SimHash over SIMHASH_BITS bits of hash32: per token vote ±1 per
    bit position weighted by occurrence, final bit = sign of the vote.

    ``hashes`` must be a MATERIALIZED list<bigint> column (not an
    inline md5-chain expression): the expression references it once per
    bit, so inlining the token-hash chain would re-hash every token
    SIMHASH_BITS times per row."""
    bit_terms = []
    for bit in range(SIMHASH_BITS):
        votes = d.sum_list_bigint(
            d.transform(hashes, "h", f"CASE WHEN ((h >> {bit}) & 1) = 1 THEN 1 ELSE -1 END")
        )
        bit_terms.append(f"(CASE WHEN ({votes}) > 0 THEN {1 << bit} ELSE 0 END)")
    return "CAST(" + " + ".join(bit_terms) + " AS BIGINT)"


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    d = SPARK
    docs = _fan_out(docs)
    return docs.select(
        "doc_id",
        F.expr(d.token_hashes(d.split(text_col))).alias("_hs"),
    ).select("doc_id", F.expr(_simhash_expr(d, "_hs")).alias("simhash"))


def simhash_fingerprints_oracle(table: str = "documents", text_col: str = "text") -> str:
    d = DUCK
    return f"""
        SELECT doc_id, {_simhash_expr(d, '_hs')} AS simhash
        FROM (
            SELECT doc_id, {d.token_hashes(d.split(text_col))} AS _hs
            FROM {table}
        )
    """


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_dist: int = HAMMING_MAX
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_dist.

    Scale path: band join (pigeonhole — with 4 bands over the simhash
    bits, any pair at distance ≤ 3 shares at least one intact band), then exact
    bit_count(xor) verification. Identical result set to a cross join,
    at a fraction of the pairs generated."""
    fp = simhash_fingerprints(docs, text_col)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.shiftright(F.col("simhash"), j * SIMHASH_BAND_WIDTH)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_WIDTH) - 1))
                        .alias("band_val"),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    # materialize once: the self-join would otherwise evaluate the
    # 32-bit-vote simhash expression on BOTH sides
    bands = bands.cache()
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.expr("sh_a ^ sh_b"))
    return (
        pairs.withColumn("hamming", dist.cast("long"))
        .filter(F.col("hamming") <= max_dist)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_pairs_oracle(
    table: str = "documents", text_col: str = "text", max_dist: int = HAMMING_MAX
) -> str:
    """Oracle uses the brute-force pair join — same result as the band
    join by the pigeonhole argument (that equivalence IS the test)."""
    fp = simhash_fingerprints_oracle(table, text_col)
    return f"""
        WITH fp AS ({fp})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_dist}
    """


# --------------------------------------------------------------------------
# connected components over the near-dup pair graph
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive closure of pairwise candidates into dedup GROUPS:
    (doc_id, component) where component = min doc_id reachable — the
    step that turns "A~B, B~C" into one keep-one-drop-two group.

    Iterative min-label propagation to a fixpoint: each round joins
    labels to the symmetric edge list and takes the per-node min. Each
    round is one shuffle on doc id; rounds needed = graph diameter
    (near-dup components are shallow), and the loop stops at the first
    unchanged round. Every round ``localCheckpoint``s the labels — the
    new labels reference the old twice (union + convergence check), so
    without lineage truncation the logical plan doubles per round and
    the DRIVER dies on plan analysis long before the data is big
    (observed: OOM at ~1 450 edges). GraphFrames/GraphX
    large-star-small-star is the drop-in upgrade if components turn
    out deep. Deterministic: min() is order-free."""
    sym = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        prop = sym.join(labels, sym.src == labels.doc).select(
            F.col("dst").alias("doc"), "label"
        )
        # fused convergence check (guide §2.4 — one exchange, not two):
        # tag the old label through the union so the SAME groupBy that
        # takes the min also recovers each doc's previous label; changed
        # = min < previous. The old shape re-joined new labels to old
        # labels every round — a whole extra shuffle per round for a
        # boolean. Every doc has exactly one old row, so _prev is exact
        # and min(label) ≤ _prev always; identical labels either way.
        new_labels = (
            labels.select("doc", "label", F.lit(True).alias("_old"))
            .unionByName(prop.select("doc", "label", F.lit(False).alias("_old")))
            .groupBy("doc")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("_old"), F.col("label"))).alias("_prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") < F.col("_prev")).count()
        labels = new_labels.select("doc", "label")
        if changed == 0:
            break
    if changed != 0:
        # a silent cutoff would return WRONG labels (caught by a
        # 65-node chain: diameter 64 > 50 rounds). Deep graphs belong
        # on the O(log²n)-round star algorithm.
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); use "
            "connected_components_star for deep graphs"
        )
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("label").alias("component")
    )


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Large-star / small-star connected components — the upgrade the
    min-label loop's docstring names for DEEP graphs (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14; public
    algorithm, re-expressed as DataFrame ops).

    Min-label propagation needs diameter-many rounds (a 10 000-node
    chain = 10 000 shuffles); the star operations contract the graph
    toward a star per component in O(log² n) rounds — at 100 TB where
    a transitive near-dup chain CAN get long, this is the shape that
    still terminates. Each round:

    - **large-star**: every node points its LARGER neighbors at its
      smallest neighbor-or-self (per-node groupBy min + join);
    - **small-star**: on larger→smaller canonical edges, every node
      repoints its smaller neighbors (and itself) at the minimum.

    Both are one groupBy + one join on node id; per-round
    ``localCheckpoint`` truncates lineage exactly like the min-label
    loop (same observed driver-OOM failure mode). Fixpoint: the
    canonical edge set stops changing; then every non-root node holds
    exactly the edge (node, component-min). Deterministic (min is
    order-free), so the same WITH RECURSIVE oracle applies.

    Returns (doc_id, component) with component = min doc id, matching
    ``connected_components`` exactly (pinned in tests)."""
    raw = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    # nodes from the RAW pairs so self-loop-only nodes still surface as
    # singletons (matching connected_components)
    nodes = (
        raw.select(F.col("x").alias("doc"))
        .unionByName(raw.select(F.col("y").alias("doc")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    canon = (
        raw.filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = canon
    e_count = e.count()  # carried forward: each round's small.count()
    for _ in range(max_iter):
        # large-star over the symmetric view
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star over larger→smaller edges (large's output is
        # already canonical: u > v by construction)
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # count equality first (carried from last round — no job for
        # e.count()); the set-difference probe only runs near fixpoint
        small_count = small.count()
        same = (
            small_count == e_count
            and small.exceptAll(e).limit(1).count() == 0
        )
        e, e_count = small, small_count
        if same:
            break
    else:
        # same policy as the min-label loop: never return possibly
        # partial contractions silently
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed are O(log² n))"
        )
    # at the fixpoint e is a star per component (each non-root node has
    # exactly the edge (node, min)); the groupBy-min is belt-and-braces
    # against a max_iter cutoff mid-contraction
    return (
        nodes.join(e, nodes.doc == e.u, "left")
        .groupBy("doc")
        .agg(F.min(F.coalesce(F.col("v"), F.col("doc"))).alias("component"))
        .select(F.col("doc").alias("doc_id"), "component")
    )


def connected_components_oracle(pairs_sql: str) -> str:
    """Fixpoint via WITH RECURSIVE reachability + min-label lowering —
    the same answer as the propagation loop, derived independently."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS doc FROM sym),
        reach(doc, label) AS (
            SELECT doc, doc FROM nodes
            UNION
            SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.doc
        )
        SELECT doc AS doc_id, MIN(label) AS component
        FROM reach GROUP BY doc
    """


# --------------------------------------------------------------------------
# cluster canonicalization (quality-aware keep/drop decision)
# --------------------------------------------------------------------------

#: deterministic canonical ordering: longer doc wins, ties broken by
#: smaller doc_id. The Spark path orders by a (n_chars, -doc_id)
#: struct — no encoding, no doc_id magnitude limit. The DuckDB ORACLE
#: encodes the same order as ONE bigint so arg_max can use it (same
#: trick as gate._ARGMAX_ORD_SQL); that encoding assumes
#: doc_id < 2^22, which holds for the oracle fixtures (≤ sf0.1) and
#: is never on the scale path.
_CANON_ORD_SQL = "(n_chars * 4194304 - doc_id)"


def canonicalize(
    docs: DataFrame, pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """The dedup END decision: every document gets (component,
    canonical_id, keep). Near-dup pairs → connected components →
    quality-aware canonical per component (longest doc, not min-id —
    production pipelines keep the best member, the min-id convention
    throws away content); docs outside the pair graph are their own
    canonical and always kept.

    Scale shape: component labels are one row per CLUSTERED doc — a
    plain equi-join on doc_id, deliberately not a forced broadcast: in
    a web-scale corpus the near-dup fraction can be 30–50% of all
    documents, far past broadcast size (AQE still broadcasts the label
    table whenever it IS small); the canonical argmax is a groupBy
    over the labeled subset only; final join back is keyed on
    component. No corpus-wide shuffle beyond what CC itself does."""
    comp = connected_components(pairs, a_col, b_col)
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
        .withColumn(
            "ord",
            F.struct(
                F.col("n_chars").alias("len"),
                (-F.col("doc_id")).alias("neg_id"),
            ),
        )
    )
    canon = labeled.groupBy("component").agg(
        F.expr("max_by(doc_id, ord)").alias("canonical_id")
    )
    return (
        labeled.join(canon, "component")
        .select(
            "doc_id",
            "component",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).cast("long").alias("keep"),
        )
    )


def canonicalize_oracle(pairs_sql: str, table: str = "documents") -> str:
    return f"""
        WITH comp_t AS ({connected_components_oracle(pairs_sql)}),
        labeled AS (
            SELECT d.doc_id, d.n_chars,
                   COALESCE(c.component, d.doc_id) AS component
            FROM {table} d LEFT JOIN comp_t c ON c.doc_id = d.doc_id
        ),
        canon AS (
            SELECT component, arg_max(doc_id, {_CANON_ORD_SQL}) AS canonical_id
            FROM labeled GROUP BY component
        )
        SELECT l.doc_id, l.component, cn.canonical_id,
               CAST(CASE WHEN l.doc_id = cn.canonical_id THEN 1 ELSE 0 END
                    AS BIGINT) AS keep
        FROM labeled l JOIN canon cn USING (component)
    """
