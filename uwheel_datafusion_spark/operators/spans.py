"""Exact duplicate-SPAN detection and removal + Bloom dedup gate.

Document-level dedup (exact md5, MinHash/LSH, SimHash — operators/
dedup.py) treats a document as the unit. Training corpora additionally
carry *partial* duplication: boilerplate headers, license blocks,
quoted passages repeated across otherwise-distinct documents. The
remedy in the literature (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022 — the ExactSubstr method) is
to find every maximal token span of length ≥ k that occurs in more
than one document and cut it out, keeping the surrounding text.

The paper builds a single-machine suffix array; that does not shard.
This module re-expresses the same semantics as bounded-shuffle
DataFrame ops:

1.  **posting**: every k-token window (gram) of every document,
    hashed to 32 bits — map-only explode off the scan, positions
    carried as ints.
2.  **duplicated grams**: `GROUP BY gram_hash HAVING
    COUNT(DISTINCT doc_id) >= min_docs` — ONE shuffle keyed on the
    hash; partial aggregation absorbs the per-doc repeats map-side.
3.  **islands**: per document, overlapping/adjacent duplicated
    windows merge into maximal spans with a classic gaps-and-islands
    lag window PARTITIONED BY doc_id — no global sort; a document's
    grams sort within its hash partition only.
4.  **scrub**: tokens covered by any island are anti-joined away and
    the survivors re-assemble in position order.

Scale: shuffles are keyed on (gram_hash) then (doc_id); nothing is
quadratic in corpus size and no stage materializes more than the
token stream itself (posting is |tokens| rows of 3 ints). Frequent
boilerplate grams are exactly the point — they stay one group each.

The Bloom gate (`bloom_bits` / `bloom_gate`) is the cheap membership
pre-filter for *incremental* ingest: the historical corpus collapses
to a ≤ m-row table of distinct bit positions (a materialized Bloom
bitset); a new batch probes it with a broadcast join and only docs
with ALL j bits set ("possibly seen") proceed to the expensive LSH /
span machinery. Deterministic md5-derived hash positions make the
filter engine-independent and DuckDB-oracle-able; the false-positive
rate is the textbook (1 - e^{-jn/m})^j.

Reference scope note: the reference engine (src/main.rs) has no text
tier at all — this module is part of the beyond-parity training-data
pipeline (SURVEY.md §2.12), same contract as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.dialect import DUCK, SPARK, Dialect
from uwheel_datafusion_spark.operators.util import ensure_min_parallelism

SPAN_K = 6  # tokens per window: spans of ≥ 6 shared tokens count
SPAN_MIN_DOCS = 2  # duplicated = seen in at least this many documents

BLOOM_M = 1 << 16  # bits in the filter
BLOOM_J = 5  # hash functions per document


# --------------------------------------------------------------------------
# shared dual-dialect fragments
# --------------------------------------------------------------------------


def _gram_hashes_expr(d: Dialect, tokens_col: str, k: int) -> str:
    """list<bigint>: 60-bit hash of each k-token window, in order.

    60-bit (not 32): scrub_duplicate_spans DELETES text based on these
    hashes with no verify stage, so a gram collision destroys unique
    text. At web-corpus scale (10^9+ distinct grams) 32-bit hashes are
    past the birthday bound by orders of magnitude; 60-bit keeps the
    expected collision count ≪1 up to ~10^9 grams (and the remaining
    tail only ever merges two spans, never fabricates one, since
    islands still group by doc_id).

    ``tokens_col`` must be a MATERIALIZED array column (not an inline
    split(...) expression): d.shingles references its tokens argument
    k+1 times per window position, and neither engine eliminates the
    common subexpression inside a lambda — an inline split re-tokenizes
    the document O(k·positions) times (measured 12 s → 0.6 s at sf0.1
    for the posting scan; same pathology the winnow fingerprints fixed
    for their hash list)."""
    return d.token_hashes60(d.shingles(tokens_col, k))


def _posting_cte(d: Dialect, table: str, text_col: str, k: int) -> str:
    """(doc_id, pos, gh) rows — 1-based window position. DuckDB zips
    parallel unnests of equal-length lists; Spark uses posexplode on
    the DataFrame side (see duplicate_span_posting)."""
    assert not d.is_spark, "Spark side builds posting via posexplode"
    return f"""
        toked AS (
            SELECT doc_id, {d.split(text_col)} AS _ts FROM {table}
        ),
        hashed AS (
            SELECT doc_id, {_gram_hashes_expr(d, '_ts', k)} AS _hs
            FROM toked
        ),
        posting AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(_hs))) AS pos,
                   unnest(_hs) AS gh
            FROM hashed
        )
    """


def duplicate_span_posting(
    docs: DataFrame, text_col: str = "text", k: int = SPAN_K
) -> DataFrame:
    """(doc_id, pos, gh): every k-gram window with its 1-based
    position — map-only off the scan (posexplode keeps pos and hash
    aligned without a second pass over the token list)."""
    docs = ensure_min_parallelism(docs, "doc_id")
    toked = docs.select(
        "doc_id", F.expr(SPARK.split(text_col)).alias("_ts")
    )
    hashed = toked.select(
        "doc_id", F.expr(_gram_hashes_expr(SPARK, "_ts", k)).alias("_hs")
    )
    return hashed.select(
        "doc_id", F.posexplode("_hs").alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")


# --------------------------------------------------------------------------
# islands: maximal duplicated spans per document
# --------------------------------------------------------------------------


def duplicate_span_islands(
    docs: DataFrame,
    text_col: str = "text",
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
) -> DataFrame:
    """Maximal cross-document duplicated token spans.

    Output: (doc_id, span_idx, span_start, span_end, n_grams) with
    1-based inclusive token positions; span_idx numbers a document's
    spans in text order. Two duplicated windows merge when they
    overlap or touch (next window starts ≤ k after the previous one).

    Plan shape: explode (map-only) → groupBy(gh) [shuffle 1, map-side
    partials] → join posting⋈dup-grams on gh [same partitioning
    reused] → lag window PARTITION BY doc_id [shuffle 2] → groupBy
    (doc_id, island) [co-partitioned, no extra shuffle].
    """
    posting = duplicate_span_posting(docs, text_col, k)
    dup = (
        posting.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gh")
    )
    hits = posting.join(dup, "gh").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        hits.withColumn(
            "_brk",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("span_idx", F.sum("_brk").over(run))
        .groupBy("doc_id", "span_idx")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )


def duplicate_span_islands_oracle(
    table: str = "documents",
    text_col: str = "text",
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
) -> str:
    d = DUCK
    return f"""
        WITH {_posting_cte(d, table, text_col, k)},
        dup AS (
            SELECT gh FROM posting
            GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= {min_docs}
        ),
        hits AS (
            SELECT p.doc_id, p.pos FROM posting p JOIN dup USING (gh)
        ),
        marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - LAG(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {k}
                        THEN 0 ELSE 1 END AS _brk
            FROM hits
        ),
        numbered AS (
            SELECT doc_id, pos,
                   CAST(SUM(_brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS span_idx
            FROM marked
        )
        SELECT doc_id, span_idx,
               MIN(pos) AS span_start,
               MAX(pos) + {k - 1} AS span_end,
               COUNT(*) AS n_grams
        FROM numbered
        GROUP BY doc_id, span_idx
    """


# --------------------------------------------------------------------------
# scrub: remove duplicated spans, keep the surrounding text
# --------------------------------------------------------------------------


def scrub_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
) -> DataFrame:
    """Cut every duplicated span out of every document (ExactSubstr
    removal). Output: (doc_id, clean_text, n_tokens_kept,
    n_tokens_removed); a fully-duplicated document survives as ''.

    Covered token positions expand from the duplicated windows
    (pos … pos+k-1, deduped) — |tokens|-bounded, never text-quadratic;
    survivors re-assemble in position order with an order-pinned
    aggregate on both engines (array_sort(collect_list(struct)) here,
    string_agg(… ORDER BY) in the oracle).
    """
    posting = duplicate_span_posting(docs, text_col, k)
    dup = (
        posting.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gh")
    )
    covered = (
        posting.join(dup, "gh")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {k - 1})")).alias("cpos"),
        )
        .distinct()
    )

    docs = ensure_min_parallelism(docs, "doc_id")
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(SPARK.split(text_col))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")

    kept = toks.join(
        covered,
        (toks.doc_id == covered.doc_id) & (toks.pos == covered.cpos),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " s -> s.tok), ' ')"
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    base = docs.select(
        "doc_id", F.expr(SPARK.size(SPARK.split(text_col))).alias("_n_tok")
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_tokens_kept", F.lit(0)).alias("n_tokens_kept"),
        (F.col("_n_tok") - F.coalesce("n_tokens_kept", F.lit(0))).alias(
            "n_tokens_removed"
        ),
    )


def scrub_duplicate_spans_oracle(
    table: str = "documents",
    text_col: str = "text",
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
) -> str:
    d = DUCK
    return f"""
        WITH {_posting_cte(d, table, text_col, k)},
        dup AS (
            SELECT gh FROM posting
            GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= {min_docs}
        ),
        covered AS (
            SELECT DISTINCT p.doc_id, p.pos + off.o AS cpos
            FROM posting p
            JOIN dup USING (gh)
            CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS o) off
        ),
        toks AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(_ts))) AS pos,
                   unnest(_ts) AS tok
            FROM (SELECT doc_id, {d.split(text_col)} AS _ts FROM {table})
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM toks t
            WHERE NOT EXISTS (
                SELECT 1 FROM covered c
                WHERE c.doc_id = t.doc_id AND c.cpos = t.pos
            )
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   COUNT(*) AS n_tokens_kept
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id,
               COALESCE(r.clean_text, '') AS clean_text,
               COALESCE(r.n_tokens_kept, 0) AS n_tokens_kept,
               {d.size(d.split('b.' + text_col))}
                   - COALESCE(r.n_tokens_kept, 0) AS n_tokens_removed
        FROM {table} b LEFT JOIN rebuilt r USING (doc_id)
    """


# --------------------------------------------------------------------------
# incremental span dedup: new batch vs persisted gram index
# --------------------------------------------------------------------------


def span_gram_index(
    docs: DataFrame, text_col: str = "text", k: int = SPAN_K
) -> DataFrame:
    """The persisted corpus-side state for incremental span dedup: the
    DISTINCT k-gram hashes of the corpus — one bigint per distinct
    gram, extended by append per ingest batch (same lifecycle as the
    LSH band index). Corpus text is never re-read by the probe."""
    return duplicate_span_posting(docs, text_col, k).select("gh").distinct()


def incremental_span_islands(
    new_docs: DataFrame,
    gram_index: DataFrame,
    text_col: str = "text",
    k: int = SPAN_K,
) -> DataFrame:
    """Maximal spans of a NEW batch that already exist in the corpus
    gram index — the ingest-time ExactSubstr probe. Same output shape
    as duplicate_span_islands; the duplicated-gram set is a semi-join
    of the batch's posting against the index (hash join on gh; with
    the index bucketed on gh, co-located and shuffle-free at corpus
    scale — the probe cost is the NEW batch's token stream, not the
    corpus)."""
    posting = duplicate_span_posting(new_docs, text_col, k)
    hits = posting.join(
        gram_index.select("gh"), "gh", "left_semi"
    ).select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        hits.withColumn(
            "_brk",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("span_idx", F.sum("_brk").over(run))
        .groupBy("doc_id", "span_idx")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )


def incremental_span_islands_oracle(
    corpus_pred: str,
    new_pred: str,
    table: str = "documents",
    text_col: str = "text",
    k: int = SPAN_K,
) -> str:
    """Oracle twin over one table split by predicates (mirrors
    lsh_incremental_candidates_oracle)."""
    d = DUCK
    return f"""
        WITH {_posting_cte(d, table, text_col, k)},
        idx AS (
            SELECT DISTINCT gh FROM posting WHERE {corpus_pred}
        ),
        hits AS (
            -- the new-batch predicate filters in a scope where doc_id
            -- is unambiguous (no blind string qualification — see
            -- lsh_incremental_candidates_oracle)
            SELECT p.doc_id, p.pos
            FROM (SELECT * FROM posting WHERE {new_pred}) p
            JOIN idx USING (gh)
        ),
        marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - LAG(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {k}
                        THEN 0 ELSE 1 END AS _brk
            FROM hits
        ),
        numbered AS (
            SELECT doc_id, pos,
                   CAST(SUM(_brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS span_idx
            FROM marked
        )
        SELECT doc_id, span_idx,
               MIN(pos) AS span_start,
               MAX(pos) + {k - 1} AS span_end,
               COUNT(*) AS n_grams
        FROM numbered
        GROUP BY doc_id, span_idx
    """


# --------------------------------------------------------------------------
# Bloom membership gate for incremental dedup
# --------------------------------------------------------------------------


def _bloom_bits_expr(d: Dialect, text_col: str, m: int, j: int) -> str:
    """list<bigint> of the document's DISTINCT Bloom bit positions:
    bit_i = hash32(md5(text || '#' || i)) % m for i in 1..j. Pure
    md5-nibble integer math — identical in both engines."""
    cast = "STRING" if d.is_spark else "VARCHAR"
    md5i = d.md5(f"concat({text_col}, '#', CAST(i AS {cast}))")
    return d.array_distinct(
        d.transform(d.seq1(str(j)), "i", f"({d.hash32_of_hex(md5i)} % {m})")
    )


def bloom_bits(
    docs: DataFrame, text_col: str = "text", m: int = BLOOM_M, j: int = BLOOM_J
) -> DataFrame:
    """(doc_id, bit) posting of each document's Bloom positions —
    map-only; `.select('bit').distinct()` of the corpus side IS the
    materialized filter (≤ m rows of one int, broadcastable)."""
    docs = ensure_min_parallelism(docs, "doc_id")
    return docs.select(
        "doc_id",
        F.explode(F.expr(_bloom_bits_expr(SPARK, text_col, m, j))).alias("bit"),
    )


def bloom_gate(
    docs: DataFrame,
    corpus_pred: str,
    new_pred: str,
    text_col: str = "text",
    m: int = BLOOM_M,
    j: int = BLOOM_J,
) -> DataFrame:
    """Probe a new batch against the corpus Bloom filter.

    Output: (doc_id, n_bits, n_hits, possible_dup) for every new-batch
    document. possible_dup=false is a *guarantee* the text was never
    in the corpus (no false negatives — same hash math both sides);
    possible_dup=true routes the doc to the exact/LSH stage.

    Scale: the corpus reduces to ≤ m distinct ints (the bitset as a
    table) — broadcast to the probe side, so an incremental ingest
    never re-shuffles or re-reads corpus text. This is the cheap
    front of the incremental pipeline in front of
    dedup.lsh_incremental_candidates.
    """
    bits_set = (
        bloom_bits(docs.filter(corpus_pred), text_col, m, j)
        .select("bit")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probe = bloom_bits(docs.filter(new_pred), text_col, m, j)
    return (
        probe.join(F.broadcast(bits_set), "bit", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bits"),
            F.count("_hit").alias("n_hits"),
        )
        .withColumn("possible_dup", F.col("n_hits") == F.col("n_bits"))
    )


def bloom_gate_oracle(
    corpus_pred: str,
    new_pred: str,
    table: str = "documents",
    text_col: str = "text",
    m: int = BLOOM_M,
    j: int = BLOOM_J,
) -> str:
    d = DUCK
    bits = _bloom_bits_expr(d, text_col, m, j)
    return f"""
        WITH corpus_bits AS (
            SELECT DISTINCT unnest({bits}) AS bit
            FROM {table} WHERE {corpus_pred}
        ),
        probe AS (
            SELECT doc_id, unnest({bits}) AS bit
            FROM {table} WHERE {new_pred}
        )
        SELECT p.doc_id,
               COUNT(*) AS n_bits,
               COUNT(c.bit) AS n_hits,
               (COUNT(c.bit) = COUNT(*)) AS possible_dup
        FROM probe p LEFT JOIN corpus_bits c USING (bit)
        GROUP BY p.doc_id
    """
