"""Micro-fixture pins for the corpus-curation operators
(operators/corpus.py): the oracle-parity suite proves Spark ≡ DuckDB;
these tests pin that the SHARED semantics are the intended ones
(straddler math, contamination direction, flag thresholds, mixture
invariants) on inputs small enough to verify by hand."""

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators import corpus as cx

_P1, _KNUTH, _OFF, _P2 = 1_000_003, 2_654_435_761, 987_654_321, 1_000_000_007


def _bucket(key: int, buckets: int = 100) -> int:
    """Python twin of sampling.hash_bucket_sql (pinned equal there)."""
    return ((abs(key) % _P1) * _KNUTH + _OFF) % _P2 % buckets


def _ids_for(pred, n, start=0):
    out = []
    i = start
    while len(out) < n:
        if pred(_bucket(i)):
            out.append(i)
        i += 1
    return out


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# --------------------------------------------------------------------------
# packing
# --------------------------------------------------------------------------


def test_pack_straddler_and_pack_count(spark):
    # three 100-token docs in ONE bucket, budget 256: cuts at 256 fall
    # inside doc 3 only (cum 100 | 200 | 300) -> 1 straddler, 2 packs
    ids = _ids_for(lambda b: b == 0, 3)
    text = " ".join(["tok"] * 100)
    rows = [(i, text, "en", "s", len(text)) for i in ids]
    out = cx.pack_chunks_summary(_docs(spark, rows), budget=256, buckets=100)
    got = {r["bucket"]: r for r in out.collect()}
    assert set(got) == {0}
    r = got[0]
    assert (r["n_docs"], r["total_tokens"]) == (3, 300)
    assert r["n_packs"] == 2  # ceil(300/256)
    assert r["n_straddlers"] == 1


def test_pack_exact_fit_no_straddle(spark):
    # budget exactly equal to each doc -> every cut lands on a doc
    # boundary: zero straddlers, one pack per doc
    ids = _ids_for(lambda b: b == 0, 4)
    text = " ".join(["t"] * 64)
    rows = [(i, text, "en", "s", len(text)) for i in ids]
    r = (
        cx.pack_chunks_summary(_docs(spark, rows), budget=64, buckets=100)
        .collect()[0]
    )
    assert r["n_packs"] == 4
    assert r["n_straddlers"] == 0


def test_pack_buckets_are_independent(spark):
    # same docs split across two buckets -> per-bucket cumsum restarts
    a = _ids_for(lambda b: b == 0, 2)
    b = _ids_for(lambda b: b == 1, 2)
    text = " ".join(["t"] * 200)
    rows = [(i, text, "en", "s", len(text)) for i in a + b]
    out = cx.pack_chunks_summary(_docs(spark, rows), budget=256, buckets=100)
    got = {r["bucket"]: r for r in out.collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r["total_tokens"] == 400
        assert r["n_packs"] == 2
        assert r["n_straddlers"] == 1  # cut at 256 inside doc 2


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def test_decontaminate_flags_copied_ngram_only(spark):
    ev_id = _ids_for(lambda b: b >= 95, 1)[0]
    tr_ids = _ids_for(lambda b: b < 95, 2)
    eval_text = "alpha beta gamma delta epsilon zeta"
    dirty = "xx yy " + "beta gamma delta epsilon" + " zz"  # shares one 4-gram
    clean = "one two three four five six seven"
    rows = [
        (ev_id, eval_text, "en", "s", len(eval_text)),
        (tr_ids[0], dirty, "en", "s", len(dirty)),
        (tr_ids[1], clean, "en", "s", len(clean)),
    ]
    out = {r["doc_id"]: r for r in cx.decontaminate(_docs(spark, rows)).collect()}
    # eval doc is not in the output (train rows only)
    assert set(out) == set(tr_ids)
    assert out[tr_ids[0]]["contaminated"] == 1
    assert out[tr_ids[0]]["n_shared_ngrams"] == 1
    assert out[tr_ids[1]]["contaminated"] == 0


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    ev_id = _ids_for(lambda b: b >= 95, 1)[0]
    tr_id = _ids_for(lambda b: b < 95, 1)[0]
    eval_text = "a b c d e f"  # 4-grams: "a b c d", "b c d e", "c d e f"
    rows = [
        (ev_id, eval_text, "en", "s", len(eval_text)),
        (tr_id, eval_text, "en", "s", len(eval_text)),  # verbatim copy
    ]
    out = cx.decontaminate(_docs(spark, rows)).collect()
    assert out[0]["n_shared_ngrams"] == 3


# --------------------------------------------------------------------------
# repetition
# --------------------------------------------------------------------------


def test_repetition_flags_on_repetitive_doc(spark):
    text = "a a a a a b"  # max freq 5/6 > 10%; bigrams 5, distinct 2
    rows = [(1, text, "en", "s", len(text))]
    r = cx.repetition_profile(_docs(spark, rows)).collect()[0]
    assert r["n_tokens"] == 6
    assert r["max_token_freq"] == 5
    assert (r["n_bigrams"], r["n_distinct_bigrams"]) == (5, 2)
    assert r["dup_bigram_flag"] == 1  # (5-2)/5 = 60% > 20%
    assert r["top_token_flag"] == 1  # 5/6 > 10%
    assert r["repetitive"] == 1


def test_repetition_clean_doc_not_flagged(spark):
    # all tokens distinct, every bigram distinct, max freq = 1; with 20
    # tokens, 1/20 = 5% <= 10% so the top-token flag stays off too
    text = " ".join(f"w{i}" for i in range(20))
    rows = [(1, text, "en", "s", len(text))]
    r = cx.repetition_profile(_docs(spark, rows)).collect()[0]
    assert r["dup_bigram_flag"] == 0
    assert r["top_token_flag"] == 0
    assert r["repetitive"] == 0


# --------------------------------------------------------------------------
# mixture reweighting
# --------------------------------------------------------------------------


def test_mixture_invariants_and_determinism(spark):
    rows = []
    for s, n in (("srcA", 12), ("srcB", 6), ("srcC", 3)):
        for i in range(n):
            rows.append((len(rows), "text here", "en", s, 9))
    df = _docs(spark, rows)
    out = {r["source"]: r for r in cx.mixture_reweight_summary(df).collect()}
    assert set(out) == {"srcA", "srcB", "srcC"}
    c = min(r["n_docs"] // r["weight"] for r in out.values())
    assert c >= 1
    for r in out.values():
        assert 1 <= r["weight"] <= cx.MIX_WEIGHT_CLASSES
        assert r["target_n"] == r["weight"] * c  # proportional targets
        assert r["kept_n"] == r["target_n"]  # downsample-only, always met
        assert r["kept_n"] <= r["n_docs"]
    # deterministic: identical result on re-run
    again = {r["source"]: r for r in cx.mixture_reweight_summary(df).collect()}
    assert {s: r["kept_n"] for s, r in out.items()} == {
        s: r["kept_n"] for s, r in again.items()
    }


def test_mixture_selects_stable_hash_prefix(spark):
    # the SET of kept docs must be independent of input partitioning
    rows = [(i, "x y", "en", "srcA" if i % 2 else "srcB", 3) for i in range(20)]
    df1 = _docs(spark, rows).repartition(7)
    df8 = _docs(spark, rows).repartition(1)
    from pyspark.sql import Window as W
    from uwheel_datafusion_spark.operators.sampling import hash_bucket_sql

    def kept_ids(df):
        # replicate the operator's selection to expose the doc ids
        targets = cx.mixture_reweight_summary(df).select("source", "target_n")
        rank_key = F.expr(hash_bucket_sql("doc_id", 1_000_000_007))
        w = W.partitionBy("source").orderBy(rank_key.asc(), F.col("doc_id").asc())
        picked = (
            df.select("source", "doc_id")
            .join(F.broadcast(targets), "source")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.col("target_n"))
        )
        return sorted(r["doc_id"] for r in picked.collect())

    assert kept_ids(df1) == kept_ids(df8)


# --------------------------------------------------------------------------
# canonicalization (quality-aware keep)
# --------------------------------------------------------------------------


def test_canonicalize_keeps_longest_not_min_id(spark):
    from uwheel_datafusion_spark.operators import dedup as dd

    # component {1, 2, 3} where doc 2 is LONGEST; doc 9 outside the graph
    rows = [
        (1, "a b", "en", "s", 30),
        (2, "a b c", "en", "s", 90),
        (3, "a b d", "en", "s", 30),
        (9, "zzz", "en", "s", 5),
    ]
    docs = _docs(spark, rows)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in dd.canonicalize(docs, pairs).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert all(out[i]["component"] == 1 for i in (1, 2, 3))
    # quality-aware: longest (doc 2) is canonical, NOT min-id (doc 1)
    assert all(out[i]["canonical_id"] == 2 for i in (1, 2, 3))
    assert [out[i]["keep"] for i in (1, 2, 3)] == [0, 1, 0]
    # outside the graph: own component, kept
    assert (out[9]["component"], out[9]["canonical_id"], out[9]["keep"]) == (9, 9, 1)


def test_canonicalize_tie_breaks_on_min_doc_id(spark):
    from uwheel_datafusion_spark.operators import dedup as dd

    rows = [(5, "x y", "en", "s", 40), (7, "x z", "en", "s", 40)]
    docs = _docs(spark, rows)
    pairs = spark.createDataFrame([(5, 7)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in dd.canonicalize(docs, pairs).collect()}
    assert out[5]["canonical_id"] == 5 and out[5]["keep"] == 1
    assert out[7]["canonical_id"] == 5 and out[7]["keep"] == 0


# --------------------------------------------------------------------------
# domain filter
# --------------------------------------------------------------------------


def test_domain_filter_threshold_boundary(spark):
    """A source at EXACTLY the max flag rate is kept (<=, matching the
    oracle's integer cross-multiply); one past it is dropped, and
    final_keep is source_keep AND NOT doc_flag."""
    rows = []
    # srcA: 7/20 flagged = 35% — exactly at the 35% default → kept
    for i in range(20):
        rows.append((i, "w " * 10, "en", "srcA", 100 if i < 7 else 300))
    # srcB: 8/20 flagged = 40% → dropped
    for i in range(20):
        rows.append((100 + i, "w " * 10, "en", "srcB", 100 if i < 8 else 300))
    out = cx.domain_filter(_docs(spark, rows)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert all(r.source_keep == 1 for r in by_src["srcA"])
    assert all(r.source_keep == 0 for r in by_src["srcB"])
    assert all(r.final_keep == 0 for r in by_src["srcB"])
    a_kept = [r for r in by_src["srcA"] if r.final_keep == 1]
    # kept = srcA docs that are NOT flagged (n_chars >= 200)
    assert len(a_kept) == 13
    assert all(r.doc_flag == 0 for r in a_kept)


# --------------------------------------------------------------------------
# OOV rate
# --------------------------------------------------------------------------


def test_oov_rate_scores_against_reference_slice(spark):
    """Docs whose bigrams all appear in the reference slice have
    n_oov=0 and are kept; a doc of never-seen bigrams is dropped; a
    doc too short for bigrams (1 token) scores (0, 0) and is kept."""
    ref_ids = _ids_for(lambda b: b >= 90, 2)
    low_ids = _ids_for(lambda b: b < 90, 3)
    rows = [
        (ref_ids[0], "alpha beta gamma", "en", "s", 16),
        (ref_ids[1], "beta gamma delta", "en", "s", 16),
        (low_ids[0], "alpha beta gamma delta", "en", "s", 22),  # all seen
        (low_ids[1], "zz yy xx ww vv uu", "en", "s", 17),  # none seen
        (low_ids[2], "alpha", "en", "s", 5),  # no bigrams
    ]
    out = {r.doc_id: r for r in cx.oov_rate(_docs(spark, rows)).collect()}
    assert set(out) == set(low_ids)  # reference slice is not scored
    ok = out[low_ids[0]]
    assert (ok.n_grams, ok.n_oov, ok.oov_keep) == (3, 0, 1)
    bad = out[low_ids[1]]
    assert bad.n_grams == 5 and bad.n_oov == 5 and bad.oov_keep == 0
    tiny = out[low_ids[2]]
    assert (tiny.n_grams, tiny.n_oov, tiny.oov_keep) == (0, 0, 1)
