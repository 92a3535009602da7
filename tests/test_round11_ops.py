"""Round-11 operators: binary-Hamming ANN, leakage-free cluster
split, bigram-LM surprise. Property tests beyond the DuckDB gates."""

import pytest
from pyspark.sql import functions as F

import uwheel_datafusion_spark.operators.sampling as sp
import uwheel_datafusion_spark.operators.similarity as sim
import uwheel_datafusion_spark.operators.textops as tx
from uwheel_datafusion_spark.sources.registry import load_table


def test_binary_hamming_matches_numpy(spark, sf_smoke):
    """The packed sign words and popcount-XOR Hamming agree with a
    NumPy reimplementation on the real fixture vectors."""
    import numpy as np

    emb = load_table(spark, sf_smoke, "embeddings")
    rows = (
        sim._quantized(emb, "embedding", drop_zero=True)
        .withColumn("bvec", F.expr(sim.SPARK.sign_pack32("qvec", 64)))
        .select("vec_id", "qvec", "bvec")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    assert rows

    def pack(q):
        words = []
        for w in range(0, 64, 32):
            acc = 0
            for j in range(32):
                if q[w + j] > 0:
                    acc |= 1 << j
            words.append(acc)
        return words

    packed = {r.vec_id: pack(r.qvec) for r in rows}
    for r in rows:
        assert list(r.bvec) == packed[r.vec_id], r.vec_id
    # spot-check Hamming between the first two via the SQL expression
    a, b = rows[0], rows[1]
    got = spark.sql(
        "SELECT "
        + sim.SPARK.hamming_words(
            f"array({a.bvec[0]}L, {a.bvec[1]}L)",
            f"array({b.bvec[0]}L, {b.bvec[1]}L)",
        )
        + " AS h"
    ).first()["h"]
    expect = sum(
        bin((x ^ y) & 0xFFFFFFFF).count("1")
        for x, y in zip(a.bvec, b.bvec)
    )
    assert got == expect


def test_binary_hamming_full_candidates_equals_brute_force(
    spark, sf_smoke
):
    """With n_candidates = corpus size the rerank sees everything, so
    the top-k must equal exact brute force — the recall-1.0 bound of
    the two-stage design."""
    emb = load_table(spark, sf_smoke, "embeddings")
    n = emb.count()
    two_stage = sim.knn_binary_hamming(
        emb, (0, 1), k=5, n_candidates=n
    ).select("query_id", "neighbor_id", "cosine", "rnk")
    exact = sim.knn_brute_force(emb, (0, 1), k=5)
    assert sorted(map(tuple, two_stage.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_leakage_free_split_clusters_never_straddle(spark, sf_smoke):
    """Hand-built corpus with duplicate texts engineered to hash into
    different doc_id splits: every digest cluster must land in ONE
    split, members are conserved, and the audit column counts exactly
    the members whose own-hash split differs."""
    texts = [(i, f"doc body {i % 7}") for i in range(200)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = {
        r["split"]: r
        for r in sp.leakage_free_split_summary(docs).collect()
    }
    assert sum(r["n_docs"] for r in out.values()) == 200
    assert sum(r["n_clusters"] for r in out.values()) == 7
    # duplicates spread across 200 ids MUST produce rescues under an
    # 80/10/10 id-hash split
    assert sum(r["n_rescued"] for r in out.values()) > 0
    # independently verify: per digest, one split
    d = sim.SPARK.md5("coalesce(text, '')")
    canon = (
        docs.select("doc_id", F.expr(d).alias("dg"))
        .groupBy("dg")
        .agg(F.min("doc_id").alias("cid"))
    )
    splits = (
        docs.select("doc_id", F.expr(d).alias("dg"))
        .join(canon, "dg")
        .select("dg", sp.split_column("cid").alias("s"))
        .distinct()
        .groupBy("dg")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert splits == 0


def test_bigram_lm_surprise_orders_common_before_rare(spark):
    """A document made of the corpus's dominant bigram must score
    LOWER surprise-per-bigram than a document of singleton bigrams —
    the monotonicity that makes the score a perplexity gate."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(100, "the cat sat on the mat"),
           (101, "zx qy wv ut sr qp")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in tx.bigram_lm_surprise(docs).collect()
    }
    assert out[100].n_bigrams == 5 and out[101].n_bigrams == 5
    assert (
        out[100].surprise_per_bigram_fp < out[101].surprise_per_bigram_fp
    )
    # identical docs score identically (pure function of content)
    assert out[100].surprise_fp == out[0].surprise_fp


def test_bigram_lm_surprise_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, None), (3, "two tokens")],
        "doc_id long, text string",
    )
    rows = tx.bigram_lm_surprise(docs).collect()
    assert {r.doc_id for r in rows} == {3}
    assert rows[0].n_bigrams == 1


def test_binary_served_full_probe_equals_inmemory(spark, sf_smoke, tmp_path):
    """nprobe = n_cells ⇒ every cell probed, so the served three-stage
    search must equal the in-memory two-stage knn_binary_hamming
    bit-for-bit (same pack, Hamming, cut, rerank, tie-breaks)."""
    import uwheel_datafusion_spark.operators.ann_serving as srv

    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    served = srv.save_ivf_payload(
        ivf, emb, str(tmp_path / "bin_payload"), include_binary=True
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        "vec_id", "embedding"
    )
    got = srv.ivf_binary_search_served(
        served, queries, k=5, nprobe=4, n_candidates=25
    )
    expect = sim.knn_binary_hamming(emb, (0, 1, 2), k=5, n_candidates=25)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )
    ivf.cells.unpersist()


def test_binary_payload_stream_serves_identically(spark, sf_smoke, tmp_path):
    """The binary tier is stream-maintainable: a payload stream with
    include_binary=True yields a table ivf_binary_search_served answers
    from bit-identically to the batch build (the sign words are a pure
    stateless expression — same contract as the streamed positions)."""
    import os

    import uwheel_datafusion_spark.operators.ann_serving as srv
    from uwheel_datafusion_spark.streaming.ann_stream import (
        served_index_from_table,
        start_ivf_payload_stream,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    src = str(tmp_path / "src")
    emb.write.parquet(src)
    table = str(tmp_path / "payload")
    q = start_ivf_payload_stream(
        spark.readStream.schema(emb.schema).parquet(src),
        ivf.centroids,
        table,
        str(tmp_path / "ckpt"),
        include_binary=True,
    )
    q.processAllAvailable()
    q.stop()
    streamed = served_index_from_table(ivf.centroids, table, has_binary=True)
    batch_served = srv.save_ivf_payload(
        ivf, emb, str(tmp_path / "batch_payload"), include_binary=True
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = srv.ivf_binary_search_served(
        streamed, queries, k=5, nprobe=2, n_candidates=25
    )
    expect = srv.ivf_binary_search_served(
        batch_served, queries, k=5, nprobe=2, n_candidates=25
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )
    ivf.cells.unpersist()


def test_hard_negatives_excludes_anchor_label(spark, sf_smoke):
    """Every mined negative carries a label different from its
    anchor's, and within the eligible (label-mismatched) pool the
    ranking is exactly the cosine ranking."""
    emb = load_table(spark, sf_smoke, "embeddings")
    anchors = {
        r.vec_id: r.label
        for r in emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
    }
    out = sim.hard_negatives(emb, (0, 1, 2), k=5).collect()
    assert len(out) == 15
    labels = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").collect()
    }
    for r in out:
        assert r.neighbor_label == labels[r.neighbor_id]
        assert r.neighbor_label != anchors[r.query_id]
    # the top negative is the global cosine argmax over the mismatched
    # pool: cross-check one anchor against brute force + filter
    bf = sim.knn_brute_force(emb, (0,), k=emb.count() - 1).collect()
    eligible = [
        r for r in bf if labels[r.neighbor_id] != anchors[0]
    ]
    top = sorted(eligible, key=lambda r: (-r.cosine, r.neighbor_id))[:5]
    got0 = sorted(
        [r for r in out if r.query_id == 0], key=lambda r: r.rnk
    )
    assert [r.neighbor_id for r in got0] == [r.neighbor_id for r in top]
