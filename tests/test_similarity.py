"""Similarity-search quality guards (beyond exact-parity gates):
hyperplane LSH must stay a true subset of the exact pair join (precision
1 by construction) with usable recall for the configured (L, b)."""

from uwheel_datafusion_spark.operators import similarity as sim
from uwheel_datafusion_spark.sources.registry import load_table


def test_hyperplane_lsh_precision_and_recall(spark, sf_correctness):
    emb = load_table(spark, sf_correctness, "embeddings")
    lsh = {(r.vec_a, r.vec_b) for r in sim.hyperplane_lsh_pairs(emb, 0.45).collect()}
    exact = {
        (r.vec_a, r.vec_b) for r in sim.cosine_pair_dedup(emb, 0.45).collect()
    }
    assert lsh <= exact  # verification step ⇒ precision 1
    assert exact, "fixture should contain near-dup pairs"
    recall = len(lsh & exact) / len(exact)
    # L=8, b=4 at cosine 0.45 ⇒ theoretical recall ≈ 0.79 for pairs at
    # the threshold (higher for closer pairs); guard well below that
    assert recall >= 0.5, f"LSH recall degraded: {recall:.2f}"
