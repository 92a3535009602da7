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


def test_plane_components_match_sql_hash32():
    """The inlined literal planes must equal what the per-row SQL
    expression hash32(concat('plane{t}_{j}_', i)) % 2001 - 1000 yields
    — the literals are an optimization, not a semantics change."""
    import duckdb

    from uwheel_datafusion_spark.functions.dialect import DUCK

    con = duckdb.connect()
    for t, j in ((0, 0), (3, 2), (7, 3)):
        h = DUCK.hash32(f"concat('plane{t}_{j}_', i)")
        expr = DUCK.transform(DUCK.seq1("7"), "i", f"({h} % 2001) - 1000")
        sql_vals = list(con.execute(f"SELECT {expr}").fetchone()[0])
        assert sql_vals == sim._plane_components(t, j, 7), (t, j)
