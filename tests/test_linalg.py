"""Pins for operators/linalg: the expression gram matrix is oracle-
checked by the parity suite; here we pin (1) the numpy scale path is
BIT-IDENTICAL to the expression path, (2) hand-checkable values on a
micro fixture, (3) PCA invariants (trace preservation, orthonormal
components, known first component on an anisotropic cloud)."""

import math

import pytest

from uwheel_datafusion_spark.operators import linalg as la


def _vecs(spark, rows, dim):
    data = [(i, [float(x) for x in v]) for i, v in enumerate(rows)]
    return spark.createDataFrame(data, f"vec_id long, embedding array<float>")


def test_gram_micro_values(spark):
    # rows (1,0), (1,1): quantized 1e4 → G = [[2e8, 1e8], [1e8, 1e8]]
    df = _vecs(spark, [(1.0, 0.0), (1.0, 1.0)], 2)
    got = {(r["i"], r["j"]): r["dot_q"] for r in la.gram_matrix(df, dim=2).collect()}
    s = la.Q_SCALE if hasattr(la, "Q_SCALE") else 10_000
    assert got == {
        (1, 1): 2 * s * s,
        (1, 2): 1 * s * s,
        (2, 2): 1 * s * s,
    }


def test_np_path_bit_identical(spark, sf_correctness):
    from uwheel_datafusion_spark.gate import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    a = {
        (r["i"], r["j"]): r["dot_q"]
        for r in la.gram_matrix(emb).collect()
    }
    b = {
        (r["i"], r["j"]): r["dot_q"]
        for r in la.gram_matrix_np(emb).collect()
    }
    assert a == b
    assert len(a) == la.EMB_DIM * (la.EMB_DIM + 1) // 2


def test_np_path_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    rows = [tuple(rng.uniform(-1, 1) for _ in range(4)) for _ in range(50)]
    df = _vecs(spark, rows, 4)
    one = {
        (r["i"], r["j"]): r["dot_q"]
        for r in la.gram_matrix_np(df.coalesce(1), dim=4).collect()
    }
    many = {
        (r["i"], r["j"]): r["dot_q"]
        for r in la.gram_matrix_np(df.repartition(13), dim=4).collect()
    }
    assert one == many


def test_pca_recovers_dominant_axis(spark):
    # anisotropic cloud: x-axis variance >> y-axis; deterministic points
    rows = []
    for t in range(40):
        x = (t - 19.5) / 20.0  # spread ±1 on axis (1, 0)
        y = 0.05 * (1 if t % 2 else -1)  # tiny orthogonal jitter
        rows.append((x, y))
    evals, comps, ratio, mu = la.pca_from_gram(_vecs(spark, rows, 2), dim=2, k=2)
    assert evals[0] > evals[1] >= 0
    # first component ≈ ±(1, 0)
    c0 = comps[0]
    assert abs(abs(c0[0]) - 1.0) < 1e-3 and abs(c0[1]) < 1e-2
    assert ratio[0] > 0.98
    # orthonormality
    assert abs(sum(a * b for a, b in zip(comps[0], comps[1]))) < 1e-9
    assert abs(math.fsum(c * c for c in comps[0]) - 1.0) < 1e-9


def test_pca_trace_equals_eigenvalue_sum(spark):
    import numpy as np
    import random

    rng = random.Random(3)
    rows = [tuple(rng.uniform(-1, 1) for _ in range(3)) for _ in range(30)]
    df = _vecs(spark, rows, 3)
    evals, _, ratio, _mu = la.pca_from_gram(df, dim=3, k=3)
    # full-k ratios sum to 1 (trace preservation)
    assert abs(float(ratio.sum()) - 1.0) < 1e-9


def test_pca_transform_matches_driver_projection(spark):
    """pca_transform (distributed Arrow-batch matmul) equals the
    driver-side numpy projection, and the projected first coordinate
    carries the dominant variance."""
    import numpy as np
    import random

    rng = random.Random(11)
    rows = [
        (rng.uniform(-1, 1) * 1.0, rng.uniform(-1, 1) * 0.1, rng.uniform(-1, 1) * 0.01)
        for _ in range(60)
    ]
    df = _vecs(spark, rows, 3)
    evals, comps, ratio, mu = la.pca_from_gram(df, dim=3, k=2)
    out = la.pca_transform(df, comps, mu, out_col="pca").orderBy("vec_id").collect()
    got = np.array([r["pca"] for r in out])
    x = np.array([[round(v * 10_000) for v in row] for row in rows], dtype="float64")
    want = (x - mu) @ np.asarray(comps).T
    assert np.allclose(got, want, atol=1e-6)
    # variance along component 0 ≈ top eigenvalue
    assert abs(got[:, 0].var() - evals[0]) / evals[0] < 1e-6
