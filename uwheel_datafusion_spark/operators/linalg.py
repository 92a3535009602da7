"""Distributed linear algebra over the embedding column: exact gram
matrix (Xᵀ X) and PCA on top of it.

The gram matrix is THE distributed primitive behind corpus-scale
embedding analytics — PCA/whitening, linear probes, covariance
statistics: everything downstream is O(d²) driver-side math once
Σ xᵢ·xⱼᵀ is reduced. The reference has no linear-algebra surface
(a time-series engine; /root/reference/src/main.rs), so this is
beyond-parity — but it reuses the engine's core trick: quantize to
integers (functions.dialect.quantize_vec, round(x·1e4)) so the sum is
EXACT, associative, and engine-independent → a hash-stable DuckDB
oracle, and bit-identical results from the numpy scale path.

Scale shape (expression path): each row expands to its d(d+1)/2 upper-
triangle products map-side and the partial hash aggregate combines them
BEFORE the shuffle — the exchange carries O(partitions · d²) rows,
independent of corpus size. For large d (d² per row too fat to expand,
e.g. d ≥ 512) use `gram_matrix_np`: Arrow-batched `mapInPandas` does one
int64 BLAS matmul per batch and emits ONE d×d partial per batch — the
same map-side-combine shape with a constant-factor win; its output is
bit-identical to the expression path (pinned in tests) because both are
exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.dialect import DUCK, SPARK
from uwheel_datafusion_spark.operators.similarity import Q_SCALE

__all__ = [
    "gram_matrix",
    "gram_matrix_oracle",
    "gram_matrix_np",
    "pca_from_gram",
    "pca_transform",
]

EMB_DIM = 64  # fixture embedding dimensionality (embeddings.parquet)


def gram_matrix(
    vecs: DataFrame, vec_col: str = "embedding", dim: int = EMB_DIM
) -> DataFrame:
    """Upper-triangle exact gram matrix over quantized embeddings:
    one row per (i ≤ j) with dot_q = Σ_rows q_i·q_j (int64-exact;
    |q| ≤ 1e4 ⇒ each product ≤ 1e8, so overflow needs > 9·10^10 rows —
    beyond any real corpus per entry; chunk + re-sum if ever reached).

    Plan: quantize (map) → explode i (d per row) → explode j over
    sequence(i, d) (upper triangle only) → partial-agg map-side →
    ONE shuffle of partitions × d(d+1)/2 pre-combined rows.
    """
    d = SPARK
    q = d.quantize_vec(vec_col, Q_SCALE)
    return (
        vecs.select(F.expr(q).alias("q"))
        .select("q", F.explode(F.expr(f"sequence(1, {dim})")).alias("i"))
        .select(
            "i",
            F.explode(F.expr(f"sequence(i, {dim})")).alias("j"),
            F.expr("element_at(q, i) * element_at(q, j)").alias("p"),
        )
        .groupBy("i", "j")
        .agg(F.sum("p").alias("dot_q"))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("dot_q").cast("long").alias("dot_q"),
        )
    )


def gram_matrix_oracle(
    table: str = "embeddings", vec_col: str = "embedding", dim: int = EMB_DIM
) -> str:
    d = DUCK
    q = d.quantize_vec(vec_col, Q_SCALE)
    return f"""
        WITH qv AS (SELECT {q} AS q FROM {table}),
        ii AS (SELECT q, unnest(generate_series(1, {dim})) AS i FROM qv),
        pairs AS (
            SELECT i, unnest(generate_series(i, {dim})) AS j, q FROM ii
        )
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
               CAST(SUM(list_extract(q, i) * list_extract(q, j)) AS BIGINT)
                   AS dot_q
        FROM pairs
        GROUP BY i, j
    """


def gram_matrix_np(
    vecs: DataFrame, vec_col: str = "embedding", dim: int = EMB_DIM
) -> DataFrame:
    """Scale path for large d: per-Arrow-batch int64 matmul (numpy),
    one d×d partial per batch, then a tiny final sum keyed on (i, j).
    Bit-identical to `gram_matrix` (exact integer arithmetic on the
    same quantization)."""
    import pandas as pd

    q_expr = SPARK.quantize_vec(vec_col, Q_SCALE)
    quantized = vecs.select(F.expr(q_expr).alias("q"))

    def batches(it):
        import numpy as np

        for pdf in it:
            if pdf.empty:
                continue
            x = np.asarray(pdf["q"].tolist(), dtype="int64")
            g = x.T @ x  # exact: int64 products/sums
            iu, ju = np.triu_indices(x.shape[1])
            yield pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "p": g[iu, ju]}
            )

    partials = quantized.mapInPandas(batches, "i long, j long, p long")
    return partials.groupBy("i", "j").agg(F.sum("p").cast("long").alias("dot_q"))


def pca_from_gram(
    vecs: DataFrame, vec_col: str = "embedding", dim: int = EMB_DIM, k: int = 8
):
    """Driver-side PCA from the distributed exact sufficient statistics
    (gram matrix + per-dim sums + count — the ONLY cluster work; the
    d×d eigendecomposition is trivially local). Returns
    (eigenvalues_desc[:k], components[k][dim], explained_ratio[:k],
    mean[dim]) in the quantized units' covariance scale; feed
    components+mean to `pca_transform` to project the corpus.
    """
    import numpy as np

    g_rows = gram_matrix(vecs, vec_col, dim).collect()
    q_expr = SPARK.quantize_vec(vec_col, Q_SCALE)
    sums_row = (
        vecs.select(F.expr(q_expr).alias("q"))
        .select(F.explode(F.expr(f"sequence(1, {dim})")).alias("i"), F.col("q"))
        .select("i", F.expr("element_at(q, i)").alias("x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = sums_row[0]["n"] if sums_row else 0
    if n < 2:
        raise ValueError("pca_from_gram needs at least 2 vectors")
    mu = np.zeros(dim)
    for r in sums_row:
        mu[r["i"] - 1] = r["s"] / n
    gram = np.zeros((dim, dim))
    for r in g_rows:
        gram[r["i"] - 1, r["j"] - 1] = r["dot_q"]
        gram[r["j"] - 1, r["i"] - 1] = r["dot_q"]
    cov = gram / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    total = float(evals.sum())
    ratio = evals[:k] / total if total > 0 else evals[:k] * 0.0
    return evals[:k], evecs[:, :k].T, ratio, mu


def pca_transform(
    vecs: DataFrame,
    components,
    mean,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Distributed application of a driver-computed PCA basis: project
    every embedding onto the k components (mean-centered) — the
    dimensionality-reduction step that follows `pca_from_gram` in a
    whitening/compression pipeline. The k×dim basis broadcasts inside
    the Arrow-batched closure; one numpy matmul per batch, map-only
    (no shuffle), so it scales with input splits like every other
    Pandas-UDF stage here.

    ``components``: array-like (k, dim) in quantized units (what
    pca_from_gram returns); ``mean``: per-dim quantized means.
    Output keeps all input columns plus ``out_col: array<double>``.
    """
    import numpy as np
    import pandas as pd

    comp = np.asarray(components, dtype="float64")
    mu = np.asarray(mean, dtype="float64")

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            # same quantization the basis was computed in (round(x·1e4)
            # — pca_from_gram's units), so center+project line up
            xq = np.round(x * Q_SCALE)
            proj = (xq - mu) @ comp.T
            out = pdf.copy()
            out[out_col] = list(proj)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in vecs.schema.fields
    )
    return vecs.mapInPandas(batches, f"{schema}, {out_col} array<double>")
