"""§2.10 UDF/UDTF surface (SURVEY): the reference's extension point is
a compile-time Rust Aggregator trait; our engine's extension points are
Spark's Python surfaces. These tests prove the surfaces work and that
the JVM-expression fast path we actually ship is equivalent — UDFs are
the slow path (SURVEY §2.10), so none of the gated queries depend on
them.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from uwheel_datafusion_spark.operators import similarity as sim
from uwheel_datafusion_spark.sources.registry import load_table


def test_pandas_udf_cosine_matches_expression_path(spark, sf_smoke):
    """Arrow-batched pandas UDF (vectorized slow path) computes the
    same quantized cosine as the JVM zip_with expression (fast path) —
    the escape hatch for metrics built-ins can't express, validated
    against the path we ship."""

    @F.pandas_udf(DoubleType())
    def cos_q(qa: pd.Series, qb: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
        import numpy as np

        dots = pd.Series(
            [int(np.dot(np.array(a, dtype=object), np.array(b, dtype=object)))
             for a, b in zip(qa, qb)],
            index=qa.index,
            dtype="float64",
        )
        return dots / (na.astype("float64") * nb.astype("float64")) ** 0.5

    qv = sim._quantized(load_table(spark, sf_smoke, "embeddings")).limit(50).cache()
    a = qv.select(
        F.col("vec_id").alias("va"), F.col("qvec").alias("qa"), F.col("qnorm").alias("na")
    )
    b = qv.select(
        F.col("vec_id").alias("vb"), F.col("qvec").alias("qb"), F.col("qnorm").alias("nb")
    )
    pairs = a.join(b, F.col("va") < F.col("vb")).limit(500).cache()
    from uwheel_datafusion_spark.functions.dialect import SPARK

    expr_cos = F.expr(SPARK.cosine_q(SPARK.dot_q("qa", "qb"), "na", "nb"))
    rows = (
        pairs.select(
            "va", "vb",
            expr_cos.alias("fast"),
            cos_q("qa", "qb", "na", "nb").alias("slow"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["fast"] == r["slow"], (r["va"], r["vb"])


def test_python_udtf_lateral_chunks(spark):
    """Python UDTF (Spark 4 table function): lateral-join a chunker
    over documents. Row-at-a-time Python — surface proof only; the
    shipped chunker (`textops.chunk_documents`) is pure JVM explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk: string")
    class Chunker:
        def eval(self, doc_id: int, text: str, n: int):
            toks = text.split()
            for i in range(0, len(toks), n):
                yield i // n, " ".join(toks[i : i + n])

    spark.udtf.register("chunker", Chunker)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk "
            "FROM udtf_docs d, LATERAL chunker(doc_id, text, 2) c"
        ).collect()
    }
    assert got == {
        (1, 0, "a b"), (1, 1, "c d"), (1, 2, "e"),
        (2, 0, "x y"),
    }
