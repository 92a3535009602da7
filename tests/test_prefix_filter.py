"""Prefix-filtered Jaccard join: the oracle-parity suite proves the
losslessness theorem (output == full posting join); here we pin that
the filter actually FILTERS — the joined posting volume shrinks — and
the prefix-length arithmetic on micro inputs."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators import dedup as dd
from uwheel_datafusion_spark.sources.registry import load_table


def test_prefix_is_smaller_than_posting(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    sets = dd._shingle_sets(docs, "text", 3)
    posting_rows = sets.select(F.explode("shingles")).count()
    # replicate the operator's prefix selection to measure its size
    from pyspark.sql import Window

    posting = sets.select(
        "doc_id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    freq = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("df_cnt").asc(), F.col("shingle").asc()
    )
    p = F.col("n_shingles") - F.expr("(n_shingles * 1 + 1) div 2") + 1
    prefix_rows = (
        posting.join(freq, "shingle")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= p)
        .count()
    )
    # t = 1/2 keeps ~half of each set (+1); strictly less input than
    # the full posting join on both sides
    assert prefix_rows < 0.7 * posting_rows
    assert prefix_rows > 0


def test_prefix_length_arithmetic(spark):
    # s=4, t=1/2 → ceil(2)=2 → p=3; s=5 → ceil(2.5)=3 → p=3
    rows = [(4, 3), (5, 3), (1, 1), (2, 2)]
    for s, want in rows:
        got = spark.sql(
            f"SELECT {s} - (({s} * 1 + 1) div 2) + 1 AS p"
        ).first()["p"]
        assert got == want, (s, got, want)


def test_identical_docs_pair_survives(spark):
    rows = [
        (1, "a b c d e f", "en", "s", 11),
        (2, "a b c d e f", "en", "s", 11),
        (3, "x y z q r t", "en", "s", 11),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.prefix_filter_jaccard_pairs(docs).collect()
    }
    assert out == {(1, 2): 1.0}
