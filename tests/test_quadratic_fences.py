"""The exact all-pairs baselines are correctness oracles, not scale
paths — they must REFUSE large inputs with a pointer at their
scale-safe twin (VERDICT r04 "What's wrong" #4), mirroring
keyed_wheel's MAX_HOT_KEYS pattern."""

import pytest

from uwheel_datafusion_spark.operators import dedup as dd
from uwheel_datafusion_spark.operators import similarity as sim
from uwheel_datafusion_spark.sources.registry import load_table


def test_cosine_pair_dedup_refuses_above_cap(spark, sf_smoke):
    vecs = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="hyperplane_lsh_pairs"):
        sim.cosine_pair_dedup(vecs, max_rows=1)


def test_cosine_pair_dedup_runs_under_cap(spark, sf_smoke):
    vecs = load_table(spark, sf_smoke, "embeddings")
    assert sim.cosine_pair_dedup(vecs).count() >= 0


def test_ngram_jaccard_refuses_above_cap(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError, match="prefix_filter_jaccard_pairs"):
        dd.ngram_jaccard_pairs(docs, max_docs=1)


def test_ngram_jaccard_runs_under_cap(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    assert dd.ngram_jaccard_pairs(docs).count() >= 0
