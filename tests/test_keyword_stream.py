"""Streaming keyword-index kernels vs the batch build — row-level
parity on the edge cases that differ between naive tokenizers: NULL
text (batch: explode(NULL) emits nothing, SUM skips the NULL size),
empty text ('' -> [''] under Java split semantics), consecutive and
trailing separators (empty tokens KEPT). The streaming kernels are
mapInPandas, so they run on a static frame too — parity is checked
directly, no stream needed."""

import pytest

from uwheel_datafusion_spark.operators.textops import (
    _postings_frame,
    KEYWORD_INDEX_BUCKETS,
)
from uwheel_datafusion_spark.streaming.keyword_stream import (
    posting_rows_stream,
    stats_rows_stream,
)

ROWS = [
    (0, "the table join stream table"),
    (1, ""),                      # '' -> [''] (one empty token)
    (2, None),                    # NULL: no postings, 0 to total_dl
    (3, "a  b "),                 # consecutive + trailing separators
    (4, "table table table"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_streamed_postings_row_identical_to_batch(spark, docs):
    batch = {
        tuple(r)
        for r in _postings_frame(docs, "text", KEYWORD_INDEX_BUCKETS)
        .select("bucket", "t", "doc_id", "tf", "dl")
        .collect()
    }
    streamed = {
        tuple(r)
        for r in posting_rows_stream(docs)
        .select("bucket", "t", "doc_id", "tf", "dl")
        .collect()
    }
    assert streamed == batch
    # the NULL-text doc produced no posting rows on either side
    assert not [r for r in batch if r[2] == 2]
    # empty text produced exactly one empty-token posting
    assert [r for r in batch if r[2] == 1][0][1] == ""


def test_streamed_stats_partials_sum_to_batch_totals(spark, docs):
    from pyspark.sql import functions as F
    from uwheel_datafusion_spark.functions.dialect import SPARK as d

    batch = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr(d.size(d.split("text"))).cast("long")).alias(
            "total_dl"
        ),
    ).first()
    partials = stats_rows_stream(docs).collect()
    assert sum(r.n_docs for r in partials) == batch.n_docs == 5
    assert sum(r.total_dl for r in partials) == batch.total_dl
