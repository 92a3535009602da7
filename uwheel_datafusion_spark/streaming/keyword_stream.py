"""Streaming ingest for the persisted inverted keyword index — the
ingest-time twin of operators/textops.build_keyword_index, the same
role streaming/ann_stream.py plays for the IVF payload and
streaming/dedup_stream.py for the LSH band index.

The batch index's layout was designed append-only precisely so a
stream can maintain it through the built-in exactly-once parquet file
sink (no foreachBatch, no read-modify-write):

- posting rows (bucket, t, doc_id, tf) are MAP-ONLY derivable per
  document — tf is a within-document count, so one Arrow-batched
  mapInPandas kernel tokenizes each document and emits its postings
  (no cross-row aggregation, legal in an append stream);
- the (n_docs) statistic streams as PER-CHUNK PARTIAL rows (each
  Arrow batch emits one count row); the probe sums partials, so a
  partial-per-chunk table and a partial-per-batch table are the same
  contract.

Parity contract (gated, streaming_keyword_index_parity): tokenization
is the Python twin of the Spark-side `split(text, ' ')` (Java
split(regex, -1) semantics — consecutive separators yield empty
tokens, trailing empties kept) and the bucket hash is the same md5
fold, so the streamed table is ROW-IDENTICAL to the batch build and
`keyword_index_probe` serves either interchangeably.

Reference scope: the reference engine (src/main.rs) has no text tier;
beyond-parity training-data infrastructure (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from uwheel_datafusion_spark.operators.textops import (
    KEYWORD_INDEX_BUCKETS,
    _term_bucket,
)


def _split_spark_twin(text) -> list[str] | None:
    """Python twin of Spark SQL ``split(text, ' ')`` (Java
    String.split(" ", -1)): split on every single space, KEEP empty
    tokens from consecutive/trailing separators — Python str.split(' ')
    has exactly these semantics, including ``"" -> [""]``. NULL text
    returns None: batch-side, split(NULL) is NULL, explode(NULL) emits
    NO rows, and SUM skips the NULL dl — the twin must do the same."""
    if text is None or (isinstance(text, float)):  # pandas NULL = NaN
        return None
    return text.split(" ")


def posting_rows_stream(
    stream_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = KEYWORD_INDEX_BUCKETS,
) -> DataFrame:
    """(bucket, t, doc_id, tf, dl) posting rows from a STREAMING
    document source — one map-only Arrow pass: per document, a Counter
    over the Spark-twin tokenization (dl = the token count, BM25's
    length signal, denormalized like the batch build); bucket via the
    same md5 fold the batch build computes Spark-side."""

    def kernel(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "bucket": [], "t": [], "doc_id": [], "tf": [], "dl": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = _split_spark_twin(text)
                if toks is None:  # NULL text: batch emits no postings
                    continue
                for t, tf in Counter(toks).items():
                    out["bucket"].append(_term_bucket(t, n_buckets))
                    out["t"].append(t)
                    out["doc_id"].append(doc_id)
                    out["tf"].append(tf)
                    out["dl"].append(len(toks))
            yield pd.DataFrame(out)

    return stream_docs.select("doc_id", text_col).mapInPandas(
        kernel, "bucket long, t string, doc_id long, tf long, dl long"
    )


def stats_rows_stream(
    stream_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Partial (n_docs, total_dl) rows — one row per Arrow chunk,
    map-only; the probe sums partials, so chunk-granularity partials
    satisfy the same contract as the batch build's one row per batch."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf):
                toks = [_split_spark_twin(t) for t in pdf[text_col]]
                yield pd.DataFrame(
                    {
                        # n_docs counts EVERY doc (batch COUNT(*));
                        # NULL text contributes 0 to total_dl (batch
                        # SUM skips the NULL size)
                        "n_docs": [len(pdf)],
                        "total_dl": [
                            sum(len(ts) for ts in toks if ts is not None)
                        ],
                    }
                )

    return stream_docs.select("doc_id", text_col).mapInPandas(
        kernel, "n_docs long, total_dl long"
    )


def start_keyword_postings_stream(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n_buckets: int = KEYWORD_INDEX_BUCKETS,
):
    """Maintain ``{index_dir}/postings`` from a document stream —
    append-only, map-only, exactly-once via the file sink's
    transaction log, PARTITIONED BY bucket so probes prune to their
    query terms' partitions."""
    return (
        posting_rows_stream(stream_docs, text_col, n_buckets)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{index_dir}/postings")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .start()
    )


def start_keyword_stats_stream(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Maintain ``{index_dir}/stats`` (partial n_docs/total_dl rows) —
    the second half of the index, same sink discipline."""
    return (
        stats_rows_stream(stream_docs, text_col)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{index_dir}/stats")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_keyword_positions_stream(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n_buckets: int = KEYWORD_INDEX_BUCKETS,
):
    """Maintain ``{index_dir}/positions`` (the phrase tier) from a
    document stream. Unlike the tf postings (whose within-document
    Counter needs an Arrow kernel), the positions frame is a PURE
    stateless expression tree — posexplode + the md5 bucket fold — so
    the batch builder's exact expressions
    (textops._positions_frame) run unchanged on the streaming source:
    JVM-side, whole-stage-codegen, zero Python in the hot path. Same
    exactly-once parquet file sink, PARTITIONED BY bucket; batch and
    streamed tables are row-identical by construction (gated:
    streaming_keyword_positions_parity)."""
    from uwheel_datafusion_spark.operators.textops import _positions_frame

    return (
        _positions_frame(stream_docs, text_col, n_buckets)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{index_dir}/positions")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .start()
    )
