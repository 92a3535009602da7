"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The real decode libraries (PIL/ffmpeg/librosa) are not in this
container, so the decode kernel is a clearly-marked deterministic STUB
— but everything Spark-side is real and tested: the binary column
schema, Arrow batch transfer through ``mapInPandas``, the batch shapes,
and the partitioning story (each payload is decoded exactly once,
map-only, no shuffle; at 100 TB the payloads live in their own parquet
column and column pruning keeps metadata-only queries from touching
them).

``decode_stub`` derives its outputs ONLY from the payload bytes and
doc_id, so the whole pipeline has an exact SQL oracle — the gate
actually verifies the Arrow round-trip, not just that it runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, payload_bytes long, first_byte long, "
    "width long, height long, n_frames long"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column (fixture: utf-8 bytes of the
    text; production: image/audio/video bytes read from object store)."""
    return docs.select(
        "doc_id", F.encode(F.col(text_col), "utf-8").alias("payload")
    )


def fake_decode(doc_id: int, payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake in place of a real
    image/video decoder (libs not present in this environment).
    Replace the body with PIL/ffmpeg calls in production; the
    signature (bytes in, typed metadata out) is the real contract."""
    n = len(payload)
    first = payload[0] if n else 0
    return {
        "doc_id": doc_id,
        "payload_bytes": n,
        "first_byte": int(first),
        "width": 64 + (doc_id % 512),
        "height": 64 + ((doc_id * 7) % 512),
        "n_frames": 1 + (n % 24),
    }


def real_decode(doc_id: int, payload: bytes) -> dict:  # pragma: no cover
    """The production kernel slot. Kept import-free so the module loads
    everywhere; raises until a decoder library is available."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg, not present in this container"
    )


def decode_batch(
    docs_with_payload: DataFrame, kernel=fake_decode
) -> DataFrame:
    """Run the decode kernel over Arrow batches via ``mapInPandas`` —
    the canonical Spark shape for binary-blob feature extraction:
    vectorized transfer, per-partition streaming (no full materialize),
    map-only (no shuffle)."""

    from uwheel_datafusion_spark.shipping import ensure_package_shipped

    ensure_package_shipped(docs_with_payload.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                kernel(int(r.doc_id), bytes(r.payload) if r.payload is not None else b"")
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(run, schema=DECODE_SCHEMA)


def decode_stub_pipeline(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """End-to-end: attach payload → decode via mapInPandas."""
    return decode_batch(with_binary_payload(docs, text_col))


def decode_stub_oracle(table: str = "documents", text_col: str = "text") -> str:
    """SQL twin of the stubbed pipeline — verifies the Arrow round-trip
    byte-for-byte (payload length + first byte survive the transfer)."""
    return f"""
        SELECT doc_id,
               CAST(octet_length(encode({text_col})) AS BIGINT) AS payload_bytes,
               CAST(CASE WHEN length({text_col}) > 0
                         THEN ascii(substring({text_col}, 1, 1)) ELSE 0 END AS BIGINT) AS first_byte,
               CAST(64 + (doc_id % 512) AS BIGINT) AS width,
               CAST(64 + ((doc_id * 7) % 512) AS BIGINT) AS height,
               CAST(1 + (octet_length(encode({text_col})) % 24) AS BIGINT) AS n_frames
        FROM {table}
    """
