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


RESIZE_SCHEMA = "doc_id long, width long, height long, resized_bytes long"


def resize_batch(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """STUB resize stage: real pipelines run PIL/opencv here; the stub
    scales the byte count by the area ratio (exact integer arithmetic
    ⇒ SQL oracle). Same Spark shape as production: mapInPandas over the
    decoded metadata, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized_bytes": (
                        pdf["payload_bytes"] * (target_w * target_h)
                    )
                    // (pdf["width"] * pdf["height"]),
                }
            )
            yield out

    return decoded.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long"


def frame_sample(decoded: DataFrame, every_k: int = 5) -> DataFrame:
    """STUB frame sampler: emits one row per k-th frame (fan-out via
    mapInPandas — each input row yields n_frames/k rows; production
    would attach the decoded frame bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
                for f in range(0, int(n_frames), every_k):
                    ids.append(int(doc_id))
                    idxs.append(f)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    return decoded.mapInPandas(run, schema=FRAME_SCHEMA)


N_FEATURES = 4
FEATURE_SCHEMA = "doc_id long, " + ", ".join(
    f"f{i} long" for i in range(N_FEATURES)
)


def feature_extract(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """STUB feature extractor: a real pipeline would run a vision/audio
    encoder per payload; the stub derives k deterministic 32-bit
    features with md5 (hashlib ≡ the dual-dialect hash32, so the whole
    Python-side Arrow round-trip has an exact SQL oracle)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {"doc_id": pdf["doc_id"]}
            for i in range(N_FEATURES):
                cols[f"f{i}"] = [
                    int(
                        hashlib.md5(f"{t}{i}".encode("utf-8")).hexdigest()[:8],
                        16,
                    )
                    for t in pdf[text_col]
                ]
            yield pd.DataFrame(cols)

    return docs.select("doc_id", text_col).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_stub_oracle(
    table: str = "documents",
    text_col: str = "text",
    target_w: int = 224,
    target_h: int = 224,
) -> str:
    return f"""
        SELECT doc_id,
               CAST({target_w} AS BIGINT) AS width,
               CAST({target_h} AS BIGINT) AS height,
               CAST(
                   (octet_length(encode({text_col})) * {target_w * target_h})
                   // ((64 + (doc_id % 512)) * (64 + ((doc_id * 7) % 512)))
               AS BIGINT) AS resized_bytes
        FROM {table}
    """


def frame_sample_oracle(
    table: str = "documents", text_col: str = "text", every_k: int = 5
) -> str:
    return f"""
        SELECT doc_id,
               CAST(unnest(generate_series(
                   0, CAST(n_frames - 1 AS BIGINT), {every_k}
               )) AS BIGINT) AS frame_idx
        FROM (
            SELECT doc_id,
                   1 + (octet_length(encode({text_col})) % 24) AS n_frames
            FROM {table}
        ) d
    """


def feature_extract_oracle(table: str = "documents", text_col: str = "text") -> str:
    from uwheel_datafusion_spark.functions.dialect import DUCK

    cols = ",\n  ".join(
        DUCK.hash32(f"concat({text_col}, '{i}')") + f" AS f{i}"
        for i in range(N_FEATURES)
    )
    return f"SELECT doc_id, {cols} FROM {table}"


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
