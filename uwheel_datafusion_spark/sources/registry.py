"""Table registration — the engine's "catalog".

Reference parity: ``register_parquet("yellow_tripdata", path, ...)``
(/root/reference/src/main.rs:45-46) — one call registers a parquet file
as a named SQL table with schema inferred from the footer. Spark's
``spark.read.parquet(...).createOrReplaceTempView(name)`` is the exact
equivalent; the vectorized parquet reader plays the role of the Arrow
``ParquetRecordBatchReader`` (/root/reference/src/main.rs:105-109) and
Catalyst pushes filters/projections into the scan.

Beyond parity (free in Spark): csv / json / orc / text sources, which
DataFusion links but the reference never exercises (SURVEY §2.1 S6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-provided test tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table (vectorized scan; pushdown-capable).

    The driver fixtures store timestamps as parquet timestamp[us]
    without a timezone, which Spark 4 reads as TIMESTAMP_NTZ — the
    exact naive-UTC reading DuckDB uses, so both engines see identical
    values with no conversion layer. NTZ literals built by
    ``functions.time.ts_range_pred`` push down to parquet row-group
    stats natively (verified: PushedFilters shows the range)."""
    _ensure_utc(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC. ``ts_to_ms`` casts TIMESTAMP_NTZ
    through the session timezone, so a non-UTC caller session would
    silently shift every epoch-ms value and bucket boundary; set it
    defensively at every table load (idempotent, matches both the repo
    sessions and DuckDB's naive-UTC reading of the fixtures)."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every test table as a temp view (S1 in SURVEY §2.1).

    Returns the DataFrames keyed by table name. Views are temp (session
    scoped); re-registering is idempotent.
    """
    _ensure_utc(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_source(spark: SparkSession, fmt: str, path: str, **options) -> DataFrame:
    """Generic source reader (csv/json/orc/parquet/text).

    Signature-level parity with DataFusion's ListingTable family
    (SURVEY §2.1 S6); Delta/Iceberg/Hudi would need jars not present in
    this image, so they are rejected with a clear error.
    """
    fmt = fmt.lower()
    if fmt in {"delta", "iceberg", "hudi"}:
        raise NotImplementedError(
            f"{fmt} requires connector jars not present in this environment"
        )
    reader = spark.read.options(**options)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "text":
        return reader.text(path)
    raise ValueError(f"unsupported source format: {fmt}")
