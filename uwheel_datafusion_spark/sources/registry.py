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


#: columns stored as TIMESTAMP(NANOS) in the driver-generated parquet;
#: Spark 4 reads them as long ns (spark.sql.legacy.parquet.nanosAsLong)
#: and we convert back to TimestampType, truncating ns→µs exactly as
#: DuckDB's µs TIMESTAMP does, so both engines see identical values.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Make nanosecond parquet readable even under a caller-provided
    session (the conf is runtime-settable; verified on pyspark 4.1)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def _restore_ns_timestamps(df: DataFrame, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer `div`, NOT `/`: epoch-ns exceeds double's 2^53, so
            # float division rounds some values up a full microsecond
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table (vectorized scan; pushdown-capable)."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _restore_ns_timestamps(df, name)


def load_table_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load WITHOUT the ns→timestamp restoration: nanosecond columns
    stay raw longs. This is the scan-heavy ingest path — predicates on
    the raw integer column push down to parquet row-group statistics,
    which the converted ``timestamp_micros(floor(ts/1000))`` expression
    never can (measured: PushedFilters degrade to [IsNotNull] on the
    converted view — a full scan at 100 TB)."""
    _ensure_nanos_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every test table as a temp view (S1 in SURVEY §2.1).

    Returns the DataFrames keyed by table name. Views are temp (session
    scoped); re-registering is idempotent.
    """
    _ensure_nanos_conf(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _restore_ns_timestamps(spark.read.parquet(path), name)
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
