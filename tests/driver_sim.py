"""Local replica of the driver's correctness gate: run a gate query in
Spark and its oracle in DuckDB over the same parquet dir, compare
row count, column names, and order-insensitive values.

Comparison detail: columns are sorted by name, rows sorted by their
full stringified tuple, values compared cell-by-cell (exact for
ints/strings; exact for doubles too — the whole point of the
scaled-long sum policy is bit-identical doubles)."""

from __future__ import annotations

import math
import os

import duckdb

from uwheel_datafusion_spark.sources.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — policy guarantees bit equality
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def _canon_arrow_type(t) -> str:
    """Collapse an Arrow type to the equivalence class the driver's
    value-hash effectively compares under. Anything outside the gate's
    sanctioned scalar surface (e.g. DuckDB widening SUM(BIGINT) to
    HUGEINT = decimal128(38,0)) keeps its full name so it MISMATCHES
    int64 — that exact drift escaped the str()-based compare in r04
    (`split_train_val_test`, VERDICT r04 §What's wrong #2)."""
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int64"
    if pt.is_floating(t):
        return "float64"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    return str(t)  # decimal128(38,0) etc. — deliberately not collapsed


def _canon_spark_type(t) -> str:
    """Same canonical classes as _canon_arrow_type, from a Spark
    DataType (no extra collect — the schema is already known)."""
    import pyspark.sql.types as st

    if isinstance(t, (st.ByteType, st.ShortType, st.IntegerType, st.LongType)):
        return "int64"
    if isinstance(t, (st.FloatType, st.DoubleType)):
        return "float64"
    if isinstance(t, st.StringType):
        return "string"
    if isinstance(t, st.BooleanType):
        return "bool"
    if isinstance(t, st.TimestampType):
        return "timestamp"
    if isinstance(t, st.DateType):
        return "date"
    if isinstance(t, st.ArrayType):
        return f"list<{_canon_spark_type(t.elementType)}>"
    if isinstance(t, st.BinaryType):
        return "binary"
    return t.simpleString()


def _type_drift(spark_df, rel) -> str | None:
    """Return a description of any oracle-vs-Spark type drift, or None
    when every shared column lands in the same canonical class. The
    DuckDB side goes through Arrow — the same fidelity the driver
    hashes through."""
    s_types = {f.name.lower(): _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    d_types = {f.name.lower(): _canon_arrow_type(f.type) for f in rel.arrow().schema}
    drifts = [
        f"{c}: spark={s_types[c]} duck={d_types[c]}"
        for c in sorted(set(s_types) & set(d_types))
        if s_types[c] != d_types[c]
    ]
    return "; ".join(drifts) if drifts else None


def _driver_unhashable(t) -> bool:
    """True for column types the REAL driver cannot canonicalize: its
    value-hash sorts the result with pandas ``sort_values``, which
    factorizes each column and dies on unhashable cells
    (``TypeError: unhashable type: 'list'`` — CORRECTNESS_r06's one
    red row, `embedding_int8_quantize`). The replica's pure-Python
    str() sort hid that class of failure, so reject it up front."""
    import pyspark.sql.types as st

    return isinstance(t, (st.ArrayType, st.MapType, st.StructType))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    unhashable = [
        f.name for f in spark_df.schema.fields if _driver_unhashable(f.dataType)
    ]
    if unhashable:
        return False, (
            "driver-unhashable final projection (pandas canonicalizer "
            f"crashes on list/map/struct cells): {unhashable}"
        )
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    drift = _type_drift(spark_df, con.sql(sql).limit(0))
    if drift:
        return False, f"type drift: {drift}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sn = _normalize([c.lower() for c in s_cols], s_rows)
    dn = _normalize([c.lower() for c in d_cols], d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
