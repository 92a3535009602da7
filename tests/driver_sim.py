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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sn = _normalize([c.lower() for c in s_cols], s_rows)
    dn = _normalize([c.lower() for c in d_cols], d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
