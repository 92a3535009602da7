"""Run a SUBSET of registered gates vs their DuckDB oracles at sf0.01.

Usage:  python tests/run_gates.py name1 name2 ...   (or a prefix with
``name*``).  Same comparison logic as drive_driver.py, for fast
iteration on individual gates without the full 185-gate sweep.
"""
import sys, os, math, fnmatch

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = (
    SparkSession.builder.master("local[8]").appName("gate-subset").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

Q, O = E.queries(), E.oracle_sql()
pats = sys.argv[1:] or sorted(Q)
names = [n for n in sorted(Q) if any(fnmatch.fnmatch(n, p) for p in pats)]
if not names:
    print("no gates match", pats)
    sys.exit(2)


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


fails = []
for name in names:
    d = Q[name](spark, sf)
    s_cols, s_rows = d.columns, [tuple(r) for r in d.collect()]
    if name not in O:
        print(f"{name}: rows-only, {len(s_rows)} rows")
        continue
    rel = con.sql(O[name])
    d_cols, d_rows = list(rel.columns), rel.fetchall()
    ok = True
    msg = ""
    from tests.driver_sim import _type_drift

    drift = _type_drift(d, con.sql(O[name]).limit(0))
    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
        ok, msg = False, f"cols {s_cols} vs {d_cols}"
    elif drift:
        ok, msg = False, f"type drift: {drift}"
    elif len(s_rows) != len(d_rows):
        ok, msg = False, f"rowcount {len(s_rows)} vs {len(d_rows)}"
    else:
        so = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
        do = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())
        sn = sorted(tuple(norm(r[i]) for i in so) for r in s_rows)
        dn = sorted(tuple(norm(r[i]) for i in do) for r in d_rows)
        if sn != dn:
            ok = False
            msg = "values: " + str([(a, b) for a, b in zip(sn, dn) if a != b][:2])
    print(("PASS " if ok else "FAIL ") + name + ("" if ok else " — " + msg), f"({len(s_rows)} rows)")
    if not ok:
        fails.append(name)
print("RESULT:", "ALL PASS" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
