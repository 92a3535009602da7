"""Cross-scale oracle-parity sweep, artifact-recorded.

Runs EVERY registered gate query against its DuckDB oracle at each
test scale (the same compare the grading driver uses, via
tests/driver_sim) and writes a ``SWEEP_r{N}.json`` next to the
BENCH/CORRECTNESS artifacts — so the cross-scale claim is
driver-auditable instead of a docstring note (the opt-in
``PARITY_ALL_SCALES=1`` pytest sweep remains the interactive form;
this is its recorded twin).

Usage::

    python tests/run_sweep.py SWEEP_r06.json [sf_dir ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCALES = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
)


def run(out_path: str, scales=DEFAULT_SCALES) -> dict:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tests.driver_sim import compare, duck_connection

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-parity-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    result = {
        "generated_by": "tests/run_sweep.py",
        "n_queries": len(queries),
        "scales": {},
    }
    for sf in scales:
        t0 = time.time()
        n_pass = n_rows_only = 0
        failures = []
        per_gate: dict[str, float] = {}
        con = duck_connection(sf)
        for name in sorted(queries):
            tg = time.time()
            try:
                df = queries[name](spark, sf)
                oracle = oracles.get(name)
                if oracle is None:
                    assert df.columns and df.count() >= 0
                    n_rows_only += 1
                    n_pass += 1
                    continue
                ok, msg = compare(df, con, oracle)
                if ok:
                    n_pass += 1
                else:
                    failures.append({"name": name, "msg": str(msg)[:300]})
            except Exception as ex:  # noqa: BLE001 — recorded, not hidden
                failures.append({"name": name, "msg": repr(ex)[:300]})
            finally:
                per_gate[name] = time.time() - tg
        slowest = sorted(per_gate.items(), key=lambda kv: -kv[1])[:10]
        result["scales"][sf] = {
            "pass": n_pass,
            "rows_only": n_rows_only,
            "fail": len(failures),
            "failures": failures,
            "wall_s": round(time.time() - t0, 1),
            # profiling handle (VERDICT r06 #8): where the wall goes
            "slowest_gates": [
                {"name": n, "s": round(s, 2)} for n, s in slowest
            ],
        }
        print(
            f"{sf}: {n_pass}/{len(queries)} pass "
            f"({n_rows_only} rows-only), {len(failures)} fail, "
            f"{result['scales'][sf]['wall_s']} s",
            flush=True,
        )
    result["all_green"] = all(
        s["fail"] == 0 for s in result["scales"].values()
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}; all_green={result['all_green']}")
    return result


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "SWEEP.json"
    sfs = tuple(sys.argv[2:]) or DEFAULT_SCALES
    run(out, sfs)
