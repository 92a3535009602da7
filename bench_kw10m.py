"""Keyword index at 10 MILLION documents — the pruning-dominates proof.

VERDICT r11 next #7 asked for the BM25 index-vs-one-shot speedup "at
10M docs where pruning should dominate scheduler overhead": at 1M docs
the probe's fixed costs (session/job scheduling, snapshot or marker
resolution) eat a large share of a sub-second query, so the measured
speedup understates what partition pruning buys at corpus scale. This
script builds the SAME synthetic corpus shape as bench_scale.py's
keyword block at 10× the documents (240M posting rows), measures:

- dir-swap index build wall + BM25 probe p50,
- MANIFEST index build wall + BM25 probe p50 (per-probe snapshot
  resolution AND pinned-snapshot — the marker-free fixed-cost floor),
- the one-shot corpus-scan BM25 p50,
- exact dual checks (probe rows ≡ one-shot rows) for both layouts,

and writes one JSON artifact (default ``BENCH_r{N}_kw10m.json``).

Usage::

    python bench_kw10m.py BENCH_r12_kw10m.json [n_docs]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS_DEFAULT = 10_000_000


def main(out_path: str, n_docs: int = N_DOCS_DEFAULT) -> dict:
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark import get_spark
    from uwheel_datafusion_spark.operators import textops as tx
    from uwheel_datafusion_spark.operators.manifest import manifest_latest

    spark = get_spark(app_name="uwheel_bench_kw10m")
    spark.sparkContext.setLogLevel("ERROR")
    doc_len = 24
    work = tempfile.mkdtemp(prefix="kw10m_")
    out: dict = {
        "metric": "keyword_index_10m",
        "n_docs": n_docs,
        "doc_len_tokens": doc_len,
        "detail": {},
    }
    try:
        # same zipf-ish vocabulary construction as bench_scale.py's
        # 1M block (seeded hash mixture, 2000 distinct tokens), read
        # fresh from parquet on BOTH sides — a cached one-shot twin
        # would flatter the scan path
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    f"concat_ws(' ', transform(sequence(1, {doc_len}), "
                    "i -> concat('w', CAST(pmod(hash(id * 53 + i), "
                    "pmod(hash(id * 101 + i * 7), 1999) + 1) AS STRING))))"
                ).alias("text"),
            )
            .repartition(64, "doc_id")
            .write.parquet(f"{work}/corpus")
        )
        docs = spark.read.parquet(f"{work}/corpus")
        terms = ("w17", "w523", "w1801")  # frequent / mid / rare

        def p50(fn, reps=5):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        def rows(df):
            return sorted(map(tuple, df.collect()))

        mism = 0
        one_shot_p50 = p50(
            lambda: tx.keyword_search_bm25(docs, terms).collect(), reps=3
        )
        truth = rows(tx.keyword_search_bm25(docs, terms))

        kw_dir = f"{work}/kw"
        t0 = time.perf_counter()
        tx.build_keyword_index(docs, kw_dir)
        swap_build = time.perf_counter() - t0
        swap_p50 = p50(
            lambda: tx.keyword_index_bm25_probe(spark, kw_dir, terms)
            .collect()
        )
        if rows(tx.keyword_index_bm25_probe(spark, kw_dir, terms)) != truth:
            mism += 1

        mf_dir = f"{work}/kwmf"
        t0 = time.perf_counter()
        tx.build_keyword_index_manifest(docs, mf_dir)
        mf_build = time.perf_counter() - t0
        mf_p50 = p50(
            lambda: tx.keyword_manifest_bm25_probe(spark, mf_dir, terms)
            .collect()
        )
        snap = manifest_latest(spark, mf_dir)
        mf_pinned_p50 = p50(
            lambda: tx.keyword_manifest_bm25_probe(
                spark, mf_dir, terms, snapshot=snap
            ).collect()
        )
        if rows(tx.keyword_manifest_bm25_probe(spark, mf_dir, terms)) != truth:
            mism += 1

        out["detail"] = {
            "postings_rows": spark.read.parquet(f"{kw_dir}/postings").count(),
            "one_shot_scan_p50_sec": round(one_shot_p50, 3),
            "dirswap": {
                "build_sec": round(swap_build, 2),
                "bm25_p50_sec": round(swap_p50, 3),
                "index_speedup": round(one_shot_p50 / swap_p50, 2),
            },
            "manifest": {
                "build_sec": round(mf_build, 2),
                "bm25_p50_per_probe_resolve_sec": round(mf_p50, 3),
                "bm25_p50_pinned_snapshot_sec": round(mf_pinned_p50, 3),
                "index_speedup_pinned": round(
                    one_shot_p50 / mf_pinned_p50, 2
                ),
            },
            "dual_check_mismatches": mism,
        }
        out["all_dual_checks_clean"] = mism == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "detail"}))
    print("wrote", out_path)
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "BENCH_kw10m.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_DOCS_DEFAULT
    main(dest, n)
