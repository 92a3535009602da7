"""Doc-drift guards: numbers the docs cite about the registry are
derived here so they can't silently rot (a stale count shipped twice —
ADVICE r03)."""

import re

import __spark_entry__ as entry_mod


def test_readme_query_count_matches_registry():
    n = len(entry_mod.queries())
    with open("README.md") as f:
        readme = f.read()
    m = re.search(r"correctness gate: (\d+) queries", readme)
    assert m, "README no longer states the gate query count"
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} gate queries but the registry has {n} — "
        "update the README line"
    )


def test_every_query_has_exact_oracle():
    """README claims every query has an exact DuckDB oracle (no
    rows-only checks) — pin it."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = [name for name in q if not o.get(name)]
    assert not missing, f"queries without an oracle: {missing}"


def test_driver_window_is_exactly_the_cap():
    from uwheel_datafusion_spark.gate import _DRIVER_WINDOW, REGISTRY

    assert len(_DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW


def test_gate_wrapper_tunes_vanilla_session(spark):
    """Every registry fn must apply _tune_session before running —
    the grading driver calls gates under its own vanilla session, and
    the text tier's performance contract depends on the
    InferFiltersFromGenerate exclusion being set there (PLANS.md
    round-7 cont. 4)."""
    from uwheel_datafusion_spark import gate as g

    key = "spark.sql.optimizer.excludedRules"
    spark.conf.set(key, "")  # simulate an untuned session
    g.REGISTRY["text_profile"].fn(spark, "/root/testdata/sf0.001").count()
    assert "InferFiltersFromGenerate" in (spark.conf.get(key) or "")


def test_readme_component_table_covers_gated_families():
    """VERDICT r12 next #8: the coverage-map table rotted past round 9
    once — pin one representative gate name per driver-gated family so
    a new family can't ship without its README row."""
    with open("README.md") as f:
        readme = f.read()
    q = entry_mod.queries()
    representatives = [
        # one per family, oldest → newest
        "wheel_rollup_minute" if "wheel_rollup_minute" in q else "sql_scan_sum_range",
        "router_multi_agg_range",
        "streaming_table_sink_parity",
        "dedup_minhash_lsh_capped",
        "similarity_ann_rerank_served",
        "text_keyword_index_erased",
        "retrieval_hybrid_served",
        # round 12 families
        "similarity_ann_auto_compacted",
        "streaming_ann_recompact_resume",
        "similarity_ann_manifest_lifecycle",
        "similarity_ann_manifest_time_travel",
        "similarity_ann_bulk_erased_df",
        # round 13 families
        "similarity_ann_ivfpq_residual_served",
        "similarity_ann_ivfpq_rotated_served",
        "similarity_ann_cosine_rerank_served",
        "similarity_ann_ivf_sampled_served",
        "streaming_table_sink_manifest_parity",
        "similarity_ann_manifest_auto_compacted",
    ]
    missing_from_registry = [n for n in representatives if n not in q]
    assert not missing_from_registry, missing_from_registry
    missing_from_readme = [n for n in representatives if n not in readme]
    assert not missing_from_readme, (
        f"driver-gated families missing a README coverage row: "
        f"{missing_from_readme}"
    )
