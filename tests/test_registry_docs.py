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
