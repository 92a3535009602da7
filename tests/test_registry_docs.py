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
