"""Unit tests for the pure-Python range planner (SURVEY §5.2):
cover exactness, alignment edge cases, fallback routing."""

import random

from uwheel_datafusion_spark.functions.time import DAY_MS, HOUR_MS, MINUTE_MS
from uwheel_datafusion_spark.plans.range_plan import decompose_range


def _assert_exact_cover(plan):
    """Runs must tile [start, end) exactly, in order, no gaps/overlap."""
    assert plan.fallback is None
    cur = plan.start_ms
    for run in plan.runs:
        assert run.start_ms == cur
        assert run.end_ms > run.start_ms
        assert run.start_ms % run.slot_ms == 0
        assert run.end_ms % run.slot_ms == 0
        cur = run.end_ms
    assert cur == plan.end_ms


def test_empty_range():
    p = decompose_range(1000 * MINUTE_MS, 1000 * MINUTE_MS)
    assert p.runs == [] and p.fallback is None and p.cost == 0
    p = decompose_range(2000 * MINUTE_MS, 1000 * MINUTE_MS)
    assert p.runs == []


def test_single_minute():
    s = 1234 * MINUTE_MS
    p = decompose_range(s, s + MINUTE_MS)
    _assert_exact_cover(p)
    assert p.total_slots == 1 and p.runs[0].granularity == "minute"


def test_exact_day():
    s = 10 * DAY_MS
    p = decompose_range(s, s + 3 * DAY_MS)
    _assert_exact_cover(p)
    assert len(p.runs) == 1 and p.runs[0].granularity == "day"
    assert p.cost == 3


def test_cross_boundary_mixed():
    # 2024-01-03 04:17 → 2024-01-20 07:42 style: minutes|hours|days|hours|minutes
    s = 3 * DAY_MS + 4 * HOUR_MS + 17 * MINUTE_MS
    e = 20 * DAY_MS + 7 * HOUR_MS + 42 * MINUTE_MS
    p = decompose_range(s, e)
    _assert_exact_cover(p)
    grans = [r.granularity for r in p.runs]
    assert grans == ["minute", "hour", "day", "hour", "minute"]
    assert p.cost == 43 + 19 + 16 + 7 + 42


def test_unaligned_falls_back():
    p = decompose_range(1000, 2000)  # sub-minute endpoints
    assert p.fallback is not None


def test_no_hour_granularity():
    s, e = 0, 2 * DAY_MS + 30 * MINUTE_MS
    p = decompose_range(s, e, granularities=("day", "minute"))
    _assert_exact_cover(p)
    assert {r.granularity for r in p.runs} == {"day", "minute"}


def test_property_exact_cover_random():
    rng = random.Random(42)
    horizon = 45 * DAY_MS // MINUTE_MS  # in minutes
    for _ in range(500):
        a = rng.randrange(0, horizon) * MINUTE_MS
        b = rng.randrange(0, horizon) * MINUTE_MS
        s, e = min(a, b), max(a, b)
        p = decompose_range(s, e)
        if s == e:
            assert p.runs == []
            continue
        _assert_exact_cover(p)
        # never more slots than pure-minute cover; and the greedy cover
        # uses at most 59+59 minutes + 23+23 hours + days
        assert p.cost <= (e - s) // MINUTE_MS
        n_days = (e - s) // DAY_MS
        assert p.cost <= 59 * 2 + 23 * 2 + n_days + 2


# ---------------------------------------------------------------- properties

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _N_MIN = 60 * 24 * 40  # 40 days of minutes

    @given(
        a=st.integers(min_value=0, max_value=_N_MIN - 1),
        span=st.integers(min_value=1, max_value=_N_MIN),
    )
    @settings(max_examples=300, deadline=None)
    def test_property_exact_cover_and_optimality(a, span):
        """For ANY minute-aligned range: exact disjoint cover, and the
        greedy plan never uses more slots than the all-minutes plan."""
        s, e = a * MINUTE_MS, min(a + span, _N_MIN) * MINUTE_MS
        if e <= s:
            return
        plan = decompose_range(s, e)
        _assert_exact_cover(plan)
        n_minutes = (e - s) // MINUTE_MS
        assert plan.cost <= n_minutes
        # each granularity appears in at most two runs (prefix+suffix)
        from collections import Counter

        c = Counter(r.granularity for r in plan.runs)
        assert all(v <= 2 for v in c.values())

    @given(a=st.integers(min_value=0, max_value=_N_MIN * MINUTE_MS))
    @settings(max_examples=100, deadline=None)
    def test_property_unaligned_falls_back(a):
        s = a - (a % MINUTE_MS) + 1  # force sub-minute start
        p = decompose_range(s, s + 2 * MINUTE_MS)
        assert p.fallback is not None

except ImportError:  # pragma: no cover
    pass


def test_week_level_decomposition():
    """With the week wheel enabled, a multi-year range's interior is
    covered by week runs; the cover stays exact."""
    from uwheel_datafusion_spark.functions.time import WEEK_MS

    s = 1000 * DAY_MS + 7 * HOUR_MS
    e = s + 200 * DAY_MS + 5 * HOUR_MS + 42 * MINUTE_MS
    p = decompose_range(s, e, ("minute", "hour", "day", "week"))
    _assert_exact_cover(p)
    assert any(r.granularity == "week" for r in p.runs)
    n_week_slots = sum(r.n_slots for r in p.runs if r.granularity == "week")
    assert n_week_slots >= 26
    # without weeks the same range costs more slots
    p_noweek = decompose_range(s, e, ("minute", "hour", "day"))
    assert p.cost < p_noweek.cost


def test_hybrid_decomposition_and_describe():
    """decompose_hybrid: ragged edges become ≤2 sub-minute scans, the
    interior is the aligned decomposition; cover is exact and
    disjoint; sub-two-minute ranges are pure edge scan."""
    from uwheel_datafusion_spark.plans.range_plan import decompose_hybrid

    m = 60_000
    s, e = 10 * m + 37_000, 500 * m + 11_000
    p = decompose_hybrid(s, e)
    assert p.edge_scans == [(s, 11 * m), (500 * m, e)]
    assert p.interior is not None and not p.interior.fallback
    spans = sorted(
        p.edge_scans + [(r.start_ms, r.end_ms) for r in p.interior.runs]
    )
    # exact disjoint cover of [s, e)
    assert spans[0][0] == s and spans[-1][1] == e
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    assert "hybrid" in p.describe() and "scan[" in p.describe()

    tiny = decompose_hybrid(10 * m + 5_000, 10 * m + 25_000)
    assert tiny.edge_scans == [(10 * m + 5_000, 10 * m + 25_000)]
    assert tiny.interior is None and tiny.cost == 0

    # aligned-at-one-end: only one edge scan
    one_edge = decompose_hybrid(10 * m, 500 * m + 11_000)
    assert one_edge.edge_scans == [(500 * m, 500 * m + 11_000)]

    empty = decompose_hybrid(5 * m, 5 * m)
    assert empty.edge_scans == [] and empty.interior is None
