"""Hierarchical range decomposition — the core µWheel idea.

``combine_range_and_lower(WheelRange[start, end))`` (use-site
/root/reference/src/main.rs:212) answers a half-open time-range
aggregate by combining the *minimum* number of pre-aggregated slots
across granularities: minutes at the ragged edges, hours/days in the
aligned middle. This module reproduces that decomposition as a pure
Python planner (unit-testable without Spark) plus an ``explain()``
plan object mirroring ``explain_combine_range``
(/root/reference/src/main.rs:214-220).

Decomposition invariant (SURVEY §4.2): the returned runs form an exact
disjoint cover of ``[start, end)``, so for any associative aggregator
``answer = combine over all covered slots`` regardless of the mix of
granularities chosen.

Two serving strategies consume a plan:

- the driver prefix-sum index ignores it (O(1) regardless — µWheel's
  ``WheelMode::Index`` prefix layout, /root/reference/src/main.rs:88);
- the distributed path turns each run into a partition-prunable filter
  on the matching rollup table (plans.range_plan → operators.wheel).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    SECOND_MS,
    WEEK_MS,
)

#: coarse → fine; each divides the previous (weeks are 7-day epoch
#: multiples — µWheel's week wheel is likewise just 7 day slots;
#: seconds are opt-in — µWheel's seconds wheel, the level that lets
#: the index answer sub-minute endpoints without touching the fact
#: table, [uwheel-pub] §wheel hierarchy)
_LEVELS: tuple[tuple[str, int], ...] = (
    ("week", WEEK_MS),
    ("day", DAY_MS),
    ("hour", HOUR_MS),
    ("minute", MINUTE_MS),
    ("second", SECOND_MS),
)


@dataclass(frozen=True)
class SlotRun:
    """A maximal run of consecutive aligned slots at one granularity."""

    granularity: str
    slot_ms: int  # slot width
    start_ms: int  # inclusive, aligned to slot_ms
    end_ms: int  # exclusive, aligned to slot_ms

    @property
    def n_slots(self) -> int:
        return (self.end_ms - self.start_ms) // self.slot_ms


@dataclass
class RangePlan:
    """Explainable physical plan for one ``[start, end)`` query
    (analogue of A6 ``explain_combine_range``)."""

    start_ms: int
    end_ms: int
    runs: list[SlotRun] = field(default_factory=list)
    fallback: str | None = None  # set when the range must go to SQL scan

    @property
    def total_slots(self) -> int:
        return sum(r.n_slots for r in self.runs)

    @property
    def cost(self) -> int:
        """Slot-combine cost (µWheel's plan cost is also slot count)."""
        return self.total_slots

    def describe(self) -> str:
        if self.fallback:
            return f"[{self.start_ms},{self.end_ms}) -> FALLBACK({self.fallback})"
        parts = ", ".join(
            f"{r.granularity}[{r.start_ms},{r.end_ms})x{r.n_slots}" for r in self.runs
        )
        return f"[{self.start_ms},{self.end_ms}) -> {parts or 'EMPTY'} cost={self.cost}"


def decompose_range(
    start_ms: int,
    end_ms: int,
    granularities: tuple[str, ...] = ("day", "hour", "minute"),
) -> RangePlan:
    """Greedy maximal-aligned decomposition of ``[start_ms, end_ms)``.

    Recursive: take the coarsest granularity, find the aligned core
    ``[ceil(start), floor(end))``; the ragged prefix/suffix recurse to
    the next-finer level. Endpoints must be aligned to the finest
    granularity supplied (minute, per the reference workload contract,
    /root/reference/src/main.rs:168-169) — unaligned input yields a
    fallback plan that routes to the SQL scan path.
    """
    plan = RangePlan(start_ms=start_ms, end_ms=end_ms)
    if end_ms <= start_ms:
        return plan  # empty cover, combine identity ⇒ None/null result

    levels = [(g, w) for g, w in _LEVELS if g in granularities]
    if not levels:
        plan.fallback = "no granularities"
        return plan
    finest = levels[-1][1]
    if start_ms % finest or end_ms % finest:
        plan.fallback = f"endpoints not aligned to {levels[-1][0]}"
        return plan

    def rec(s: int, e: int, level: int) -> list[SlotRun]:
        if s >= e:
            return []
        g, w = levels[level]
        core_s = -((-s) // w) * w  # ceil to w
        core_e = (e // w) * w  # floor to w
        if core_s >= core_e:
            # nothing aligned at this level; go finer
            if level + 1 < len(levels):
                return rec(s, e, level + 1)
            return [SlotRun(g, w, s, e)]  # cannot happen if aligned-checked
        out: list[SlotRun] = []
        if level + 1 < len(levels):
            out.extend(rec(s, core_s, level + 1))
        out.append(SlotRun(g, w, core_s, core_e))
        if level + 1 < len(levels):
            out.extend(rec(core_e, e, level + 1))
        return out

    plan.runs = rec(start_ms, end_ms, 0)
    return plan


def explain_range(start_ms: int, end_ms: int, **kw) -> str:
    """Human-readable plan, cf. ``explain_combine_range`` output."""
    return decompose_range(start_ms, end_ms, **kw).describe()


@dataclass
class HybridPlan:
    """Explainable plan for an UNALIGNED ``[start, end)`` (µWheel
    answers sub-minute edges from its seconds wheel; we keep no seconds
    rollup, so ragged edges become pushdown fact-table scans while the
    aligned interior stays on the index — operators.wheel.
    range_agg_hybrid_df executes exactly this plan)."""

    start_ms: int
    end_ms: int
    #: ragged edge spans served by a (row-group-pruned) fact scan;
    #: each covers < 2 minutes of data by construction
    edge_scans: list[tuple[int, int]] = field(default_factory=list)
    #: aligned interior served from the rollups (empty runs ⇒ the whole
    #: range fits inside two minute slots and is pure edge scan)
    interior: RangePlan | None = None

    @property
    def cost(self) -> int:
        return self.interior.cost if self.interior else 0

    def describe(self) -> str:
        edges = ", ".join(f"scan[{s},{e})" for s, e in self.edge_scans)
        inner = self.interior.describe() if self.interior else "EMPTY"
        return (
            f"hybrid[{self.start_ms},{self.end_ms}) -> "
            f"edges: {edges or 'NONE'}; interior: {inner}"
        )


def decompose_hybrid(
    start_ms: int,
    end_ms: int,
    granularities: tuple[str, ...] = ("day", "hour", "minute"),
) -> HybridPlan:
    """Split an arbitrary range into ≤2 sub-slot edge scans plus an
    aligned interior decomposition — the planning half of
    ``range_agg_hybrid_df``, factored out so the hybrid path is
    explainable like the aligned one (A6 for ragged ranges).

    Edges align to the FINEST granularity present: with the opt-in
    seconds wheel each edge scan covers < 2 seconds of data (and a
    second-aligned endpoint needs no scan at all — the index is
    self-sufficient, µWheel's seconds-wheel behavior); without it the
    edges cover < 2 minutes, as before."""
    plan = HybridPlan(start_ms=start_ms, end_ms=end_ms)
    if end_ms <= start_ms:
        return plan
    fine_ms = min(
        (w for g, w in _LEVELS if g in granularities), default=MINUTE_MS
    )
    core_s = -((-start_ms) // fine_ms) * fine_ms  # ceil to finest slot
    core_e = (end_ms // fine_ms) * fine_ms  # floor to finest slot
    if core_e <= core_s:  # whole range inside (under) two finest slots
        plan.edge_scans = [(start_ms, end_ms)]
        return plan
    plan.edge_scans = [
        (s, e) for s, e in ((start_ms, core_s), (core_e, end_ms)) if e > s
    ]
    plan.interior = decompose_range(core_s, core_e, granularities)
    return plan
