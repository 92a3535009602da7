"""Executed-plan observability: per-operator SQL metrics as data.

The reference prints its query plans and per-phase timings to stdout
(`/root/reference/src/main.rs` bench loops); an engine you can operate
at 100 TB needs the same visibility PROGRAMMATICALLY — which operator
read how many rows, how many bytes crossed each shuffle, what spilled.
Spark tracks all of this in per-node SQLMetrics on the executed plan;
this module walks the plan tree (py4j) after an action and returns the
metrics as plain Python data, so tests/jobs can assert on plan
behavior ("the scan emitted N rows", "one exchange, ~X bytes") instead
of eyeballing the Spark UI.

Usage:
    prof = profile(df)            # runs df.count(), then harvests
    prof.total("numOutputRows", node_contains="Scan")
    prof.shuffle_bytes()          # Σ shuffle bytes written
    print(prof.report())          # aligned text table

Driver-side only; zero effect on the plan under measurement (the walk
happens after execution, on the existing plan object)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["NodeMetrics", "PlanProfile", "profile"]


@dataclass
class NodeMetrics:
    node: str  # nodeName, e.g. "FileScan parquet", "Exchange"
    depth: int
    metrics: dict[str, int]  # metric name → value


@dataclass
class PlanProfile:
    nodes: list[NodeMetrics] = field(default_factory=list)

    def total(self, metric: str, node_contains: str | None = None) -> int:
        """Sum a metric across nodes (optionally filtered by node
        name substring, case-insensitive)."""
        needle = node_contains.lower() if node_contains else None
        return sum(
            v
            for n in self.nodes
            for k, v in n.metrics.items()
            if k == metric and (needle is None or needle in n.node.lower())
        )

    def count_nodes(self, node_contains: str) -> int:
        needle = node_contains.lower()
        return sum(1 for n in self.nodes if needle in n.node.lower())

    def shuffle_bytes(self) -> int:
        return self.total("shuffleBytesWritten", node_contains="Exchange")

    def shuffle_records(self) -> int:
        return self.total("shuffleRecordsWritten", node_contains="Exchange")

    def scan_rows(self) -> int:
        return self.total("numOutputRows", node_contains="Scan")

    def spill_bytes(self) -> int:
        return sum(
            v
            for n in self.nodes
            for k, v in n.metrics.items()
            if "spill" in k.lower() and "size" in k.lower()
        )

    def report(self) -> str:
        lines = []
        for n in self.nodes:
            keep = {
                k: v
                for k, v in n.metrics.items()
                if v and (
                    "rows" in k.lower()
                    or "bytes" in k.lower()
                    or "spill" in k.lower()
                    or "files" in k.lower()
                    or "partitions" in k.lower()
                )
            }
            shown = ", ".join(f"{k}={v:,}" for k, v in sorted(keep.items()))
            lines.append(f"{'  ' * n.depth}{n.node}" + (f"  [{shown}]" if shown else ""))
        return "\n".join(lines)


def _walk(jnode, depth, out) -> None:
    m = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            m[str(kv._1())] = int(kv._2().value())
        except Exception:
            pass  # non-numeric metric (timing strings) — skip
    out.append(NodeMetrics(str(jnode.nodeName()), depth, m))
    children = jnode.children()
    for i in range(children.size()):
        _walk(children.apply(i), depth + 1, out)
    # dive through wrapper boundaries that hide their subtree behind a
    # plan reference instead of children(): AdaptiveSparkPlanExec
    # (executedPlan), ShuffleQueryStageExec/BroadcastQueryStageExec
    # (plan) — py4j raises on a missing method, hence try/except
    if children.size() == 0:
        for attr in ("executedPlan", "plan"):
            try:
                _walk(getattr(jnode, attr)(), depth + 1, out)
                break
            except Exception:
                pass


def profile(df: DataFrame) -> PlanProfile:
    """Execute ``df``'s OWN physical plan and harvest every node's
    SQLMetrics. `df.count()` would NOT work here — it plans a separate
    query (extra aggregate, its own QueryExecution) and leaves this
    plan's accumulators untouched; `queryExecution().toRdd().count()`
    runs exactly this plan, full output, nothing shipped wide to the
    driver beyond the row count."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    out: list[NodeMetrics] = []
    _walk(qe.executedPlan(), 0, out)
    return PlanProfile(out)
