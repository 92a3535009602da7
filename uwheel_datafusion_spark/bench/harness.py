"""Benchmark harness — B1–B7 of SURVEY §2.11.

Replicates the reference's measurement protocol (BASELINE.md):
randomized `[start, end)` range workloads at minute and hour
granularity over the indexed span, per-query latency capture with
percentile table (the reference uses an HDR histogram,
/root/reference/src/main.rs:290-304; numpy percentiles are the
equivalent here), QPS as N / wall-clock
(/root/reference/src/main.rs:226-232), plus index build time and
memory footprint (/root/reference/src/main.rs:48-50,144).

Two deliberate deviations, both documented in SURVEY §5.4:

- generators are **seeded** (the reference's `fastrand` calls are not,
  making its runs non-reproducible — fixed, not copied);
- the reference's hour generator has a bug (hour counts offset as
  *minutes*, /root/reference/src/main.rs:194-195); our hour workload is
  correctly hour-aligned by default with ``replicate_ref_bug=True``
  available for apples-to-apples distribution comparison.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field

import numpy as np

from uwheel_datafusion_spark.functions.time import HOUR_MS, MINUTE_MS

PERCENTILES = (50.0, 99.0, 99.9, 99.99, 99.999)


def gen_minute_ranges(
    watermark_ms: int, horizon_ms: int, n: int, seed: int = 42
) -> list[tuple[int, int]]:
    """B2: random minute-aligned `[s, e)` ranges inside the span."""
    rng = random.Random(seed)
    n_min = horizon_ms // MINUTE_MS
    out = []
    for _ in range(n):
        a = rng.randrange(0, n_min)
        b = rng.randrange(a + 1, n_min + 1)
        out.append((watermark_ms + a * MINUTE_MS, watermark_ms + b * MINUTE_MS))
    return out


def gen_hour_ranges(
    watermark_ms: int,
    horizon_ms: int,
    n: int,
    seed: int = 43,
    replicate_ref_bug: bool = False,
) -> list[tuple[int, int]]:
    """B3: random hour-class ranges. With ``replicate_ref_bug`` the
    chosen hour counts are applied as minute offsets, reproducing the
    reference's skewed distribution for comparability."""
    rng = random.Random(seed)
    n_hours = horizon_ms // HOUR_MS
    unit = MINUTE_MS if replicate_ref_bug else HOUR_MS
    out = []
    for _ in range(n):
        a = rng.randrange(0, n_hours)
        b = rng.randrange(a + 1, n_hours + 1)
        out.append((watermark_ms + a * unit, watermark_ms + b * unit))
    return out


def latency_summary(latencies_ns: np.ndarray) -> dict:
    """min / p50 / p99 / p99.9 / p99.99 / p99.999 / max in µs (B4)."""
    us = latencies_ns / 1000.0
    summary = {"min_us": float(us.min()), "max_us": float(us.max())}
    for p in PERCENTILES:
        summary[f"p{p:g}_us"] = float(np.percentile(us, p))
    summary["count"] = int(len(us))
    return summary


@dataclass
class BenchResult:
    name: str
    wall_sec: float
    qps: float
    latency: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "wall_sec": self.wall_sec,
            "qps": self.qps,
            **self.latency,
        }


def run_latency_bench(
    name: str, fn, ranges: list[tuple[int, int]], warmup: int = 0
) -> BenchResult:
    """Run ``fn(s_ms, e_ms)`` per range, capturing per-query latency
    (B4) and batch QPS (B5). ``warmup`` untimed leading queries let the
    µs-class in-process paths measure steady state instead of
    first-call interpreter/cache warmup (the Spark-job paths don't use
    it — their per-query cost dwarfs warmup effects)."""
    for s, e in ranges[: max(0, warmup)]:
        fn(s, e)
    lat = np.empty(len(ranges), dtype=np.int64)
    t0 = time.perf_counter_ns()
    for i, (s, e) in enumerate(ranges):
        q0 = time.perf_counter_ns()
        fn(s, e)
        lat[i] = time.perf_counter_ns() - q0
    wall = (time.perf_counter_ns() - t0) / 1e9
    return BenchResult(
        name=name,
        wall_sec=wall,
        qps=len(ranges) / wall if wall > 0 else float("inf"),
        latency=latency_summary(lat),
    )
