from uwheel_datafusion_spark.bench.harness import (
    BenchResult,
    gen_hour_ranges,
    gen_minute_ranges,
    latency_summary,
    run_latency_bench,
)

__all__ = [
    "BenchResult",
    "gen_hour_ranges",
    "gen_minute_ranges",
    "latency_summary",
    "run_latency_bench",
]
