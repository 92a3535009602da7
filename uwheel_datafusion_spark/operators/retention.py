"""New-user cohort retention — served from the distinct-pair rollup.

The classic product-analytics matrix: bucket users by the day they
were FIRST seen (their cohort), then for each offset k report how many
of that cohort were active again on cohort_day + k. The 100 TB point
is that this never needs the fact table: the day-grain distinct
``(bucket_ms, key)`` pair partial (operators/distinct) already holds
exactly the activity set the computation consumes, so retention is a
self-join of the ROLLUP — input bounded by Σ per-day active users,
not by events. (The same rollup already serves distinct counts and
bottom-k feeds; this is the third aggregator over one partial — the
µWheel "one index, many aggregators" shape, SURVEY §1.3.)

Plan shape: one groupBy(key) for first-seen days (shuffle over pair
rows), one equi-join back on key, one groupBy(cohort, offset) — all
hash-partitionable, AQE-skew-splittable; offsets arrive as a small
broadcast literal frame via explode, so k offsets cost ONE join, not
k passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import DAY_MS


def cohort_retention_df(
    day_pairs: DataFrame, offsets_days: list[int]
) -> DataFrame:
    """Retention matrix from day-grain distinct pairs
    ``(bucket_ms, key)``: one row per (cohort day, offset) with the
    cohort size and the number retained (active exactly at
    cohort + offset days). Offsets must be ≥ 1; cohort = a key's first
    active day in the rollup's horizon. Cohort rows with zero retained
    users at an offset are kept (n_retained = 0) so the matrix is
    dense over cohorts × offsets — serving-friendly for dashboards."""
    assert all(k >= 1 for k in offsets_days)
    cohorts = day_pairs.groupBy("key").agg(
        F.min("bucket_ms").alias("cohort_ms")
    )
    sizes = cohorts.groupBy("cohort_ms").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    probes = cohorts.select(
        "key",
        "cohort_ms",
        F.explode(
            F.array(*[F.lit(k) for k in offsets_days])
        ).alias("offset_days"),
    )
    hits = probes.join(
        day_pairs.select(F.col("key"), F.col("bucket_ms").alias("_b")),
        "key",
        "inner",
    ).filter(
        F.col("_b")
        == F.col("cohort_ms") + F.col("offset_days") * F.lit(DAY_MS)
    )
    retained = hits.groupBy("cohort_ms", "offset_days").agg(
        F.count(F.lit(1)).alias("n_retained")
    )
    # dense grid via explode (map-only) — a crossJoin with a literal
    # offsets frame would plan a nested-loop join for nothing
    grid = sizes.select(
        "cohort_ms",
        "n_cohort",
        F.explode(F.array(*[F.lit(k) for k in offsets_days])).alias(
            "offset_days"
        ),
    )
    return (
        grid.join(retained, ["cohort_ms", "offset_days"], "left")
        .select(
            "cohort_ms",
            "offset_days",
            "n_cohort",
            F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
        )
    )


def cohort_retention_oracle(
    offsets_days: list[int],
    ts_lit_lo: str,
    ts_lit_hi: str,
    table: str = "events",
    key: str = "user_id",
) -> str:
    """DuckDB replay on raw rows: same first-seen cohorts, same dense
    cohort × offset grid."""
    offs = ", ".join(f"({k})" for k in offsets_days)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS bucket_ms,
                   {key} AS key
            FROM {table}
            WHERE ts >= {ts_lit_lo} AND ts < {ts_lit_hi}
        ),
        cohorts AS (
            SELECT key, MIN(bucket_ms) AS cohort_ms FROM pairs GROUP BY key
        ),
        sizes AS (
            SELECT cohort_ms, COUNT(*) AS n_cohort FROM cohorts GROUP BY cohort_ms
        ),
        offs(offset_days) AS (VALUES {offs}),
        retained AS (
            SELECT c.cohort_ms, o.offset_days, COUNT(*) AS n_retained
            FROM cohorts c
            JOIN offs o ON TRUE
            JOIN pairs p
              ON p.key = c.key
             AND p.bucket_ms = c.cohort_ms + o.offset_days * {DAY_MS}
            GROUP BY 1, 2
        )
        SELECT s.cohort_ms, o.offset_days, s.n_cohort,
               COALESCE(r.n_retained, 0) AS n_retained
        FROM sizes s
        JOIN offs o ON TRUE
        LEFT JOIN retained r
          ON r.cohort_ms = s.cohort_ms AND r.offset_days = o.offset_days
    """
