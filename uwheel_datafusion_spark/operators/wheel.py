"""WheelIndex — the PySpark-native Hierarchical Aggregation Wheel.

Reference semantics being reproduced (SURVEY §1.1, §4.2):

- ``RwWheel<F64SumAggregator>`` with minute/hour/day wheels, Keep
  retention, ``WheelMode::Index`` (/root/reference/src/main.rs:86-103);
- event-time **watermark**: entries with ts < watermark are rejected as
  late; ``advance(to)`` finalizes slots up to ``to``
  (/root/reference/src/main.rs:86-88,140);
- aggregator framework lift/combine/lower (SURVEY §1.3): we store the
  "all" partial ``(sum, count, min, max)`` per slot, from which
  sum/count/min/max/avg all lower — a strict superset of the
  reference's ``F64SumAggregator``.

Spark-first realization (NOT a translation of the Rust ring buffers):

- the minute rollup is ONE distributed ``groupBy`` over the fact table
  (map-side partial aggregation + one shuffle on the bucket key);
- hour and day rollups **re-aggregate the minute rollup** — this *is*
  µWheel's tick cascade (minute rotations combine into the hour wheel,
  /root/reference/src/main.rs:140), and it guarantees the cascade
  invariant exactly because the gated sums are associative scaled
  longs (see functions.quant);
- at 100 TB the rollups are tiny relative to the fact table (1 row per
  key-minute); they'd be written as parquet partitioned by UTC date so
  the distributed serving path gets partition pruning. Locally we
  cache() them;
- the serving fast path collects the *minute* rollup (44 640 rows for
  a 31-day span ≈ a few hundred KB — same footprint class as
  ``wheel.size_bytes()``, /root/reference/src/main.rs:144) to a NumPy
  prefix-sum index: O(1) per query, the analogue of
  ``WheelMode::Index`` + SIMD wheels (/root/reference/src/main.rs:146-148).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import micros_to_value, value_to_micros
from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    SECOND_MS,
    WEEK_MS,
    bucket_ms,
    ts_range_pred,
    ts_to_ms,
)
from uwheel_datafusion_spark.plans.range_plan import RangePlan, decompose_range

GRANULARITIES: dict[str, int] = {
    "second": SECOND_MS,  # opt-in (µWheel's seconds wheel): makes the
    # index self-sufficient for second-aligned sub-minute endpoints
    "minute": MINUTE_MS,
    "hour": HOUR_MS,
    "day": DAY_MS,
    "week": WEEK_MS,  # opt-in (µWheel's week wheel); 7-day epoch slots
}

#: rollup schema, one row per non-empty slot:
#: (bucket_ms long, sum_micros long, cnt long, min_value double, max_value double)
ROLLUP_COLS = ("bucket_ms", "sum_micros", "cnt", "min_value", "max_value")


def _bucket_range_pred(df: DataFrame, s_ms: int, e_ms: int):
    """``bucket_ms ∈ [s, e)`` predicate; when the rollup carries the
    ``dt`` partition column (a reopened on-disk index, partitioned by
    UTC date in ``save``), conjoin the equivalent static date-range so
    Catalyst prunes day partitions at planning time — bucket_ms alone
    only skips row groups AFTER listing every partition, which is the
    difference between O(days-touched) and O(all-days) file listings at
    100 TB. Sound for any granularity: a bucket in [s, e) starts in
    [date(s), date(e-1)]."""
    pred = (F.col("bucket_ms") >= s_ms) & (F.col("bucket_ms") < e_ms)
    if "dt" in df.columns and e_ms > s_ms:
        from datetime import datetime, timezone

        lo = datetime.fromtimestamp(s_ms / 1000, tz=timezone.utc)
        hi = datetime.fromtimestamp((e_ms - 1) / 1000, tz=timezone.utc)
        pred = (
            pred
            & (F.col("dt") >= lo.strftime("%Y-%m-%d"))
            & (F.col("dt") <= hi.strftime("%Y-%m-%d"))
        )
    return pred


@dataclass
class BuildStats:
    """Build-time observability (B6/B7 in SURVEY §2.11)."""

    n_input_rows: int
    n_late_rows: int  # ts < watermark — rejected, like µWheel late inserts
    n_ahead_rows: int  # ts >= advanced watermark — buffered, not finalized
    n_indexed_rows: int
    slot_counts: dict[str, int]
    # late/ahead are −1 under stats_mode="pruned" (never scanned);
    # n_input_rows then counts only the scanned (indexed) rows


class WheelIndex:
    """Multi-granularity pre-aggregated temporal index over one
    (timestamp, value) pair of a fact DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        rollups: dict[str, DataFrame],
        watermark_ms: int,
        advanced_ms: int,
        stats: BuildStats,
    ) -> None:
        self.spark = spark
        self.rollups = rollups
        self.watermark_ms = watermark_ms  # watermark₀ (low)
        self.advanced_ms = advanced_ms  # watermark after advance()
        self.stats = stats
        self._driver_index = None
        self._probe_sql = None  # lazily set by probe()
        self._serving_views: list[str] = []

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        df: DataFrame,
        ts_col: str,
        value_col: str,
        watermark_ms: int,
        advance_to_ms: int,
        granularities: tuple[str, ...] = ("minute", "hour", "day"),
        cache: bool = True,
        stats_mode: str = "tagged",
    ) -> "WheelIndex":
        """E1 of SURVEY §3: fact table → rollups under watermark semantics.

        ``watermark_ms`` is the initial low watermark (rows below it are
        late ⇒ dropped & counted); ``advance_to_ms`` plays
        ``wheel.advance(31.days())`` (/root/reference/src/main.rs:140):
        only rows with ts < advance_to_ms are finalized into slots; rows
        at/after it are "write-ahead" (counted, not indexed).

        ``ts_col`` is a TIMESTAMP or TIMESTAMP_NTZ column; range
        predicates are built flavor-matched (``ts_range_pred``) so they
        push down to parquet row-group stats — the difference between
        scanning one month and scanning 100 TB.

        ``stats_mode``:

        - ``"tagged"`` (default): ONE scan + ONE shuffle builds the
          rollup AND the exact late/ahead counts — late/ahead rows are
          tagged into sentinel buckets (−1/−2) in the same aggregation
          (the reference's build also sees every row: it must attempt
          the insert to reject it, /root/reference/src/main.rs:128-138).
        - ``"pruned"``: the watermark range is pushed into the scan, so
          only the indexed horizon is read — the right choice at 100 TB
          when the table spans far more history than the index, at the
          cost of late/ahead counts (reported as −1 = unknown).
        """
        spark = df.sparkSession
        if "minute" not in granularities:
            raise ValueError("the minute granularity is the cascade base")
        if stats_mode not in ("tagged", "pruned"):
            raise ValueError("stats_mode must be 'tagged' or 'pruned'")
        # opt-in seconds wheel: the scan buckets at the finest grain and
        # every coarser level cascades from it (minute from second) —
        # still ONE scan + ONE shuffle; the extra level only adds cheap
        # re-aggregations of an already-tiny rollup
        base_ms = SECOND_MS if "second" in granularities else MINUTE_MS

        ms = ts_to_ms(F.col(ts_col))

        if stats_mode == "pruned":
            scan = df.filter(
                ts_range_pred(df, ts_col, watermark_ms, advance_to_ms)
            )
            bucket = bucket_ms(ms, base_ms)
        else:
            scan = df
            bucket = (
                F.when(ms < watermark_ms, F.lit(-1))
                .when(ms >= advance_to_ms, F.lit(-2))
                .otherwise(bucket_ms(ms, base_ms))
                .cast("long")
            )

        # the single distributed scan+shuffle of the build: minute
        # rollup, with late/ahead rows folded into sentinel buckets
        tagged = (
            scan.select(
                bucket.alias("bucket_ms"),
                value_to_micros(F.col(value_col).cast("double")).alias("v_micros"),
                F.col(value_col).cast("double").alias("value"),
            )
            .groupBy("bucket_ms")
            .agg(
                F.sum("v_micros").alias("sum_micros"),
                F.count(F.lit(1)).alias("cnt"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .cache()
        )
        sentinels = {
            r["bucket_ms"]: r["cnt"]
            for r in tagged.filter(F.col("bucket_ms") < 0).collect()
        }
        base = tagged.filter(F.col("bucket_ms") >= 0)
        if stats_mode == "tagged":
            n_late = int(sentinels.get(-1, 0))
            n_ahead = int(sentinels.get(-2, 0))
        else:
            n_late = n_ahead = -1  # unknown: late/ahead never scanned

        base_name = "second" if base_ms == SECOND_MS else "minute"
        rollups: dict[str, DataFrame] = {base_name: base}
        # cascade: minute from second, hour from minute, day from hour
        # (tick/rotate, A4)
        prev = base_name
        for g in ("minute", "hour", "day", "week"):
            if g not in granularities or g == base_name:
                continue
            rollups[g] = cls._reaggregate(rollups[prev], GRANULARITIES[g])
            prev = g

        if cache:
            for g in rollups:
                # rollups are tiny regardless of fact-table size (one
                # row per non-empty slot — ~0.5M rows/year at minute
                # grain, a few MB cached): serve each from ONE partition
                # so a range probe is a single task per part instead of
                # 32 near-empty task launches (measured 211→130 ms/probe
                # at sf0.1; the driver index stays the µs-latency path)
                rollups[g] = rollups[g].coalesce(1).cache()

        slot_counts = {g: r.count() for g, r in rollups.items()}
        n_indexed = (
            rollups["minute"].agg(F.sum("cnt")).first()[0] or 0
        )  # tiny job over the cached rollup
        n_input = (
            n_indexed + n_late + n_ahead if stats_mode == "tagged" else n_indexed
        )
        stats = BuildStats(
            n_input_rows=int(n_input),
            n_late_rows=n_late,
            n_ahead_rows=n_ahead,
            n_indexed_rows=int(n_indexed),
            slot_counts=slot_counts,
        )
        return cls(spark, rollups, watermark_ms, advance_to_ms, stats)

    @staticmethod
    def _reaggregate(finer: DataFrame, coarser_slot_ms: int) -> DataFrame:
        """Combine finer partials into coarser slots (pure partial-merge:
        sum-of-sums, min-of-mins — SURVEY §1.3)."""
        return (
            finer.groupBy(
                bucket_ms(F.col("bucket_ms"), coarser_slot_ms).alias("bucket_ms")
            )
            .agg(
                F.sum("sum_micros").alias("sum_micros"),
                F.sum("cnt").alias("cnt"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )

    # ----------------------------------------------------- incremental extend

    def extend(
        self,
        new_df: DataFrame,
        ts_col: str,
        value_col: str,
        advance_to_ms: int,
        stats_mode: str = "tagged",
    ) -> "WheelIndex":
        """Incremental maintenance — the reference wheel's
        insert-then-advance cycle (/root/reference/src/main.rs:128-140)
        in batch form: absorb a new chunk and advance the watermark to
        ``advance_to_ms`` WITHOUT rebuilding history.

        Rows below the current advanced watermark are late (dropped &
        counted, same as the wheel rejecting inserts under the
        watermark); rows at/after ``advance_to_ms`` stay write-ahead.
        Because every slot is a monoid partial (sum/cnt/min/max), the
        merge is a union + re-combine per granularity — cost ∝ slot
        counts (a few thousand rows) + one scan of the NEW chunk only.
        At 100 TB this is the nightly-ingest path: each day indexes one
        day of new data, never re-reading the indexed history.

        Note: the batch build only COUNTS write-ahead rows (it does not
        buffer them like the wheel's write-ahead ring), so rows beyond
        a previous build's horizon must be part of ``new_df``."""
        if advance_to_ms < self.advanced_ms:
            raise ValueError("watermark can only advance forward")
        delta = WheelIndex.build(
            new_df,
            ts_col,
            value_col,
            watermark_ms=self.advanced_ms,
            advance_to_ms=advance_to_ms,
            granularities=tuple(self.rollups),
            cache=False,
            stats_mode=stats_mode,
        )
        merged: dict[str, DataFrame] = {}
        for g in self.rollups:
            merged[g] = (
                # normalize to the core columns: a loaded index carries
                # the dt partition column, a fresh delta does not
                self.rollups[g]
                .select(*ROLLUP_COLS)
                .unionByName(delta.rollups[g].select(*ROLLUP_COLS))
                .groupBy("bucket_ms")
                .agg(
                    F.sum("sum_micros").alias("sum_micros"),
                    F.sum("cnt").alias("cnt"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
                .coalesce(1)
                .cache()
            )
        slot_counts = {g: r.count() for g, r in merged.items()}
        n_indexed = self.stats.n_indexed_rows + delta.stats.n_indexed_rows
        unknown = self.stats.n_late_rows < 0 or delta.stats.n_late_rows < 0
        stats = BuildStats(
            n_input_rows=(
                -1 if unknown else self.stats.n_input_rows + delta.stats.n_input_rows
            ),
            n_late_rows=(
                -1 if unknown else self.stats.n_late_rows + delta.stats.n_late_rows
            ),
            n_ahead_rows=delta.stats.n_ahead_rows,
            n_indexed_rows=n_indexed,
            slot_counts=slot_counts,
        )
        return WheelIndex(
            self.spark, merged, self.watermark_ms, advance_to_ms, stats
        )

    def backfill(
        self,
        df: DataFrame,
        ts_col: str,
        value_col: str,
        start_ms: int,
        end_ms: int,
        stats_mode: str = "pruned",
    ) -> "WheelIndex":
        """Reprocess HISTORY: replace the indexed content of
        ``[start, end)`` with a fresh build over ``df`` — the
        "yesterday's data was corrected, re-run day X" lifecycle op
        that extend (forward-only) cannot express. Because every slot
        is a monoid partial keyed by ``bucket_ms``, the splice is
        per-granularity row surgery: keep old rows outside the window,
        take patch rows inside — no history re-scan, cost ∝ slot
        counts + one scan of the PATCH rows (pushdown-pruned to the
        window).

        ``[start, end)`` must lie inside the indexed horizon and align
        to the COARSEST granularity's slots (minute|hour|day|week each
        divide the next, so coarsest alignment implies all): a
        straddled coarse slot would mix old and new facts that a
        partial cannot split. Backfilling with an empty/filtered ``df``
        zeroes the window (slots become absent — the wheel's empty
        representation)."""
        from uwheel_datafusion_spark.functions.time import GRANULARITY_MS

        coarsest = max(GRANULARITY_MS[g] for g in self.rollups)
        if start_ms % coarsest or end_ms % coarsest:
            raise ValueError(
                f"backfill window must align to the coarsest slot "
                f"({coarsest} ms)"
            )
        if start_ms < self.watermark_ms or end_ms > self.advanced_ms:
            raise ValueError("backfill window outside the indexed horizon")
        if start_ms >= end_ms:
            raise ValueError("empty backfill window")
        patch = WheelIndex.build(
            df,
            ts_col,
            value_col,
            watermark_ms=start_ms,
            advance_to_ms=end_ms,
            granularities=tuple(self.rollups),
            cache=False,
            stats_mode=stats_mode,
        )
        merged: dict[str, DataFrame] = {}
        for g in self.rollups:
            keep = self.rollups[g].select(*ROLLUP_COLS).filter(
                (F.col("bucket_ms") < start_ms)
                | (F.col("bucket_ms") >= end_ms)
            )
            merged[g] = (
                keep.unionByName(patch.rollups[g].select(*ROLLUP_COLS))
                .coalesce(1)
                .cache()
            )
        slot_counts = {g: r.count() for g, r in merged.items()}
        n_indexed = (
            merged["minute"].agg(F.sum("cnt")).first()[0] or 0
        )
        stats = BuildStats(
            n_input_rows=-1,  # unknown: history inputs not re-observed
            n_late_rows=-1,
            n_ahead_rows=patch.stats.n_ahead_rows,
            n_indexed_rows=int(n_indexed),
            slot_counts=slot_counts,
        )
        return WheelIndex(
            self.spark, merged, self.watermark_ms, self.advanced_ms, stats
        )

    # ------------------------------------------------------------ query paths

    def plan(self, start_ms: int, end_ms: int) -> RangePlan:
        """A6 ``explain_combine_range`` analogue."""
        start_ms = max(start_ms, self.watermark_ms)
        end_ms = min(end_ms, self.advanced_ms)
        return decompose_range(start_ms, end_ms, tuple(self.rollups))

    #: below this many minute slots, a single filter+agg over the
    #: (cached) minute rollup beats the multi-granularity union plan —
    #: the union's extra stages cost more than scanning a few thousand
    #: in-memory rows. Above it (or for parquet-backed rollups at huge
    #: horizons) the decomposition's coarse runs win.
    SINGLE_LEVEL_SLOT_THRESHOLD = 200_000

    def range_agg_df(self, start_ms: int, end_ms: int) -> DataFrame:
        """Distributed serving path: decompose the range, filter each
        rollup to its runs (partition-prunable range predicates on the
        bucket key), union the partials, combine, lower. Short ranges
        take a cost-based single-level shortcut (one filter+agg job on
        the minute rollup).

        Returns a 1-row DataFrame
        ``(sum_value double, cnt long, min_value double, max_value
        double, avg_value double)`` with nulls for an empty range —
        matching A5's ``Option<f64>`` semantics.
        """
        s = max(start_ms, self.watermark_ms)
        e = min(end_ms, self.advanced_ms)
        if (
            s < e
            and s % MINUTE_MS == 0
            and e % MINUTE_MS == 0
            and (e - s) // MINUTE_MS <= self.SINGLE_LEVEL_SLOT_THRESHOLD
        ):
            parts = [
                self.rollups["minute"]
                .filter(_bucket_range_pred(self.rollups["minute"], s, e))
                .select("sum_micros", "cnt", "min_value", "max_value")
            ]
            return self._combine_parts(parts)
        plan = self.plan(start_ms, end_ms)
        parts: list[DataFrame] = []
        for run in plan.runs:
            r = self.rollups[run.granularity]
            parts.append(
                r.filter(
                    _bucket_range_pred(r, run.start_ms, run.end_ms)
                ).select("sum_micros", "cnt", "min_value", "max_value")
            )
        return self._combine_parts(parts)

    def _combine_parts(self, parts: list[DataFrame]) -> DataFrame:
        """Union partial frames, combine, lower (A5's combine+lower)."""
        if not parts:
            parts = [
                self.spark.range(0).select(
                    F.lit(None).cast("long").alias("sum_micros"),
                    F.lit(None).cast("long").alias("cnt"),
                    F.lit(None).cast("double").alias("min_value"),
                    F.lit(None).cast("double").alias("max_value"),
                )
            ]
        unioned = reduce(DataFrame.unionByName, parts)
        combined = unioned.agg(
            F.sum("sum_micros").alias("sum_micros"),
            F.sum("cnt").alias("cnt"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        return combined.select(
            micros_to_value(F.col("sum_micros")).alias("sum_value"),
            F.col("cnt"),
            F.col("min_value"),
            F.col("max_value"),
            (
                F.col("sum_micros").cast("double") / F.col("cnt").cast("double") / 1e6
            ).alias("avg_value"),
        )

    # ------------------------------------------------- low-latency serving

    def probe(self, start_ms: int, end_ms: int):
        """Single-query low-latency distributed probe: ONE parameterized
        SQL statement over pre-registered temp views of the rollups,
        ``.first()``-ed. Versus building a fresh DataFrame per query
        (range_agg_df), this cuts the per-probe Python/Catalyst work to
        one py4j call and lets Spark reuse the analyzed view subtrees
        (measured ~150 ms → ~85 ms p50 at sf0.1; the residual is the
        irreducible per-JOB cost — scheduler + task launch + result
        fetch — which is why a serving tier should batch, see
        range_agg_batch_df).

        Both statements are FIXED across queries (plan shape reuse),
        chosen cost-based like range_agg_df's shortcut:

        - short ranges (≤ SINGLE_LEVEL_SLOT_THRESHOLD minute slots):
          one filter+agg over the minute-rollup view — the fastest
          single-job plan (one scan, one task on a cached rollup);
        - wide ranges: a static UNION ALL with TWO bind-parameter
          windows per granularity. The greedy decomposition yields at
          most two runs per level (one from the prefix chain, one from
          the suffix), so this one statement expresses EVERY aligned
          range — unused windows bind to the empty [0, 0). A
          multi-year horizon thus probes hundreds of coarse slots, not
          hundreds of thousands of minute slots.

        Endpoints are clamped to the horizon and must be minute-aligned
        (the index contract, SURVEY §4.2). Returns a Row (sum_value,
        cnt, min_value, max_value, avg_value) with nulls for an empty
        range."""
        s = max(start_ms, self.watermark_ms)
        e = min(end_ms, self.advanced_ms)
        if s % MINUTE_MS or e % MINUTE_MS:
            raise ValueError("probe() serves minute-aligned ranges only")
        outer = (
            "SELECT CAST(SUM(sum_micros) AS DOUBLE)/1e6 AS sum_value, "
            "SUM(cnt) AS cnt, MIN(min_value) AS min_value, "
            "MAX(max_value) AS max_value, "
            "CAST(SUM(sum_micros) AS DOUBLE)/CAST(SUM(cnt) AS DOUBLE)/1e6 "
            "AS avg_value FROM "
        )
        if self._probe_sql is None:
            # uuid, not id(self): Python reuses object ids after GC, and
            # a collision would silently rebind a cached SQL text to
            # another index's views. Views persist for the session; a
            # rebuild-heavy serving process should drop_serving_views()
            # on retired indexes.
            import uuid

            tag = uuid.uuid4().hex[:12]
            self._serving_views = []
            selects = []
            for g in self.rollups:
                view = f"wheel_{g}_serving_{tag}"
                self.rollups[g].createOrReplaceTempView(view)
                self._serving_views.append(view)
                selects.append(
                    "SELECT sum_micros, cnt, min_value, max_value "
                    f"FROM {view} WHERE "
                    f"(bucket_ms >= :{g}_s1 AND bucket_ms < :{g}_e1) "
                    f"OR (bucket_ms >= :{g}_s2 AND bucket_ms < :{g}_e2)"
                )
            self._probe_sql = {
                "single": (
                    outer
                    + f"wheel_minute_serving_{tag} "
                    "WHERE bucket_ms >= :s AND bucket_ms < :e"
                ),
                "multi": outer + "(" + " UNION ALL ".join(selects) + ")",
            }
        if (
            e <= s
            or (e - s) // MINUTE_MS <= self.SINGLE_LEVEL_SLOT_THRESHOLD
        ):
            return self.spark.sql(
                self._probe_sql["single"], args={"s": s, "e": max(e, s)}
            ).first()
        args = {}
        for g in self.rollups:
            for i in (1, 2):
                args[f"{g}_s{i}"] = 0
                args[f"{g}_e{i}"] = 0
        by_g: dict[str, list] = {}
        for run in self.plan(s, e).runs:
            by_g.setdefault(run.granularity, []).append(run)
        for g, runs in by_g.items():
            # invariant of the greedy planner (prefix + suffix)
            assert len(runs) <= 2, (g, runs)
            for i, run in enumerate(runs, 1):
                args[f"{g}_s{i}"] = run.start_ms
                args[f"{g}_e{i}"] = run.end_ms
        return self.spark.sql(self._probe_sql["multi"], args=args).first()

    def drop_serving_views(self) -> None:
        """Unregister this index's probe temp views (call when retiring
        an index in a rebuild-heavy serving process — views otherwise
        live until the session ends)."""
        for v in self._serving_views:
            self.spark.catalog.dropTempView(v)
        self._serving_views = []
        self._probe_sql = None

    def range_agg_batch_df(
        self, ranges: "list[tuple[int, int]]"
    ) -> DataFrame:
        """Micro-batched serving — the throughput shape for a cluster
        answering from rollup tables: N range queries in ONE Spark job.
        Per-query Spark jobs pay a flat ~50-100 ms scheduler/launch
        cost no matter how small the scan (measured: count() on a
        cached 1-row frame has the same p50 as a full probe); batching
        amortizes that across the whole query set, the same way the
        reference amortizes per-query cost by keeping everything in
        one process (/root/reference/src/main.rs:205-288).

        Plan: each range is decomposed (A6) into per-granularity runs
        driver-side (pure arithmetic); each run is expanded into the
        coarse TIME BLOCKS it touches (64-slot blocks, still
        driver-side and bounded), so the rollup joins its runs with a
        broadcast HASH join on block id plus a containment residual —
        never a nested-loop over rows × runs (a 256-query batch over a
        38 k-slot rollup would otherwise do ~20 M comparisons in one
        task). Partials union and fold per query_id. One job, any
        number of queries; rollup-side work is bounded by slots ×
        runs-per-block, never fact rows.

        Returns one row per input range, in input order:
        ``(query_id int, sum_value, cnt, min_value, max_value,
        avg_value)`` with nulls for empty ranges (A5 Option
        semantics)."""
        BLOCK_SLOTS = 64
        runs_by_gran: dict[str, list[tuple[int, int, int]]] = {}
        for qid, (s, e) in enumerate(ranges):
            for run in self.plan(s, e).runs:
                runs_by_gran.setdefault(run.granularity, []).append(
                    (qid, run.start_ms, run.end_ms)
                )
        qids = self.spark.createDataFrame(
            [(i,) for i in range(len(ranges))], "query_id int"
        )
        parts: list[DataFrame] = []
        for g, g_runs in runs_by_gran.items():
            block_ms = GRANULARITIES[g] * BLOCK_SLOTS
            blocked = [
                (qid, rs, re, b)
                for qid, rs, re in g_runs
                for b in range(rs // block_ms, (re - 1) // block_ms + 1)
            ]
            rdf = self.spark.createDataFrame(
                blocked, "query_id int, run_s long, run_e long, block long"
            )
            r2 = self.rollups[g].withColumn(
                "block", F.floor(F.col("bucket_ms") / F.lit(block_ms)).cast("long")
            )
            parts.append(
                r2.join(
                    F.broadcast(rdf),
                    (r2["block"] == rdf["block"])
                    & (r2["bucket_ms"] >= rdf["run_s"])
                    & (r2["bucket_ms"] < rdf["run_e"]),
                ).select("query_id", "sum_micros", "cnt", "min_value", "max_value")
            )
        if not parts:
            return qids.select(
                "query_id",
                F.lit(None).cast("double").alias("sum_value"),
                F.lit(None).cast("long").alias("cnt"),
                F.lit(None).cast("double").alias("min_value"),
                F.lit(None).cast("double").alias("max_value"),
                F.lit(None).cast("double").alias("avg_value"),
            )
        unioned = reduce(DataFrame.unionByName, parts)
        agg = unioned.groupBy("query_id").agg(
            F.sum("sum_micros").alias("sum_micros"),
            F.sum("cnt").alias("cnt"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        # orderBy makes the documented input-order contract REAL: the
        # left join's output order is partitioning-dependent (caught by
        # the sf100 scale run's dual check — small SFs happened to come
        # back ordered, 32-partition shuffles at scale do not)
        return (
            qids.join(agg, "query_id", "left")
            .select(
                "query_id",
                micros_to_value(F.col("sum_micros")).alias("sum_value"),
                F.col("cnt"),
                F.col("min_value"),
                F.col("max_value"),
                (
                    F.col("sum_micros").cast("double")
                    / F.col("cnt").cast("double")
                    / 1e6
                ).alias("avg_value"),
            )
            .orderBy("query_id")
        )

    def range_agg_hybrid_df(
        self,
        fact_df: DataFrame,
        ts_col: str,
        value_col: str,
        start_ms: int,
        end_ms: int,
    ) -> DataFrame:
        """Serving path for **unaligned** endpoints (SURVEY §4.2: µWheel
        answers sub-minute edges from its seconds wheel).

        Without a seconds rollup, ragged edges come from a pushdown
        scan of the fact table covering < 2 minutes each — with parquet
        row-group pruning on the timestamp they read a sliver of the
        table no matter how big it is; the aligned interior (the bulk
        of the range) never touches the fact table. With the opt-in
        ``"second"`` granularity the sub-minute edges are served from
        the seconds rollup instead, and only sub-SECOND residue (< 2
        seconds) falls back to the fact scan — second-aligned endpoints
        make the index fully self-sufficient, µWheel's behavior.
        """
        from uwheel_datafusion_spark.plans.range_plan import decompose_hybrid

        start_ms = max(start_ms, self.watermark_ms)
        end_ms = min(end_ms, self.advanced_ms)
        hplan = decompose_hybrid(start_ms, end_ms, tuple(self.rollups))

        parts: list[DataFrame] = []
        for s, e in hplan.edge_scans:
            pred = ts_range_pred(fact_df, ts_col, s, e)
            parts.append(
                fact_df.filter(pred)
                .select(F.col(value_col).cast("double").alias("value"))
                .agg(
                    F.sum(value_to_micros(F.col("value"))).alias("sum_micros"),
                    F.count(F.col("value")).alias("cnt"),
                    F.min("value").alias("min_value"),
                    F.max("value").alias("max_value"),
                )
            )
        if hplan.interior is not None:
            for run in hplan.interior.runs:
                parts.append(
                    self.rollups[run.granularity]
                    .filter(
                        _bucket_range_pred(
                            self.rollups[run.granularity],
                            run.start_ms,
                            run.end_ms,
                        )
                    )
                    .select("sum_micros", "cnt", "min_value", "max_value")
                )
        return self._combine_parts(parts)

    def explain(self, start_ms: int, end_ms: int) -> str:
        """A6 for ANY range: aligned endpoints explain as the
        multi-granularity decomposition; ragged endpoints explain as
        the hybrid plan (edge scans + aligned interior) that
        ``range_agg_hybrid_df`` executes."""
        from uwheel_datafusion_spark.plans.range_plan import decompose_hybrid

        s = max(start_ms, self.watermark_ms)
        e = min(end_ms, self.advanced_ms)
        fine_ms = min(GRANULARITIES[g] for g in self.rollups)
        if s % fine_ms == 0 and e % fine_ms == 0:
            return self.plan(start_ms, end_ms).describe()
        return decompose_hybrid(s, e, tuple(self.rollups)).describe()

    def topn_slots_df(
        self,
        granularity: str,
        n: int,
        start_ms: int | None = None,
        end_ms: int | None = None,
    ) -> DataFrame:
        """A8: µWheel's top-N aggregator class, re-expressed over the
        rollups — the N heaviest slots by SUM within ``[start, end)``
        (uwheel 0.1.2 ships top-N aggregators; the reference binary
        never exercises them, SURVEY §2.4 A8). Exact integer ordering
        on the scaled-long sum + bucket tie-break ⇒ deterministic.

        Scales as a top-k over the (tiny) rollup, not the fact table:
        Spark runs it as per-partition TakeOrdered + driver merge — no
        full sort, no extra shuffle."""
        s = self.watermark_ms if start_ms is None else max(start_ms, self.watermark_ms)
        e = self.advanced_ms if end_ms is None else min(end_ms, self.advanced_ms)
        r = self.rollups[granularity].filter(
            _bucket_range_pred(self.rollups[granularity], s, e)
        )
        return (
            r.orderBy(F.col("sum_micros").desc(), F.col("bucket_ms"))
            .limit(n)
            .select(
                F.col("bucket_ms"),
                micros_to_value(F.col("sum_micros")).alias("sum_value"),
                F.col("cnt"),
            )
        )

    def rollup_df(self, granularity: str) -> DataFrame:
        """The rollup table itself, lowered to user-facing columns."""
        r = self.rollups[granularity]
        return r.select(
            F.col("bucket_ms"),
            micros_to_value(F.col("sum_micros")).alias("sum_value"),
            F.col("cnt"),
            F.col("min_value"),
            F.col("max_value"),
            (
                F.col("sum_micros").cast("double") / F.col("cnt").cast("double") / 1e6
            ).alias("avg_value"),
        )

    def gapfill_rollup_df(self, granularity: str) -> DataFrame:
        """Gap-filled (densified) rollup: exactly one row per slot of
        the indexed horizon — empty slots surface as cnt=0 / NULL
        aggregates (the identity-slot semantics of §4.2: the wheel's
        ring buffer is gap-free even when no entry hit a slot) — plus
        a last-observation-carried-forward ``sum_locf`` column
        (TimescaleDB's ``time_bucket_gapfill`` + ``locf``).

        Scale note: the LOCF window here is a single global ordered
        window — fine for rollups (one row per slot, ≤ ~0.5M/year at
        minute grain, far below window-task limits). If a horizon ever
        outgrew one task, the standard fix is per-UTC-day partitioned
        LOCF plus a broadcast fix-up of each day's last value.
        """
        gms = GRANULARITIES[granularity]
        n = (self.advanced_ms - self.watermark_ms) // gms
        slots = self.spark.range(0, n).select(
            (F.lit(self.watermark_ms) + F.col("id") * gms)
            .cast("long")
            .alias("bucket_ms")
        )
        from pyspark.sql import Window

        filled = slots.join(self.rollup_df(granularity), "bucket_ms", "left")
        w = Window.orderBy("bucket_ms").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return filled.select(
            "bucket_ms",
            "sum_value",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            "min_value",
            "max_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_locf"),
        )

    def detect_gaps_df(self, min_gap_ms: int, granularity: str = "minute") -> DataFrame:
        """Absence detection (heartbeat/outage monitoring): maximal
        runs of EMPTY slots spanning at least ``min_gap_ms`` — read
        straight off the rollup's occupied slots (a gap is the distance
        between consecutive non-empty slots, plus the horizon edges),
        so detection cost is slot rows, never fact rows.

        Detection is slot-quantized: a slot containing any event counts
        as fully covered, so true silence straddling occupied slots can
        be under-measured by up to ``2 * granularity`` (e.g. events at
        10:00:00 and 10:15:59 leave a 14-minute slot gap even though
        the real silence is 15m59s). For a guaranteed-detection
        threshold of T, pass ``min_gap_ms = T - 2 * g_ms``. Returns
        ``(gap_start_ms, gap_end_ms, gap_ms)`` ordered by start."""
        from pyspark.sql import Window

        g_ms = GRANULARITIES[granularity]
        r = self.rollups[granularity].select("bucket_ms")
        # sentinel edges: a virtual slot just before the watermark and
        # just after the horizon so leading/trailing silence surfaces
        edges = self.spark.createDataFrame(
            [(self.watermark_ms - g_ms,), (self.advanced_ms,)],
            "bucket_ms long",
        )
        w = Window.orderBy("bucket_ms")
        slots = r.unionByName(edges).select(
            (F.col("bucket_ms") + g_ms).alias("covered_end"),
            F.lead("bucket_ms").over(w).alias("next_start"),
        )
        return (
            slots.filter(
                F.col("next_start") - F.col("covered_end") >= min_gap_ms
            )
            .select(
                F.col("covered_end").alias("gap_start_ms"),
                F.col("next_start").alias("gap_end_ms"),
                (F.col("next_start") - F.col("covered_end")).alias("gap_ms"),
            )
            .orderBy("gap_start_ms")
        )

    # ------------------------------------------------------- driver fast path

    def to_driver_index(self):
        """Collect the minute rollup into the O(1) NumPy serving index
        (benchmark path; µWheel latency class)."""
        from uwheel_datafusion_spark.operators.driver_index import DriverWheelIndex

        if self._driver_index is None:
            rows = self.rollups["minute"].select(*ROLLUP_COLS).collect()
            self._driver_index = DriverWheelIndex.from_minute_rows(
                rows, self.watermark_ms, self.advanced_ms
            )
        return self._driver_index

    def size_bytes(self) -> int:
        """Index footprint (B6, cf. ``wheel.size_bytes()``
        /root/reference/src/main.rs:144)."""
        idx = self.to_driver_index()
        return idx.size_bytes()

    # ------------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Persist rollups as parquet, partitioned by UTC date — at
        scale this gives the distributed serving path partition pruning
        on day boundaries (PLANS.md). Metadata (watermarks, stats)
        rides along as JSON."""
        import json
        import os

        for g, r in self.rollups.items():
            (
                r.withColumn(
                    "dt",
                    F.date_format(
                        F.timestamp_millis(F.col("bucket_ms")), "yyyy-MM-dd"
                    ),
                )
                .repartition("dt")
                .write.mode("overwrite")
                .partitionBy("dt")
                .parquet(os.path.join(path, f"agg_{g}"))
            )
        meta = {
            "watermark_ms": self.watermark_ms,
            "advanced_ms": self.advanced_ms,
            "granularities": list(self.rollups),
            "stats": {
                "n_input_rows": self.stats.n_input_rows,
                "n_late_rows": self.stats.n_late_rows,
                "n_ahead_rows": self.stats.n_ahead_rows,
                "n_indexed_rows": self.stats.n_indexed_rows,
                "slot_counts": self.stats.slot_counts,
            },
        }
        with open(os.path.join(path, "wheel_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "WheelIndex":
        """Reopen a persisted index (no rebuild — the rollups are the
        index)."""
        import json
        import os

        with open(os.path.join(path, "wheel_meta.json")) as f:
            meta = json.load(f)
        # keep the dt partition column: _bucket_range_pred uses it to
        # turn range probes into static partition pruning
        rollups = {
            g: spark.read.parquet(os.path.join(path, f"agg_{g}")).select(
                *ROLLUP_COLS, "dt"
            )
            for g in meta["granularities"]
        }
        st = meta["stats"]
        stats = BuildStats(
            n_input_rows=st["n_input_rows"],
            n_late_rows=st["n_late_rows"],
            n_ahead_rows=st["n_ahead_rows"],
            n_indexed_rows=st["n_indexed_rows"],
            slot_counts={k: int(v) for k, v in st["slot_counts"].items()},
        )
        return cls(spark, rollups, meta["watermark_ms"], meta["advanced_ms"], stats)
