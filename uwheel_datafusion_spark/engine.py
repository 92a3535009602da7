"""WheelEngine — the one-call serving facade.

The reference is used in two calls: register a parquet table, then
query it (src/main.rs:45-46 registration, :205-288 wheel/SQL paths).
This module gives the Spark engine the same surface: one
``register_table`` call builds every serving layer the caller asks
for — the wheel index (driver O(1) + distributed rollups), the
histogram quantile rollup, exact distinct pairs, count pairs for
top-k, and the keyed per-series rollups — and wires them all into a
single :class:`WheelSqlRouter`, so ``engine.sql("...")`` answers any
recognized shape from an index/rollup and falls back to full Catalyst
for the rest. A user of the reference switches by replacing its two
calls with these two.

Everything here is composition — each layer keeps its own module as
the source of truth (operators/wheel, quantile_rollup, distinct,
keyed_wheel; plans/sql_router); the facade only decides WHICH layers
to build and holds the handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.plans.sql_router import WheelSqlRouter


class WheelEngine:
    """Facade over the full serving stack.

    >>> eng = WheelEngine(spark)
    >>> eng.register_table(
    ...     "events", events_df, ts_col="ts", value_col="value",
    ...     watermark_ms=WM, advance_to_ms=ADV,
    ...     distinct_col="user_id", count_key_col="user_id",
    ...     key_col="event_type", quantiles=True,
    ... )
    >>> eng.sql("SELECT SUM(value) FROM events WHERE ts >= '…' AND ts < '…'")
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.router = WheelSqlRouter(spark)
        self._indexes: dict[str, WheelIndex] = {}
        #: table → {family: rollup frame} — handles for batch()
        self._layers: dict[str, dict] = {}

    def register_table(
        self,
        table: str,
        df: "DataFrame | str",
        *,
        ts_col: str,
        watermark_ms: int,
        advance_to_ms: int,
        value_col: str | None = None,
        key_col: str | None = None,
        distinct_col: str | None = None,
        count_key_col: str | None = None,
        quantiles: bool = False,
        ohlc: bool = False,
        twa: bool = False,
        counter: bool = False,
        granularities: "tuple[str, ...] | None" = None,
        cache: bool = True,
    ) -> "WheelEngine":
        """Build and wire every requested serving layer for ``table``.

        - ``value_col`` → wheel index (scalar + GROUP BY date_trunc
          rewrites, minute through calendar quarter/year);
          ``quantiles=True`` additionally builds the histogram rollup
          (APPROX_MEDIAN / APPROX_PERCENTILE_CONT rewrites).
        - ``key_col`` (with ``value_col``) → keyed per-series rollup
          (``GROUP BY key, date_trunc`` rewrites).
        - ``distinct_col`` → exact distinct pairs
          (``COUNT(DISTINCT col)`` rewrites; with ``key_col`` also the
          per-series variant).
        - ``count_key_col`` → count pairs (top-k heavy-hitter
          rewrites).

        The DataFrame is also registered as a temp view so unmatched
        SQL falls back to full Catalyst over the same name. Each build
        is one scan + one shuffle; builds share nothing, so register
        only the layers the workload serves. Returns self (chainable).

        ``df`` may also be a parquet path (the reference's
        registration form, src/main.rs:45-46) — read with the repo's
        UTC-pinned session settings.
        """
        if isinstance(df, str):
            from uwheel_datafusion_spark.sources.registry import _ensure_utc

            _ensure_utc(self.spark)
            df = self.spark.read.parquet(df)
        df.createOrReplaceTempView(table)
        r = self.router
        layers = self._layers.setdefault(table.lower(), {})
        if value_col is not None:
            kw = (
                {"granularities": granularities}
                if granularities is not None
                else {}
            )
            idx = WheelIndex.build(
                df, ts_col, value_col, watermark_ms, advance_to_ms,
                cache=cache, **kw,
            )
            self._indexes[table.lower()] = idx
            r.register_index(table, ts_col, value_col, idx)
            if quantiles:
                from uwheel_datafusion_spark.operators.quantile_rollup import (
                    build_histogram_rollup,
                    build_keyed_histogram_rollup,
                )

                hist = build_histogram_rollup(
                    df, ts_col, value_col, watermark_ms, advance_to_ms,
                    cache=cache,
                )
                layers["quantile"] = hist
                r.register_histogram_rollup(
                    table, value_col, ts_col, hist,
                    watermark_ms, advance_to_ms,
                )
                if key_col is not None:
                    khist = build_keyed_histogram_rollup(
                        df, ts_col, value_col, key_col,
                        watermark_ms, advance_to_ms, cache=cache,
                    )
                    layers["keyed_quantile"] = khist
                    r.register_keyed_histogram_rollup(
                        table, key_col, value_col, ts_col, khist,
                        watermark_ms, advance_to_ms,
                    )
            if ohlc:
                from uwheel_datafusion_spark.operators.ohlc import (
                    build_keyed_ohlc_rollup,
                    build_ohlc_rollup,
                )

                oh = build_ohlc_rollup(
                    df, ts_col, value_col, watermark_ms, advance_to_ms,
                    cache=cache,
                )
                layers["ohlc"] = oh
                r.register_ohlc_rollup(
                    table, value_col, ts_col, oh,
                    watermark_ms, advance_to_ms,
                )
                if key_col is not None:
                    koh = build_keyed_ohlc_rollup(
                        df, ts_col, value_col, key_col,
                        watermark_ms, advance_to_ms, cache=cache,
                    )
                    layers["keyed_ohlc"] = koh
                    r.register_keyed_ohlc_rollup(
                        table, key_col, value_col, ts_col, koh,
                        watermark_ms, advance_to_ms,
                    )
            if twa:
                from uwheel_datafusion_spark.operators.twa import (
                    build_keyed_twa_rollup,
                    build_twa_rollup,
                )

                tw = build_twa_rollup(
                    df, ts_col, value_col, watermark_ms, advance_to_ms,
                    cache=cache,
                )
                layers["twa"] = tw
                r.register_twa_rollup(
                    table, value_col, ts_col, tw,
                    watermark_ms, advance_to_ms,
                )
                if key_col is not None:
                    ktw = build_keyed_twa_rollup(
                        df, ts_col, value_col, key_col,
                        watermark_ms, advance_to_ms, cache=cache,
                    )
                    layers["keyed_twa"] = ktw
                    r.register_keyed_twa_rollup(
                        table, key_col, value_col, ts_col, ktw,
                        watermark_ms, advance_to_ms,
                    )
            if counter:
                from uwheel_datafusion_spark.operators.counter import (
                    build_counter_rollup,
                    build_keyed_counter_rollup,
                )

                ct = build_counter_rollup(
                    df, ts_col, value_col, watermark_ms, advance_to_ms,
                    cache=cache,
                )
                layers["counter"] = ct
                r.register_counter_rollup(
                    table, value_col, ts_col, ct,
                    watermark_ms, advance_to_ms,
                )
                if key_col is not None:
                    kct = build_keyed_counter_rollup(
                        df, ts_col, value_col, key_col,
                        watermark_ms, advance_to_ms, cache=cache,
                    )
                    layers["keyed_counter"] = kct
                    r.register_keyed_counter_rollup(
                        table, key_col, value_col, ts_col, kct,
                        watermark_ms, advance_to_ms,
                    )
            if key_col is not None:
                from uwheel_datafusion_spark.operators.keyed_wheel import (
                    KeyedWheelIndex,
                )

                rollup = KeyedWheelIndex.build_rollup(
                    df, key_col, ts_col, value_col,
                    watermark_ms, advance_to_ms,
                )
                rollup = rollup.cache() if cache else rollup
                layers["keyed_agg"] = rollup
                r.register_keyed_rollup(
                    table, key_col, ts_col, value_col, rollup,
                    watermark_ms, advance_to_ms,
                )
        if distinct_col is not None:
            from uwheel_datafusion_spark.operators.distinct import (
                build_distinct_pairs,
                build_keyed_distinct_pairs,
            )

            pairs = build_distinct_pairs(
                df, ts_col, distinct_col, watermark_ms, advance_to_ms,
                cache=cache,
            )
            layers["distinct"] = pairs
            r.register_distinct_rollup(
                table, distinct_col, ts_col, pairs,
                watermark_ms, advance_to_ms,
            )
            if key_col is not None:
                r.register_keyed_distinct_rollup(
                    table, key_col, distinct_col, ts_col,
                    build_keyed_distinct_pairs(
                        df, ts_col, distinct_col, key_col,
                        watermark_ms, advance_to_ms, cache=cache,
                    ),
                    watermark_ms, advance_to_ms,
                )
        if count_key_col is not None:
            from uwheel_datafusion_spark.operators.distinct import (
                build_count_pairs,
            )

            r.register_count_rollup(
                table, count_key_col, ts_col,
                build_count_pairs(
                    df, ts_col, count_key_col, watermark_ms, advance_to_ms,
                    cache=cache,
                ),
                watermark_ms, advance_to_ms,
            )
        return self

    # ------------------------------------------------------------- querying

    def sql(self, query: str) -> DataFrame:
        """Route ``query``: index/rollup rewrite when recognized, full
        Catalyst otherwise (uniform with ``spark.sql``)."""
        return self.router.sql(query)

    def sql_scalar(self, query: str):
        """Scalar form — the driver-arithmetic path for reference-shaped
        range aggregates (no Spark job on the index path)."""
        return self.router.sql_scalar(query)

    def explain(self, query: str) -> str:
        """Which path would serve ``query``, and why."""
        return self.router.explain(query)

    def index(self, table: str) -> WheelIndex:
        """The wheel index registered for ``table`` (probe /
        range_agg_batch_df / extend / backfill live here)."""
        return self._indexes[table.lower()]

    def batch(
        self,
        table: str,
        family: str,
        ranges: "list[tuple[int, int]]",
        q: float = 0.5,
        n_pixels: int = 200,
    ) -> DataFrame:
        """N range queries of one family in ONE Spark job, served from
        the rollups ``register_table`` built — the cluster-serving
        throughput shape (amortizes the per-job scheduler floor the
        same way the reference amortizes per-query cost in-process,
        src/main.rs:205-288). Families and their registration flags:

        - ``"agg"`` — the wheel's sum/cnt/min/max/avg partials
          (``value_col``); one row per range.
        - ``"quantile"`` — approximate q-quantile (``quantiles=True``).
        - ``"ohlc"`` — candlesticks (``ohlc=True``).
        - ``"m4"`` — per-range M4 chart downsampling at ``n_pixels``
          (``ohlc=True``; multi-row: one row per non-empty pixel).
        - ``"twa"`` — time-weighted averages (``twa=True``).
        - ``"counter"`` — PromQL increase/rate (``counter=True``).
        - ``"distinct"`` — exact distinct counts (``distinct_col``).
        - ``"keyed_agg"`` / ``"keyed_quantile"`` / ``"keyed_ohlc"`` /
          ``"keyed_m4"`` — the per-series variants; ``ranges`` are then
          ``(key, start_ms, end_ms)`` probes (need ``key_col`` plus the
          family flag).

        Output schemas are the batch twins' (operators/sketch_batch;
        wheel.range_agg_batch_df for ``"agg"``,
        keyed_wheel.query_rollup_batch_df for ``"keyed_agg"``): one row
        per input range/probe keyed by ``query_id`` in input order."""
        t = table.lower()
        if family == "agg":
            if t not in self._indexes:
                raise ValueError(
                    f"no wheel index for {table!r}: register_table with "
                    "value_col first"
                )
            return self._indexes[t].range_agg_batch_df(ranges)
        from uwheel_datafusion_spark.operators import sketch_batch as sb

        def _keyed_agg(r):
            from uwheel_datafusion_spark.operators.keyed_wheel import (
                KeyedWheelIndex,
            )

            return KeyedWheelIndex.query_rollup_batch_df(r, ranges)

        dispatch = {
            "quantile": lambda r: sb.range_quantile_batch_df(r, ranges, q),
            "ohlc": lambda r: sb.range_ohlc_batch_df(r, ranges),
            "m4": lambda r: sb.range_m4_batch_df(r, ranges, n_pixels),
            "twa": lambda r: sb.range_twa_batch_df(r, ranges),
            "counter": lambda r: sb.range_increase_batch_df(r, ranges),
            "distinct": lambda r: sb.range_distinct_batch_df(r, ranges),
            "keyed_agg": _keyed_agg,
            "keyed_quantile": lambda r: sb.keyed_range_quantile_batch_df(
                r, ranges, q
            ),
            "keyed_ohlc": lambda r: sb.keyed_range_ohlc_batch_df(r, ranges),
            "keyed_m4": lambda r: sb.keyed_range_m4_batch_df(
                r, ranges, n_pixels
            ),
            "keyed_twa": lambda r: sb.keyed_range_twa_batch_df(r, ranges),
            "keyed_counter": lambda r: sb.keyed_range_increase_batch_df(
                r, ranges
            ),
        }
        if family not in dispatch:
            raise ValueError(
                f"unknown batch family {family!r}; one of "
                f"('agg', {', '.join(map(repr, dispatch))})"
            )
        layer = {"m4": "ohlc", "keyed_m4": "keyed_ohlc"}.get(family, family)
        rollup = self._layers.get(t, {}).get(layer)
        if rollup is None:
            flag = {
                "quantile": "quantiles=True",
                "ohlc": "ohlc=True",
                "m4": "ohlc=True",
                "twa": "twa=True",
                "counter": "counter=True",
                "distinct": "distinct_col=...",
                "keyed_agg": "key_col=... and value_col=...",
                "keyed_quantile": "key_col=... and quantiles=True",
                "keyed_ohlc": "key_col=... and ohlc=True",
                "keyed_m4": "key_col=... and ohlc=True",
                "keyed_twa": "key_col=... and twa=True",
                "keyed_counter": "key_col=... and counter=True",
            }[family]
            raise ValueError(
                f"no {family} rollup for {table!r}: register_table with "
                f"{flag} first"
            )
        return dispatch[family](rollup)

    #: scalar route paths sql_many can re-dispatch onto the batch tier,
    #: with the batch family and the (batch column → role) projection
    _BATCHABLE = {
        "quantile_rollup": ("quantile", (("QUANTILE", "approx_quantile"),)),
        "ohlc_rollup": (
            "ohlc",
            (
                ("OPEN", "open"), ("HIGH", "high"), ("LOW", "low"),
                ("CLOSE", "close"), ("CNT", "cnt"),
            ),
        ),
        "twa_rollup": ("twa", (("TWA", "twa"), ("CNT", "cnt"))),
        "counter_rollup": (
            "counter",
            (
                ("INCREASE", "increase"), ("RATE", "rate_per_sec"),
                ("CNT", "cnt"),
            ),
        ),
    }

    def sql_many(self, queries: "list[str]") -> "list[DataFrame]":
        """Serve N SQL statements — a dashboard's worth of panels — with
        ONE Spark job per (table, family, params) GROUP instead of one
        per statement: the reference's batched-QPS story
        (src/main.rs:205-288 amortizes per-query cost in-process) as a
        SQL surface.

        Each statement is routed but not executed; scalar decisions
        whose family has a batch twin (quantile / OHLC / TWA / counter
        / M4 — each a ~50-150 ms Spark job when served one-at-a-time)
        are grouped, dispatched to :meth:`batch`, and the group's batch
        frame is materialized with ONE collect (panel results are by
        construction tiny: one row per range, pixels for M4); each
        statement's DataFrame is a LOCAL relation sliced from its
        group's rows with the statement's exact aliases/schema — a
        later per-panel ``.collect()`` costs no Spark job, which is
        where the amortization actually lands (a lazy query_id filter
        still pays the ~100 ms scheduler floor per panel, measured
        0.97× — no win). Statements the batch tier cannot express run
        through :meth:`sql` unchanged: wheel scalar aggregates (already
        driver-arithmetic), grouped/keyed shapes, and unmatched SQL.
        Results keep input order and each panel's single-statement
        schema; batch twins are value-identical to the scalar serving
        paths (pinned in test_sketch_batch.py / test_engine.py).

        For the pure serving loop (collect every panel's VALUES, the
        reference's QPS shape) use :meth:`sql_many_rows` — wrapping
        pre-materialized rows back into DataFrames costs one ~200 ms
        parallelize-job per panel at collect time, which would eat the
        amortization (measured 0.65×)."""
        from pyspark.sql.types import StructField, StructType

        out = self._sql_many_materialized(queries)
        frames: "list[DataFrame]" = []
        for item in out:
            if isinstance(item, DataFrame):
                frames.append(item)
            else:
                names, types, data = item
                schema = StructType(
                    [
                        StructField(n, t, True)
                        for n, t in zip(names, types)
                    ]
                )
                frames.append(self.spark.createDataFrame(data, schema))
        return frames

    def sql_many_rows(self, queries: "list[str]") -> "list[list]":
        """:meth:`sql_many`'s serving form: each statement's collected
        rows (as ``pyspark.sql.Row`` with the statement's aliases), in
        input order. Batchable groups cost ONE Spark job each; handing
        back rows (not DataFrames) means NO further job per panel —
        this is the surface whose amortization the bench records."""
        from pyspark.sql import Row

        out = self._sql_many_materialized(queries)
        rows_out: "list[list]" = []
        for item in out:
            if isinstance(item, DataFrame):
                rows_out.append(item.collect())
            else:
                names, _types, data = item
                R = Row(*names)
                rows_out.append([R(*r) for r in data])
        return rows_out

    def _sql_many_materialized(self, queries: "list[str]"):
        """Shared core: route, group, run one batch job per group, and
        slice per statement. Returns per statement either a lazy
        DataFrame (non-batchable path) or ``(names, types, rows)``."""
        decisions = [self.router._decide(q) for q in queries]
        groups: dict[tuple, list[int]] = {}
        for i, d in enumerate(decisions):
            key = None
            if d.granularity is None and d.path in self._BATCHABLE:
                family = self._BATCHABLE[d.path][0]
                if family in self._layers.get(d.table, {}):
                    key = (d.table, family, d.quantile)
            elif d.path == "m4_rollup" and "ohlc" in self._layers.get(
                d.table, {}
            ):
                key = (d.table, "m4", d.limit)
            if key is not None:
                groups.setdefault(key, []).append(i)

        out: "list[DataFrame | None]" = [None] * len(queries)
        for (table, family, param), idxs in groups.items():
            ranges = [decisions[i].range_ms for i in idxs]
            kw = (
                {"q": param}
                if family == "quantile"
                else {"n_pixels": param} if family == "m4" else {}
            )
            batch = self.batch(table, family, ranges, **kw)
            fields = {f.name: f for f in batch.schema.fields}
            by_qid: dict[int, list] = {}
            for r in batch.collect():  # ONE job per group
                by_qid.setdefault(r["query_id"], []).append(r)
            for pos, i in enumerate(idxs):
                d = decisions[i]
                qrows = by_qid.get(pos, [])
                if family == "m4":
                    names = ["px_ms", "open", "high", "low", "close", "cnt"]
                    types = [fields[n].dataType for n in names]
                    data = [tuple(r[n] for n in names) for r in qrows]
                else:
                    aliases = dict(d.items)
                    proj = [
                        (role, src)
                        for role, src in self._BATCHABLE[d.path][1]
                        if role in aliases
                    ]
                    names = [aliases[role] for role, _src in proj]
                    types = [fields[src].dataType for _role, src in proj]
                    data = [
                        tuple(
                            0
                            if role == "CNT" and r[src] is None
                            else r[src]
                            for role, src in proj
                        )
                        for r in qrows
                    ]
                out[i] = (names, types, data)
        for i, q in enumerate(queries):
            if out[i] is None:
                out[i] = self.sql(q)
        return out
