"""WheelSqlRouter — materialized-view-style SQL rewrite onto the index.

The reference issues exactly one SQL shape per query
(``SELECT SUM(fare_amount) FROM yellow_tripdata WHERE
tpep_dropoff_datetime >= '?' AND tpep_dropoff_datetime < '?'``,
/root/reference/src/main.rs:252-257) and the later ``datafusion-uwheel``
crate's whole design is an optimizer rule that recognizes that
``Aggregate(Filter(range))`` plan and answers it from the wheel instead
of the scan [uwheel-pub]. This module is the Spark-side equivalent at
the library level (SURVEY §4.1 last row, §7.6): a router that

- pattern-matches the query string against the reference shape for any
  registered (table, ts_col, value_col) index, for SUM / COUNT / MIN /
  MAX / AVG;
- answers matched, minute-aligned queries from the O(1) driver index —
  no Spark job at all, the µWheel latency class;
- falls back to ``spark.sql`` verbatim for everything else (unmatched
  shape, unknown table/columns, unaligned or out-of-horizon ranges
  route to the full Catalyst pipeline, E3).

``explain(query)`` reports which path a query would take and why —
the analogue of ``explain_combine_range`` one level up.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from uwheel_datafusion_spark.functions.time import MINUTE_MS
from uwheel_datafusion_spark.operators.wheel import WheelIndex

_AGGS = ("SUM", "COUNT", "MIN", "MAX", "AVG")

_AGG_ITEM = (
    r"(?:SUM|COUNT|MIN|MAX|AVG)\s*\(\s*(?:\w+|\*)\s*\)(?:\s+AS\s+\w+)?"
)

#: SELECT <agg>(<col>) [AS a] [, <agg>(<col>) [AS a]]*
#: FROM <table> WHERE <ts> >= '<lit>' AND <ts> < '<lit>'
#: — one index hit answers ANY mix of the five lowerings because every
#: slot stores the "all" partial (sum, cnt, min, max), uwheel's all
#: aggregator (SURVEY §2.4 A8).
_PATTERN = re.compile(
    r"^\s*SELECT\s+(?P<items>" + _AGG_ITEM + r"(?:\s*,\s*" + _AGG_ITEM + r")*)\s+"
    r"FROM\s+(?P<table>\w+)\s+"
    r"WHERE\s+(?P<ts1>\w+)\s*>=\s*(?:TIMESTAMP\s+)?'(?P<start>[^']+)'\s+"
    r"AND\s+(?P<ts2>\w+)\s*<\s*(?:TIMESTAMP\s+)?'(?P<end>[^']+)'\s*;?\s*$",
    re.IGNORECASE,
)

_ITEM_PATTERN = re.compile(
    r"(?P<agg>SUM|COUNT|MIN|MAX|AVG)\s*\(\s*(?P<col>\w+|\*)\s*\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?",
    re.IGNORECASE,
)

#: SELECT date_trunc('<g>', <ts>) [AS b], <agg list>
#: FROM <table> WHERE <range> GROUP BY date_trunc('<g>', <ts>)|1|<b>
#: — the continuous-aggregate shape: served from the <g> rollup table
#: (distributed, partition-prunable), never the fact scan. Week note:
#: date_trunc('week') is Monday-based while the wheel's opt-in week
#: slots are 7-day epoch-aligned (Thursday-anchored), so week queries
#: are served by re-aggregating the DAY rollup onto Monday-aligned
#: 7-day buckets — still never the fact scan (≤ 7 day-rows fold into
#: each week row).
_GROUP_PATTERN = re.compile(
    r"^\s*SELECT\s+DATE_TRUNC\s*\(\s*'(?P<gran>minute|hour|day|week)'\s*,\s*"
    r"(?P<ts0>\w+)\s*\)\s*(?:AS\s+(?P<balias>\w+)\s*)?,\s*"
    r"(?P<items>" + _AGG_ITEM + r"(?:\s*,\s*" + _AGG_ITEM + r")*)\s+"
    r"FROM\s+(?P<table>\w+)\s+"
    r"WHERE\s+(?P<ts1>\w+)\s*>=\s*(?:TIMESTAMP\s+)?'(?P<start>[^']+)'\s+"
    r"AND\s+(?P<ts2>\w+)\s*<\s*(?:TIMESTAMP\s+)?'(?P<end>[^']+)'\s*"
    r"GROUP\s+BY\s+(?:1|(?P<gb_alias>\w+)|DATE_TRUNC\s*\(\s*'(?P<gran2>\w+)'\s*,"
    r"\s*(?P<ts3>\w+)\s*\))\s*;?\s*$",
    re.IGNORECASE,
)


def _parse_ts_literal(lit: str) -> int | None:
    """Naive-UTC timestamp literal → epoch ms (the string form the
    reference interpolates, /root/reference/src/main.rs:242-258)."""
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(lit, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)
        except ValueError:
            continue
    return None


@dataclass
class RouteDecision:
    path: str  # "index" | "rollup" | "sql"
    reason: str
    table: str | None = None
    agg: str | None = None  # first aggregate (scalar entry point)
    range_ms: tuple[int, int] | None = None
    #: full select list as (agg, alias) pairs — all lowered from the
    #: same "all" partial in one index hit
    items: tuple[tuple[str, str], ...] = ()
    #: rollup path: which granularity table serves the GROUP BY, and
    #: the output alias of the time-bucket column
    granularity: str | None = None
    bucket_alias: str | None = None


class WheelSqlRouter:
    """Register wheel indexes per (table, ts_col, value_col); run SQL."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._indexes: dict[str, tuple[str, str, WheelIndex]] = {}
        self.last_decision: RouteDecision | None = None

    def register_index(
        self, table: str, ts_col: str, value_col: str, index: WheelIndex
    ) -> None:
        self._indexes[table.lower()] = (ts_col.lower(), value_col.lower(), index)

    # ------------------------------------------------------------------ route

    def _decide(self, query: str) -> RouteDecision:
        gm = _GROUP_PATTERN.match(query)
        if gm is not None:
            return self._decide_grouped(gm)
        m = _PATTERN.match(query)
        if not m:
            return RouteDecision("sql", "shape not Aggregate(Filter(range))")
        table = m["table"].lower()
        reg = self._indexes.get(table)
        if reg is None:
            return RouteDecision("sql", f"no index registered for table {table}")
        ts_col, value_col, index = reg
        if m["ts1"].lower() != ts_col or m["ts2"].lower() != ts_col:
            return RouteDecision("sql", "filter column is not the indexed ts")
        items: list[tuple[str, str]] = []
        for im in _ITEM_PATTERN.finditer(m["items"]):
            agg = im["agg"].upper()
            col = im["col"].lower()
            if col != value_col and not (agg == "COUNT" and col in ("*", "1")):
                return RouteDecision(
                    "sql", "aggregated column is not the indexed value"
                )
            items.append((agg, im["alias"] or f"{agg.lower()}_value"))
        s = _parse_ts_literal(m["start"])
        e = _parse_ts_literal(m["end"])
        if s is None or e is None:
            return RouteDecision("sql", "unparseable timestamp literal")
        if s % MINUTE_MS or e % MINUTE_MS:
            return RouteDecision(
                "sql", "endpoints not minute-aligned (index contract, SURVEY §4.2)"
            )
        if s < index.watermark_ms or e > index.advanced_ms:
            return RouteDecision("sql", "range outside the indexed horizon")
        return RouteDecision(
            "index",
            "rewritten onto wheel index",
            table,
            items[0][0],
            (s, e),
            tuple(items),
        )

    def _decide_grouped(self, m: re.Match) -> RouteDecision:
        """Continuous-aggregate shape: GROUP BY date_trunc over the
        indexed ts within an aligned range → serve from the rollup
        table of that granularity (distributed, partition-prunable;
        never touches the fact scan)."""
        from uwheel_datafusion_spark.functions.time import (
            GRANULARITY_MS,
            MONDAY_EPOCH_OFFSET_MS,
        )

        table = m["table"].lower()
        reg = self._indexes.get(table)
        if reg is None:
            return RouteDecision("sql", f"no index registered for table {table}")
        ts_col, value_col, index = reg
        ts_refs = {m["ts0"].lower(), m["ts1"].lower(), m["ts2"].lower()}
        if m["ts3"]:
            ts_refs.add(m["ts3"].lower())
        if ts_refs != {ts_col}:
            return RouteDecision("sql", "bucket/filter column is not the indexed ts")
        gran = m["gran"].lower()
        if m["gran2"] and m["gran2"].lower() != gran:
            return RouteDecision("sql", "GROUP BY granularity differs from SELECT")
        balias = m["balias"] or "bucket"
        if m["gb_alias"] and m["gb_alias"].lower() not in (
            balias.lower(),
            ts_col,
        ):
            return RouteDecision("sql", "GROUP BY key is not the bucket expression")
        # Monday-based weeks fold from the day rollup (see _serve_rollup)
        base_rollup = "day" if gran == "week" else gran
        if base_rollup not in index.rollups:
            return RouteDecision("sql", f"no {base_rollup} rollup in the index")
        items: list[tuple[str, str]] = []
        for im in _ITEM_PATTERN.finditer(m["items"]):
            agg = im["agg"].upper()
            col = im["col"].lower()
            if col != value_col and not (agg == "COUNT" and col in ("*", "1")):
                return RouteDecision(
                    "sql", "aggregated column is not the indexed value"
                )
            items.append((agg, im["alias"] or f"{agg.lower()}_value"))
        s = _parse_ts_literal(m["start"])
        e = _parse_ts_literal(m["end"])
        if s is None or e is None:
            return RouteDecision("sql", "unparseable timestamp literal")
        g_ms = GRANULARITY_MS[gran]
        # week buckets are Monday-anchored (date_trunc semantics), so
        # the alignment check shifts by the epoch→Monday offset
        off = MONDAY_EPOCH_OFFSET_MS if gran == "week" else 0
        if (s - off) % g_ms or (e - off) % g_ms:
            return RouteDecision(
                "sql",
                f"endpoints not {gran}-aligned (edge buckets would be partial)",
            )
        if s < index.watermark_ms or e > index.advanced_ms:
            return RouteDecision("sql", "range outside the indexed horizon")
        return RouteDecision(
            "rollup",
            (
                "rewritten onto day rollup (Monday-week re-aggregation)"
                if gran == "week"
                else f"rewritten onto {gran} rollup table"
            ),
            table,
            items[0][0],
            (s, e),
            tuple(items),
            granularity=gran,
            bucket_alias=balias,
        )

    def explain(self, query: str) -> str:
        d = self._decide(query)
        rng = f" range={d.range_ms}" if d.range_ms else ""
        return f"{d.path.upper()}: {d.reason}{rng}"

    # -------------------------------------------------------------------- run

    def sql_scalar(self, query: str):
        """Route and return the scalar answer (index path: pure driver
        arithmetic, no Spark job — the benchmarkable entry point)."""
        d = self._decide(query)
        self.last_decision = d
        if d.path == "rollup" or (d.path == "index" and len(d.items) > 1):
            raise ValueError(
                "non-scalar result shape: use .sql() (DataFrame form)"
            )
        if d.path == "index":
            _, _, index = self._indexes[d.table]
            di = index.to_driver_index()
            s, e = d.range_ms
            fn = {
                "SUM": di.query_sum,
                "COUNT": di.query_count,
                "MIN": di.query_min,
                "MAX": di.query_max,
                "AVG": di.query_avg,
            }[d.agg]
            return fn(s, e)
        row = self.spark.sql(query).first()
        return row[0] if row is not None else None

    def sql(self, query: str) -> DataFrame:
        """DataFrame-returning form (uniform with ``spark.sql``). A
        multi-aggregate select list over the same indexed (ts, value)
        pair is one index hit: every lowering reads the one "all"
        partial (sum, cnt, min, max) the slots store."""
        d = self._decide(query)
        self.last_decision = d
        if d.path == "sql":
            return self.spark.sql(query)
        if d.path == "rollup":
            return self._serve_rollup(d)
        _, _, index = self._indexes[d.table]
        di = index.to_driver_index()
        s, e = d.range_ms
        all_parts = di.query_all(s, e)
        lowered = {
            "SUM": all_parts["sum"],
            "COUNT": all_parts["cnt"],
            "MIN": all_parts["min"],
            "MAX": all_parts["max"],
            "AVG": all_parts["avg"],
        }
        schema = ", ".join(
            f"{alias} {'bigint' if agg == 'COUNT' else 'double'}"
            for agg, alias in d.items
        )
        return self.spark.createDataFrame(
            [tuple(lowered[agg] for agg, _ in d.items)], schema=schema
        )

    def _serve_rollup(self, d: RouteDecision) -> DataFrame:
        """GROUP BY date_trunc served from the rollup: filter the slot
        range (partition-prunable on a reopened index) and lower each
        requested aggregate from the stored 'all' partial — empty
        buckets are absent, matching GROUP BY-over-scan semantics. The
        bucket column is emitted as TIMESTAMP_NTZ (the fixtures'
        flavor, naive UTC)."""
        from pyspark.sql import functions as F

        from uwheel_datafusion_spark.functions.quant import micros_to_value
        from uwheel_datafusion_spark.functions.time import (
            MONDAY_EPOCH_OFFSET_MS,
            WEEK_MS,
        )
        from uwheel_datafusion_spark.operators.wheel import _bucket_range_pred

        _, _, index = self._indexes[d.table]
        s, e = d.range_ms
        if d.granularity == "week":
            # Monday-anchored weeks: fold the day rollup (≤ 7 day-rows
            # per week) onto offset-shifted 7-day buckets — a partial
            # merge, never a fact-table scan. The range endpoints are
            # Monday-aligned (checked in _decide_grouped) and day
            # buckets nest inside weeks, so the day filter is exact.
            day = index.rollups["day"]
            shifted = F.col("bucket_ms") - F.lit(MONDAY_EPOCH_OFFSET_MS)
            week_start = (
                (F.floor(shifted / WEEK_MS) * WEEK_MS)
                + F.lit(MONDAY_EPOCH_OFFSET_MS)
            ).cast("long")
            r = (
                day.filter(_bucket_range_pred(day, s, e))
                .groupBy(week_start.alias("bucket_ms"))
                .agg(
                    F.sum("sum_micros").alias("sum_micros"),
                    F.sum("cnt").alias("cnt"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        else:
            r = index.rollups[d.granularity]
        lowered = {
            "SUM": lambda: micros_to_value(F.col("sum_micros")),
            "COUNT": lambda: F.col("cnt"),
            "MIN": lambda: F.col("min_value"),
            "MAX": lambda: F.col("max_value"),
            "AVG": lambda: (
                F.col("sum_micros").cast("double")
                / F.col("cnt").cast("double")
                / 1_000_000
            ),
        }
        cols = [
            F.timestamp_millis(F.col("bucket_ms"))
            .cast("timestamp_ntz")
            .alias(d.bucket_alias)
        ]
        cols += [lowered[agg]().alias(alias) for agg, alias in d.items]
        return r.filter(_bucket_range_pred(r, s, e)).select(*cols)
