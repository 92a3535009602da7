"""As-of (temporal) join — a custom operator Spark lacks natively.

``asof_join(left, right, …)`` matches each left row to the latest
right row of the same key with ``right_ts <= left_ts`` (inclusive) —
DuckDB's ``ASOF JOIN`` semantics, which is exactly what the gate uses
as the oracle.

Spark realization (composition of existing ops, no UDF): tag and union
both sides, ONE shuffle on the key, sort by (ts, side) within the key,
and carry the right payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding window. The sort order puts a right row
before a left row at the same timestamp, which yields the inclusive
``>=`` match. Cost at scale: one shuffle + one sort — the same shape
as a sort-merge join, with none of the per-row range probing a naive
``theta`` join would do (that join is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from uwheel_datafusion_spark.functions.time import ts_to_ms


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    how: str = "inner",
) -> DataFrame:
    """``payload`` maps right-side column → output alias. Returns all
    left columns plus the carried payload of the matching right row;
    ``how='inner'`` drops left rows with no prior right row,
    ``how='left'`` keeps them with null payload."""
    left_cols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_p_{alias}")
          for src, alias in payload.items()],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(src).alias(f"_p_{alias}") for src, alias in payload.items()],
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        *[
            F.last(f"_p_{alias}", ignorenulls=True).over(w).alias(f"_c_{alias}")
            for alias in payload.values()
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_c_{alias}").alias(alias) for alias in payload.values()],
    )
    if how == "inner":
        first_alias = next(iter(payload.values()))
        out = out.filter(F.col(first_alias).isNotNull())
    elif how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    return out


def purchase_asof_click_oracle(table: str = "events") -> str:
    """Gate oracle: DuckDB's native ASOF JOIN over the same semantics."""
    return f"""
        SELECT p.event_id,
               p.user_id,
               epoch_ms(p.ts) AS purchase_ms,
               epoch_ms(c.ts) AS click_ms
        FROM (SELECT * FROM {table} WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM {table} WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """


def purchase_asof_click(events: DataFrame) -> DataFrame:
    """For each purchase, the most recent prior click by the same user."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"ts": "click_ts"},
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_to_ms("ts").alias("purchase_ms"),
        ts_to_ms("click_ts").alias("click_ms"),
    )
