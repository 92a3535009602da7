"""Shared ordered boundary-combine for edge-carrying rollup families.

TWA (operators/twa) and counter increase (operators/counter) both keep
per-slot partials of the shape

    (bucket_ms, first_ts_ms, first_<val>, last_ts_ms, last_<val>,
     <accumulator DECIMAL(38,0)>, cnt)

and combine them in bucket order by adding a family-specific SEAM term
between consecutive partials (LOCF area for TWA, reset-aware step for
counters). This module holds the one window+fold implementation both
wrap, so seam-ordering and empty-group edge cases cannot drift apart
between the families."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def ordered_edge_combine(
    parts: DataFrame,
    group_cols: list,
    val_suffix: str,
    seam,
    acc_col: str,
) -> DataFrame:
    """Fold edge-carrying partials within each group, in bucket order.

    ``seam(prev_last_val, prev_last_ts, cur_first_val, cur_first_ts)``
    returns the inter-partial accumulator term (must be NULL for the
    first partial of a group — lag yields nulls there). Edges fold via
    min_by/max_by on (ts, value) structs — the deterministic tie-break
    every family in this engine uses."""
    first_c, last_c = f"first_{val_suffix}", f"last_{val_suffix}"
    w = Window.partitionBy(*group_cols).orderBy("bucket_ms")
    seam_col = seam(
        F.lag(last_c).over(w),
        F.lag("last_ts_ms").over(w),
        F.col(first_c),
        F.col("first_ts_ms"),
    ).cast(DEC)
    okey = F.struct(
        F.col("first_ts_ms").alias("t"), F.col(first_c).alias("v")
    )
    ckey = F.struct(F.col("last_ts_ms").alias("t"), F.col(last_c).alias("v"))
    stitched = parts.withColumn("_seam", seam_col)
    gb = stitched.groupBy(*group_cols) if group_cols else stitched.groupBy()
    zero = F.lit(0).cast(DEC)
    return gb.agg(
        F.min_by(F.col("first_ts_ms"), okey).alias("first_ts_ms"),
        F.min_by(F.col(first_c), okey).alias(first_c),
        F.max_by(F.col("last_ts_ms"), ckey).alias("last_ts_ms"),
        F.max_by(F.col(last_c), ckey).alias(last_c),
        (
            F.coalesce(F.sum(acc_col), zero) + F.coalesce(F.sum("_seam"), zero)
        ).alias(acc_col),
        F.sum("cnt").alias("cnt"),
    )
