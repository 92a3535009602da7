"""Shared rollup persistence — ONE on-disk contract for every
mergeable-partial family (wheel 'all', distinct pairs/HLL, histogram
quantile, OHLC): parquet partitioned by UTC date of the slot start.

Any frame with a ``bucket_ms`` column qualifies. Serving probes that
filter with ``wheel._bucket_range_pred`` automatically conjoin static
``dt`` bounds on a reopened rollup, so range queries list
O(days-touched) partitions at any scale — the same layout/pruning
story WheelIndex.save pioneered, factored out so new aggregator
families inherit it instead of re-implementing it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_rollup(rollup: DataFrame, path: str) -> None:
    """Persist a rollup (any mergeable-partial frame keyed by
    ``bucket_ms``) as parquet partitioned by UTC date."""
    (
        rollup.withColumn(
            "dt",
            F.date_format(F.timestamp_millis(F.col("bucket_ms")), "yyyy-MM-dd"),
        )
        .repartition("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def load_rollup(spark, path: str) -> DataFrame:
    """Reopen a persisted rollup; the ``dt`` partition column is KEPT
    so ``_bucket_range_pred`` prunes day partitions at planning time.

    Repairs a torn :func:`upsert_rollup` swap BEFORE serving (ADVICE
    r06 #4): a crash between the swap's two renames leaves a
    ``dt=X__old`` dir and no live ``dt=X``; waiting for the next
    upsert to repair it would make every reader in the window silently
    see that day's rollup rows absent rather than the pre-crash data."""
    _recover_torn_partitions(path)
    return spark.read.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """Small-file compaction — the maintenance job every append-heavy
    layout eventually needs (streaming sinks, incremental LSH index
    appends, per-trigger rollup upserts all produce file counts that
    grow without bound; at 100 TB the NameNode/listing cost and
    per-file task overhead dominate long before data size does).

    Rewrites ``path`` to ≈ ``target_mb``-sized files: bin count =
    ceil(bytes / target), `repartition(n)` (or per-partition-column
    repartition when the layout is partitioned), write to a sibling
    temp dir, atomic swap. Plain parquet has no transaction log, so
    the swap is directory-level (the Delta/Iceberg OPTIMIZE command is
    the production drop-in); readers opened BEFORE the swap must be
    re-opened after.

    Returns {"files_before", "files_after", "bytes"}.
    """
    import glob
    import math
    import os
    import shutil

    def _files(p):
        return [
            f
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        ]

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    # recover from an interrupted prior run: a leftover __compact_old
    # with no live `path` means the crash hit between the two renames —
    # restore it; leftover tmp/old next to a live `path` are stale
    # partial state — drop them so the renames below can't collide
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    before = _files(path)
    total = sum(os.path.getsize(f) for f in before)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    w = (
        df.repartition(n, partition_col)
        if partition_col is not None
        else df.repartition(n)
    )
    writer = w.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    # tmp is written next to `path` (same directory ⇒ same filesystem),
    # so the two renames are atomic moves; a crash between them is
    # recovered by the entry check above
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: the original data wins
        raise
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_files(path)),
        "bytes": total,
    }


def _dt_col() -> F.Column:
    return F.date_format(
        F.timestamp_millis(F.col("bucket_ms")), "yyyy-MM-dd"
    )


def _recover_torn_partitions(path: str) -> None:
    """Repair a crash that hit mid-swap in :func:`upsert_rollup`: a
    ``dt=X__old`` dir with no live ``dt=X`` means the old partition was
    moved aside but its replacement never landed — restore it. A stale
    ``__old`` NEXT TO a live partition lost the race after the new dir
    landed — drop it. (Same two-rename recovery contract as
    compact_parquet.)"""
    import glob
    import os
    import shutil

    for old in glob.glob(os.path.join(path, "dt=*__old")):
        live = old[: -len("__old")]
        if os.path.exists(live):
            shutil.rmtree(old)
        else:
            os.rename(old, live)


def upsert_rollup(
    spark,
    path: str,
    batch: DataFrame,
    key_cols: "tuple[str, ...]" = ("bucket_ms",),
) -> None:
    """MERGE-style upsert into a dt-partitioned parquet rollup: rows
    of ``batch`` REPLACE table rows with equal ``key_cols`` (slot
    identity), other rows are kept. This is the plain-parquet stand-in
    for the Delta/Iceberg ``MERGE`` a production cluster would run
    from a streaming ``foreachBatch`` — the rollup lives in a TABLE,
    not driver memory, so it survives restarts and is readable by any
    session at any scale.

    Cost per call is O(touched dt partitions), never the whole table:
    only the partitions ``batch`` touches are read (partition-pruned),
    anti-joined against the batch's slot keys, unioned with the batch,
    staged to a temp dir, and swapped in with per-partition atomic
    renames. Crash safety: a torn swap is repaired on the next call
    (:func:`_recover_torn_partitions`); re-applying the same batch is
    IDEMPOTENT (batch rows carry CURRENT totals under update output
    mode), so an epoch replayed after a partial apply converges."""
    import os
    import shutil

    _recover_torn_partitions(path)
    tagged = batch.withColumn("dt", _dt_col())
    if not os.path.exists(path):
        (
            tagged.repartition("dt")
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(path)
        )
        return
    # touched days only — bounded by the batch's slot span, not table size
    dts = [r["dt"] for r in tagged.select("dt").distinct().collect()]
    if not dts:
        return
    old = spark.read.parquet(path).filter(F.col("dt").isin(dts))
    merged = old.join(
        tagged.select(*key_cols).distinct(), list(key_cols), "left_anti"
    ).unionByName(tagged.select(*old.columns))
    tmp = path.rstrip("/") + "__upsert_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    (
        merged.repartition("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(tmp)
    )
    for dt in dts:
        src = os.path.join(tmp, f"dt={dt}")
        dst = os.path.join(path, f"dt={dt}")
        old_dir = dst + "__old"
        if os.path.exists(dst):
            os.rename(dst, old_dir)
        os.rename(src, dst)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
    shutil.rmtree(tmp)
