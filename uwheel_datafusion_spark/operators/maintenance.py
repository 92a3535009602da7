"""Self-deciding index maintenance (round 12 — VERDICT r11 next #1).

Erasure and small-file compaction were fully correct but fully MANUAL:
an operator had to decide when to pay the rewrite. This module adds
the merge policy — the role Lucene's TieredMergePolicy plays for
segment merges — as a pure inspector (:func:`maintenance_due`) plus an
opt-in executor (:func:`auto_compact`) for every compactable family in
the repo:

- the cell-partitioned ANN tables (IVF payload / PQ codes) —
  ann_serving.compact_partitioned_table;
- the keyword index root (postings + positions + stats rebase) —
  textops.compact_keyword_index;
- the flat/dt-partitioned rollup tables — rollup_io.compact_parquet.

Policy signals, all exact integers so the DuckDB oracle can replay the
decision (``similarity_ann_auto_compacted``):

- ``tombstone_fraction_ppm`` = masked_rows·10⁶ DIV total_rows — the
  fraction of stored rows a probe anti-joins away. Masked rows are
  counted by semi-joining the STORED table against the tombstones
  (a tombstone for a never-stored or already-erased id costs nothing
  and must not trigger a rewrite).
- ``files_per_partition_x100`` = n_files·100 DIV n_partitions — the
  small-file pressure an append-heavy lifecycle accumulates (each
  extend/stream batch adds ≥1 file per touched partition; probes pay
  one open per file).

``due`` when either crosses its threshold. Defaults (20% tombstones,
4 files/partition) follow the Lucene deletes_pct_allowed≈20 /
segments-per-tier shape; both are knobs.

The inspector runs AGAINST the same consistency rules probes follow:
it refuses cleanly while a maintenance marker or the lock is present
(a due-check mid-compaction would count a half-swapped table).
Everything is one column-pruned read (id + partition col only) plus
one fs listing — cheap enough for a scheduler to poll.

Design for 100 TB: the counts are a single map-side-combined groupBy
over the id/partition columns only (parquet column pruning keeps the
vectors/codes unread); the tombstone semi-join broadcasts the (small)
tombstone side. No driver-side iteration over rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators.util import (
    assert_not_mid_maintenance,
    fs_count_files,
    fs_exists,
    fs_list_names,
)

#: Lucene's TieredMergePolicy ships deletes_pct_allowed = 20.0 — the
#: same default here, in ppm so the arithmetic is integer-exact.
DEFAULT_TOMBSTONE_PPM = 200_000
#: Files per partition before small-file pressure alone justifies a
#: rewrite (each probe pays an open per file).
DEFAULT_MAX_FILES_PER_PARTITION = 4


def _refuse_if_maintaining(spark: SparkSession, path: str) -> None:
    assert_not_mid_maintenance(
        spark, f"{path}__compacting", f"{path}__swap_old"
    )
    lock = f"{path}__maintenance_lock"
    if fs_exists(spark, lock):
        raise RuntimeError(
            f"{lock} exists: a compaction of {path} is in flight — a "
            "due-check now would count a half-swapped table. Re-run "
            "after it finishes (or after recover_compaction if the "
            "holder crashed)."
        )


def maintenance_due(
    spark: SparkSession,
    path: str,
    partition_col: str = "cell",
    id_col: str = "vec_id",
    tombstone_path: str | None = None,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    max_files_per_partition: int = DEFAULT_MAX_FILES_PER_PARTITION,
) -> dict:
    """Inspect ONE cell/bucket-partitioned table and decide whether a
    compaction is due. Returns a plain dict (all ints/strings/bools):
    total_rows, masked_rows, tombstone_fraction_ppm, n_files,
    n_partitions, files_per_partition_x100, due_tombstones, due_files,
    due, recommendation ('compact' | 'ok'). Refuses while the table is
    mid-maintenance (marker or lock present)."""
    _refuse_if_maintaining(spark, path)
    if tombstone_path is None:
        cand = f"{path}_tombstones"
        tombstone_path = cand if fs_exists(spark, cand) else None
    rows = spark.read.schema(
        f"{id_col} long, {partition_col} long"
    ).parquet(path)
    total_rows = rows.count()
    masked_rows = 0
    if tombstone_path is not None:
        dead = spark.read.schema(f"{id_col} long").parquet(tombstone_path)
        masked_rows = rows.join(
            F.broadcast(dead), id_col, "left_semi"
        ).count()
    n_files = fs_count_files(spark, path)
    n_partitions = len(fs_list_names(spark, path, f"{partition_col}="))
    frac_ppm = (masked_rows * 1_000_000) // total_rows if total_rows else 0
    fpp_x100 = (n_files * 100) // n_partitions if n_partitions else 0
    due_tombstones = frac_ppm >= tombstone_threshold_ppm
    due_files = fpp_x100 >= max_files_per_partition * 100
    due = due_tombstones or due_files
    return {
        "total_rows": total_rows,
        "masked_rows": masked_rows,
        "tombstone_fraction_ppm": frac_ppm,
        "n_files": n_files,
        "n_partitions": n_partitions,
        "files_per_partition_x100": fpp_x100,
        "due_tombstones": due_tombstones,
        "due_files": due_files,
        "due": due,
        "recommendation": "compact" if due else "ok",
    }


def auto_compact(
    spark: SparkSession,
    path: str,
    partition_col: str = "cell",
    id_col: str = "vec_id",
    sort_cols: tuple = ("vec_id",),
    schema: str | None = None,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    max_files_per_partition: int = DEFAULT_MAX_FILES_PER_PARTITION,
    stream_retired: bool = False,
    steal_lock: bool = False,
) -> dict:
    """Due-check then compact-if-due, in one call — the scheduler
    entry point. Returns the :func:`maintenance_due` dict plus
    ``compacted`` and (when compacted) ``files_after``. NOT atomic
    with respect to a concurrent compaction starting between the check
    and the rewrite — but compact_partitioned_table's own lock turns
    that race into a clean refusal, never a double-maintenance."""
    from uwheel_datafusion_spark.operators.ann_serving import (
        compact_partitioned_table,
    )

    out = maintenance_due(
        spark,
        path,
        partition_col=partition_col,
        id_col=id_col,
        tombstone_threshold_ppm=tombstone_threshold_ppm,
        max_files_per_partition=max_files_per_partition,
    )
    out["compacted"] = False
    if out["due"]:
        out["files_after"] = compact_partitioned_table(
            spark,
            path,
            partition_col=partition_col,
            sort_cols=sort_cols,
            schema=schema,
            id_col=id_col,
            stream_retired=stream_retired,
            steal_lock=steal_lock,
        )
        out["compacted"] = True
    return out


def keyword_maintenance_due(
    spark: SparkSession,
    path: str,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    max_files_per_partition: int = DEFAULT_MAX_FILES_PER_PARTITION,
) -> dict:
    """Keyword-index twin over the ROOT (postings + optional
    positions share one doc_id tombstone set): per-subtable signals,
    due when ANY subtable is due. Refuses while the root lock (ADVICE
    r11 #4) or a subtable marker is present."""
    root_lock = f"{path}__maintenance_lock"
    if fs_exists(spark, root_lock):
        raise RuntimeError(
            f"{root_lock} exists: keyword maintenance of {path} is in "
            "flight — re-run the due-check after it finishes."
        )
    tomb = f"{path}/tombstones"
    tomb_arg = tomb if fs_exists(spark, tomb) else None
    sub = {}
    for name, id_col in (("postings", "doc_id"), ("positions", "doc_id")):
        sub_path = f"{path}/{name}"
        if not fs_exists(spark, sub_path):
            continue
        sub[name] = maintenance_due(
            spark,
            sub_path,
            partition_col="bucket",
            id_col=id_col,
            tombstone_path=tomb_arg,
            tombstone_threshold_ppm=tombstone_threshold_ppm,
            max_files_per_partition=max_files_per_partition,
        )
    due = any(s["due"] for s in sub.values())
    return {
        "subtables": sub,
        "due": due,
        "recommendation": "compact" if due else "ok",
    }


def auto_compact_keyword(
    spark: SparkSession,
    path: str,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    max_files_per_partition: int = DEFAULT_MAX_FILES_PER_PARTITION,
    stream_retired: bool = False,
    steal_lock: bool = False,
) -> dict:
    """Due-check then compact_keyword_index-if-due (the whole family:
    both subtables, stats rebase, shared-tombstone fold)."""
    from uwheel_datafusion_spark.operators.textops import (
        compact_keyword_index,
    )

    out = keyword_maintenance_due(
        spark,
        path,
        tombstone_threshold_ppm=tombstone_threshold_ppm,
        max_files_per_partition=max_files_per_partition,
    )
    out["compacted"] = False
    if out["due"]:
        out["result"] = compact_keyword_index(
            spark,
            path,
            stream_retired=stream_retired,
            steal_lock=steal_lock,
        )
        out["compacted"] = True
    return out


def rollup_maintenance_due(
    spark: SparkSession,
    path: str,
    max_files: int = 8,
) -> dict:
    """Rollup-table twin: no tombstones (upsert_rollup rewrites
    partitions in place), so the only signal is small-file pressure —
    a flat rollup should be O(1) files, a dt-partitioned one O(1) per
    dt dir. Refuses mid-maintenance like the index inspectors."""
    assert_not_mid_maintenance(
        spark,
        path.rstrip("/") + "__compact_tmp",
        path.rstrip("/") + "__compact_old",
    )
    n_files = fs_count_files(spark, path)
    dt_parts = len(fs_list_names(spark, path, "dt="))
    budget = max_files * max(1, dt_parts)
    due = n_files > budget
    return {
        "n_files": n_files,
        "n_partitions": dt_parts,
        "file_budget": budget,
        "due": due,
        "recommendation": "compact" if due else "ok",
    }


def auto_compact_rollup(
    spark: SparkSession,
    path: str,
    max_files: int = 8,
    target_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """Due-check then rollup_io.compact_parquet-if-due."""
    from uwheel_datafusion_spark.operators.rollup_io import compact_parquet

    out = rollup_maintenance_due(spark, path, max_files=max_files)
    out["compacted"] = False
    if out["due"]:
        res = compact_parquet(
            spark, path, target_mb=target_mb, partition_col=partition_col
        )
        out["compacted"] = True
        out["files_after"] = res["files_after"]
    return out


def manifest_maintenance_due(
    spark: SparkSession,
    root: str,
    max_generations: int = 4,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    id_col: str = "vec_id",
    aux: bool = False,
    live_units_key: "str | None" = None,
) -> dict:
    """Merge-policy inspector for MANIFEST tables (round 13 — VERDICT
    r12 next #6): every signal comes from the committed snapshot —
    generation count and tombstone dirs are IN the manifest, and the
    row counts are parquet metadata reads (count(*) over footer stats,
    no data pages) — so the check needs NO directory listing and NO
    refusal window at all: a snapshot read is consistent by
    construction even while a compaction runs (the one structural
    advantage over the dir-swap inspectors, which must refuse
    mid-maintenance).

    Signals:
    - ``n_generations`` — each probe unions one scan per generation
      (LSM read amplification; Lucene's segments-per-tier signal);
    - ``tombstone_fraction_ppm`` = tombstone_rows·10⁶ DIV total_rows —
      the anti-join mass probes pay (deletes_pct_allowed signal).
    ``aux=True`` counts extra["aux_dirs"] generations too (keyword
    positions). ``live_units_key`` names an exact live-unit counter in
    the snapshot's extra (the keyword family's ``n_docs``): tombstones
    are DOC-grained there while data rows are POSTING-grained, so the
    honest deletes fraction is tombstoned docs over (live + tombstoned)
    docs — read entirely from the manifest, zero table access.
    ``due`` when either signal crosses its threshold."""
    from uwheel_datafusion_spark.operators.manifest import manifest_latest

    snap = manifest_latest(spark, root)
    if snap is None:
        raise ValueError(f"{root}: no committed manifest generation")
    n_gens = len(snap.data_dirs)
    if aux:
        n_gens = max(n_gens, len(snap.extra.get("aux_dirs", ())))

    def _count(dirs, schema):
        total = 0
        for d in dirs:
            total += (
                spark.read.schema(schema)
                .parquet(f"{root}/{d}")
                .count()
            )
        return total

    tomb_rows = _count(snap.tombstone_dirs, f"{id_col} long")
    if live_units_key is not None:
        total_rows = int(snap.extra[live_units_key]) + tomb_rows
    else:
        total_rows = _count(snap.data_dirs, f"{id_col} long")
    frac_ppm = (tomb_rows * 1_000_000) // total_rows if total_rows else 0
    due_generations = n_gens > max_generations
    due_tombstones = frac_ppm >= tombstone_threshold_ppm
    due = due_generations or due_tombstones
    return {
        "gen": snap.gen,
        "n_generations": n_gens,
        "n_tombstone_dirs": len(snap.tombstone_dirs),
        "total_rows": total_rows,
        "tombstone_rows": tomb_rows,
        "tombstone_fraction_ppm": frac_ppm,
        "due_generations": due_generations,
        "due_tombstones": due_tombstones,
        "due": due,
        "recommendation": "compact" if due else "ok",
    }


def auto_compact_manifest(
    spark: SparkSession,
    root: str,
    partition_col: str = "cell",
    sort_cols: tuple = ("vec_id",),
    schema: str | None = None,
    id_col: str = "vec_id",
    max_generations: int = 4,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
) -> dict:
    """Due-check then manifest_table_compact-if-due — the scheduler
    entry point for manifest ANN/index tables. Vacuum stays separate
    (its grace window is a retention decision, not a merge decision)."""
    from uwheel_datafusion_spark.operators.manifest import (
        manifest_table_compact,
    )

    out = manifest_maintenance_due(
        spark,
        root,
        max_generations=max_generations,
        tombstone_threshold_ppm=tombstone_threshold_ppm,
        id_col=id_col,
    )
    out["compacted"] = False
    if out["due"]:
        snap = manifest_table_compact(
            spark,
            root,
            partition_col=partition_col,
            sort_cols=sort_cols,
            schema=schema,
            id_col=id_col,
            steal_lock=steal_lock,
            stale_lock_after_sec=stale_lock_after_sec,
        )
        out["compacted"] = True
        out["generations_after"] = len(snap.data_dirs)
    return out


def auto_compact_keyword_manifest(
    spark: SparkSession,
    root: str,
    max_generations: int = 4,
    tombstone_threshold_ppm: int = DEFAULT_TOMBSTONE_PPM,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
) -> dict:
    """Keyword-manifest twin: the due-check reads doc_id tombstone
    mass + postings/positions generation counts from the snapshot;
    compaction is compact_keyword_index_manifest (postings AND
    positions fold, stats unchanged — deletes corrected them at their
    own commits)."""
    from uwheel_datafusion_spark.operators.textops import (
        compact_keyword_index_manifest,
    )

    out = manifest_maintenance_due(
        spark,
        root,
        max_generations=max_generations,
        tombstone_threshold_ppm=tombstone_threshold_ppm,
        id_col="doc_id",
        aux=True,
        live_units_key="n_docs",
    )
    out["compacted"] = False
    if out["due"]:
        snap = compact_keyword_index_manifest(
            spark,
            root,
            steal_lock=steal_lock,
            stale_lock_after_sec=stale_lock_after_sec,
        )
        out["compacted"] = True
        out["generations_after"] = len(snap.data_dirs)
    return out


def auto_compact_rollup_manifest(
    spark: SparkSession,
    root: str,
    max_generations: int = 8,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
) -> dict:
    """Manifest-rollup twin: per-epoch generations accumulate one per
    trigger, so the only signal is generation count (no tombstones in
    the rollup family — newer generations supersede by key)."""
    from uwheel_datafusion_spark.operators.manifest import manifest_latest
    from uwheel_datafusion_spark.operators.rollup_io import (
        manifest_rollup_compact,
    )

    snap = manifest_latest(spark, root)
    if snap is None:
        raise ValueError(f"{root}: no committed manifest generation")
    n_gens = len(snap.data_dirs)
    due = n_gens > max_generations
    out = {
        "gen": snap.gen,
        "n_generations": n_gens,
        "due": due,
        "recommendation": "compact" if due else "ok",
        "compacted": False,
    }
    if due:
        folded = manifest_rollup_compact(
            spark,
            root,
            steal_lock=steal_lock,
            stale_lock_after_sec=stale_lock_after_sec,
        )
        out["compacted"] = True
        out["generations_after"] = len(folded.data_dirs)
    return out
