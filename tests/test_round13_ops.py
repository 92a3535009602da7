"""Round-13 hardening: torn-tmp frame validation, steal re-stamps the
heartbeat, vacuum retention coherence + manifest_read_at, merge-window
tombstone survival, concurrent manifest-delete rebase."""

import os
import time

import pytest
from pyspark.sql import functions as F

import uwheel_datafusion_spark.operators.ann_serving as srv
import uwheel_datafusion_spark.operators.manifest as mf
import uwheel_datafusion_spark.operators.textops as tx
import uwheel_datafusion_spark.operators.util as util
from uwheel_datafusion_spark.sources.registry import load_table


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("cell"),
        (F.col("id") * 7).alias("payload"),
    )


def _rows(spark, root, snapshot=None):
    return sorted(
        tuple(r)
        for r in mf.manifest_table_read(
            spark, root, schema="vec_id long, payload long, cell long",
            snapshot=snapshot,
        ).collect()
    )


def _expect(rng):
    return sorted((i, i * 7, i % 4) for i in rng)


def test_torn_tmp_is_refused_complete_tmp_served(spark, tmp_path):
    """ADVICE r12 #2: the .tmp fallback must distinguish a COMPLETE
    tmp (crash between overwrite's delete and rename — serve it) from
    a TORN one (crash mid tmp-write — refuse it). The frame header
    (sha256 + byte length) decides."""
    p = str(tmp_path / "m" / "marker.txt")
    util.fs_write_text(spark, p, "cell=0\ncell=1\ncell=2")
    # complete tmp, main deleted (mid-overwrite crash): served
    util.fs_write_text(spark, p + ".staged", "cell=0\ncell=1")
    os.replace(p + ".staged", p + ".tmp")
    os.remove(p)
    assert util.fs_read_text(spark, p) == "cell=0\ncell=1"
    # TORN tmp (truncated mid-write on a first write): refused — a
    # truncated _STAGED_PARTS served as truth would erase partitions
    q = str(tmp_path / "m" / "other.txt")
    framed = util._frame_text("cell=0\ncell=1\ncell=2")
    with open(q + ".tmp", "w") as f:
        f.write(framed[: len(framed) - 7])  # lost tail
    assert util.fs_read_text(spark, q) is None
    # unframed (legacy / foreign) tmp: completeness unknowable → refused
    r = str(tmp_path / "m" / "legacy.txt")
    with open(r + ".tmp", "w") as f:
        f.write("cell=0")
    assert util.fs_read_text(spark, r) is None
    # but an unframed MAIN file still reads (rename only publishes
    # complete files there; pre-framing markers keep working)
    with open(r, "w") as f:
        f.write("cell=0")
    assert util.fs_read_text(spark, r) == "cell=0"


def test_steal_restamps_heartbeat(spark, tmp_path):
    """ADVICE r12 #1 (second half): stealing a stale lock must stamp a
    FRESH heartbeat, else the stolen lock still reads stale and a
    second scheduler steals it too — two concurrent compactions."""
    lock = str(tmp_path / "t__maintenance_lock")
    assert util.fs_try_lock(spark, lock)
    # freeze the holder's heartbeat in the stale past
    util.fs_write_text(spark, lock + ".hb", repr(time.time() - 3600))
    assert util.fs_lock_age_sec(spark, lock) > 3000
    # a second caller steals on staleness — and re-stamps
    util.fs_acquire_lock(spark, lock, stale_lock_after_sec=60)
    assert util.fs_lock_age_sec(spark, lock) < 30
    # so a THIRD caller in the same window is refused, not double-stolen
    with pytest.raises(RuntimeError, match="steal_lock"):
        util.fs_acquire_lock(spark, lock, stale_lock_after_sec=60)
    util.fs_release_lock(spark, lock)


def test_compaction_refreshes_heartbeat_mid_job(spark, tmp_path):
    """ADVICE r12 #1 (first half): the manifest compactor must stamp
    the heartbeat at stage boundaries (around the fold — the long
    Spark job), not only at acquisition."""
    root = str(tmp_path / "t")
    mf.manifest_table_append(spark, root, _df(spark, 0, 40))
    stamps = []
    real = util.fs_heartbeat

    def counting(sp, lock):
        stamps.append(lock)
        return real(sp, lock)

    util.fs_heartbeat = counting
    try:
        mf.manifest_table_compact(
            spark, root, schema="vec_id long, payload long, cell long"
        )
    finally:
        util.fs_heartbeat = real
    # acquisition + before-fold + after-fold at minimum
    assert len(stamps) >= 3


def test_vacuum_keeps_dirs_of_all_retained_manifests(spark, tmp_path):
    """ADVICE r12 #3 / VERDICT r12 next #4: vacuum's live set is the
    union over ALL retained manifests, so keep_manifests is the real
    time-travel horizon — a retained gen N−1 stays fully readable
    (manifest_read_at) after the vacuum that follows a compaction."""
    root = str(tmp_path / "t")
    mf.manifest_table_append(spark, root, _df(spark, 0, 40))   # gen 1
    mf.manifest_table_append(spark, root, _df(spark, 40, 60))  # gen 2
    snap3 = mf.manifest_table_compact(                         # gen 3
        spark, root, schema="vec_id long, payload long, cell long"
    )
    removed = mf.manifest_vacuum(spark, root, min_age_sec=0, keep_manifests=2)
    # gen 2 is retained and references BOTH original data dirs: they
    # must survive even though the latest snapshot folded them away
    assert removed["dirs"] == []
    old = mf.manifest_read_at(spark, root, snap3.gen - 1)
    assert set(old.data_dirs) and set(old.data_dirs) != set(snap3.data_dirs)
    assert _rows(spark, root, snapshot=old) == _expect(range(60))
    assert _rows(spark, root) == _expect(range(60))
    # shrinking the horizon to 1 expires gen 2's manifest AND its
    # exclusively-referenced dirs; read-at then refuses loudly
    removed = mf.manifest_vacuum(spark, root, min_age_sec=0, keep_manifests=1)
    assert len(removed["dirs"]) == 2 and len(removed["manifests"]) >= 1
    with pytest.raises(ValueError, match="retention horizon"):
        mf.manifest_read_at(spark, root, snap3.gen - 1)
    assert _rows(spark, root) == _expect(range(60))


def test_merge_window_delete_survives(spark, tmp_path):
    """ADVICE r12 #4: a lock-free delete landing between the merge's
    staging read and its roll-forward must stay masked afterwards —
    the roll-forward folds only the tombstone part-files the rewrite
    applied (_TOMB_SNAPSHOT), re-homing delta-side arrivals."""
    schema = "vec_id long, payload long, cell long"
    base, delta = str(tmp_path / "b"), str(tmp_path / "d")
    for path, lo, hi in ((base, 0, 40), (delta, 40, 80)):
        (
            _df(spark, lo, hi)
            .repartition(F.col("cell"))
            .write.partitionBy("cell")
            .parquet(path)
        )
    srv.delete_vectors_from_index(spark, base, [0])
    srv.delete_vectors_from_index(spark, delta, [44])

    def late_deletes():
        # inside the merge window: one arrival on each generation
        srv.delete_vectors_from_index(spark, base, [8])
        srv.delete_vectors_from_index(spark, delta, [52])

    srv.merge_generations(
        spark, base, delta, schema=schema, _before_commit=late_deletes
    )
    raw = spark.read.schema(schema).parquet(base)
    dead = spark.read.schema("vec_id long").parquet(f"{base}_tombstones")
    live = raw.join(dead, "vec_id", "left_anti")
    got = sorted(r.vec_id for r in live.collect())
    # 0 and 44 physically erased by the rewrite; 8 and 52 still masked
    # by the surviving tombstones (they were appended after the read)
    assert got == [i for i in range(80) if i not in (0, 8, 44, 52)]
    assert not os.path.exists(delta)
    assert not os.path.exists(f"{delta}_tombstones")
    # the next compaction erases the survivors physically
    srv.compact_partitioned_table(spark, base, schema=schema)
    raw2 = sorted(
        r.vec_id
        for r in spark.read.schema(schema).parquet(base).collect()
    )
    assert raw2 == [i for i in range(80) if i not in (0, 8, 44, 52)]
    assert not os.path.exists(f"{base}_tombstones")


def test_manifest_delete_concurrent_overlap_rebases(spark, tmp_path):
    """ADVICE r12 #5: two CONCURRENT overlapping delete batches — the
    loser's optimistic retry must re-run the idempotence anti-join
    against the winner's just-committed tombstones, so the overlap is
    subtracted from (n_docs, total_dl) exactly once."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ids = sorted(
        r.doc_id
        for r in docs.select("doc_id").orderBy("doc_id").limit(30).collect()
    )
    docs = docs.filter(F.col("doc_id").isin(ids))
    root = str(tmp_path / "kw")
    tx.build_keyword_index_manifest(docs, root)
    base = mf.manifest_latest(spark, root)
    batch1, batch2 = ids[:4], ids[2:6]  # overlap = ids[2:4]
    real_commit = mf.manifest_commit
    fired = {"done": False}

    def racy(sp, r, **kw):
        if not fired["done"]:
            fired["done"] = True
            # the competing batch commits first — the outer caller's
            # in-flight attempt then conflicts and rebases
            n2 = tx.delete_docs_from_index_manifest(sp, root, batch2)
            assert n2 == len(batch2)
        return real_commit(sp, r, **kw)

    mf.manifest_commit = racy
    try:
        n1 = tx.delete_docs_from_index_manifest(spark, root, batch1)
    finally:
        mf.manifest_commit = real_commit
    # the loser deduped the overlap on retry
    assert n1 == len(set(batch1) - set(batch2))
    snap = mf.manifest_latest(spark, root)
    union = sorted(set(batch1) | set(batch2))
    # stats were corrected EXACTLY once per id (the double-subtraction
    # the unrebased dedup would have committed is 2 ids here)
    assert int(snap.extra["n_docs"]) == int(base.extra["n_docs"]) - len(union)
    # every probe masks the union
    hits = tx.keyword_manifest_probe(spark, root, k=50).collect()
    assert not ({r.doc_id for r in hits} & set(union))
