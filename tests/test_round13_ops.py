"""Round-13 hardening: torn-tmp frame validation, steal re-stamps the
heartbeat, vacuum retention coherence + manifest_read_at, merge-window
tombstone survival, concurrent manifest-delete rebase."""

import os
import time

import pytest
from pyspark.sql import functions as F

import uwheel_datafusion_spark.operators.ann_serving as srv
import uwheel_datafusion_spark.operators.manifest as mf
import uwheel_datafusion_spark.operators.similarity as sim
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


def _parity(got_df, want_df):
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(tuple, want_df.collect())
    )


def test_residual_served_bit_parity(spark, tmp_path):
    """VERDICT r12 next #1: the served codes table can now carry
    RESIDUAL codes — search must be bit-identical to the in-memory
    residual path (same per-(query, probed-cell) LUTs, same
    tie-breaks), so the same DuckDB oracle gates both."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qids = (1, 2, 3)
    ivf = sim.ivf_build_wide(emb, n_cells=8)
    rpq = sim.pq_build_residual(emb, ivf, m=8, k=16)
    served = srv.save_ivfpq_payload_residual(rpq, str(tmp_path / "codes"))
    assert served.residual and not served.rotated
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        "vec_id", "embedding"
    )
    got = srv.ivfpq_search_served(served, queries, topk=5, nprobe=3)
    want = sim.ivfpq_search_residual(rpq, emb, qids, topk=5, nprobe=3)
    _parity(got, want)
    ivf.cells.unpersist()
    rpq.codes.unpersist()


def test_rotated_residual_served_bit_parity(spark, tmp_path):
    """The Hadamard pre-rotation composes: coarse cells + residual
    codebooks trained in rotated space, queries rotated driver-side —
    served search ≡ in-memory rotate-aware residual search, and the
    two-stage rerank refines RAW-space from the rotated-cell IVF
    payload."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qids = (1, 2, 3)
    ivf = sim.ivf_build_wide(emb, n_cells=8, rotate=True)
    rpq = sim.pq_build_residual(emb, ivf, m=8, k=16, rotate=True)
    served = srv.save_ivfpq_payload_residual(
        rpq, str(tmp_path / "codes"), rotated=True
    )
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        "vec_id", "embedding"
    )
    got = srv.ivfpq_search_served(served, queries, topk=5, nprobe=3)
    want = sim.ivfpq_search_residual(
        rpq, emb, qids, topk=5, nprobe=3, rotate=True
    )
    _parity(got, want)
    # rerank: candidates rotated-residual, refine exact raw-space from
    # the IVF payload partitioned by the SAME rotated-space quantizer
    ivf_served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "payload"))
    rr = srv.ivfpq_rerank_served(
        served, ivf_served, queries, topk=5, nprobe=3, n_candidates=10
    )
    rows = rr.collect()
    assert {r.query_id for r in rows} == set(qids)
    assert all(r.rnk <= 5 for r in rows)
    ivf.cells.unpersist()
    rpq.codes.unpersist()


def test_sample_trained_kmeans_deterministic(spark):
    """Sample-trained k-means (VERDICT r12 next #2/#3) must be
    invariant to physical partitioning: the hash-ranked training
    prefix and init are a total order on vec_id, so two builds over
    differently-partitioned inputs yield identical centroids."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sim.ivf_build_wide(emb.repartition(7), n_cells=8, train_sample=100)
    b = sim.ivf_build_wide(emb, n_cells=8, train_sample=100)
    assert a.centroids == b.centroids
    # and the final assignment is exact over the FULL corpus: every
    # vec_id present exactly once
    n = emb.count()
    assert a.cells.count() == n and b.cells.count() == n
    a.cells.unpersist()
    b.cells.unpersist()


def test_manifest_rollup_epoch_guard_and_compact(spark, tmp_path):
    """Manifest rollup sink semantics (VERDICT r12 next #5): replayed
    epochs are no-ops read from the commit log itself, newer
    generations win per slot key, compaction folds to one dir with the
    guard intact, and a foreign checkpoint is refused."""
    import uwheel_datafusion_spark.operators.rollup_io as rio

    root = str(tmp_path / "r")

    def batch(rows):
        return spark.createDataFrame(
            rows, "bucket_ms long, sum_micros long, cnt long"
        )

    day = 86_400_000
    s1 = rio.manifest_rollup_append(
        spark, root, batch([(0, 10, 1), (day, 20, 2)]),
        epoch=0, checkpoint="ck",
    )
    assert s1.gen == 1 and s1.extra["epoch"] == 0
    # replayed epoch: no-op
    assert rio.manifest_rollup_append(
        spark, root, batch([(0, 99, 9)]), epoch=0, checkpoint="ck"
    ) is None
    # newer epoch updates slot 0 (current totals), adds a slot
    rio.manifest_rollup_append(
        spark, root, batch([(0, 30, 3), (2 * day, 5, 1)]),
        epoch=1, checkpoint="ck",
    )
    got = sorted(
        (r.bucket_ms, r.sum_micros, r.cnt)
        for r in rio.manifest_rollup_read(spark, root).collect()
    )
    want = [(0, 30, 3), (day, 20, 2), (2 * day, 5, 1)]
    assert got == want
    # foreign checkpoint refused
    with pytest.raises(ValueError, match="checkpoint"):
        rio.manifest_rollup_append(
            spark, root, batch([(0, 1, 1)]), epoch=9, checkpoint="other"
        )
    # auto-compact policy: 2 generations, threshold 1 → due, folds
    from uwheel_datafusion_spark.operators import maintenance as mnt

    out = mnt.auto_compact_rollup_manifest(spark, root, max_generations=1)
    assert out["due"] and out["compacted"] and out["generations_after"] == 1
    assert sorted(
        (r.bucket_ms, r.sum_micros, r.cnt)
        for r in rio.manifest_rollup_read(spark, root).collect()
    ) == want
    # guard survived the fold: epoch 1 still replay-refused
    assert rio.manifest_rollup_append(
        spark, root, batch([(0, 1, 1)]), epoch=1, checkpoint="ck"
    ) is None
    # empty batch: no commit, no schemaless dir
    gen_before = mf.manifest_latest(spark, root).gen
    assert rio.manifest_rollup_append(
        spark, root, batch([]).limit(0), epoch=7, checkpoint="ck"
    ) is None
    assert mf.manifest_latest(spark, root).gen == gen_before


def test_keyword_manifest_auto_compact(spark, tmp_path):
    """Keyword-manifest policy (VERDICT r12 next #6): tombstone mass
    from the snapshot triggers the fold; stats ride unchanged."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ids = sorted(
        r.doc_id
        for r in docs.select("doc_id").orderBy("doc_id").limit(20).collect()
    )
    docs = docs.filter(F.col("doc_id").isin(ids))
    root = str(tmp_path / "kw")
    tx.build_keyword_index_manifest(docs, root, with_positions=True)
    pre = mnt.auto_compact_keyword_manifest(spark, root)
    assert not pre["due"] and not pre["compacted"]
    tx.delete_docs_from_index_manifest(spark, root, ids[:5])  # 25%
    out = mnt.auto_compact_keyword_manifest(spark, root)
    assert out["due_tombstones"] and out["compacted"]
    snap = mf.manifest_latest(spark, root)
    assert len(snap.data_dirs) == 1 and snap.tombstone_dirs == ()
    hits = tx.keyword_manifest_bm25_probe(spark, root, k=50).collect()
    assert not ({r.doc_id for r in hits} & set(ids[:5]))


def test_vacuum_horizon_expiry_ignores_age_gate(spark, tmp_path):
    """code-review r13 #6: dirs falling OUT of the retention horizon
    (their last referencing manifest expired this call) are committed
    history — deleted regardless of min_age_sec; the age gate protects
    only true ORPHANS (possibly a concurrent writer's staging)."""
    root = str(tmp_path / "t")
    mf.manifest_table_append(spark, root, _df(spark, 0, 40))   # gen 1
    mf.manifest_table_compact(                                  # gen 2
        spark, root, schema="vec_id long, payload long, cell long"
    )
    # a fresh never-committed dir: a writer may still be staging it
    (
        _df(spark, 90, 95)
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .parquet(f"{root}/data-orphan0000")
    )
    removed = mf.manifest_vacuum(
        spark, root, min_age_sec=3600, keep_manifests=1
    )
    # gen 1's manifest expired -> its folded-away dir went with it,
    # young or not; the young orphan survived the age gate
    assert len(removed["dirs"]) == 1
    assert removed["dirs"][0] != "data-orphan0000"
    assert util.fs_exists(spark, f"{root}/data-orphan0000")
    assert _rows(spark, root) == _expect(range(40))


def test_cosine_refine_full_probe_equals_flat_cosine(spark, tmp_path):
    """Semantic anchor for the cosine refine (round 13): with every
    cell probed and the candidate budget covering the corpus, the
    two-stage cosine rerank must equal the IVF-Flat cosine tier's
    top-k exactly — same metric, same tie-breaks, the compressed tier
    collapses onto the exact one."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    qids = (1, 2, 3)
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    rpq = sim.pq_build_residual(emb, ivf, m=8, k=16)
    ivf_served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "pay"))
    pq_served = srv.save_ivfpq_payload_residual(
        rpq, str(tmp_path / "codes")
    )
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        "vec_id", "embedding"
    )
    got = srv.ivfpq_rerank_served(
        pq_served, ivf_served, queries, topk=5, nprobe=4,
        n_candidates=n, metric="cosine",
    )
    want = srv.ivf_search_served(ivf_served, queries, k=5, nprobe=4)
    assert sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rnk)
        for r in got.collect()
    ) == sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rnk)
        for r in want.collect()
    )
    ivf.cells.unpersist()
    rpq.codes.unpersist()
