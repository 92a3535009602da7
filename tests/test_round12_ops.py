"""Round-12 additions: the four ADVICE r11 fixes pinned at the unit
level (the all-tombstoned fault injection lives in test_fs_toolkit),
plus the maintenance-policy / manifest / lock-liveness machinery added
this round."""

import os

import pytest
from pyspark.sql import functions as F

import uwheel_datafusion_spark.operators.ann_serving as srv
import uwheel_datafusion_spark.operators.similarity as sim
import uwheel_datafusion_spark.operators.textops as tx
from uwheel_datafusion_spark.operators.util import (
    fs_delete,
    fs_read_text,
    fs_try_lock,
    fs_write_text,
)
from uwheel_datafusion_spark.sources.registry import load_table


def test_binary_search_refuses_payload_without_bvec(
    spark, sf_smoke, tmp_path
):
    """ADVICE r11 #2: a payload built WITHOUT include_binary would
    read bvec as NULL and NULL-Hamming sorts FIRST in the ascending
    candidate window — the served binary tier must fail fast, not
    silently rank an arbitrary candidate subset."""
    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    served = srv.save_ivf_payload(
        ivf, emb, str(tmp_path / "plain_payload")  # no binary words
    )
    assert served.has_binary is False
    queries = emb.filter(F.col("vec_id").isin(0, 1)).select(
        "vec_id", "embedding"
    )
    with pytest.raises(ValueError, match="include_binary"):
        srv.ivf_binary_search_served(served, queries, k=3, nprobe=2)
    # the rehydration path must declare it too
    from uwheel_datafusion_spark.streaming.ann_stream import (
        served_index_from_table,
    )

    rehydrated = served_index_from_table(ivf.centroids, served.path)
    with pytest.raises(ValueError, match="include_binary"):
        srv.ivf_binary_search_served(rehydrated, queries, k=3, nprobe=2)
    ivf.cells.unpersist()


def test_fs_read_text_survives_torn_overwrite(spark, tmp_path):
    """ADVICE r11 #3: fs_write_text's overwrite is delete(dst)+rename
    (Hadoop rename does not clobber); a crash between the two leaves
    only the fully-written .tmp. fs_read_text must fall back to it so
    a torn overwrite can never erase a guard marker."""
    p = str(tmp_path / "meta" / "m.json")
    fs_write_text(spark, p, '{"epoch": 1}')
    # simulate the torn window: new content fully staged in .tmp, main
    # deleted, rename never ran
    fs_write_text(spark, p + ".staged", '{"epoch": 2}')
    os.replace(p + ".staged", p + ".tmp")
    os.remove(p)
    assert fs_read_text(spark, p) == '{"epoch": 2}'
    # a subsequent successful write consumes the tmp and wins
    fs_write_text(spark, p, '{"epoch": 3}')
    assert fs_read_text(spark, p) == '{"epoch": 3}'
    assert not os.path.exists(p + ".tmp")


def test_keyword_compaction_takes_root_level_lock(
    spark, sf_smoke, tmp_path
):
    """ADVICE r11 #4: the per-subtable locks only covered the two
    swaps — the entry recovery and the stats-rebase tail ran unlocked,
    so a concurrent compact_keyword_index could destroy the first
    run's staged stats__rebased mid-flight. A ROOT-level lock now
    spans the whole maintenance; steal_lock bypasses a dead holder's
    lock and the lock is released on completion."""
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "kw")
    tx.build_keyword_index(docs, root)
    dead = [r.doc_id for r in docs.limit(3).select("doc_id").collect()]
    tx.delete_docs_from_index(spark, root, dead)
    lock = f"{root}__maintenance_lock"
    assert fs_try_lock(spark, lock)  # simulate a live holder
    with pytest.raises(RuntimeError, match="steal_lock"):
        tx.compact_keyword_index(spark, root)
    assert os.path.exists(lock)  # refused caller did not free it
    out = tx.compact_keyword_index(spark, root, steal_lock=True)
    assert out["postings_files"] > 0
    assert not os.path.exists(lock)  # released on completion
    fs_delete(spark, lock)


def _toy_table(spark, path, n=60, cells=4):
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % cells).alias("cell"),
        (F.col("id") * 7).alias("payload"),
    )
    (
        df.repartition(F.col("cell"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def test_maintenance_due_signals(spark, tmp_path):
    """The inspector's two signals: tombstone fraction (only MASKED
    rows count — tombstones for never-stored ids are free) and
    files-per-partition pressure; integer-exact ppm arithmetic."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    path = str(tmp_path / "t")
    _toy_table(spark, path)
    out = mnt.maintenance_due(spark, path)
    assert out == {
        "total_rows": 60, "masked_rows": 0,
        "tombstone_fraction_ppm": 0, "n_files": out["n_files"],
        "n_partitions": 4,
        "files_per_partition_x100": out["files_per_partition_x100"],
        "due_tombstones": False, "due_files": out["due_files"],
        "due": out["due"], "recommendation": out["recommendation"],
    }
    # tombstone 15 of 60 stored ids (25% ≥ 20%) plus 10 never-stored
    # ids that must NOT count toward the fraction
    srv.delete_vectors_from_index(
        spark, path, list(range(0, 60, 4)) + list(range(1000, 1010))
    )
    out = mnt.maintenance_due(spark, path)
    assert out["masked_rows"] == 15
    assert out["tombstone_fraction_ppm"] == 250_000
    assert out["due_tombstones"] and out["due"]
    assert out["recommendation"] == "compact"
    # threshold is a knob
    assert not mnt.maintenance_due(
        spark, path, tombstone_threshold_ppm=300_000,
        max_files_per_partition=1_000,
    )["due"]


def test_maintenance_due_file_pressure(spark, tmp_path):
    """Append-heavy lifecycle: enough per-partition appends alone make
    the table due, with zero tombstones."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    path = str(tmp_path / "t")
    _toy_table(spark, path)
    df = spark.range(8).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("cell"),
        (F.col("id") * 7).alias("payload"),
    )
    for _ in range(5):
        df.repartition(F.col("cell")).write.partitionBy("cell").mode(
            "append"
        ).parquet(path)
    out = mnt.maintenance_due(spark, path)
    assert out["due_files"] and out["due"] and not out["due_tombstones"]
    assert out["files_per_partition_x100"] >= 400


def test_maintenance_due_refuses_mid_maintenance(spark, tmp_path):
    """A due-check during an in-flight compaction must refuse cleanly
    (it would count a half-swapped table): lock AND marker both
    refuse."""
    from uwheel_datafusion_spark.operators import maintenance as mnt
    from uwheel_datafusion_spark.operators.util import fs_mkdirs

    path = str(tmp_path / "t")
    _toy_table(spark, path)
    assert fs_try_lock(spark, f"{path}__maintenance_lock")
    with pytest.raises(RuntimeError, match="in flight"):
        mnt.maintenance_due(spark, path)
    fs_delete(spark, f"{path}__maintenance_lock")
    fs_mkdirs(spark, f"{path}__compacting")
    with pytest.raises(RuntimeError, match="recover_compaction"):
        mnt.maintenance_due(spark, path)
    fs_delete(spark, f"{path}__compacting")
    assert mnt.maintenance_due(spark, path)["total_rows"] == 60


def test_auto_compact_end_to_end(spark, tmp_path):
    """delete → due → auto_compact erases physically and the table
    returns to 'ok'; a not-due table is left untouched."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    path = str(tmp_path / "t")
    _toy_table(spark, path)
    schema = "vec_id long, payload long, cell long"
    out = mnt.auto_compact(spark, path, schema=schema)
    pre_files = out["n_files"]
    if not out["due"]:
        assert not out["compacted"]  # fresh table: nothing to do
    srv.delete_vectors_from_index(spark, path, list(range(0, 60, 4)))
    out = mnt.auto_compact(spark, path, schema=schema)
    assert out["due"] and out["compacted"]
    raw = spark.read.schema(schema).parquet(path)
    assert raw.filter(F.col("vec_id") % 4 == 0).count() == 0
    assert raw.count() == 45
    assert not os.path.exists(f"{path}_tombstones")
    after = mnt.maintenance_due(spark, path)
    assert after["recommendation"] == "ok"
    assert after["n_files"] <= pre_files


def test_keyword_auto_compact(spark, sf_smoke, tmp_path):
    """Keyword-family policy: shared doc_id tombstones over both
    subtables; auto_compact_keyword runs the full family maintenance
    (stats rebase included) and the root lock refuses the due-check."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "kw")
    tx.build_keyword_index(docs, root)
    tx.build_keyword_positions(docs, root)
    out = mnt.keyword_maintenance_due(spark, root)
    assert set(out["subtables"]) == {"postings", "positions"}
    n_docs = docs.count()
    dead = [
        r.doc_id
        for r in docs.limit(max(1, n_docs // 3)).select("doc_id").collect()
    ]
    tx.delete_docs_from_index(spark, root, dead)
    assert fs_try_lock(spark, f"{root}__maintenance_lock")
    with pytest.raises(RuntimeError, match="in flight"):
        mnt.keyword_maintenance_due(spark, root)
    fs_delete(spark, f"{root}__maintenance_lock")
    out = mnt.auto_compact_keyword(spark, root)
    assert out["due"] and out["compacted"]
    assert out["result"]["postings_files"] > 0
    raw = spark.read.parquet(f"{root}/postings")
    assert raw.filter(F.col("doc_id").isin(dead)).count() == 0
    assert not mnt.keyword_maintenance_due(spark, root)["due"]


def test_rollup_auto_compact(spark, tmp_path):
    """Rollup twin: file pressure only; compact_parquet folds the
    appended files and the inspector returns to 'ok'."""
    from uwheel_datafusion_spark.operators import maintenance as mnt

    path = str(tmp_path / "roll")
    df = spark.range(100).select(
        F.col("id").alias("bucket_ms"), F.col("id").alias("v")
    )
    df.coalesce(1).write.parquet(path)
    for _ in range(9):
        df.coalesce(1).write.mode("append").parquet(path)
    out = mnt.rollup_maintenance_due(spark, path)
    assert out["n_files"] == 10 and out["due"]
    out = mnt.auto_compact_rollup(spark, path)
    assert out["compacted"] and out["files_after"] == 1
    assert spark.read.parquet(path).count() == 1000
    assert not mnt.rollup_maintenance_due(spark, path)["due"]


def test_bulk_erasure_dataframe_overloads(spark, sf_smoke, tmp_path):
    """VERDICT r11 #4: the delete APIs accept an id DataFrame and the
    whole pipeline (request dedup, idempotence anti-join, dl recovery,
    append) stays distributed — DataFrame.collect is monkeypatched to
    raise, so any driver round-trip of the id set fails the test.
    Frame and list inputs must leave bit-identical tombstone state."""
    from pyspark.sql import DataFrame

    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    a = srv.save_ivf_payload(ivf, emb, str(tmp_path / "a"))
    b = srv.save_ivf_payload(ivf, emb, str(tmp_path / "b"))
    dead_list = [r.vec_id for r in emb.filter(F.col("vec_id") % 3 == 0)
                 .select("vec_id").collect()]
    dead_df = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    # duplicate the request rows: the overload must dedup them
    dead_df = dead_df.union(dead_df)

    real_collect = DataFrame.collect

    def no_collect(self):
        raise AssertionError("driver round-trip: collect() in delete path")

    DataFrame.collect = no_collect
    try:
        n = srv.delete_vectors_from_index(spark, a.path, dead_df)
        assert n == len(dead_list)
        # idempotent for the DataFrame shape too
        assert srv.delete_vectors_from_index(spark, a.path, dead_df) == 0
    finally:
        DataFrame.collect = real_collect
    srv.delete_vectors_from_index(spark, b.path, dead_list)
    ta = sorted(r.vec_id for r in spark.read.parquet(f"{a.path}_tombstones").collect())
    tb = sorted(r.vec_id for r in spark.read.parquet(f"{b.path}_tombstones").collect())
    assert ta == tb == sorted(dead_list)
    ivf.cells.unpersist()


def test_bulk_erasure_keyword_dataframe(spark, sf_smoke, tmp_path):
    """Keyword twin: delete-by-frame tombstones with dl recovery, no
    driver collect, idempotent, equal to the list path (including the
    recovered per-doc dl values)."""
    from pyspark.sql import DataFrame

    docs = load_table(spark, sf_smoke, "documents")
    ra, rb = str(tmp_path / "ka"), str(tmp_path / "kb")
    tx.build_keyword_index(docs, ra)
    tx.build_keyword_index(docs, rb)
    dead_list = [r.doc_id for r in docs.filter(F.col("doc_id") % 4 == 0)
                 .select("doc_id").collect()]
    dead_df = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")

    real_collect = DataFrame.collect

    def no_collect(self):
        raise AssertionError("driver round-trip: collect() in delete path")

    DataFrame.collect = no_collect
    try:
        assert tx.delete_docs_from_index(spark, ra, dead_df) == len(dead_list)
        assert tx.delete_docs_from_index(spark, ra, dead_df) == 0
    finally:
        DataFrame.collect = real_collect
    tx.delete_docs_from_index(spark, rb, dead_list)
    ta = sorted(map(tuple, spark.read.parquet(f"{ra}/tombstones").collect()))
    tb = sorted(map(tuple, spark.read.parquet(f"{rb}/tombstones").collect()))
    assert ta == tb and len(ta) == len(dead_list)
    assert all(dl > 0 for _, dl in ta)  # dl recovered from postings


def test_delete_vectors_served_pins_nondeterministic_frame(
    spark, sf_smoke, tmp_path
):
    """delete_vectors_served persists a frame input across the table
    fan-out: even a SAMPLED (non-deterministic) batch tombstones the
    SAME ids in every table of the deployment."""
    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    a = srv.save_ivf_payload(ivf, emb, str(tmp_path / "pa"))
    b = srv.save_ivf_payload(ivf, emb, str(tmp_path / "pb"))
    batch = emb.select("vec_id").sample(0.5, seed=None)
    out = srv.delete_vectors_served(spark, [a.path, b.path], batch)
    ta = sorted(r.vec_id for r in spark.read.parquet(f"{a.path}_tombstones").collect())
    tb = sorted(r.vec_id for r in spark.read.parquet(f"{b.path}_tombstones").collect())
    assert ta == tb
    assert out[a.path] == out[b.path] == len(ta)
    ivf.cells.unpersist()


def test_lock_heartbeat_staleness(spark, tmp_path):
    """VERDICT r11 next #8 — lock liveness: acquisition stamps a
    heartbeat sidecar; a holder whose heartbeat is younger than the
    staleness budget is NOT stolen, one past the budget IS (no human
    liveness assertion), and a legacy lock with no heartbeat is never
    auto-stolen (age unknowable → explicit steal_lock only)."""
    import time

    from uwheel_datafusion_spark.operators.util import (
        _hadoop_fs,
        fs_lock_age_sec,
        fs_release_lock,
        fs_write_text,
    )

    path = str(tmp_path / "t")
    _toy_table(spark, path)
    schema = "vec_id long, payload long, cell long"
    lock = f"{path}__maintenance_lock"

    # heartbeat written at acquisition; age ~0
    assert fs_try_lock(spark, lock)
    age = fs_lock_age_sec(spark, lock)
    assert age is not None and age < 60
    # fresh holder: a generous budget refuses, steal_lock still works
    with pytest.raises(RuntimeError, match="heartbeat goes stale"):
        srv.compact_partitioned_table(
            spark, path, schema=schema, stale_lock_after_sec=3600
        )
    # crash-stale holder: backdate the heartbeat past the budget
    assert fs_try_lock(spark, lock) is False
    fs_write_text(spark, lock + ".hb", repr(time.time() - 7200))
    srv.compact_partitioned_table(
        spark, path, schema=schema, stale_lock_after_sec=3600
    )
    assert not os.path.exists(lock)  # released (with its sidecar)
    assert not os.path.exists(lock + ".hb")
    # legacy lock: bare file, no heartbeat — never auto-stolen
    fs, jp = _hadoop_fs(spark, lock)
    fs.createNewFile(jp)
    assert fs_lock_age_sec(spark, lock) is None
    with pytest.raises(RuntimeError, match="steal_lock"):
        srv.compact_partitioned_table(
            spark, path, schema=schema, stale_lock_after_sec=1
        )
    srv.compact_partitioned_table(
        spark, path, schema=schema, steal_lock=True
    )
    fs_release_lock(spark, lock)


def test_keyword_lock_heartbeat_staleness(spark, sf_smoke, tmp_path):
    """Keyword-family twin: the ROOT lock auto-steals past the
    heartbeat budget and refuses inside it."""
    import time

    from uwheel_datafusion_spark.operators.util import fs_write_text

    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "kw")
    tx.build_keyword_index(docs, root)
    lock = f"{root}__maintenance_lock"
    assert fs_try_lock(spark, lock)
    with pytest.raises(RuntimeError, match="heartbeat goes stale"):
        tx.compact_keyword_index(spark, root, stale_lock_after_sec=3600)
    fs_write_text(spark, lock + ".hb", repr(time.time() - 7200))
    out = tx.compact_keyword_index(spark, root, stale_lock_after_sec=3600)
    assert out["postings_files"] > 0
    assert not os.path.exists(lock) and not os.path.exists(lock + ".hb")


def test_generation_union_serving(spark, sf_smoke, tmp_path):
    """LSM generations (VERDICT r11 next #2): a compacted baseline
    plus a delta generation served as a UNION must answer bit-
    identically to the same corpus in one table — same quantization,
    probe ranking and tie-breaks, with per-generation tombstones
    honored."""
    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    base = str(tmp_path / "base")
    delta = str(tmp_path / "delta")
    srv.save_ivf_payload(ivf, emb.filter(F.col("vec_id") % 2 == 0), base)
    srv.save_ivf_payload(ivf, emb.filter(F.col("vec_id") % 2 == 1), delta)
    union_idx = srv.ServedIvfIndex(
        centroids=ivf.centroids, path=base, n_cells=ivf.n_cells,
        delta_paths=(delta,),
    )
    single = srv.save_ivf_payload(ivf, emb, str(tmp_path / "single"))
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        "vec_id", "embedding"
    )
    got = srv.ivf_search_served(union_idx, queries, k=5, nprobe=3)
    want = srv.ivf_search_served(single, queries, k=5, nprobe=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # a tombstone in the DELTA generation masks in the union probe
    victim = [r.neighbor_id for r in want.collect() if r.neighbor_id % 2][0]
    srv.delete_vectors_from_index(spark, delta, [victim])
    got2 = srv.ivf_search_served(union_idx, queries, k=5, nprobe=3)
    assert victim not in {r.neighbor_id for r in got2.collect()}
    ivf.cells.unpersist()


def test_merge_generations_end_to_end(spark, tmp_path):
    """merge_generations folds delta + both tombstone sets into the
    baseline: one table afterward, deleted ids physically gone, delta
    dir consumed, idempotent re-run a no-op."""
    base, delta = str(tmp_path / "b"), str(tmp_path / "d")
    _toy_table(spark, base, n=40)
    df = spark.range(40, 80).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("cell"),
        (F.col("id") * 7).alias("payload"),
    )
    df.repartition(F.col("cell")).write.partitionBy("cell").parquet(delta)
    srv.delete_vectors_from_index(spark, base, [0, 4])
    srv.delete_vectors_from_index(spark, delta, [44, 48])
    schema = "vec_id long, payload long, cell long"
    n = srv.merge_generations(spark, base, delta, schema=schema)
    assert n == 4  # one file per cell partition
    raw = spark.read.schema(schema).parquet(base)
    got = sorted(r.vec_id for r in raw.collect())
    assert got == [i for i in range(80) if i not in (0, 4, 44, 48)]
    assert not os.path.exists(delta)
    assert not os.path.exists(f"{base}_tombstones")
    assert not os.path.exists(f"{delta}_tombstones")
    assert not os.path.exists(f"{base}__compacting")
    # idempotent: delta already consumed
    assert srv.merge_generations(spark, base, delta, schema=schema) == 4


def test_merge_generations_converges_under_crash_at_every_rename(
    spark, tmp_path
):
    """Rename fault injection over the MERGE protocol: the commit
    point is one dir rename (staging → __compacting) and completion
    IS recover_compaction's roll-forward (with the _MERGE_SOURCE
    stamp removing the consumed delta), so a crash at every rename
    site in turn must converge to the clean merge under re-run —
    never a double-counted delta, never a lost one."""
    import uwheel_datafusion_spark.operators.util as util

    schema = "vec_id long, payload long, cell long"

    def build(b, d):
        _toy_table(spark, b, n=40)
        df = spark.range(40, 80).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 4).alias("cell"),
            (F.col("id") * 7).alias("payload"),
        )
        df.repartition(F.col("cell")).write.partitionBy("cell").parquet(d)
        srv.delete_vectors_from_index(spark, b, [0, 4])
        srv.delete_vectors_from_index(spark, d, [44, 48])

    want = [i for i in range(80) if i not in (0, 4, 44, 48)]
    real_rename = util.fs_rename
    n_crash = 0
    for kill_at in range(1, 25):
        b = str(tmp_path / f"b{kill_at}")
        d = str(tmp_path / f"d{kill_at}")
        build(b, d)
        calls = {"n": 0}

        def dying(sp, src, dst, _c=calls, _k=kill_at):
            _c["n"] += 1
            if _c["n"] == _k:
                raise IOError(f"injected crash at rename #{_k}")
            return real_rename(sp, src, dst)

        util.fs_rename = dying
        try:
            srv.merge_generations(spark, b, d, schema=schema)
            crashed = False
        except IOError:
            crashed = True
        finally:
            util.fs_rename = real_rename
        if crashed:
            n_crash += 1
            srv.merge_generations(
                spark, b, d, schema=schema, steal_lock=True
            )
        raw = spark.read.schema(schema).parquet(b)
        assert sorted(r.vec_id for r in raw.collect()) == want, kill_at
        assert not os.path.exists(d), kill_at
        for marker in ("__compacting", "__swap_old", "__merge_staging",
                       "_tombstones", "__maintenance_lock"):
            assert not os.path.exists(b + marker), (kill_at, marker)
        if not crashed:
            break
    assert n_crash >= 3
