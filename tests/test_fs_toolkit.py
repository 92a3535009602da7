"""Hadoop-FS maintenance toolkit (round 11): the primitives every
compaction/recovery path now stands on. Exercised through file: paths
AND file:// URIs so the os.path-free contract is pinned at the unit
level too (the lifecycle twins live in test_erasure.py)."""

import os

from uwheel_datafusion_spark.operators.util import (
    assert_not_mid_maintenance,
    fs_count_files,
    fs_delete,
    fs_exists,
    fs_is_dir,
    fs_list_names,
    fs_mkdirs,
    fs_read_text,
    fs_rename,
    fs_try_lock,
    fs_write_text,
)


def test_fs_roundtrip_plain_and_uri(spark, tmp_path):
    for root in (str(tmp_path / "a"), f"file://{tmp_path / 'b'}"):
        fs_mkdirs(spark, f"{root}/cell=1")
        fs_mkdirs(spark, f"{root}/cell=2")
        fs_mkdirs(spark, f"{root}/other")
        assert fs_exists(spark, root) and fs_is_dir(spark, root)
        assert fs_list_names(spark, root, "cell=") == ["cell=1", "cell=2"]
        assert sorted(fs_list_names(spark, root)) == [
            "cell=1", "cell=2", "other",
        ]
        fs_rename(spark, f"{root}/cell=2", f"{root}/cell=9")
        assert fs_list_names(spark, root, "cell=") == ["cell=1", "cell=9"]
        assert fs_delete(spark, f"{root}/other") is True
        assert fs_delete(spark, f"{root}/other") is False  # absent
        assert fs_list_names(spark, f"{root}/missing") == []


def test_fs_rename_raises_on_missing_source(spark, tmp_path):
    import pytest

    with pytest.raises(IOError, match="rename failed"):
        fs_rename(
            spark, str(tmp_path / "nope"), str(tmp_path / "dst")
        )


def test_fs_text_roundtrip_and_overwrite(spark, tmp_path):
    p = f"file://{tmp_path / 'meta' / 'm.json'}"
    assert fs_read_text(spark, p) is None
    fs_write_text(spark, p, '{"epoch": 1}')
    assert fs_read_text(spark, p) == '{"epoch": 1}'
    fs_write_text(spark, p, '{"epoch": 2}')  # atomic overwrite
    assert fs_read_text(spark, p) == '{"epoch": 2}'
    assert not os.path.exists(str(tmp_path / "meta" / "m.json.tmp"))


def test_fs_count_files(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(10).repartition(3).write.parquet(path)
    assert fs_count_files(spark, path) == 3
    assert fs_count_files(spark, str(tmp_path / "missing")) == 0


def test_fs_try_lock_mutual_exclusion(spark, tmp_path):
    lock = str(tmp_path / "tbl__maintenance_lock")
    assert fs_try_lock(spark, lock) is True
    assert fs_try_lock(spark, lock) is False  # held
    fs_delete(spark, lock)
    assert fs_try_lock(spark, lock) is True


def test_assert_not_mid_maintenance(spark, tmp_path):
    import pytest

    a = str(tmp_path / "t__compacting")
    assert_not_mid_maintenance(spark, a)  # absent: fine
    fs_mkdirs(spark, a)
    with pytest.raises(RuntimeError, match="recover_compaction"):
        assert_not_mid_maintenance(spark, a)


def test_compaction_converges_under_crash_at_every_rename(
    spark, tmp_path
):
    """Fault injection: kill the compaction at EVERY fs_rename call
    site in turn (the only mutation primitive in the swap protocol)
    and require that recovery + a re-run converge to exactly the
    clean-compaction end state — erased rows gone from a raw read,
    probes bit-identical, no leftover markers. This walks every crash
    window the protocol's docstrings claim are safe, instead of the
    hand-picked states the erasure tests construct."""
    import pytest
    from pyspark.sql import functions as F

    import uwheel_datafusion_spark.operators.ann_serving as srv
    import uwheel_datafusion_spark.operators.util as util

    def build(path):
        df = spark.range(60).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 4).alias("cell"),
            (F.col("id") * 7).alias("payload"),
        )
        (
            df.repartition(F.col("cell"))
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(path)
        )
        srv.delete_vectors_from_index(
            spark, path, [i for i in range(60) if i % 5 == 0]
        )
        # kill cell=3 entirely: a fold-to-empty partition in every run
        srv.delete_vectors_from_index(
            spark, path, [i for i in range(60) if i % 4 == 3]
        )

    schema = "vec_id long, payload long, cell long"

    def raw_state(path):
        return sorted(
            map(
                tuple,
                spark.read.schema(schema).parquet(path)
                .select("vec_id", "payload", "cell").collect(),
            )
        )

    # the clean end state, computed once
    clean = str(tmp_path / "clean")
    build(clean)
    srv.compact_partitioned_table(
        spark, clean, schema=schema, sort_cols=("vec_id",)
    )
    want = raw_state(clean)
    assert want and all(v % 5 != 0 and v % 4 != 3 for v, _, _ in want)

    real_rename = util.fs_rename
    n_crash = 0
    for kill_at in range(1, 30):
        path = str(tmp_path / f"t{kill_at}")
        build(path)
        calls = {"n": 0}

        def dying(sp, src, dst, _c=calls, _k=kill_at):
            _c["n"] += 1
            if _c["n"] == _k:
                raise IOError(f"injected crash at rename #{_k}")
            return real_rename(sp, src, dst)

        util.fs_rename = dying
        try:
            srv.compact_partitioned_table(
                spark, path, schema=schema, sort_cols=("vec_id",)
            )
            crashed = False
        except IOError:
            crashed = True
        finally:
            util.fs_rename = real_rename
        if not crashed:
            # fewer rename sites than kill_at: protocol fully covered
            assert raw_state(path) == want
            break
        n_crash += 1
        # a crashed run may hold the lock (the finally released it via
        # fs_delete, which we did not break) — re-run must converge;
        # recover-on-entry repairs whatever the crash left
        srv.compact_partitioned_table(
            spark, path, schema=schema, sort_cols=("vec_id",),
            steal_lock=True,
        )
        assert raw_state(path) == want, f"kill_at={kill_at}"
        for marker in ("__compacting", "__swap_old",
                       "__retired_metadata", "_tombstones",
                       "__maintenance_lock"):
            assert not os.path.exists(path + marker), (kill_at, marker)
    assert n_crash >= 5  # the protocol really has multiple rename sites


def test_keyword_compaction_converges_under_crash_at_every_rename(
    spark, sf_smoke, tmp_path
):
    """Keyword twin of the rename fault injection: compact_keyword_index
    adds the stats-rebase tail (commit point = the tombstones→folded
    rename) on top of two partitioned-table swaps. Killing every
    fs_rename site in turn must leave an index whose probes are
    bit-identical to the clean compaction after recovery + re-run —
    including the crash windows where stats are momentarily
    uncorrected (documented two-rename maintenance window)."""
    import shutil

    import uwheel_datafusion_spark.operators.textops as tx
    import uwheel_datafusion_spark.operators.util as util
    from pyspark.sql import functions as F
    from uwheel_datafusion_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents")
    dead = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()]

    def build(root):
        tx.build_keyword_index(docs, root)
        tx.build_keyword_positions(docs, root)
        tx.delete_docs_from_index(spark, root, dead)

    def probes(root):
        return (
            sorted(map(tuple,
                       tx.keyword_index_probe(spark, root).collect())),
            sorted(map(tuple,
                       tx.keyword_index_bm25_probe(spark, root).collect())),
            sorted(map(tuple,
                       tx.keyword_phrase_search(spark, root).collect())),
            tuple(tx._live_stats(spark, root, with_dl=True).first()),
        )

    clean = str(tmp_path / "clean")
    build(clean)
    tx.compact_keyword_index(spark, clean)
    want = probes(clean)
    shutil.rmtree(clean)

    real_rename = util.fs_rename
    n_crash = 0
    for kill_at in range(1, 40):
        root = str(tmp_path / f"k{kill_at}")
        build(root)
        calls = {"n": 0}

        def dying(sp, src, dst, _c=calls, _k=kill_at):
            _c["n"] += 1
            if _c["n"] == _k:
                raise IOError(f"injected crash at rename #{_k}")
            return real_rename(sp, src, dst)

        util.fs_rename = dying
        try:
            tx.compact_keyword_index(spark, root)
            crashed = False
        except IOError:
            crashed = True
        finally:
            util.fs_rename = real_rename
        if crashed:
            n_crash += 1
            tx.compact_keyword_index(spark, root, steal_lock=True)
        assert probes(root) == want, f"kill_at={kill_at}"
        shutil.rmtree(root)
        if not crashed:
            break
    assert n_crash >= 4  # both table swaps + the stats tail have sites


def test_recovery_erases_when_every_row_tombstoned(spark, tmp_path):
    """ADVICE r11 #1 fault injection: tombstone EVERY row, so the
    committed staging rewrite is _SUCCESS plus ZERO cell= dirs, then
    crash the swap at every rename site in turn and run RECOVERY ONLY
    (no re-compaction — a re-run would re-stage and mask the bug).
    Roll-forward must still deliver the physical-erasure guarantee:
    zero live cell= partitions on disk afterward, markers cleaned.
    The old `if staged or aside:` guard skipped the fold-to-empty
    removals in exactly this state."""
    import uwheel_datafusion_spark.operators.ann_serving as srv
    import uwheel_datafusion_spark.operators.util as util
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.util import (
        fs_delete,
        fs_list_names,
    )

    def build(path):
        df = spark.range(40).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 4).alias("cell"),
            (F.col("id") * 3).alias("payload"),
        )
        (
            df.repartition(F.col("cell"))
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(path)
        )
        srv.delete_vectors_from_index(spark, path, list(range(40)))

    schema = "vec_id long, payload long, cell long"
    real_rename = util.fs_rename
    n_crash = 0
    for kill_at in range(1, 20):
        path = str(tmp_path / f"all{kill_at}")
        build(path)
        calls = {"n": 0}

        def dying(sp, src, dst, _c=calls, _k=kill_at):
            _c["n"] += 1
            if _c["n"] == _k:
                raise IOError(f"injected crash at rename #{_k}")
            return real_rename(sp, src, dst)

        util.fs_rename = dying
        try:
            srv.compact_partitioned_table(
                spark, path, schema=schema, sort_cols=("vec_id",)
            )
            crashed = False
        except IOError:
            crashed = True
        finally:
            util.fs_rename = real_rename
        if crashed:
            n_crash += 1
            fs_delete(spark, f"{path}__maintenance_lock")
            srv.recover_compaction(spark, path)
        # physical erasure: NO live partition dir survives — whether
        # the crash hit before the first move-aside (_SUCCESS present,
        # staged empty, aside empty, live full: the ADVICE state) or
        # anywhere later
        assert fs_list_names(spark, path, "cell=") == [], f"kill_at={kill_at}"
        for marker in ("__compacting", "__swap_old", "__retired_metadata"):
            assert not os.path.exists(path + marker), (kill_at, marker)
        if not crashed:
            break
    assert n_crash >= 3
