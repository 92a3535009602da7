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
