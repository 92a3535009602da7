"""Crash-safety / degenerate-input guards on the maintenance paths
(ADVICE r04): compact_parquet must recover from an interrupted prior
run instead of colliding with its own leftovers, and zorder_write must
refuse un-boundable z columns with a clear error."""

import os

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators.rollup_io import compact_parquet
from uwheel_datafusion_spark.sources.zorder import zorder_write


def _write_sample(spark, path):
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(8).write.mode("overwrite").parquet(path)


def test_compact_cleans_stale_tmp_and_old(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_sample(spark, path)
    os.makedirs(path + "__compact_tmp")
    os.makedirs(path + "__compact_old")
    stats = compact_parquet(spark, path, target_mb=512)
    assert stats["files_after"] <= stats["files_before"]
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")
    assert spark.read.parquet(path).count() == 1000


def test_compact_recovers_crash_between_renames(spark, tmp_path):
    """Simulate a crash after `path -> old` but before `tmp -> path`:
    data is stranded in __compact_old and `path` is gone. A re-run must
    restore and complete."""
    path = str(tmp_path / "t")
    _write_sample(spark, path)
    os.rename(path, path + "__compact_old")
    assert not os.path.exists(path)
    compact_parquet(spark, path, target_mb=512)
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + "__compact_old")


def test_zorder_refuses_empty_and_all_null(spark, tmp_path):
    empty = spark.range(0).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="no non-NULL"):
        zorder_write(empty, str(tmp_path / "z1"), ["a", "b"])
    nulls = spark.range(10).select(
        F.lit(None).cast("long").alias("a"), F.col("id").alias("b")
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        zorder_write(nulls, str(tmp_path / "z2"), ["a", "b"])
