"""Streaming wheel maintenance (SURVEY §2.9): the streaming build must
produce the SAME index as the batch build (insert/advance equivalence),
and late rows must be dropped with an observable metric."""

import os

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import MINUTE_MS, to_epoch_ms
from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.sources.registry import load_table
from uwheel_datafusion_spark.streaming.wheel_stream import StreamingWheel

from datetime import datetime

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))


@pytest.fixture(scope="module")
def stream_dir(spark, sf_smoke, tmp_path_factory):
    """Split events into 4 time-ordered chunk files so the file source
    yields multiple micro-batches."""
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "in")
    ev = load_table(spark, sf_smoke, "events")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    return src


def test_streaming_equals_batch(spark, sf_smoke, stream_dir, tmp_path):
    batch_idx = WheelIndex.build(
        load_table(spark, sf_smoke, "events"), "ts", "value", WM, ADV
    ).to_driver_index()

    schema = load_table(spark, sf_smoke, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select("ts", "value")
    )
    sw = StreamingWheel(stream, "ts", "value", watermark_delay="31 days")
    sw.start(str(tmp_path / "ckpt"))
    sw.process_available()
    sw.stop()

    stream_idx = sw.snapshot_index(WM, ADV)

    # full-history and random range equivalence
    assert stream_idx.landmark() == batch_idx.landmark()
    import random

    rng = random.Random(7)
    n_min = (ADV - WM) // MINUTE_MS
    for _ in range(20):
        a = rng.randrange(0, n_min)
        b = rng.randrange(a + 1, n_min + 1)
        s, e = WM + a * MINUTE_MS, WM + b * MINUTE_MS
        assert stream_idx.query_sum(s, e) == batch_idx.query_sum(s, e)
        assert stream_idx.query_count(s, e) == batch_idx.query_count(s, e)


def test_streaming_drops_late_rows(spark, tmp_path):
    """Rows arriving behind the watermark are dropped and counted —
    µWheel's late-insert rejection, observably."""
    src = str(tmp_path / "late_in")
    os.makedirs(src)
    df1 = spark.createDataFrame(
        [("2024-01-10 12:00:00", 1.0), ("2024-01-10 12:01:00", 2.0)],
        "ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "value")
    df2 = spark.createDataFrame(
        [("2024-01-01 00:00:00", 100.0),  # 9.5 days late vs watermark
         ("2024-01-10 12:02:00", 3.0)],
        "ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "value")
    df1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sw = StreamingWheel(stream, "ts", "value", watermark_delay="10 minutes")
    sw.start(str(tmp_path / "ckpt2"))
    sw.process_available()
    # second file arrives after the watermark advanced past 2024-01-01
    df2.coalesce(1).write.mode("append").parquet(src)
    sw.process_available()
    sw.stop()

    idx = sw.snapshot_index(WM, ADV)
    lm = idx.landmark()
    assert lm["cnt"] == 3  # the late 100.0 row is NOT in the index
    assert lm["sum"] == 6.0
    assert sw.store.n_late_rows >= 1
