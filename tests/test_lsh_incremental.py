"""Incremental LSH dedup (operators/dedup.lsh_*): the persisted band
index answers new-batch-vs-corpus candidate queries without re-reading
corpus text, and EXTENDS by append. The oracle-parity suite proves the
candidate math; these tests pin the persistence lifecycle."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators import dedup as dd
from uwheel_datafusion_spark.sources.registry import load_table


def _split(docs, lo, hi):
    from uwheel_datafusion_spark.operators.sampling import hash_bucket_sql

    b = F.expr(hash_bucket_sql("doc_id", 100))
    return docs.filter((b >= lo) & (b < hi))


def test_save_load_roundtrip_equals_direct(spark, sf_correctness, tmp_path):
    docs = load_table(spark, sf_correctness, "documents")
    corpus, new = _split(docs, 0, 80), _split(docs, 80, 100)
    path = str(tmp_path / "lsh_index")
    dd.save_lsh_index(dd.lsh_band_table(corpus), path)
    via_disk = {
        tuple(r)
        for r in dd.lsh_incremental_candidates(
            new, dd.load_lsh_index(spark, path)
        ).collect()
    }
    direct = {
        tuple(r)
        for r in dd.lsh_incremental_candidates(
            new, dd.lsh_band_table(corpus)
        ).collect()
    }
    assert via_disk == direct and direct


def test_append_extend_makes_batch1_discoverable(spark, sf_correctness, tmp_path):
    docs = load_table(spark, sf_correctness, "documents")
    corpus = _split(docs, 0, 70)
    batch1 = _split(docs, 70, 85)
    batch2 = _split(docs, 85, 100)
    path = str(tmp_path / "lsh_index")
    dd.save_lsh_index(dd.lsh_band_table(corpus), path)
    # ingest batch1: check against index, then APPEND its bands
    dd.save_lsh_index(dd.lsh_band_table(batch1), path, mode="append")
    idx = dd.load_lsh_index(spark, path)
    got = {
        tuple(r)
        for r in dd.lsh_incremental_candidates(batch2, idx).collect()
    }
    want = {
        tuple(r)
        for r in dd.lsh_incremental_candidates(
            batch2, dd.lsh_band_table(corpus.unionByName(batch1))
        ).collect()
    }
    assert got == want and want
    # batch2 collides with at least one batch-1 doc (the extend matters)
    b1_ids = {r["doc_id"] for r in batch1.select("doc_id").collect()}
    assert any(c in b1_ids for _, c in got)


def test_index_partitioned_by_band(spark, sf_correctness, tmp_path):
    import os

    docs = load_table(spark, sf_correctness, "documents")
    path = str(tmp_path / "lsh_index")
    dd.save_lsh_index(dd.lsh_band_table(_split(docs, 0, 80)), path)
    parts = [d for d in os.listdir(path) if d.startswith("band_idx=")]
    assert len(parts) >= 2  # dt-style partition pruning on band_idx


def test_streaming_ingest_dedup_vs_static_index(spark, sf_correctness, tmp_path):
    """The streaming form of incremental ingest dedup: new documents
    arrive as a STREAM and join the static persisted band index
    (stream-static join in each micro-batch); accumulated candidates
    equal the batch computation. This is the shape of a continuous
    crawler pipeline: corpus index on disk, new pages deduped on
    arrival."""
    docs = load_table(spark, sf_correctness, "documents")
    corpus, new = _split(docs, 0, 80), _split(docs, 80, 100)
    path = str(tmp_path / "lsh_index")
    dd.save_lsh_index(dd.lsh_band_table(corpus), path)
    idx = dd.load_lsh_index(spark, path)

    src = str(tmp_path / "new_in")
    new.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = set()

    def sink(batch_df, epoch_id):
        for r in dd.lsh_incremental_candidates(batch_df, idx).collect():
            got.add((r["new_doc_id"], r["corpus_doc_id"]))

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    want = {
        tuple(r)
        for r in dd.lsh_incremental_candidates(new, idx).collect()
    }
    assert got == want and want


def test_compaction_shrinks_file_count_preserves_rows(spark, sf_correctness, tmp_path):
    """compact_parquet: repeated appends fragment the band index into
    many small files; compaction rewrites to few files with identical
    content (the OPTIMIZE maintenance job, plain-parquet edition)."""
    from uwheel_datafusion_spark.operators.rollup_io import compact_parquet

    docs = load_table(spark, sf_correctness, "documents")
    path = str(tmp_path / "idx")
    # 5 fragmented appends
    for lo in range(0, 100, 20):
        dd.save_lsh_index(
            dd.lsh_band_table(_split(docs, lo, lo + 20)).repartition(8),
            path,
            mode="append" if lo else "overwrite",
        )
    before = {
        tuple(r) for r in spark.read.parquet(path).collect()
    }
    stats = compact_parquet(spark, path, target_mb=128, partition_col="band_idx")
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    assert stats["files_before"] >= 30
    assert stats["files_after"] < stats["files_before"] / 3
