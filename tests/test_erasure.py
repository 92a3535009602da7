"""Physical erasure + idempotent deletes (round 10 — VERDICT r9 next
#1/#2/#7, ADVICE r9 items 1–3): tombstones fold into compaction for
both index families, deletes are exactly-once under redelivery, the
swap is per-partition atomic with torn-swap recovery, and streamed
tables refuse compaction until their maintaining stream is retired.
"""

import os

import pytest
from pyspark.sql import functions as F

import uwheel_datafusion_spark.operators.ann_serving as srv
import uwheel_datafusion_spark.operators.similarity as sim
import uwheel_datafusion_spark.operators.textops as tx
from uwheel_datafusion_spark.sources.registry import load_table


def _probe_all(spark, root):
    """Every keyword access path in one tuple."""
    return (
        sorted(map(tuple, tx.keyword_index_probe(spark, root).collect())),
        sorted(map(tuple, tx.keyword_index_bm25_probe(spark, root).collect())),
        sorted(
            map(
                tuple,
                tx.keyword_index_search_conjunctive(spark, root).collect(),
            )
        ),
    )


@pytest.fixture()
def kw_index(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "kw")
    tx.build_keyword_index(docs, root)
    tx.build_keyword_positions(docs, root)
    return docs, root


def test_keyword_delete_is_idempotent(spark, kw_index):
    """Delete-twice ⇒ stats AND every probe bit-identical to
    delete-once (VERDICT r9 what's-wrong #1): a re-delivered delete
    request must not re-subtract from (N, total_dl)."""
    docs, root = kw_index
    dead = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()]
    assert tx.delete_docs_from_index(spark, root, dead) == len(dead)
    once_stats = tx._live_stats(spark, root, with_dl=True).first()
    once = _probe_all(spark, root)
    # exact redelivery, an overlapping batch, and a single stale id
    assert tx.delete_docs_from_index(spark, root, dead) == 0
    assert tx.delete_docs_from_index(spark, root, dead[:3] + dead[:3]) == 0
    assert tx.delete_docs_from_index(spark, root, [dead[0]]) == 0
    again_stats = tx._live_stats(spark, root, with_dl=True).first()
    assert (once_stats["n_docs"], once_stats["total_dl"]) == (
        again_stats["n_docs"],
        again_stats["total_dl"],
    )
    assert _probe_all(spark, root) == once
    # the tombstone table itself did not grow
    n_tomb = (
        spark.read.schema("doc_id long")
        .parquet(f"{root}/tombstones")
        .count()
    )
    assert n_tomb == len(set(dead))


def test_keyword_delete_never_ingested_id_counts_once(spark, kw_index):
    """A never-ingested id behaves like a deleted NULL-text doc:
    subtracts 1 from N, 0 from total_dl — and only once ever."""
    docs, root = kw_index
    base = tx._live_stats(spark, root, with_dl=True).first()
    assert tx.delete_docs_from_index(spark, root, [10**12]) == 1
    assert tx.delete_docs_from_index(spark, root, [10**12]) == 0
    after = tx._live_stats(spark, root, with_dl=True).first()
    assert after["n_docs"] == base["n_docs"] - 1
    assert after["total_dl"] == base["total_dl"]


def test_keyword_compaction_physically_erases(spark, kw_index):
    """The round-10 erasure gate contract, locally: delete → compact ⇒
    (a) every probe bit-identical to pre-compaction, (b) a RAW read of
    the compacted postings/positions contains ZERO tombstoned ids,
    (c) the tombstone dir is gone, (d) stats collapse to one live row."""
    docs, root = kw_index
    dead = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()]
    tx.delete_docs_from_index(spark, root, dead)
    before = _probe_all(spark, root)
    phrase_before = sorted(
        map(tuple, tx.keyword_phrase_search(spark, root).collect())
    )
    stats_before = tx._live_stats(spark, root, with_dl=True).first()
    out = tx.compact_keyword_index(spark, root)
    assert _probe_all(spark, root) == before
    assert (
        sorted(map(tuple, tx.keyword_phrase_search(spark, root).collect()))
        == phrase_before
    )
    # (b) raw reads — no anti-join — hold no tombstoned id
    for sub in ("postings", "positions"):
        raw = spark.read.parquet(f"{root}/{sub}")
        assert raw.filter(F.col("doc_id").isin(dead)).count() == 0
    # (c) tombstones folded away
    assert not os.path.exists(f"{root}/tombstones")
    # (d) stats are ONE positive row equal to the live corpus
    stats_rows = spark.read.parquet(f"{root}/stats").collect()
    assert len(stats_rows) == 1
    assert (stats_rows[0]["n_docs"], stats_rows[0]["total_dl"]) == (
        stats_before["n_docs"],
        stats_before["total_dl"],
    )
    assert out["n_docs"] == stats_before["n_docs"]
    # one file per live partition
    for sub in ("postings", "positions"):
        for d in os.listdir(f"{root}/{sub}"):
            if d.startswith("bucket="):
                files = [
                    f
                    for f in os.listdir(f"{root}/{sub}/{d}")
                    if f.endswith(".parquet")
                ]
                assert len(files) == 1, (sub, d, files)


def _served_ivf(spark, sf_smoke, tmp_path, n_cells=8):
    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=n_cells)
    served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "ivf"))
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        "vec_id", "embedding"
    )
    return emb, ivf, served, queries


def test_ann_delete_idempotent_and_compaction_erases(
    spark, sf_smoke, tmp_path
):
    """ANN twin of the keyword erasure contract: idempotent tombstones,
    then compaction folds them — probes unchanged, raw read clean,
    tombstone dir reset."""
    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    dead = [r.vec_id for r in emb.filter(F.col("vec_id") % 5 == 0)
            .select("vec_id").collect()]
    assert srv.delete_vectors_from_index(spark, served.path, dead) == len(dead)
    assert srv.delete_vectors_from_index(spark, served.path, dead) == 0
    assert (
        spark.read.schema("vec_id long")
        .parquet(f"{served.path}_tombstones")
        .count()
        == len(dead)
    )
    before = sorted(
        map(
            tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect(),
        )
    )
    srv.compact_partitioned_table(
        spark,
        served.path,
        schema="vec_id long, qvec array<long>, qnorm long, cell long",
    )
    after = sorted(
        map(
            tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect(),
        )
    )
    assert after == before
    raw = spark.read.parquet(served.path)
    assert raw.filter(F.col("vec_id").isin(dead)).count() == 0
    assert not os.path.exists(f"{served.path}_tombstones")
    ivf.cells.unpersist()


def test_compaction_drops_fold_to_empty_partitions(
    spark, sf_smoke, tmp_path
):
    """Deleting every vector of a cell must remove the partition DIR
    from disk, not leave an empty husk."""
    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    # kill one whole cell
    target = int(
        spark.read.parquet(served.path).select("cell").first()["cell"]
    )
    cell_ids = [
        r.vec_id
        for r in spark.read.parquet(served.path)
        .filter(F.col("cell") == target)
        .select("vec_id")
        .collect()
    ]
    srv.delete_vectors_from_index(spark, served.path, cell_ids)
    srv.compact_partitioned_table(
        spark,
        served.path,
        schema="vec_id long, qvec array<long>, qnorm long, cell long",
    )
    assert not os.path.exists(os.path.join(served.path, f"cell={target}"))
    live = spark.read.parquet(served.path)
    assert live.filter(F.col("vec_id").isin(cell_ids)).count() == 0
    ivf.cells.unpersist()


def test_recover_compaction_repairs_torn_swap(spark, sf_smoke, tmp_path):
    """Crash-simulation of every swap artifact (VERDICT r9 next #7):
    a staging dir, an aside partition whose replacement never landed,
    an aside partition whose replacement DID land, and a folded
    tombstone dir — recover_compaction must restore exactly the
    committed state."""
    import shutil

    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    path = served.path
    before = sorted(
        map(
            tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect(),
        )
    )
    parts = sorted(
        d for d in os.listdir(path) if d.startswith("cell=")
    )
    assert len(parts) >= 3
    swap_old = f"{path}__swap_old"
    os.makedirs(swap_old)
    # artifact 1: torn swap — partition moved aside, replacement missing
    os.rename(os.path.join(path, parts[0]), os.path.join(swap_old, parts[0]))
    # artifact 2: completed swap — aside copy is stale (live dir exists)
    shutil.copytree(
        os.path.join(path, parts[1]), os.path.join(swap_old, parts[1])
    )
    # artifact 3: stale staging dir
    os.makedirs(f"{path}__compacting/cell=999", exist_ok=True)
    # artifact 4: folded tombstones pending cleanup
    os.makedirs(f"{path}_tombstones__folded", exist_ok=True)
    srv.recover_compaction(spark, path)
    assert os.path.isdir(os.path.join(path, parts[0]))  # restored
    assert not os.path.exists(swap_old)
    assert not os.path.exists(f"{path}__compacting")
    assert not os.path.exists(f"{path}_tombstones__folded")
    after = sorted(
        map(
            tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect(),
        )
    )
    assert after == before
    ivf.cells.unpersist()


def test_recover_keyword_maintenance_tail_states(spark, kw_index):
    """The stats-rebase commit protocol: an uncommitted staged stats
    dir is dropped; a committed-but-unfinished tail is completed."""
    import shutil

    docs, root = kw_index
    live = tx._live_stats(spark, root, with_dl=True).first()
    # state A: staged rebase, commit never happened -> staged dropped
    os.makedirs(f"{root}/stats__rebased")
    tx.recover_keyword_maintenance(spark, root)
    assert not os.path.exists(f"{root}/stats__rebased")
    # state B: committed (tombstones folded aside), stats swap pending
    spark.createDataFrame(
        [(int(live["n_docs"]), int(live["total_dl"]))],
        "n_docs long, total_dl long",
    ).write.parquet(f"{root}/stats__rebased")
    os.makedirs(f"{root}/tombstones__folded")
    tx.recover_keyword_maintenance(spark, root)
    assert not os.path.exists(f"{root}/tombstones__folded")
    assert not os.path.exists(f"{root}/stats__rebased")
    rows = spark.read.parquet(f"{root}/stats").collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == live["n_docs"]
    shutil.rmtree(root)


def test_streamed_table_refuses_compaction_until_retired(
    spark, sf_smoke, tmp_path
):
    """ADVICE r9 #1: a file-sink-maintained table (live _spark_metadata
    log) must refuse compaction unless the caller asserts the stream is
    retired — then the log is removed and the table reads as plain
    parquet with identical rows."""
    from uwheel_datafusion_spark.streaming.ann_stream import (
        start_ivf_payload_stream,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    src = str(tmp_path / "src")
    table = str(tmp_path / "payload")
    emb.write.parquet(src)
    q = start_ivf_payload_stream(
        spark.readStream.schema(emb.schema).parquet(src),
        ivf.centroids,
        table,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert os.path.isdir(f"{table}/_spark_metadata")
    n_before = spark.read.parquet(table).count()
    with pytest.raises(ValueError, match="stream_retired"):
        srv.compact_partitioned_table(
            spark,
            table,
            schema="vec_id long, qvec array<long>, qnorm long, cell long",
        )
    assert os.path.isdir(f"{table}/_spark_metadata")  # untouched
    srv.compact_partitioned_table(
        spark,
        table,
        schema="vec_id long, qvec array<long>, qnorm long, cell long",
        stream_retired=True,
    )
    assert not os.path.exists(f"{table}/_spark_metadata")
    assert spark.read.parquet(table).count() == n_before
    ivf.cells.unpersist()


def test_dual_table_served_delete(spark, sf_smoke, tmp_path):
    """ADVICE r9 #5: a served IVF-PQ deployment tombstones BOTH the
    codes and the payload table in one call, so deleted ids stop
    consuming ADC candidate slots too."""
    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=8)
    pq = sim.pq_build_wide(emb, m=4, k=8)
    ivf_served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "ivf"))
    pq_served = srv.save_ivfpq_payload(ivf, pq, str(tmp_path / "pq"))
    dead = [1, 2, 3]
    out = srv.delete_vectors_served(
        spark, [ivf_served.path, pq_served.path], dead
    )
    assert out == {ivf_served.path: 3, pq_served.path: 3}
    queries = emb.filter(F.col("vec_id").isin(0, 7)).select(
        "vec_id", "embedding"
    )
    adc = srv.ivfpq_search_served(
        pq_served, queries, topk=50, nprobe=8
    ).collect()
    assert not {r.neighbor_id for r in adc} & set(dead)
    rr = srv.ivfpq_rerank_served(
        pq_served, ivf_served, queries, topk=5, nprobe=8, n_candidates=10
    ).collect()
    assert not {r.neighbor_id for r in rr} & set(dead)
    ivf.cells.unpersist()
    pq.codes.unpersist()


def test_probe_refuses_mid_maintenance_markers(spark, sf_smoke, tmp_path):
    """ADVICE r10 #4: a probe must not silently serve a table whose
    compaction crashed mid-swap (moved-aside partitions absent) or is
    in flight — it refuses loudly and names the repair. Auto-healing
    from a read path would corrupt an in-flight compaction, so refusal
    is the correct behavior, not a fallback."""
    import shutil

    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    for marker in (f"{served.path}__swap_old", f"{served.path}__compacting"):
        os.makedirs(marker)
        with pytest.raises(RuntimeError, match="recover_compaction"):
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect()
        shutil.rmtree(marker)
    # clean again: serves normally
    assert srv.ivf_search_served(served, queries, k=5, nprobe=3).count() > 0
    ivf.cells.unpersist()


def test_keyword_probe_refuses_mid_maintenance_markers(spark, kw_index):
    """Keyword twin: every probe flows through _live_postings, which
    refuses postings/positions maintenance markers."""
    import shutil

    docs, root = kw_index
    for marker in (
        f"{root}/postings__swap_old",
        f"{root}/positions__compacting",
    ):
        os.makedirs(marker)
        with pytest.raises(RuntimeError, match="recover_compaction"):
            tx.keyword_index_probe(spark, root).collect()
        with pytest.raises(RuntimeError, match="recover_compaction"):
            tx.keyword_phrase_search(spark, root).collect()
        shutil.rmtree(marker)
    assert tx.keyword_index_probe(spark, root).count() > 0


def _stage_compaction_rewrite(spark, path, schema):
    """Replicate compact_partitioned_table's staging step only (the
    exactly-once rewrite with tombstones folded), stopping BEFORE any
    swap — the crash point every roll-forward test starts from."""
    from pyspark.sql import functions as F

    df = spark.read.schema(schema).parquet(path)
    tomb = f"{path}_tombstones"
    import uwheel_datafusion_spark.operators.util as util

    if util.fs_exists(spark, tomb):
        dead = spark.read.schema("vec_id long").parquet(tomb)
        df = df.join(dead, "vec_id", "left_anti")
    (
        df.repartition(F.col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}__compacting")
    )


def test_recover_rolls_forward_committed_staging(spark, sf_smoke, tmp_path):
    """A staging dir WITH _SUCCESS is a committed exactly-once rewrite:
    recovery must finish the swap (crash-before-any-swap, crash
    mid-swap, and crash with one partition fully done), leaving the
    table bit-identical to an uninterrupted compaction — including
    physically erasing every tombstoned row."""
    schema = "vec_id long, qvec array<long>, qnorm long, cell long"
    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    path = served.path
    dead = [r.vec_id for r in emb.filter(F.col("vec_id") % 5 == 0)
            .select("vec_id").collect()]
    srv.delete_vectors_from_index(spark, path, dead)
    expected = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    _stage_compaction_rewrite(spark, path, schema)
    assert os.path.exists(f"{path}__compacting/_SUCCESS")
    parts = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    staged = sorted(
        d for d in os.listdir(f"{path}__compacting") if d.startswith("cell=")
    )
    assert len(staged) >= 3
    # simulate a torn swap: partition A mid-swap (live moved aside,
    # staged not yet installed), partition B fully done (aside kept,
    # staged consumed), the rest untouched
    swap_old = f"{path}__swap_old"
    os.makedirs(swap_old)
    a, b = staged[0], staged[1]
    os.rename(os.path.join(path, a), os.path.join(swap_old, a))
    os.rename(os.path.join(path, b), os.path.join(swap_old, b))
    os.rename(os.path.join(f"{path}__compacting", b), os.path.join(path, b))
    srv.recover_compaction(spark, path)
    for leftover in (f"{path}__compacting", swap_old,
                     f"{path}__retired_metadata"):
        assert not os.path.exists(leftover)
    # every partition is the compacted rewrite: raw read holds zero
    # tombstoned ids anywhere (physical erasure completed)
    raw = spark.read.schema(schema).parquet(path)
    assert raw.filter(F.col("vec_id").isin(dead)).count() == 0
    # tombstones intentionally left in place (still masking, a no-op
    # after erasure) — probes bit-identical to pre-crash
    after = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    assert after == expected
    # a follow-up compaction converges and resets the tombstones
    srv.compact_partitioned_table(spark, path, schema=schema)
    assert not os.path.exists(f"{path}_tombstones")
    ivf.cells.unpersist()


def test_recover_rolls_forward_retired_sink_log(spark, sf_smoke, tmp_path):
    """ADVICE r10 #1: the sink log survives until the swap completes.
    Crash states with a committed staging dir and the log still
    in place (or already moved aside) must both converge: the swap is
    finished and the log ends up gone — never half-dropped before the
    swap."""
    schema = "vec_id long, qvec array<long>, qnorm long, cell long"
    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    path = served.path
    expected = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    # state 1: committed staging, log still in place, swap not started
    _stage_compaction_rewrite(spark, path, schema)
    os.makedirs(f"{path}/_spark_metadata")
    srv.recover_compaction(spark, path)
    assert not os.path.exists(f"{path}/_spark_metadata")
    assert not os.path.exists(f"{path}__retired_metadata")
    assert not os.path.exists(f"{path}__compacting")
    # state 2: log moved aside, then crash before its final delete
    os.makedirs(f"{path}__retired_metadata")
    srv.recover_compaction(spark, path)
    assert not os.path.exists(f"{path}__retired_metadata")
    after = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    assert after == expected
    ivf.cells.unpersist()


def test_maintenance_on_file_uri_scheme(spark, sf_smoke, tmp_path):
    """The whole delete → compact → probe lifecycle on a ``file://``
    URI root — every maintenance step must flow through the Hadoop
    FileSystem API (VERDICT r10 remaining gap: os.rename/os.listdir
    are driver-local-only; on a URI path they would fail or silently
    no-op), so this passes only if no os.path call is left on the
    maintenance side."""
    import uwheel_datafusion_spark.operators.similarity as sim2

    emb = load_table(spark, sf_smoke, "embeddings")
    ivf = sim2.ivf_build_wide(emb, n_cells=8)
    local = tmp_path / "ivf_uri"
    uri = f"file://{local}"
    served = srv.save_ivf_payload(ivf, emb, uri)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        "vec_id", "embedding"
    )
    dead = [r.vec_id for r in emb.filter(F.col("vec_id") % 5 == 0)
            .select("vec_id").collect()]
    assert srv.delete_vectors_from_index(spark, uri, dead) == len(dead)
    before = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    n_files = srv.compact_partitioned_table(
        spark, uri,
        schema="vec_id long, qvec array<long>, qnorm long, cell long",
    )
    assert n_files > 0
    # tombstones folded and reset, deleted rows physically gone
    assert not (tmp_path / "ivf_uri_tombstones").exists()
    raw = spark.read.parquet(uri)
    assert raw.filter(F.col("vec_id").isin(dead)).count() == 0
    after = sorted(
        map(tuple,
            srv.ivf_search_served(served, queries, k=5, nprobe=3).collect())
    )
    assert after == before
    ivf.cells.unpersist()


def test_keyword_maintenance_on_file_uri_scheme(spark, sf_smoke, tmp_path):
    """Keyword-index twin of the file:// lifecycle: build → delete →
    compact → probe with a URI root, exercising the stats rebase and
    the shared-tombstone two-table fold through the Hadoop FS API."""
    docs = load_table(spark, sf_smoke, "documents")
    uri = f"file://{tmp_path / 'kw_uri'}"
    tx.build_keyword_index(docs, uri)
    tx.build_keyword_positions(docs, uri)
    dead = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()]
    tx.delete_docs_from_index(spark, uri, dead)
    before = _probe_all(spark, uri)
    out = tx.compact_keyword_index(spark, uri)
    assert out["postings_files"] > 0
    assert _probe_all(spark, uri) == before
    assert not (tmp_path / "kw_uri" / "tombstones").exists()
    raw = spark.read.parquet(f"{uri}/postings")
    assert raw.filter(F.col("doc_id").isin(dead)).count() == 0


def test_compaction_lock_blocks_concurrent_run(spark, sf_smoke, tmp_path):
    """Round 11: a second compaction of the same table must refuse
    while the lock is held (its recover-on-entry would destroy the
    first's in-flight staging), and steal_lock=True lets an operator
    assert the holder is dead. The lock is released on completion."""
    from uwheel_datafusion_spark.operators.util import fs_try_lock

    emb, ivf, served, queries = _served_ivf(spark, sf_smoke, tmp_path)
    schema = "vec_id long, qvec array<long>, qnorm long, cell long"
    lock = f"{served.path}__maintenance_lock"
    assert fs_try_lock(spark, lock)  # simulate a holder
    with pytest.raises(RuntimeError, match="steal_lock"):
        srv.compact_partitioned_table(spark, served.path, schema=schema)
    assert os.path.exists(lock)  # the refused caller did not free it
    srv.compact_partitioned_table(
        spark, served.path, schema=schema, steal_lock=True
    )
    assert not os.path.exists(lock)  # released on completion
    # and a fresh run takes/releases it cleanly
    srv.compact_partitioned_table(spark, served.path, schema=schema)
    assert not os.path.exists(lock)
    ivf.cells.unpersist()
