"""Cell-partitioned ANN serving: the index CONTAINS what serving reads.

The wide IVF kernels (operators/similarity.py) keep their stored half
as an in-memory (vec_id, cell) frame, so every search joins the FULL
quantized corpus on vec_id to recover the vector payload — cell
pruning saves compute but not I/O or shuffle (measured at 1M vectors:
wide-IVF search 19.45s vs 21.13s brute force, a 1.08x win where ~8x of
the corpus is pruned). This module fixes the layout: at build time the
payload itself — quantized vectors for IVF-Flat, byte codes for
IVF-PQ — is written INTO a parquet table ``PARTITIONED BY cell``, and
search reads ONLY the probed cells' partitions (literal ``cell IN
(...)`` predicate -> partition pruning, pinned in tests/test_plans.py
by inspecting the files actually read). No corpus-side join remains:
search cost is (nprobe/n_cells) of the table, in I/O as well as
compute.

This is the reference's own thesis applied to vectors: µWheel answers
from the index and never rescans the source (reference
``src/main.rs:212`` — `combine_range` on the pre-built wheel vs the
DataFusion table scan). Same lifecycle as the repo's other persisted
indexes: the LSH band index (dedup.save_lsh_index /
lsh_incremental_candidates) and the span gram index (spans.py).

All arithmetic is byte-identical to the in-memory wide kernels
(same quantization, same driver-side exact-int64 probe ranking and ADC
LUTs, same tie-breaks), so the same relational DuckDB oracles gate
both paths.

Reference scope: beyond-parity training-data infrastructure
(SURVEY.md §2.12); the serve-from-index discipline mirrors
src/main.rs:205-235.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from uwheel_datafusion_spark.functions.dialect import SPARK
from uwheel_datafusion_spark.operators.similarity import (
    IvfIndex,
    PqIndex,
    _pq_geometry,
    _quantized,
)
from uwheel_datafusion_spark.operators.util import fs_exists


@dataclass
class ServedIvfIndex:
    """IVF-Flat's serving-complete stored half: coarse centroids plus
    the PATH of a parquet table (cell, vec_id, qvec, qnorm)
    PARTITIONED BY cell. Search needs nothing else. ``has_binary``
    records whether the payload carries the packed sign words
    (save_ivf_payload include_binary=True) — the binary-Hamming tier
    checks it and FAILS FAST instead of reading bvec as NULL (ADVICE
    r11 #2: NULL Hamming sorts FIRST in the ascending candidate
    window, silently replacing the top-n_candidates with an arbitrary
    subset)."""

    centroids: list
    path: str
    n_cells: int
    has_binary: bool = False
    #: LSM generations (round 12 — VERDICT r11 next #2): older
    #: compacted baseline in ``path``, newer STREAM-maintained delta
    #: tables appended here; every search reads the union, each
    #: generation through its own sink log / tombstones / maintenance
    #: markers. merge_generations folds a retired delta back into the
    #: baseline.
    delta_paths: tuple = ()
    #: MANIFEST-committed payload (round 12 — VERDICT r11 missing #5):
    #: when set, the payload lives in a manifest table rooted here
    #: (operators/manifest.py) and ``path``/``delta_paths`` are
    #: ignored — probes resolve the latest committed snapshot instead
    #: of checking maintenance markers (none exist: every commit is
    #: one atomic small-file publication).
    manifest_root: "str | None" = None
    #: Snapshot-resolution cache policy for manifest probes (VERDICT
    #: r11 wrong #2 — the probe's fixed FS cost): 0.0 re-resolves per
    #: probe (2 RPCs, always-fresh), a positive TTL amortizes them,
    #: None PINS the first-resolved snapshot for the handle's lifetime
    #: (Iceberg read isolation — zero FS round-trips per probe, the
    #: hot-serving configuration).
    snapshot_ttl_sec: "float | None" = 0.0
    _snap: object = field(default=None, repr=False, compare=False)
    _snap_ts: float = field(default=0.0, repr=False, compare=False)


@dataclass
class ServedIvfPqIndex:
    """IVF-PQ's serving-complete stored half: coarse centroids, PQ
    codebooks, and the path of a (cell, vec_id, code_0..code_{m-1})
    parquet table PARTITIONED BY cell.

    ``residual``/``rotated`` (round 13 — VERDICT r12 next #1: the
    production serving tier was locked out of the two measured recall
    wins) record the CODE SPACE the table was built in: residual codes
    are relative to the coarse centroid (per-(query, probed-cell)
    LUTs at search), rotated means the whole pipeline — centroids,
    residuals, codebooks — lives in the Hadamard-rotated space and
    queries are rotated driver-side before probe ranking. The layout
    on disk is identical; only the LUT construction differs."""

    centroids: list
    books: list
    path: str
    n_cells: int
    m: int
    dim: int
    residual: bool = False
    rotated: bool = False


def ivf_payload_frame(
    index: IvfIndex,
    vecs: DataFrame,
    vec_col: str = "embedding",
    extra_cols: tuple = (),
    include_binary: bool = False,
    dim: int = 64,
) -> DataFrame:
    """The (cell, vec_id, qvec, qnorm[, bvec][, extras]) frame every
    payload writer materializes — shared by the dir-swap layout
    (:func:`save_ivf_payload`), the manifest-committed layout
    (:func:`save_ivf_payload_manifest`), and any later generation
    append (manifest_table_append on the same root).

    CELL CONTRACT (round 14 — VERDICT r13 next #1): the cell is
    recomputed map-side from the index's FROZEN centroids inside the
    quantize pass (similarity._assign_cells_passthrough — the exact
    argmin kernel, rotated-space when ``index.rotated``), NOT joined
    from ``index.cells``. This is the contract the streaming ingest
    twin (ann_stream.payload_rows_stream) has always had — batch save
    and streamed ingest now assign identically by construction — and
    it removes the build-time corpus-by-vec_id shuffle (guide §2.4):
    at 10⁹ vectors the old payload ⋈ cells join re-shuffled the whole
    corpus to attach a value that is a pure function of (centroids,
    row). Every IvfIndex this repo constructs (ivf_build,
    ivf_build_wide incl. sample-trained/rotated, streamed rehydration
    via ivf_index_from_table) satisfies cells ≡ argmin(centroids), so
    for any ``vecs`` drawn from the indexed corpus the frame is
    row-identical to the old join; rows of ``vecs`` NOT in
    ``index.cells`` are now assigned (FAISS add() semantics) instead
    of silently dropped — callers needing membership filtering must
    pre-filter ``vecs``."""
    from uwheel_datafusion_spark.functions.dialect import SPARK as _D
    from uwheel_datafusion_spark.operators.similarity import (
        _assign_cells_passthrough,
    )

    qv = _quantized(vecs, vec_col).select(
        "vec_id", "qvec", "qnorm", *extra_cols
    )
    assigned = _assign_cells_passthrough(
        qv, index.centroids,
        rotated=getattr(index, "rotated", False), dim=dim,
    )
    bin_cols = ()
    if include_binary:
        assigned = assigned.withColumn(
            "bvec", F.expr(_D.sign_pack32("qvec", dim))
        )
        bin_cols = ("bvec",)
    return assigned.select(
        "cell", "vec_id", "qvec", "qnorm", *bin_cols, *extra_cols
    )


def save_ivf_payload(
    index: IvfIndex,
    vecs: DataFrame,
    path: str,
    vec_col: str = "embedding",
    mode: str = "overwrite",
    extra_cols: tuple = (),
    include_binary: bool = False,
    dim: int = 64,
) -> ServedIvfIndex:
    """Materialize the IVF-Flat payload into its cell layout: ONE
    build-time shuffle (the cell-partitioned write; the cell itself is
    assigned map-side from the frozen centroids — see
    :func:`ivf_payload_frame`), amortized over every search. The
    zero-norm rows are kept (the write is metric-agnostic); cosine
    search filters qnorm > 0 at read exactly like the in-memory path.
    ``extra_cols`` denormalizes metadata columns (label, lang, ...)
    into the payload so FILTERED search (metadata predicate + vector
    query) runs from the index alone — the predicate pushes into the
    pruned parquet read next to the cell filter. ``include_binary``
    additionally materializes the packed sign-bit words (``bvec``,
    dialect.sign_pack32) so the served binary-Hamming candidate stage
    (:func:`ivf_binary_search_served`) reads its 1-bit codes straight
    from the pruned partitions — computed once at build, never at
    query time."""
    payload = ivf_payload_frame(
        index, vecs, vec_col, extra_cols, include_binary, dim
    )
    # sort within partitions by vec_id: parquet row-group min/max
    # stats on vec_id then serve the rerank's isin() point lookups
    # with row-group pruning instead of full-partition reads
    (
        payload.repartition(F.col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell")
        .mode(mode)
        .parquet(path)
    )
    return ServedIvfIndex(
        centroids=index.centroids, path=path, n_cells=index.n_cells,
        has_binary=include_binary,
    )


def save_ivfpq_payload(
    ivf_index: IvfIndex,
    pq_index: PqIndex,
    path: str,
    mode: str = "overwrite",
) -> ServedIvfPqIndex:
    """Materialize the IVF-PQ codes into the coarse-cell layout:
    (cell, vec_id, code_0..code_{m-1}) PARTITIONED BY cell — m small
    ints per vector, so the probed fraction is tiny in bytes too."""
    m = pq_index.m
    payload = pq_index.codes.join(ivf_index.cells, "vec_id").select(
        "cell", "vec_id", *[f"code_{s}" for s in range(m)]
    )
    (
        payload.repartition(F.col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell")
        .mode(mode)
        .parquet(path)
    )
    return ServedIvfPqIndex(
        centroids=ivf_index.centroids,
        books=pq_index.books,
        path=path,
        n_cells=ivf_index.n_cells,
        m=m,
        dim=pq_index.dim,
    )


def save_ivfpq_payload_residual(
    res_index, path: str, mode: str = "overwrite", rotated: bool = False
) -> ServedIvfPqIndex:
    """Materialize RESIDUAL (optionally Hadamard-rotated) PQ codes into
    the served coarse-cell layout (round 13 — VERDICT r12 next #1: the
    residual/rotated codes measurably beat plain PQ on the 1M bench
    but existed only in-memory). The ResidualPqIndex's codes frame
    already carries (vec_id, cell, code_*) — same partitioned write,
    same probe pruning; the returned handle's ``residual``/``rotated``
    flags switch the search to per-(query, probed-cell) LUTs. Cite:
    serve-from-index discipline per reference src/main.rs:205-235."""
    m = res_index.m
    payload = res_index.codes.select(
        "cell", "vec_id", *[f"code_{s}" for s in range(m)]
    )
    (
        payload.repartition(F.col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell")
        .mode(mode)
        .parquet(path)
    )
    return ServedIvfPqIndex(
        centroids=res_index.centroids,
        books=res_index.books,
        path=path,
        n_cells=res_index.n_cells,
        m=m,
        dim=res_index.dim,
        residual=True,
        rotated=rotated,
    )


def _rank_probes(centroids: list, qrows, nprobe: int) -> list:
    """(query_id, cell) probe pairs — the nprobe nearest coarse cells
    per collected query row, exact int64, first-minimum tie-break
    toward the lower cid (identical to the Arrow assign kernel)."""
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)
    pairs = []
    for r in qrows:
        if r["qvec"] is None:  # NULL embedding: never probes (ADVICE r13)
            continue
        x = np.asarray(r["qvec"], dtype=np.int64)
        d2 = (x * x).sum() + cnorm - 2 * (cmat @ x)
        order = np.lexsort((np.arange(len(d2)), d2))
        pairs.extend((int(r["vec_id"]), int(c)) for c in order[:nprobe])
    return pairs


def delete_vectors_from_index(
    spark: SparkSession, path: str, vec_ids: list
) -> int:
    """Right-to-erasure for ONE served ANN table (IVF payload or PQ
    codes): append (vec_id) TOMBSTONES to the sibling
    ``{path}_tombstones`` dir — the same LSM discipline as the keyword
    index (textops.delete_docs_from_index); every search anti-joins
    them, and :func:`compact_partitioned_table` folds them into a
    physical rewrite. No payload file is rewritten here. Coarse
    centroids are unaffected (FAISS remove_ids semantics: the trained
    quantizer keeps serving).

    IDEMPOTENT (ADVICE r9): already-tombstoned ids are dropped before
    the append, so a re-delivered delete request neither grows the
    tombstone table nor changes any probe. Returns the number of
    NEWLY tombstoned ids. A served IVF-PQ deployment has TWO tables
    (codes + full-precision payload) — use
    :func:`delete_vectors_served` to tombstone both in one call.

    ``vec_ids`` is a Python iterable OR a DataFrame whose FIRST column
    holds the ids (round 12 — ADVICE r10 #2 second carry / VERDICT r11
    next #4): a production right-to-erasure batch arrives as a frame
    (ids matching a predicate, an uploaded GDPR list), and the whole
    pipeline — dedup against the request itself, anti-join against the
    existing tombstones, the append — now stays DISTRIBUTED with no
    driver round-trip of the id set for either input shape (pinned by
    a monkeypatched-collect test)."""
    tomb = f"{path}_tombstones"
    if isinstance(vec_ids, DataFrame):
        ids_df = (
            vec_ids.select(
                F.col(vec_ids.columns[0]).cast("long").alias("vec_id")
            )
            .where(F.col("vec_id").isNotNull())
            .distinct()
        )
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in sorted({int(i) for i in vec_ids})],
            "vec_id long",
        )
    if fs_exists(spark, tomb):
        # broadcast anti-join, not an isin literal — a large delete
        # batch as an In-predicate is a planner-choking expression
        # (see textops.delete_docs_from_index)
        ids_df = ids_df.join(
            spark.read.schema("vec_id long").parquet(tomb),
            "vec_id",
            "left_anti",
        )
    # persist: the count and the append must see the SAME anti-join
    # result without recomputing the dedup twice
    ids_df = ids_df.persist()
    try:
        n_new = ids_df.count()
        if n_new:
            ids_df.write.mode("append").parquet(tomb)
        return n_new
    finally:
        ids_df.unpersist()


def delete_vectors_served(
    spark: SparkSession, paths: list, vec_ids
) -> dict:
    """Tombstone ``vec_ids`` across EVERY table of a served deployment
    in one call — for IVF-PQ that is BOTH the codes table and the
    full-precision payload the rerank refines from (ADVICE r9: a
    payload-only tombstone leaves deleted ids consuming ADC candidate
    slots, silently shrinking effective n_candidates). Returns
    {path: newly_tombstoned_count}. ``vec_ids`` may be an iterable or
    an id DataFrame (round 12); a frame is persisted across the loop
    so every table tombstones the SAME id set even when the frame's
    lineage is non-deterministic (a sampled or freshly-joined batch) —
    a per-table re-evaluation drifting between the codes and payload
    tables would recreate exactly the dual-table inconsistency this
    function exists to prevent."""
    if isinstance(vec_ids, DataFrame):
        vec_ids = vec_ids.persist()
        try:
            vec_ids.count()  # materialize before fan-out
            return {
                p: delete_vectors_from_index(spark, p, vec_ids)
                for p in paths
            }
        finally:
            vec_ids.unpersist()
    return {
        p: delete_vectors_from_index(spark, p, vec_ids) for p in paths
    }


def _read_payload(
    spark: SparkSession, path, probed: list, schema: str
) -> DataFrame:
    """Read ONLY the probed cells' partitions of a served payload
    table. The literal isin() lands as a PartitionFilter on the
    parquet scan — unprobed directories are never opened (pinned
    functionally in tests/test_plans.py by corrupting unprobed
    partitions). The schema is explicit: no footer-inference reads at
    planning time, which at scale would open files outside the probed
    partitions. Tombstoned vec_ids (if any) are anti-joined out —
    AQE broadcasts the tombstone side while it is small. Tombstone
    presence is checked through the Hadoop FileSystem API (fs_exists)
    so HDFS/S3 deployments see deletes exactly like local runs.

    ADVICE r10 #4: a probe REFUSES to read through a maintenance
    marker (``__compacting`` / ``__swap_old`` sibling) — after a
    mid-swap crash a moved-aside partition's live rows would otherwise
    be silently absent from every result until an operator happened to
    re-run compaction; and auto-healing here would corrupt a
    compaction that is merely in flight. Loud and named beats silent
    and wrong.

    ``path`` may be a single table or a SEQUENCE of generations
    (compacted baseline + stream-maintained deltas — round 12,
    VERDICT r11 next #2): each generation is read through its own
    sink log, anti-joins its own tombstones, and refuses on its own
    maintenance markers; the union is by name, so the plan stays
    per-generation partition-pruned."""
    from uwheel_datafusion_spark.operators.util import (
        assert_not_mid_maintenance,
    )

    paths = [path] if isinstance(path, str) else list(path)
    outs = []
    for p in paths:
        assert_not_mid_maintenance(
            spark, f"{p}__compacting", f"{p}__swap_old"
        )
        df = (
            spark.read.schema(schema)
            .parquet(p)
            .filter(F.col("cell").isin(probed))
        )
        if fs_exists(spark, f"{p}_tombstones"):
            dead = spark.read.schema("vec_id long").parquet(
                f"{p}_tombstones"
            )
            df = df.join(dead, "vec_id", "left_anti")
        outs.append(df)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _gen_paths(index) -> list:
    """All generations of a served index handle, baseline first."""
    return [index.path, *getattr(index, "delta_paths", ())]


def _manifest_snapshot(index, spark: SparkSession):
    """Resolve (and per-handle cache) the index's committed manifest
    snapshot under the handle's ``snapshot_ttl_sec`` policy — the fix
    for the probe's fixed FS cost (VERDICT r11 wrong #2): a pinned or
    TTL-cached snapshot makes the steady-state probe pay ZERO
    existence RPCs (manifest tables have no maintenance markers to
    check at all — every committed state is complete by construction).
    """
    import time as _time

    from uwheel_datafusion_spark.operators.manifest import manifest_latest

    ttl = index.snapshot_ttl_sec
    now = _time.monotonic()
    if index._snap is not None and (
        ttl is None or now - index._snap_ts < ttl
    ):
        return index._snap
    snap = manifest_latest(spark, index.manifest_root)
    if snap is None:
        raise ValueError(
            f"{index.manifest_root}: no committed manifest generation"
        )
    index._snap, index._snap_ts = snap, now
    return snap


def _payload_df(
    index, spark: SparkSession, probed: list, schema: str
) -> DataFrame:
    """The probed payload rows of a served handle, whichever layout it
    uses: manifest-committed (snapshot-resolved, marker-free) or the
    dir-swap table family (baseline + LSM delta generations, each read
    through its own sink log / tombstones / maintenance markers)."""
    if getattr(index, "manifest_root", None):
        from uwheel_datafusion_spark.operators.manifest import (
            manifest_table_read,
        )

        return manifest_table_read(
            spark,
            index.manifest_root,
            schema=schema,
            snapshot=_manifest_snapshot(index, spark),
            probed=probed,
        )
    return _read_payload(spark, _gen_paths(index), probed, schema)


def save_ivf_payload_manifest(
    index: IvfIndex,
    vecs: DataFrame,
    root: str,
    vec_col: str = "embedding",
    extra_cols: tuple = (),
    include_binary: bool = False,
    dim: int = 64,
    snapshot_ttl_sec: "float | None" = 0.0,
) -> ServedIvfIndex:
    """save_ivf_payload's manifest-committed twin: the quantized cell
    layout lands as ONE immutable data generation published by ONE
    small-file commit (operators/manifest.py — no data renames ever,
    the S3A-safe maintenance story). Later ingest appends further
    generations (manifest_table_append on the same root); erasure goes
    through manifest_table_delete; folding through
    manifest_table_compact + manifest_vacuum. Probes resolve the
    committed snapshot instead of checking maintenance markers."""
    from uwheel_datafusion_spark.operators.manifest import (
        manifest_table_append,
    )

    payload = ivf_payload_frame(
        index, vecs, vec_col, extra_cols, include_binary, dim
    )
    manifest_table_append(
        vecs.sparkSession, root, payload, note="initial payload"
    )
    return ServedIvfIndex(
        centroids=index.centroids,
        path=root,
        n_cells=index.n_cells,
        has_binary=include_binary,
        manifest_root=root,
        snapshot_ttl_sec=snapshot_ttl_sec,
    )


def ivf_search_served(
    index: ServedIvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    where: str | None = None,
    extra_schema: str = "",
) -> DataFrame:
    """Multi-probe cosine top-k answered ENTIRELY from the served
    table: the corpus is never touched. ``queries`` is a small
    (vec_id, vec_col) frame — arriving queries in production, a
    pushed-down isin() slice of the corpus in the gates. Same output
    contract and bit-identical results to ivf_search_wide (same
    quantization, probe ranking, cosine and (cosine desc, neighbor_id)
    tie-break), so the same oracle gates both.

    ``where`` (with its columns declared in ``extra_schema``, e.g.
    ``where="label = 3", extra_schema="label long"``) is FILTERED
    search — the FAISS IDSelector/metadata-predicate shape: the index
    is built over everything, the predicate applies at query time to
    the candidate side only, and it lands in the pruned parquet scan
    as a pushed data filter next to the cell partition filter. Probe
    ranking is unchanged (cells are geometric, the filter is not), so
    recall within the filtered subset degrades gracefully exactly as
    FAISS filtered search does."""
    assert 1 <= nprobe <= index.n_cells
    spark = queries.sparkSession
    qq = _quantized(queries, vec_col, drop_zero=True)
    qrows = qq.select("vec_id", "qvec").collect()
    pairs = _rank_probes(index.centroids, qrows, nprobe)
    probe_pairs = spark.createDataFrame(pairs, "query_id long, q_cell long")
    probed = sorted({c for _, c in pairs})
    extra = f", {extra_schema}" if extra_schema else ""
    payload = _payload_df(
        index,
        spark,
        probed,
        f"vec_id long, qvec array<long>, qnorm long{extra}, cell long",
    ).filter(F.col("qnorm") > 0)
    if where:
        payload = payload.filter(where)
    qframe = qq.select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    cos = F.expr(
        SPARK.cosine_q(SPARK.dot_q("q_qvec", "qvec"), "q_qnorm", "qnorm")
    )
    scored = (
        payload.join(F.broadcast(probe_pairs), F.col("cell") == F.col("q_cell"))
        .join(F.broadcast(qframe), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _maybe_rotated_qrows(index, qrows) -> list:
    """Collected (vec_id, qvec) rows, Hadamard-rotated when the served
    index lives in rotated space — exact int64 H @ x driver-side, the
    same integer rotation the build applied corpus-side."""
    if not getattr(index, "rotated", False):
        return qrows
    import numpy as np

    from uwheel_datafusion_spark.operators.similarity import _had_row

    dim = index.dim
    H = np.array([_had_row(j, dim) for j in range(dim)], dtype=np.int64)
    return [
        {
            "vec_id": int(r["vec_id"]),
            "qvec": [int(v) for v in H @ np.asarray(r["qvec"], np.int64)],
        }
        for r in qrows
    ]


def ivfpq_search_served(
    index: ServedIvfPqIndex,
    queries: DataFrame,
    topk: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k answered entirely from the served codes table: probe
    pairs and LUTs driver-side (exact int64), then ONE Arrow pass over
    the probed partitions' codes through the shared ADC scan kernel
    (similarity._adc_scan_topk — round 14: the served candidate stage
    was the last ADC path still running the broadcast-LUT join +
    element_at chain + full-width window the in-memory paths dropped
    in round 13; guide §4.2 / §2.3). No corpus access; bit-identical
    to ivfpq_search_wide — the kernel computes the same m int64 LUT
    lookups and the same (adc_dist, neighbor_id) total order.

    RESIDUAL tables (``index.residual`` — round 13): the LUT is built
    per (query, probed cell) against the residual codebooks (query
    residual q − c driver-side) — bit-identical to
    ivfpq_search_residual. ROTATED tables additionally rotate the
    collected query vectors with the integer Hadamard first. Disk
    layout, partition pruning and tombstone handling are identical
    across all four code spaces."""
    assert 1 <= nprobe <= index.n_cells
    import numpy as np

    from uwheel_datafusion_spark.operators.similarity import (
        _adc_scan_topk,
        _pq_geometry,
    )

    m, dim = index.m, index.dim
    spark = queries.sparkSession
    qrows = (
        _quantized(queries, vec_col).select("vec_id", "qvec").collect()
    )
    qrows = [r for r in qrows if r["qvec"] is not None]
    qrows = _maybe_rotated_qrows(index, qrows)
    pairs = _rank_probes(index.centroids, qrows, nprobe)
    probed = sorted({c for _, c in pairs})
    code_schema = ", ".join(f"code_{s} long" for s in range(m))
    payload = _payload_df(
        index, spark, probed, f"vec_id long, {code_schema}, cell long"
    )
    geom = _pq_geometry(dim, m)
    mats = [np.asarray(b, dtype=np.int64) for b in index.books]
    norms = [(c * c).sum(axis=1) for c in mats]
    probes_by_q: dict = {}
    for qid, cell in pairs:
        probes_by_q.setdefault(qid, []).append(cell)
    entries = []
    if index.residual:
        cmat = np.asarray(index.centroids, dtype=np.int64)
        for r in qrows:
            x = np.asarray(r["qvec"], dtype=np.int64)
            for cell in probes_by_q.get(int(r["vec_id"]), ()):
                qres = x - cmat[cell]
                lut = np.stack(
                    [
                        (qres[lo - 1 : lo - 1 + w] ** 2).sum()
                        + norms[s]
                        - 2 * (mats[s] @ qres[lo - 1 : lo - 1 + w])
                        for s, (lo, w) in enumerate(geom)
                    ]
                )
                entries.append((int(r["vec_id"]), [int(cell)], lut))
    else:
        for r in qrows:
            x = np.asarray(r["qvec"], dtype=np.int64)
            lut = np.stack(
                [
                    (x[lo - 1 : lo - 1 + w] ** 2).sum()
                    + norms[s]
                    - 2 * (mats[s] @ x[lo - 1 : lo - 1 + w])
                    for s, (lo, w) in enumerate(geom)
                ]
            )
            entries.append(
                (
                    int(r["vec_id"]),
                    [int(c) for c in probes_by_q.get(int(r["vec_id"]), ())],
                    lut,
                )
            )
    return _adc_scan_topk(payload, m, entries, topk)


def recover_compaction(
    spark: SparkSession, path: str, partition_col: str = "cell"
) -> None:
    """Repair a compaction crash BEFORE reading or re-compacting —
    the torn-swap recovery contract the rollup writers established
    (rollup_io._recover_torn_partitions), applied to the index family.
    Every filesystem operation goes through the Hadoop FileSystem API
    (ADVICE r10 / VERDICT r10 remaining gap: the probe side was
    FS-agnostic but the maintenance side was driver-local-only), so
    recovery behaves identically on file:/, hdfs:// and s3a:// paths.

    The decision key is the staging dir's ``_SUCCESS`` marker (written
    by Spark's output committer when — and only when — the rewrite
    completed):

    - ``{path}__compacting/_SUCCESS`` PRESENT: the staged rewrite is a
      complete, exactly-once view of the compacted table (it was read
      THROUGH any ``_spark_metadata`` sink log), so recovery rolls
      FORWARD — it finishes the per-partition swap and the cleanup.
      Per partition the protocol leaves exactly one of three states,
      each distinguished by (live?, aside?, staged?): not-started
      (live=old, no aside, staged), mid-swap (no live, aside, staged),
      done (live=new, aside, no staged); a fold-to-empty partition is
      (live=old, no aside, no staged) before and (no live, aside, no
      staged) after its removal. Tombstones are left in place — the
      ids they mask were already erased by the staged rewrite, so the
      anti-join is a no-op until the next compaction resets them.
    - ``_SUCCESS`` ABSENT but staging present: the rewrite itself
      crashed — roll BACK by dropping the staging dir; the live table
      and its sink log were never touched.
    - ``{path}__swap_old/{partition_col}=X`` with NO staging dir
      (a hand-torn state — the protocol removes swap_old before
      staging): restore X if its live dir is missing, else drop the
      stale aside copy.
    - ``{path}__retired_metadata`` (the sink log moved aside before
      the swap — ADVICE r10 #1: the log must outlive the swap) with
      no staging: the swap completed, only the final cleanup crashed —
      drop it.
    - ``{path}_tombstones__folded``: tombstones were swapped away but
      the final cleanup didn't run — drop it.

    Aside dirs live OUTSIDE the table directory, so a probe never sees
    a partition dir (``cell=3__old``) that fails partition-value
    casting — the table dir only ever contains parseable partitions."""
    from uwheel_datafusion_spark.operators.util import (
        fs_delete,
        fs_exists,
        fs_is_dir,
        fs_list_names,
        fs_mkdirs,
        fs_read_text,
        fs_rename,
    )

    staging = f"{path}__compacting"
    swap_old = f"{path}__swap_old"
    retired = f"{path}__retired_metadata"
    meta = f"{path}/_spark_metadata"
    prefix = f"{partition_col}="
    if fs_is_dir(spark, staging) and fs_exists(spark, f"{staging}/_SUCCESS"):
        # roll FORWARD: the staged rewrite is complete — finish the job.
        # A generation MERGE (merge_generations) stamps the consumed
        # delta's path into the committed staging dir; roll-forward
        # must then also remove that delta, or a crash mid-merge would
        # leave the swapped-in union AND the still-live delta double-
        # counting every delta row in a generation-aware probe.
        merge_src = fs_read_text(spark, f"{staging}/_MERGE_SOURCE")
        if fs_is_dir(spark, meta):
            fs_rename(spark, meta, retired)
        staged = set(fs_list_names(spark, staging, prefix))
        aside = set(fs_list_names(spark, swap_old, prefix))
        live = set(fs_list_names(spark, path, prefix))
        # The decision needs INTENT, not just observed state (ADVICE
        # r11 #1 follow-through): once the swap empties the staging
        # dir, `staged = {}` is AMBIGUOUS between "every partition
        # folds to empty — live is OLD data, remove it" (all rows
        # tombstoned, crash before the first move-aside) and "swap
        # complete, crash before cleanup — live is the NEW data,
        # removing it destroys the table". So the swap records its
        # intent first: _STAGED_PARTS (written by the compactor before
        # its first rename, or here on first recovery entry for a
        # merge-committed staging, which by construction precedes any
        # swap) lists exactly the partitions that must exist after the
        # swap; everything else in `live` is old data to fold away.
        from uwheel_datafusion_spark.operators.util import fs_write_text

        marker = fs_read_text(spark, f"{staging}/_STAGED_PARTS")
        if marker is None:
            # no swap rename has run yet (write-before-swap
            # discipline), so the staging listing is complete
            expected = set(staged)
            fs_write_text(
                spark,
                f"{staging}/_STAGED_PARTS",
                "\n".join(sorted(expected)),
            )
        else:
            expected = {p for p in marker.splitlines() if p}
        if staged or aside or live:
            fs_mkdirs(spark, swap_old)
            for part in sorted(staged | aside | live | expected):
                in_s, in_l, in_a = part in staged, part in live, part in aside
                if part in expected:
                    if in_s:
                        if in_l and not in_a:  # not started: live is old
                            fs_rename(
                                spark, f"{path}/{part}", f"{swap_old}/{part}"
                            )
                            in_l = False
                        if not in_l:  # mid-swap or just moved aside
                            fs_rename(
                                spark, f"{staging}/{part}", f"{path}/{part}"
                            )
                        # (live & aside & staged) cannot occur per protocol
                    # else: already installed (swap finished for it)
                elif in_l and not in_a:  # fold-to-empty not yet removed
                    fs_rename(spark, f"{path}/{part}", f"{swap_old}/{part}")
        fs_delete(spark, swap_old)
        if merge_src:
            src = merge_src.strip()
            # fold ONLY the tombstone part-files the staged union
            # actually applied (_TOMB_SNAPSHOT, stamped at the staging
            # read — ADVICE r12 #4): lock-free deletes appended during
            # the merge window survive — base arrivals stay in place,
            # delta arrivals re-home to the base table (their rows live
            # there now). Every step is idempotent and over-masks on a
            # crash (a not-yet-deleted consumed file masks rows the
            # rewrite already erased — a no-op anti-join), so re-entry
            # converges.
            snap_txt = fs_read_text(spark, f"{staging}/_TOMB_SNAPSHOT")
            base_tomb = f"{path}_tombstones"
            delta_tomb = f"{src}_tombstones"
            if snap_txt is None:
                # legacy staging (pre-snapshot protocol): wholesale fold
                fs_delete(spark, delta_tomb)
                if fs_exists(spark, base_tomb):
                    fs_rename(
                        spark, base_tomb, f"{path}_tombstones__folded"
                    )
            else:
                applied = {ln for ln in snap_txt.splitlines() if ln}
                for n in fs_list_names(spark, base_tomb, "part-"):
                    if f"base:{n}" in applied:
                        fs_delete(spark, f"{base_tomb}/{n}")
                survivors = [
                    n
                    for n in fs_list_names(spark, delta_tomb, "part-")
                    if f"delta:{n}" not in applied
                ]
                if survivors:
                    fs_mkdirs(spark, base_tomb)
                    for n in survivors:
                        fs_rename(
                            spark, f"{delta_tomb}/{n}", f"{base_tomb}/{n}"
                        )
                fs_delete(spark, delta_tomb)
                if fs_exists(spark, base_tomb) and not fs_list_names(
                    spark, base_tomb, "part-"
                ):
                    fs_delete(spark, base_tomb)
            fs_delete(spark, src)
        fs_delete(spark, staging)
        fs_delete(spark, retired)
        fs_delete(spark, f"{path}_tombstones__folded")
        return
    # roll BACK / cleanup: an incomplete rewrite never touched the live
    # table or its sink log
    fs_delete(spark, staging)
    if fs_is_dir(spark, swap_old):
        for part in fs_list_names(spark, swap_old, prefix):
            if fs_exists(spark, f"{path}/{part}"):
                fs_delete(spark, f"{swap_old}/{part}")
            else:
                fs_rename(spark, f"{swap_old}/{part}", f"{path}/{part}")
        fs_delete(spark, swap_old)
    # a retired log with no staging means the swap fully completed and
    # only the final cleanup crashed — the table is plain parquet now
    fs_delete(spark, retired)
    fs_delete(spark, f"{path}_tombstones__folded")


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    partition_col: str = "cell",
    sort_cols: tuple = ("vec_id",),
    schema: str | None = None,
    tombstone_path: str | None = None,
    id_col: str = "vec_id",
    stream_retired: bool = False,
    reset_tombstones: bool = True,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
) -> int:
    """Compaction + PHYSICAL ERASURE for a partitioned index table —
    the LSM merge step (Lucene drops deleted docs at segment merge):
    each partition is rewritten to ONE file, rows sorted by
    ``sort_cols`` (parquet row-group stats then serve point lookups —
    the rerank's vec_id isin — with row-group pruning), and if
    ``tombstone_path`` is given (default: the sibling
    ``{path}_tombstones`` when it exists) the tombstoned ``id_col``
    rows are ANTI-JOINED OUT of the rewrite and the tombstone table is
    reset in the same operation. After compaction the deleted bytes
    are GONE from disk (right-to-erasure in the physical sense) and
    probes stop paying the anti-join.

    Swap discipline (parity with rollup_io.upsert_rollup): the rewrite
    stages to ``{path}__compacting``, then each partition swaps via
    two renames through an aside dir OUTSIDE the table
    (``{path}__swap_old``) — per-partition atomic, and the table dir
    never contains an unparseable partition name. Fold-to-empty
    partitions are moved aside with no replacement (physically
    removed). Tombstone reset is the LAST step, so every crash window
    is safe: a torn swap leaves tombstones masking any not-yet-erased
    rows, and :func:`recover_compaction` (called on entry) repairs the
    artifacts. One shuffle keyed on the partition column; a cell lives
    in exactly one task, so exactly one output file per partition.
    Returns the number of parquet files after compaction.

    STREAMED tables (ADVICE r9): a file-sink-maintained table carries
    a ``_spark_metadata`` transaction log. Compaction rewrites files
    the log does not list, so it is TERMINAL for the stream — the
    maintaining query must be stopped for good and its checkpoint
    retired (resuming it would recreate a log that lists only
    post-compaction batches, silently hiding every compacted row from
    metadata-log-aware reads). The caller asserts this with
    ``stream_retired=True``; without it, a table with a
    ``_spark_metadata`` dir is refused (checked through the Hadoop FS
    API — ADVICE r10 #2: a driver-local isdir is always false on a
    remote FS, silently skipping the refusal). The log is RENAMED
    ASIDE (``{path}__retired_metadata``) only after the staging read
    consumed its exactly-once view, and deleted as the LAST cleanup
    step (ADVICE r10 #1) — so a crash anywhere in the swap leaves the
    log recoverable and orphan parquet files from uncommitted
    micro-batches can never surface or be folded into a re-run:
    recover_compaction rolls the swap forward from the committed
    staging rewrite, which was itself read through the log.

    Works for ANY table in the cell-partitioned family: the IVF
    payload, the PQ codes (tombstone both — delete_vectors_served),
    the keyword postings/positions (partition_col='bucket',
    id_col='doc_id'; use textops.compact_keyword_index for the
    stats rebase too). Maintenance-window contract: no concurrent
    writers or deleters during the compaction (a delete appended after
    the fold's read would be wiped by the tombstone reset). All
    filesystem steps go through the Hadoop FileSystem API, so the
    maintenance side works on the same FSs the probe side does; see
    util.fs_rename for the S3A (non-atomic rename) caveat.

    CONCURRENT-maintenance guard (round 11): a ``__maintenance_lock``
    file is atomically created before recovery runs and removed at the
    end, so two compactions of one table cannot interleave (the second
    caller's recover-on-entry would otherwise "repair" — i.e. destroy —
    the first's in-flight staging). A lock left by a CRASHED job can't
    be distinguished from a live job still in its read phase (no
    markers exist yet in either case; plain parquet has no built-in
    commit log — Delta/Iceberg protocols are the production answer),
    so the operator asserts the holder is dead with
    ``steal_lock=True`` — OR, since round 12 (VERDICT r11 next #8),
    proves it from the lock's HEARTBEAT: holders stamp
    ``{lock}.hb`` at acquisition and at each stage boundary (the
    staging rewrite — the long Spark job — is bracketed by stamps),
    so with ``stale_lock_after_sec`` set, a lock whose heartbeat is
    older than that budget is stolen automatically. Pick the budget
    ≫ the longest single stage (hours at 100 TB), not ≫ the whole
    job — the heartbeat advances between stages. A legacy lock with
    no heartbeat is never auto-stolen (age unknowable)."""
    from uwheel_datafusion_spark.operators.util import (
        fs_acquire_lock,
        fs_release_lock,
    )

    lock = f"{path}__maintenance_lock"
    fs_acquire_lock(
        spark, lock, steal_lock, stale_lock_after_sec,
        what=f"compaction of {path}",
    )
    try:
        return _compact_locked(
            spark,
            path,
            partition_col,
            sort_cols,
            schema,
            tombstone_path,
            id_col,
            stream_retired,
            reset_tombstones,
        )
    finally:
        fs_release_lock(spark, lock)


def _compact_locked(
    spark: SparkSession,
    path: str,
    partition_col: str,
    sort_cols: tuple,
    schema: "str | None",
    tombstone_path: "str | None",
    id_col: str,
    stream_retired: bool,
    reset_tombstones: bool,
) -> int:
    from uwheel_datafusion_spark.operators.util import (
        fs_count_files,
        fs_delete,
        fs_heartbeat,
        fs_is_dir,
        fs_list_names,
        fs_mkdirs,
        fs_rename,
    )

    lock = f"{path}__maintenance_lock"
    recover_compaction(spark, path, partition_col)
    meta = f"{path}/_spark_metadata"
    if fs_is_dir(spark, meta) and not stream_retired:
        raise ValueError(
            f"{path} carries a file-sink _spark_metadata log; "
            "compaction is terminal for the maintaining stream. "
            "Stop the stream permanently, retire its checkpoint, "
            "and call again with stream_retired=True."
        )
    if tombstone_path is None:
        cand = f"{path}_tombstones"
        tombstone_path = cand if fs_exists(spark, cand) else None
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(path)
    if tombstone_path is not None:
        dead = (
            spark.read.schema(f"{id_col} long").parquet(tombstone_path)
        )
        df = df.join(dead, id_col, "left_anti")
    tmp = f"{path}__compacting"
    # the staging write is the point where a streamed table is read:
    # it goes THROUGH the sink's _spark_metadata log (the exactly-once
    # view — orphan files from uncommitted batches are excluded); the
    # log itself is only moved aside AFTER the staged rewrite commits
    # (its _SUCCESS marker is recovery's roll-forward key) and deleted
    # as the last cleanup step (ADVICE r10 #1)
    fs_heartbeat(spark, lock)  # about to enter the long stage
    (
        df.repartition(F.col(partition_col))
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    fs_heartbeat(spark, lock)  # staging rewrite survived
    if fs_is_dir(spark, meta):
        fs_rename(spark, meta, f"{path}__retired_metadata")
    swap_old = f"{path}__swap_old"
    fs_mkdirs(spark, swap_old)
    prefix = f"{partition_col}="
    new_parts = set(fs_list_names(spark, tmp, prefix))
    live_parts = set(fs_list_names(spark, path, prefix))
    # record swap INTENT before the first rename: once the swap starts
    # emptying the staging dir, a recovery can no longer tell "all
    # partitions fold to empty" from "swap done, cleanup crashed" by
    # listing alone — _STAGED_PARTS disambiguates (see
    # recover_compaction)
    from uwheel_datafusion_spark.operators.util import fs_write_text

    fs_write_text(
        spark, f"{tmp}/_STAGED_PARTS", "\n".join(sorted(new_parts))
    )
    for part in sorted(live_parts | new_parts):
        if part in live_parts:
            fs_rename(spark, f"{path}/{part}", f"{swap_old}/{part}")
        if part in new_parts:
            fs_rename(spark, f"{tmp}/{part}", f"{path}/{part}")
    fs_delete(spark, swap_old)
    fs_delete(spark, tmp)
    fs_delete(spark, f"{path}__retired_metadata")
    # reset_tombstones=False lets a caller fold ONE tombstone set into
    # SEVERAL tables (keyword postings + positions share doc_id
    # tombstones — textops.compact_keyword_index resets once, last)
    if tombstone_path is not None and reset_tombstones:
        folded = f"{path}_tombstones__folded"
        fs_rename(spark, tombstone_path, folded)
        fs_delete(spark, folded)
    return fs_count_files(spark, path)


def next_generation_dir(spark: SparkSession, base_path: str) -> str:
    """Pick the next free delta-generation dir for a table whose
    maintaining stream was retired by a compaction (round 12 — VERDICT
    r11 next #2). Compaction is TERMINAL for a file-sink stream
    (resuming it would recreate a _spark_metadata log that hides every
    compacted row), so continued ingest goes to a NEW generation: a
    fresh sibling table + fresh checkpoint, served as a union via
    ServedIvfIndex.delta_paths and folded back by
    :func:`merge_generations` — the LSM / Lucene-segment lifecycle."""
    n = 1
    while fs_exists(spark, f"{base_path}__delta{n}"):
        n += 1
    return f"{base_path}__delta{n}"


def merge_generations(
    spark: SparkSession,
    base_path: str,
    delta_path: str,
    partition_col: str = "cell",
    sort_cols: tuple = ("vec_id",),
    schema: str | None = None,
    id_col: str = "vec_id",
    stream_retired: bool = False,
    delta_stream_retired: bool = False,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
    _before_commit=None,
) -> int:
    """MAJOR compaction: fold a retired delta generation back into the
    baseline table — one staged rewrite of base ∪ delta (each side
    read through its own sink log and minus its own tombstones), the
    same per-partition-atomic swap as compact_partitioned_table, and
    the delta's removal rides the SAME commit point as the swap:

    1. stage base ∪ delta under ``{base}__merge_staging`` (no probe
       impact — both generations stay fully servable);
    2. stamp the consumed delta's path into the staging dir
       (``_MERGE_SOURCE``);
    3. rename the staging dir to ``{base}__compacting`` — THE commit
       (one atomic dir rename; from here probes refuse on the marker);
    4. :func:`recover_compaction` finishes the job — the roll-forward
       it already runs for crashed compactions swaps the partitions
       AND (via the _MERGE_SOURCE stamp) removes the delta, so merge
       completion and merge CRASH RECOVERY are literally the same code
       path and the rename fault-injection harness covers both.

    A crash before 3 leaves both generations live and intact (stale
    staging cleaned on re-entry); after 3, any crash converges via
    recover-on-entry. After the merge the caller serves from the
    single-path handle again. Tombstone part-files the rewrite
    APPLIED are folded via the ``_TOMB_SNAPSHOT`` stamp (captured at
    the staging read — ADVICE r12 #4); files appended by lock-free
    deletes DURING the merge survive, delta-side arrivals re-homed to
    the base table. The delta's checkpoint dir is the caller's to
    retire. ``delta_stream_retired``
    asserts the delta's maintaining stream is permanently stopped —
    merging under a live writer would silently drop every row the
    stream commits after the staging read. Returns the post-merge
    parquet file count of the baseline."""
    from uwheel_datafusion_spark.operators.util import (
        fs_acquire_lock,
        fs_count_files,
        fs_delete,
        fs_heartbeat,
        fs_is_dir,
        fs_list_names,
        fs_release_lock,
        fs_rename,
        fs_write_text,
    )

    lock = f"{base_path}__maintenance_lock"
    fs_acquire_lock(
        spark, lock, steal_lock, stale_lock_after_sec,
        what=f"maintenance of {base_path}",
    )
    try:
        recover_compaction(spark, base_path, partition_col)
        if not fs_exists(spark, delta_path):
            # idempotent re-run: a prior merge (or its recovery)
            # already consumed the delta
            return fs_count_files(spark, base_path)
        if (
            fs_is_dir(spark, f"{base_path}/_spark_metadata")
            and not stream_retired
        ):
            raise ValueError(
                f"{base_path} carries a file-sink _spark_metadata "
                "log; pass stream_retired=True once its maintaining "
                "stream is permanently stopped."
            )
        if (
            fs_is_dir(spark, f"{delta_path}/_spark_metadata")
            and not delta_stream_retired
        ):
            raise ValueError(
                f"{delta_path} carries a file-sink _spark_metadata "
                "log; merging under a live writer would drop rows "
                "committed after the staging read. Stop the stream "
                "permanently and pass delta_stream_retired=True."
            )
        reader = spark.read.schema(schema) if schema else spark.read
        # capture the tombstone part-files the staged union is about to
        # APPLY (ADVICE r12 #4): lock-free deletes may append new part
        # files to either _tombstones dir between this read and the
        # roll-forward; a blanket fold would silently discard them,
        # resurrecting the deleted rows. The snapshot travels in the
        # committed staging dir (_TOMB_SNAPSHOT) so the roll-forward —
        # including a crash-recovery re-run — folds exactly the files
        # the rewrite consumed and re-homes every later arrival.
        consumed = []
        sides = []
        for tag, p in (("base", base_path), ("delta", delta_path)):
            df = reader.parquet(p)
            if fs_exists(spark, f"{p}_tombstones"):
                consumed.extend(
                    f"{tag}:{n}"
                    for n in fs_list_names(
                        spark, f"{p}_tombstones", "part-"
                    )
                )
                dead = spark.read.schema(f"{id_col} long").parquet(
                    f"{p}_tombstones"
                )
                df = df.join(dead, id_col, "left_anti")
            sides.append(df)
        staging = f"{base_path}__merge_staging"
        fs_delete(spark, staging)  # pre-commit crash leftover
        fs_heartbeat(spark, lock)  # entering the long staged rewrite
        (
            sides[0]
            .unionByName(sides[1])
            .repartition(F.col(partition_col))
            .sortWithinPartitions(partition_col, *sort_cols)
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(staging)
        )
        fs_heartbeat(spark, lock)  # rewrite survived; swap is next
        fs_write_text(spark, f"{staging}/_MERGE_SOURCE", delta_path)
        fs_write_text(
            spark, f"{staging}/_TOMB_SNAPSHOT", "\n".join(sorted(consumed))
        )
        if _before_commit is not None:
            # fault-injection seam: a lock-free delete landing inside
            # the merge window (after the staging read, before the
            # roll-forward) must survive the tombstone fold
            _before_commit()
        fs_rename(spark, staging, f"{base_path}__compacting")  # COMMIT
        # completion IS crash recovery: the roll-forward swaps the
        # partitions, removes the consumed delta (+ its tombstones)
        # via the _MERGE_SOURCE stamp, and folds the base tombstones
        recover_compaction(spark, base_path, partition_col)
        return fs_count_files(spark, base_path)
    finally:
        fs_release_lock(spark, lock)


def _rerank_refine_read_served(
    ivf_served: "ServedIvfIndex", spark, probed: list, cand_ids: list
) -> DataFrame:
    """The served refine stage's point-lookup read — a named seam so
    the probed-partition pruning + In(vec_id, …) pushdown stay
    plan-pinned in tests (tests/test_plans.py) now that the refine
    math folds on the driver: this read is the refine's ONLY table
    access, and it must never widen to a full payload (or corpus)
    scan."""
    return (
        _payload_df(
            ivf_served,
            spark,
            probed,
            "vec_id long, qvec array<long>, qnorm long, cell long",
        )
        .filter(F.col("vec_id").isin(cand_ids))
        .select("vec_id", "qvec", "qnorm")
    )


def ivfpq_rerank_served(
    pq_served: ServedIvfPqIndex,
    ivf_served: ServedIvfIndex,
    queries: DataFrame,
    topk: int = 5,
    nprobe: int = 2,
    n_candidates: int = 25,
    vec_col: str = "embedding",
    metric: str = "l2",
) -> DataFrame:
    """Two-stage serving with BOTH stages on served tables: ADC
    candidates from the codes table, exact refine reading the
    candidate vectors from the IVF payload table by vec_id isin()
    (row-group point lookups — never the corpus). The full-precision
    store and the compressed store are the same two tables a FAISS
    IndexRefineFlat persists. ``metric='l2'`` (default) outputs
    (query_id, neighbor_id, exact_dist, rnk) ranked by squared L2 —
    bit-identical to ivfpq_search_rerank. ``metric='cosine'`` (round
    13) outputs (query_id, neighbor_id, cosine, rnk) ranked by exact
    quantized cosine desc — for a COSINE deployment over unnormalized
    vectors the L2 refine ranks a genuinely different neighbor set
    (‖a−b‖² order ≠ angle order when norms vary; the 1M bench's
    rerank plateau at ~0.54 recall-vs-cosine-truth across EVERY code
    quality is exactly this metric gap, not a code-budget limit), so
    the refine metric must match the deployment's truth metric.

    DELETE contract (ADVICE r9): a complete vector delete tombstones
    BOTH tables (delete_vectors_served) — a payload-only tombstone
    would still let the dead id consume an ADC candidate slot here,
    silently shrinking effective n_candidates.

    RESIDUAL/ROTATED code tables (round 13) slot straight in: the
    candidate stage dispatches on the handle's flags, the refine stays
    RAW-space exact (under rotation ‖Hx−Hy‖² = dim·‖x−y‖², so rotated
    candidates and raw refine agree on ranking). The IVF payload must
    be cell-partitioned by the SAME coarse quantizer as the codes
    table (for a rotated deployment: save_ivf_payload with the
    rotated-space IvfIndex), or the probed-partition refine read would
    prune to the wrong cells."""
    assert n_candidates >= topk
    import numpy as np

    spark = queries.sparkSession
    cand_rows = (
        ivfpq_search_served(
            pq_served, queries, topk=n_candidates, nprobe=nprobe,
            vec_col=vec_col,
        )
        .select("query_id", "neighbor_id")
        .collect()
    )
    cand_ids = sorted({r["neighbor_id"] for r in cand_rows})
    # candidate vectors: point reads from the served payload. Every
    # candidate came from a PROBED cell, so the refine read prunes to
    # the probed partitions (recomputing the probe set is trivial
    # driver math against the same frozen centroids) AND pushes the
    # vec_id isin to row groups (the payload is written sorted by
    # vec_id within each cell, so min/max stats actually prune)
    qrows = _quantized(queries, vec_col).select("vec_id", "qvec").collect()
    probed = sorted(
        {
            c
            for _, c in _rank_probes(
                pq_served.centroids,
                _maybe_rotated_qrows(pq_served, qrows),
                nprobe,
            )
        }
    )
    # the refine itself folds on the DRIVER: the point-lookup read is
    # bounded at |q|·n_candidates rows (the documented LUT/centroid
    # collect class), and the relational tail it replaces ran two
    # broadcast joins plus a window over those same rows as full Spark
    # jobs. Distances stay exact: integer sums for L2; for cosine the
    # stored integer norms and double(dot)/sqrt(double·double) match
    # cosine_q's single-IEEE-op SQL, and a candidate id absent from the
    # payload (or with qnorm ≤ 0 under cosine) drops exactly like the
    # old inner join / filter did.
    vec_rows = _rerank_refine_read_served(
        ivf_served, spark, probed, cand_ids
    ).collect()
    vmap = {
        r["vec_id"]: (np.asarray(r["qvec"], dtype=np.int64), r["qnorm"])
        for r in vec_rows
    }
    qmap = {
        r["vec_id"]: np.asarray(r["qvec"], dtype=np.int64) for r in qrows
    }
    by_q: dict = {}
    for r in cand_rows:
        q, nbr = r["query_id"], r["neighbor_id"]
        if nbr not in vmap or q not in qmap:
            continue
        nv, nnorm = vmap[nbr]
        by_q.setdefault(q, []).append((nbr, nv, nnorm))
    out = []
    if metric == "cosine":
        for q in sorted(by_q):
            qv = qmap[q]
            qn = np.float64(int((qv * qv).sum()))
            if qn == 0.0:
                # 0/0 = NaN cosine for every candidate; Spark ranks NaN
                # first under DESC and ties break by neighbor_id — same
                # rows, same order, cosine stays NaN
                live = sorted(
                    nbr for nbr, _, nnorm in by_q[q] if nnorm > 0
                )
                for rnk, nbr in enumerate(live[:topk], start=1):
                    out.append((q, nbr, float("nan"), rnk))
                continue
            scored = []
            for nbr, nv, nnorm in by_q[q]:
                if nnorm <= 0:
                    continue
                cos = np.float64(int(qv @ nv)) / np.sqrt(
                    qn * np.float64(nnorm)
                )
                scored.append((-cos, nbr))
            for rnk, (negcos, nbr) in enumerate(
                sorted(scored)[:topk], start=1
            ):
                out.append((q, nbr, float(-negcos), rnk))
        return spark.createDataFrame(
            out, "query_id long, neighbor_id long, cosine double, rnk long"
        )
    for q in sorted(by_q):
        qv = qmap[q]
        scored = [
            (int(((qv - nv) ** 2).sum()), nbr)
            for nbr, nv, _ in by_q[q]
        ]
        for rnk, (d, nbr) in enumerate(sorted(scored)[:topk], start=1):
            out.append((q, nbr, d, rnk))
    return spark.createDataFrame(
        out, "query_id long, neighbor_id long, exact_dist long, rnk long"
    )


def ivf_binary_search_served(
    index: ServedIvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_candidates: int = 25,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Three-stage served ANN (round 11 — IVF cells × binary codes ×
    exact rerank, the FAISS IndexBinaryIVF + refine composition): the
    coarse quantizer prunes the table read to nprobe partitions, the
    1-bit sign codes stored IN the payload (save_ivf_payload
    include_binary=True) rank candidates by popcount-XOR Hamming —
    whole-stage codegen, reading 2 BIGINT words where cosine reads the
    64-element vector — and the exact integer cosine reranks the
    Hamming top-``n_candidates``. Output (query_id, neighbor_id,
    hamming, cosine, rnk). The two windows share one query_id shuffle;
    tombstones and maintenance markers behave exactly as in
    ivf_search_served (same _read_payload)."""
    assert 1 <= nprobe <= index.n_cells and n_candidates >= k
    if not index.has_binary:
        # ADVICE r11 #2: on a payload built without include_binary,
        # the explicit schema reads bvec as NULL, hamming_words yields
        # NULL, and NULLs sort FIRST in the ascending Hamming window —
        # the candidate cut silently becomes an arbitrary subset.
        # Loud and named beats silently degraded recall.
        raise ValueError(
            f"served payload at {index.path} was not built with "
            "include_binary=True (ServedIvfIndex.has_binary is False): "
            "the binary-Hamming tier would read bvec as NULL and rank "
            "an arbitrary candidate subset. Rebuild the payload with "
            "save_ivf_payload(include_binary=True), or rehydrate with "
            "served_index_from_table(..., has_binary=True) if the "
            "streamed table carries bvec."
        )
    from uwheel_datafusion_spark.functions.dialect import SPARK as _D

    spark = queries.sparkSession
    qq = _quantized(queries, vec_col, drop_zero=True).withColumn(
        "bvec", F.expr(_D.sign_pack32("qvec", dim))
    )
    qrows = qq.select("vec_id", "qvec").collect()
    pairs = _rank_probes(index.centroids, qrows, nprobe)
    probe_pairs = spark.createDataFrame(pairs, "query_id long, q_cell long")
    probed = sorted({c for _, c in pairs})
    payload = _payload_df(
        index,
        spark,
        probed,
        "vec_id long, qvec array<long>, qnorm long, "
        "bvec array<long>, cell long",
    ).filter(F.col("qnorm") > 0)
    qframe = qq.select(
        F.col("vec_id").alias("query_id"),
        F.col("bvec").alias("q_bvec"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    scored = (
        payload.join(F.broadcast(probe_pairs), F.col("cell") == F.col("q_cell"))
        .join(F.broadcast(qframe), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("hamming", F.expr(_D.hamming_words("q_bvec", "bvec")))
        .withColumn(
            "cosine",
            F.expr(
                SPARK.cosine_q(
                    SPARK.dot_q("q_qvec", "qvec"), "q_qnorm", "qnorm"
                )
            ),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "hamming",
            "cosine",
        )
    )
    wh = W.partitionBy("query_id").orderBy(
        F.col("hamming"), F.col("neighbor_id")
    )
    cand = scored.withColumn("h_rnk", F.row_number().over(wh)).filter(
        F.col("h_rnk") <= n_candidates
    )
    wc = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(wc).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "hamming", "cosine", "rnk")
    )


def served_index_stats(
    spark: SparkSession,
    path: str,
    partition_col: str = "cell",
    id_col: str = "vec_id",
) -> DataFrame:
    """Operational audit of a served index table (round 11 — the
    `IndexIVF.print_stats` / imbalance-factor check every production
    ANN deployment runs): per-cell LIVE row counts (tombstones netted
    out through the same anti-join probes use), each cell's corpus
    share and its skew against the uniform mean — the balance signal
    that decides whether nprobe/recall targets hold (one hot cell
    makes every probe that hits it pay the whole table). Exact
    integers: share_ppm = n·10⁶ div total, skew_x_ppm = n·n_cells·10⁶
    div total (10⁶ = uniform). One groupBy shuffle over (cell) pairs;
    the totals ride the plan as a 1-row broadcast cross join (the
    benign q11 scalar shape)."""
    from uwheel_datafusion_spark.operators.util import (
        assert_not_mid_maintenance,
    )

    assert_not_mid_maintenance(
        spark, f"{path}__compacting", f"{path}__swap_old"
    )
    rows = spark.read.schema(
        f"{id_col} long, {partition_col} long"
    ).parquet(path)
    if fs_exists(spark, f"{path}_tombstones"):
        dead = spark.read.schema(f"{id_col} long").parquet(
            f"{path}_tombstones"
        )
        rows = rows.join(dead, id_col, "left_anti")
    per_cell = rows.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_live")
    )
    totals = per_cell.agg(
        F.sum("n_live").alias("_total"),
        F.count(F.lit(1)).alias("_n_cells"),
    )
    return (
        per_cell.crossJoin(F.broadcast(totals))
        .select(
            F.col(partition_col),
            "n_live",
            F.expr("CAST(n_live * 1000000 DIV _total AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST(n_live * _n_cells * 1000000 DIV _total AS BIGINT)"
            ).alias("skew_x_ppm"),
        )
    )
