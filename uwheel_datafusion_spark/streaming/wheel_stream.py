"""Streaming wheel maintenance — µWheel's insert/advance as a
Structured Streaming job (SURVEY §2.9, build-plan step 5).

Semantics mapping (reference → Spark):

- ``wheel.insert(entry)`` with out-of-order tolerance inside the
  write-ahead horizon (/root/reference/src/main.rs:102,137) →
  ``withWatermark(ts, delay)`` + windowed aggregation: the state store
  buffers open windows, accepting disorder within the watermark delay.
- late entries rejected below the low watermark [uwheel-pub] → rows
  older than the event-time watermark are dropped by Spark; the count
  is surfaced per micro-batch via ``numRowsDroppedByWatermark`` — the
  observable late-drop metric (SURVEY §2.9).
- ``wheel.advance(d)`` finalizing slots (/root/reference/src/main.rs:140)
  → watermark progression per trigger; finalized window updates flow to
  ``foreachBatch``, which upserts them into the rollup store.

The micro-batch sink upserts (window → partial) rows into a driver
store here; on a production cluster the same ``foreachBatch`` body
would MERGE into a Delta/Iceberg rollup table — the serving side
(DriverWheelIndex / distributed rollup queries) is identical either
way, which is the point: batch and streaming build the SAME index.

Update output mode is used so each trigger emits the current total for
every touched window — the upsert is therefore idempotent (exactly-once
results under at-least-once delivery of micro-batches).

LIFETIME CONTRACT (every wheel in this module): rollup state lives in
a driver-side dict while the checkpoint marks micro-batches committed.
After a driver RESTART the dict is empty but committed batches are NOT
replayed — snapshots would silently undercount. Pass ``state_dir`` to
``start()`` to make any wheel RESTART-SAFE: the sink persists the
state atomically after every applied epoch (write-temp + rename,
tagged with the epoch id), and a restarted wheel given the same
(checkpoint_dir, state_dir) pair auto-restores and skips replayed
epochs it already folded in — the transactional-foreachBatch pattern,
required because the delta-merging wheels (MG) are not idempotent
under epoch replay. Persist-then-commit ordering makes the state
exactly-once: a crash after persist but before the checkpoint commit
replays the epoch, and the epoch guard drops it. Without ``state_dir``
the wheels remain single-process (tests, notebooks, always-on serving)
— or swap the sink body for a Delta/Iceberg MERGE keyed on the window;
the serving side is unchanged either way.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import value_to_micros
from uwheel_datafusion_spark.functions.time import (
    MINUTE_MS,
    ensure_event_time,
    ts_to_ms,
)


def _state_file(state_dir: str) -> str:
    return os.path.join(state_dir, "wheel_state.pkl")


def _persist_state(
    state_dir: str, slots, epoch_id: int, extra=None, checkpoint: str | None = None
) -> None:
    """Atomic (temp + rename) driver-state snapshot, tagged with the
    last applied epoch id AND the checkpoint identity it was built
    against. Runs INSIDE foreachBatch, i.e. before the checkpoint
    commits the epoch — so crash-replayed epochs find their effects
    already persisted and the epoch guard skips them."""
    os.makedirs(state_dir, exist_ok=True)
    tmp = _state_file(state_dir) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {
                "slots": slots,
                "epoch": epoch_id,
                "checkpoint": checkpoint,
                **(extra or {}),
            },
            f,
        )
    os.replace(tmp, _state_file(state_dir))


def _load_state(state_dir: str, checkpoint: str | None = None):
    """Restore a persisted state snapshot; None when the dir is fresh.

    The epoch guard compares micro-batch epoch ids, which restart at 0
    under a DIFFERENT checkpoint dir — pairing a populated state_dir
    with a fresh checkpoint would then silently skip all early batches
    as "replays" (undercounted state). Enforce the pairing here: the
    snapshot records the checkpoint it was built against, and a
    mismatch raises instead of corrupting."""
    p = _state_file(state_dir)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        st = pickle.load(f)
    saved = st.get("checkpoint")
    if checkpoint is not None and saved is not None and saved != checkpoint:
        raise ValueError(
            f"state_dir {state_dir!r} was built against checkpoint "
            f"{saved!r} but is being restored under {checkpoint!r}; "
            "epoch ids are only comparable within one checkpoint — use "
            "a fresh state_dir with a fresh checkpoint"
        )
    return st


def _sink_meta_file(table_dir: str) -> str:
    # leading underscore: ignored by Spark/DuckDB parquet listings
    return f"{table_dir}/_sink_meta.json"


def _persist_sink_meta(
    spark, table_dir: str, epoch_id: int, checkpoint: str
) -> None:
    """Atomic epoch marker for the table sink — written AFTER the
    partition upsert, so a crash in between replays the epoch; the
    upsert is idempotent (current totals), so replay converges. The
    marker lives NEXT TO the table, written through the Hadoop FS API
    (round 11: a driver-local write would strand the guard on the
    driver's disk while the table lives on HDFS/S3 — every resuming
    driver would then re-apply epoch 0)."""
    import json

    from uwheel_datafusion_spark.operators.util import fs_write_text

    fs_write_text(
        spark,
        _sink_meta_file(table_dir),
        json.dumps({"epoch": epoch_id, "checkpoint": checkpoint}),
    )


def _load_sink_meta(spark, table_dir: str, checkpoint: str):
    """Restore the table sink's epoch marker; same checkpoint-identity
    guard as _load_state (epoch ids restart at 0 under a different
    checkpoint)."""
    import json

    from uwheel_datafusion_spark.operators.util import fs_read_text

    text = fs_read_text(spark, _sink_meta_file(table_dir))
    if text is None:
        return None
    meta = json.loads(text)
    saved = meta.get("checkpoint")
    if saved is not None and saved != checkpoint:
        raise ValueError(
            f"rollup table {table_dir!r} was maintained under checkpoint "
            f"{saved!r} but is being resumed under {checkpoint!r}; "
            "epoch ids are only comparable within one checkpoint"
        )
    return meta


@dataclass
class RollupStore:
    """Driver-side upsert store for (bucket_ms → partial) rows.
    Production swap-in: Delta MERGE keyed on bucket_ms.

    IMPORTANT (learned from a restart probe): the Spark checkpoint
    makes the *source* exactly-once — a restarted query will NOT replay
    micro-batches this store already consumed. The store must therefore
    be persisted alongside the checkpoint (``save``/``load``, or the
    Delta table in production); a fresh store + old checkpoint silently
    serves an empty index."""

    slots: dict[int, tuple[int, int, float, float]] = field(default_factory=dict)
    n_late_rows: int = 0  # accumulated numRowsDroppedByWatermark

    def upsert(self, rows) -> None:
        for r in rows:
            d = r.asDict() if hasattr(r, "asDict") else r
            slot = (
                (d["key"], d["bucket_ms"]) if "key" in d else d["bucket_ms"]
            )
            self.slots[slot] = (
                d["sum_micros"],
                d["cnt"],
                d["min_value"],
                d["max_value"],
            )

    def save(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump(
                {"slots": list(self.slots.items()), "n_late_rows": self.n_late_rows},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "RollupStore":
        import json

        with open(path) as f:
            d = json.load(f)
        # unkeyed slots are int buckets; keyed slots round-trip JSON as
        # [key, bucket] lists — coerce back to tuples
        slots = {
            (tuple((b[0], int(b[1]))) if isinstance(b, list) else int(b)): tuple(v)
            for b, v in d["slots"]
        }
        return cls(slots=slots, n_late_rows=int(d["n_late_rows"]))

    def to_driver_index(self, watermark_ms: int, advanced_ms: int):
        from uwheel_datafusion_spark.operators.driver_index import DriverWheelIndex

        rows = [
            {
                "bucket_ms": b,
                "sum_micros": s,
                "cnt": c,
                "min_value": mn,
                "max_value": mx,
            }
            for b, (s, c, mn, mx) in self.slots.items()
            if not isinstance(b, tuple)
        ]
        return DriverWheelIndex.from_minute_rows(rows, watermark_ms, advanced_ms)

    def to_keyed_indexes(self, watermark_ms: int, advanced_ms: int) -> dict:
        """Keyed store → {key: DriverWheelIndex} — the same serving
        structure KeyedWheelIndex.build collects from its batch rollup."""
        from uwheel_datafusion_spark.operators.driver_index import DriverWheelIndex

        by_key: dict = {}
        for slot, (s, c, mn, mx) in self.slots.items():
            if not isinstance(slot, tuple):
                continue
            k, b = slot
            by_key.setdefault(k, []).append(
                {
                    "bucket_ms": b,
                    "sum_micros": s,
                    "cnt": c,
                    "min_value": mn,
                    "max_value": mx,
                }
            )
        return {
            k: DriverWheelIndex.from_minute_rows(rows, watermark_ms, advanced_ms)
            for k, rows in by_key.items()
        }


class StreamingDistinctWheel:
    """Streaming maintenance of the HLL distinct rollup — the
    distinct-count twin of StreamingWheel (operators/distinct is the
    batch side). The streaming aggregation keeps one HLL++ sketch per
    minute window in the state store (hll_sketch_agg is a declarative
    aggregate, so update-mode emits the window's CURRENT sketch each
    trigger — the upsert is idempotent); register-max associativity
    makes the maintained sketches estimate-identical to a batch
    build over the same rows (pinned in tests/test_streaming.py).

    At scale the sink MERGEs sketch binaries into a Delta/Iceberg
    rollup keyed on bucket_ms; serving (range_distinct_hll /
    cascade_hll) is identical either way."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        key_col: str,
        watermark_delay: str = "1 hour",
        lg_k: int = 12,
    ) -> None:
        self.slots: dict[int, bytes] = {}  # bucket_ms → sketch binary
        self._last_epoch = -1
        self._agg = (
            ensure_event_time(stream_df, ts_col)
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.window(ts_col, "1 minute").alias("w"))
            .agg(F.hll_sketch_agg(key_col, lg_k).alias("hll"))
            .select(ts_to_ms(F.col("w.start")).alias("bucket_ms"), "hll")
        )
        self._query = None

    def start(self, checkpoint_dir: str, state_dir: str | None = None):
        slots = self.slots
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                slots.update(st["slots"])
                self._last_epoch = st["epoch"]

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            if state_dir is not None and epoch_id <= self._last_epoch:
                return  # replayed epoch already folded into the state
            for r in batch_df.collect():
                slots[r["bucket_ms"]] = bytes(r["hll"])
            if state_dir is not None:
                self._last_epoch = epoch_id
                _persist_state(state_dir, slots, epoch_id, checkpoint=checkpoint_dir)

        self._query = (
            self._agg.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot_rollup(self, spark) -> DataFrame:
        """Freeze the maintained sketches into the same
        ``(bucket_ms, hll)`` frame build_hll_rollup produces — ready
        for cascade_hll / range_distinct_hll / rollup_io.save_rollup."""
        return spark.createDataFrame(
            list(self.slots.items()), "bucket_ms long, hll binary"
        )


class StreamingBottomKWheel:
    """Streaming maintenance of the bottom-k sample rollup
    (operators/bottomk is the batch side). Each micro-batch computes
    its OWN bottom-k partial per touched minute slot (≤ k rows/slot,
    the WindowGroupLimit shape), and the sink merges it into the
    maintained store by set-union + re-truncate — the mergeable-
    summary property that makes batch and streaming builds
    bit-identical regardless of how rows split across triggers (the
    same exactness argument as the batch cascade, operators/bottomk
    docstring). The merge is idempotent and commutative: a re-
    delivered or out-of-order micro-batch unions the same (h, key)
    pairs, so no watermark is needed for correctness — late rows
    simply merge in (the batch horizon filter is applied at snapshot/
    serve time, as in the batch build).

    At scale the sink MERGEs into a Delta/Iceberg rollup keyed on
    (bucket_ms, h, key) with a per-slot rank re-truncation; serving
    (range_sample_df / cascade_bottomk) is identical either way."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        key_col: str,
        k: int = 20,
        slot_ms: int = MINUTE_MS,
    ) -> None:
        from uwheel_datafusion_spark.functions.time import bucket_ms
        from uwheel_datafusion_spark.operators.sampling import _mix_sql

        self.k = k
        #: bucket_ms → ascending-sorted list of (h, key), ≤ k entries
        self.slots: dict[int, list[tuple[int, int]]] = {}
        self._last_epoch = -1
        self._pairs = stream_df.select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.col(key_col).cast("long").alias("key"),
        ).withColumn("h", F.expr(_mix_sql("key")))
        self._query = None

    def _merge(self, bucket: int, pairs) -> None:
        cur = set(self.slots.get(bucket, ()))
        cur.update(pairs)
        self.slots[bucket] = sorted(cur)[: self.k]

    def start(self, checkpoint_dir: str, state_dir: str | None = None):
        from uwheel_datafusion_spark.operators.bottomk import _ranked_bottomk

        k = self.k
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                self.slots.update(st["slots"])
                self._last_epoch = st["epoch"]

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            if state_dir is not None and epoch_id <= self._last_epoch:
                return  # replayed epoch already folded into the state
            part = _ranked_bottomk(batch_df.distinct(), k)
            merged: dict[int, list] = {}
            for r in part.collect():  # ≤ k rows per touched slot
                merged.setdefault(r["bucket_ms"], []).append(
                    (r["h"], r["key"])
                )
            for bucket, pairs in merged.items():
                self._merge(bucket, pairs)
            if state_dir is not None:
                self._last_epoch = epoch_id
                _persist_state(state_dir, self.slots, epoch_id, checkpoint=checkpoint_dir)

        self._query = (
            self._pairs.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot_rollup(self, spark) -> DataFrame:
        """Freeze the maintained samples into the same
        ``(bucket_ms, key, h)`` frame build_bottomk_rollup produces —
        ready for range_sample_df / cascade_bottomk /
        rollup_io.save_rollup."""
        rows = [
            (bucket, key, h)
            for bucket, pairs in self.slots.items()
            for (h, key) in pairs
        ]
        return spark.createDataFrame(rows, "bucket_ms long, key long, h long")


class StreamingMGWheel:
    """Streaming maintenance of the Misra-Gries heavy-hitter rollup
    (operators/mgsketch is the batch side), by the mergeable-summaries
    composition (Agarwal et al., PODS'12): each micro-batch truncates
    its OWN per-slot counts to an MG summary (≤ m rows + bound) on the
    cluster, and the sink merges same-slot summaries driver-side — sum
    per-key counts, add bounds, re-truncate to top-m (which adds the
    (m+1)-th merged count to the bound). Error ADDS per merge, so the
    maintained sketch is not bit-identical to a single-pass batch build
    — but the lower/upper-bound invariant survives every merge, and the
    candidates→exact-verify serving contract
    (range_heavy_hitters_verified) stays provably complete as long as
    the threshold exceeds the accumulated budget: with time-ordered
    sources a slot is touched by ≤ 2 micro-batches (boundary slots),
    so the budget multiplier is small and checkable (pinned in
    tests/test_streaming).

    At scale the sink MERGEs into a Delta/Iceberg rollup keyed on
    (bucket_ms, key) with the same re-truncation; serving is identical
    either way."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        key_sql: str,
        m: int,
        slot_ms: int = MINUTE_MS,
    ) -> None:
        from uwheel_datafusion_spark.functions.time import bucket_ms

        self.m = m
        #: bucket_ms → ({key: cnt}, bound)
        self.slots: dict[int, tuple[dict[int, int], int]] = {}
        self._last_epoch = -1
        # NO streaming aggregation here: an update-mode streaming
        # groupBy would emit CUMULATIVE counts per trigger and the MG
        # merge needs per-batch DELTAS — the sink aggregates each
        # micro-batch itself (the StreamingBottomKWheel pattern)
        self._pairs = ensure_event_time(stream_df, ts_col).select(
            bucket_ms(ts_to_ms(F.col(ts_col)), slot_ms).alias("bucket_ms"),
            F.expr(key_sql).cast("long").alias("key"),
        )
        self._query = None

    def _merge(self, bucket: int, new_counts: dict, new_bound: int) -> None:
        cur_counts, cur_bound = self.slots.get(bucket, ({}, 0))
        merged = dict(cur_counts)
        for k, c in new_counts.items():
            merged[k] = merged.get(k, 0) + c
        bound = cur_bound + new_bound
        # re-truncate to top-m (cnt desc, key asc — the batch tie-break)
        ranked = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(ranked) > self.m:
            bound += ranked[self.m][1]  # the (m+1)-th merged count
            ranked = ranked[: self.m]
        self.slots[bucket] = (dict(ranked), bound)

    def start(self, checkpoint_dir: str, state_dir: str | None = None):
        from uwheel_datafusion_spark.operators.mgsketch import _truncate_to_mg

        m = self.m
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                self.slots.update(st["slots"])
                self._last_epoch = st["epoch"]

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            # the epoch guard is CORRECTNESS here, not hygiene: the MG
            # merge folds per-batch DELTAS (counts add), so an epoch
            # replayed after a crash-between-persist-and-commit would
            # double-count without it
            if state_dir is not None and epoch_id <= self._last_epoch:
                return
            # aggregate THIS batch's pairs, then cluster-side MG
            # truncation: the collect is ≤ m rows per touched slot,
            # never the batch's raw key set
            counts_df = batch_df.groupBy("bucket_ms", "key").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            part = _truncate_to_mg(counts_df, m, F.lit(0))
            per_slot: dict[int, tuple[dict, int]] = {}
            for r in part.collect():
                counts, _ = per_slot.setdefault(r["bucket_ms"], ({}, 0))
                counts[r["key"]] = r["cnt"]
                per_slot[r["bucket_ms"]] = (counts, r["bound"])
            for bucket, (counts, bound) in per_slot.items():
                self._merge(bucket, counts, bound)
            if state_dir is not None:
                self._last_epoch = epoch_id
                _persist_state(state_dir, self.slots, epoch_id, checkpoint=checkpoint_dir)

        self._query = (
            self._pairs.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot_rollup(self, spark) -> DataFrame:
        """Freeze into the same ``(bucket_ms, key, cnt, bound)`` frame
        build_mg_rollup produces (bound repeated per row) — ready for
        range_hh_candidates / range_heavy_hitters_verified /
        cascade_mg / rollup_io.save_rollup."""
        rows = [
            (b, k, c, bound)
            for b, (counts, bound) in self.slots.items()
            for k, c in counts.items()
        ]
        return spark.createDataFrame(
            rows, "bucket_ms long, key long, cnt long, bound long"
        )


class StreamingHistogramWheel:
    """Streaming maintenance of the equi-width histogram rollup
    (operators/quantile_rollup is the batch side) — the quantile
    family's mergeable partial is a plain additive (bucket, bin) count,
    so the streaming windowed aggregation is a COUNT keyed by
    (window, bin); update mode emits each touched pair's current count
    and the sink upsert (replace by (bucket, bin)) is idempotent.
    Bit-identical to the batch build over the same rows (counts are
    associative+commutative; binning is deterministic floor division) —
    pinned in tests/test_streaming.

    At scale the sink MERGEs into a Delta/Iceberg rollup keyed on
    (bucket_ms, bin); serving (range_quantile_df / cascade_histogram)
    is identical either way."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        value_col: str,
        watermark_delay: str = "1 hour",
        bin_width: float = 1.0,
    ) -> None:
        self.slots: dict[tuple[int, int], int] = {}  # (bucket_ms, bin) → cnt
        self._last_epoch = -1
        self._agg = (
            ensure_event_time(stream_df, ts_col)
            .withWatermark(ts_col, watermark_delay)
            .select(
                F.col(ts_col),
                F.floor(F.col(value_col) / F.lit(bin_width))
                .cast("long")
                .alias("bin"),
            )
            .groupBy(F.window(ts_col, "1 minute").alias("w"), F.col("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                ts_to_ms(F.col("w.start")).alias("bucket_ms"), "bin", "cnt"
            )
        )
        self._query = None

    def start(self, checkpoint_dir: str, state_dir: str | None = None):
        slots = self.slots
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                slots.update(st["slots"])
                self._last_epoch = st["epoch"]

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            if state_dir is not None and epoch_id <= self._last_epoch:
                return  # replayed epoch already folded into the state
            for r in batch_df.collect():
                slots[(r["bucket_ms"], r["bin"])] = r["cnt"]
            if state_dir is not None:
                self._last_epoch = epoch_id
                _persist_state(state_dir, slots, epoch_id, checkpoint=checkpoint_dir)

        self._query = (
            self._agg.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot_rollup(self, spark) -> DataFrame:
        """Freeze the maintained counts into the same
        ``(bucket_ms, bin, cnt)`` frame build_histogram_rollup
        produces — ready for range_quantile_df / cascade_histogram /
        rollup_io.save_rollup."""
        rows = [(b, bn, c) for (b, bn), c in self.slots.items()]
        return spark.createDataFrame(rows, "bucket_ms long, bin long, cnt long")


class StreamingOHLCWheel:
    """Streaming maintenance of the OHLC candle rollup
    (operators/ohlc is the batch side) — the aggregator whose partial
    CARRIES ITS OWN TIMESTAMP: open/close don't combine by sum, the
    state must remember when each value occurred. ``min_by``/``max_by``
    over the (ts, value) key are declarative aggregates, so the
    streaming windowed aggregation maintains the running candle
    per minute window in the state store directly; update mode emits
    each touched window's CURRENT candle, so the sink upsert (replace
    by bucket) is idempotent. Combine associativity + the fixed
    (ts, value) tie-break make the maintained candles bit-identical to
    a batch build over the same rows (pinned in tests/test_streaming).

    At scale the sink MERGEs into a Delta/Iceberg rollup keyed on
    bucket_ms; serving (range_ohlc_df / cascade_ohlc /
    m4_downsample_df) is identical either way."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        value_col: str,
        watermark_delay: str = "1 hour",
    ) -> None:
        #: bucket_ms → (open_ts_ms, open, high, low, close_ts_ms, close, cnt)
        self.slots: dict[int, tuple] = {}
        self._last_epoch = -1
        ms = ts_to_ms(F.col(ts_col))
        v = F.col(value_col).cast("double")
        key = F.struct(ms.alias("t"), v.alias("v"))
        self._agg = (
            ensure_event_time(stream_df, ts_col)
            .withWatermark(ts_col, watermark_delay)
            .select(
                F.col(ts_col),
                ms.alias("ts_ms"),
                v.alias("value"),
                key.alias("k"),
            )
            .groupBy(F.window(ts_col, "1 minute").alias("w"))
            .agg(
                F.min_by(F.col("ts_ms"), F.col("k")).alias("open_ts_ms"),
                F.min_by(F.col("value"), F.col("k")).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by(F.col("ts_ms"), F.col("k")).alias("close_ts_ms"),
                F.max_by(F.col("value"), F.col("k")).alias("close"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .select(ts_to_ms(F.col("w.start")).alias("bucket_ms"), "*")
            .drop("w")
        )
        self._query = None

    def start(self, checkpoint_dir: str, state_dir: str | None = None):
        slots = self.slots
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                slots.update(st["slots"])
                self._last_epoch = st["epoch"]

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            if state_dir is not None and epoch_id <= self._last_epoch:
                return  # replayed epoch already folded into the state
            for r in batch_df.collect():
                slots[r["bucket_ms"]] = (
                    r["open_ts_ms"],
                    r["open"],
                    r["high"],
                    r["low"],
                    r["close_ts_ms"],
                    r["close"],
                    r["cnt"],
                )
            if state_dir is not None:
                self._last_epoch = epoch_id
                _persist_state(state_dir, slots, epoch_id, checkpoint=checkpoint_dir)

        self._query = (
            self._agg.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot_rollup(self, spark) -> DataFrame:
        """Freeze the maintained candles into the same partial frame
        build_ohlc_rollup produces — ready for range_ohlc_df /
        cascade_ohlc / m4_downsample_df / rollup_io.save_rollup."""
        rows = [(b, *p) for b, p in self.slots.items()]
        return spark.createDataFrame(
            rows,
            "bucket_ms long, open_ts_ms long, open double, high double, "
            "low double, close_ts_ms long, close double, cnt long",
        )


class StreamingWheel:
    """Maintain the minute rollup from a streaming source — unkeyed, or
    per-series when ``key_col`` is given (the streaming twin of
    KeyedWheelIndex: state is keyed by (series, window), the sink
    upserts (key, bucket) partials)."""

    def __init__(
        self,
        stream_df: DataFrame,
        ts_col: str,
        value_col: str,
        watermark_delay: str = "1 hour",
        store: RollupStore | None = None,
        key_col: str | None = None,
    ) -> None:
        self.store = store if store is not None else RollupStore()
        self._last_epoch = -1
        self._delay = watermark_delay
        self.key_col = key_col
        group_cols = [F.window(ts_col, "1 minute").alias("w")]
        out_cols = [ts_to_ms(F.col("w.start")).alias("bucket_ms")]
        if key_col is not None:
            group_cols.append(F.col(key_col).alias("key"))
            out_cols.insert(0, F.col("key"))
        self._agg = (
            ensure_event_time(stream_df, ts_col)
            .withWatermark(ts_col, watermark_delay)
            .groupBy(*group_cols)
            .agg(
                F.sum(value_to_micros(F.col(value_col))).alias("sum_micros"),
                F.count(F.lit(1)).alias("cnt"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value"),
            )
            .select(
                *out_cols,
                "sum_micros",
                "cnt",
                "min_value",
                "max_value",
            )
        )
        self._query = None

    def start(
        self,
        checkpoint_dir: str,
        state_dir: str | None = None,
        table_dir: str | None = None,
        manifest_root: str | None = None,
    ):
        """``state_dir``: auto-persisted restart-safe driver state —
        the hands-off alternative to the manual RollupStore.save/load
        lifecycle (which remains supported for explicit control).

        ``table_dir``: maintain the rollup as a dt-partitioned parquet
        TABLE instead of (or alongside) the driver dict — the 100 TB
        shape: each micro-batch's (bucket → current partials) rows are
        MERGE-upserted via rollup_io.upsert_rollup (O(touched
        partitions) per trigger, per-partition atomic swap), with the
        same epoch-replay guard, persisted in ``_sink_meta.json``.
        Serving reads the table (rollup_io.load_rollup) — any session,
        any scale; the driver dict is never required.

        ``manifest_root`` (round 13 — VERDICT r12 next #5): maintain
        the rollup as a MANIFEST-COMMITTED table instead — each epoch
        publishes one immutable generation dir + one atomic small-file
        commit (rollup_io.manifest_rollup_append), newest generation
        wins per slot key, and the epoch-replay guard + checkpoint
        identity ride the snapshot's ``extra`` ATOMICALLY with the
        data (the _sink_meta.json sidecar's torn-overwrite dance is
        structural here). Serving reads manifest_rollup_read; folding
        is manifest_rollup_compact + manifest_vacuum. No data rename
        ever happens — the S3A-safe sink shape."""
        store = self.store
        if state_dir is not None:
            st = _load_state(state_dir, checkpoint_dir)
            if st is not None:
                store.slots.update(st["slots"])
                store.n_late_rows += st.get("late", 0)
                self._last_epoch = st["epoch"]
        if table_dir is not None:
            meta = _load_sink_meta(
                self._agg.sparkSession, table_dir, checkpoint_dir
            )
            if meta is not None:
                self._last_epoch = max(self._last_epoch, meta["epoch"])
        if manifest_root is not None:
            from uwheel_datafusion_spark.operators.manifest import (
                manifest_latest,
            )

            snap = manifest_latest(self._agg.sparkSession, manifest_root)
            if snap is not None:
                saved = snap.extra.get("checkpoint")
                if saved is not None and saved != checkpoint_dir:
                    raise ValueError(
                        f"rollup manifest {manifest_root!r} was "
                        f"maintained under checkpoint {saved!r} but is "
                        f"being resumed under {checkpoint_dir!r}"
                    )
                self._last_epoch = max(
                    self._last_epoch, int(snap.extra.get("epoch", -1))
                )
        guarded = (
            state_dir is not None
            or table_dir is not None
            or manifest_root is not None
        )
        key_cols = (
            ("key", "bucket_ms") if self.key_col is not None else ("bucket_ms",)
        )

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            if guarded and epoch_id <= self._last_epoch:
                return  # replayed epoch already folded into the state
            if manifest_root is not None:
                from uwheel_datafusion_spark.operators.rollup_io import (
                    manifest_rollup_append,
                )

                manifest_rollup_append(
                    batch_df.sparkSession,
                    manifest_root,
                    batch_df,
                    key_cols,
                    epoch=epoch_id,
                    checkpoint=checkpoint_dir,
                )
                self._last_epoch = epoch_id
            if table_dir is not None:
                from uwheel_datafusion_spark.operators.rollup_io import (
                    upsert_rollup,
                )

                upsert_rollup(
                    batch_df.sparkSession, table_dir, batch_df, key_cols
                )
            if (
                table_dir is None and manifest_root is None
            ) or state_dir is not None:
                store.upsert(batch_df.collect())
            if guarded:
                self._last_epoch = epoch_id
                if state_dir is not None:
                    _persist_state(
                        state_dir,
                        store.slots,
                        epoch_id,
                        {"late": store.n_late_rows},
                        checkpoint=checkpoint_dir,
                    )
                if table_dir is not None:
                    _persist_sink_meta(
                        batch_df.sparkSession,
                        table_dir,
                        epoch_id,
                        checkpoint_dir,
                    )

        self._query = (
            self._agg.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        return self._query

    def process_available(self) -> None:
        """Drain everything currently available (test/smoke path);
        production runs with a processing-time trigger instead."""
        assert self._query is not None, "call start() first"
        self._query.processAllAvailable()
        self._harvest_late_metric()

    def _harvest_late_metric(self) -> None:
        q = self._query
        try:
            for prog in q.recentProgress:
                for op in prog.get("stateOperators", []):
                    self.store.n_late_rows += int(
                        op.get("numRowsDroppedByWatermark", 0)
                    )
        except Exception:
            pass

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    # serving --------------------------------------------------------------

    def snapshot_index(self, watermark_ms: int, advanced_ms: int):
        """Freeze the current rollup into the O(1) serving index —
        same structure the batch build produces (A4/A5 equivalence)."""
        return self.store.to_driver_index(watermark_ms, advanced_ms)

    def snapshot_keyed_indexes(self, watermark_ms: int, advanced_ms: int) -> dict:
        """Keyed variant: {key: DriverWheelIndex}, the serving structure
        of the batch KeyedWheelIndex."""
        return self.store.to_keyed_indexes(watermark_ms, advanced_ms)
