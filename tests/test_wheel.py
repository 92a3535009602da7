"""WheelIndex semantics (SURVEY §5.1/§5.2): differential index-vs-SQL
on seeded random ranges, watermark/late-data handling, cascade
invariant, empty-slot semantics, driver-index parity."""

import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.time import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    ms_to_ts_literal,
    to_epoch_ms,
)
from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.sources.registry import load_table

WM = to_epoch_ms(datetime(2024, 1, 1))
ADV = to_epoch_ms(datetime(2024, 2, 1))


@pytest.fixture(scope="module")
def wheel(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "events")
    return WheelIndex.build(df, "ts", "value", WM, ADV)


@pytest.fixture(scope="module")
def events_view(spark, sf_smoke):
    load_table(spark, sf_smoke, "events").createOrReplaceTempView("events_t")
    return "events_t"


def _sql_truth(spark, view, s_ms, e_ms):
    row = spark.sql(
        f"""
        SELECT SUM(CAST(round(value*1000000) AS BIGINT)) AS sm,
               COUNT(*) AS c, MIN(value) AS mn, MAX(value) AS mx
        FROM {view}
        WHERE ts >= TIMESTAMP '{ms_to_ts_literal(s_ms)}'
          AND ts < TIMESTAMP '{ms_to_ts_literal(e_ms)}'
        """
    ).first()
    return row


def test_build_stats(wheel):
    st = wheel.stats
    assert st.n_input_rows == 1000
    assert st.n_late_rows == 0 and st.n_ahead_rows == 0
    assert st.n_indexed_rows == 1000
    assert st.slot_counts["minute"] >= st.slot_counts["hour"] >= st.slot_counts["day"]


def test_differential_random_ranges(spark, wheel, events_view):
    """Index path == SQL full-scan path on seeded random minute- and
    hour-aligned ranges plus adversarial edges."""
    di = wheel.to_driver_index()
    rng = random.Random(42)
    horizon_min = (ADV - WM) // MINUTE_MS
    cases = []
    for _ in range(25):  # minute-aligned (reference workload B2)
        a = rng.randrange(0, horizon_min)
        b = rng.randrange(0, horizon_min)
        cases.append((WM + min(a, b) * MINUTE_MS, WM + max(a, b) * MINUTE_MS))
    for _ in range(10):  # hour-aligned (B3, bug-fixed semantics)
        a = rng.randrange(0, horizon_min // 60)
        b = rng.randrange(0, horizon_min // 60)
        cases.append((WM + min(a, b) * HOUR_MS, WM + max(a, b) * HOUR_MS))
    cases += [
        (WM, WM),  # empty
        (WM, WM + MINUTE_MS),  # single slot
        (WM, ADV),  # full span
        (ADV - MINUTE_MS, ADV),  # last slot
        (WM + 5 * DAY_MS, WM + 5 * DAY_MS + MINUTE_MS),
        (ADV, ADV + DAY_MS),  # fully beyond watermark
        (WM - DAY_MS, WM),  # fully before data
    ]
    for s, e in cases:
        truth = _sql_truth(spark, events_view, s, e)
        got_sum = di.query_sum(s, e)
        if truth["c"] == 0:
            assert got_sum is None, (s, e)
            assert di.query_count(s, e) == 0
        else:
            assert got_sum is not None
            # exact integer equality under the scaled-long policy
            assert round(got_sum * 1e6) == truth["sm"], (s, e)
            assert di.query_count(s, e) == truth["c"]
            assert di.query_min(s, e) == truth["mn"]
            assert di.query_max(s, e) == truth["mx"]


def test_distributed_path_matches_driver_path(spark, wheel):
    di = wheel.to_driver_index()
    s = WM + 2 * DAY_MS + 7 * HOUR_MS + 13 * MINUTE_MS
    e = WM + 9 * DAY_MS + 22 * HOUR_MS + 51 * MINUTE_MS
    row = wheel.range_agg_df(s, e).first()
    assert round(row["sum_value"] * 1e6) == round(di.query_sum(s, e) * 1e6)
    assert row["cnt"] == di.query_count(s, e)
    assert row["min_value"] == di.query_min(s, e)
    assert row["max_value"] == di.query_max(s, e)


def test_cascade_invariant(spark, wheel):
    """hour rollup == re-agg of minute; day == re-agg of hour (A4),
    exactly (associative scaled-long sums)."""
    minute = wheel.rollups["minute"]
    hour = wheel.rollups["hour"]
    direct = (
        minute.groupBy((F.floor(F.col("bucket_ms") / HOUR_MS) * HOUR_MS).alias("b"))
        .agg(F.sum("sum_micros").alias("sm"), F.sum("cnt").alias("c"))
        .collect()
    )
    got = {r["bucket_ms"]: (r["sum_micros"], r["cnt"]) for r in hour.collect()}
    assert len(direct) == len(got)
    for r in direct:
        assert got[r["b"]] == (r["sm"], r["c"])


def test_late_and_ahead_rows_dropped(spark):
    """Watermark semantics: rows before the watermark are rejected as
    late; rows at/after the advance target stay unfinalized (A3)."""
    rows = [
        (datetime(2023, 12, 31, 23, 59, tzinfo=timezone.utc), 100.0),  # late
        (datetime(2024, 1, 1, 0, 0, tzinfo=timezone.utc), 1.0),
        (datetime(2024, 1, 15, 12, 0, tzinfo=timezone.utc), 2.0),
        (datetime(2024, 2, 1, 0, 0, tzinfo=timezone.utc), 50.0),  # ahead
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    idx = WheelIndex.build(df, "ts", "value", WM, ADV)
    assert idx.stats.n_late_rows == 1
    assert idx.stats.n_ahead_rows == 1
    assert idx.stats.n_indexed_rows == 2
    di = idx.to_driver_index()
    assert di.landmark()["sum"] == 3.0
    assert di.landmark()["cnt"] == 2


def test_landmark_and_interval(wheel):
    di = wheel.to_driver_index()
    lm = di.landmark()
    assert lm["cnt"] == 1000
    iv = di.interval(7 * DAY_MS)
    assert 0 < iv["cnt"] < lm["cnt"]
    full = di.query_all(WM, ADV)
    assert full == lm


def test_out_of_contract_alignment_raises(wheel):
    di = wheel.to_driver_index()
    with pytest.raises(ValueError):
        di.query_sum(WM + 500, WM + MINUTE_MS)  # sub-minute start


def test_explain_plan(wheel):
    s = WM + 3 * DAY_MS + 4 * HOUR_MS + 17 * MINUTE_MS
    e = WM + 20 * DAY_MS + 7 * HOUR_MS + 42 * MINUTE_MS
    plan = wheel.plan(s, e)
    assert plan.fallback is None
    assert [r.granularity for r in plan.runs] == [
        "minute",
        "hour",
        "day",
        "hour",
        "minute",
    ]
    assert "cost=" in plan.describe()


def test_save_load_roundtrip(spark, wheel, tmp_path):
    """Persisted rollups reopen into an equivalent index (no rebuild)."""
    path = str(tmp_path / "wheel_idx")
    wheel.save(path)
    reopened = WheelIndex.load(spark, path)
    assert reopened.watermark_ms == wheel.watermark_ms
    assert reopened.advanced_ms == wheel.advanced_ms
    assert reopened.stats.n_indexed_rows == wheel.stats.n_indexed_rows
    assert reopened.stats.slot_counts == wheel.stats.slot_counts
    s = WM + 2 * DAY_MS + 30 * MINUTE_MS
    e = WM + 9 * DAY_MS + 5 * HOUR_MS
    a = wheel.to_driver_index().query_all(s, e)
    b = reopened.to_driver_index().query_all(s, e)
    assert a == b
    # distributed serving on the reopened index agrees too
    row = reopened.range_agg_df(s, e).first()
    assert row["cnt"] == a["cnt"]
    assert round(row["sum_value"] * 1e6) == round(a["sum"] * 1e6)
    # and its range probes prune day partitions STATICALLY — the on-disk
    # layout's whole point: day-range file listing, not full-index scans
    plan = (
        reopened.range_agg_df(s, e)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # truncation-tolerant: scan metadata strings cap at ~100 chars
    pfs = re.findall(r"PartitionFilters: \[(.*?)(?:\]|, Pushed)", plan)
    assert pfs, "no file scans in reopened-index plan"
    assert all("dt" in p and ">=" in p and "<=" in p for p in pfs), pfs


def test_pruned_stats_mode_same_rollups(spark, sf_smoke, wheel):
    """stats_mode='pruned' pushes the horizon into the scan and yields
    identical rollups; late/ahead counts are reported unknown (−1)."""
    df = load_table(spark, sf_smoke, "events")
    pruned = WheelIndex.build(df, "ts", "value", WM, ADV, stats_mode="pruned")
    assert pruned.stats.n_late_rows == -1 and pruned.stats.n_ahead_rows == -1
    assert pruned.stats.n_indexed_rows == wheel.stats.n_indexed_rows
    assert pruned.stats.slot_counts == wheel.stats.slot_counts
    s = WM + 3 * DAY_MS
    e = WM + 17 * DAY_MS + 5 * HOUR_MS
    assert pruned.to_driver_index().query_all(s, e) == wheel.to_driver_index().query_all(s, e)


def test_approx_count_distinct_bound(spark, sf_smoke):
    """SURVEY §2.4 last row: approximate aggregates are Spark
    built-ins; sanity-check HLL++ error against the exact count."""
    ev = load_table(spark, sf_smoke, "events")
    row = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.05 * row["exact"])


def test_custom_aggregator_protocol(spark, sf_smoke):
    """§2.10: a user-defined lift/combine/lower aggregator (sum of
    squares) built as a distributed slot rollup + driver fold must
    equal the direct SQL computation over the same range — and an
    empty range lowers to None (Option contract)."""
    from uwheel_datafusion_spark.functions.aggregator import (
        CustomSlotIndex,
        build_custom_rollup,
        sum_of_squares_aggregator,
    )
    from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS, RANGE_MINUTE
    from uwheel_datafusion_spark.functions.time import ts_to_ms
    from uwheel_datafusion_spark.sources.registry import load_table

    ev = load_table(spark, sf_smoke, "events")
    agg = sum_of_squares_aggregator("value")
    rollup = build_custom_rollup(ev, "ts", agg, EVENTS_WM_MS, EVENTS_ADV_MS)
    idx = CustomSlotIndex(rollup, agg)

    s, e = RANGE_MINUTE
    ms = ts_to_ms("ts")
    direct = (
        ev.filter((ms >= s) & (ms < e))
        .agg(F.sum(F.round(F.col("value") * F.col("value") * 1_000_000).cast("long")))
        .first()[0]
    )
    assert idx.query(s, e) == float(direct) / 1_000_000
    # a range wholly before any data lowers to None
    assert idx.query(EVENTS_WM_MS - 60_000, EVENTS_WM_MS) is None


def test_wheel_cache_keyed_by_sf_dir(spark, sf_smoke, sf_correctness):
    """Two scale factors in one session must build two distinct
    indexes — a stale shared cache would silently serve sf0.001
    results for sf0.01 queries (driver runs multiple sf dirs)."""
    from uwheel_datafusion_spark.gate import events_wheel

    a = events_wheel(spark, sf_smoke)
    b = events_wheel(spark, sf_correctness)
    assert a is not b
    assert a.stats.n_indexed_rows != b.stats.n_indexed_rows
    # repeat call returns the cached object (no rebuild)
    assert events_wheel(spark, sf_smoke) is a


def test_incremental_extend_equals_one_shot_build(spark, sf_smoke):
    """insert+advance parity (/root/reference/src/main.rs:128-140):
    indexing January in two chunks (split at Jan 16) then advancing
    must yield the SAME index as one full build — landmark, random
    ranges, slot counts, and row stats all equal — without re-reading
    the first chunk."""
    from datetime import datetime

    from uwheel_datafusion_spark.functions.time import MINUTE_MS, to_epoch_ms
    from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS

    split_ms = to_epoch_ms(datetime(2024, 1, 16))
    ev = load_table(spark, sf_smoke, "events")
    chunk1 = ev.filter(F.col("ts") < F.timestamp_millis(F.lit(split_ms)))
    chunk2 = ev.filter(F.col("ts") >= F.timestamp_millis(F.lit(split_ms)))

    base = WheelIndex.build(
        chunk1, "ts", "value", EVENTS_WM_MS, split_ms, cache=False
    )
    extended = base.extend(chunk2, "ts", "value", EVENTS_ADV_MS)
    full = WheelIndex.build(ev, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS)

    assert extended.stats.n_indexed_rows == full.stats.n_indexed_rows
    assert extended.stats.slot_counts == full.stats.slot_counts

    di_ext = extended.to_driver_index()
    di_full = full.to_driver_index()
    assert di_ext.landmark() == di_full.landmark()
    import random

    rng = random.Random(11)
    n_min = (EVENTS_ADV_MS - EVENTS_WM_MS) // MINUTE_MS
    for _ in range(25):
        a = rng.randrange(0, n_min)
        b = rng.randrange(a + 1, n_min + 1)
        s, e = EVENTS_WM_MS + a * MINUTE_MS, EVENTS_WM_MS + b * MINUTE_MS
        assert di_ext.query_sum(s, e) == di_full.query_sum(s, e)
        assert di_ext.query_all(s, e) == di_full.query_all(s, e)

    # late rows (below the advanced watermark) are rejected + counted,
    # not silently re-indexed
    re_extended = extended.extend(ev, "ts", "value", EVENTS_ADV_MS)
    assert re_extended.stats.n_late_rows == full.stats.n_indexed_rows
    assert re_extended.stats.n_indexed_rows == full.stats.n_indexed_rows
    assert (
        re_extended.to_driver_index().landmark() == di_full.landmark()
    )

    # watermark cannot move backwards
    import pytest as _pt

    with _pt.raises(ValueError):
        extended.extend(chunk2, "ts", "value", EVENTS_WM_MS)


def test_extend_composes_with_save_load(spark, sf_smoke, tmp_path):
    """The nightly-ingest lifecycle: build → save → load → extend with
    the next chunk — the loaded (parquet-backed) rollups must merge
    exactly like in-memory ones."""
    from datetime import datetime

    from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS
    from uwheel_datafusion_spark.functions.time import to_epoch_ms

    split_ms = to_epoch_ms(datetime(2024, 1, 16))
    ev = load_table(spark, sf_smoke, "events")
    chunk1 = ev.filter(F.col("ts") < F.timestamp_millis(F.lit(split_ms)))
    chunk2 = ev.filter(F.col("ts") >= F.timestamp_millis(F.lit(split_ms)))

    base = WheelIndex.build(chunk1, "ts", "value", EVENTS_WM_MS, split_ms)
    path = str(tmp_path / "wheel_ckpt")
    base.save(path)
    loaded = WheelIndex.load(spark, path)
    extended = loaded.extend(chunk2, "ts", "value", EVENTS_ADV_MS)
    full = WheelIndex.build(ev, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS)
    assert (
        extended.to_driver_index().landmark()
        == full.to_driver_index().landmark()
    )
    assert extended.stats.slot_counts == full.stats.slot_counts


def test_keyed_wheel_differential(spark, sf_smoke, wheel):
    """KeyedWheelIndex: per-key probes == per-key SQL group-by on random
    minute-aligned ranges; Σ over keys == the unkeyed wheel's answer."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    kw = KeyedWheelIndex.build(ev, "event_type", "ts", "value", WM, ADV)
    assert kw.keys()  # at least one series
    di = wheel.to_driver_index()

    rng = random.Random(7)
    n_min = (ADV - WM) // MINUTE_MS
    for _ in range(15):
        a = rng.randrange(n_min)
        b = rng.randrange(n_min)
        s, e = WM + min(a, b) * MINUTE_MS, WM + (max(a, b) + 1) * MINUTE_MS
        truth = {
            r["event_type"]: r
            for r in ev.filter(
                (F.unix_micros(F.col("ts").cast("timestamp")) >= s * 1000)
                & (F.unix_micros(F.col("ts").cast("timestamp")) < e * 1000)
            )
            .groupBy("event_type")
            .agg(
                F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sm"),
                F.count(F.lit(1)).alias("c"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        }
        total = 0
        for k in kw.keys():
            got = kw.query_all(k, s, e)
            t = truth.get(k)
            if t is None:
                assert got["cnt"] == 0 and got["sum"] is None
                continue
            assert got["cnt"] == t["c"]
            assert round(got["sum"] * 1e6) == t["sm"]
            assert got["min"] == t["mn"] and got["max"] == t["mx"]
            total += t["sm"]
        whole = di.query_sum(s, e)
        assert round((whole or 0.0) * 1e6) == total

    # unknown key ⇒ None, matching a missing series
    assert kw.query_all("no-such-type", WM, ADV) is None
    assert kw.size_bytes() > 0


def test_keyed_rollup_distributed_matches_driver_path(spark, sf_smoke):
    """build_rollup + query_rollup_df (the collect-free high-cardinality
    serving path) must agree with the hot DriverWheelIndex path — on
    matching ranges AND the empty range, where both sides now lower to
    cnt=0 with NULL/None value aggregates."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    kw = KeyedWheelIndex.build(ev, "event_type", "ts", "value", WM, ADV)
    rollup = KeyedWheelIndex.build_rollup(ev, "event_type", "ts", "value", WM, ADV)
    rollup.persist()
    try:
        ranges = [
            (WM, ADV),                                   # full span
            (WM + 3 * DAY_MS, WM + 11 * DAY_MS),         # interior
            (ADV, ADV + DAY_MS),                         # empty (beyond)
        ]
        for key in kw.keys():
            for s, e in ranges:
                hot = kw.query_all(key, s, e)
                row = KeyedWheelIndex.query_rollup_df(rollup, key, s, e).first()
                assert row["cnt"] == hot["cnt"], (key, s, e)
                if hot["cnt"] == 0:
                    assert hot["sum"] is None
                    assert row["sum_value"] is None
                    assert row["min_value"] is None and row["max_value"] is None
                    assert row["avg_value"] is None
                else:
                    assert round(row["sum_value"] * 1e6) == round(hot["sum"] * 1e6)
                    assert row["min_value"] == hot["min"]
                    assert row["max_value"] == hot["max"]
                    assert abs(row["avg_value"] - hot["avg"]) < 1e-9
    finally:
        rollup.unpersist()


def test_gapfill_rollup_dense_and_locf(spark, wheel):
    """One row per horizon slot; empty slots cnt=0/NULL aggregates;
    sum_locf carries the last non-empty slot's sum forward."""
    df = wheel.gapfill_rollup_df("hour").orderBy("bucket_ms")
    rows = df.collect()
    n_expected = (ADV - WM) // HOUR_MS
    assert len(rows) == n_expected
    assert [r["bucket_ms"] for r in rows] == [
        WM + i * HOUR_MS for i in range(n_expected)
    ]
    last_seen = None
    for r in rows:
        if r["cnt"] == 0:
            assert r["sum_value"] is None and r["min_value"] is None
        else:
            assert r["sum_value"] is not None
            last_seen = r["sum_value"]
        assert r["sum_locf"] == last_seen
    # densified sums must agree with the sparse rollup
    sparse = {
        r["bucket_ms"]: r["sum_value"]
        for r in wheel.rollup_df("hour").collect()
    }
    for r in rows:
        assert r["sum_value"] == sparse.get(r["bucket_ms"])


def test_probe_matches_range_agg_df(spark, wheel):
    """The parameterized-SQL serving probe returns the same row as the
    per-query DataFrame path, including repeat probes (view reuse)."""
    s = WM + 3 * DAY_MS + 5 * HOUR_MS + 7 * MINUTE_MS
    e = WM + 17 * DAY_MS + 11 * HOUR_MS + 23 * MINUTE_MS
    slow = wheel.range_agg_df(s, e).first()
    for _ in range(2):  # second probe reuses the registered view + SQL
        fast = wheel.probe(s, e)
        assert fast["cnt"] == slow["cnt"]
        assert fast["sum_value"] == slow["sum_value"]
        assert fast["min_value"] == slow["min_value"]
        assert fast["max_value"] == slow["max_value"]
        assert fast["avg_value"] == slow["avg_value"]


def test_probe_rejects_unaligned(wheel):
    with pytest.raises(ValueError):
        wheel.probe(WM + 500, WM + DAY_MS)


def test_batch_serving_matches_per_query_and_handles_empty(spark, wheel):
    """range_agg_batch_df: N ranges in one job == N per-query answers;
    an empty range yields nulls (A5 Option semantics) at its query_id;
    output preserves input order."""
    ranges = [
        (WM, WM + DAY_MS),
        (WM + 5 * DAY_MS + 3 * HOUR_MS, WM + 20 * DAY_MS + 19 * HOUR_MS),
        (ADV - MINUTE_MS, ADV - MINUTE_MS),  # empty
        (WM + 13 * MINUTE_MS, WM + 2 * DAY_MS + 13 * MINUTE_MS),
    ]
    rows = wheel.range_agg_batch_df(ranges).orderBy("query_id").collect()
    assert [r["query_id"] for r in rows] == [0, 1, 2, 3]
    for qid, (s, e) in enumerate(ranges):
        one = wheel.range_agg_df(s, e).first()
        got = rows[qid]
        assert got["cnt"] == one["cnt"]
        assert got["sum_value"] == one["sum_value"]
        assert got["min_value"] == one["min_value"]
        assert got["max_value"] == one["max_value"]
    assert rows[2]["cnt"] is None and rows[2]["sum_value"] is None


def test_wheel_explain_aligned_and_hybrid(wheel):
    """WheelIndex.explain covers BOTH serving paths: aligned ranges
    describe the multi-granularity decomposition, ragged ranges the
    hybrid edge-scan + interior plan (A6 for any range)."""
    aligned = wheel.explain(WM + DAY_MS, WM + 2 * DAY_MS)
    assert "day[" in aligned and "FALLBACK" not in aligned
    ragged = wheel.explain(WM + DAY_MS + 37_000, WM + 2 * DAY_MS + 11_000)
    assert ragged.startswith("hybrid[") and "scan[" in ragged
    assert "interior:" in ragged and "hour[" in ragged


def test_probe_landmark_and_empty(wheel):
    """Fixed-SQL probe across plan shapes: the full-horizon landmark
    (single day-run chain) and an empty range (all windows bind to
    [0,0) ⇒ nulls, cnt NULL — A5 Option semantics)."""
    lm = wheel.probe(WM, ADV)
    truth = wheel.range_agg_df(WM, ADV).first()
    assert (lm["sum_value"], lm["cnt"]) == (truth["sum_value"], truth["cnt"])
    empty = wheel.probe(ADV, ADV)
    assert empty["cnt"] is None and empty["sum_value"] is None


def test_probe_multi_granularity_wide_horizon(spark):
    """Ranges above the single-level threshold take the decomposed
    UNION statement (two bind windows per granularity) — pin its
    parity with range_agg_df on a multi-year horizon."""
    rows = [
        (datetime(1995, 3, 7, 12, 30, tzinfo=timezone.utc), 1.5),
        (datetime(1995, 11, 21, 8, 1, tzinfo=timezone.utc), 2.25),
        (datetime(1996, 2, 2, 0, 0, tzinfo=timezone.utc), -3.0),
        (datetime(1996, 7, 15, 23, 59, tzinfo=timezone.utc), 10.0),
        (datetime(1997, 9, 30, 6, 45, tzinfo=timezone.utc), 4.125),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    wm = to_epoch_ms(datetime(1995, 1, 1))
    adv = to_epoch_ms(datetime(1998, 1, 1))
    idx = WheelIndex.build(df, "ts", "value", wm, adv)
    cases = [
        (to_epoch_ms(datetime(1995, 2, 3, 4, 5)), to_epoch_ms(datetime(1997, 11, 20, 21, 22))),
        (wm, adv),  # landmark, > 200k minute slots
    ]
    for s, e in cases:
        assert (e - s) // MINUTE_MS > idx.SINGLE_LEVEL_SLOT_THRESHOLD
        fast = idx.probe(s, e)
        slow = idx.range_agg_df(s, e).first()
        assert (fast["sum_value"], fast["cnt"], fast["min_value"],
                fast["max_value"]) == (
            slow["sum_value"], slow["cnt"], slow["min_value"], slow["max_value"])


def test_keyed_rollup_save_load_prunes_key_and_day_partitions(
    spark, sf_smoke, tmp_path
):
    """Persisted keyed rollup: (key-hash bucket, UTC date) layout; a
    reopened probe must (a) match the in-memory answer exactly and
    (b) carry STATIC kb + dt partition filters in its scan — the
    O(days-touched) listing contract at any key cardinality."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    rollup = KeyedWheelIndex.build_rollup(ev, "event_type", "ts", "value", WM, ADV)
    path = str(tmp_path / "keyed_rollup")
    KeyedWheelIndex.save_rollup_parquet(rollup, path)
    reopened = KeyedWheelIndex.load_rollup_parquet(spark, path)

    s, e = WM + 3 * DAY_MS, WM + 11 * DAY_MS
    key = ev.select("event_type").first()[0]
    mem = KeyedWheelIndex.query_rollup_df(rollup, key, s, e).first()
    disk_df = KeyedWheelIndex.query_rollup_df(reopened, key, s, e)
    disk = disk_df.first()
    assert (disk["sum_value"], disk["cnt"], disk["min_value"], disk["max_value"]) == (
        mem["sum_value"], mem["cnt"], mem["min_value"], mem["max_value"]
    )
    # python-side bucket == spark-side crc32 bucket (same polynomial)
    kb_spark = spark.range(1).select(
        (
            F.crc32(F.lit(key).cast("string").cast("binary"))
            % KeyedWheelIndex.N_KEY_BUCKETS
        ).alias("kb")
    ).first()["kb"]
    assert kb_spark == KeyedWheelIndex._key_bucket(key)
    import re

    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    # scan metadata is truncated at ~100 chars (long attribute ids can
    # push out the closing bracket), so don't require a ']'
    pfs = re.findall(r"PartitionFilters: \[(.*?)(?:\]|, Pushed)", plan)
    assert pfs and all("kb" in p and "dt" in p for p in pfs), plan


def test_keyed_batch_serving_matches_per_key_and_handles_missing(spark, sf_smoke):
    """query_rollup_batch_df: N (key, range) probes in one job match
    the per-key path; an unknown key yields cnt=0/null aggregates at
    its query_id; input order preserved."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    rollup = KeyedWheelIndex.build_rollup(
        ev, "event_type", "ts", "value", WM, ADV
    )
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    probes = [
        (types[0], WM, WM + 10 * DAY_MS),
        (types[1], WM + 5 * DAY_MS, WM + 6 * DAY_MS),
        ("no_such_type", WM, ADV),
        (types[0], ADV - DAY_MS, ADV),
    ]
    rows = (
        KeyedWheelIndex.query_rollup_batch_df(rollup, probes)
        .orderBy("query_id")
        .collect()
    )
    assert [r["query_id"] for r in rows] == [0, 1, 2, 3]
    for qid, (k, s, e) in enumerate(probes):
        one = KeyedWheelIndex.query_rollup_df(rollup, k, s, e).first()
        got = rows[qid]
        assert got["cnt"] == one["cnt"]
        assert got["sum_value"] == one["sum_value"]
        assert got["min_value"] == one["min_value"]
        assert got["max_value"] == one["max_value"]
    assert rows[2]["cnt"] == 0 and rows[2]["sum_value"] is None


def test_keyed_batch_serving_integer_keys(spark, sf_smoke):
    """Probe keys are typed from the rollup's key column — an integer
    series key (user_id) must batch-serve, not crash on a string-typed
    probe frame (code-review regression)."""
    from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex

    ev = load_table(spark, sf_smoke, "events")
    rollup = KeyedWheelIndex.build_rollup(ev, "user_id", "ts", "value", WM, ADV)
    uid = ev.select("user_id").first()[0]
    rows = (
        KeyedWheelIndex.query_rollup_batch_df(
            rollup, [(uid, WM, ADV), (uid, WM, WM + DAY_MS)]
        )
        .orderBy("query_id")
        .collect()
    )
    one = KeyedWheelIndex.query_rollup_df(rollup, uid, WM, ADV).first()
    assert rows[0]["cnt"] == one["cnt"] and rows[0]["cnt"] > 0


def test_detect_gaps_with_synthetic_silence(spark):
    """Gap detection: forced silent spans (including leading/trailing
    silence via the sentinel edges) surface with exact boundaries."""
    pts = (
        [WM + 2 * HOUR_MS + i * MINUTE_MS for i in range(10)]
        + [WM + 5 * HOUR_MS]
        + [WM + 5 * HOUR_MS + 30 * MINUTE_MS + i * MINUTE_MS for i in range(5)]
    )
    df = spark.createDataFrame(
        [(t, 1.0) for t in pts], "ts_ms long, value double"
    ).select(
        F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    idx = WheelIndex.build(df, "ts", "value", WM, WM + 6 * HOUR_MS)
    gaps = {
        (r["gap_start_ms"], r["gap_end_ms"])
        for r in idx.detect_gaps_df(15 * MINUTE_MS).collect()
    }
    assert (WM, WM + 2 * HOUR_MS) in gaps  # leading silence
    assert (WM + 2 * HOUR_MS + 10 * MINUTE_MS, WM + 5 * HOUR_MS) in gaps
    assert (
        WM + 5 * HOUR_MS + MINUTE_MS,
        WM + 5 * HOUR_MS + 30 * MINUTE_MS,
    ) in gaps
    assert (WM + 5 * HOUR_MS + 35 * MINUTE_MS, WM + 6 * HOUR_MS) in gaps
    assert len(gaps) == 4


def test_backfill_equals_full_rebuild(spark, sf_smoke):
    """Corrupt one day, repair it via backfill: every granularity's
    rollup must equal a clean full rebuild bit-for-bit, and serving
    agrees over ranges crossing the patched window."""
    from uwheel_datafusion_spark.functions.time import ts_range_pred

    ev = load_table(spark, sf_smoke, "events")
    day_s = to_epoch_ms(datetime(2024, 1, 10))
    day_e = day_s + 86_400_000
    in_day = ts_range_pred(ev, "ts", day_s, day_e)
    corrupted = ev.withColumn(
        "value", F.when(in_day, F.lit(0.0)).otherwise(F.col("value"))
    )
    idx = WheelIndex.build(corrupted, "ts", "value", WM, ADV, cache=False)
    repaired = idx.backfill(ev.filter(in_day), "ts", "value", day_s, day_e)
    clean = WheelIndex.build(ev, "ts", "value", WM, ADV, cache=False)
    for g in clean.rollups:
        a = sorted(tuple(r) for r in repaired.rollups[g].collect())
        b = sorted(tuple(r) for r in clean.rollups[g].collect())
        assert a == b, g
    assert repaired.stats.n_indexed_rows == clean.stats.n_indexed_rows
    s, e = day_s - 86_400_000, day_e + 86_400_000
    assert (
        repaired.to_driver_index().query_sum(s, e)
        == clean.to_driver_index().query_sum(s, e)
    )


def test_backfill_with_empty_patch_zeroes_window(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    day_s = to_epoch_ms(datetime(2024, 1, 10))
    day_e = day_s + 86_400_000
    idx = WheelIndex.build(ev, "ts", "value", WM, ADV, cache=False)
    erased = idx.backfill(
        ev.filter(F.lit(False)), "ts", "value", day_s, day_e
    )
    assert erased.to_driver_index().query_count(day_s, day_e) == 0
    # neighbors untouched
    assert erased.to_driver_index().query_count(
        day_s - 86_400_000, day_s
    ) == idx.to_driver_index().query_count(day_s - 86_400_000, day_s)


def test_backfill_contract_errors(spark, sf_smoke):
    import pytest as _pt

    ev = load_table(spark, sf_smoke, "events")
    idx = WheelIndex.build(ev, "ts", "value", WM, ADV, cache=False)
    day_s = to_epoch_ms(datetime(2024, 1, 10))
    with _pt.raises(ValueError, match="align"):
        idx.backfill(ev, "ts", "value", day_s + 1, day_s + 86_400_000)
    with _pt.raises(ValueError, match="horizon"):
        idx.backfill(ev, "ts", "value", WM - 86_400_000, day_s)
    with _pt.raises(ValueError, match="empty"):
        idx.backfill(ev, "ts", "value", day_s, day_s)


def test_backfill_on_seconds_wheel(spark, sf_smoke):
    """Regression: GRANULARITY_MS lacked 'second', so backfill() on an
    opt-in seconds wheel raised KeyError before computing its coarsest
    alignment. A seconds wheel must backfill like any other."""
    from uwheel_datafusion_spark.functions.time import ts_range_pred

    ev = load_table(spark, sf_smoke, "events")
    day_s = to_epoch_ms(datetime(2024, 1, 10))
    day_e = day_s + 86_400_000
    in_day = ts_range_pred(ev, "ts", day_s, day_e)
    corrupted = ev.withColumn(
        "value", F.when(in_day, F.lit(0.0)).otherwise(F.col("value"))
    )
    idx = WheelIndex.build(
        corrupted,
        "ts",
        "value",
        WM,
        ADV,
        granularities=("second", "minute", "hour", "day"),
        cache=False,
    )
    repaired = idx.backfill(ev.filter(in_day), "ts", "value", day_s, day_e)
    clean = WheelIndex.build(
        ev,
        "ts",
        "value",
        WM,
        ADV,
        granularities=("second", "minute", "hour", "day"),
        cache=False,
    )
    assert (
        repaired.to_driver_index().query_sum(day_s, day_e)
        == clean.to_driver_index().query_sum(day_s, day_e)
    )
