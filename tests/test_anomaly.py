"""Trailing z-score anomaly detection (operators/anomaly): the gate
is oracle-checked on fixture data (uniform — near-zero anomalies);
here we pin behavior on crafted series: a genuine spike is flagged,
steady series are not, zero-variance windows flag ANY deviation, and
the insufficient-history prefix is NULL."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators.anomaly import (
    densify_counts,
    trailing_zscore_flags,
)

SLOT = 1000
W = 10


def _flags(spark, counts, horizon_slots):
    df = spark.createDataFrame(counts, "bucket_ms long, cnt long")
    dense = densify_counts(df, 0, horizon_slots * SLOT, SLOT, spark=spark)
    rows = trailing_zscore_flags(dense, window_slots=W, k_sigma=3).collect()
    return {r["bucket_ms"] // SLOT: r["is_anomaly"] for r in rows}


def test_spike_flagged_steady_not(spark):
    # noisy-but-steady 10±1, then one slot at 100
    counts = [(i * SLOT, 10 + (i % 3) - 1) for i in range(20)]
    counts[15] = (15 * SLOT, 100)
    flags = _flags(spark, counts, 20)
    assert flags[15] is True
    assert flags[12] is False and flags[14] is False
    # first W slots: no full trailing window → NULL
    assert all(flags[i] is None for i in range(W))


def test_zero_variance_window(spark):
    # constant 5s: identical value not anomalous, any deviation is
    counts = [(i * SLOT, 5) for i in range(15)]
    counts[12] = (12 * SLOT, 6)
    flags = _flags(spark, counts, 15)
    assert flags[11] is False  # 5 vs σ=0 and equal mean
    assert flags[12] is True   # 6 vs σ=0
    # slot 13's window now contains the 6 → variance > 0 again
    assert flags[13] in (False, True)


def test_missing_slots_count_as_zero(spark):
    # only even slots occupied; odd slots are ZERO counts, which
    # drags the trailing mean down — and a zero slot right after a
    # dense prefix is itself judged against that prefix
    counts = [(i * SLOT, 10) for i in range(0, 20, 2)]
    flags = _flags(spark, counts, 20)
    assert set(flags) == set(range(20))  # densified: every slot judged
    assert flags[W] is not None


def test_keyed_spike_isolated_to_its_series(spark):
    """A spike in series A must flag A's slot and leave series B's
    identical-time slot unflagged (the partitioned window never mixes
    series)."""
    from uwheel_datafusion_spark.operators.anomaly import (
        densify_keyed_counts,
        keyed_trailing_zscore_flags,
    )

    rows = []
    for i in range(20):
        rows.append(("a", i * SLOT, 10 + (i % 3) - 1))
        rows.append(("b", i * SLOT, 10 + ((i + 1) % 3) - 1))
    rows[2 * 15] = ("a", 15 * SLOT, 100)  # series a, slot 15
    df = spark.createDataFrame(rows, "key string, bucket_ms long, cnt long")
    dense = densify_keyed_counts(df, 0, 20 * SLOT, SLOT)
    flags = {
        (r["key"], r["bucket_ms"] // SLOT): r["is_anomaly"]
        for r in keyed_trailing_zscore_flags(
            dense, window_slots=W, k_sigma=3
        ).collect()
    }
    assert flags[("a", 15)] is True
    assert flags[("b", 15)] is False
