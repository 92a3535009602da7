"""Time-domain functions.

The wheel's time domain is integer epoch **milliseconds**, UTC — the
reference converts parquet µs timestamps to ms on ingest
(/root/reference/src/main.rs:133-135) and builds query ranges as ms
pairs (/root/reference/src/main.rs:171-174). All conversions here stay
JVM-side (built-in functions, codegen'd) — no Python UDFs.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

SECOND_MS = 1_000
MINUTE_MS = 60_000
HOUR_MS = 3_600_000
DAY_MS = 86_400_000
WEEK_MS = 604_800_000  # 7-day epoch-aligned slots (µWheel's week wheel)

#: epoch (1970-01-01) is a Thursday; the first Monday is 1970-01-05.
#: Shifting epoch-ms by this before flooring to WEEK_MS yields the
#: Monday-anchored weeks of SQL date_trunc('week', ...).
MONDAY_EPOCH_OFFSET_MS = 4 * DAY_MS

#: granularity name → slot width in ms (coarse→fine order matters for
#: the greedy range decomposition in plans.range_plan)
GRANULARITY_MS = {
    "week": WEEK_MS,
    "day": DAY_MS,
    "hour": HOUR_MS,
    "minute": MINUTE_MS,
    "second": SECOND_MS,
}


def ts_to_ms(col: Column | str) -> Column:
    """timestamp column → epoch milliseconds (truncating, like µs→ms at
    /root/reference/src/main.rs:133-135; floor-div on µs longs is exact
    below 2^53). TIMESTAMP_NTZ (how Spark reads tz-less parquet) is
    cast first — value-preserving under the UTC session timezone, and
    exactly DuckDB's naive-UTC reading of the same file."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.unix_micros(c.cast("timestamp")) / 1000).cast("long")


def bucket_ms(ms_col: Column, granularity_ms: int) -> Column:
    """epoch-ms column → its UTC-aligned slot start for a granularity."""
    return (F.floor(ms_col / granularity_ms) * granularity_ms).cast("long")


def to_epoch_ms(dt: datetime) -> int:
    """Python datetime → epoch ms (naive datetimes are taken as UTC,
    matching the reference's ``naive_utc`` handling,
    /root/reference/src/main.rs:242-251)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def ms_to_ts_literal(ms: int) -> str:
    """epoch ms → naive-UTC SQL timestamp literal ('2024-01-01 00:00:00')
    — the string form the reference interpolates into SQL
    (/root/reference/src/main.rs:242-258)."""
    dt = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S") + (
        f".{dt.microsecond:06d}" if dt.microsecond else ""
    )


def ts_range_pred(df, ts_col: str, start_ms: int, end_ms: int) -> Column:
    """Pushdown-friendly ``ts ∈ [start_ms, end_ms)`` predicate that
    matches the column's timestamp flavor (TIMESTAMP vs TIMESTAMP_NTZ —
    a literal of the wrong flavor fails analysis; a cast on the column
    would block parquet pushdown)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        lo = F.to_timestamp_ntz(F.lit(ms_to_ts_literal(start_ms)))
        hi = F.to_timestamp_ntz(F.lit(ms_to_ts_literal(end_ms)))
    else:
        lo = F.timestamp_millis(F.lit(start_ms))
        hi = F.timestamp_millis(F.lit(end_ms))
    return (F.col(ts_col) >= lo) & (F.col(ts_col) < hi)


def ensure_event_time(df, ts_col: str):
    """Return ``df`` with ``ts_col`` usable as a streaming event-time
    column. Structured Streaming's ``withWatermark`` requires TIMESTAMP
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on TIMESTAMP_NTZ), so NTZ —
    how Spark reads tz-less parquet — is cast; value-preserving under
    the UTC session timezone the repo sessions pin."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def floor_ms(ms: int, granularity_ms: int) -> int:
    return (ms // granularity_ms) * granularity_ms


def ceil_ms(ms: int, granularity_ms: int) -> int:
    return -((-ms) // granularity_ms) * granularity_ms
