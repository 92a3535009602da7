"""Skew-resilient aggregation: salted two-phase group-by.

At 100 TB a `groupBy(key)` over a power-law key (a hot user, a hot
event type) funnels the hot key's entire volume through one reduce
task. The standard fix is salting: append a fan-out term to the key,
aggregate partials per (key, salt), then re-aggregate per key. Because
every gated measure is a monoid over scaled longs (functions.quant),
partial-then-final is *exactly* equal to single-phase — the same
combine-invariance the wheel's rollup cascade relies on (SURVEY §1.3),
so the plain GROUP BY is a valid oracle.

The salt must be deterministic only for reproducible *partials*; the
final result is salt-invariant by associativity. We derive it from a
unique row key with the same portable mix as operators.sampling, so
even intermediate stages are engine-reproducible.

AQE's skew-join/partition-coalescing handles many cases at runtime;
explicit salting is the declarative fallback when a single *key* (not
partition) is hot, which AQE cannot split.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import micros_to_value, value_to_micros
from uwheel_datafusion_spark.operators.sampling import hash_bucket_sql


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT per ``keys``: phase 1 shuffles on
    (keys, salt) — the hot key fans out over ``n_salts`` reduce tasks —
    phase 2 merges the ≤ n_salts partial rows per key (tiny shuffle).
    Output: keys + ``sum_value`` (exact, lowered once) + ``cnt``."""
    salt = F.expr(hash_bucket_sql(salt_key, n_salts)).alias("_salt")
    partial = (
        df.select(*keys, salt, value_to_micros(value_col).alias("_vm"))
        .groupBy(*keys, "_salt")
        .agg(F.sum("_vm").alias("_sum_micros"), F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_sum_micros").alias("_sum_micros"),
            F.sum("_cnt").alias("cnt"),
        )
        .select(
            *keys,
            micros_to_value(F.col("_sum_micros")).alias("sum_value"),
            "cnt",
        )
    )


def salted_sum_count_oracle(
    table: str, keys: Sequence[str], value_col: str
) -> str:
    """Plain single-phase GROUP BY — equal by associativity."""
    from uwheel_datafusion_spark.gate import _s  # late import, no cycle at module load

    key_list = ", ".join(keys)
    return f"""
        SELECT {key_list},
               {_s(value_col)} AS sum_value,
               COUNT(*) AS cnt
        FROM {table}
        GROUP BY {key_list}
    """
