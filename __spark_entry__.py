"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``uwheel_datafusion_spark.gate``; this file is
a thin stable adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uwheel_datafusion_spark import gate as _gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    End-to-end E1+E2: build the wheel index over `events`, answer a
    multi-granularity [start, end) range aggregate from it.
    """
    return _gate.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _gate.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (keys without one get a weaker
    rows-only check — only genuinely non-SQL-expressible ops)."""
    return _gate.oracle_sql()
