"""Exact-sum quantization policy (SURVEY §5 float policy).

f64 addition is non-associative, so a distributed SUM over doubles is
not bit-reproducible across partitionings or engines — the reference
has the same caveat between its wheel path and its scan path (SURVEY
§4.2). For every correctness-gated aggregate we therefore sum **scaled
64-bit integers**: ``round(value * 1e6) :: bigint``. Integer addition
is associative, so

  - rollup-then-combine == direct sum, *exactly* (the wheel cascade
    invariant A4 holds bit-for-bit), and
  - Spark and the DuckDB oracle agree bit-for-bit, and the final
    ``int64 → double`` conversion plus division are single IEEE ops
    that both engines perform identically.

Overflow bound: |Σ round(v·1e6)| < 2^63 ⇒ Σ|v| < ~9.2e12. Test data
sums are ≤ ~1e11; at true 100 TB scale the distributed path switches
to DECIMAL(38,6) sums (also exact, Spark-native) — see WheelIndex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000  # 6 decimal digits


def value_to_micros(col: Column | str) -> Column:
    """double value → scaled long ('micro-units')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * QUANT_SCALE).cast("long")


def micros_to_value(col: Column | str) -> Column:
    """scaled-long sum → double. int64→double then one division; both
    IEEE-deterministic, so Spark and DuckDB produce the identical
    double."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("double") / QUANT_SCALE).cast("double")


def py_value_to_micros(x: float) -> int:
    """Driver/executor-Python twin of :func:`value_to_micros`: round
    HALF-AWAY-FROM-ZERO like Spark ``F.round`` and DuckDB ``round()``.
    Python's builtin ``round`` is banker's (half-to-even), so using it
    in the streaming stitch partials made any sample whose v·1e6 lands
    exactly on .5 differ by 1 micro from the batch rollup row —
    breaking the bit-identical streaming/batch parity contract
    (ADVICE r06 #1)."""
    import math

    scaled = x * QUANT_SCALE
    if scaled >= 0:
        return int(math.floor(scaled + 0.5))
    return int(math.ceil(scaled - 0.5))


def sql_value_to_micros(expr: str) -> str:
    """DuckDB-side twin of :func:`value_to_micros` (ANSI-ish SQL)."""
    return f"CAST(round(({expr}) * 1000000) AS BIGINT)"


def sql_micros_to_value(expr: str) -> str:
    """DuckDB-side twin of :func:`micros_to_value`."""
    return f"(CAST(({expr}) AS DOUBLE) / 1000000)"
