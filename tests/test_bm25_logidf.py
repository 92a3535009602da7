"""The fixed-point log2 idf (round 10, ADVICE r9 #4): monotonicity,
accuracy, and cross-engine bit-equality of the pure-integer kernel —
property-level, driver-side replicas of the exact SQL expressions.
"""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uwheel_datafusion_spark.operators.textops import (
    BM25_LOG2_FRACBITS,
    KEYWORD_IDF_SCALE,
)

S = BM25_LOG2_FRACBITS


def w_py(n_docs: int, df: int) -> int:
    """Python replica of the shared SQL expression."""
    q = ((2 * n_docs + 2) * (1 << S)) // (2 * df + 1)
    p = q.bit_length() - 1
    return (p - S) * KEYWORD_IDF_SCALE + (
        (q - (1 << p)) * KEYWORD_IDF_SCALE
    ) // (1 << p)


@given(
    n=st.integers(min_value=1, max_value=10**9),
    df=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_log2_fixedpoint_tracks_ln_and_is_positive(n, df):
    df = min(df, n)  # df ≤ N by construction
    w = w_py(n, df)
    true_log2 = math.log2((2 * n + 2) / (2 * df + 1))
    # piecewise-linear mantissa: ≤ 0.0861 bits + 2/SCALE quantization
    assert abs(w / KEYWORD_IDF_SCALE - true_log2) <= 0.0861 + 2e-4
    # (2N+2)/(2df+1) > 1 for df ≤ N, so the weight never goes negative
    # (it floors to 0 as df → N, exactly like Lucene's idf → 0)
    assert w >= 0


def test_log2_fixedpoint_monotone_decreasing_in_df():
    n = 1_000_000
    prev = None
    for df in range(1, 5000):
        w = w_py(n, df)
        if prev is not None:
            assert w <= prev, (df, w, prev)
        prev = w
    # and strictly drops across octaves
    assert w_py(n, 1) > w_py(n, 10) > w_py(n, 100) > w_py(n, n)


def test_duckdb_replays_python_kernel_bitwise():
    """The DuckDB rendering of the same expression (as used in the
    oracle) matches the Python replica exactly on a grid."""
    con = duckdb.connect()
    rows = [(n, df) for n in (1, 7, 100, 10**6, 10**9)
            for df in (1, 2, 3, 50, 999)]
    rows = [(n, df) for n, df in rows if df <= n]
    con.execute(
        "CREATE TABLE g(n_docs BIGINT, df BIGINT)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?)", rows)
    got = con.execute(
        f"""
        SELECT n_docs, df, (
          SELECT CAST(((length(bin(q)) - 1) - {S}) * {KEYWORD_IDF_SCALE}
               + ((q - (CAST(1 AS BIGINT) << (length(bin(q)) - 1)))
                  * {KEYWORD_IDF_SCALE})
                 // (CAST(1 AS BIGINT) << (length(bin(q)) - 1)) AS BIGINT)
          FROM (SELECT CAST(((2 * n_docs + 2) * {1 << S})
                            // (2 * df + 1) AS BIGINT) AS q)
        ) AS w
        FROM g ORDER BY n_docs, df
        """
    ).fetchall()
    for n, df, w in got:
        assert w == w_py(n, df), (n, df, w, w_py(n, df))
