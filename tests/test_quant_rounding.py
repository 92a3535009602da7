"""The quantization rounding convention is HALF-AWAY-FROM-ZERO in all
three places values become micros: Spark `F.round` (batch builds),
DuckDB `round()` (oracles), and executor/driver Python
(`py_value_to_micros` — streaming stitch partials, sessionizer, test
models). Python's builtin `round` is banker's (half-to-even) and must
never be used for quantization: round(0.5)==0 but round(1.5)==2, so a
sample whose v·1e6 lands exactly on .5 would make a streaming partial
differ by 1 micro from the batch rollup row (ADVICE r06 #1)."""

import duckdb
from pyspark.sql import functions as F

from uwheel_datafusion_spark.functions.quant import (
    py_value_to_micros,
    sql_value_to_micros,
    value_to_micros,
)

# v·1e6 lands exactly on .5 for these (representable in binary:
# x.5 = (2k+1)/2); banker's rounding gets every other one wrong
HALF_CASES = [
    (0.5e-6, 1),
    (1.5e-6, 2),
    (2.5e-6, 3),
    (-0.5e-6, -1),
    (-2.5e-6, -3),
    (12.5e-6, 13),
    (3.0, 3_000_000),
]


def test_python_helper_is_half_away_from_zero():
    for v, want in HALF_CASES:
        assert py_value_to_micros(v) == want, (v, want)
        # and the builtin would disagree on the half-to-even cases
    assert int(round(0.5e-6 * 1e6)) == 0  # the bug this guards against


def test_spark_and_duckdb_agree_with_python(spark):
    vals = [v for v, _ in HALF_CASES]
    got_spark = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(value_to_micros("v"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.sql(f"SELECT {sql_value_to_micros(repr(v))}").fetchone()[0]
        for v in vals
    ]
    want = [w for _, w in HALF_CASES]
    assert got_spark == want, got_spark
    assert got_duck == want, got_duck
