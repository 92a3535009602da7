"""The local driver-replica must be type-faithful: DuckDB widening an
integer aggregate to HUGEINT (decimal128) stringifies identically to a
Spark long, so a str()-based compare passes while the driver's
value-hash fails. Regression for the r04 `split_train_val_test` miss:
the pre-fix oracle (bare SUM(n_chars)) must now FAIL compare() with a
type-drift message, and the fixed oracle must pass."""

from tests.driver_sim import compare, duck_connection
from uwheel_datafusion_spark.operators import sampling as sp
from uwheel_datafusion_spark.sources.registry import load_table


def _spark_side(spark, sf_dir):
    return sp.train_val_test_summary(load_table(spark, sf_dir, "documents"))


def test_bare_integer_sum_oracle_is_rejected(spark, sf_correctness):
    """The exact pre-fix oracle text: DuckDB types SUM(BIGINT) as
    HUGEINT -> arrow decimal128(38,0), which must not canonicalize to
    int64."""
    con = duck_connection(sf_correctness)
    from uwheel_datafusion_spark.operators.sampling import split_column_sql

    pre_fix = f"""
        SELECT {split_column_sql('doc_id')} AS split,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS sum_chars
        FROM documents
        GROUP BY 1
    """
    ok, msg = compare(_spark_side(spark, sf_correctness), con, pre_fix)
    assert not ok and "type drift" in msg and "sum_chars" in msg, msg


def test_cast_sum_oracle_passes(spark, sf_correctness):
    con = duck_connection(sf_correctness)
    ok, msg = compare(
        _spark_side(spark, sf_correctness),
        con,
        sp.train_val_test_summary_oracle(),
    )
    assert ok, msg


def test_array_final_projection_is_rejected(spark, sf_correctness):
    """The r06 `embedding_int8_quantize` failure mode: the REAL driver
    canonicalizes with pandas sort_values, which dies on list cells
    (`TypeError: unhashable type: 'list'`), while the replica's
    str()-sort sailed through. An array-typed final projection must
    now fail compare() locally, BEFORE it fails in CORRECTNESS."""
    from uwheel_datafusion_spark.operators import similarity as sim

    con = duck_connection(sf_correctness)
    arr_df = sim.quantize_int8(load_table(spark, sf_correctness, "embeddings"))
    ok, msg = compare(arr_df, con, sim.quantize_int8_oracle())
    assert not ok and "driver-unhashable" in msg and "qvec8" in msg, msg


def test_packed_int8_projection_passes(spark, sf_correctness):
    """The fixed gate projection (CSV-packed codes) hash-matches."""
    from uwheel_datafusion_spark.operators import similarity as sim

    con = duck_connection(sf_correctness)
    ok, msg = compare(
        sim.quantize_int8_packed(load_table(spark, sf_correctness, "embeddings")),
        con,
        sim.quantize_int8_packed_oracle(),
    )
    assert ok, msg
