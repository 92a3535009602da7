"""Source connectors beyond parquet (SURVEY §2.1 S6 — DataFusion links
csv/json/avro sources the reference never exercises; Spark gives
csv/json/orc/text natively). Round-trip: parquet table → write fmt →
read_source → identical rows."""

import pytest
from pyspark.sql import functions as F

from uwheel_datafusion_spark.sources.registry import load_table, read_source


@pytest.fixture(scope="module")
def orders(spark, sf_smoke):
    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, orders, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = orders.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
        back = read_source(
            spark, "csv", path, header="true", inferSchema="true"
        )
    else:
        getattr(writer, fmt)(path)
        back = read_source(spark, fmt, path)
    back = back.select(*orders.columns)  # json is schema-on-read, order varies
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_text_source(spark, tmp_path):
    path = str(tmp_path / "txt")
    spark.range(3).select(
        F.concat(F.lit("line-"), F.col("id")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)
    got = sorted(r.value for r in read_source(spark, "text", path).collect())
    assert got == ["line-0", "line-1", "line-2"]


def test_unsupported_formats_rejected(spark):
    with pytest.raises(NotImplementedError):
        read_source(spark, "delta", "/tmp/x")
    with pytest.raises(ValueError):
        read_source(spark, "avro", "/tmp/x")
