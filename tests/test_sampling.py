"""Sampling / split / quantile operator properties beyond the oracle
gate: determinism across partitionings, approx-vs-exact closeness, and
map-only plan shape."""

from pyspark.sql import functions as F

from uwheel_datafusion_spark.operators import sampling as sp
from uwheel_datafusion_spark.sources.registry import load_table


def test_hash_sample_deterministic_across_partitionings(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    a = sorted(
        r.doc_id for r in sp.hash_sample(docs, "doc_id", 10).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in sp.hash_sample(docs.repartition(7, "lang"), "doc_id", 10)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0
    # a hash sample should land near its nominal rate
    n = docs.count()
    assert 0.05 * n < len(a) < 0.15 * n


def test_split_is_total_and_disjoint(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    counts = {
        r.split: r.n_docs for r in sp.train_val_test_summary(docs).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # 80/10/10 within slack
    n = docs.count()
    assert counts["train"] > 0.7 * n and counts["test"] < 0.2 * n


def test_approx_percentile_tracks_exact_deciles(spark, sf_correctness):
    orders = load_table(spark, sf_correctness, "orders")
    exact = {
        int(r.decile): r.decile_value for r in sp.exact_deciles(orders).collect()
    }
    probs = [k / 10 for k in range(1, 11)]
    approx = orders.agg(
        F.percentile_approx("o_totalprice", probs, 10_000).alias("q")
    ).first()["q"]
    lo, hi = (
        orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    )
    span = hi - lo
    for k, appr in zip(range(1, 11), approx):
        # distributed scale path must stay within 2% of the value range
        assert abs(appr - exact[k]) < 0.02 * span, (k, appr, exact[k])


def test_histogram_is_single_narrow_shuffle(spark, sf_correctness):
    df = sp.value_histogram(load_table(spark, sf_correctness, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ShuffleExchange") + plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_training_shard_sink_partitions_and_prunes(spark, sf_correctness, tmp_path):
    """The sink writes ≤ n_shards files per split partition, and a
    reader filtering one split prunes the others at planning time
    (PartitionFilters on the scan — directory-level skip at 100 TB)."""
    from uwheel_datafusion_spark.gate import REGISTRY
    from uwheel_datafusion_spark.sources import sinks

    chunks = REGISTRY["pipeline_training_corpus"].fn(spark, sf_correctness)
    out = str(tmp_path / "shards")
    sinks.write_training_shards(chunks, out, n_shards=4)

    for split in ("train", "val", "test"):
        files = sinks.shard_files(out, split)
        assert 1 <= len(files) <= 4, (split, files)

    train = sinks.read_split(spark, out, "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan
    # round trip: written rows == pipeline rows, per split
    expected = {
        r.split: r.n
        for r in chunks.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert train.count() == expected["train"]


def test_hash_bucket_parity_spark_vs_duckdb(spark):
    """The portable mix must produce the IDENTICAL bucket in Spark SQL
    and DuckDB for positive and negative keys — that's what makes
    sampled/split gate queries oracle-checkable at all."""
    import duckdb

    keys = [0, 1, 2, 999, 10**12, 7, -1, -999, -(10**12), 2**52]
    expr = sp.hash_bucket_sql("k", 100)
    sdf = spark.createDataFrame([(k,) for k in keys], "k bigint")
    spark_buckets = {
        r.k: r.b for r in sdf.selectExpr("k", f"{expr} AS b").collect()
    }
    duck = duckdb.sql(
        f"SELECT k, {expr} AS b FROM (SELECT unnest({keys!r}) AS k)"
    ).fetchall()
    duck_buckets = {k: b for k, b in duck}
    assert spark_buckets == duck_buckets
    assert all(0 <= b < 100 for b in spark_buckets.values())


def test_stratified_sample_exact_counts_and_stability(spark, sf_smoke):
    """Per-stratum count == min(n, |stratum|); the selected set is
    invariant under repartitioning (deterministic hash order)."""
    from pyspark.sql import functions as F

    from uwheel_datafusion_spark.operators.sampling import stratified_sample
    from uwheel_datafusion_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n = 7
    sample = stratified_sample(docs, "lang", "doc_id", n)
    got = {
        r["lang"]: r["c"]
        for r in sample.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    full = {
        r["lang"]: r["c"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert got == {k: min(n, v) for k, v in full.items()}

    ids1 = sorted(r["doc_id"] for r in sample.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), "lang", "doc_id", n)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_heavy_hitters_plan_uses_window_group_limit(spark, sf_smoke):
    """Per-day top-3 users must plan as WindowGroupLimit (map-side
    per-group limit before the window exchange) — exchanged rows are
    bounded by days x k, not users x days."""
    import uwheel_datafusion_spark.gate as g

    df = g.REGISTRY["heavy_hitters_top3_users_per_day"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
