"""Physical-plan regression tests — the audits in PLANS.md, enforced.

These guard the scale properties that correctness tests can't see:
pushdown reaching the scan, broadcasts staying broadcasts, map-only
operators staying shuffle-free. A regression here is invisible at
sf0.01 and catastrophic at 100 TB.
"""

import pytest

from uwheel_datafusion_spark import WheelIndex
from uwheel_datafusion_spark import gate as g
from uwheel_datafusion_spark.sources.registry import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pruned_build_pushes_watermark_to_scan(spark, sf_smoke):
    """stats_mode='pruned' must reach parquet row-group stats with the
    NTZ watermark range (PLANS.md anti-pattern guard)."""
    df = load_table(spark, sf_smoke, "events")
    from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS

    idx = WheelIndex.build(
        df, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS, cache=False,
        stats_mode="pruned",
    )
    plan = _executed_plan(idx.rollups["minute"])
    assert "GreaterThanOrEqual(ts,2024-01-01T00:00)" in plan
    assert "LessThan(ts,2024-02-01T00:00)" in plan
    # column pruning: only the two needed columns are read
    assert "ReadSchema: struct<ts:timestamp_ntz,value:double>" in plan


def test_star_join_broadcasts_dimensions(spark, sf_correctness):
    plan = _executed_plan(g.REGISTRY["region_revenue_join"].fn(spark, sf_correctness))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_semi_anti_joins_broadcast_with_pushed_filter(spark, sf_correctness):
    semi = _executed_plan(
        g.REGISTRY["semi_join_active_customers"].fn(spark, sf_correctness)
    )
    assert "BroadcastHashJoin" in semi and "LeftSemi" in semi
    assert "GreaterThan(o_totalprice,300000" in semi  # pushed to scan
    anti = _executed_plan(
        g.REGISTRY["anti_join_customers_without_urgent_orders"].fn(
            spark, sf_correctness
        )
    )
    assert "BroadcastHashJoin" in anti and "LeftAnti" in anti


def test_text_profile_is_map_only(spark, sf_correctness):
    """No shuffle: the profile is a projection (scales linearly)."""
    for name in ("text_profile", "text_token_stats"):
        plan = _executed_plan(g.REGISTRY[name].fn(spark, sf_correctness))
        assert "Exchange" not in plan, name


def test_multimodal_stages_are_map_only(spark, sf_correctness):
    for name in (
        "multimodal_decode_stub",
        "multimodal_resize_stub",
        "multimodal_frame_sample",
        "multimodal_feature_extract",
    ):
        plan = _executed_plan(g.REGISTRY[name].fn(spark, sf_correctness))
        assert "Exchange" not in plan, name


def test_hybrid_edges_push_ntz_range(spark, sf_correctness):
    plan = _executed_plan(
        g.REGISTRY["wheel_range_unaligned_hybrid"].fn(spark, sf_correctness)
    )
    # edge scans carry a tight NTZ range filter (sliver reads)
    assert "GreaterThanOrEqual(ts,2024-" in plan and "LessThan(ts,2024-" in plan


def test_sliding_window_single_shuffle(spark, sf_correctness):
    plan = _executed_plan(
        g.REGISTRY["sliding_window_1h_15m"].fn(spark, sf_correctness)
    )
    # Expand (window replication) + exactly one hash-partitioning shuffle
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_empty_fact_table_builds_empty_index(spark):
    """Edge hardening: zero input rows → empty rollups, None lowerings."""
    from uwheel_datafusion_spark.gate import EVENTS_ADV_MS, EVENTS_WM_MS

    empty = spark.createDataFrame([], "ts timestamp, value double")
    idx = WheelIndex.build(empty, "ts", "value", EVENTS_WM_MS, EVENTS_ADV_MS)
    assert idx.stats.n_input_rows == 0
    assert idx.stats.slot_counts["minute"] == 0
    di = idx.to_driver_index()
    assert di.query_sum(EVENTS_WM_MS, EVENTS_ADV_MS) is None
    assert di.query_count(EVENTS_WM_MS, EVENTS_ADV_MS) == 0
    row = idx.range_agg_df(EVENTS_WM_MS, EVENTS_ADV_MS).first()
    assert row["sum_value"] is None and (row["cnt"] in (0, None))


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    """Bucketing both sides on the join key co-locates them: the join
    runs with ZERO exchanges (PLANS.md's co-located join strategy — at
    100 TB this is the difference between a full-table shuffle and
    none). Uses the built-in catalog, no Hive required."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_smoke, "customer").select("c_custkey", "c_mktsegment")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("b_customer")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at fixture scale the planner would rightly broadcast the tiny
        # dim; disable that to exercise the big-joins-big bucket path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it still returns the right rows
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_asof_join_single_shuffle_and_left_variant(spark, sf_correctness):
    """The as-of join is one shuffle on the key (union + window carry),
    not a per-row range probe; how='left' keeps unmatched left rows."""
    from uwheel_datafusion_spark.operators import asof as a

    ev = load_table(spark, sf_correctness, "events")
    inner = g.REGISTRY["asof_join_purchase_to_click"].fn(spark, sf_correctness)
    plan = _executed_plan(inner)
    assert plan.count("Exchange hashpartitioning") == 1

    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    left = a.asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        payload={"ts": "click_ts"}, how="left",
    )
    n_left, n_inner = left.count(), inner.count()
    assert n_left == purchases.count() >= n_inner


def _formatted_plan(df) -> str:
    """explain('formatted') text — unlike executedPlan().toString(),
    it does not truncate the PushedFilters list."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_full_predicate_pushdown(spark, sf_correctness):
    """TPC-H q6: every predicate reaches the parquet scan and only the
    4 referenced columns are read — the shape where row-group pruning
    carries a 100 TB scan."""
    plan = _formatted_plan(
        g.REGISTRY["tpch_q6_forecast_revenue"].fn(spark, sf_correctness)
    )
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, pushed
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    )


def test_q5_broadcasts_all_dimensions(spark, sf_correctness):
    """TPC-H q5: customer/supplier/nation/region must broadcast; no
    cartesian products from the compound join condition."""
    plan = _executed_plan(
        g.REGISTRY["tpch_q5_local_supplier_volume"].fn(spark, sf_correctness)
    )
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed to scan


def test_q13_keeps_outer_join(spark, sf_correctness):
    """TPC-H q13: the priority predicate is a join residual, not a
    WHERE — Catalyst must not rewrite the outer join to inner."""
    plan = _executed_plan(
        g.REGISTRY["tpch_q13_customer_order_counts"].fn(spark, sf_correctness)
    )
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan  # pushed on orders side


def test_running_total_single_window_shuffle(spark, sf_correctness):
    """Both window functions (running sum, lag) share one hash
    partitioning on o_custkey — a single shuffle, no extra sort."""
    plan = _executed_plan(
        g.REGISTRY["window_customer_running_total"].fn(spark, sf_correctness)
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("WindowExec") <= 1 or plan.count("Window") <= 2


def test_salted_agg_two_phase_fanout(spark, sf_correctness):
    """Salted aggregation: phase 1 shuffles on (key, salt) — the hot
    key spreads over 16 reduce tasks — phase 2 merges per key."""
    plan = _executed_plan(
        g.REGISTRY["skew_salted_events_by_type"].fn(spark, sf_correctness)
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "_salt" in plan


def test_range_join_is_equi_not_nested_loop(spark, sf_correctness):
    """The binned range join must plan as hash equi-joins — a
    BroadcastNestedLoopJoin/CartesianProduct here is the O(n²) failure
    the binning exists to prevent."""
    plan = _executed_plan(
        g.REGISTRY["range_join_purchase_click_5m"].fn(spark, sf_correctness)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_argmax_is_single_hash_aggregate_no_window(spark, sf_correctness):
    """max_by must stay a two-phase aggregate: partial_max_by merges
    map-side so the shuffle carries one row per (task, customer), and
    there is exactly ONE exchange. A Window here means the plan
    silently degraded to the row_number()=1 idiom, which shuffles
    every input row. (Spark picks SortAggregate — max_by's buffer
    holds a string, so no hash aggregate — but the partial/final
    split is what scales.)"""
    plan = _executed_plan(
        g.REGISTRY["argmax_latest_order_per_customer"].fn(spark, sf_correctness)
    )
    assert "partial_max_by" in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_grouping_sets_expand_single_shuffle(spark, sf_correctness):
    """GROUPING SETS expands rows map-side (Expand) and aggregates with
    ONE shuffle — not one scan+shuffle per set."""
    plan = _executed_plan(
        g.REGISTRY["grouping_sets_orders_status_priority"].fn(spark, sf_correctness)
    )
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_correctness, tmp_path):
    """A fact table laid out with partitionBy(ship_year) must get
    DYNAMIC partition pruning when joined to a filtered dim: the scan
    waits for the broadcast result and reads only the matching
    partitions. At 100 TB this is the difference between scanning one
    year and scanning the whole table."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_correctness, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(tmp_path / "lineitem_by_year")
    li.write.partitionBy("ship_year").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    # the filter is on a NON-join column, so the pruning value is only
    # known at runtime from the broadcast — a literal filter on yr
    # would be constant-propagated into a static partition filter
    # instead (also fine, also tested below)
    dim = spark.createDataFrame(
        [(y, "keep" if y == 1996 else "drop") for y in range(1995, 2002)],
        "yr int, tag string",
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, fact.ship_year == dim.yr).agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()

    lit_dim = spark.range(1995, 2002).select(
        F.col("id").cast("int").alias("yr")
    ).filter(F.col("yr") == 1996)
    lit_plan = (
        fact.join(lit_dim, fact.ship_year == lit_dim.yr)
        .agg(F.sum("l_quantity").alias("qty"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [(ship_year" in lit_plan  # static pruning


def test_no_accidental_cartesian_or_nested_loop_joins(spark, sf_correctness):
    """Fleet-wide audit: across EVERY gated query plan, the only
    nested-loop/cartesian joins allowed are the three deliberate
    brute-force baselines (each with a documented sub-quadratic scale
    path: percentile_approx, LSH, IVF). A new query accidentally
    planning a cartesian join fails here before it fails at 100 TB."""
    allowed_bnlj = {
        "quantiles_order_value_deciles",   # broadcast decile thresholds
        "similarity_cosine_pair_dedup",    # exact baseline for LSH
        "similarity_knn_brute_force",      # exact baseline for IVF
        "similarity_knn_int8",             # same shape on int8 codes:
                                           # broadcast of |query_ids|
                                           # rows vs one corpus scan —
                                           # linear, not quadratic
        "similarity_knn_pq_adc",           # ADC: broadcast of the
                                           # |query_ids| LUT frame vs
                                           # one corpus CODES scan —
                                           # same linear shape as int8
        "similarity_ann_pq_rotated",       # rotated ADC: the same
                                           # broadcast-LUT-vs-codes
                                           # scan shape (linear)
        "similarity_knn_rp",               # JL-projected exact search:
                                           # broadcast of |query_ids|
                                           # projected rows vs one scan
                                           # of the 16-wide sketch —
                                           # the same linear brute-
                                           # force-baseline shape
        "tpch_q11_important_part_value",   # 1-row broadcast threshold
                                           # (crossJoin of a scalar agg —
                                           # benign at any scale)
        "heavy_hitters_mg_verified_range", # 1-row broadcasts of the MG
                                           # total-bound / n_range
                                           # scalars — same benign shape
                                           # as q11's threshold
        "text_keyword_search",             # N rides the plan as a 1-row
                                           # cross-joined count into the
                                           # |terms|-row idf frame (the
                                           # r8 "fold docs.count() into
                                           # the aggregate" fix) — q11's
                                           # benign scalar shape
        "text_keyword_bm25",               # same 1-row (N, total_dl)
                                           # scalar cross join
        "text_keyword_bm25_log",           # same 1-row (N, total_dl)
                                           # scalar cross join (log-idf
                                           # variant, identical shape)
        "retrieval_hybrid_rrf",            # inherits keyword_bm25's
                                           # scalar cross join; the RRF
                                           # fusion itself is a full
                                           # outer join of two ≤20-row
                                           # top-k frames
        "similarity_ann_binary_hamming",   # binary candidate gen: the
                                           # same linear broadcast-of-
                                           # |query_ids|-vs-one-scan
                                           # shape as knn_brute_force
                                           # (the scan reads 2 packed
                                           # words per row, 32× less)
        "similarity_hard_negatives",       # broadcast anchors vs one
                                           # corpus scan; the label-
                                           # mismatch predicate is part
                                           # of the join condition —
                                           # linear, not quadratic
        "similarity_knn_truncated_mrl",    # knn_brute_force over the
                                           # 16-dim slice — same linear
                                           # baseline shape
        "similarity_recall_eval",          # contains knn_brute_force
                                           # as its exact-truth side —
                                           # same linear baseline shape
        "text_bigram_lm_surprise",         # |V| rides the plan as a
                                           # 1-row cross-joined scalar
                                           # (q11's benign shape); the
                                           # count joins are equi-joins
        "text_lm_perplexity_select",       # composes the bigram LM —
                                           # same 1-row |V| scalar; the
                                           # selection itself is
                                           # equi-join + WindowGroupLimit
        "similarity_index_stats",          # (total, n_cells) rides as
                                           # a 1-row broadcast cross
                                           # join — q11's benign shape
        # NOTE: wheel_range_batch_serving was briefly allowlisted here;
        # its runs-containment join is now a block-id broadcast HASH
        # join (range_agg_batch_df), so the audit covers it again.
    }
    flagged = {}
    for name, gq in sorted(g.REGISTRY.items()):
        plan = _executed_plan(gq.fn(spark, sf_correctness))
        marks = [
            m
            for m, op in (
                ("cartesian", "CartesianProduct"),
                ("bnlj", "BroadcastNestedLoopJoin"),
            )
            if op in plan
        ]
        if marks:
            flagged[name] = marks
    assert set(flagged) <= allowed_bnlj, flagged
    assert all(v == ["bnlj"] for v in flagged.values()), flagged


def test_aqe_splits_skewed_join_partition(spark, sf_correctness):
    """AQE skew-join handling (the runtime complement to the salted
    two-phase agg): a sort-merge join with one hot key gets its skewed
    partition SPLIT at runtime — visible as smj skew=true in the final
    plan. Thresholds are lowered so the fixture-scale skew triggers;
    at production scale the defaults (256 MB) do the same."""
    import pyspark.sql.functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        ev = g.load_table(spark, sf_correctness, "events")
        big = ev
        for _ in range(3):  # 80k rows: the hot block must dominate the
            big = big.unionByName(big)  # map-side stats to be split
        # hot key: ~80% of rows collapse onto join key 0
        left = big.select(
            F.when(F.col("user_id") % 5 != 0, 0)
            .otherwise(F.col("user_id"))
            .alias("k"),
            "value",
            "props",  # widen rows so the hot partition crosses the bar
        )
        right = ev.select(
            (F.col("user_id")).alias("k"), F.col("event_type")
        ).distinct()
        joined = left.join(right, "k")
        # execute joined's OWN QueryExecution (a bare .count() would
        # plan a separate query and leave this plan un-finalized — the
        # pitfall plans/metrics.profile documents)
        qe = joined._jdf.queryExecution()
        qe.toRdd().count()
        plan = qe.executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_keyword_search_top_k_is_take_ordered(spark, sf_correctness):
    """Lexical retrieval's final top-k must plan as
    TakeOrderedAndProject (map-side partial top-k) — a global Sort
    before the limit would be a 100 TB regression."""
    from uwheel_datafusion_spark.operators.textops import keyword_search

    plan = _executed_plan(
        keyword_search(load_table(spark, sf_correctness, "documents"))
    )
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_rerank_refine_pushes_candidate_ids_to_scan(spark, sf_correctness):
    """The refine stage's corpus read must carry the candidate-id
    In(vec_id, …) predicate all the way to the parquet scan (the
    point-lookup contract from PLANS.md round-8 cont. 4) — losing the
    pushdown silently reverts the refine to a full corpus pass. Since
    round 13 the refine itself folds on the driver over the bounded
    candidate rows, so the pin moves to the named read seam the
    function collects from (_rerank_refine_read) — the only corpus
    access the refine stage performs."""
    import uwheel_datafusion_spark.operators.similarity as sim

    emb = load_table(spark, sf_correctness, "embeddings")
    plan = _executed_plan(
        sim._rerank_refine_read(emb, "embedding", [0, 1, 2, 7, 9])
    )
    assert "PushedFilters: [In(vec_id" in plan, plan[:2000]
    # and the rerank still goes through that seam (not a corpus scan):
    # its result on a tiny corpus equals the brute-force answer domain
    ivf = sim.ivf_build_wide(emb, n_cells=4)
    pq = sim.pq_build_wide(emb, m=4, k=8)
    rows = sim.ivfpq_search_rerank(
        ivf, pq, emb, (0, 1, 2), topk=5, nprobe=2, n_candidates=10
    ).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(1 <= r["rnk"] <= 5 for r in rows)
    ivf.cells.unpersist()
    pq.codes.unpersist()


def test_dsir_select_rank_plans_as_window_group_limit(
    spark, sf_correctness
):
    """dsir_select's per-bucket rank prefix must plan as
    WindowGroupLimit (map-side truncation before the shuffle) — it
    only fires on a FOLDABLE rank bound, which is why the per-bucket
    targets are collected driver-side and the window pre-filtered with
    the literal max(t_b) (ADVICE r8 medium). A join-derived bound
    silently reverts to a full unbounded window at scale."""
    from uwheel_datafusion_spark.operators import corpus as cx

    df = cx.dsir_select(load_table(spark, sf_correctness, "documents"))
    plan = _executed_plan(df)
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_keyword_index_probe_prunes_to_query_term_buckets(
    spark, sf_correctness, tmp_path
):
    """The persisted inverted index's probe must read ONLY the query
    terms' hash-bucket partitions of the postings table — proven
    functionally: corrupt every unprobed bucket's files; the probe must
    neither fail nor change its answer, while an unpruned full read
    fails."""
    from uwheel_datafusion_spark.operators import textops as tx

    docs = load_table(spark, sf_correctness, "documents")
    root = tmp_path / "kw"
    tx.build_keyword_index(docs, str(root))
    probed = {tx._term_bucket(t) for t in tx.KEYWORD_QUERY}
    probe = lambda: sorted(
        map(tuple, tx.keyword_index_probe(spark, str(root)).collect())
    )
    before = probe()
    assert before
    plan = _executed_plan(tx.keyword_index_probe(spark, str(root)))
    assert "PartitionFilters" in plan and "bucket#" in plan
    corrupted = 0
    for d in (root / "postings").glob("bucket=*"):
        if int(d.name.split("=")[1]) not in probed:
            for f in d.glob("*.parquet"):
                f.write_bytes(b"not a parquet file")
                corrupted += 1
    assert corrupted  # the fixture vocab spans far more than 3 buckets
    assert probe() == before
    with pytest.raises(Exception):
        spark.read.parquet(str(root / "postings")).collect()


def test_served_ann_reads_only_probed_cell_partitions(
    spark, sf_correctness, tmp_path
):
    """The round-9 serving-layout contract (VERDICT r8 next #1): a
    served ANN search must read ONLY the probed cells' partition
    directories of the payload table — partition pruning from the
    literal cell-isin predicate, no corpus access at all. Checked on
    the files actually read (inputFiles), not just the plan string."""
    import uwheel_datafusion_spark.operators.ann_serving as srv
    import uwheel_datafusion_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_correctness, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=8)
    pq = sim.pq_build_wide(emb, m=4, k=8)
    ivf_served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "ivf"))
    pq_served = srv.save_ivfpq_payload(ivf, pq, str(tmp_path / "pq"))
    # queries arrive from OUTSIDE the corpus in production — an
    # in-memory frame here, so every parquet file a search reads must
    # come from a served payload table
    qrows = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select("vec_id", "embedding")
        .collect()
    ]
    queries = spark.createDataFrame(
        qrows, "vec_id long, embedding array<float>"
    )

    # capture the probed-cell set the search computes (monkeypatch the
    # payload reader — same function object both searches route through)
    probed_sets = []
    orig_read = srv._read_payload

    def spy_read(sp, path, probed, extra_cols):
        probed_sets.append(set(probed))
        return orig_read(sp, path, probed, extra_cols)

    srv._read_payload = spy_read
    try:
        flat = srv.ivf_search_served(ivf_served, queries, k=5, nprobe=2)
        before = sorted(map(tuple, flat.collect()))
    finally:
        srv._read_payload = orig_read
    probed = probed_sets[0]
    # ≤ |queries|·nprobe distinct cells probed, strictly fewer than all 8
    assert 0 < len(probed) <= 6 < 8, probed
    plan = _executed_plan(flat)
    assert "PartitionFilters" in plan and "cell#" in plan

    adc = srv.ivfpq_search_served(pq_served, queries, topk=5, nprobe=2)
    adc_plan = _executed_plan(adc)
    assert "PartitionFilters" in adc_plan and "cell#" in adc_plan

    # refine stage of the served rerank: candidate-id pushdown into the
    # PAYLOAD table scan (point lookups), never the corpus (the query
    # frame is in-memory, so no embeddings.parquet may appear anywhere).
    # Since round 13 the refine math folds on the driver, so the pin
    # sits on the named read seam — the refine's only table access.
    refine_read = srv._rerank_refine_read_served(
        ivf_served, spark, sorted(probed), [1, 3, 5]
    )
    rr_plan = _executed_plan(refine_read)
    assert "PushedFilters: [In(vec_id" in rr_plan, rr_plan[:2000]
    assert "PartitionFilters" in rr_plan and "cell#" in rr_plan
    assert all(
        "embeddings.parquet" not in f for f in refine_read.inputFiles()
    )
    rr = srv.ivfpq_rerank_served(
        pq_served, ivf_served, queries, topk=5, nprobe=2, n_candidates=10
    )
    assert all("embeddings.parquet" not in f for f in rr.inputFiles())
    assert {r["rnk"] for r in rr.collect()} <= set(range(1, 6))

    # FUNCTIONAL pruning proof (last — it destroys the table): corrupt
    # every UNPROBED partition's files — a scan that didn't prune would
    # now throw; the served search must neither fail nor change its
    # answer
    unprobed = [c for c in range(8) if c not in probed]
    assert unprobed
    for c in unprobed:
        for f in (tmp_path / "ivf" / f"cell={c}").glob("*.parquet"):
            f.write_bytes(b"not a parquet file")
    after = sorted(
        map(tuple, srv.ivf_search_served(ivf_served, queries, k=5, nprobe=2).collect())
    )
    assert after == before
    # sanity: an UNPRUNED full read of the same table does fail
    with pytest.raises(Exception):
        spark.read.parquet(str(tmp_path / "ivf")).collect()
    ivf.cells.unpersist()
    pq.codes.unpersist()


def test_hybrid_served_retrieval_never_touches_corpus(
    spark, sf_correctness, tmp_path
):
    """retrieval.RetrievalEngine.retrieve (round 10 — VERDICT r9 next
    #3) must answer the hybrid query ENTIRELY from the two persisted
    indexes: with an in-memory query frame, no file read anywhere in
    the fused plan (or the internal candidate stage) may come from
    documents.parquet or embeddings.parquet."""
    import uwheel_datafusion_spark.operators.ann_serving as srv
    import uwheel_datafusion_spark.operators.similarity as sim
    import uwheel_datafusion_spark.operators.textops as tx
    from pyspark.sql import functions as F
    from uwheel_datafusion_spark.operators.retrieval import RetrievalEngine

    docs = load_table(spark, sf_correctness, "documents")
    emb = load_table(spark, sf_correctness, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=8)
    pq = sim.pq_build_wide(emb, m=4, k=8)
    ivf_served = srv.save_ivf_payload(ivf, emb, str(tmp_path / "ivf"))
    pq_served = srv.save_ivfpq_payload(ivf, pq, str(tmp_path / "pq"))
    tx.build_keyword_index(docs, str(tmp_path / "kw"))
    qrow = emb.filter(F.col("vec_id") == 0).select(
        "vec_id", "embedding"
    ).collect()[0]
    query_vec = spark.createDataFrame(
        [(qrow.vec_id, list(qrow.embedding))],
        "vec_id long, embedding array<float>",
    )
    eng = RetrievalEngine(
        spark,
        keyword_path=str(tmp_path / "kw"),
        ivf_served=ivf_served,
        pq_served=pq_served,
    )
    # spy on the payload reader: every parquet read the vector tier
    # issues (ADC candidates AND the refine) routes through it
    read_paths = []
    orig_read = srv._read_payload

    def spy(sp, path, probed, schema):
        read_paths.append(path)
        return orig_read(sp, path, probed, schema)

    srv._read_payload = spy
    try:
        fused = eng.retrieve(
            tx.KEYWORD_QUERY, query_vec, k=10, depth=10,
            nprobe=2, n_candidates=10,
        )
        rows = fused.collect()
    finally:
        srv._read_payload = orig_read
    assert rows
    banned = ("documents.parquet", "embeddings.parquet")
    for f in fused.inputFiles():
        assert not any(b in f for b in banned), f
    # _read_payload takes a single path OR a list of LSM generations
    # (round 12) — flatten before asserting
    flat = [
        p
        for entry in read_paths
        for p in ([entry] if isinstance(entry, str) else list(entry))
    ]
    assert flat and all(str(tmp_path) in p for p in flat), read_paths
    plan = _executed_plan(fused)
    assert "PartitionFilters" in plan and "bucket#" in plan
    ivf.cells.unpersist()
    pq.codes.unpersist()


def test_manifest_probes_read_only_probed_partitions(
    spark, sf_correctness, tmp_path
):
    """Manifest tables (round 12) must keep the serving-layout
    contract PER GENERATION: a served ANN search partition-prunes each
    committed generation's scan to the probed cells, and a keyword
    probe to the query terms' buckets — checked on the executed plan's
    PartitionFilters (inputFiles() reflects the ANALYZED plan, before
    partition pruning runs, so it lists every partition even when the
    scan reads only the probed ones)."""
    import uwheel_datafusion_spark.operators.ann_serving as srv
    import uwheel_datafusion_spark.operators.similarity as sim
    import uwheel_datafusion_spark.operators.textops as tx
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_correctness, "embeddings")
    ivf = sim.ivf_build_wide(emb, n_cells=8)
    root = str(tmp_path / "ann")
    served = srv.save_ivf_payload_manifest(
        ivf, emb.filter(F.col("vec_id") % 2 == 0), root
    )
    import uwheel_datafusion_spark.operators.manifest as mf

    mf.manifest_table_append(
        spark, root,
        srv.ivf_payload_frame(ivf, emb.filter(F.col("vec_id") % 2 == 1)),
    )
    qrows = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id").isin(0, 1))
        .select("vec_id", "embedding")
        .collect()
    ]
    queries = spark.createDataFrame(
        qrows, "vec_id long, embedding array<float>"
    )
    out = srv.ivf_search_served(served, queries, k=3, nprobe=2)
    out.collect()
    pairs = srv._rank_probes(
        ivf.centroids,
        sim._quantized(queries, "embedding").select("vec_id", "qvec")
        .collect(),
        2,
    )
    probed = sorted({c for _, c in pairs})
    plan = _executed_plan(out)
    want = f"IN ({','.join(str(c) for c in probed)})"
    # BOTH generation scans carry the literal cell-isin as a
    # PartitionFilter (one occurrence per generation dir)
    hits = [
        seg for seg in plan.split("PartitionFilters: [")[1:]
        if seg.split("]", 1)[0].find(want) >= 0
    ]
    assert len(hits) >= 2, (want, plan[:2000])
    ivf.cells.unpersist()

    docs = load_table(spark, sf_correctness, "documents")
    kroot = str(tmp_path / "kw")
    tx.build_keyword_index_manifest(
        docs.filter(F.col("doc_id") % 2 == 0), kroot
    )
    tx.build_keyword_index_manifest(
        docs.filter(F.col("doc_id") % 2 == 1), kroot
    )
    probe = tx.keyword_manifest_bm25_probe(spark, kroot)
    probe.collect()
    kbuckets = sorted({tx._term_bucket(t) for t in tx.KEYWORD_QUERY})
    kplan = _executed_plan(probe)
    kwant = f"IN ({','.join(str(b) for b in kbuckets)})"
    khits = [
        seg for seg in kplan.split("PartitionFilters: [")[1:]
        if seg.split("]", 1)[0].find(kwant) >= 0
    ]
    assert len(khits) >= 2, (kwant, kplan[:2000])
