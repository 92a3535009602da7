"""Duplicate-span (ExactSubstr) + Bloom-gate unit tests.

The registry-wide oracle differential (test_oracle_parity) already
checks the three gates against DuckDB on the fixture corpus; these
tests pin the *semantics* on hand-built documents where the right
answer is known by construction.
"""

import pyspark.sql.functions as F
import pytest

from uwheel_datafusion_spark.operators import spans as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "the quick brown fox jumps over the lazy dog"  # 9 tokens


def test_islands_find_shared_span(spark):
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"one two three {BOILER} four"),
            (3, "completely unrelated text with no repeats at all here"),
        ],
    )
    out = sp.duplicate_span_islands(docs, k=6).collect()
    by_doc = {r.doc_id: r for r in out}
    # only docs 1 and 2 share a span; doc 3 is clean
    assert set(by_doc) == {1, 2}
    # doc 1: boilerplate occupies tokens 3..11 (1-based)
    assert (by_doc[1].span_start, by_doc[1].span_end) == (3, 11)
    # doc 2: tokens 4..12
    assert (by_doc[2].span_start, by_doc[2].span_end) == (4, 12)
    # 9-token span with k=6 → 4 duplicated windows, merged into ONE island
    assert by_doc[1].n_grams == 4 and by_doc[1].span_idx == 1


def test_islands_merge_only_adjacent(spark):
    # two shared spans separated by unique middles must NOT merge
    docs = _docs(
        spark,
        [
            (1, f"{BOILER} unique middle part one {BOILER}"),
            (2, f"{BOILER} other filler text entirely {BOILER}"),
        ],
    )
    out = sp.duplicate_span_islands(docs, k=6)
    per_doc = (
        out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n == 2 for r in per_doc), per_doc


def test_scrub_removes_exactly_the_spans(spark):
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"one two three {BOILER} four"),
            (3, "clean document stays untouched ok"),
        ],
    )
    out = {r.doc_id: r for r in sp.scrub_duplicate_spans(docs, k=6).collect()}
    assert out[1].clean_text == "alpha beta gamma delta"
    assert out[2].clean_text == "one two three four"
    assert out[3].clean_text == "clean document stays untouched ok"
    assert out[3].n_tokens_removed == 0
    # conservation: kept + removed == original token count
    assert out[1].n_tokens_kept + out[1].n_tokens_removed == 13
    assert out[2].n_tokens_removed == 9


def test_scrub_fully_duplicated_doc_survives_empty(spark):
    docs = _docs(spark, [(1, BOILER), (2, BOILER)])
    out = {r.doc_id: r for r in sp.scrub_duplicate_spans(docs, k=6).collect()}
    assert out[1].clean_text == "" and out[1].n_tokens_kept == 0
    assert out[1].n_tokens_removed == 9


def test_bloom_no_false_negatives(spark):
    # every corpus text re-seen in the new batch MUST flag possible_dup
    rows = [(i, f"document number {i} body text") for i in range(40)]
    rows += [(100 + i, f"document number {i} body text") for i in range(10)]  # dups
    rows += [(200 + i, f"fresh unseen content {i}") for i in range(10)]
    docs = _docs(spark, rows)
    out = sp.bloom_gate(docs, "doc_id < 100", "doc_id >= 100")
    got = {r.doc_id: r.possible_dup for r in out.collect()}
    assert len(got) == 20
    for i in range(10):
        assert got[100 + i] is True, f"false negative on dup doc {100 + i}"


def test_bloom_bits_bounded(spark):
    docs = _docs(spark, [(1, "some text"), (2, "other words entirely")])
    out = sp.bloom_gate(docs, "doc_id = 1", "doc_id = 2").collect()
    assert len(out) == 1
    r = out[0]
    assert 1 <= r.n_bits <= sp.BLOOM_J
    assert 0 <= r.n_hits <= r.n_bits


def test_bloom_filter_side_is_broadcast(spark):
    """The corpus bitset (≤ m rows of one int) must reach the probe as
    a broadcast hash join — an incremental ingest never shuffles on
    corpus size."""
    rows = [(i, f"text {i}") for i in range(50)]
    docs = _docs(spark, rows)
    plan = (
        sp.bloom_gate(docs, "doc_id < 40", "doc_id >= 40")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_islands_plan_partitions_by_doc(spark):
    """The gaps-and-islands window must be PARTITION BY doc_id — no
    global single-partition sort anywhere in the plan."""
    rows = [(i, f"shared prefix line {i % 3} tail") for i in range(30)]
    docs = _docs(spark, rows)
    plan = (
        sp.duplicate_span_islands(docs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_incremental_span_probe(spark):
    corpus = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, "corpus only other content entirely distinct"),
        ],
    )
    new = _docs(
        spark,
        [
            (10, f"prefix words {BOILER} suffix"),        # dup vs corpus
            (11, "wholly novel text nothing shared here at all"),
            (12, "in batch twin span example text body"),  # dup only intra-batch
            (13, "in batch twin span example text body"),
        ],
    )
    idx = sp.span_gram_index(corpus, k=6)
    out = {r.doc_id: r for r in sp.incremental_span_islands(new, idx, k=6).collect()}
    # only the vs-corpus duplicate is found; intra-batch dups are by
    # contract invisible to the probe (they surface when the batch is
    # appended to the index and the NEXT batch probes it)
    assert set(out) == {10}
    assert (out[10].span_start, out[10].span_end) == (3, 11)


def test_incremental_index_extend_catches_next_batch(spark):
    corpus = _docs(spark, [(1, "base corpus content")])
    batch1 = _docs(spark, [(10, f"first {BOILER} tail")])
    batch2 = _docs(spark, [(20, f"second {BOILER} tail")])
    idx = sp.span_gram_index(corpus, k=6)
    assert sp.incremental_span_islands(batch1, idx, k=6).count() == 0
    # append batch1's grams, as an ingest loop would
    idx2 = idx.union(sp.span_gram_index(batch1, k=6)).distinct()
    hits = sp.incremental_span_islands(batch2, idx2, k=6).collect()
    assert len(hits) == 1 and hits[0].doc_id == 20
