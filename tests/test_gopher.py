"""Gopher rule semantics pinned on hand-built documents (the gate
differential covers the fixture corpus; these pin each rule's edge)."""

from uwheel_datafusion_spark.operators.textops import (
    GOPHER_MIN_WORDS,
    gopher_quality_flags,
)


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df).collect()[0]


def _good_text():
    # 60 words, mean len in [3,10], has required stopwords, alpha words
    base = "the quality of training data matters and models have improved with it"
    words = (base + " ") * 5  # 60 words
    return words.strip()


def test_keep_on_clean_document(spark):
    r = _flags(spark, _good_text())
    assert r.n_words >= GOPHER_MIN_WORDS
    assert r.gopher_keep == 1, r


def test_reject_too_short(spark):
    r = _flags(spark, "too short to keep")
    assert r.ok_word_count == 0 and r.gopher_keep == 0


def test_reject_symbol_heavy(spark):
    text = _good_text() + " " + "#" * 40  # 40 hashes vs 61 words
    r = _flags(spark, text)
    assert r.symbol_ratio > 0.1
    assert r.ok_symbol_ratio == 0 and r.gopher_keep == 0


def test_ellipsis_counts_once_per_occurrence(spark):
    r = _flags(spark, _good_text() + " wait... what... really...")
    # 3 ellipses over 63 words < 0.1 — still ok
    assert r.ok_symbol_ratio == 1


def test_reject_non_alpha_words(spark):
    nums = " ".join(str(i) for i in range(55))
    r = _flags(spark, nums)
    assert r.alpha_word_frac == 0.0
    assert r.ok_alpha_words == 0 and r.gopher_keep == 0


def test_reject_missing_required_stopwords(spark):
    words = " ".join(f"word{i}" for i in range(60))
    r = _flags(spark, words)
    assert r.req_hits == 0
    assert r.ok_required_words == 0 and r.gopher_keep == 0


def test_mean_word_length_bounds(spark):
    long_words = " ".join("supercalifragilistic" for _ in range(30))
    # inject required words to isolate the mean-length rule
    text = long_words + " the of and to that have with be"
    r = _flags(spark, text)
    assert r.ok_mean_word_len == 0 and r.gopher_keep == 0


def test_keyword_search_ranking_and_determinism(spark):
    """TF-IDF micro-pin: a doc repeating a rare query term outranks
    one with a single common term; ties order by doc_id."""
    from uwheel_datafusion_spark.operators import textops as tx

    rows = [
        (1, "rare rare rare common", "en", "s", 22),
        (2, "common filler words here", "en", "s", 24),
        (3, "rare common", "en", "s", 11),
        (4, "filler only", "en", "s", 11),
        (5, "common rare", "en", "s", 11),  # same tf profile as doc 3
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = tx.keyword_search(docs, terms=("rare", "common"), k=4).collect()
    assert [r.doc_id for r in got] == [1, 3, 5, 2]
    assert got[1].score == got[2].score  # docs 3 and 5 tie exactly
    assert got[0].score > got[1].score > got[3].score
