"""Token n-grams and train/eval decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.contamination import (
    contaminated_ids,
    decontaminate,
    token_ngrams,
)


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [
            ("t1", [1, 2, 3, 4, 5]),     # shares (2,3,4) with e1
            ("t2", [9, 9, 9, 9]),        # clean
            ("t3", [7, 8]),              # shorter than n=3 -> no grams -> clean
            ("t4", [5, 6, 7, 8, 9]),     # shares (6,7,8) with e2
        ],
        "doc_id string, tokens array<int>",
    )
    ev = spark.createDataFrame(
        [("e1", [0, 2, 3, 4]), ("e2", [6, 7, 8])],
        "doc_id string, tokens array<int>",
    )
    return train, ev


class TestTokenNgrams:
    def test_gram_set(self, spark):
        df = spark.createDataFrame([("a", [1, 2, 3, 4])], "doc_id string, tokens array<int>")
        got = {r["ngram_key"] for r in token_ngrams(df, 3, key="string").collect()}
        assert got == {"1\x1f2\x1f3", "2\x1f3\x1f4"}

    def test_short_rows_yield_nothing(self, spark):
        df = spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>")
        assert token_ngrams(df, 3).count() == 0

    def test_distinct_dedupes(self, spark):
        df = spark.createDataFrame([("a", [5, 5, 5, 5])], "doc_id string, tokens array<int>")
        assert token_ngrams(df, 2, key="string").count() == 1
        assert token_ngrams(df, 2, key="string", distinct=False).count() == 3

    def test_errors(self, spark):
        df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
        with pytest.raises(DataFrameValidationError, match="n must be"):
            token_ngrams(df, 0)
        with pytest.raises(DataFrameValidationError, match="key must be"):
            token_ngrams(df, 2, key="nope")


class TestDecontaminate:
    @pytest.mark.parametrize("key", ["hash", "string"])
    def test_contaminated_and_clean(self, corpora, key):
        train, ev = corpora
        bad = {r["doc_id"] for r in contaminated_ids(train, ev, 3, key=key).collect()}
        assert bad == {"t1", "t4"}
        clean = {r["doc_id"] for r in decontaminate(train, ev, 3, key=key).collect()}
        assert clean == {"t2", "t3"}

    def test_plan_broadcasts_eval(self, corpora):
        train, ev = corpora
        plan = decontaminate(train, ev, 3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_hash_and_string_keys_agree(self, corpora):
        train, ev = corpora
        a = {r["doc_id"] for r in contaminated_ids(train, ev, 2, key="hash").collect()}
        b = {r["doc_id"] for r in contaminated_ids(train, ev, 2, key="string").collect()}
        assert a == b


def test_word_token_decontamination(spark):
    """String word-token arrays are first-class: no int cast, same anti-join
    semantics (word-level decontamination over raw text corpora)."""
    from temporalscope_spark.operators.contamination import decontaminate

    train = spark.createDataFrame(
        [
            (1, ["the", "quick", "brown", "fox", "jumps"]),
            (2, ["totally", "unrelated", "training", "text", "here"]),
        ],
        "doc_id long, tokens array<string>",
    )
    eval_df = spark.createDataFrame(
        [(100, ["quick", "brown", "fox"])], "doc_id long, tokens array<string>"
    )
    out = decontaminate(train, eval_df, n=3)
    assert [r["doc_id"] for r in out.collect()] == [2]


@pytest.mark.parametrize("key", ["hash", "string"])
def test_comma_tokens_do_not_alias(spark, key):
    """ADVICE r3: comma-joined gram keys aliased ['a,b','c'] with
    ['a','b,c'] — whitespace-split word tokens commonly contain commas
    ('world,'). Neither key mode may produce a false-positive match for
    grams that differ only in comma placement."""
    from temporalscope_spark.operators.contamination import contaminated_ids

    train = spark.createDataFrame(
        [(1, ["a,b", "c"]), (2, ["x", "y"])], "doc_id long, tokens array<string>"
    )
    eval_df = spark.createDataFrame(
        [(100, ["a", "b,c"])], "doc_id long, tokens array<string>"
    )
    bad = contaminated_ids(train, eval_df, n=2, key=key).collect()
    assert bad == []

    # and a genuine shared gram still matches
    eval2 = spark.createDataFrame(
        [(101, ["a,b", "c"])], "doc_id long, tokens array<string>"
    )
    hit = {r["doc_id"] for r in contaminated_ids(train, eval2, n=2, key=key).collect()}
    assert hit == {1}
