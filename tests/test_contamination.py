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


class TestBloomDecontaminate:
    def _corpora(self, spark):
        train = spark.createDataFrame(
            [(i, [i % 5, i % 5 + 1, i % 5 + 2, i % 7]) for i in range(40)],
            "doc_id long, tokens array<int>",
        )
        eval_df = spark.createDataFrame(
            [(100, [2, 3, 4]), (101, [9, 9, 9])], "doc_id long, tokens array<int>"
        )
        return train, eval_df

    def test_superset_of_exact_removal(self, spark):
        """Bloom false positives only ever REMOVE extra rows: the bloom
        survivor set is a subset of the exact survivor set, at any m."""
        from temporalscope_spark.operators.contamination import (
            decontaminate,
            decontaminate_bloom,
        )

        train, eval_df = self._corpora(spark)
        exact = {r["doc_id"] for r in decontaminate(train, eval_df, 3, key="string").collect()}
        for m in (64, 1 << 16):
            bloom = {
                r["doc_id"]
                for r in decontaminate_bloom(train, eval_df, 3, m=m).collect()
            }
            assert bloom <= exact
        # at a roomy m the toy example has no false positives at all
        big = {
            r["doc_id"]
            for r in decontaminate_bloom(train, eval_df, 3, m=1 << 20).collect()
        }
        assert big == exact

    def test_bit_position_matches_hashlib(self, spark):
        """One gram's k bit positions replayed with python hashlib — pins the
        md5(gram + '#seed#j') % m arithmetic the DuckDB oracle relies on."""
        import hashlib

        from temporalscope_spark.operators.contamination import bloom_bits

        eval_df = spark.createDataFrame(
            [(1, [7, 8, 9])], "doc_id long, tokens array<int>"
        )
        m, k, seed = 4096, 3, 7
        got = sorted(r["pos"] for r in bloom_bits(eval_df, 3, k=k, m=m, seed=seed).collect())
        gram = "7\x1f8\x1f9"
        want = sorted(
            {
                int(hashlib.md5(f"{gram}#{seed}#{j}".encode()).hexdigest()[:8], 16) % m
                for j in range(k)
            }
        )
        assert got == want

    def test_bits_bounded_and_corpus_unshuffled(self, spark):
        """bits row count <= min(k * grams, m); the probe chain is k
        broadcast LEFT-SEMI joins with no Exchange of the training side."""
        from temporalscope_spark.operators.contamination import (
            bloom_bits,
            bloom_contaminated_ids,
        )

        train, eval_df = self._corpora(spark)
        built = bloom_bits(eval_df, 3, k=3, m=16).collect()
        assert len(built) <= 16
        # materialize bits so every exchange left in the plan is train-side
        bits = spark.createDataFrame([(r["pos"],) for r in built], "pos long")
        plan = (
            bloom_contaminated_ids(train, bits, 3, k=3, m=16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastHashJoin") == 3
        assert "LeftSemi" in plan
        # the training side is never exchanged: the only shuffle is the
        # final tiny ids distinct
        import re

        shuffles = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert all("_id" in s for s in shuffles) and len(shuffles) <= 2
