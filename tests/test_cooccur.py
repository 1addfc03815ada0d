"""Windowed co-occurrence PMI (operators/cooccur.py)."""

import math
from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.cooccur import cooccurrence_pmi
from temporalscope_spark.operators.lm import unigram_counts


def _norm_words(t):
    return [w for w in " ".join(t.lower().split()).split(" ") if w]


def _brute(texts, vocab, window, min_count=1):
    cells = Counter()
    for t in texts:
        ws = _norm_words(t)
        for i in range(len(ws)):
            for j in range(i + 1, min(i + window, len(ws) - 1) + 1):
                a, b = ws[i], ws[j]
                if a in vocab and b in vocab:
                    cells[(min(a, b), max(a, b))] += 1
    D = 2.0 * sum(cells.values())
    m = Counter()
    for (a, b), c in cells.items():
        m[a] += c
        m[b] += c
    out = {}
    for (a, b), c in cells.items():
        if c < min_count:
            continue
        pmi = math.log(c * D / (m[a] * m[b]))
        out[(a, b)] = (c, round(pmi, 6), round(max(pmi, 0.0), 6))
    return out


@pytest.fixture
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "new york city and new york state"),
        (3, "the the the"),
        (4, ""),
        (5, "  New   YORK "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestCooccurrencePmi:
    def test_matches_bruteforce(self, spark, docs):
        vocab_df = unigram_counts(docs)
        vocab = {r["word"] for r in vocab_df.collect()}
        texts = [r["text"] for r in docs.collect()]
        got = {
            (r["w1"], r["w2"]): (r["n_pairs"], r["pmi"], r["ppmi"])
            for r in cooccurrence_pmi(docs, vocab_df, window=2).collect()
        }
        assert got == _brute(texts, vocab, 2)

    def test_window_widens_pairs(self, spark, docs):
        vocab_df = unigram_counts(docs)
        n1 = cooccurrence_pmi(docs, vocab_df, window=1).count()
        n3 = cooccurrence_pmi(docs, vocab_df, window=3).count()
        assert n3 > n1

    def test_vocab_restricts(self, spark, docs):
        vocab_df = unigram_counts(docs, vocab_size=2)
        kept = {r["word"] for r in vocab_df.collect()}
        rows = cooccurrence_pmi(docs, vocab_df, window=2).collect()
        for r in rows:
            assert r["w1"] in kept and r["w2"] in kept

    def test_collocation_scores_high(self, spark):
        """'new york' always co-occurs; the other words have comparable
        frequency but scattered partners -> the collocation tops PMI."""
        texts = ["new york"] * 4 + ["a b", "a c", "b c", "a d", "c d"]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        vocab_df = unigram_counts(df)
        rows = cooccurrence_pmi(df, vocab_df, window=2).collect()
        best = max(rows, key=lambda r: r["pmi"])
        assert {best["w1"], best["w2"]} == {"new", "york"}

    def test_min_count_filters(self, spark, docs):
        vocab_df = unigram_counts(docs)
        rows = cooccurrence_pmi(docs, vocab_df, window=2, min_count=2).collect()
        assert rows and all(r["n_pairs"] >= 2 for r in rows)

    def test_validations(self, spark, docs):
        vocab_df = unigram_counts(docs)
        with pytest.raises(DataFrameValidationError, match="window"):
            cooccurrence_pmi(docs, vocab_df, window=0)
        with pytest.raises(DataFrameValidationError, match="min_count"):
            cooccurrence_pmi(docs, vocab_df, min_count=0)

    def test_no_self_join_of_corpus(self, spark, docs):
        """Pair generation is in-row: the plan contains no join whose both
        sides scan the corpus (the only joins are broadcast vocab/marginal
        joins)."""
        vocab_df = unigram_counts(docs, vocab_size=10)
        plan = (
            cooccurrence_pmi(docs, vocab_df, window=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
