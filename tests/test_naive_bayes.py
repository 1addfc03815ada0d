"""Multinomial Naive Bayes (modeling/naive_bayes.py).

Correctness gauge: a pure-Python NB (the McCallum & Nigam 1998 multinomial
event model with add-α smoothing) over the same planted corpus — per-class
log-joints must agree to 1e-9 and predictions exactly. Separability is
verified on a planted per-class vocabulary; the deterministic tie rule and
the prior-only (zero in-vocab words) lane are pinned explicitly.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling.naive_bayes import nb_classify, nb_fit, nb_score

DOCS = [
    (0, "alpha alpha beta common", "A"),
    (1, "alpha beta beta common common", "A"),
    (2, "gamma delta common", "B"),
    (3, "delta delta gamma gamma common", "B"),
    (4, "alpha gamma common", "A"),
    (5, "zzz qqq", "B"),  # fully OOV once vocab truncates
]


def _py_nb(docs, vocab_size, alpha):
    """Reference NB: returns (priors, cond, vocab) as dicts."""
    from collections import Counter

    word_tot = Counter()
    lw = Counter()
    labels = Counter()
    for _, text, lab in docs:
        labels[lab] += 1
        for w in text.split():
            word_tot[w] += 1
            lw[(lab, w)] += 1
    vocab = sorted(word_tot, key=lambda w: (-word_tot[w], w))[:vocab_size]
    n = sum(labels.values())
    priors = {l: math.log(c / n) for l, c in labels.items()}
    cond = {}
    for lab in labels:
        t = sum(lw[(lab, w)] for w in vocab)
        v = len(vocab)
        for w in vocab:
            cond[(lab, w)] = math.log((lw[(lab, w)] + alpha) / (t + alpha * v))
    return priors, cond, set(vocab)


def _py_score(docs, priors, cond, vocab):
    out = {}
    for did, text, _ in docs:
        words = [w for w in text.split() if w in vocab]
        best = None
        for lab in sorted(priors):
            s = priors[lab] + sum(cond[(lab, w)] for w in words)
            s = round(s, 6)
            # engine tie rule: larger label wins on equal rounded score
            key = (s, lab)
            if best is None or key > best:
                best = key
        out[did] = (len(words), best[1], best[0])
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


class TestFit:
    def test_cond_table_matches_reference(self, docs_df):
        priors, cond = nb_fit(docs_df, vocab_size=6, alpha=1.0)
        p_ref, c_ref, vocab = _py_nb(DOCS, 6, 1.0)
        got_p = {r["label"]: r["log_prior"] for r in priors.collect()}
        assert set(got_p) == set(p_ref)
        for lab, lp in p_ref.items():
            assert got_p[lab] == pytest.approx(lp, abs=1e-12)
        rows = cond.collect()
        assert len(rows) == 2 * 6  # C x V, zero-count cells included
        for r in rows:
            assert (r["label"], r["word"]) in c_ref
            assert r["log_cond"] == pytest.approx(
                c_ref[(r["label"], r["word"])], abs=1e-12
            )

    def test_vocab_truncation_by_count_then_word(self, docs_df):
        _, cond = nb_fit(docs_df, vocab_size=2, alpha=1.0)
        words = {r["word"] for r in cond.select("word").distinct().collect()}
        # common(6) > alpha(4) > beta/delta/gamma... top-2 = common, alpha
        assert words == {"common", "alpha"}

    def test_validation(self, docs_df):
        with pytest.raises(DataFrameValidationError):
            nb_fit(docs_df, vocab_size=0)
        with pytest.raises(DataFrameValidationError):
            nb_fit(docs_df, alpha=0.0)
        with pytest.raises(DataFrameValidationError):
            nb_fit(docs_df, label_col="nope")


class TestScore:
    def test_predictions_match_reference(self, docs_df):
        got = {
            r["doc_id"]: (r["n_words"], r["pred"], r["score"])
            for r in nb_classify(docs_df, vocab_size=6).collect()
        }
        p_ref, c_ref, vocab = _py_nb(DOCS, 6, 1.0)
        ref = _py_score(DOCS, p_ref, c_ref, vocab)
        assert got.keys() == ref.keys()
        for did, (nw, pred, score) in ref.items():
            assert got[did][0] == nw
            assert got[did][1] == pred
            assert got[did][2] == pytest.approx(score, abs=1e-6)

    def test_separable_classes_classify_correctly(self, docs_df):
        out = nb_classify(docs_df, vocab_size=6).collect()
        by_id = {r["doc_id"]: r for r in out}
        # planted vocab separates: alpha/beta => A, gamma/delta => B
        for did in (0, 1):
            assert by_id[did]["pred"] == "A"
        for did in (2, 3):
            assert by_id[did]["pred"] == "B"

    def test_prior_only_doc_still_classified(self, docs_df):
        # vocab_size=1 keeps only "common"; doc 5 has zero in-vocab words
        out = {r["doc_id"]: r for r in nb_classify(docs_df, vocab_size=1).collect()}
        assert out[5]["n_words"] == 0
        # equal priors (3 A, 3 B) and zero word-sum => tie => larger label
        assert out[5]["pred"] == "B"
        assert out[5]["score"] == pytest.approx(round(math.log(0.5), 6), abs=1e-6)

    def test_partition_invariance(self, docs_df):
        a = sorted(
            (r["doc_id"], r["pred"], r["score"])
            for r in nb_classify(docs_df, vocab_size=6).collect()
        )
        b = sorted(
            (r["doc_id"], r["pred"], r["score"])
            for r in nb_classify(docs_df.repartition(7), vocab_size=6).collect()
        )
        assert a == b

    def test_score_external_model(self, docs_df, spark):
        # fit on A-docs only, score everything: model reuse across tables
        train = docs_df.filter(F.col("lang") == "A")
        priors, cond = nb_fit(train, vocab_size=4)
        out = nb_score(docs_df, priors, cond)
        rows = out.collect()
        assert len(rows) == len(DOCS)
        assert all(r["pred"] == "A" for r in rows)  # only one class fitted
