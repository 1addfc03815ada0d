"""Vocabulary KL/JS divergence: pure-Python reference parity, identical
corpora at zero, asymmetry, vocab bounding."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.drift import vocab_kl


def _ref(texts_a, texts_b, k, alpha):
    ca = Counter(w for t in texts_a for w in t.lower().split())
    cb = Counter(w for t in texts_b for w in t.lower().split())
    comb = Counter(ca) + Counter(cb)
    vocab = sorted(comb, key=lambda w: (-comb[w], w))[:k]
    na = sum(ca[w] for w in vocab)
    nb = sum(cb[w] for w in vocab)
    v = len(vocab)
    pa = {w: (ca[w] + alpha) / (na + alpha * v) for w in vocab}
    pb = {w: (cb[w] + alpha) / (nb + alpha * v) for w in vocab}
    kl_ab = sum(pa[w] * math.log(pa[w] / pb[w]) for w in vocab)
    kl_ba = sum(pb[w] * math.log(pb[w] / pa[w]) for w in vocab)
    js = 0.5 * sum(
        pa[w] * math.log(pa[w] / ((pa[w] + pb[w]) / 2)) for w in vocab
    ) + 0.5 * sum(pb[w] * math.log(pb[w] / ((pa[w] + pb[w]) / 2)) for w in vocab)
    return na, nb, v, round(kl_ab, 6), round(kl_ba, 6), round(js, 6)


def _df(spark, texts_a, texts_b):
    rows = [("a", t) for t in texts_a] + [("b", t) for t in texts_b]
    return spark.createDataFrame(rows, "source string, text string")


A = ["the cat sat on the mat", "the dog ran", "cats and dogs", "the the the"]
B = ["quantum flux capacitor", "the flux", "dog ran far away", "entropy rises"]


class TestVocabKL:
    def test_reference_parity(self, spark):
        got = vocab_kl(_df(spark, A, B), "text", "source", "a", "b",
                       vocab_k=10, alpha=0.5).collect()[0]
        na, nb, v, kl_ab, kl_ba, js = _ref(A, B, 10, 0.5)
        assert (got["n_a"], got["n_b"], got["vocab_size"]) == (na, nb, v)
        assert got["kl_ab"] == pytest.approx(kl_ab, abs=2e-6)
        assert got["kl_ba"] == pytest.approx(kl_ba, abs=2e-6)
        assert got["js"] == pytest.approx(js, abs=2e-6)

    def test_identical_corpora_zero(self, spark):
        got = vocab_kl(_df(spark, A, A), "text", "source", "a", "b",
                       vocab_k=50).collect()[0]
        assert got["kl_ab"] == 0.0 and got["js"] == 0.0

    def test_js_bounded_and_symmetricish(self, spark):
        got = vocab_kl(_df(spark, A, B), "text", "source", "a", "b",
                       vocab_k=50).collect()[0]
        assert 0.0 <= got["js"] <= math.log(2) + 1e-9
        assert got["kl_ab"] > 0 and got["kl_ba"] > 0

    def test_vocab_k_bounds_support(self, spark):
        got = vocab_kl(_df(spark, A, B), "text", "source", "a", "b",
                       vocab_k=3).collect()[0]
        assert got["vocab_size"] == 3

    def test_validation(self, spark):
        df = _df(spark, A, B)
        with pytest.raises(DataFrameValidationError, match="alpha"):
            vocab_kl(df, "text", "source", "a", "b", alpha=0.0)
        with pytest.raises(DataFrameValidationError, match="vocab_k"):
            vocab_kl(df, "text", "source", "a", "b", vocab_k=0)
