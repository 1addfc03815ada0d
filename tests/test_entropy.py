"""doc_entropy and source_divergence (operators/lm.py) vs closed-form
and pure-Python references."""

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.lm import doc_entropy, source_divergence


def test_entropy_closed_forms(spark):
    d = spark.createDataFrame(
        [
            (0, "a a b"),                 # H = -(2/3)ln(2/3)-(1/3)ln(1/3)
            (1, "x y z w"),               # uniform over 4 -> ln 4
            (2, "t t t t"),               # single word -> 0
            (3, "   "),                   # empty -> 0, n_words 0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["entropy"])
        for r in doc_entropy(d).collect()
    }
    h0 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert got[0] == (3, pytest.approx(round(h0, 6)))
    assert got[1] == (4, pytest.approx(round(math.log(4), 6)))
    assert got[2] == (4, 0.0)
    assert got[3] == (0, 0.0)


def _ref_kl(group_texts, all_texts, vocab_size):
    from collections import Counter

    def words(ts):
        out = []
        for t in ts:
            out += [w for w in " ".join(t.lower().split()).split(" ") if w]
        return out

    corpus = Counter(words(all_texts))
    vocab = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    tot = sum(n for _, n in vocab)
    pc = {w: n / tot for w, n in vocab}
    g = Counter(w for w in words(group_texts) if w in pc)
    L = sum(g.values())
    kl = 0.0
    for w in sorted(g):
        p = g[w] / L
        kl += p * math.log(p / pc[w])
    return L, round(kl, 6)


def test_kl_reference_parity_and_zero_for_identical(spark):
    ga = ["aa aa bb cc", "aa bb bb dd"]
    gb = ["ee ee ee ff", "ee ff gg gg"]
    rows = [(i, "A", t) for i, t in enumerate(ga)] + [
        (10 + i, "B", t) for i, t in enumerate(gb)
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["kl"])
        for r in source_divergence(d, vocab_size=100).collect()
    }
    assert got["A"] == pytest.approx(_ref_kl(ga, ga + gb, 100))
    assert got["B"] == pytest.approx(_ref_kl(gb, ga + gb, 100))
    assert got["A"][1] > 0 and got["B"][1] > 0
    # a group identical to the corpus diverges by 0
    same = spark.createDataFrame(
        [(0, "X", "p q p r"), (1, "X", "p q r r")],
        "doc_id long, source string, text string",
    )
    kl = source_divergence(same, vocab_size=100).collect()[0]["kl"]
    assert kl == pytest.approx(0.0, abs=1e-9)


def test_kl_vocab_truncation_drops_tail(spark):
    rows = [(0, "A", "top top top rare"), (1, "B", "top top mid mid")]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r["n_tokens"]
        for r in source_divergence(d, vocab_size=2).collect()
    }
    # vocab = {top(5), mid(2)}: A keeps only its 3 'top', B all 4
    assert got["A"] == 3
    assert got["B"] == 4
    with pytest.raises(DataFrameValidationError):
        source_divergence(d, vocab_size=0)
