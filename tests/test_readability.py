"""Flesch / Flesch-Kincaid readability (operators/text.py) vs the
textbook formulas computed by hand: count lanes, sentence flooring,
empty-text guard, and the zero-exchange plan."""

import re

import pytest

from temporalscope_spark.operators.text import with_readability


def _ref(text):
    words = [x for x in text.split() if x]
    n_w = len(words)
    n_sy = len(re.findall(r"[aeiouy]+", text.lower()))
    n_se = max(len(re.findall(r"[.!?]+", text)), 1)
    wz = n_w if n_w else 1
    ease = 206.835 - 1.015 * (n_w / n_se) - 84.6 * (n_sy / wz)
    grade = 0.39 * (n_w / n_se) + 11.8 * (n_sy / wz) - 15.59
    return n_w, n_se, n_sy, round(ease, 6), round(grade, 6)


TEXTS = [
    "The cat sat on the mat. It was happy!",
    "Incomprehensibility characterizes multisyllabic terminology.",
    "no punctuation here at all",
    "",
    "One. Two? Three!!! Four",
]


class TestReadability:
    def test_matches_textbook_formula(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in with_readability(df).collect()}
        for i, t in enumerate(TEXTS):
            n_w, n_se, n_sy, ease, grade = _ref(t)
            r = out[i]
            assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
                n_w, n_se, n_sy
            )
            assert r["flesch_ease"] == pytest.approx(ease, abs=1e-9)
            assert r["fk_grade"] == pytest.approx(grade, abs=1e-9)

    def test_simple_text_reads_easier(self, spark):
        df = spark.createDataFrame(
            [(0, TEXTS[0]), (1, TEXTS[1])], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["flesch_ease"] for r in with_readability(df).collect()}
        assert got[0] > got[1]

    def test_no_exchange(self, spark):
        df = spark.createDataFrame([(0, "a. b")], "doc_id long, text string")
        plan = with_readability(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
