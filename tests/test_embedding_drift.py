"""Embedding-distribution drift (MAUVE-style JS over shared cells) and
distinct-n diversity."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import distinct_ngram_ratio
from temporalscope_spark.operators.drift import embedding_drift

CENTS = [[1.0, 0.0], [0.0, 1.0]]


def _mk(spark, weights):
    rows, rid = [], 0
    for cell, n in enumerate(weights):
        for i in range(n):
            eps = 0.001 * i
            v = [1.0, eps] if cell == 0 else [eps, 1.0]
            rows.append((rid, v))
            rid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestEmbeddingDrift:
    def test_identical_distributions_zero(self, spark):
        a = _mk(spark, [30, 30])
        out = embedding_drift(a, a, CENTS).collect()
        assert out[0]["js_total"] == pytest.approx(0.0, abs=1e-6)
        assert len(out) == 2

    def test_disjoint_near_one_bit(self, spark):
        a = _mk(spark, [40, 0])
        b = _mk(spark, [0, 40])
        out = embedding_drift(a, b, CENTS, smoothing=1e-4).collect()
        assert out[0]["js_total"] == pytest.approx(1.0, abs=1e-2)

    def test_matches_closed_form(self, spark):
        a = _mk(spark, [30, 10])
        b = _mk(spark, [10, 30])
        s, c = 0.5, 2
        p = [(30 + s) / (40 + s * c), (10 + s) / (40 + s * c)]
        q = [(10 + s) / (40 + s * c), (30 + s) / (40 + s * c)]
        js = sum(
            pi / 2 * math.log2(pi / ((pi + qi) / 2))
            + qi / 2 * math.log2(qi / ((pi + qi) / 2))
            for pi, qi in zip(p, q)
        )
        out = embedding_drift(a, b, CENTS).collect()
        assert out[0]["js_total"] == pytest.approx(round(js, 6), abs=1e-6)
        shares = {r["cell"]: (r["share_ref"], r["share_cur"]) for r in out}
        assert shares[0][0] == pytest.approx(p[0], abs=1e-6)
        assert shares[1][1] == pytest.approx(q[1], abs=1e-6)

    def test_empty_cell_stays_finite(self, spark):
        a = _mk(spark, [40, 0])
        b = _mk(spark, [35, 5])
        out = embedding_drift(a, b, CENTS).collect()
        assert all(r["js_term"] is not None for r in out)
        assert all(math.isfinite(r["js_total"]) for r in out)

    def test_errors(self, spark):
        a = _mk(spark, [5, 5])
        with pytest.raises(DataFrameValidationError):
            embedding_drift(a, a, [])
        with pytest.raises(DataFrameValidationError):
            embedding_drift(a, a, CENTS, smoothing=0.0)


class TestDistinctNgramRatio:
    def test_templated_vs_diverse(self, spark):
        rows = [(i, "tpl", "the same exact line") for i in range(20)]
        rows += [(100 + i, "div", f"unique words w{i}a w{i}b w{i}c") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r["source"]: r for r in distinct_ngram_ratio(df, n=2, group_col="source").collect()}
        assert out["tpl"]["ratio"] < 0.1
        assert out["div"]["ratio"] > 0.5

    def test_counts_hand_checked(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x y x y"), (2, "a", "x y z")],
            "doc_id long, source string, text string",
        )
        out = distinct_ngram_ratio(df, n=2, group_col="source").collect()[0]
        # doc1 grams: xy yx xy; doc2: xy yz -> total 5, distinct {xy, yx, yz}=3
        assert out["n_grams"] == 5 and out["n_distinct"] == 3
        assert out["ratio"] == pytest.approx(0.6, abs=1e-6)

    def test_short_docs_contribute_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "solo"), (2, "a", "x y")], "doc_id long, source string, text string"
        )
        out = distinct_ngram_ratio(df, n=2, group_col="source").collect()[0]
        assert out["n_grams"] == 1

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, "a", "x y")], "doc_id long, source string, text string")
        with pytest.raises(DataFrameValidationError):
            distinct_ngram_ratio(df, n=0)
        with pytest.raises(DataFrameValidationError):
            distinct_ngram_ratio(df, text_col="nope")
