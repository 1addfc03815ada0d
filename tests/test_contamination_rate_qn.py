"""Per-doc contamination rate and per-group quantile normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.contamination import contamination_rate
from temporalscope_spark.operators.scaling import quantile_normalize


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d"]),
            (2, ["x", "y", "z"]),
        ],
        "doc_id long, tokens array<string>",
    )
    ev = spark.createDataFrame(
        [
            (10, ["a", "b", "c"]),        # grams ab, bc -> both in train
            (11, ["a", "b", "q", "r"]),   # grams ab, bq, qr -> 1 of 3
            (12, ["m", "n"]),             # gram mn -> 0 of 1
            (13, ["s"]),                  # shorter than n -> omitted
        ],
        "doc_id long, tokens array<string>",
    )
    return train, ev


class TestContaminationRate:
    def test_rates(self, corpora):
        train, ev = corpora
        out = {r["doc_id"]: r for r in contamination_rate(train, ev, 2).collect()}
        assert out[10]["rate"] == pytest.approx(1.0)
        assert out[10]["n_grams"] == 2 and out[10]["n_hit"] == 2
        assert out[11]["rate"] == pytest.approx(round(1 / 3, 6), abs=1e-6)
        assert out[12]["rate"] == 0.0
        assert 13 not in out  # no grams, no denominator

    def test_distinct_grams_counted_once(self, spark, corpora):
        train, _ = corpora
        ev = spark.createDataFrame(
            [(20, ["a", "b", "a", "b"])], "doc_id long, tokens array<string>"
        )
        out = contamination_rate(train, ev, 2).collect()[0]
        # distinct grams: ab, ba -> ab hits, ba doesn't
        assert out["n_grams"] == 2 and out["n_hit"] == 1

    def test_string_key_lane(self, corpora):
        train, ev = corpora
        a = sorted(map(tuple, contamination_rate(train, ev, 2, key="hash").collect()))
        b = sorted(map(tuple, contamination_rate(train, ev, 2, key="string").collect()))
        assert a == b


@pytest.fixture(scope="module")
def grouped_scores(spark):
    rows = [(i, "a", float(i)) for i in range(10)]          # 0..9 distinct
    rows += [(100 + i, "b", 5.0) for i in range(4)]          # all tied
    rows += [(200, "b", 1.0), (201, "b", 9.0)]
    rows += [(300, "a", None)]
    return spark.createDataFrame(rows, "row_id long, src string, score double")


class TestQuantileNormalize:
    def test_uniform_grid_within_group(self, grouped_scores):
        out = {r["row_id"]: r["score_qn"]
               for r in quantile_normalize(grouped_scores, "score", "src").collect()}
        # group a: rank i+1 of 10 -> (i+0.5)/10
        for i in range(10):
            assert out[i] == pytest.approx((i + 0.5) / 10, abs=1e-6)

    def test_average_ranks_for_ties(self, grouped_scores):
        out = {r["row_id"]: r["score_qn"]
               for r in quantile_normalize(grouped_scores, "score", "src").collect()}
        # group b (n=6): value 5.0 occupies ranks 2..5 -> avg 3.5 -> (3.5-.5)/6
        for i in range(4):
            assert out[100 + i] == pytest.approx(3.0 / 6, abs=1e-6)
        assert out[200] == pytest.approx(0.5 / 6, abs=1e-6)
        assert out[201] == pytest.approx(5.5 / 6, abs=1e-6)

    def test_null_passthrough(self, grouped_scores):
        out = {r["row_id"]: r["score_qn"]
               for r in quantile_normalize(grouped_scores, "score", "src").collect()}
        assert out[300] is None

    def test_partition_invariant(self, grouped_scores):
        a = sorted(map(tuple, quantile_normalize(grouped_scores, "score", "src").collect()))
        b = sorted(map(tuple, quantile_normalize(
            grouped_scores.repartition(7), "score", "src").collect()))
        assert a == b

    def test_groups_calibrated_to_same_scale(self, spark):
        # wildly different raw scales map onto the same uniform grid
        rows = [(i, "web", float(i) * 1000) for i in range(5)]
        rows += [(10 + i, "code", float(i) * 0.001) for i in range(5)]
        df = spark.createDataFrame(rows, "row_id long, src string, score double")
        out = {r["row_id"]: r["score_qn"] for r in
               quantile_normalize(df, "score", "src").collect()}
        for i in range(5):
            assert out[i] == pytest.approx(out[10 + i], abs=1e-6)

    def test_errors(self, grouped_scores, spark):
        with pytest.raises(DataFrameValidationError):
            quantile_normalize(grouped_scores, "nope", "src")
        empty = spark.createDataFrame([(1, "a", None)], "row_id long, src string, score double")
        with pytest.raises(DataFrameValidationError):
            quantile_normalize(empty, "score", "src")
