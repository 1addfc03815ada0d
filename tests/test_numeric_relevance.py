"""Numeric-feature relevance screen (operators/relevance.py:
numeric_relevance): Pearson r / t-statistic vs scipy, degenerate
columns, one-aggregation plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _data(n=300, seed=11):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=n)
    strong = 2.0 * y + rng.normal(scale=0.5, size=n)
    weak = rng.normal(size=n)
    return y, strong, weak


@pytest.fixture
def xdf(spark):
    y, strong, weak = _data()
    return spark.createDataFrame(
        [
            (i, float(a), float(b), float(t))
            for i, (a, b, t) in enumerate(zip(strong, weak, y))
        ],
        ["rid", "strong", "weak", "y"],
    )


class TestNumericRelevance:
    def test_matches_scipy_pearson(self, spark, xdf):
        from temporalscope_spark.operators.relevance import numeric_relevance

        y, strong, weak = _data()
        got = {
            r["feature"]: r
            for r in numeric_relevance(xdf, ["strong", "weak"], "y").collect()
        }
        for name, x in (("strong", strong), ("weak", weak)):
            r = float(np.corrcoef(x, y)[0, 1])
            n = len(y)
            t = r * np.sqrt((n - 2) / (1 - r * r))
            assert got[name]["pearson_r"] == pytest.approx(round(r, 6), abs=1e-6)
            assert got[name]["t_stat"] == pytest.approx(round(float(t), 6), abs=1e-4)
            assert got[name]["n"] == n
        assert abs(got["strong"]["pearson_r"]) > abs(got["weak"]["pearson_r"])

    def test_null_pairs_excluded(self, spark, xdf):
        from temporalscope_spark.operators.relevance import numeric_relevance

        holey = xdf.withColumn(
            "strong", F.when(F.col("rid") % 3 != 0, F.col("strong"))
        )
        got = {
            r["feature"]: r
            for r in numeric_relevance(holey, ["strong"], "y").collect()
        }
        assert got["strong"]["n"] == 200  # pairwise-complete

    def test_degenerate_null(self, spark):
        from temporalscope_spark.operators.relevance import numeric_relevance

        df = spark.createDataFrame(
            [(1, 5.0, 1.0), (2, 5.0, 2.0)], ["rid", "const", "y"]
        )
        r = numeric_relevance(df, ["const"], "y").collect()[0]
        assert r["pearson_r"] is None and r["t_stat"] is None

    def test_one_aggregation(self, spark, xdf):
        from temporalscope_spark.operators.relevance import numeric_relevance

        plan = (
            numeric_relevance(xdf, ["strong", "weak"], "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1

    def test_errors(self, spark, xdf):
        from temporalscope_spark.operators.relevance import numeric_relevance

        with pytest.raises(DataFrameValidationError):
            numeric_relevance(xdf, [], "y")
        with pytest.raises(DataFrameValidationError):
            numeric_relevance(xdf, ["nope"], "y")
