"""Quantile binning + winsorization (operators/binning.py)."""

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.binning import (
    fit_quantile_edges,
    quantile_bin,
    winsorize,
)


@pytest.fixture
def nums(spark):
    rows = [(i, float(i)) for i in range(1, 101)] + [(101, None)]
    return spark.createDataFrame(rows, ["rid", "x"])


class TestQuantileBin:
    def test_edges_match_numpy(self, spark, nums):
        import numpy as np

        edges = fit_quantile_edges(nums, "x", bins=4)
        want = [
            round(float(np.percentile(np.arange(1.0, 101.0), p, method="linear")), 6)
            for p in (25, 50, 75)
        ]
        assert edges == want

    def test_bins_are_balanced(self, spark, nums):
        out = quantile_bin(nums, "x", bins=4)
        counts = {
            r["x_bin"]: r["cnt"]
            for r in out.groupBy("x_bin").agg(F.count("*").alias("cnt")).collect()
        }
        assert counts[None] == 1  # the null row
        assert sorted(k for k in counts if k is not None) == [1, 2, 3, 4]
        spread = [counts[k] for k in (1, 2, 3, 4)]
        assert max(spread) - min(spread) <= 1

    def test_pre_fit_edges_reused(self, spark, nums):
        edges = fit_quantile_edges(nums, "x", bins=4)
        half = nums.filter("rid <= 50")
        out = quantile_bin(half, "x", edges=edges)
        # transform with train-fit edges: values 1..50 all land in bins 1-2
        assert {r["x_bin"] for r in out.collect()} == {1, 2}

    def test_approx_lane_close_to_exact(self, spark, nums):
        exact = fit_quantile_edges(nums, "x", bins=4)
        approx = fit_quantile_edges(nums, "x", bins=4, approx=True)
        for e, a in zip(exact, approx):
            assert abs(e - a) <= 2.0  # within sketch rank error on 1..100

    def test_validations(self, spark, nums):
        with pytest.raises(DataFrameValidationError, match="bins"):
            fit_quantile_edges(nums, "x", bins=1)
        with pytest.raises(DataFrameValidationError, match="missing"):
            fit_quantile_edges(nums, "nope")
        allnull = nums.filter("x IS NULL")
        with pytest.raises(DataFrameValidationError, match="no non-null"):
            fit_quantile_edges(allnull, "x")


class TestWinsorize:
    def test_clips_tails(self, spark, nums):
        out = {r["rid"]: r["x_wins"] for r in winsorize(nums, ["x"], 0.05, 0.95).collect()}
        import numpy as np

        lo = round(float(np.percentile(np.arange(1.0, 101.0), 5)), 6)
        hi = round(float(np.percentile(np.arange(1.0, 101.0), 95)), 6)
        assert out[1] == lo and out[100] == hi
        assert out[50] == 50.0  # interior passes through untouched
        assert out[101] is None

    def test_multiple_columns_one_pass(self, spark, nums):
        df = nums.withColumn("y", nums.x * -1)
        out = winsorize(df, ["x", "y"], 0.1, 0.9)
        assert {"x_wins", "y_wins"} <= set(out.columns)

    def test_validations(self, spark, nums):
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            winsorize(nums, [])
        with pytest.raises(DataFrameValidationError, match="lower < upper"):
            winsorize(nums, ["x"], 0.9, 0.1)
        with pytest.raises(DataFrameValidationError, match="missing"):
            winsorize(nums, ["nope"])
