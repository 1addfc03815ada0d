"""Purged time-series CV splits: fold sizing, purge/embargo semantics,
leakage property, error contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.cv import (
    fit_fold_bounds,
    purged_fold_summary,
    purged_time_series_splits,
)


@pytest.fixture(scope="module")
def ts_df(spark):
    # 103 rows (non-divisible by 5), unique irregular integer times
    rows = [(i, 10 * i + (i * 7) % 5, float(i % 13)) for i in range(103)]
    return spark.createDataFrame(rows, ["row_id", "t", "value"])


class TestFoldBounds:
    def test_equal_count_ntile_sizing(self, ts_df):
        bounds = fit_fold_bounds(ts_df, "t", n_folds=5)
        assert len(bounds) == 5
        summ = purged_fold_summary(ts_df, "t", 5, bounds=bounds).collect()
        sizes = [r["test_rows"] for r in sorted(summ, key=lambda r: r["fold"])]
        # edges[f] = floor(f*103/5) -> sizes [20,21,20,21,21]
        assert sizes == [20, 21, 20, 21, 21]
        assert sum(sizes) == 103

    def test_bounds_are_contiguous_and_ordered(self, ts_df):
        bounds = fit_fold_bounds(ts_df, "t", n_folds=4)
        for (lo, hi), (lo2, _) in zip(bounds, bounds[1:]):
            assert lo <= hi < lo2

    def test_errors(self, ts_df, spark):
        with pytest.raises(DataFrameValidationError, match="n_folds must be >= 2"):
            fit_fold_bounds(ts_df, "t", n_folds=1)
        tiny = spark.createDataFrame([(1, 1.0)], ["t", "v"])
        with pytest.raises(DataFrameValidationError, match="insufficient"):
            fit_fold_bounds(tiny, "t", n_folds=2)


class TestPurgeEmbargo:
    @pytest.mark.slow
    def test_train_test_disjoint_and_purged(self, ts_df):
        embargo = 50.0
        for fold in purged_time_series_splits(ts_df, "t", 4, embargo_seconds=embargo):
            test_ids = {r["row_id"] for r in fold["test"].collect()}
            train = fold["train"].collect()
            train_ids = {r["row_id"] for r in train}
            assert not (test_ids & train_ids)
            t_hi = max(r["t"] for r in fold["test"].collect())
            t_lo = min(r["t"] for r in fold["test"].collect())
            for r in train:
                # purge: never inside the test range; embargo: never within
                # (hi, hi + embargo]
                assert r["t"] < t_lo or r["t"] > t_hi + embargo

    def test_zero_embargo_covers_everything_outside(self, ts_df):
        total = ts_df.count()
        summ = purged_fold_summary(ts_df, "t", 5, embargo_seconds=0.0).collect()
        for r in summ:
            assert r["train_rows"] + r["test_rows"] == total

    @pytest.mark.slow
    def test_embargo_shrinks_train(self, ts_df):
        s0 = {r["fold"]: r["train_rows"]
              for r in purged_fold_summary(ts_df, "t", 4, embargo_seconds=0.0).collect()}
        s1 = {r["fold"]: r["train_rows"]
              for r in purged_fold_summary(ts_df, "t", 4, embargo_seconds=100.0).collect()}
        assert all(s1[f] <= s0[f] for f in s0)
        assert any(s1[f] < s0[f] for f in list(s0)[:-1])  # last fold has no "after"

    def test_summary_single_pass_matches_lazy_splits(self, ts_df):
        bounds = fit_fold_bounds(ts_df, "t", 3)
        summ = {r["fold"]: r for r in purged_fold_summary(
            ts_df, "t", 3, embargo_seconds=30.0, bounds=bounds).collect()}
        for f, fold in enumerate(purged_time_series_splits(
                ts_df, "t", 3, embargo_seconds=30.0, bounds=bounds)):
            assert fold["test"].count() == summ[f]["test_rows"]
            assert fold["train"].count() == summ[f]["train_rows"]

    def test_filters_are_pushed_down(self, ts_df, tmp_path):
        """Each fold's frames are literal range filters — they must reach the
        parquet scan as PushedFilters."""
        path = str(tmp_path / "cvdata")
        ts_df.write.parquet(path)
        df = ts_df.sparkSession.read.parquet(path)
        folds = list(purged_time_series_splits(df, "t", 3))
        # fold 0 is lower-unbounded (cut-point semantics) — check a middle fold
        plan = folds[1]["test"]._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "GreaterThan" in plan
        plan0 = folds[0]["test"]._jdf.queryExecution().executedPlan().toString()
        assert "LessThanOrEqual" in plan0


class TestDuplicateBoundaryTimestamps:
    def test_no_double_counting_on_tied_fold_edges(self, spark):
        """A timestamp value spanning a positional fold edge must land in
        exactly ONE fold (review finding: inclusive [lo,hi] ranges counted
        tied rows in both adjacent folds)."""
        rows = [(i, t) for i, t in enumerate([1, 1, 1, 1, 3, 4])]
        df = spark.createDataFrame(rows, "row_id long, t long")
        summ = purged_fold_summary(df, "t", n_folds=2, embargo_seconds=0.0).collect()
        total_test = sum(r["test_rows"] for r in summ)
        assert total_test == 6  # every row in exactly one fold
        for r in summ:
            assert r["train_rows"] + r["test_rows"] == 6  # exact partition

    def test_splits_disjoint_with_ties(self, spark):
        rows = [(i, t) for i, t in enumerate([1, 1, 1, 1, 3, 4, 4, 9])]
        df = spark.createDataFrame(rows, "row_id long, t long")
        seen = set()
        for fold in purged_time_series_splits(df, "t", 2):
            ids = {r["row_id"] for r in fold["test"].collect()}
            assert not (ids & seen)
            seen |= ids
        assert seen == set(range(8))
