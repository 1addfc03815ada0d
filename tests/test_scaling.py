"""Multivariate Mahalanobis outlier scoring (operators/scaling.py):
rounded-model replay parity, chi-square mean property, guards."""

from __future__ import annotations

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError

class TestMahalanobis:
    def test_replay_parity_and_chi2_mean(self, spark):
        import numpy as np

        from temporalscope_spark.operators.scaling import (
            fit_mahalanobis,
            mahalanobis_score,
        )

        rng = np.random.RandomState(1)
        X = rng.multivariate_normal([1, -2], [[2, 0.8], [0.8, 1]], 1500)
        rows = [(i, float(X[i, 0]), float(X[i, 1])) for i in range(1500)]
        df = spark.createDataFrame(rows, "id long, x1 double, x2 double")
        m = fit_mahalanobis(df, ["x1", "x2"])
        got = {r["id"]: r["mahalanobis"]
               for r in mahalanobis_score(df, m, keep_cols=["id"]).collect()}
        mu, inv = np.array(m["mean"]), np.array(m["inv"])
        for i in range(0, 1500, 97):
            ref = float((X[i] - mu) @ inv @ (X[i] - mu))
            assert got[i] == pytest.approx(ref, abs=1e-5)
        assert np.mean(list(got.values())) == pytest.approx(2.0, abs=0.15)

    def test_outlier_scores_high(self, spark):
        import numpy as np

        from temporalscope_spark.operators.scaling import (
            fit_mahalanobis,
            mahalanobis_score,
        )

        rng = np.random.RandomState(2)
        X = rng.randn(500, 2)
        rows = [(i, float(X[i, 0]), float(X[i, 1])) for i in range(500)]
        rows.append((999, 8.0, -8.0))
        df = spark.createDataFrame(rows, "id long, x1 double, x2 double")
        m = fit_mahalanobis(df, ["x1", "x2"])
        got = {r["id"]: r["mahalanobis"]
               for r in mahalanobis_score(df, m, keep_cols=["id"]).collect()}
        assert got[999] > max(v for k, v in got.items() if k != 999)

    def test_null_rows_score_null(self, spark):
        from temporalscope_spark.operators.scaling import (
            fit_mahalanobis,
            mahalanobis_score,
        )

        rows = [(i, float(i % 7), float((i * 3) % 5)) for i in range(40)]
        rows.append((99, None, 1.0))
        df = spark.createDataFrame(rows, "id long, x1 double, x2 double")
        m = fit_mahalanobis(df, ["x1", "x2"])
        got = {r["id"]: r["mahalanobis"]
               for r in mahalanobis_score(df, m, keep_cols=["id"]).collect()}
        assert got[99] is None

    def test_singular_raises(self, spark):
        from temporalscope_spark.operators.scaling import fit_mahalanobis

        rows = [(float(i), float(2 * i)) for i in range(30)]  # collinear
        df = spark.createDataFrame(rows, "x1 double, x2 double")
        with pytest.raises(DataFrameValidationError, match="singular"):
            fit_mahalanobis(df, ["x1", "x2"])

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.scaling import fit_mahalanobis

        df = spark.createDataFrame([(1.0, 2.0)], "x1 double, x2 double")
        with pytest.raises(DataFrameValidationError):
            fit_mahalanobis(df, ["x1"])
        with pytest.raises(DataFrameValidationError):
            fit_mahalanobis(df, ["x1", "nope"])
