"""IRLS Poisson regression (modeling/poisson.py): numpy Fisher-scoring
parity, planted-rate recovery, guards."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling import fit_poisson, poisson_step


def _numpy_irls(X, y, iters=60, tol=1e-12):
    b = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = np.clip(X @ b, -30, 30)
        mu = np.exp(eta)
        z = eta + (y - mu) / mu
        A = X.T @ (mu[:, None] * X)
        bn = np.linalg.solve(A, X.T @ (mu * z))
        if np.max(np.abs(bn - b)) < tol:
            return bn
        b = bn
    return b


def _data(n=2500, seed=2):
    rng = np.random.RandomState(seed)
    x1, x2 = rng.randn(n), rng.rand(n)
    eta = 0.5 + 0.8 * x1 - 1.2 * x2
    y = rng.poisson(np.exp(eta)).astype(float)
    return x1, x2, y


class TestFitPoisson:
    def test_numpy_parity_and_recovery(self, spark):
        x1, x2, y = _data()
        rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        m = fit_poisson(df, ["x1", "x2"], "y")
        X = np.column_stack([np.ones(len(y)), x1, x2])
        ref = _numpy_irls(X, y)
        assert m.converged
        assert m.intercept == pytest.approx(ref[0], abs=1e-6)
        assert m.coefs["x1"] == pytest.approx(ref[1], abs=1e-6)
        assert m.coefs["x2"] == pytest.approx(ref[2], abs=1e-6)
        # recovers the planted generating coefficients at this n
        assert abs(m.intercept - 0.5) < 0.1
        assert abs(m.coefs["x1"] - 0.8) < 0.1
        assert abs(m.coefs["x2"] + 1.2) < 0.15

    def test_first_step_closed_form(self, spark):
        # at beta=0: mu=1, w=1, z=y-1 -> the step is plain OLS of (y-1) on X
        x1, x2, y = _data(n=400, seed=5)
        rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        ic, beta, n, ll = poisson_step(df, ["x1", "x2"], "y", {"x1": 0.0, "x2": 0.0}, 0.0)
        X = np.column_stack([np.ones(len(y)), x1, x2])
        ref = np.linalg.solve(X.T @ X, X.T @ (y - 1))
        assert n == 400
        assert ll == pytest.approx(-400.0)          # sum(y*0 - 1)
        assert ic == pytest.approx(ref[0], abs=1e-8)
        assert beta["x1"] == pytest.approx(ref[1], abs=1e-8)

    def test_predict_rate(self, spark):
        x1, x2, y = _data(n=800, seed=7)
        rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        m = fit_poisson(df, ["x1", "x2"], "y")
        scored = m.predict_rate(df).collect()
        for r in scored[:50]:
            eta = m.intercept + m.coefs["x1"] * r["x1"] + m.coefs["x2"] * r["x2"]
            assert r["rate"] == pytest.approx(np.exp(eta), abs=1e-4)

    def test_negative_target_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.5), (-2.0, 0.1), (3.0, 0.9)], "y double, x double"
        )
        with pytest.raises(DataFrameValidationError, match="negative"):
            fit_poisson(df, ["x"], "y")

    def test_null_rows_dropped(self, spark):
        rows = [(2.0, 1.0), (None, 2.0), (3.0, None), (1.0, 0.5)]
        df = spark.createDataFrame(rows, "y double, x double")
        _, _, n, _ = poisson_step(df, ["x"], "y", {"x": 0.0}, 0.0)
        assert n == 2

    def test_empty_feature_list_raises(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "y double, x double")
        with pytest.raises(DataFrameValidationError):
            fit_poisson(df, [], "y")
