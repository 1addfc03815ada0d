"""IRLS quantile regression (modeling/quantile.py): pinball-descent
fit, heteroscedastic quantile recovery, step parity, guards."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling import fit_quantile, quantile_step


def _data(n=3000, seed=2):
    rng = np.random.RandomState(seed)
    x = rng.rand(n) * 10
    y = 2.0 + 1.0 * x + (0.2 + 0.3 * x) * rng.randn(n)
    return x, y


class TestQuantileRegression:
    def test_median_and_p90_recovery(self, spark):
        x, y = _data()
        df = spark.createDataFrame(
            [(float(y[i]), float(x[i])) for i in range(len(x))],
            "y double, x double",
        )
        m50 = fit_quantile(df, ["x"], "y", tau=0.5)
        m90 = fit_quantile(df, ["x"], "y", tau=0.9)
        # theory: q_tau = 2 + x + (0.2+0.3x)*z_tau
        assert abs(m50.intercept - 2.0) < 0.15
        assert abs(m50.coefs["x"] - 1.0) < 0.05
        z90 = 1.2816
        assert abs(m90.coefs["x"] - (1.0 + 0.3 * z90)) < 0.08
        assert m90.coefs["x"] > m50.coefs["x"]   # heteroscedasticity resolved
        assert m50.converged and m90.converged

    def test_step_numpy_parity(self, spark):
        x, y = _data(n=500, seed=5)
        df = spark.createDataFrame(
            [(float(y[i]), float(x[i])) for i in range(len(x))],
            "y double, x double",
        )
        ic, beta, n, loss = quantile_step(
            df, ["x"], "y", 0.7, {"x": 0.5}, 1.0, delta=1e-3
        )
        eta = 1.0 + 0.5 * x
        r = y - eta
        w = np.where(r > 0, 0.7, 0.3) / np.maximum(np.abs(r), 1e-3)
        X = np.column_stack([np.ones(len(x)), x])
        sol = np.linalg.solve(X.T @ (w[:, None] * X), X.T @ (w * y))
        pin = np.where(r > 0, 0.7 * r, -0.3 * r).sum()
        assert ic == pytest.approx(sol[0], abs=1e-8)
        assert beta["x"] == pytest.approx(sol[1], abs=1e-8)
        assert loss == pytest.approx(pin, rel=1e-9)
        assert n == 500

    def test_pinball_loss_decreases(self, spark):
        x, y = _data(n=800, seed=7)
        df = spark.createDataFrame(
            [(float(y[i]), float(x[i])) for i in range(len(x))],
            "y double, x double",
        )
        beta, ic = {"x": 0.0}, 0.0
        losses = []
        for _ in range(6):
            ic, beta, _, loss = quantile_step(df, ["x"], "y", 0.5, beta, ic)
            losses.append(loss)
        assert losses[-1] < losses[0]

    def test_quantile_coverage_property(self, spark):
        x, y = _data(n=2000, seed=9)
        df = spark.createDataFrame(
            [(float(y[i]), float(x[i])) for i in range(len(x))],
            "y double, x double",
        )
        m = fit_quantile(df, ["x"], "y", tau=0.8)
        below = (y <= m.intercept + m.coefs["x"] * x).mean()
        assert abs(below - 0.8) < 0.03   # ~80% of points under the p80 line

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "y double, x double")
        with pytest.raises(DataFrameValidationError):
            quantile_step(df, ["x"], "y", 1.5, {"x": 0.0}, 0.0)
        with pytest.raises(DataFrameValidationError):
            quantile_step(df, ["x"], "y", 0.5, {"x": 0.0}, 0.0, delta=0.0)
        with pytest.raises(DataFrameValidationError):
            fit_quantile(df, [], "y")
