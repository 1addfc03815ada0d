"""Closed-form linear trainer + exact linear SHAP (modeling/linear.py).

Reference parity target: the TemporalModelTrainer protocol
(/root/reference/src/temporalscope/modeling/temporal_model_trainer.py:18-115,
commented-out) — per-phase train-split fit, test-split metrics. Correctness
gauge is numpy's lstsq on the same rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling import (
    LinearModel,
    TemporalModelTrainer,
    fit_linear,
    linear_shap_importance,
)


@pytest.fixture(scope="module")
def lin_df(spark):
    rng = np.random.RandomState(11)
    n = 4000
    x1 = rng.randn(n)
    x2 = rng.randn(n) * 2.0 + 1.0
    y = 3.0 + 1.5 * x1 - 0.75 * x2 + rng.randn(n) * 0.1
    pdf = pd.DataFrame(
        {
            "t": pd.to_datetime(1_700_000_000 + np.arange(n), unit="s"),
            "x1": x1,
            "x2": x2,
            "y": y,
        }
    )
    return spark.createDataFrame(pdf), pdf


class TestFitLinear:
    def test_recovers_coefficients(self, lin_df):
        df, pdf = lin_df
        m = fit_linear(df, ["x1", "x2"], "y")
        X = np.column_stack([np.ones(len(pdf)), pdf["x1"], pdf["x2"]])
        beta, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy(), rcond=None)
        assert m.intercept == pytest.approx(beta[0], rel=1e-8)
        assert m.coefs["x1"] == pytest.approx(beta[1], rel=1e-8)
        assert m.coefs["x2"] == pytest.approx(beta[2], rel=1e-8)
        resid = pdf["y"].to_numpy() - X @ beta
        assert m.train_rmse == pytest.approx(float(np.sqrt((resid**2).mean())), rel=1e-6)
        assert 0.99 < m.train_r2 <= 1.0

    def test_ridge_shrinks_but_not_intercept(self, lin_df):
        df, _ = lin_df
        ols = fit_linear(df, ["x1", "x2"], "y")
        rr = fit_linear(df, ["x1", "x2"], "y", ridge=1e4)
        assert abs(rr.coefs["x1"]) < abs(ols.coefs["x1"])
        assert abs(rr.coefs["x2"]) < abs(ols.coefs["x2"])
        # heavy shrinkage pulls predictions toward the (unpenalized) mean —
        # the intercept compensates, it is not driven to zero
        assert abs(rr.intercept) > 0.1

    def test_null_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, None), (3.0, 6.0)],
            ["x1", "y"],
        )
        m = fit_linear(df, ["x1"], "y")
        assert m.n_rows == 3
        assert m.coefs["x1"] == pytest.approx(2.0, abs=1e-9)
        assert m.intercept == pytest.approx(0.0, abs=1e-9)

    def test_empty_raises(self, spark):
        df = spark.createDataFrame([], "x1 double, y double")
        with pytest.raises(DataFrameValidationError):
            fit_linear(df, ["x1"], "y")
        with pytest.raises(DataFrameValidationError):
            fit_linear(df, [], "y")

    def test_predict_is_expression_only(self, lin_df):
        df, pdf = lin_df
        m = fit_linear(df, ["x1", "x2"], "y")
        scored = m.with_prediction(df)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow map: no shuffle
        got = scored.select("prediction").limit(5).toPandas()["prediction"]
        X = np.column_stack([np.ones(5), pdf["x1"][:5], pdf["x2"][:5]])
        want = X @ np.array([m.intercept, m.coefs["x1"], m.coefs["x2"]])
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestLinearShap:
    def test_exact_linear_shap_values(self, lin_df):
        df, pdf = lin_df
        m = fit_linear(df, ["x1", "x2"], "y")
        fn = linear_shap_importance(m)
        out = fn(df, ["x1", "x2"]).select("x1", "imp_x1", "imp_x2").limit(10).toPandas()
        want = np.abs(m.coefs["x1"] * (out["x1"] - m.feature_means["x1"]))
        np.testing.assert_allclose(out["imp_x1"], want, rtol=1e-9)

    def test_unknown_feature_raises(self, lin_df):
        df, _ = lin_df
        m = fit_linear(df, ["x1"], "y")
        with pytest.raises(DataFrameValidationError):
            linear_shap_importance(m)(df, ["x2"])

    def test_shap_additivity(self, lin_df):
        """Σ_f φ_f(x) + E[ŷ] == ŷ(x) — the SHAP axiom, exact for linear."""
        df, _ = lin_df
        m = fit_linear(df, ["x1", "x2"], "y")
        phi = df.select(
            (
                F.lit(m.coefs["x1"]) * (F.col("x1") - F.lit(m.feature_means["x1"]))
                + F.lit(m.coefs["x2"]) * (F.col("x2") - F.lit(m.feature_means["x2"]))
                + F.lit(
                    m.intercept
                    + m.coefs["x1"] * m.feature_means["x1"]
                    + m.coefs["x2"] * m.feature_means["x2"]
                )
            ).alias("recon"),
            m.predict_col().alias("pred"),
        ).limit(50).toPandas()
        np.testing.assert_allclose(phi["recon"], phi["pred"], rtol=1e-9)


class TestTemporalModelTrainer:
    def test_per_phase_fit_and_metrics(self, spark):
        from temporalscope_spark.frame import TemporalFrame
        from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

        rng = np.random.RandomState(5)
        n = 2000
        # regime change halfway: phase-dependent slope the trainer must find
        x = rng.randn(n)
        slope = np.where(np.arange(n) < n // 2, 2.0, -1.0)
        y = slope * x + rng.randn(n) * 0.05
        pdf = pd.DataFrame(
            {
                "t": pd.to_datetime(1_700_000_000 + np.arange(n), unit="s"),
                "x": x,
                "y": y,
            }
        )
        tf = TemporalFrame(spark.createDataFrame(pdf), time_col="t", target_col="y")
        part = SlidingWindowPartitioner(tf, num_partitions=2, train_pct=0.7, test_pct=0.3)
        part.setup()
        part.fit()
        trainer = TemporalModelTrainer(part, ["x"], "y")
        models = trainer.fit()
        assert set(models) == {0, 1}
        assert models[0].coefs["x"] == pytest.approx(2.0, abs=0.05)
        assert models[1].coefs["x"] == pytest.approx(-1.0, abs=0.05)
        for m in models.values():
            assert m.metrics["n_train"] > 0
            assert m.metrics["n_test"] > 0
            assert m.metrics["test_rmse"] < 0.2
            assert 0.9 < m.metrics["test_r2"] <= 1.0

    def test_masv_with_exact_shap(self, spark):
        """End-to-end: trainer's global model powers an exact-SHAP MASV —
        the feature driving y gets the dominant importance in every phase."""
        from temporalscope_spark.frame import TemporalFrame
        from temporalscope_spark.metrics.masv import calculate_masv
        from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

        rng = np.random.RandomState(8)
        n = 1200
        x1 = rng.randn(n)
        x2 = rng.randn(n)
        y = 5.0 * x1 + 0.1 * x2 + rng.randn(n) * 0.01
        pdf = pd.DataFrame(
            {
                "t": pd.to_datetime(1_700_000_000 + np.arange(n), unit="s"),
                "x1": x1,
                "x2": x2,
                "y": y,
            }
        )
        df = spark.createDataFrame(pdf)
        tf = TemporalFrame(df, time_col="t", target_col="y")
        part = SlidingWindowPartitioner(tf, num_partitions=3, train_pct=0.7, test_pct=0.3)
        part.setup()
        part.fit()
        model = fit_linear(df, ["x1", "x2"], "y")
        masv = calculate_masv(
            part, ["x1", "x2"], importance_fn=linear_shap_importance(model)
        )
        assert len(masv["x1"]) == 3
        for p in range(3):
            assert masv["x1"][p] > 10 * masv["x2"][p]


def _np_irls(X, y, ridge=0.0, max_iters=25, tol=1e-8, eps=1e-10):
    """Row-level numpy IRLS with the SAME clamps as modeling/logistic.py —
    the reference implementation the Spark aggregation path must match."""
    n, p = X.shape
    Xd = np.hstack([np.ones((n, 1)), X])
    beta = np.zeros(p + 1)
    for _ in range(max_iters):
        eta = Xd @ beta
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), eps, 1.0 - eps)
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w
        A = Xd.T @ (w[:, None] * Xd)
        if ridge:
            A[1:, 1:] += ridge * np.eye(p)
        b = Xd.T @ (w * z)
        new = np.linalg.solve(A, b)
        if np.max(np.abs(new - beta)) < tol:
            return new
        beta = new
    raise RuntimeError("reference IRLS did not converge")


@pytest.fixture(scope="module")
def logit_df(spark):
    rng = np.random.RandomState(7)
    n = 4000
    x1 = rng.randn(n)
    x2 = rng.randn(n) * 1.5
    p = 1.0 / (1.0 + np.exp(-(0.5 + 1.2 * x1 - 0.8 * x2)))
    y = (rng.rand(n) < p).astype(float)
    pdf = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    return spark.createDataFrame(pdf), pdf


class TestFitLogistic:
    def test_matches_numpy_irls(self, logit_df):
        """The Spark aggregation path equals row-level numpy IRLS (same
        clamps, same solve) to near machine precision — the contract of
        'training is just sufficient statistics'."""
        from temporalscope_spark.modeling import fit_logistic

        df, pdf = logit_df
        m = fit_logistic(df, ["x1", "x2"], "y")
        ref = _np_irls(pdf[["x1", "x2"]].to_numpy(), pdf["y"].to_numpy())
        got = np.array([m.intercept, m.coefs["x1"], m.coefs["x2"]])
        np.testing.assert_allclose(got, ref, rtol=1e-8)
        assert m.converged and m.n_iters <= 10

    def test_recovers_planted_coefficients(self, logit_df):
        from temporalscope_spark.modeling import fit_logistic

        df, _ = logit_df
        m = fit_logistic(df, ["x1", "x2"], "y")
        # MLE at n=4000: planted (0.5, 1.2, -0.8) recovered within ~15%
        assert abs(m.intercept - 0.5) < 0.2
        assert abs(m.coefs["x1"] - 1.2) < 0.2
        assert abs(m.coefs["x2"] + 0.8) < 0.2

    def test_ridge_matches_numpy(self, logit_df):
        from temporalscope_spark.modeling import fit_logistic

        df, pdf = logit_df
        m = fit_logistic(df, ["x1", "x2"], "y", ridge=5.0)
        ref = _np_irls(pdf[["x1", "x2"]].to_numpy(), pdf["y"].to_numpy(), ridge=5.0)
        got = np.array([m.intercept, m.coefs["x1"], m.coefs["x2"]])
        np.testing.assert_allclose(got, ref, rtol=1e-8)
        # ridge shrinks vs unpenalized
        m0 = fit_logistic(df, ["x1", "x2"], "y")
        assert abs(m.coefs["x1"]) < abs(m0.coefs["x1"])

    def test_predict_proba_expression(self, logit_df):
        from temporalscope_spark.modeling import fit_logistic

        df, pdf = logit_df
        m = fit_logistic(df, ["x1", "x2"], "y")
        out = m.with_prediction(df).select("probability").toPandas()["probability"]
        assert ((out > 0) & (out < 1)).all()
        eta = m.intercept + m.coefs["x1"] * pdf["x1"] + m.coefs["x2"] * pdf["x2"]
        want = 1.0 / (1.0 + np.exp(-eta))
        np.testing.assert_allclose(np.sort(out), np.sort(want), rtol=1e-12)

    def test_one_step_is_weighted_ols(self, logit_df):
        """A single irls_step from a fixed beta equals the numpy weighted
        normal-equations solve at that beta — what the driver oracle replays."""
        from temporalscope_spark.modeling import irls_step

        df, pdf = logit_df
        beta0 = {"x1": 0.3, "x2": -0.2}
        ic0 = 0.1
        ic, beta, n, ll = irls_step(df, ["x1", "x2"], "y", beta0, ic0)
        X = pdf[["x1", "x2"]].to_numpy()
        y = pdf["y"].to_numpy()
        Xd = np.hstack([np.ones((len(y), 1)), X])
        b0 = np.array([ic0, beta0["x1"], beta0["x2"]])
        eta = Xd @ b0
        mu = np.clip(1 / (1 + np.exp(-eta)), 1e-10, 1 - 1e-10)
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        ref = np.linalg.solve(Xd.T @ (w[:, None] * Xd), Xd.T @ (w * z))
        np.testing.assert_allclose([ic, beta["x1"], beta["x2"]], ref, rtol=1e-9)
        ref_ll = float(np.sum(y * eta - np.log1p(np.exp(eta))))
        assert ll == pytest.approx(ref_ll, rel=1e-9)

    def test_rejects_non_binary_target(self, spark):
        from temporalscope_spark.modeling import fit_logistic

        df = spark.createDataFrame(
            [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)], "x double, y double"
        )
        with pytest.raises(DataFrameValidationError, match="outside"):
            fit_logistic(df, ["x"], "y")

    @pytest.mark.slow
    def test_raises_on_separable_non_convergence(self, spark):
        """Perfectly separable data: coefficients diverge; the fit must
        RAISE, not return a half-stepped model."""
        from temporalscope_spark.modeling import fit_logistic

        rows = [(float(i), 0.0) for i in range(-20, 0)] + [
            (float(i), 1.0) for i in range(1, 21)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        with pytest.raises(DataFrameValidationError, match="converge"):
            fit_logistic(df, ["x"], "y", max_iters=30)
        # ...and ridge restores convergence (the documented fix)
        m = fit_logistic(df, ["x"], "y", ridge=1.0, max_iters=50)
        assert m.converged and m.coefs["x"] > 0

    def test_empty_and_bad_args(self, spark):
        from temporalscope_spark.modeling import fit_logistic

        df = spark.createDataFrame([(1.0, None)], "x double, y double")
        with pytest.raises(DataFrameValidationError, match="no rows"):
            fit_logistic(df, ["x"], "y")
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            fit_logistic(df, [], "y")
