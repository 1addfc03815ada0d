"""Cox proportional hazards (operators/survival.py:cox_step/fit_cox):
pure-python Breslow-Newton parity, planted-coefficient recovery, tie
handling, guards."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.survival import cox_step, fit_cox


def _cox_ref(dur, ev, X, iters=30):
    b = np.zeros(X.shape[1])
    order = np.argsort(-dur)
    d_, e_, X_ = dur[order], ev[order], X[order]
    for _ in range(iters):
        eta = X_ @ b
        w = np.exp(eta)
        U = np.zeros(len(b))
        Im = np.zeros((len(b), len(b)))
        ll = 0.0
        cw, cwx, cwxx = 0.0, np.zeros(len(b)), np.zeros((len(b), len(b)))
        i = 0
        while i < len(d_):
            j = i
            while j < len(d_) and d_[j] == d_[i]:
                cw += w[j]
                cwx += w[j] * X_[j]
                cwxx += w[j] * np.outer(X_[j], X_[j])
                j += 1
            dt = e_[i:j].sum()
            if dt > 0:
                sxe = (e_[i:j, None] * X_[i:j]).sum(axis=0)
                U += sxe - dt * cwx / cw
                Im += dt * (cwxx / cw - np.outer(cwx, cwx) / cw**2)
                ll += (e_[i:j] * eta[i:j]).sum() - dt * np.log(cw)
            i = j
        step = np.linalg.solve(Im, U)
        if np.max(np.abs(step)) < 1e-12:
            break
        b = b + step
    return b, ll


def _sim(n=1200, seed=3):
    rng = np.random.RandomState(seed)
    x1, x2 = rng.randn(n), rng.rand(n)
    lam = 0.1 * np.exp(0.8 * x1 - 0.5 * x2)
    T = rng.exponential(1 / lam)
    C = rng.exponential(20, n)
    return np.minimum(T, C), (T <= C).astype(float), x1, x2


class TestCox:
    def test_fit_parity_and_recovery(self, spark):
        dur, ev, x1, x2 = _sim()
        rows = [tuple(map(float, r)) for r in zip(dur, ev, x1, x2)]
        df = spark.createDataFrame(rows, "dur double, ev double, x1 double, x2 double")
        fit = fit_cox(df, "dur", "ev", ["x1", "x2"])
        bref, llref = _cox_ref(dur, ev, np.column_stack([x1, x2]))
        assert fit["coefs"]["x1"] == pytest.approx(bref[0], abs=1e-5)
        assert fit["coefs"]["x2"] == pytest.approx(bref[1], abs=1e-5)
        assert fit["loglik"] == pytest.approx(llref, rel=1e-9)
        assert abs(fit["coefs"]["x1"] - 0.8) < 0.15   # planted hazard
        assert abs(fit["coefs"]["x2"] + 0.5) < 0.3

    def test_single_step_with_breslow_ties(self, spark):
        # integer durations force heavy ties: parity must still hold
        rng = np.random.RandomState(9)
        n = 400
        x = rng.randn(n)
        dur = rng.randint(1, 8, n).astype(float)
        ev = (rng.rand(n) < 0.7).astype(float)
        rows = [(float(dur[i]), float(ev[i]), float(x[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "dur double, ev double, x double")
        nb, nr, ne, ll = cox_step(df, "dur", "ev", ["x"], {"x": 0.3})
        # one reference Newton step from 0.3
        order = np.argsort(-dur)
        d_, e_, x_ = dur[order], ev[order], x[order]
        eta = 0.3 * x_
        w = np.exp(eta)
        U = I = llr = 0.0
        cw = cwx = cwxx = 0.0
        i = 0
        while i < n:
            j = i
            while j < n and d_[j] == d_[i]:
                cw += w[j]; cwx += w[j] * x_[j]; cwxx += w[j] * x_[j] ** 2; j += 1
            dt = e_[i:j].sum()
            if dt > 0:
                U += (e_[i:j] * x_[i:j]).sum() - dt * cwx / cw
                I += dt * (cwxx / cw - (cwx / cw) ** 2)
                llr += (e_[i:j] * eta[i:j]).sum() - dt * np.log(cw)
            i = j
        assert nb["x"] == pytest.approx(0.3 + U / I, abs=1e-8)
        assert ll == pytest.approx(llr, rel=1e-9)
        assert nr == n and ne == int(ev.sum())

    def test_no_events_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.0, 0.5), (2.0, 0.0, 0.1)], "dur double, ev double, x double"
        )
        with pytest.raises(DataFrameValidationError, match="no events"):
            cox_step(df, "dur", "ev", ["x"])

    def test_non_binary_event_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0, 0.5)], "dur double, ev double, x double"
        )
        with pytest.raises(DataFrameValidationError, match="0/1"):
            cox_step(df, "dur", "ev", ["x"])

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1.0, 1.0, 0.5)], "dur double, ev double, x double")
        with pytest.raises(DataFrameValidationError):
            cox_step(df, "dur", "ev", [])
        with pytest.raises(DataFrameValidationError):
            cox_step(df, "dur", "ev", ["nope"])
