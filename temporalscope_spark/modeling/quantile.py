"""IRLS quantile regression — conditional-quantile modeling completing
the GLM-style family (linear = conditional mean, logistic = class
probability, poisson = count rate, THIS = conditional τ-quantile: p50
latency, p90 tokens-per-doc, p10 revenue).

Minimizes the pinball (check) loss Σ ρ_τ(y − x'β) by iteratively
reweighted least squares (Schnabel 1980 smoothing of the LAD/quantile
program): at the current residuals r,

    w_i = τ / max(|r_i|, δ)        r_i > 0
        = (1−τ) / max(|r_i|, δ)    r_i ≤ 0
    β ← (Xᵀ W X + λI)⁻¹ Xᵀ W y

— each round is ONE map-side-combinable aggregation of weighted
sufficient statistics (the ``modeling.logistic``/``modeling.poisson``
shape: Σ w·x_i·x_j upper triangle, Σ w·x_i·y, Σ w·y, Σ w, plus the
pinball loss for monitoring) and a (p+1)² numpy solve of plan-literal
coefficients. δ is the standard smoothing floor — it bounds the weights
and makes the fixed point a δ-smoothed quantile (δ → 0 recovers the
exact quantile program at the cost of IRLS crawl — extreme τ with tiny
δ converges in hundreds of rounds; the default 1e-3 trades a
sub-noise-level smoothing bias for convergence in tens of rounds).

Convergence note: IRLS on a non-smooth loss cycles within ~δ of the
optimum rather than contracting quadratically, so ``fit_quantile``
declares convergence on parameter movement < tol and also on loss
stagnation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


@dataclass(frozen=True)
class QuantileModel:
    """Frozen fit result: coefficients + fit diagnostics."""

    feature_cols: tuple[str, ...]
    tau: float
    coefs: dict[str, float]
    intercept: float
    n_rows: int
    n_iters: int
    pinball_loss: float
    converged: bool
    ridge: float

    def predict(self, df: DataFrame, out_col: str = "q_pred") -> DataFrame:
        """Attach the predicted τ-quantile (rounded 6)."""
        eta = _eta(self.feature_cols, self.coefs, self.intercept)
        return df.withColumn(out_col, F.round(eta, 6))


def _eta(feature_cols: Sequence[str], beta: dict, intercept: float) -> Column:
    eta = F.lit(float(intercept))
    for c in feature_cols:
        eta = eta + F.lit(float(beta[c])) * F.col(c).cast("double")
    return eta


def quantile_step(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    tau: float,
    beta: dict,
    intercept: float,
    ridge: float = 0.0,
    delta: float = 1e-3,
):
    """ONE IRLS round at the current (beta, intercept). Returns
    (new_intercept, new_beta, n_rows, pinball_loss). Exposed (and
    driver-oracled as the ``quantile_step`` query) because the fit is
    this round iterated — weights use only |r| and a branch, so the
    round is transcendental-free and the oracle replay is structurally
    exact at ANY starting point (unlike the logistic/poisson steps,
    which need β = 0 for that)."""
    import numpy as np  # noqa: PLC0415

    if not (0.0 < tau < 1.0):
        raise DataFrameValidationError("quantile_step: tau must be in (0, 1)")
    if delta <= 0:
        raise DataFrameValidationError("quantile_step: delta must be > 0")
    y = F.col(target_col).cast("double")
    xs = [F.col(c).cast("double") for c in feature_cols]
    eta = _eta(feature_cols, beta, intercept)
    r = y - eta
    w = F.when(
        r > 0, F.lit(float(tau)) / F.greatest(F.abs(r), F.lit(float(delta)))
    ).otherwise(
        F.lit(1.0 - float(tau)) / F.greatest(F.abs(r), F.lit(float(delta)))
    )
    pin = F.when(r > 0, F.lit(float(tau)) * r).otherwise(
        F.lit(float(tau) - 1.0) * r
    )

    p = len(feature_cols)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(w).alias("_sw"),
        F.sum(w * y).alias("_swy"),
        F.sum(pin).alias("_loss"),
    ]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(w * xi).alias(f"_swx{i}"))
        aggs.append(F.sum(w * xi * y).alias(f"_swxy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(w * xi * xs[j]).alias(f"_swxx{i}_{j}"))
    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    row = df.filter(cond).agg(*aggs).first()
    n = int(row["_n"])
    if n == 0:
        raise DataFrameValidationError("fit_quantile: no rows after null filtering")
    k = p + 1
    A = np.zeros((k, k))
    b = np.zeros(k)
    A[0, 0] = row["_sw"]
    b[0] = row["_swy"]
    for i in range(p):
        A[0, i + 1] = A[i + 1, 0] = row[f"_swx{i}"]
        b[i + 1] = row[f"_swxy{i}"]
        for j in range(i, p):
            A[i + 1, j + 1] = A[j + 1, i + 1] = row[f"_swxx{i}_{j}"]
    if ridge:
        for i in range(p):
            A[i + 1, i + 1] += float(ridge)
    sol = np.linalg.solve(A, b)
    new_intercept = float(sol[0])
    new_beta = {c: float(sol[i + 1]) for i, c in enumerate(feature_cols)}
    return new_intercept, new_beta, n, float(row["_loss"])


def fit_quantile(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    tau: float = 0.5,
    ridge: float = 0.0,
    max_iters: int = 60,
    tol: float = 1e-6,
    delta: float = 1e-3,
) -> QuantileModel:
    """Fit τ-quantile regression by iterated :func:`quantile_step`.
    Converges on parameter movement < tol OR pinball-loss stagnation
    (< tol relative over a round — the documented IRLS-on-nonsmooth
    behavior); raises only if NEITHER happens in ``max_iters``."""
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    beta = {c: 0.0 for c in feature_cols}
    intercept = 0.0
    n = 0
    prev_loss = float("inf")
    for it in range(1, max_iters + 1):
        new_intercept, new_beta, n, loss = quantile_step(
            df, feature_cols, target_col, tau, beta, intercept,
            ridge=ridge, delta=delta,
        )
        move = max(
            abs(new_intercept - intercept),
            *(abs(new_beta[c] - beta[c]) for c in feature_cols),
        )
        beta, intercept = new_beta, new_intercept
        stalled = abs(prev_loss - loss) <= tol * max(abs(loss), 1.0)
        prev_loss = loss
        if move < tol or stalled:
            return QuantileModel(
                feature_cols=tuple(feature_cols), tau=float(tau),
                coefs=beta, intercept=intercept, n_rows=n, n_iters=it,
                pinball_loss=loss, converged=True, ridge=float(ridge),
            )
    raise DataFrameValidationError(
        f"fit_quantile did not converge in {max_iters} IRLS rounds"
    )
