"""IRLS Poisson regression — the count-data GLM completing the modeling
family (linear for continuous targets, logistic for binary, Poisson for
event counts: sessions per user, purchases per cohort, tokens per doc).

Identical scale shape to :mod:`temporalscope_spark.modeling.logistic`:
Fisher scoring for the log link is IRLS with

    β ← (Xᵀ W X + λI)⁻¹ Xᵀ W z,   μ = e^η,   W = diag(μ),
    z = η + (y − μ)/μ

so each round is ONE map-side-combinable aggregation of weighted
sufficient statistics (Σ w·x_i·x_j upper triangle, Σ w·x_i·z, Σ w·z,
Σ w, plus the log-likelihood Σ y·η − μ for monitoring — the ln y!
term is constant in β and omitted), a shuffle of one tiny row, and a
(p+1)×(p+1) numpy solve of plan-literal coefficients. McCullagh &
Nelder 1989 §2.5 is the algorithm; the canonical log link makes Fisher
scoring = Newton.

Numerical guards: η is clamped to ±30 before exponentiation (e^30 ≈
1e13 — beyond any sane rate, and exp would overflow the weights first),
which also floors w away from 0. Negative targets raise (a Poisson
count cannot be negative); non-integer targets are allowed (rates /
exposure-scaled counts — the quasi-Poisson use).

No reference parity: the reference's commented-out trainer is
regression-only (modeling/temporal_model_trainer.py:18-115); this is
the engine's count-model counterpart.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_ETA_CAP = 30.0


@dataclass(frozen=True)
class PoissonModel:
    """Frozen fit result: coefficients + fit diagnostics."""

    feature_cols: tuple[str, ...]
    coefs: dict[str, float]
    intercept: float
    n_rows: int
    n_iters: int
    log_likelihood: float
    converged: bool
    ridge: float

    def predict_rate(self, df: DataFrame, out_col: str = "rate") -> DataFrame:
        """Attach the predicted Poisson rate ``μ = e^{xβ}`` (rounded 6)."""
        eta = _eta(self.feature_cols, self.coefs, self.intercept)
        return df.withColumn(out_col, F.round(F.exp(eta), 6))


def _eta(feature_cols: Sequence[str], beta: dict, intercept: float) -> Column:
    eta = F.lit(float(intercept))
    for c in feature_cols:
        eta = eta + F.lit(float(beta[c])) * F.col(c).cast("double")
    return eta


def poisson_step(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    beta: dict,
    intercept: float,
    ridge: float = 0.0,
    fit_intercept: bool = True,
    validate_target: bool = False,
):
    """ONE Fisher-scoring round at the current (beta, intercept).

    Returns (new_intercept, new_beta, n_rows, log_likelihood). Exposed
    (and driver-oracled as the ``poisson_step`` query) because the full
    fit is this round iterated; at β = 0 the round is transcendental-free
    (μ = 1, w = 1, z = y − 1), so the oracle replay is structurally exact
    in any engine.
    """
    import numpy as np  # noqa: PLC0415

    y = F.col(target_col).cast("double")
    xs = [F.col(c).cast("double") for c in feature_cols]
    eta_raw = _eta(feature_cols, beta, intercept)
    eta = F.least(F.greatest(eta_raw, F.lit(-_ETA_CAP)), F.lit(_ETA_CAP))
    mu = F.exp(eta)
    w = mu
    z = eta + (y - mu) / mu
    ll_term = y * eta - mu

    p = len(feature_cols)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(w).alias("_sw"),
        F.sum(w * z).alias("_swz"),
        F.sum(ll_term).alias("_ll"),
    ]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(w * xi).alias(f"_swx{i}"))
        aggs.append(F.sum(w * xi * z).alias(f"_swxz{i}"))
        for j in range(i, p):
            aggs.append(F.sum(w * xi * xs[j]).alias(f"_swxx{i}_{j}"))
    if validate_target:
        aggs.append(F.sum((y < 0).cast("int")).alias("_bad_y"))

    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    row = df.filter(cond).agg(*aggs).first()
    n = int(row["_n"])
    if n == 0:
        raise DataFrameValidationError("fit_poisson: no rows after null filtering")
    if validate_target and int(row["_bad_y"] or 0) > 0:
        raise DataFrameValidationError(
            f"fit_poisson: target '{target_col}' has {row['_bad_y']} negative "
            "values — Poisson counts must be >= 0"
        )

    off = 1 if fit_intercept else 0
    k = p + off
    A = np.zeros((k, k))
    b = np.zeros(k)
    if fit_intercept:
        A[0, 0] = row["_sw"]
        b[0] = row["_swz"]
        for i in range(p):
            A[0, i + 1] = A[i + 1, 0] = row[f"_swx{i}"]
    for i in range(p):
        b[i + off] = row[f"_swxz{i}"]
        for j in range(i, p):
            A[i + off, j + off] = A[j + off, i + off] = row[f"_swxx{i}_{j}"]
    if ridge:
        for i in range(p):
            A[i + off, i + off] += float(ridge)
    sol = np.linalg.solve(A, b)
    new_intercept = float(sol[0]) if fit_intercept else 0.0
    new_beta = {c: float(sol[i + off]) for i, c in enumerate(feature_cols)}
    return new_intercept, new_beta, n, float(row["_ll"])


def fit_poisson(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    ridge: float = 0.0,
    fit_intercept: bool = True,
    max_iters: int = 25,
    tol: float = 1e-8,
) -> PoissonModel:
    """Fit a Poisson log-linear model by Fisher scoring — one aggregation
    job per round. NULL rows are dropped; negative targets raise
    (validated inside the first round's aggregation, no extra job);
    non-convergence raises rather than returning a half-stepped model.
    """
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    beta = {c: 0.0 for c in feature_cols}
    intercept = 0.0
    n = 0
    ll = float("nan")
    for it in range(1, max_iters + 1):
        new_intercept, new_beta, n, ll = poisson_step(
            df, feature_cols, target_col, beta, intercept,
            ridge=ridge, fit_intercept=fit_intercept, validate_target=(it == 1),
        )
        delta = max(
            abs(new_intercept - intercept),
            *(abs(new_beta[c] - beta[c]) for c in feature_cols),
        )
        beta, intercept = new_beta, new_intercept
        if delta < tol:
            return PoissonModel(
                feature_cols=tuple(feature_cols), coefs=beta,
                intercept=intercept, n_rows=n, n_iters=it,
                log_likelihood=ll, converged=True, ridge=float(ridge),
            )
    raise DataFrameValidationError(
        f"fit_poisson did not converge in {max_iters} rounds "
        "(wild feature scales — standardize features, add ridge, or raise "
        "max_iters)"
    )
