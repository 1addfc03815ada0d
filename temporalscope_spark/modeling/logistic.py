"""IRLS logistic regression: a handful of aggregation ROUNDS, no gradient
libraries (VERDICT r3 #9 — the quality-gate classifier joins the
closed-form family).

Same scale shape as :mod:`temporalscope_spark.modeling.linear` (one
hash-aggregation of sufficient statistics per round, a (p+1)×(p+1) driver
solve of a few doubles): IRLS solves

    β ← (Xᵀ W X + λI)⁻¹ Xᵀ W z,   W = diag(μ(1−μ)),   z = η + (y−μ)/w

where η = Xβ uses the CURRENT coefficients inlined as plan literals — so
each round is ONE map-side-combinable aggregation over the corpus
(Σ w·x_i·x_j upper triangle, Σ w·x_i·z, Σ w·z, Σ w, plus the
log-likelihood for monitoring), a shuffle of one tiny row, and a numpy
solve. Newton/IRLS converges quadratically: 5-8 rounds for typical
quality-gate features, each round a full scan — exactly the trade a
100 TB training run wants (scans are cheap and parallel; per-row Python
is not).

Numerical guards (standard GLM practice): μ is clamped to
[eps, 1−eps] so w never hits 0 and z never overflows; the log-likelihood
term ln(1+e^η) switches to η for η > 30 (where they agree to double
precision) to avoid exp overflow.

No reference parity: TemporalScope's commented-out trainer
(modeling/temporal_model_trainer.py) is regression-only; this is the
engine's classification counterpart, feeding ``operators.text``'s
quality-gate features.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_MU_EPS = 1e-10


@dataclass(frozen=True)
class LogisticModel:
    """Frozen fit result: coefficients + fit diagnostics."""

    feature_cols: tuple[str, ...]
    coefs: dict[str, float]
    intercept: float
    n_rows: int
    n_iters: int
    log_likelihood: float
    converged: bool
    ridge: float = 0.0

    def logit_col(self) -> Column:
        out: Column = F.lit(float(self.intercept))
        for c in self.feature_cols:
            out = out + F.lit(float(self.coefs[c])) * F.col(c).cast("double")
        return out

    def predict_proba_col(self) -> Column:
        """Expression-only scorer: σ(Σ coef_f·x_f + intercept) — a narrow
        map with literal coefficients (whole-stage codegen, no join)."""
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-self.logit_col()))

    def with_prediction(self, df: DataFrame, out_col: str = "probability") -> DataFrame:
        return df.withColumn(out_col, self.predict_proba_col())


def _eta(feature_cols: Sequence[str], beta: dict, intercept: float) -> Column:
    eta: Column = F.lit(float(intercept))
    for c in feature_cols:
        eta = eta + F.lit(float(beta[c])) * F.col(c).cast("double")
    return eta


def irls_step(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    beta: dict,
    intercept: float,
    ridge: float = 0.0,
    fit_intercept: bool = True,
    validate_target: bool = False,
):
    """ONE IRLS round: aggregate the weighted sufficient statistics at the
    current (beta, intercept) and solve the weighted normal equations.

    Returns (new_intercept, new_beta, n_rows, log_likelihood). Exposed (and
    driver-oracled as the ``irls_step`` query) because the full fit is just
    this round iterated to convergence.
    """
    import numpy as np  # noqa: PLC0415

    y = F.col(target_col).cast("double")
    xs = [F.col(c).cast("double") for c in feature_cols]
    eta = _eta(feature_cols, beta, intercept)
    mu_raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    mu = F.least(F.greatest(mu_raw, F.lit(_MU_EPS)), F.lit(1.0 - _MU_EPS))
    w = mu * (F.lit(1.0) - mu)
    z = eta + (y - mu) / w
    # ln(1+e^η) overflows exp for large η; for η > 30 they agree to double
    ll_term = y * eta - F.when(eta > 30.0, eta).otherwise(F.log1p(F.exp(eta)))

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
        aggs.append(
            F.sum((~y.isin(0.0, 1.0)).cast("int")).alias("_bad_y")
        )

    cond = y.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    row = df.filter(cond).agg(*aggs).first()
    n = int(row["_n"])
    if n == 0:
        raise DataFrameValidationError("fit_logistic: no rows after null filtering")
    if validate_target and int(row["_bad_y"] or 0) > 0:
        raise DataFrameValidationError(
            f"fit_logistic: target '{target_col}' has {row['_bad_y']} values "
            "outside {0, 1}"
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


def fit_logistic(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    ridge: float = 0.0,
    fit_intercept: bool = True,
    max_iters: int = 25,
    tol: float = 1e-8,
) -> LogisticModel:
    """Fit a binary logistic model by IRLS — one aggregation job per round.

    Rows with NULL in any feature or the target are dropped; the target
    must be 0/1 (validated in the first round's aggregation, no extra job).
    Raises on non-convergence instead of returning a half-stepped model.
    """
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    beta = {c: 0.0 for c in feature_cols}
    intercept = 0.0
    n = 0
    ll = float("nan")
    for it in range(1, max_iters + 1):
        new_intercept, new_beta, n, ll = irls_step(
            df, feature_cols, target_col, beta, intercept,
            ridge=ridge, fit_intercept=fit_intercept, validate_target=(it == 1),
        )
        delta = max(
            abs(new_intercept - intercept),
            *(abs(new_beta[c] - beta[c]) for c in feature_cols),
        )
        beta, intercept = new_beta, new_intercept
        if delta < tol:
            return LogisticModel(
                feature_cols=tuple(feature_cols), coefs=beta,
                intercept=intercept, n_rows=n, n_iters=it,
                log_likelihood=ll, converged=True, ridge=float(ridge),
            )
    raise DataFrameValidationError(
        f"fit_logistic did not converge in {max_iters} IRLS rounds "
        "(separable data or wild feature scales — standardize features, "
        "add ridge, or raise max_iters)"
    )
