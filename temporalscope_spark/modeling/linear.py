"""Closed-form ridge/OLS linear training as ONE Spark aggregation.

The reference's ``TemporalModelTrainer``
(/root/reference/src/temporalscope/modeling/temporal_model_trainer.py:18-115,
commented-out in the snapshot) trains a LightGBM model per partitioner phase
by collecting each phase's split to the driver. Neither LightGBM nor any
model stack is in this container — and at 100 TB per-phase driver collection
is a non-starter anyway. This module keeps the reference's *protocol*
(fit per phase on the train split, score on test, report metrics) but picks
the model family whose training IS a distributed aggregation:

    ridge / OLS:   β = (XᵀX + λI)⁻¹ Xᵀy

Everything the trainer needs — XᵀX, Xᵀy, yᵀy, Σx, Σy, n — is a set of
``F.sum`` columns, so the ENTIRE per-phase training run is ONE hash
aggregation keyed on (bucket, split): map-side-combinable, shuffle of
P×2 tiny rows, no matter how many rows each phase holds. The driver solves
one (p+1)×(p+1) system per phase (numpy, microseconds) and evaluates train
AND test RMSE/R² from the same sufficient statistics — zero extra jobs,
nothing row-shaped ever reaches the driver:

    RMSE² = (yᵀy − 2 βᵀXᵀy + βᵀ XᵀX β) / n

Prediction and SHAP attribution go back the other way — coefficients become
plan literals, so scoring is a narrow expression-only map (whole-stage
codegen, no join, no Python).

EXACT SHAP: for a linear model on (approximately) independent features the
SHAP value of feature f at row i is exactly ``coef_f · (x_if − mean_f)``
(Lundberg & Lee 2017, "Linear SHAP"). :func:`linear_shap_importance` emits
that as an expression — which upgrades :mod:`temporalscope_spark.metrics.masv`
from the |x − mean| magnitude stand-in to a real, exact SHAP explainer with
no ``shap`` dependency.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


@dataclass(frozen=True)
class LinearModel:
    """Frozen fit result: coefficients + the stats needed for scoring/SHAP."""

    feature_cols: tuple[str, ...]
    coefs: dict[str, float]          # feature -> coefficient
    intercept: float
    feature_means: dict[str, float]  # SHAP baseline (training means)
    n_rows: int
    train_rmse: float
    train_r2: float
    ridge: float = 0.0
    metrics: dict = field(default_factory=dict)

    def predict_col(self) -> Column:
        """Expression-only scorer: Σ coef_f·x_f + intercept — a narrow map
        with the coefficients inlined as literals (no join, no Python)."""
        out: Column = F.lit(float(self.intercept))
        for c in self.feature_cols:
            out = out + F.lit(float(self.coefs[c])) * F.col(c).cast("double")
        return out

    def with_prediction(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        return df.withColumn(out_col, self.predict_col())


def _suffstat_aggs(feature_cols: Sequence[str], target_col: str) -> list[Column]:
    """The one-pass sufficient-statistics columns: n, Σx_i, Σx_i·x_j (upper
    triangle), Σy, Σx_i·y, Σy² — p(p+1)/2 + 2p + 2 fused sums."""
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(target_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("_n"), F.sum(y).alias("_sy"), F.sum(y * y).alias("_syy")]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi).alias(f"_sx{i}"))
        aggs.append(F.sum(xi * y).alias(f"_sxy{i}"))
        for j in range(i, len(xs)):
            aggs.append(F.sum(xi * xs[j]).alias(f"_sxx{i}_{j}"))
    return aggs


def _solve_from_stats(
    row, feature_cols: Sequence[str], ridge: float, fit_intercept: bool
):
    """Driver-side: assemble the normal equations from one stats row and
    solve. Returns (intercept, coefs, means, n, rmse, r2)."""
    import numpy as np  # noqa: PLC0415

    p = len(feature_cols)
    n = int(row["_n"])
    if n == 0:
        raise DataFrameValidationError("fit_linear: no rows after null filtering")
    # design includes the intercept column of ones first (if requested)
    k = p + (1 if fit_intercept else 0)
    A = np.zeros((k, k))
    b = np.zeros(k)
    off = 1 if fit_intercept else 0
    if fit_intercept:
        A[0, 0] = n
        b[0] = row["_sy"]
        for i in range(p):
            A[0, i + 1] = A[i + 1, 0] = row[f"_sx{i}"]
    for i in range(p):
        b[i + off] = row[f"_sxy{i}"]
        for j in range(i, p):
            A[i + off, j + off] = A[j + off, i + off] = row[f"_sxx{i}_{j}"]
    if ridge:
        # standard convention: the intercept is not penalized
        for i in range(p):
            A[i + off, i + off] += float(ridge)
    beta = np.linalg.solve(A, b)
    intercept = float(beta[0]) if fit_intercept else 0.0
    coefs = {c: float(beta[i + off]) for i, c in enumerate(feature_cols)}
    means = {c: float(row[f"_sx{i}"]) / n for i, c in enumerate(feature_cols)}
    # RMSE² = (yᵀy − 2βᵀXᵀy + βᵀXᵀXβ)/n, all from the same stats row
    xty = np.array([row["_sy"]] * fit_intercept + [row[f"_sxy{i}"] for i in range(p)]) \
        if fit_intercept else np.array([row[f"_sxy{i}"] for i in range(p)])
    sse = float(row["_syy"]) - 2.0 * float(beta @ xty) + float(beta @ (A_nopen(A, ridge, off, p) @ beta))
    sse = max(0.0, sse)
    ybar = float(row["_sy"]) / n
    sst = float(row["_syy"]) - n * ybar * ybar
    rmse = (sse / n) ** 0.5
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return intercept, coefs, means, n, rmse, r2


def A_nopen(A, ridge: float, off: int, p: int):
    """XᵀX without the ridge penalty (metrics use the true Gram matrix)."""
    if not ridge:
        return A
    B = A.copy()
    for i in range(p):
        B[i + off, i + off] -= float(ridge)
    return B


def fit_linear(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    ridge: float = 0.0,
    fit_intercept: bool = True,
) -> LinearModel:
    """Fit ridge/OLS in ONE aggregation job; see module docstring.

    Rows with a NULL in any feature or the target are dropped (the same
    contract as the reference's dropna before model fit)."""
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    cond = F.col(target_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    row = df.filter(cond).agg(*_suffstat_aggs(feature_cols, target_col)).first()
    intercept, coefs, means, n, rmse, r2 = _solve_from_stats(
        row, feature_cols, ridge, fit_intercept
    )
    return LinearModel(
        feature_cols=tuple(feature_cols),
        coefs=coefs,
        intercept=intercept,
        feature_means=means,
        n_rows=n,
        train_rmse=rmse,
        train_r2=r2,
        ridge=float(ridge),
    )


def linear_shap_importance(model: LinearModel):
    """Pluggable ``importance_fn`` for :func:`metrics.masv.calculate_masv`:
    EXACT SHAP for the linear model — ``imp_f = |coef_f · (x_f − mean_f)|``
    per row, expression-only (the coefficients and baseline means are plan
    literals). This is the real thing, not a magnitude proxy: for a linear
    model, Linear SHAP φ_f(x) = coef_f·(x_f − E[x_f]) exactly."""

    def fn(df: DataFrame, feature_cols: list[str]) -> DataFrame:
        cols = []
        for c in feature_cols:
            if c not in model.coefs:
                raise DataFrameValidationError(
                    f"linear_shap_importance: feature '{c}' not in the fitted model"
                )
            cols.append(
                F.abs(
                    F.lit(float(model.coefs[c]))
                    * (F.col(c).cast("double") - F.lit(float(model.feature_means[c])))
                ).alias(f"imp_{c}")
            )
        return df.select("*", *cols)

    return fn


class TemporalModelTrainer:
    """Per-phase model training over a fitted SlidingWindowPartitioner —
    the reference's ``TemporalModelTrainer`` protocol
    (/root/reference/src/temporalscope/modeling/temporal_model_trainer.py:
    18-115: train on each partition's train split, predict on test, return
    per-phase metrics), re-expressed so the WHOLE run is one Spark job.

    ``fit()`` labels every row with its (bucket, split) via the
    partitioner's boundary literals (narrow map), aggregates the sufficient
    statistics grouped by (bucket, split) — ONE hash aggregation, P×2 tiny
    output rows — then, driver-side, solves the train-split normal equations
    per phase and evaluates train AND test RMSE/R² from the very same
    statistics. No per-phase jobs, no row collection, no Python in the
    scan."""

    def __init__(
        self,
        partitioner,
        feature_cols: Sequence[str],
        target_col: str,
        ridge: float = 0.0,
    ) -> None:
        self.partitioner = partitioner
        self.feature_cols = tuple(feature_cols)
        self.target_col = target_col
        self.ridge = float(ridge)
        self.models_: dict[int, LinearModel] = {}

    def fit(self) -> "dict[int, LinearModel]":
        labeled = self.partitioner.with_bucket_labels()
        cond = F.col(self.target_col).isNotNull()
        for c in self.feature_cols:
            cond = cond & F.col(c).isNotNull()
        stats = (
            labeled.filter(cond & F.col("split").isin("train", "test"))
            .groupBy("bucket", "split")
            .agg(*_suffstat_aggs(self.feature_cols, self.target_col))
            .collect()
        )
        by_key = {(int(r["bucket"]), r["split"]): r for r in stats}
        models: dict[int, LinearModel] = {}
        for (bucket, split), row in sorted(by_key.items()):
            if split != "train":
                continue
            intercept, coefs, means, n, rmse, r2 = _solve_from_stats(
                row, self.feature_cols, self.ridge, True
            )
            metrics = {"train_rmse": rmse, "train_r2": r2, "n_train": n}
            trow = by_key.get((bucket, "test"))
            if trow is not None and int(trow["_n"]) > 0:
                metrics.update(self._eval_from_stats(trow, intercept, coefs))
            models[bucket] = LinearModel(
                feature_cols=self.feature_cols,
                coefs=coefs,
                intercept=intercept,
                feature_means=means,
                n_rows=n,
                train_rmse=rmse,
                train_r2=r2,
                ridge=self.ridge,
                metrics=metrics,
            )
        self.models_ = models
        return models

    def _eval_from_stats(self, row, intercept: float, coefs: dict[str, float]) -> dict:
        """Test RMSE/R² from the test split's sufficient statistics —
        E[(y−ŷ)²] expands into the same Σ terms, no second pass."""
        import numpy as np  # noqa: PLC0415

        p = len(self.feature_cols)
        n = int(row["_n"])
        beta = np.array([intercept] + [coefs[c] for c in self.feature_cols])
        A = np.zeros((p + 1, p + 1))
        A[0, 0] = n
        for i in range(p):
            A[0, i + 1] = A[i + 1, 0] = row[f"_sx{i}"]
            for j in range(i, p):
                A[i + 1, j + 1] = A[j + 1, i + 1] = row[f"_sxx{i}_{j}"]
        xty = np.array([row["_sy"]] + [row[f"_sxy{i}"] for i in range(p)])
        sse = max(0.0, float(row["_syy"]) - 2.0 * float(beta @ xty) + float(beta @ (A @ beta)))
        ybar = float(row["_sy"]) / n
        sst = float(row["_syy"]) - n * ybar * ybar
        return {
            "test_rmse": (sse / n) ** 0.5,
            "test_r2": 1.0 - sse / sst if sst > 0 else float("nan"),
            "n_test": n,
        }
