"""Distributed PCA — covariance from ONE pass over the data, the
(p × p) eigenproblem solved on the driver (p is the feature dimension,
never the row count), projection as a pure literal expression.

Two input shapes share the math:

* numeric COLUMNS (:func:`fit_pca` / :func:`pca_project`): the
  cross-moment sums come from one map-side-combinable aggregation —
  the ``correlation_matrix`` moments, assembled into a covariance
  matrix instead of exploded into long rows;
* an embedding ARRAY column (:func:`fit_pca_array` /
  :func:`pca_project_array`): per-partition Gram partials
  (``n, Σx, ΣxxT``) via Arrow-batched ``mapInPandas`` — numpy computes
  each partition's d×d outer-product sum vectorized, one ~d² row per
  partition comes back, and the driver folds the bounded partial set
  (the ``treeAggregate`` shape; never a row-sized collect).

Model contract: means and components round to 6 decimals before
projection (the engine's replayable-model convention), eigenvectors
sort by eigenvalue desc, and each component's sign is fixed so its
largest-|entry| coordinate is positive — a deterministic orientation
numpy's ``eigh`` alone does not guarantee. For p = 2 the top component
has the textbook closed form (``v1 ∝ [cov, λ1 − var_x]``), which is how
the driver oracle replays the projection in pure SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA: per-feature means, k components (rows, unit norm,
    rounded 6), eigenvalues desc, and the explained-variance ratios."""

    means: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    eigenvalues: tuple[float, ...]
    explained_variance_ratio: tuple[float, ...]
    n_rows: int


def _orient(v):
    """Deterministic sign: the largest-|entry| coordinate is positive
    (first such index wins on ties)."""
    import numpy as np

    i = int(np.argmax(np.abs(v)))
    return v if v[i] >= 0 else -v


def _finish(n: int, s, g, k: int) -> PCAModel:
    """(n, Σx, ΣxxT) → sample covariance → eigh → oriented rounded model."""
    import numpy as np

    if n < 2:
        raise DataFrameValidationError("fit_pca: need >= 2 complete rows")
    mu = s / n
    cov = (g - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = [_orient(evecs[:, j]) for j in order[:k]]
    total = float(evals.sum())
    ratios = [float(e) / total if total > 0 else 0.0 for e in evals[:k]]
    return PCAModel(
        means=tuple(round(float(m), 6) for m in mu),
        components=tuple(
            tuple(round(float(x), 6) for x in c) for c in comps
        ),
        eigenvalues=tuple(float(e) for e in evals[:k]),
        explained_variance_ratio=tuple(round(r, 6) for r in ratios),
        n_rows=int(n),
    )


def fit_pca(df: DataFrame, cols: Sequence[str], k: int = 2) -> PCAModel:
    """Fit PCA over numeric columns: rows with any NULL are dropped
    (listwise, sklearn's implicit contract), then ONE aggregation
    computes n, the p sums and the p(p+1)/2 cross sums — a 1-row result
    regardless of data size."""
    import numpy as np

    p = len(cols)
    if p < 2:
        raise DataFrameValidationError("fit_pca: need >= 2 columns")
    if not (1 <= k <= p):
        raise DataFrameValidationError("fit_pca: need 1 <= k <= len(cols)")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"fit_pca: missing columns {missing}")
    xs = [F.col(c).cast("double") for c in cols]
    cond = xs[0].isNotNull()
    for x in xs[1:]:
        cond = cond & x.isNotNull()
    complete = df.filter(cond)
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(x).alias(f"_s{i}") for i, x in enumerate(xs)]
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"_g{i}_{j}"))
    row = complete.agg(*aggs).collect()[0]
    n = int(row["_n"])
    if n < 2:
        raise DataFrameValidationError("fit_pca: need >= 2 complete rows")
    s = np.array([float(row[f"_s{i}"]) for i in range(p)])
    g = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            g[i, j] = g[j, i] = float(row[f"_g{i}_{j}"])
    return _finish(n, s, g, k)


def pca_project(
    df: DataFrame,
    cols: Sequence[str],
    k: int = 2,
    model: PCAModel | None = None,
) -> DataFrame:
    """Append ``pc_1..pc_k = Σ_j (x_j − mean_j) · v_kj`` (rounded 6) —
    expression-only with the fitted model as plan literals; rows with a
    NULL feature project to NULL. Pass a pre-fit ``model`` (train slice)
    for train→serve reuse."""
    m = model if model is not None else fit_pca(df, cols, k)
    if len(m.means) != len(cols):
        raise DataFrameValidationError(
            "pca_project: model dimension != len(cols)"
        )
    xs = [F.col(c).cast("double") for c in cols]
    out = df
    for ki in range(min(k, len(m.components))):
        comp = m.components[ki]
        expr = None
        for x, mu, v in zip(xs, m.means, comp):
            term = (x - F.lit(float(mu))) * F.lit(float(v))
            expr = term if expr is None else expr + term
        out = out.withColumn(f"pc_{ki + 1}", F.round(expr, 6))
    return out


def _gram_partials(vec_col: str, d: int):
    import numpy as np
    import pandas as pd

    def fn(batches: Iterable["pd.DataFrame"]):
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(
                [v for v in pdf[vec_col] if v is not None and len(v) == d],
                dtype=np.float64,
            )
            if mat.size == 0:
                continue
            n += mat.shape[0]
            s += mat.sum(axis=0)
            g += mat.T @ mat
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    return fn


def fit_pca_array(df: DataFrame, vec_col: str, k: int = 2) -> PCAModel:
    """Fit PCA over an embedding ``array<float/double>`` column: each
    partition emits ONE (n, Σx, flattened ΣxxT) partial via
    Arrow-batched ``mapInPandas`` (numpy-vectorized Gram — the justified
    Pandas-UDF case: d² accumulation has no builtin), and the driver
    folds the partition-count-bounded partials. Vectors that are NULL or
    of the wrong length are dropped."""
    import numpy as np

    if vec_col not in df.columns:
        raise DataFrameValidationError(f"fit_pca_array: missing column {vec_col!r}")
    first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head(1)
    if not first:
        raise DataFrameValidationError("fit_pca_array: no non-null vectors")
    d = len(first[0][0])
    if not (1 <= k <= d):
        raise DataFrameValidationError("fit_pca_array: need 1 <= k <= dim")
    partials = df.select(F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        _gram_partials(vec_col, d),
        schema="n long, s array<double>, g array<double>",
    ).collect()
    n = sum(r["n"] for r in partials)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in partials:
        if r["n"]:
            s += np.array(r["s"])
            g += np.array(r["g"]).reshape(d, d)
    return _finish(n, s, g, k)


def pca_project_array(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Project an embedding column onto a fitted model: components ship
    as array literals and each ``pc_k`` is a ``zip_with`` dot product —
    expression-only, no UDF on the projection path."""
    d = len(model.means)
    mu = F.array(*[F.lit(float(m)) for m in model.means])
    v = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(v, mu, lambda a, b: a - b)
    out = df.select(*(id_cols or df.columns)) if id_cols else df
    out = out.withColumn("_c", centered) if id_cols is None else df.select(
        *id_cols, centered.alias("_c")
    )
    for ki, comp in enumerate(model.components, start=1):
        carr = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col("_c"), carr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(
            f"pc_{ki}",
            F.when(F.size(F.col("_c")) == d, F.round(dot, 6)),
        )
    return out.drop("_c")
