"""Feature scaling — the standardization family every model-input
pipeline applies after winsorization (sklearn ``StandardScaler`` /
``MinMaxScaler`` / ``RobustScaler``), rebuilt on the engine's
fit-then-literal pattern (``operators/binning.py``).

Fit is ONE aggregation over all requested columns — a 1-row result of
(center, scale) pairs to the driver — and transform is a pure narrow
projection with the fitted statistics as plan literals: the corpus is
scanned once, nothing data-sized moves, and the fitted model is a plain
``dict`` that serializes for train→serve reuse (fit on the train slice,
transform everywhere — the leakage discipline ``quantile_bin`` follows).

``robust`` centers/scales by median/IQR; ``approx=True`` swaps the exact
``percentile`` for the ``percentile_approx`` sketch (constant memory,
map-side-combinable — the 100 TB lane; zscore/minmax moments are already
sketch-free single-pass sums). Statistics are rounded to 6 decimals
before use so the model replays bit-identically across engines; columns
with zero spread scale by 1 (sklearn's convention), so constant columns
map to 0 instead of NaN.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_METHODS = ("zscore", "minmax", "robust")


def fit_scaler(
    df: DataFrame,
    cols: Sequence[str],
    method: str = "zscore",
    approx: bool = False,
) -> dict[str, tuple[float, float]]:
    """Fit (center, scale) per column in ONE aggregation.

    zscore: (mean, sample stddev); minmax: (min, max - min);
    robust: (median, q75 - q25). NULLs are ignored (Spark aggregate
    semantics); a column with no non-null values raises. Zero or
    null spread (constant column, or a single row under ``stddev_samp``)
    is replaced by scale 1.
    """
    if method not in _METHODS:
        raise DataFrameValidationError(
            f"fit_scaler: method must be one of {_METHODS}, got {method!r}"
        )
    if not cols:
        raise DataFrameValidationError("fit_scaler: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"fit_scaler: missing columns {missing}")

    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if method == "zscore":
            aggs += [F.avg(x).alias(f"_a_{c}"), F.stddev_samp(x).alias(f"_b_{c}")]
        elif method == "minmax":
            aggs += [
                F.min(x).alias(f"_a_{c}"),
                (F.max(x) - F.min(x)).alias(f"_b_{c}"),
            ]
        else:  # robust
            pfn = F.percentile_approx if approx else F.percentile
            q = pfn(x, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            aggs += [
                F.element_at(q, 2).alias(f"_a_{c}"),
                (F.element_at(q, 3) - F.element_at(q, 1)).alias(f"_b_{c}"),
            ]
    row = df.agg(*aggs).collect()[0]
    model: dict[str, tuple[float, float]] = {}
    for c in cols:
        a, b = row[f"_a_{c}"], row[f"_b_{c}"]
        if a is None:
            raise DataFrameValidationError(
                f"fit_scaler: column {c!r} has no non-null values"
            )
        b = round(float(b), 6) if b is not None else 0.0
        model[c] = (round(float(a), 6), b if b > 0.0 else 1.0)
    return model


def scale_features(
    df: DataFrame,
    cols: Sequence[str],
    method: str = "zscore",
    approx: bool = False,
    model: Mapping[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append ``{c}_scaled = round((x - center)/scale, 6)`` per column.

    Pass a pre-fit ``model`` (from :func:`fit_scaler` on the train slice)
    for train→serve reuse; otherwise fits on this frame. NULL in, NULL
    out. The transform is expression-only — it folds into whatever scan
    already reads the columns (no exchange, no extra job beyond the
    1-row fit).
    """
    fitted = dict(model) if model is not None else fit_scaler(df, cols, method, approx)
    missing = [c for c in cols if c not in fitted]
    if missing:
        raise DataFrameValidationError(
            f"scale_features: model missing columns {missing}"
        )
    out = df
    for c in cols:
        a, b = fitted[c]
        x = F.col(c).cast("double")
        out = out.withColumn(
            f"{c}_scaled", F.round((x - F.lit(float(a))) / F.lit(float(b)), 6)
        )
    return out
