"""Missing-value handling — null-indicator features plus fitted
imputation (sklearn ``SimpleImputer`` + ``MissingIndicator`` semantics)
on the engine's fit-then-literal pattern: ONE aggregation fits every
column's fill value (mean / median / constant), the transform is a pure
narrow projection, and the fitted model is a plain dict for train→serve
reuse.

The indicator column matters as much as the fill: null-ness is usually
informative (sensor offline, field not collected), and a model fed only
the imputed value can't distinguish "really was the mean" from "we made
that up". Fill values round to 6 decimals (replayable-model contract);
``approx=True`` swaps the exact median ``percentile`` for the
``percentile_approx`` sketch — the 100 TB lane (mean needs no sketch).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_STRATEGIES = ("mean", "median", "constant")


def fit_impute(
    df: DataFrame,
    cols: Sequence[str],
    strategy: str = "mean",
    fill_value: float = 0.0,
    approx: bool = False,
) -> dict[str, float]:
    """Fit per-column fill values in ONE aggregation (``constant`` needs
    no data and returns the literal for every column). A column with no
    non-null values cannot be mean/median-imputed and raises."""
    if strategy not in _STRATEGIES:
        raise DataFrameValidationError(
            f"fit_impute: strategy must be one of {_STRATEGIES}, got {strategy!r}"
        )
    if not cols:
        raise DataFrameValidationError("fit_impute: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"fit_impute: missing columns {missing}")
    if strategy == "constant":
        return {c: round(float(fill_value), 6) for c in cols}
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if strategy == "mean":
            aggs.append(F.avg(x).alias(c))
        else:
            pfn = F.percentile_approx if approx else F.percentile
            aggs.append(pfn(x, F.lit(0.5)).alias(c))
    row = df.agg(*aggs).collect()[0]
    model = {}
    for c in cols:
        v = row[c]
        if v is None:
            raise DataFrameValidationError(
                f"fit_impute: column {c!r} has no non-null values"
            )
        model[c] = round(float(v), 6)
    return model


def impute(
    df: DataFrame,
    cols: Sequence[str],
    strategy: str = "mean",
    fill_value: float = 0.0,
    approx: bool = False,
    model: Mapping[str, float] | None = None,
    add_indicator: bool = True,
) -> DataFrame:
    """Append ``{c}_filled`` (NULLs replaced by the fitted fill value;
    non-null values pass through bit-exact) and, with ``add_indicator``,
    ``{c}_was_null`` (0/1). Pass a pre-fit ``model`` (train slice) for
    train→serve reuse. Expression-only transform — folds into whatever
    scan reads the columns."""
    fitted = (
        dict(model)
        if model is not None
        else fit_impute(df, cols, strategy, fill_value, approx)
    )
    missing = [c for c in cols if c not in fitted]
    if missing:
        raise DataFrameValidationError(f"impute: model missing columns {missing}")
    out = df
    for c in cols:
        x = F.col(c).cast("double")
        if add_indicator:
            out = out.withColumn(f"{c}_was_null", x.isNull().cast("int"))
        out = out.withColumn(
            f"{c}_filled", F.coalesce(x, F.lit(float(fitted[c])))
        )
    return out
