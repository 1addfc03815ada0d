"""Quantile discretization and winsorization — the scaler-adjacent
feature transforms (sklearn ``KBinsDiscretizer(strategy='quantile')`` /
``RobustScaler``-style clipping) a tabular feature pipeline applies
before target encoding or relevance scoring.

Both follow the engine's fit-then-literal pattern (the psi_drift /
partitioner shape): ONE tiny aggregation computes the quantile edges
(a 1-row result to the driver), the edges become plan literals, and the
transform is a pure narrow projection — the corpus is scanned once and
nothing data-sized moves. ``approx=False`` uses exact ``percentile``
(the oracle lane, executor-buffers the column — fine to ~10⁸ rows);
``approx=True`` swaps in ``percentile_approx`` (constant-memory sketch,
map-side-combinable — the 100 TB lane; bin boundaries move within the
sketch's rank error).

Edges are rounded to 6 decimals before use so the fitted model is
engine-replayable and serializes cleanly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def fit_quantile_edges(
    df: DataFrame,
    col: str,
    bins: int = 10,
    approx: bool = False,
) -> list[float]:
    """Interior quantile edges (``i/bins`` for i in 1..bins-1) of the
    column's non-null values, rounded to 6. Raises if the column is all
    null (no model can be fit)."""
    if bins < 2:
        raise DataFrameValidationError("bins must be >= 2")
    if col not in df.columns:
        raise DataFrameValidationError(f"fit_quantile_edges: missing column {col!r}")
    pfn = F.percentile_approx if approx else F.percentile
    probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    row = (
        df.filter(F.col(col).isNotNull())
        .agg(pfn(col, probs).alias("_e"))
        .collect()[0]["_e"]
    )
    if row is None:
        raise DataFrameValidationError(
            f"fit_quantile_edges: column {col!r} has no non-null values"
        )
    return [round(float(e), 6) for e in row]


def quantile_bin(
    df: DataFrame,
    col: str,
    bins: int = 10,
    approx: bool = False,
    edges: Sequence[float] | None = None,
) -> DataFrame:
    """Append ``{col}_bin`` in 1..bins by quantile edges (fit on this
    frame, or pass pre-fit ``edges`` for train→serve reuse — the
    fit/transform split every leakage-aware pipeline needs: fit on the
    train slice, transform everywhere). NULL values get a NULL bin.
    Heavy ties may leave some bins empty (duplicate edges collapse), the
    same convention as ``psi_drift``."""
    fitted = (
        list(edges)
        if edges is not None
        else fit_quantile_edges(df, col, bins, approx)
    )
    earr = F.array(*[F.lit(float(e)) for e in fitted])
    v = F.col(col).cast("double")
    bin_ix = F.aggregate(earr, F.lit(1), lambda acc, e: acc + (v > e).cast("int"))
    return df.withColumn(
        f"{col}_bin", F.when(v.isNotNull(), bin_ix).cast("int")
    )


def mad_outliers_grouped(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    z: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Append a robust z-score (``{col}_rz``) and outlier flag
    (``{col}_outlier``) via the median-absolute-deviation rule
    (Iglewicz & Hoaglin 1993: ``0.6745·(x − med) / MAD``, flag when
    ``|rz| > z``).

    The mean/std z-score breaks exactly when you need it (outliers
    inflate the std); the MAD version has a 50% breakdown point — the
    standard robust gate on heavy-tailed quality scores before
    winsorizing or filtering.

    Two bounded aggregations (median, then MAD of the residuals — MAD
    depends on the median, so one pass cannot fuse them), each a
    map-side-combinable groupBy over the group key; the per-group
    (median, MAD) table is broadcast back (group cardinality =
    sources/langs, always tiny next to the corpus), so the corpus
    itself is scanned twice and never shuffled. Both statistics are
    rounded to 6 before use (the fit-then-literal convention — the
    fitted gate replays bit-identically in any engine). ``approx=True``
    swaps exact ``percentile`` for the constant-memory
    ``percentile_approx`` sketch (the 100 TB lane; the exact lane
    executor-buffers each group's column — fine to ~10⁸ rows/group).
    A zero-MAD group (over half the values identical) yields NULL rz
    and flags nothing — no rule can rank within it.
    """
    if col not in df.columns:
        raise DataFrameValidationError(f"mad_outliers_grouped: missing column {col!r}")
    if group_col is not None and group_col not in df.columns:
        raise DataFrameValidationError(f"mad_outliers_grouped: missing column {group_col!r}")
    if z <= 0:
        raise DataFrameValidationError("mad_outliers_grouped: z must be > 0")
    pfn = F.percentile_approx if approx else F.percentile
    keys = [group_col] if group_col else []
    x = F.col(col).cast("double")
    meds = df.groupBy(*keys).agg(F.round(pfn(x, F.lit(0.5)), 6).alias("_med"))
    j1 = df.join(F.broadcast(meds), keys) if keys else df.crossJoin(F.broadcast(meds))
    mads = j1.groupBy(*keys).agg(
        F.round(pfn(F.abs(x - F.col("_med")), F.lit(0.5)), 6).alias("_mad"),
        F.first("_med").alias("_med2"),
    )
    j2 = df.join(F.broadcast(mads), keys) if keys else df.crossJoin(F.broadcast(mads))
    rz = F.when(
        F.col("_mad") > 0,
        F.round(F.lit(0.6745) * (x - F.col("_med2")) / F.col("_mad"), 6) + F.lit(0.0),
    )
    return (
        j2.withColumn(f"{col}_rz", rz)
        .withColumn(f"{col}_outlier", F.coalesce(F.abs(rz) > F.lit(float(z)), F.lit(False)))
        .drop("_med2", "_mad")
    )


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Append ``{c}_wins`` clipping each column to its [lower, upper]
    quantiles — the standard heavy-tail guard before scaling/OLS. All
    columns' bounds come from ONE aggregation; non-clipped values pass
    through bit-exact (no float arithmetic on the fast path)."""
    if not cols:
        raise DataFrameValidationError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"winsorize: missing columns {missing}")
    if not (0.0 <= lower < upper <= 1.0):
        raise DataFrameValidationError("need 0 <= lower < upper <= 1")
    pfn = F.percentile_approx if approx else F.percentile
    probs = F.array(F.lit(lower), F.lit(upper))
    row = df.agg(
        *[pfn(c, probs).alias(c) for c in cols]
    ).collect()[0]
    out = df
    for c in cols:
        bounds = row[c]
        if bounds is None:
            raise DataFrameValidationError(
                f"winsorize: column {c!r} has no non-null values"
            )
        lo, hi = (round(float(b), 6) for b in bounds)
        x = F.col(c).cast("double")
        out = out.withColumn(
            f"{c}_wins",
            F.when(x < lo, F.lit(lo)).when(x > hi, F.lit(hi)).otherwise(x),
        )
    return out
