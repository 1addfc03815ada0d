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


def scale_by_group(
    df: DataFrame,
    cols: Sequence[str],
    group_col: str,
    min_rows: int = 2,
) -> DataFrame:
    """Append per-GROUP z-scores ``{c}_gz = round((x − mean_g)/std_g, 6)``
    — the per-entity standardization that puts every user/series on one
    scale before cross-entity models (a global z-score would mostly
    encode the entity's level, not the row's deviation).

    All groups' (mean, sample std) come from ONE map-side-combinable
    ``groupBy(group)`` aggregation (G rows for G groups) joined back on
    the group key — equi-join, salting-friendly, never a broadcast
    assumption (G is entity-scale, not category-scale). Groups with
    fewer than ``min_rows`` non-null values or zero variance yield NULL
    (no honest z-score exists), as does a NULL input.
    """
    if not cols:
        raise DataFrameValidationError("scale_by_group: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns] + (
        [] if group_col in df.columns else [group_col]
    )
    if missing:
        raise DataFrameValidationError(f"scale_by_group: missing columns {missing}")
    if min_rows < 2:
        raise DataFrameValidationError("scale_by_group: min_rows must be >= 2")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.avg(x).alias(f"_m_{c}"),
            F.stddev_samp(x).alias(f"_s_{c}"),
            F.count(x).alias(f"_n_{c}"),
        ]
    stats = df.groupBy(F.col(group_col).alias("_g")).agg(*aggs)
    out = df.join(stats, df[group_col] == stats["_g"], "left").drop("_g")
    for c in cols:
        x = F.col(c).cast("double")
        z = (x - F.round(F.col(f"_m_{c}"), 6)) / F.round(F.col(f"_s_{c}"), 6)
        out = out.withColumn(
            f"{c}_gz",
            F.when(
                (F.col(f"_n_{c}") >= min_rows)
                & (F.round(F.col(f"_s_{c}"), 6) > 0.0),
                F.round(z, 6),
            ),
        ).drop(f"_m_{c}", f"_s_{c}", f"_n_{c}")
    return out


def mad_outliers(
    df: DataFrame,
    col: str,
    threshold: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Append the Iglewicz–Hoaglin modified z-score
    ``{col}_mz = 0.6745 · (x − median) / MAD`` (rounded 6) and the flag
    ``{col}_is_outlier = |mz| > threshold`` — the robust anomaly gate
    (mean/std-based z-scores let the outliers they hunt inflate their
    own yardstick; median/MAD do not).

    Two 1-row fits by construction (MAD needs the median first), each
    the exact ``percentile`` (oracle lane) or the ``percentile_approx``
    sketch (``approx=True``, the 100 TB lane); the transform is a pure
    literal projection. Zero MAD (over half the values identical) yields
    NULL score and flag — no meaningful deviation scale exists.
    """
    if col not in df.columns:
        raise DataFrameValidationError(f"mad_outliers: missing column {col!r}")
    if threshold <= 0.0:
        raise DataFrameValidationError("mad_outliers: threshold must be > 0")
    pfn = F.percentile_approx if approx else F.percentile
    x = F.col(col).cast("double")
    med_row = df.filter(x.isNotNull()).agg(pfn(x, F.lit(0.5)).alias("_m")).collect()[0]
    if med_row["_m"] is None:
        raise DataFrameValidationError(
            f"mad_outliers: column {col!r} has no non-null values"
        )
    med = round(float(med_row["_m"]), 6)
    mad_row = (
        df.filter(x.isNotNull())
        .agg(pfn(F.abs(x - F.lit(med)), F.lit(0.5)).alias("_d"))
        .collect()[0]
    )
    mad = round(float(mad_row["_d"]), 6)
    if mad <= 0.0:
        return df.withColumn(f"{col}_mz", F.lit(None).cast("double")).withColumn(
            f"{col}_is_outlier", F.lit(None).cast("int")
        )
    mz = F.round(F.lit(0.6745) * (x - F.lit(med)) / F.lit(mad), 6)
    return df.withColumn(f"{col}_mz", mz).withColumn(
        f"{col}_is_outlier", (F.abs(mz) > F.lit(float(threshold))).cast("int")
    )


def moment_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column with (n, mean, variance, skewness, kurtosis,
    min, max) — the distribution-shape profile that decides which scaler
    / transform a feature needs (high |skew| → log/winsorize first, fat
    kurtosis → robust scaling), computed from RAW power sums in ONE
    map-side-combinable aggregation.

    Closed forms (population central moments from Σx..Σx⁴, then
    Fisher–Pearson ``g1 = m3/m2^1.5`` and EXCESS kurtosis
    ``g2 = m4/m2² − 3``; variance is the sample one) are evaluated in a
    fixed order both engines replay term-for-term — built-in
    ``skewness``/``kurtosis`` implementations disagree across engines on
    update order and bias correction, so the profile computes its own.
    NULL shape stats when n < 2 or zero variance. Floats round to 6.

    The raw-power-sum form trades a little numeric headroom for exact
    replayability (x⁴ sums can lose digits when |x| is huge AND the
    distribution is tight); center/rescale first if your column lives at
    1e8±1e-3.
    """
    if not cols:
        raise DataFrameValidationError("moment_profile: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"moment_profile: missing columns {missing}")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"_n_{c}"),
            F.sum(x).alias(f"_s1_{c}"),
            F.sum(x * x).alias(f"_s2_{c}"),
            F.sum(x * x * x).alias(f"_s3_{c}"),
            F.sum(x * x * x * x).alias(f"_s4_{c}"),
            F.min(x).alias(f"_mn_{c}"),
            F.max(x).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    parts = []
    for c in cols:
        n = F.col(f"_n_{c}").cast("double")
        s1, s2 = F.col(f"_s1_{c}"), F.col(f"_s2_{c}")
        s3, s4 = F.col(f"_s3_{c}"), F.col(f"_s4_{c}")
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
        m4 = (
            s4 / n
            - F.lit(4.0) * mean * (s3 / n)
            + F.lit(6.0) * mean * mean * (s2 / n)
            - F.lit(3.0) * mean * mean * mean * mean
        )
        ok = (n >= 2) & (m2 > 0)
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{c}").cast("long").alias("n"),
                F.round(mean, 6).alias("mean"),
                F.round((s2 - s1 * s1 / n) / (n - F.lit(1.0)), 6).alias("variance"),
                F.when(ok, F.round(m3 / F.pow(m2, 1.5), 6)).alias("skewness"),
                F.when(ok, F.round(m4 / (m2 * m2) - F.lit(3.0), 6)).alias("kurtosis"),
                F.round(F.col(f"_mn_{c}"), 6).alias("min"),
                F.round(F.col(f"_mx_{c}"), 6).alias("max"),
            )
        )
    return one.select(F.explode(F.array(*parts)).alias("_p")).select("_p.*")


def ecdf_feature(df: DataFrame, col: str) -> DataFrame:
    """Append ``{col}_ecdf = P(X ≤ x)`` (SQL ``cume_dist``, rounded 6) —
    the rank-to-uniform transform that makes any numeric feature
    distribution-free (the first half of rank-gauss, and the robust
    alternative when a feature's scale drifts but its order doesn't).

    Global ranking WITHOUT a global sort: distinct-value counts (one
    map-side-combinable aggregation) run through the quantile-bucket
    two-phase running sum (``plans/rownum.with_global_cumsum`` — the
    ks_drift machinery; no single-partition window at any size), then
    the V-row (value → cumulative count) table joins back value-keyed.
    NULL in, NULL out; NULLs don't count toward n.
    """
    if col not in df.columns:
        raise DataFrameValidationError(f"ecdf_feature: missing column {col!r}")
    from temporalscope_spark.plans.rownum import with_global_cumsum

    x = F.col(col).cast("double")
    vals = df.filter(x.isNotNull()).groupBy(x.alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cum = with_global_cumsum(vals, ["_v"], ["_c"], materialize_input=True)
    n = df.filter(x.isNotNull()).count()
    if n == 0:
        raise DataFrameValidationError(
            f"ecdf_feature: column {col!r} has no non-null values"
        )
    lut = cum.select(
        "_v", F.round(F.col("_c_cum") / F.lit(float(n)), 6).alias(f"{col}_ecdf")
    )
    return df.withColumn("_v", x).join(lut, "_v", "left").drop("_v")


def polynomial_features(
    df: DataFrame,
    cols: Sequence[str],
    degree: int = 2,
    interaction_only: bool = False,
) -> DataFrame:
    """Append degree-2 expansions: pairwise products ``{a}_x_{b}`` for
    a < b in the given order and (unless ``interaction_only``) squares
    ``{c}_pow2`` — sklearn ``PolynomialFeatures(2)`` minus the constant
    term. Pure narrow projection (p(p+1)/2 extra expressions; this is a
    tens-of-columns tool — for thousands of implicit crosses use
    ``encoding.hash_cross``). NULL propagates. Only degree 2 is
    supported: higher-order dense expansions explode combinatorially and
    belong behind the hashing trick instead.
    """
    if degree != 2:
        raise DataFrameValidationError("polynomial_features: only degree=2 supported")
    if len(cols) < 1:
        raise DataFrameValidationError("polynomial_features: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"polynomial_features: missing columns {missing}"
        )
    out = []
    if not interaction_only:
        for c in cols:
            x = F.col(c).cast("double")
            out.append(F.round(x * x, 6).alias(f"{c}_pow2"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            out.append(
                F.round(F.col(a).cast("double") * F.col(b).cast("double"), 6).alias(
                    f"{a}_x_{b}"
                )
            )
    return df.select("*", *out)


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


def quantile_normalize(
    df: DataFrame,
    col: str,
    group_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``{col}_qn``: the PER-GROUP rank-to-uniform transform
    ``(avg_rank − 0.5) / n_g`` — cross-source score calibration. Quality
    scores from different domains live on incomparable scales (web
    perplexities vs code heuristics); rank-normalizing within each
    source makes one global threshold meaningful across all of them
    (the grouped sibling of :func:`ecdf_feature`, with AVERAGE ranks so
    tied values map identically — partition-invariant by construction).

    Global ranking without a per-group sort: distinct (group, value)
    counts (one map-side-combinable aggregation) run through the
    quantile-bucket two-phase running sum ordered by (group index,
    value) — ``plans/rownum.with_global_cumsum``, no single-partition
    window at any size; the group index and each group's starting
    offset/total are driver literals (group cardinality = sources/langs,
    bounded by convention). The V-row lookup table joins back
    (group, value)-keyed. NULL in, NULL out; NULLs don't count toward
    ``n_g``. All arithmetic after the exact integer counts is two IEEE
    divisions — bit-identical in any engine.
    """
    if col not in df.columns:
        raise DataFrameValidationError(f"quantile_normalize: missing column {col!r}")
    if group_col not in df.columns:
        raise DataFrameValidationError(
            f"quantile_normalize: missing column {group_col!r}"
        )
    from temporalscope_spark.plans.rownum import with_global_cumsum

    out_col = out_col or f"{col}_qn"
    x = F.col(col).cast("double")
    g = F.col(group_col).cast("string")
    vals = (
        df.filter(x.isNotNull())
        .groupBy(g.alias("_g"), x.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = {
        r["_g"]: r["_n"]
        for r in vals.groupBy("_g").agg(F.sum("_c").alias("_n")).collect()
    }
    if not totals:
        raise DataFrameValidationError(
            f"quantile_normalize: column {col!r} has no non-null values"
        )
    names = sorted(totals)
    gidx = {s: float(i) for i, s in enumerate(names)}
    starts, acc = {}, 0
    for s in names:
        starts[s] = float(acc)
        acc += totals[s]
    idx_map = F.create_map(*[F.lit(v) for s in names for v in (s, gidx[s])])
    start_map = F.create_map(*[F.lit(v) for s in names for v in (s, starts[s])])
    n_map = F.create_map(*[F.lit(v) for s in names for v in (s, float(totals[s]))])
    cum = with_global_cumsum(
        vals.withColumn("_gord", F.element_at(idx_map, F.col("_g"))),
        ["_gord", "_v"],
        ["_c"],
        materialize_input=True,
    )
    avg_rank = (
        F.col("_c_cum").cast("double")
        - F.element_at(start_map, F.col("_g"))
        - F.col("_c").cast("double")
        + (F.col("_c").cast("double") + F.lit(1.0)) / F.lit(2.0)
    )
    lut = cum.select(
        "_g",
        "_v",
        (
            F.round(
                (avg_rank - F.lit(0.5)) / F.element_at(n_map, F.col("_g")), 6
            )
            + F.lit(0.0)
        ).alias(out_col),
    )
    return (
        df.withColumn("_g", g)
        .withColumn("_v", x)
        .join(lut, ["_g", "_v"], "left")
        .drop("_g", "_v")
    )


def fit_mahalanobis(df: DataFrame, cols: Sequence[str]) -> dict:
    """Fit mean vector + inverse covariance for
    :func:`mahalanobis_score` — ONE moment aggregation (p means +
    p(p+1)/2 covariances, sample ddof=1, rounded 6 — the replayable-
    model contract), inverse solved driver-side (p² doubles, the
    irls/linear convention). Returns ``{"cols", "mean", "inv"}`` with
    ``inv`` a nested list. Singular covariance raises (a degenerate
    column belongs in validation, not silently pseudo-inverted)."""
    import numpy as np  # noqa: PLC0415

    cols = list(cols)
    if len(cols) < 2:
        raise DataFrameValidationError("fit_mahalanobis: need >= 2 columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"fit_mahalanobis: missing columns {missing}")
    xs = [F.col(c).cast("double") for c in cols]
    cond = xs[0].isNotNull()
    for x in xs[1:]:
        cond = cond & x.isNotNull()
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, x in enumerate(xs):
        aggs.append(F.sum(x).alias(f"_s{i}"))
        for j in range(i, len(xs)):
            aggs.append(F.sum(x * xs[j]).alias(f"_q{i}_{j}"))
    row = df.filter(cond).agg(*aggs).first()
    n = float(row["_n"])
    if n < len(cols) + 1:
        raise DataFrameValidationError(
            f"fit_mahalanobis: need more rows than columns (n={int(n)})"
        )
    p = len(cols)
    mean = [round(row[f"_s{i}"] / n, 6) for i in range(p)]
    cov = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            cij = (row[f"_q{i}_{j}"] - row[f"_s{i}"] * row[f"_s{j}"] / n) / (n - 1.0)
            cov[i, j] = cov[j, i] = round(cij, 6)
    det = np.linalg.det(cov)
    if abs(det) < 1e-12:
        raise DataFrameValidationError(
            "fit_mahalanobis: covariance is singular — drop collinear/"
            "constant columns first"
        )
    inv = np.linalg.inv(cov)
    return {
        "cols": cols,
        "mean": mean,
        "inv": [[round(float(v), 6) for v in r] for r in inv],
    }


def mahalanobis_score(
    df: DataFrame,
    model: dict,
    out_col: str = "mahalanobis",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Squared Mahalanobis distance per row under a fitted model —
    the multivariate outlier score (univariate cousin:
    :func:`mad_outliers`): ``d² = (x−μ)' Σ⁻¹ (x−μ)``, a pure expression
    of the rounded plan-literal model, rounded 6. Under multivariate
    normality d² ~ χ²(p), so the conventional gate is the χ² quantile.
    Rows with NULL in any model column score NULL."""
    cols = model["cols"]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"mahalanobis_score: missing columns {missing}"
        )
    p = len(cols)
    d = [F.col(c).cast("double") - F.lit(float(model["mean"][i]))
         for i, c in enumerate(cols)]
    expr = F.lit(0.0)
    for i in range(p):
        for j in range(p):
            expr = expr + F.lit(float(model["inv"][i][j])) * d[i] * d[j]
    keep = list(keep_cols) if keep_cols is not None else df.columns
    return df.select(*keep, F.round(expr, 6).alias(out_col))
