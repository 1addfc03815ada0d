"""Feature-relevance scoring: mutual information, chi-square, Cramér's V.

Feature selection at corpus scale needs per-feature relevance-to-label
scores BEFORE any model is trained (the sklearn
``mutual_info_score`` / ``chi2`` step of a feature-engineering pipeline).
The reference stops at validation-side profiling
(/root/reference/src/temporalscope/datasets/dataset_validator.py — counts,
nulls, class balance); this module adds the relevance battery over the
same profile-shaped plan.

Plan shape (100 TB-safe by construction): the corpus is touched ONCE — a
narrow melt projection (``stack``) followed by one map-side-combinable
``groupBy(feature, value, label)`` count. Everything downstream operates
on the CELL table, whose size is Σ_f |V_f|·|L| — bounded by the
categorical cardinalities, not the row count. Marginals, the expected
grid, and the per-feature folds are all joins/aggregations over that
small table (AQE broadcasts them). Continuous features should be binned
first (``window_buckets`` or a plain ``floor``) — relevance over raw
doubles degenerates to one cell per row, which this module treats as the
caller's modeling error, not something to paper over.

Determinism: per-feature statistics fold cell terms SORTED by
(value, label) — the same sorted-fold contract as the LM scorers — so an
exact SQL oracle replays the float sums bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from temporalscope_spark.core.caching import hold
from temporalscope_spark.exceptions import DataFrameValidationError


def feature_relevance(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Relevance of each categorical feature to a categorical label.

    Per feature ``f`` over the rows where both ``f`` and the label are
    non-null (pairwise-complete, like ``pandas.crosstab``):

    * ``mi_nats``  — mutual information Σ p(v,y)·ln(p(v,y)/(p(v)p(y)))
      over observed cells (empty cells contribute 0 by the 0·ln0 = 0
      convention).
    * ``chi2``     — Pearson's Σ (O−E)²/E over the FULL V×L grid
      (E = row·col/n; zero-observed cells still contribute E).
    * ``dof``      — (V−1)(L−1).
    * ``cramers_v`` — √(chi2 / (n·min(V−1, L−1))), the [0,1]-normalized
      effect size; NULL when either side is constant.

    Feature and label values are compared as strings (uniform melt
    type); numeric features must be pre-binned — see module docstring.

    Output: one row per feature —
    ``(feature, n_obs, n_values, n_labels, mi_nats, chi2, dof, cramers_v)``,
    floats rounded to 6.
    """
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    missing = [c for c in (*feature_cols, label_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"feature_relevance: missing columns {missing}")

    p = len(feature_cols)
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in feature_cols
    )
    melted = (
        df.select(
            F.expr(f"stack({p}, {stack_args}) AS (feature, v)"),
            F.col(label_col).cast("string").alias("y"),
        )
        .filter(F.col("v").isNotNull() & F.col("y").isNotNull())
    )
    # the cell table is the branch point: it feeds both marginals, the
    # totals AND the grid join — without the persist, each consumer
    # re-runs the corpus melt+count (four full scans). It is bounded by
    # the categorical cardinalities, so the cache is small; the handle is
    # attached to the result (core.caching.hold) for explicit release.
    cells = (
        melted.groupBy("feature", "v", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    av = cells.groupBy("feature", "v").agg(F.sum("c").alias("a"))
    bl = cells.groupBy("feature", "y").agg(F.sum("c").alias("b"))
    nf = cells.groupBy("feature").agg(F.sum("c").alias("n"))

    grid = (
        av.join(bl, "feature")
        .join(cells, ["feature", "v", "y"], "left")
        .join(F.broadcast(nf), "feature")
        .select(
            "feature",
            "v",
            "y",
            "n",
            F.coalesce("c", F.lit(0.0)).alias("o"),
            (F.col("a") * F.col("b") / F.col("n")).alias("e"),
        )
    )
    terms = grid.select(
        "feature",
        "n",
        F.struct(
            "v",
            "y",
            F.when(
                F.col("o") > 0,
                (F.col("o") / F.col("n")) * F.log(F.col("o") / F.col("e")),
            )
            .otherwise(F.lit(0.0))
            .alias("mi_t"),
            (
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            ).alias("chi_t"),
        ).alias("_s"),
    )
    folded = terms.groupBy("feature").agg(
        F.first("n").alias("n"),
        F.array_sort(F.collect_list("_s")).alias("_arr"),
        F.count_distinct(F.col("_s.v")).cast("double").alias("nv"),
        F.count_distinct(F.col("_s.y")).cast("double").alias("nl"),
    )
    mi = F.aggregate("_arr", F.lit(0.0), lambda acc, s: acc + s["mi_t"])
    chi2 = F.aggregate("_arr", F.lit(0.0), lambda acc, s: acc + s["chi_t"])
    mind = F.least(F.col("nv") - 1, F.col("nl") - 1)
    return hold(folded.select(
        "feature",
        F.col("n").cast("long").alias("n_obs"),
        F.col("nv").cast("long").alias("n_values"),
        F.col("nl").cast("long").alias("n_labels"),
        (F.round(mi, 6) + F.lit(0.0)).alias("mi_nats"),
        (F.round(chi2, 6) + F.lit(0.0)).alias("chi2"),
        ((F.col("nv") - 1) * (F.col("nl") - 1)).cast("long").alias("dof"),
        (
            F.round(F.when(mind >= 1, F.sqrt(chi2 / (F.col("n") * mind))), 6)
            + F.lit(0.0)
        ).alias("cramers_v"),
    ), cells)


def numeric_relevance(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Pearson r + t-statistic of each numeric feature against a numeric
    label — the univariate screen sklearn runs as ``r_regression`` /
    ``f_regression`` (F = t²) before model fitting. Completes the
    relevance battery: :func:`feature_relevance` covers categorical ×
    categorical; this covers numeric × numeric.

    Per feature, over the rows where BOTH the feature and the label are
    non-null (pairwise-complete, matching :func:`correlation_matrix`):

    * ``pearson_r`` — closed-form r from six gated moments; NULL when
      either side has zero variance or fewer than 2 pairs.
    * ``t_stat``   — r·√((n−2)/(1−r²)), the significance statistic
      (t-distributed with n−2 dof under H0); NULL when r is NULL,
      n ≤ 2, or |r| = 1 (infinite t).

    Plan shape: ONE map-side-combinable aggregation computes all p·6
    gated moments (one corpus scan, one 1-row result); the per-feature
    rows explode from that single row — nothing downstream depends on
    the data size.

    Output: ``(feature, n, pearson_r, t_stat)`` in the given column
    order, floats rounded to 6.
    """
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    missing = [c for c in (*feature_cols, label_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"numeric_relevance: missing columns {missing}")

    y = F.col(label_col).cast("double")
    aggs = []
    for i, c in enumerate(feature_cols):
        x = F.col(c).cast("double")
        both = x.isNotNull() & y.isNotNull()
        gx, gy = F.when(both, x), F.when(both, y)
        aggs.extend(
            [
                F.count(gx).cast("double").alias(f"n_{i}"),
                F.sum(gx).alias(f"sx_{i}"),
                F.sum(gy).alias(f"sy_{i}"),
                F.sum(gx * gy).alias(f"sxy_{i}"),
                F.sum(gx * gx).alias(f"sxx_{i}"),
                F.sum(gy * gy).alias(f"syy_{i}"),
            ]
        )
    one = df.agg(*aggs)

    structs = []
    for i, c in enumerate(feature_cols):
        n = F.col(f"n_{i}")
        sx, sy = F.col(f"sx_{i}"), F.col(f"sy_{i}")
        sxy, sxx, syy = (
            F.col(f"sxy_{i}"),
            F.col(f"sxx_{i}"),
            F.col(f"syy_{i}"),
        )
        cov_num = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        r = F.when(
            (n >= 2) & (varx > 0) & (vary > 0),
            cov_num / F.sqrt(varx * vary),
        )
        t = F.when(
            r.isNotNull() & (n > 2) & (F.lit(1.0) - r * r > 0),
            r * F.sqrt((n - 2) / (F.lit(1.0) - r * r)),
        )
        structs.append(
            F.struct(
                F.lit(c).alias("feature"),
                n.cast("long").alias("n"),
                (F.round(r, 6) + F.lit(0.0)).alias("pearson_r"),
                (F.round(t, 6) + F.lit(0.0)).alias("t_stat"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def spearman_matrix(
    df: DataFrame,
    cols: Sequence[str],
    sample: bool = True,
) -> DataFrame:
    """Pairwise Spearman rank correlation over the given numeric columns,
    long format — the monotone-robust twin of :func:`correlation_matrix`
    (pandas ``df.corr(method="spearman")`` / scipy ``spearmanr``).

    Each column's values map to AVERAGE (fractional) ranks over its
    non-null values — the standard tie convention — and the result is
    Pearson over the rank columns, pairwise-complete. On complete data
    this equals scipy/pandas exactly; with missing values, ranks come
    from each column's FULL non-null set (not re-ranked per pair), the
    documented convention (pandas re-ranks per pair — an O(p²) corpus
    re-sort this operator deliberately avoids at scale).

    Global ranking WITHOUT a global sort (the :func:`~temporalscope_spark.
    operators.scaling.ecdf_feature` machinery): per column, distinct-value
    counts (one map-side-combinable aggregation) run through the
    quantile-bucket two-phase running sum (``plans/rownum.
    with_global_cumsum`` — no single-partition window at any size);
    average rank for a value with count c and inclusive cumulative cum is
    ``cum − c + (c+1)/2``. The V-row lookup joins back value-keyed, then
    ONE gated-moment aggregation computes every pair (the
    :func:`correlation_matrix` plan over the rank columns).

    Output: ``(f1, f2, n_pairs, rho)`` for each ``f1 ≤ f2`` in the given
    column order, rho rounded to 6.
    """
    if len(cols) < 2:
        raise DataFrameValidationError("spearman_matrix needs >= 2 columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"spearman_matrix: missing columns {missing}")
    from temporalscope_spark.plans.rownum import with_global_cumsum

    work = df
    rank_of = {}
    for i, c in enumerate(cols):
        x = F.col(c).cast("double")
        vals = (
            df.filter(x.isNotNull())
            .groupBy(x.alias("_v"))
            .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        )
        cum = with_global_cumsum(vals, ["_v"], ["_c"], materialize_input=True)
        key, rc = f"_sv_{i}", f"_sr_{i}"
        lut = cum.select(
            F.col("_v").alias(key),
            (F.col("_c_cum") - F.col("_c") + (F.col("_c") + 1) / 2.0).alias(rc),
        )
        work = work.withColumn(key, x).join(lut, key, "left").drop(key)
        rank_of[rc] = c
    out = correlation_matrix(work, list(rank_of), sample=sample)
    name = F.create_map(
        *[lit for rc, c in rank_of.items() for lit in (F.lit(rc), F.lit(c))]
    )
    return out.select(
        name[F.col("f1")].alias("f1"),
        name[F.col("f2")].alias("f2"),
        "n_pairs",
        F.col("corr").alias("rho"),
    )


def anova_f(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """One-way ANOVA F of each numeric feature across the classes of a
    categorical label — sklearn's ``f_classif`` screen, the third quadrant
    of the relevance battery (:func:`feature_relevance` = categorical ×
    categorical, :func:`numeric_relevance` = numeric × numeric, this =
    numeric × categorical).

    Per feature, over rows where BOTH the feature and the label are
    non-null (pairwise-complete):

    * ``f_stat`` — (SSB/(k−1)) / (SSW/(n−k)) with SSB the between-class
      and SSW the within-class sum of squares; NULL when k < 2, n ≤ k,
      or SSW = 0 (all classes internally constant — infinite F).
    * ``df_between`` = k−1, ``df_within`` = n−k.

    Plan shape: ONE corpus melt (``stack``) + ONE map-side-combinable
    ``groupBy(feature, class)`` aggregation of (count, Σx, Σx²) — the
    class-moment table is bounded by p·|L|, and every statistic folds
    from it. Folds run SORTED by class (the package's sorted-fold
    contract), so an exact SQL oracle replays the float sums.

    Output: ``(feature, n, k_classes, f_stat, df_between, df_within)``,
    floats rounded to 6.
    """
    if not feature_cols:
        raise DataFrameValidationError("feature_cols must be non-empty")
    missing = [c for c in (*feature_cols, label_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"anova_f: missing columns {missing}")

    p = len(feature_cols)
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in feature_cols)
    melted = (
        df.select(
            F.expr(f"stack({p}, {stack_args}) AS (feature, x)"),
            F.col(label_col).cast("string").alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    groups = melted.groupBy("feature", "y").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.col("x")).alias("ssg"),
    )
    folded = groups.groupBy("feature").agg(
        F.array_sort(F.collect_list(F.struct("y", "ng", "sg", "ssg"))).alias("_arr"),
    )
    n = F.aggregate("_arr", F.lit(0.0), lambda a, s: a + s["ng"])
    k = F.size("_arr").cast("double")
    s_tot = F.aggregate("_arr", F.lit(0.0), lambda a, s: a + s["sg"])
    mean = s_tot / n
    ssb = F.aggregate(
        "_arr",
        F.lit(0.0),
        lambda a, s: a
        + s["ng"] * (s["sg"] / s["ng"] - mean) * (s["sg"] / s["ng"] - mean),
    )
    ssw = F.aggregate(
        "_arr",
        F.lit(0.0),
        lambda a, s: a + (s["ssg"] - s["sg"] * s["sg"] / s["ng"]),
    )
    fstat = F.when(
        (k >= 2) & (n > k) & (ssw > 0),
        (ssb / (k - 1)) / (ssw / (n - k)),
    )
    return folded.select(
        "feature",
        n.cast("long").alias("n"),
        k.cast("long").alias("k_classes"),
        (F.round(fstat, 6) + F.lit(0.0)).alias("f_stat"),
        (k - 1).cast("long").alias("df_between"),
        (n - k).cast("long").alias("df_within"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: Sequence[str],
    sample: bool = True,
) -> DataFrame:
    """Pairwise-complete Pearson correlation/covariance matrix over the
    given numeric columns, long format — the multicollinearity screen a
    feature pipeline runs before model fitting (pandas ``df.corr()`` /
    ``df.cov()``, but in ONE distributed aggregation).

    For every unordered pair ``i ≤ j``, statistics use the rows where BOTH
    columns are non-null (pairwise-complete, pandas' convention), via
    gated sums: ``cov = (Σxy − ΣxΣy/n) / (n−1)`` (``sample=False``
    divides by n) and the matching closed-form correlation — the same
    textbook moments as :func:`~temporalscope_spark.operators.rolling.
    rolling_corr`, so the SQL oracle replays them exactly. ``cov``/
    ``corr`` are NULL below 2 pairs; ``corr`` additionally NULL on zero
    variance (diagonal included: corr 1.0 unless degenerate).

    Plan shape: ONE map-side-combinable aggregation computes all
    p(p+1)/2 · 6 gated moments (one corpus scan, one 1-row result), then
    the long rows explode from that single row — nothing downstream of
    the scan depends on the data size. ``p`` is the feature dimension
    (tens); for p in the thousands you'd batch the pair set, not this
    operator's target.

    Output: ``(f1, f2, n_pairs, cov, corr)`` for each ``f1 ≤ f2`` in the
    given column order, floats rounded to 6.
    """
    if len(cols) < 2:
        raise DataFrameValidationError("correlation_matrix needs >= 2 columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"correlation_matrix: missing columns {missing}")

    aggs = []
    pairs = []
    for i, ci in enumerate(cols):
        for cj in cols[i:]:
            xi = F.col(ci).cast("double")
            xj = F.col(cj).cast("double")
            both = xi.isNotNull() & xj.isNotNull()
            gx, gy = F.when(both, xi), F.when(both, xj)
            tag = f"{ci}__{cj}"
            aggs.extend(
                [
                    F.count(gx).cast("double").alias(f"n_{tag}"),
                    F.sum(gx).alias(f"sx_{tag}"),
                    F.sum(gy).alias(f"sy_{tag}"),
                    F.sum(gx * gy).alias(f"sxy_{tag}"),
                    F.sum(gx * gx).alias(f"sxx_{tag}"),
                    F.sum(gy * gy).alias(f"syy_{tag}"),
                ]
            )
            pairs.append((ci, cj, tag))
    one = df.agg(*aggs)

    structs = []
    for ci, cj, tag in pairs:
        n = F.col(f"n_{tag}")
        sx, sy = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sxy, sxx, syy = (
            F.col(f"sxy_{tag}"),
            F.col(f"sxx_{tag}"),
            F.col(f"syy_{tag}"),
        )
        cov_num = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        denom = n - 1 if sample else n
        structs.append(
            F.struct(
                F.lit(ci).alias("f1"),
                F.lit(cj).alias("f2"),
                n.cast("long").alias("n_pairs"),
                (F.round(F.when(n >= 2, cov_num / denom), 6) + F.lit(0.0)).alias(
                    "cov"
                ),
                (
                    F.round(
                        F.when(
                            (n >= 2) & (varx > 0) & (vary > 0),
                            cov_num / F.sqrt(varx * vary),
                        ),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("corr"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def select_features_mrmr(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    k: int,
) -> DataFrame:
    """Greedy mRMR feature selection (Peng et al. 2005, the
    max-relevance / min-redundancy screen): rank ``k`` features where
    round ``i`` picks the unselected feature maximizing

        score(f) = relevance(f) − mean_{s ∈ selected} |corr(f, s)|

    with relevance = |Pearson r to the label| (:func:`numeric_relevance`)
    and redundancy from the pairwise matrix (:func:`correlation_matrix`).
    Ties break on the feature name ascending. Features with NULL
    relevance (constant columns) are excluded up front; a NULL pairwise
    correlation contributes 0 redundancy. Scores compose the two
    operators' ROUNDED (1e-6) outputs, so the selection is
    engine-portable and exactly replayable in SQL.

    Plan shape: the corpus is touched exactly TWICE (one gated-moment
    aggregation each for relevance and the p×p matrix — both 1-row
    results); the greedy loop runs on the driver over those bounded
    tables (p ≤ tens), never over rows.

    Output: ``(rank, feature, relevance, redundancy, score)`` for the
    ``min(k, viable)`` selected features, floats rounded to 6.
    """
    if k < 1:
        raise DataFrameValidationError("select_features_mrmr: k must be >= 1")
    rel_rows = numeric_relevance(df, feature_cols, label_col).collect()
    rel = {
        r["feature"]: abs(r["pearson_r"])
        for r in rel_rows
        if r["pearson_r"] is not None
    }
    if len(feature_cols) >= 2:
        corr_rows = correlation_matrix(df, feature_cols).collect()
        sym = {}
        for r in corr_rows:
            c = abs(r["corr"]) if r["corr"] is not None else 0.0
            sym[(r["f1"], r["f2"])] = c
            sym[(r["f2"], r["f1"])] = c
    else:
        sym = {}

    selected: list[tuple[str, float, float, float]] = []
    remaining = sorted(rel)
    while remaining and len(selected) < k:
        best = None
        for f in remaining:  # ascending name = deterministic tie-break
            red = (
                sum(sym.get((f, s[0]), 0.0) for s in selected) / len(selected)
                if selected
                else 0.0
            )
            score = rel[f] - red
            if best is None or score > best[3]:
                best = (f, rel[f], red, score)
        selected.append(best)
        remaining.remove(best[0])

    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, f, round(r, 6), round(red, 6), round(sc, 6))
            for i, (f, r, red, sc) in enumerate(selected)
        ],
        "rank INT, feature STRING, relevance DOUBLE, redundancy DOUBLE, score DOUBLE",
    )
