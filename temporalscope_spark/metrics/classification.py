"""Classification evaluation metrics: exact ROC AUC, reliability curve,
decile lift/gain table.

The engine trains gate models (modeling/logistic.py IRLS, the quality
classifier) and scores corpora with them; evaluating those scores at corpus
scale needs the standard metric battery WITHOUT collecting scores to the
driver (sklearn's ``roc_auc_score`` sorts the whole array in memory — a
non-starter at 100 TB). The reference has no model-evaluation surface
(its trainer modules are commented out); this module is the engine's
completion of that story.

Plan shapes (all 100 TB-safe):

* ``auc_roc`` — the Mann–Whitney rank-sum identity
  ``AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)`` with ``R⁺`` the sum of the
  positives' AVERAGE ranks. Ranks come from the distinct-score table via
  the quantile-bucket two-phase running sum
  (``plans/rownum.with_global_cumsum`` — the Spearman machinery, NO
  single-partition window, NO global sort), and average ranks make the
  tie handling exactly the trapezoidal correction sklearn applies.
* ``reliability_curve`` — fixed-width probability bins, ONE map-side-
  combinable aggregation (the calibration diagnostic for a trained gate).
* ``lift_table`` — exact score-percentile edges (driver literals), one
  conditional-count aggregation, cumulative capture over the BOUNDED
  ``deciles``-row table (the one window in this module runs over ≤ B
  rows by construction — never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


def _checked(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    for c in (score_col, label_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"missing column {c!r}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    return df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.alias("_y")
    )


def auc_roc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC of a score column against a 0/1 label.

    Mann–Whitney identity over AVERAGE ranks of the score (ties get the
    mean of their positions — identical to sklearn's trapezoidal ROC).
    Rows where either side is NULL are excluded; a label outside {0, 1},
    or a single-class label, raises.

    The distinct-score table (one map-side-combinable aggregation)
    carries (count, positive count) per value; average ranks come from
    the two-phase global running sum, and ONE bounded fold produces the
    scalar — two bounded driver actions, no global sort, no
    score-vector collection.

    Output: one row ``(n_pos, n_neg, auc)``, auc rounded to 6.
    """
    from temporalscope_spark.plans.rownum import with_global_cumsum

    base = _checked(df, score_col, label_col)
    vals = base.groupBy(F.col("_s").alias("_v")).agg(
        F.count(F.lit(1)).cast("double").alias("_c"),
        F.sum("_y").alias("_p"),
        F.max(
            F.when((F.col("_y") != 0.0) & (F.col("_y") != 1.0), 1).otherwise(0)
        ).alias("_bad"),
    )
    cum = with_global_cumsum(vals, ["_v"], ["_c"], materialize_input=True)
    avg_rank = F.col("_c_cum") - F.col("_c") + (F.col("_c") + 1) / 2.0
    row = cum.agg(
        F.sum("_p").alias("_np"),
        F.sum(F.col("_c") - F.col("_p")).alias("_nn"),
        F.sum(F.col("_p") * avg_rank).alias("_rp"),
        F.max("_bad").alias("_anybad"),
    ).collect()[0]
    if row["_anybad"] is None:
        raise DataFrameValidationError("auc_roc: no scorable rows")
    if row["_anybad"]:
        raise DataFrameValidationError(f"auc_roc: label {label_col!r} must be 0/1")
    n_pos, n_neg = float(row["_np"]), float(row["_nn"])
    if n_pos == 0.0 or n_neg == 0.0:
        raise DataFrameValidationError("auc_roc: label needs both classes present")
    auc = (float(row["_rp"]) - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return df.sparkSession.createDataFrame(
        [(int(n_pos), int(n_neg), round(auc, 6))],
        "n_pos LONG, n_neg LONG, auc DOUBLE",
    )


def reliability_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Calibration (reliability) curve of a probability score in [0, 1]
    against a 0/1 label: fixed-width bins ``[(b−1)/B, b/B)`` (scores of
    exactly 1.0 land in the top bin), per bin the mean predicted
    probability vs the observed positive rate, and their gap — the
    per-bin view of expected calibration error. A perfectly calibrated
    model has ``gap ≈ 0`` everywhere.

    ONE map-side-combinable aggregation over a narrow projection; empty
    bins are simply absent (a bounded spine join adds nothing a caller
    can't see from the bin ids). Rows with a NULL on either side are
    excluded; scores outside [0, 1] are clamped into the edge bins
    (documented — a probability column that needs clamping is the
    caller's bug, not silently hidden: ``mean_score`` will sit outside
    the bin range and the gap exposes it).

    Output: ``(bin, lo, hi, n, mean_score, frac_pos, gap)`` per
    non-empty bin, floats rounded to 6.
    """
    if bins < 2:
        raise DataFrameValidationError("reliability_curve: bins must be >= 2")
    base = _checked(df, score_col, label_col)
    b = F.least(
        F.greatest(F.floor(F.col("_s") * bins).cast("int") + 1, F.lit(1)),
        F.lit(bins),
    )
    out = (
        base.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_s").alias("_ms"),
            F.avg("_y").alias("_fp"),
        )
        .select(
            "bin",
            ((F.col("bin") - 1).cast("double") / bins).alias("lo"),
            (F.col("bin").cast("double") / bins).alias("hi"),
            "n",
            (F.round("_ms", 6) + F.lit(0.0)).alias("mean_score"),
            (F.round("_fp", 6) + F.lit(0.0)).alias("frac_pos"),
            (F.round(F.col("_fp") - F.col("_ms"), 6) + F.lit(0.0)).alias("gap"),
        )
    )
    return out


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    deciles: int = 10,
) -> DataFrame:
    """Decile lift/gain table — the scorecard view of a ranking model:
    rows are score bands from the TOP (decile 1 = highest scores) built
    on exact score percentiles; per band the positive rate, its lift
    over the base rate, the cumulative capture of all positives, and
    cumulative lift.

    Edges are exact ``percentile`` values quantized to 1e-6 (the
    ``psi_drift`` convention; heavy ties can collapse a band — the
    collapsed decile is absent, documented). One edge aggregate (driver
    literals), ONE conditional-count aggregation over the corpus, then
    the cumulative pass runs over the BOUNDED ``deciles``-row band
    table — the single ordered window in this module, over ≤ B rows by
    construction.

    Output: ``(decile, lo, n, n_pos, pos_rate, lift, cum_capture,
    cum_lift)`` per non-empty band, floats rounded to 6.
    """
    if deciles < 2:
        raise DataFrameValidationError("lift_table: deciles must be >= 2")
    base = _checked(df, score_col, label_col)
    probs = F.array(*[F.lit(i / deciles) for i in range(1, deciles)])
    edge_row = base.agg(F.percentile("_s", probs).alias("_e")).collect()[0]["_e"]
    if edge_row is None:
        raise DataFrameValidationError("lift_table: no scorable rows")
    edges = [round(float(e), 6) for e in edge_row]
    earr = F.array(*[F.lit(e) for e in edges])
    # ascending bin 1..B, then flip so decile 1 = top scores
    asc = F.aggregate(
        earr, F.lit(1), lambda acc, e: acc + (F.col("_s") > e).cast("int")
    )
    bands = (
        base.groupBy((F.lit(deciles + 1) - asc).alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("_pos"),
        )
    )
    # edges[i] is the (i+1)/B percentile = the lower edge of ascending
    # bin i+2 = the lower edge of decile B−1−i; decile B is open below
    lo_map = F.create_map(
        *[F.lit(x) for i, e in enumerate(edges) for x in (deciles - 1 - i, e)]
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.col("n").cast("double")
    pos = F.col("_pos")
    tot_n = F.sum("n").over(tot).cast("double")
    tot_pos = F.sum("_pos").over(tot)
    rate = pos / n
    base_rate = tot_pos / tot_n
    cum_pos = F.sum("_pos").over(w)
    cum_n = F.sum("n").over(w).cast("double")
    return bands.select(
        "decile",
        F.element_at(lo_map, F.col("decile")).alias("lo"),
        "n",
        pos.cast("long").alias("n_pos"),
        (F.round(rate, 6) + F.lit(0.0)).alias("pos_rate"),
        (
            F.round(F.when(base_rate > 0, rate / base_rate), 6) + F.lit(0.0)
        ).alias("lift"),
        (
            F.round(F.when(tot_pos > 0, cum_pos / tot_pos), 6) + F.lit(0.0)
        ).alias("cum_capture"),
        (
            F.round(
                F.when(base_rate > 0, (cum_pos / cum_n) / base_rate), 6
            )
            + F.lit(0.0)
        ).alias("cum_lift"),
    )


def fit_isotonic_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 50,
) -> dict:
    """Fit an isotonic (monotone non-decreasing) calibration map on
    fixed-width score bins — sklearn's ``IsotonicRegression`` /
    ``CalibratedClassifierCV(method="isotonic")``, made scale-safe by
    fitting on the BOUNDED bin table instead of the raw scores (the
    standard large-scale calibration recipe; resolution is ``1/bins``).

    One map-side-combinable aggregation produces (n, Σy) per occupied
    bin; the pool-adjacent-violators solve runs on the driver over ≤
    ``bins`` weighted points. PAV's solution equals the minimax closed
    form ``fit(i) = max_{j≤i} min_{k≥i} avg(y over bins j..k)`` — which
    is how the SQL oracle replays it without iteration.

    Model: ``{"bins", "bin_ids", "values"}`` — fitted probability per
    occupied bin, monotone across bin ids.
    """
    if bins < 2:
        raise DataFrameValidationError("fit_isotonic_bins: bins must be >= 2")
    base = _checked(df, score_col, label_col)
    b = F.least(
        F.greatest(F.floor(F.col("_s") * bins).cast("int") + 1, F.lit(1)),
        F.lit(bins),
    )
    rows = (
        base.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("_y").alias("p"),
            F.max(
                F.when(
                    (F.col("_y") != 0.0) & (F.col("_y") != 1.0), 1
                ).otherwise(0)
            ).alias("bad"),
        )
        .collect()
    )
    if not rows:
        raise DataFrameValidationError("fit_isotonic_bins: no scorable rows")
    if any(r["bad"] for r in rows):
        raise DataFrameValidationError(
            f"fit_isotonic_bins: label {label_col!r} must be 0/1"
        )
    rows.sort(key=lambda r: r["bin"])
    # pool-adjacent-violators over (weight, mean) blocks
    blocks = [[r["bin"], r["bin"], float(r["n"]), float(r["p"])] for r in rows]
    i = 0
    while i < len(blocks) - 1:
        a, c = blocks[i], blocks[i + 1]
        if a[3] / a[2] > c[3] / c[2] + 1e-15:
            blocks[i] = [a[0], c[1], a[2] + c[2], a[3] + c[3]]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted = {}
    for lo, hi, w, p in blocks:
        for r in rows:
            if lo <= r["bin"] <= hi:
                fitted[r["bin"]] = p / w
    return {
        "bins": bins,
        "bin_ids": [r["bin"] for r in rows],
        "values": [round(fitted[r["bin"]], 6) for r in rows],
    }


def calibrate_scores(
    df: DataFrame,
    model: dict,
    score_col: str,
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply a fitted isotonic bin map: each score lands in its fixed-width
    bin and takes the fitted monotone probability; a score whose bin was
    EMPTY at fit time takes the nearest occupied bin's value (the
    piecewise-constant extension). Pure expression — a literal map lookup,
    no join, no shuffle.
    """
    if score_col not in df.columns:
        raise DataFrameValidationError(f"calibrate_scores: missing column {score_col!r}")
    bins = model["bins"]
    ids, vals = model["bin_ids"], model["values"]
    # nearest-occupied extension precomputed driver-side for all bins
    full = {}
    for b in range(1, bins + 1):
        nearest = min(ids, key=lambda i: (abs(i - b), i))
        full[b] = vals[ids.index(nearest)]
    m = F.create_map(*[F.lit(x) for b in range(1, bins + 1) for x in (b, full[b])])
    s = F.col(score_col).cast("double")
    bexp = F.least(
        F.greatest(F.floor(s * bins).cast("int") + 1, F.lit(1)), F.lit(bins)
    )
    return df.withColumn(
        out_col, F.when(s.isNotNull(), F.element_at(m, bexp))
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list | None = None,
) -> DataFrame:
    """Precision / recall / F1 / accuracy at a sweep of decision
    thresholds (score ≥ t ⇒ predicted positive) — the PR-curve points and
    the operating-point table a gate deployment reads.

    All T thresholds evaluate in ONE map-side-combinable aggregation
    (4·T conditional counts as expressions — T is tens, the corpus is
    scanned once); the per-threshold rows explode from the 1-row result.
    Default thresholds: 0.1 .. 0.9. Precision is NULL when nothing is
    predicted positive (0/0); F1 is NULL when precision or recall is.

    Output: ``(threshold, tp, fp, fn, tn, precision, recall, f1,
    accuracy)``, floats rounded to 6.
    """
    if thresholds is not None and not thresholds:
        raise DataFrameValidationError("pr_curve: thresholds must be non-empty")
    ts = [
        round(t, 6)
        for t in (
            thresholds if thresholds is not None else [i / 10 for i in range(1, 10)]
        )
    ]
    base = _checked(df, score_col, label_col)
    aggs = []
    for i, t in enumerate(ts):
        pred = F.col("_s") >= t
        y = F.col("_y") == 1.0
        aggs += [
            F.sum((pred & y).cast("long")).alias(f"tp_{i}"),
            F.sum((pred & ~y).cast("long")).alias(f"fp_{i}"),
            F.sum((~pred & y).cast("long")).alias(f"fn_{i}"),
            F.sum((~pred & ~y).cast("long")).alias(f"tn_{i}"),
        ]
    one = base.agg(*aggs)
    structs = []
    for i, t in enumerate(ts):
        tp = F.col(f"tp_{i}").cast("double")
        fp = F.col(f"fp_{i}").cast("double")
        fn = F.col(f"fn_{i}").cast("double")
        tn = F.col(f"tn_{i}").cast("double")
        prec = F.when(tp + fp > 0, tp / (tp + fp))
        rec = F.when(tp + fn > 0, tp / (tp + fn))
        f1 = F.when(
            prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
            2 * prec * rec / (prec + rec),
        )
        acc = F.when(tp + fp + fn + tn > 0, (tp + tn) / (tp + fp + fn + tn))
        structs.append(
            F.struct(
                F.lit(t).alias("threshold"),
                tp.cast("long").alias("tp"),
                fp.cast("long").alias("fp"),
                fn.cast("long").alias("fn"),
                tn.cast("long").alias("tn"),
                (F.round(prec, 6) + F.lit(0.0)).alias("precision"),
                (F.round(rec, 6) + F.lit(0.0)).alias("recall"),
                (F.round(f1, 6) + F.lit(0.0)).alias("f1"),
                (F.round(acc, 6) + F.lit(0.0)).alias("accuracy"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def regression_metrics(
    df: DataFrame,
    pred_col: str,
    target_col: str,
    group_cols: list | None = None,
) -> DataFrame:
    """RMSE / MAE / bias / R² per group (or globally) from ONE
    map-side-combinable aggregation of gated moments — the evaluation
    twin of the linear trainer's in-aggregation metrics, exposed for ANY
    prediction column (pairwise-complete over rows where both sides are
    non-null). R² is NULL when the target has zero variance or < 2
    pairs.

    Output: ``(group_cols..., n, rmse, mae, bias, r2)``, floats rounded
    to 6.
    """
    for c in (pred_col, target_col, *(group_cols or [])):
        if c not in df.columns:
            raise DataFrameValidationError(f"regression_metrics: missing column {c!r}")
    p = F.col(pred_col).cast("double")
    y = F.col(target_col).cast("double")
    both = p.isNotNull() & y.isNotNull()
    gp, gy = F.when(both, p), F.when(both, y)
    e = gp - gy
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    one = grouped.agg(
        F.count(gp).cast("double").alias("_n"),
        F.sum(e * e).alias("_se"),
        F.sum(F.abs(e)).alias("_ae"),
        F.sum(e).alias("_be"),
        F.sum(gy).alias("_sy"),
        F.sum(gy * gy).alias("_syy"),
    )
    n = F.col("_n")
    sst = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    return one.select(
        *(group_cols or []),
        n.cast("long").alias("n"),
        (F.round(F.when(n > 0, F.sqrt(F.col("_se") / n)), 6) + F.lit(0.0)).alias(
            "rmse"
        ),
        (F.round(F.when(n > 0, F.col("_ae") / n), 6) + F.lit(0.0)).alias("mae"),
        (F.round(F.when(n > 0, F.col("_be") / n), 6) + F.lit(0.0)).alias("bias"),
        (
            F.round(
                F.when((n >= 2) & (sst > 0), 1 - F.col("_se") / sst), 6
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


def auc_by_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list,
) -> DataFrame:
    """Exact ROC AUC per group — model-quality tracking over segments or
    time windows (the AUC twin of the PSI drift monitor: score the gate
    per day/source and alarm when discrimination decays).

    Same Mann–Whitney average-rank identity as :func:`auc_roc`, but
    ranks come from a window over the per-group DISTINCT-SCORE table
    (``partitionBy(group)`` — each partition holds one group's distinct
    score values, bounded by the score resolution, never the group's
    row count), then ONE ``groupBy(group)`` fold. Groups missing a class
    report NULL auc (n_pos/n_neg say why); labels outside {0, 1} raise.

    Output: ``(group_cols..., n_pos, n_neg, auc)``, auc rounded to 6.
    """
    if not group_cols:
        raise DataFrameValidationError("auc_by_group: group_cols must be non-empty")
    for c in (score_col, label_col, *group_cols):
        if c not in df.columns:
            raise DataFrameValidationError(f"auc_by_group: missing column {c!r}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        *group_cols, s.alias("_s"), y.alias("_y")
    )
    vals = base.groupBy(*group_cols, F.col("_s").alias("_v")).agg(
        F.count(F.lit(1)).cast("double").alias("_c"),
        F.sum("_y").alias("_p"),
        F.max(
            F.when((F.col("_y") != 0.0) & (F.col("_y") != 1.0), 1).otherwise(0)
        ).alias("_bad"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vals.withColumn("_cc", F.sum("_c").over(w))
    avg_rank = F.col("_cc") - F.col("_c") + (F.col("_c") + 1) / 2.0
    agg = cum.groupBy(*group_cols).agg(
        F.sum("_p").alias("_np"),
        F.sum(F.col("_c") - F.col("_p")).alias("_nn"),
        F.sum(F.col("_p") * avg_rank).alias("_rp"),
        F.max("_bad").alias("_anybad"),
    )
    bad = agg.agg(F.max("_anybad")).collect()[0][0]
    if bad:
        raise DataFrameValidationError(
            f"auc_by_group: label {label_col!r} must be 0/1"
        )
    np_, nn_ = F.col("_np"), F.col("_nn")
    auc = F.when(
        (np_ > 0) & (nn_ > 0),
        (F.col("_rp") - np_ * (np_ + 1) / 2.0) / (np_ * nn_),
    )
    return agg.select(
        *group_cols,
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        (F.round(auc, 6) + F.lit(0.0)).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
    grid: int = 100,
) -> DataFrame:
    """Thresholded binary-classification report in ONE aggregation: the
    confusion counts at ``score >= threshold`` plus the derived scalars
    every model gate reads — accuracy, precision, recall, F1, balanced
    accuracy, Matthews correlation, and the Brier score.

    All eight scalars are functions of five exact integer sums (tp, fp,
    tn, fn and the squared-error numerator), so the pass is ONE
    map-side-combinable aggregation over the corpus with a closed-form
    1-row projection on top — no sort, no second scan, and bit-identical
    results across engines and partitionings.

    Determinism of the Brier term: float mean((s − y)²) is
    accumulation-order sensitive, so the score is snapped to the
    ``1/grid`` lattice (default 0.01 — pass the lattice your scores
    already live on) and the numerator is accumulated as the exact
    integer ``Σ (grid·s − grid·y)²``; the single final division by
    ``grid²·n`` restores the mean. Scores off-lattice are ROUNDED to it
    (documented quantization, not an error).

    Labels outside {0, 1} raise; NULL score/label rows are excluded.
    Output: one row ``(threshold, n, tp, fp, tn, fn, accuracy,
    precision, recall, f1, balanced_accuracy, mcc, brier)``; ratio
    columns are rounded to 6, with 0-denominator conventions
    precision = 0 when tp+fp = 0, recall = 0 when tp+fn = 0, mcc = 0
    when any marginal is empty (the sklearn ``zero_division=0``
    convention).
    """
    if grid < 1:
        raise DataFrameValidationError("classification_report: grid must be >= 1")
    base = _checked(df, score_col, label_col)
    g = F.lit(int(grid))
    si = F.round(F.col("_s") * g).cast("long")
    yi = F.round(F.col("_y")).cast("long")
    pred = (F.col("_s") >= F.lit(float(threshold))).cast("long")
    row = base.select(
        si.alias("_si"), yi.alias("_yi"), pred.alias("_p"), F.col("_y")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col("_p") * F.col("_yi")).cast("long").alias("_tp"),
        F.sum(F.col("_p") * (1 - F.col("_yi"))).cast("long").alias("_fp"),
        F.sum((1 - F.col("_p")) * (1 - F.col("_yi"))).cast("long").alias("_tn"),
        F.sum((1 - F.col("_p")) * F.col("_yi")).cast("long").alias("_fn"),
        F.sum(
            (F.col("_si") - g * F.col("_yi")) * (F.col("_si") - g * F.col("_yi"))
        ).cast("long").alias("_sq"),
        F.max(
            F.when((F.col("_y") != 0.0) & (F.col("_y") != 1.0), 1).otherwise(0)
        ).alias("_bad"),
    ).collect()[0]
    if row["_bad"] is None:
        raise DataFrameValidationError("classification_report: no scorable rows")
    if row["_bad"]:
        raise DataFrameValidationError(
            f"classification_report: label {label_col!r} must be 0/1"
        )
    n = int(row["_n"])
    tp, fp, tn, fn = (int(row[k]) for k in ("_tp", "_fp", "_tn", "_fn"))
    sq = int(row["_sq"])
    pos, neg = tp + fn, fp + tn
    ppos, pneg = tp + fp, fn + tn
    prec = tp / ppos if ppos else 0.0
    rec = tp / pos if pos else 0.0
    f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    tnr = tn / neg if neg else 0.0
    bal = (rec + tnr) / 2.0
    # stepwise float product (not exact-int) so the expression is
    # bit-identical to the oracle's CAST-to-DOUBLE chain at any n
    mcc_den = float(pos) * float(neg) * float(ppos) * float(pneg)
    mcc = float(tp * tn - fp * fn) / (mcc_den**0.5) if mcc_den else 0.0
    brier = sq / (grid * grid * n)
    return df.sparkSession.createDataFrame(
        [
            (
                float(threshold), n, tp, fp, tn, fn,
                round((tp + tn) / n, 6), round(prec, 6), round(rec, 6),
                round(f1, 6), round(bal, 6), round(mcc, 6), round(brier, 6),
            )
        ],
        "threshold DOUBLE, n LONG, tp LONG, fp LONG, tn LONG, fn LONG, "
        "accuracy DOUBLE, precision DOUBLE, recall DOUBLE, f1 DOUBLE, "
        "balanced_accuracy DOUBLE, mcc DOUBLE, brier DOUBLE",
    )


def cohen_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's κ (1960) — chance-corrected agreement between two
    labelers (human double-annotation QA, model-vs-model router
    agreement, LLM-judge consistency):

        κ = (p_o − p_e) / (1 − p_e)

    with observed agreement p_o and chance agreement p_e = Σ_c
    share_a(c)·share_b(c) from the marginals. Landis & Koch bands are
    the conventional read (κ > 0.6 "substantial"). Output: one row
    ``(n, n_categories, p_observed, p_expected, kappa)`` rounded 6
    (κ NULL when p_e = 1 — a single shared category has no chance
    correction). Rows with NULL on either side are excluded.

    Plan shape: ONE groupBy(a, b) contingency aggregation; marginals
    and the fold are aggregations OF that bounded |A|×|B| table (the
    ``chi2_independence`` conventions).
    """
    for c in (rater_a_col, rater_b_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"cohen_kappa: missing column {c!r}")
    a = F.col(rater_a_col).cast("string")
    b = F.col(rater_b_col).cast("string")
    # persist the bounded |A|×|B| contingency: the driver actions below
    # read it instead of re-running the corpus groupBy (ADVICE r5 #3)
    cont = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_o"))
        .persist()
    )
    ma = cont.groupBy("_a").agg(F.sum("_o").alias("_na"))
    mb = cont.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    # one fused fold for total and observed agreement
    tot = cont.agg(
        F.sum("_o").alias("_nt"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_o"))).alias("_agree"),
    ).first()
    n = float(tot["_nt"] or 0)
    if n == 0:
        cont.unpersist()
        raise DataFrameValidationError("cohen_kappa: no labeled rows")
    p_o = float(tot["_agree"] or 0) / n
    # full-outer marginal join: matched rows carry the p_e numerator
    # (null products skip the sum, exactly the inner-join sum), every row
    # counts one distinct category across either side
    pe_row = (
        ma.join(mb, ma["_a"] == mb["_b"], "full_outer")
        .agg(
            F.sum(
                F.col("_na").cast("double") * F.col("_nb").cast("double")
            ).alias("_pe_num"),
            F.count(F.lit(1)).alias("_k"),
        )
        .first()
    )
    cont.unpersist()
    p_e = float(pe_row["_pe_num"] or 0.0) / (n * n)
    k_cats = int(pe_row["_k"])
    kappa = (p_o - p_e) / (1.0 - p_e) if p_e < 1.0 else None
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            int(n), k_cats, round(p_o, 6), round(p_e, 6),
            round(kappa, 6) if kappa is not None else None,
        )],
        "n long, n_categories long, p_observed double, p_expected double, "
        "kappa double",
    )


def mcnemar_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """McNemar's test (1947) for PAIRED binary outcomes — "did the new
    model/ranker/filter change the same items' pass rate", the correct
    test when both measurements come from the SAME units (the unpaired
    two-proportion z ignores the pairing and wastes power):

        χ² = (|b − c| − 1)² / (b + c)      (continuity-corrected)

    where b = #(1→0) and c = #(0→1) discordant pairs — concordant pairs
    carry no information. Output: one row ``(n, n_10, n_01, chi2)``
    rounded 6 (χ² NULL when there are no discordant pairs); values
    outside {0, 1} raise. ONE aggregation.
    """
    for c in (before_col, after_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"mcnemar_test: missing column {c!r}")
    x = F.col(before_col).cast("double")
    y = F.col(after_col).cast("double")
    ok = x.isNotNull() & y.isNotNull()
    bad = (~x.isin(0.0, 1.0)) | (~y.isin(0.0, 1.0))
    one = df.filter(ok).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(((x == 1.0) & (y == 0.0)).cast("long")).alias("_b"),
        F.sum(((x == 0.0) & (y == 1.0)).cast("long")).alias("_c"),
        F.max(bad.cast("int")).alias("_bad"),
    )
    guard = F.when(
        F.col("_bad") == 1,
        F.raise_error(
            F.lit("mcnemar_test: before/after must be 0/1")
        ).cast("long"),
    )
    b = F.col("_b").cast("double")
    c = F.col("_c").cast("double")
    chi2 = (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c)
    return one.select(
        F.coalesce(guard, F.col("_n")).cast("long").alias("n"),
        F.col("_b").cast("long").alias("n_10"),
        F.col("_c").cast("long").alias("n_01"),
        F.round(F.when(b + c > 0, chi2), 6).alias("chi2"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration summary in one pass: the Brier score with
    its Murphy (1973) decomposition over fixed-width score bins,

        brier = reliability − resolution + uncertainty
        reliability = Σ n_b(p̄_b − ȳ_b)²/n     (calibration gap — small is good)
        resolution  = Σ n_b(ȳ_b − ȳ)²/n       (discrimination — big is good)
        uncertainty = ȳ(1 − ȳ)

    plus the expected / maximum calibration error (Naeini et al. 2015):
    ``ece = Σ (n_b/n)·|p̄_b − ȳ_b|``, ``mce = max_b |p̄_b − ȳ_b|`` — the
    standard "is this model's 0.9 actually a 0.9" battery next to
    :func:`reliability_curve` (which returns the per-bin table; this
    returns the scalar summary).

    The decomposition identity holds exactly only for the WITHIN-BIN
    constant predictor; on raw scores the three terms differ from the
    raw Brier by the within-bin score variance, so ``brier`` here is
    the RAW Σ(p−y)²/n and the identity is reported as its own
    ``within_bin_variance`` remainder (no silently-absorbed residual).

    Output: one row ``(n, n_bins, brier, reliability, resolution,
    uncertainty, within_bin_variance, ece, mce)`` rounded 6. Scores
    must lie in [0, 1] (validated in-aggregation); labels must be 0/1.
    Plan shape: ONE groupBy(bin) moment aggregation + a bounded fold.
    """
    if n_bins < 2:
        raise DataFrameValidationError("calibration_report: n_bins must be >= 2")
    for c in (score_col, label_col):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"calibration_report: missing column {c!r}"
            )
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(p.isNotNull() & y.isNotNull())
    bad = (p < 0) | (p > 1) | (~y.isin(0.0, 1.0))
    bin_id = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    per = base.groupBy(bin_id.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(p).alias("_sp"),
        F.sum(y).alias("_sy"),
        F.sum((p - y) * (p - y)).alias("_sq"),
        F.sum(p * p).alias("_spp"),
        F.max(bad.cast("int")).alias("_bad"),
    )
    tot = per.agg(
        F.sum("_n").alias("_nt"),
        F.sum("_sy").alias("_syt"),
        F.max("_bad").alias("_badmax"),
    )
    j = per.crossJoin(F.broadcast(tot))
    n = F.col("_n").cast("double")
    nt = F.col("_nt").cast("double")
    pb = F.col("_sp") / n
    yb = F.col("_sy") / n
    ybar = F.col("_syt") / nt
    fold = j.agg(
        F.max("_nt").alias("_n_all"),
        F.max("_badmax").alias("_bad2"),
        F.sum("_sq").alias("_brier_num"),
        F.sum(n * (pb - yb) * (pb - yb)).alias("_rel"),
        F.sum(n * (yb - ybar) * (yb - ybar)).alias("_res"),
        F.max(ybar).alias("_ybar"),
        F.sum(n * F.abs(pb - yb)).alias("_ece_num"),
        F.max(F.abs(pb - yb)).alias("_mce"),
        F.sum(F.col("_spp") - F.col("_sp") * F.col("_sp") / n).alias("_wv"),
    )
    guard = F.when(
        F.col("_bad2") == 1,
        F.raise_error(
            F.lit(
                "calibration_report: scores must be in [0, 1] and labels 0/1"
            )
        ).cast("long"),
    )
    na = F.col("_n_all").cast("double")
    return fold.select(
        F.coalesce(guard, F.col("_n_all")).cast("long").alias("n"),
        F.lit(int(n_bins)).cast("long").alias("n_bins"),
        F.round(F.col("_brier_num") / na, 6).alias("brier"),
        F.round(F.col("_rel") / na, 6).alias("reliability"),
        F.round(F.col("_res") / na, 6).alias("resolution"),
        F.round(F.col("_ybar") * (1.0 - F.col("_ybar")), 6).alias("uncertainty"),
        F.round(F.col("_wv") / na, 6).alias("within_bin_variance"),
        F.round(F.col("_ece_num") / na, 6).alias("ece"),
        F.round(F.col("_mce"), 6).alias("mce"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Fleiss' κ (1971) — chance-corrected agreement for ANY number of
    raters per item (the multi-annotator generalization of
    :func:`cohen_kappa`; raters need not be the same people across
    items — the crowdsourcing/LLM-ensemble setting). From per-item
    category counts n_ic with r_i = Σ_c n_ic raters on item i:

        P_i  = Σ_c n_ic(n_ic − 1) / (r_i (r_i − 1))
        P̄    = mean_i P_i,     P̄_e = Σ_c p_c²  (global label shares)
        κ    = (P̄ − P̄_e) / (1 − P̄_e)

    Items with fewer than 2 ratings carry no agreement information and
    are EXCLUDED (counted in the output). Output: one row ``(n_items,
    n_ratings, n_categories, n_items_skipped, p_bar, p_e, kappa)``
    rounded 6 (κ NULL when P̄_e = 1). This is the equal-raters formula
    applied per-item (Fleiss' original assumes constant r; the per-item
    form is the standard generalization).

    Plan shape: ONE groupBy(item, label) count → per-item fold
    (groupBy(item)) → 1-row fold; label shares one aggregation of the
    first table. Nothing after the first aggregation is corpus-sized.
    """
    for c in (item_col, label_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"fleiss_kappa: missing column {c!r}")
    item = F.col(item_col)
    lab = F.col(label_col).cast("string")
    # persist the bounded contingency: every driver action below reads it
    # instead of re-running the corpus-sized groupBy (ADVICE r5 #3)
    counts = (
        df.filter(item.isNotNull() & lab.isNotNull())
        .groupBy(item.alias("_i"), lab.alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .persist()
    )
    per_item = counts.groupBy("_i").agg(
        F.sum("_n").alias("_r"),
        F.sum(F.col("_n").cast("double") * (F.col("_n") - 1)).alias("_agree"),
    )
    usable = per_item.filter(F.col("_r") >= 2)
    # one fused fold: usable-item stats AND the skipped count (null-
    # skipping aggregates see exactly the same rows the two filtered
    # aggregations did)
    top = per_item.agg(
        F.count(F.when(F.col("_r") >= 2, F.lit(1))).alias("_ni"),
        F.sum(F.when(F.col("_r") >= 2, F.col("_r"))).alias("_nr"),
        F.avg(
            F.when(
                F.col("_r") >= 2,
                F.col("_agree")
                / (F.col("_r").cast("double") * (F.col("_r") - 1)),
            )
        ).alias("_pbar"),
        F.count(F.when(F.col("_r") < 2, F.lit(1))).alias("_skipped"),
    ).first()
    skipped = int(top["_skipped"])
    n_items = int(top["_ni"] or 0)
    if n_items == 0:
        counts.unpersist()
        raise DataFrameValidationError(
            "fleiss_kappa: no items with >= 2 ratings"
        )
    # label shares over the USABLE items' ratings
    shares = (
        counts.join(usable.select("_i"), "_i", "left_semi")
        .groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
    )
    pe_row = shares.agg(
        F.sum(
            F.col("_nc").cast("double") * F.col("_nc")
        ).alias("_num"),
        F.count(F.lit(1)).alias("_k"),
    ).first()
    counts.unpersist()
    nr = float(top["_nr"])
    p_e = float(pe_row["_num"]) / (nr * nr)
    p_bar = float(top["_pbar"])
    kappa = (p_bar - p_e) / (1.0 - p_e) if p_e < 1.0 else None
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            n_items, int(nr), int(pe_row["_k"]), int(skipped),
            round(p_bar, 6), round(p_e, 6),
            round(kappa, 6) if kappa is not None else None,
        )],
        "n_items long, n_ratings long, n_categories long, "
        "n_items_skipped long, p_bar double, p_e double, kappa double",
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols,
) -> DataFrame:
    """Cronbach's α (1951) — internal consistency of k parallel
    measurements (survey batteries, repeated quality probes, ensemble
    scores meant to measure the same construct):

        α = k/(k−1) · (1 − Σ_i var_i / var_total)

    with var_total the variance of the row sum. α > 0.7 is the
    conventional "acceptable" bar; α near 0 means the columns don't
    co-measure anything. Output: one row ``(n, k, sum_item_var,
    total_var, alpha)`` rounded 6 (NULL α when the total variance is
    0). Rows with ANY NULL item are excluded (listwise deletion, the
    psychometrics convention). ONE moment aggregation computes every
    variance (sample, ddof=1).
    """
    cols = list(item_cols)
    if len(cols) < 2:
        raise DataFrameValidationError("cronbach_alpha: need >= 2 item columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"cronbach_alpha: missing columns {missing}")
    xs = [F.col(c).cast("double") for c in cols]
    cond = xs[0].isNotNull()
    for x in xs[1:]:
        cond = cond & x.isNotNull()
    total = xs[0]
    for x in xs[1:]:
        total = total + x
    aggs = [F.count(F.lit(1)).alias("_n"),
            F.sum(total).alias("_st"), F.sum(total * total).alias("_qt")]
    for i, x in enumerate(xs):
        aggs += [F.sum(x).alias(f"_s{i}"), F.sum(x * x).alias(f"_q{i}")]
    one = df.filter(cond).agg(*aggs)
    n = F.col("_n").cast("double")
    var = lambda s, q: (F.col(q) - F.col(s) * F.col(s) / n) / (n - 1.0)  # noqa: E731
    item_var = var("_s0", "_q0")
    for i in range(1, len(cols)):
        item_var = item_var + var(f"_s{i}", f"_q{i}")
    tot_var = var("_st", "_qt")
    k = float(len(cols))
    alpha = (k / (k - 1.0)) * (1.0 - item_var / tot_var)
    return one.select(
        F.col("_n").cast("long").alias("n"),
        F.lit(int(k)).cast("long").alias("k"),
        F.round(item_var, 6).alias("sum_item_var"),
        F.round(tot_var, 6).alias("total_var"),
        F.round(F.when((F.col("_n") > 1) & (tot_var > 0), alpha), 6).alias(
            "alpha"
        ),
    )
