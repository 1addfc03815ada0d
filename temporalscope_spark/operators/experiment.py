"""Experiment analysis: per-variant treatment-effect summaries and CUPED
variance reduction.

The engine's event spine (entity, timestamp, value) is exactly an
experimentation log; the two passes every A/B platform runs over it are
the per-variant effect summary (mean difference vs control with a Welch
z statistic — the two-proportion z-test is the binary special case) and
CUPED (Deng, Xu, Kohavi & Walker, WSDM 2013: regression-adjust the
metric with a pre-experiment covariate, ``Y' = Y − θ(X − X̄)``, cutting
variance by the squared correlation).

Plan shapes (100 TB-safe): ``ab_test`` is ONE map-side-combinable
``groupBy(variant)`` moment aggregation to a C-row table; the control
row is folded back via a window over that bounded table (no join against
the fat side). ``cuped_adjust`` is ONE 1-row moment aggregation (five
doubles to the driver — the woe-totals convention) and an
expression-only projection; the corpus is touched exactly twice and
never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def ab_test(
    df: DataFrame,
    variant_col: str,
    metric_col: str,
    control: str,
) -> DataFrame:
    """Per-variant effect summary vs a named control.

    For each variant: ``n``, sample ``mean`` and variance of the metric;
    against the control row: absolute effect ``diff = mean − mean_c``,
    relative ``lift = diff / mean_c`` (NULL when the control mean is 0)
    and the Welch z statistic

        z = diff / sqrt(var/n + var_c/n_c)

    (for a 0/1 metric this is the unpooled two-proportion z-test). The
    control's own diff/lift/z are NULL. NULL metrics are excluded;
    a missing control variant raises.

    Output: ``(variant, n, mean, var, diff, lift, z)`` floats rounded to
    6, ordered by variant.
    """
    for c in (variant_col, metric_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"ab_test: missing column {c!r}")
    y = F.col(metric_col).cast("double")
    agg = (
        df.filter(y.isNotNull())
        .groupBy(F.col(variant_col).cast("string").alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("_s"),
            F.sum(y * y).alias("_ss"),
        )
    )
    n = F.col("n").cast("double")
    mean = F.col("_s") / n
    var = (F.col("_ss") - F.col("_s") * F.col("_s") / n) / (n - F.lit(1.0))
    stats = agg.select(
        "variant",
        "n",
        mean.alias("_m"),
        F.when(F.col("n") > 1, var).alias("_v"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # C-row variant table: bounded by construction
    is_ctl = F.col("variant") == F.lit(control)
    mc = F.max(F.when(is_ctl, F.col("_m"))).over(wall)
    vc = F.max(F.when(is_ctl, F.col("_v"))).over(wall)
    nc = F.max(F.when(is_ctl, F.col("n"))).over(wall)
    seen = F.max(is_ctl.cast("int")).over(wall)
    diff = F.col("_m") - mc
    se = F.sqrt(F.col("_v") / F.col("n").cast("double") + vc / nc.cast("double"))
    guard = F.when(
        seen == 0,
        F.raise_error(
            F.lit(f"ab_test: control variant {control!r} not present")
        ).cast("double"),
    )
    out = stats.select(
        "variant",
        "n",
        F.coalesce(guard, F.round(F.col("_m"), 6)).alias("mean"),
        F.round(F.col("_v"), 6).alias("var"),
        F.round(F.when(~is_ctl, diff), 6).alias("diff"),
        F.round(F.when(~is_ctl & (mc != 0), diff / mc), 6).alias("lift"),
        F.round(F.when(~is_ctl & (se > 0), diff / se), 6).alias("z"),
    )
    return out.orderBy("variant")


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """CUPED adjustment: ``{metric}_cuped = y − θ(x − x̄)`` with
    ``θ = cov(x, y) / var(x)`` fitted on this frame (one 1-row moment
    aggregation; five bounded doubles to the driver as plan literals).
    Rows with NULL metric or covariate pass through with a NULL adjusted
    value; zero covariate variance ⇒ θ = 0 (adjustment is a no-op, the
    standard degenerate-covariate convention).

    Output: ``keep_cols`` + metric + covariate + ``{metric}_cuped``
    (rounded to 6).
    """
    for c in (metric_col, covariate_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"cuped_adjust: missing column {c!r}")
    keep = keep_cols or []
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    both = y.isNotNull() & x.isNotNull()
    m = df.agg(
        F.sum(F.when(both, F.lit(1.0))).alias("n"),
        F.sum(F.when(both, x)).alias("sx"),
        F.sum(F.when(both, y)).alias("sy"),
        F.sum(F.when(both, x * x)).alias("sxx"),
        F.sum(F.when(both, x * y)).alias("sxy"),
    ).collect()[0]
    n = float(m["n"] or 0.0)
    if n < 2:
        theta, xbar = 0.0, 0.0
    else:
        varx = m["sxx"] - m["sx"] * m["sx"] / n
        covxy = m["sxy"] - m["sx"] * m["sy"] / n
        theta = covxy / varx if varx > 0 else 0.0
        xbar = m["sx"] / n
    adj = F.when(both, y - F.lit(theta) * (x - F.lit(xbar)))
    return df.select(
        *keep,
        F.col(metric_col),
        F.col(covariate_col),
        F.round(adj, 6).alias(f"{metric_col}_cuped"),
    )


def did_estimate(
    df: DataFrame,
    metric_col: str,
    treat_col: str,
    post_col: str,
) -> DataFrame:
    """Two-group × two-period difference-in-differences (the Card &
    Krueger 1994 design):

        DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctl,post − ȳ_ctl,pre)

    with the standard independent-cell standard error
    ``sqrt(Σ_cells var/n)`` and z = DiD/SE. ``treat_col`` / ``post_col``
    must be 0/1 (validated inside the aggregation); any empty cell
    raises — a DiD without all four cells is undefined.

    Plan shape: ONE map-side-combinable aggregation computes all four
    cells' (n, Σy, Σy²) — 12 numbers, no groupBy, no shuffle beyond the
    final 1-row reduce. Output: one row ``(n, m_ctl_pre, m_ctl_post,
    m_treat_pre, m_treat_post, did, se, z)`` rounded to 6.
    """
    for c in (metric_col, treat_col, post_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"did_estimate: missing column {c!r}")
    y = F.col(metric_col).cast("double")
    tr = F.col(treat_col).cast("double")
    po = F.col(post_col).cast("double")
    ok = y.isNotNull() & tr.isNotNull() & po.isNotNull()

    aggs = []
    for ti in (0, 1):
        for pi in (0, 1):
            cell = ok & (tr == float(ti)) & (po == float(pi))
            aggs += [
                F.sum(F.when(cell, F.lit(1.0))).alias(f"n{ti}{pi}"),
                F.sum(F.when(cell, y)).alias(f"s{ti}{pi}"),
                F.sum(F.when(cell, y * y)).alias(f"ss{ti}{pi}"),
            ]
    aggs.append(
        F.max(
            F.when(
                ((tr != 0.0) & (tr != 1.0)) | ((po != 0.0) & (po != 1.0)), 1
            ).otherwise(0)
        ).alias("_bad")
    )
    row = df.agg(*aggs)

    def _m(t, p):
        return F.col(f"s{t}{p}") / F.col(f"n{t}{p}")

    def _var(t, p):
        # ANSI mode: guard the n = 1 division (variance undefined there)
        n = F.col(f"n{t}{p}")
        return F.when(
            n > 1,
            (F.col(f"ss{t}{p}") - F.col(f"s{t}{p}") * F.col(f"s{t}{p}") / n)
            / (n - F.lit(1.0)),
        )

    did = (_m(1, 1) - _m(1, 0)) - (_m(0, 1) - _m(0, 0))
    se = F.sqrt(
        sum(
            (_var(t, p) / F.col(f"n{t}{p}") for t in (0, 1) for p in (0, 1)),
            F.lit(0.0),
        )
    )
    ntot = sum(
        (F.coalesce(F.col(f"n{t}{p}"), F.lit(0.0)) for t in (0, 1) for p in (0, 1)),
        F.lit(0.0),
    )
    missing = (
        F.col("n00").isNull()
        | F.col("n01").isNull()
        | F.col("n10").isNull()
        | F.col("n11").isNull()
    )
    guarded_did = (
        F.when(
            F.col("_bad") == 1,
            F.raise_error(
                F.lit("did_estimate: treat/post columns must be 0/1")
            ).cast("double"),
        )
        .when(
            missing,
            F.raise_error(
                F.lit("did_estimate: all four treat x post cells must be non-empty")
            ).cast("double"),
        )
        .otherwise(F.round(did, 6))
    )
    return row.select(
        ntot.cast("long").alias("n"),
        F.round(_m(0, 0), 6).alias("m_ctl_pre"),
        F.round(_m(0, 1), 6).alias("m_ctl_post"),
        F.round(_m(1, 0), 6).alias("m_treat_pre"),
        F.round(_m(1, 1), 6).alias("m_treat_post"),
        guarded_did.alias("did"),
        F.round(se, 6).alias("se"),
        F.round(F.when(se > 0, did / se), 6).alias("z"),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    test_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg false-discovery-rate correction over a family
    of hypothesis tests (Benjamini & Hochberg 1995) — the multiple-
    comparison gate an experimentation platform runs over its per-metric
    / per-variant p-value table.

    For the p-values sorted ascending with ranks k = 1..m, the adjusted
    p-value is the step-up envelope

        p_adj(k) = min( 1, min_{j >= k}  p_(j) * m / j )

    and ``reject = p_adj <= alpha`` recovers exactly the classic BH
    procedure (reject all tests up to the largest k with
    ``p_(k) <= k*alpha/m``).

    The input is one row per test — an EXPERIMENT-COUNT-sized table
    (hundreds of metrics x variants), bounded by construction like the
    C-row variant table in :func:`ab_test`; the rank and reverse
    running-min windows run over that bounded table only, never over
    event data. NULL or out-of-range p-values raise. Output:
    ``(test, p, rank, p_adj, reject)`` ordered by (p, test), p_adj
    rounded to 6.
    """
    for c in (p_col, test_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"fdr_bh: missing column {c!r}")
    if not (0.0 < alpha < 1.0):
        raise DataFrameValidationError("fdr_bh: alpha must be in (0, 1)")
    p = F.col(p_col).cast("double")
    bad = p.isNull() | (p < 0.0) | (p > 1.0)
    base = df.select(
        F.col(test_col).cast("string").alias("test"),
        F.when(
            bad,
            F.raise_error(
                F.lit("fdr_bh: p-values must be non-NULL in [0, 1]")
            ).cast("double"),
        )
        .otherwise(p)
        .alias("p"),
    )
    # bounded m-row family: the global windows here are the ab_test
    # wall-window convention, never applied to event-sized data
    up = Window.orderBy(F.col("p").asc(), F.col("test").asc())
    ranked = base.withColumn("rank", F.row_number().over(up)).withColumn(
        "_m", F.count(F.lit(1)).over(up.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))
    )
    down = Window.orderBy(F.col("p").desc(), F.col("test").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    padj = F.least(
        F.lit(1.0),
        F.min(
            F.col("p") * F.col("_m").cast("double") / F.col("rank").cast("double")
        ).over(down),
    )
    return (
        ranked.withColumn("p_adj", F.round(padj, 6))
        .withColumn("reject", F.col("p_adj") <= F.lit(float(alpha)))
        .select("test", "p", "rank", "p_adj", "reject")
        .orderBy("rank")
    )
