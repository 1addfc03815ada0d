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

from temporalscope_spark.core.spread import spread
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


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical columns,
    with the two standard effect sizes: Cramér's V (Cramér 1946) and the
    mutual information in nats.

        chi2 = SUM_ab (o_ab - e_ab)^2 / e_ab,   e_ab = n_a * n_b / n
        dof  = (|A| - 1) * (|B| - 1)
        V    = sqrt( chi2 / (n * min(|A| - 1, |B| - 1)) )
        MI   = SUM_ab p_ab * ln( p_ab / (p_a * p_b) )

    NULL categories participate as the '__null__' level (a real level —
    dropping them would bias the marginals). Output: one row
    ``(n, n_a, n_b, dof, chi2, cramers_v, mi)``, floats rounded to 6;
    V/dof are NULL for a degenerate (single-level) table.

    Plan shape: ONE map-side-combinable ``groupBy(a, b)`` count to the
    bounded |A|x|B| contingency table; marginals are aggregations OF that
    table (never a second corpus pass) joined back broadcast; the final
    reduce is one bounded fold. The corpus is scanned exactly once.
    """
    for c in (col_a, col_b):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"chi2_independence: missing column {c!r}"
            )
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("__null__"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("__null__"))
    cont = df.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.count(F.lit(1)).alias("_o")
    )
    ma = cont.groupBy("_a").agg(F.sum("_o").alias("_na"))
    mb = cont.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    joined = cont.join(F.broadcast(ma), "_a").join(F.broadcast(mb), "_b")
    o = F.col("_o").cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    # chi2 / MI need the grand total inside each cell term; fold the 1-row
    # total back in as a column via a second bounded aggregation
    tot = joined.agg(F.sum("_o").cast("double").alias("_nt"))
    cells = joined.crossJoin(F.broadcast(tot))
    e = na * nb / F.col("_nt")
    p_ab = o / F.col("_nt")
    p_a = na / F.col("_nt")
    p_b = nb / F.col("_nt")
    final = cells.agg(
        F.max("_nt").alias("_n"),
        F.count_distinct("_a").alias("n_a"),
        F.count_distinct("_b").alias("n_b"),
        F.sum((o - e) * (o - e) / e).alias("_chi2"),
        F.sum(p_ab * F.log(p_ab / (p_a * p_b))).alias("_mi"),
    )
    ka = F.col("n_a").cast("double")
    kb = F.col("n_b").cast("double")
    dof = (ka - 1) * (kb - 1)
    vmin = F.least(ka - 1, kb - 1)
    return final.select(
        F.col("_n").cast("long").alias("n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.when(dof > 0, dof).cast("long").alias("dof"),
        F.round("_chi2", 6).alias("chi2"),
        F.round(
            F.when(vmin > 0, F.sqrt(F.col("_chi2") / (F.col("_n") * vmin))),
            6,
        ).alias("cramers_v"),
        F.round("_mi", 6).alias("mi"),
    )


# Poisson(1) inverse-CDF thresholds: cumulative P(X <= k), k = 0..8; a
# uniform u maps to the first k whose cumulative exceeds it (capped at 9 —
# P(X > 9) < 1.1e-7, irrelevant to a resampling weight). Literals are
# shared with the SQL oracle so both engines draw identical weights.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988852347653,
)


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean —
    the bootstrap that actually runs at web scale (Chamandy et al.,
    Google 2012 "Estimating uncertainty for massive data streams"; Efron
    1979 for the bootstrap itself): instead of resampling n rows with
    replacement (impossible to coordinate across executors), every row
    independently receives a Poisson(1) replication weight per replicate;
    the vector of weighted means over B replicates estimates the sampling
    distribution.

    Weights are DETERMINISTIC: ``u = md5(id # seed # b)`` mapped through
    the Poisson(1) inverse CDF — the engine's hash-membership convention,
    so results are partition-invariant, resume-safe and exactly
    replayable by the SQL oracle (no RNG state anywhere).

    Plan shape: one narrow explode of the B-element replicate sequence
    (rows x B BEFORE map-side combine; the hash aggregate partially
    combines to B rows PER TASK, so the shuffle moves O(B x tasks), never
    O(n x B)) -> the bounded B-row replicate-mean table -> per-replicate
    means ROUNDED to 6 dp (cross-engine-identical inputs) -> exact
    interpolated quantiles for the percentile CI. Output: one row
    ``(n, n_boot, mean, boot_mean, se, lo, hi)`` rounded to 6.
    """
    for c in (value_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"poisson_bootstrap: missing column {c!r}"
            )
    if n_boot < 2:
        raise DataFrameValidationError("poisson_bootstrap: n_boot must be >= 2")
    if not (0.0 < alpha < 1.0):
        raise DataFrameValidationError("poisson_bootstrap: alpha must be in (0, 1)")
    y = F.col(value_col).cast("double")
    base = df.select(
        F.col(id_col).cast("string").alias("_id"), y.alias("_y")
    ).filter(F.col("_y").isNotNull())

    # the B-way explode + per-(row, replicate) md5 draw is the CPU wall;
    # floor its parallelism before the fan-out (core/spread.py) — the
    # replicate means round to 6 dp before the CI, so merge order is moot
    rep = spread(base).select(
        "_id", "_y", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("#", F.col("_id"), F.lit(str(seed)), F.col("_b"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    w = F.lit(9)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    rep = rep.withColumn("_w", w.cast("double"))
    # B-row replicate table (map-side combine bounds the shuffle at B/task)
    means = (
        rep.groupBy("_b")
        .agg(F.sum(F.col("_w") * F.col("_y")).alias("_sw"), F.sum("_w").alias("_n"))
        .select(
            F.round(
                F.when(F.col("_n") > 0, F.col("_sw") / F.col("_n")), 6
            ).alias("_m")
        )
        .filter(F.col("_m").isNotNull())
    )
    lo_q, hi_q = alpha / 2.0, 1.0 - alpha / 2.0
    boot = means.agg(
        F.count(F.lit(1)).alias("_nb"),
        F.avg("_m").alias("_bm"),
        F.stddev_samp("_m").alias("_se"),
        F.percentile("_m", F.lit(lo_q)).alias("_lo"),
        F.percentile("_m", F.lit(hi_q)).alias("_hi"),
    )
    point = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("_y").alias("_mean")
    )
    return point.crossJoin(F.broadcast(boot)).select(
        F.col("n").cast("long").alias("n"),
        F.col("_nb").cast("long").alias("n_boot"),
        F.round("_mean", 6).alias("mean"),
        F.round("_bm", 6).alias("boot_mean"),
        F.round("_se", 6).alias("se"),
        F.round("_lo", 6).alias("lo"),
        F.round("_hi", 6).alias("hi"),
    )


def mann_whitney_u(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    nonparametric companion to :func:`ab_test` for skewed metrics
    (revenue, latency, token counts) where the Welch z's normality
    assumption is untrustworthy.

    Semantics (scipy ``mannwhitneyu(x, y, use_continuity=True,
    alternative='two-sided', method='asymptotic')`` parity): rank the
    pooled sample with average ranks for ties; ``U_a = R_a −
    n_a(n_a+1)/2``; tie-corrected normal approximation

        σ = sqrt(n_a·n_b/12 · (N+1 − Σ(t³−t)/(N(N−1))))
        z = (U_a − n_a·n_b/2 ∓ 0.5) / σ    (continuity correction
                                            toward the null)

    Output: one row ``(n_a, n_b, u_a, u_b, z)`` (z rounded 6, signed —
    positive when group_a stochastically dominates; NULL when σ = 0,
    i.e. every pooled value is tied). Like ``ab_test``/``mann_kendall``
    the engine reports the z statistic, not a p-value — erf is not a
    portable SQL builtin, and the caller owns the α policy.

    Plan shape (100 TB-safe): the corpus collapses to ONE
    map-side-combinable ``groupBy(value)`` count table (V rows, V =
    distinct metric values — tiny for count metrics, at worst n for
    continuous ones); the joint ranking over that table is the
    quantile-bucketed two-phase prefix sum of ``plans/rownum.py`` (NO
    single-partition window at any input size); the test statistic is
    one final 1-row aggregation. Rows with NULL metric are excluded;
    a missing group raises.
    """
    for c in (metric_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"mann_whitney_u: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    both = df.filter(y.isNotNull() & g.isin([str(group_a), str(group_b)])).select(
        y.alias("_y"), (g == F.lit(str(group_a))).cast("long").alias("_ia")
    )
    counts = both.groupBy("_y").agg(
        F.sum("_ia").alias("_na"),
        F.sum(F.lit(1) - F.col("_ia")).alias("_nb"),
        F.count(F.lit(1)).alias("_n"),
    )

    from temporalscope_spark.plans.rownum import with_global_cumsum

    ranked = with_global_cumsum(counts, ["_y"], ["_n"], materialize_input=True)
    # average rank of every row tied at this value: ranks occupied are
    # (cum−n+1 .. cum) → midpoint (cum−n) + (n+1)/2
    avg_rank = (
        (F.col("_n_cum") - F.col("_n")).cast("double")
        + (F.col("_n").cast("double") + 1.0) / 2.0
    )
    tot = ranked.agg(
        F.sum("_na").alias("_nat"),
        F.sum("_nb").alias("_nbt"),
        F.sum(F.col("_na").cast("double") * avg_rank).alias("_ra"),
        F.sum(
            F.col("_n").cast("double") * F.col("_n") * F.col("_n")
            - F.col("_n").cast("double")
        ).alias("_ties"),
    )
    na = F.col("_nat").cast("double")
    nb = F.col("_nbt").cast("double")
    nn = na + nb
    ua = F.col("_ra") - na * (na + 1.0) / 2.0
    ub = na * nb - ua
    mu = na * nb / 2.0
    sigma = F.sqrt(
        na * nb / 12.0 * (nn + 1.0 - F.col("_ties") / (nn * (nn - 1.0)))
    )
    dev = ua - mu
    cc = F.when(dev > 0, F.lit(0.5)).when(dev < 0, F.lit(-0.5)).otherwise(F.lit(0.0))
    guard = F.when(
        (F.col("_nat") == 0) | (F.col("_nbt") == 0),
        F.raise_error(
            F.lit(
                f"mann_whitney_u: group {group_a!r} or {group_b!r} has no "
                "non-null rows"
            )
        ).cast("long"),
    )
    return tot.select(
        F.coalesce(guard, F.col("_nat")).alias("n_a"),
        F.col("_nbt").alias("n_b"),
        F.round(ua, 6).alias("u_a"),
        F.round(ub, 6).alias("u_b"),
        F.round(F.when(sigma > 0, (dev - cc) / sigma), 6).alias("z"),
    )


def permutation_test(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_perm: int = 200,
    seed: int = 42,
    id_col: str = "event_id",
) -> DataFrame:
    """Deterministic approximate randomization test for a difference in
    means (Noreen 1989; Yeh, EMNLP 2000 — the standard significance test
    in NLP evaluation): under H0 the group labels are exchangeable, so
    re-label every row at random and ask how often the re-labeled
    |mean_a − mean_b| reaches the observed one. The reported p uses the
    add-one estimator ``(1 + #extreme) / (n_perm + 1)`` (Davison &
    Hinkley 1997), which is never exactly 0.

    Re-labeling is the engine's hash-membership convention, NOT an RNG:
    row i joins pseudo-group a in replicate b iff ``md5(id#seed#b) <
    n_a/N`` — deterministic, partition-invariant, resume-safe, exactly
    replayable by the SQL oracle. (Binomial re-labeling rather than an
    exact n_a-sized permutation — the unpaired approximate-randomization
    variant; coordinating an exact global sample without replacement
    cannot be done row-independently at scale.)

    Plan shape: one 2-number count aggregation (the re-label probability
    becomes a plan literal), then ONE narrow explode of the B-replicate
    sequence with map-side combine to the bounded 2B-row (replicate,
    side) table — the shuffle moves O(B × tasks), never O(n × B). Both
    replicate and observed diffs round to 6 dp BEFORE comparison so the
    oracle replays bit-for-bit. Output: one row
    ``(n_a, n_b, diff, n_perm, n_extreme, p_value)``.
    """
    for c in (metric_col, group_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"permutation_test: missing column {c!r}")
    if n_perm < 1:
        raise DataFrameValidationError("permutation_test: n_perm must be >= 1")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull() & g.isin([str(group_a), str(group_b)])).select(
        F.col(id_col).cast("string").alias("_id"),
        y.alias("_y"),
        (g == F.lit(str(group_a))).alias("_ia"),
    )
    obs = base.groupBy("_ia").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("s")
    ).collect()  # 2 bounded rows: sizes + sums to the driver
    na = next((r["n"] for r in obs if r["_ia"]), 0)
    nb = next((r["n"] for r in obs if not r["_ia"]), 0)
    if na == 0 or nb == 0:
        raise DataFrameValidationError(
            f"permutation_test: group {group_a!r} or {group_b!r} has no "
            "non-null rows"
        )
    sa = next(r["s"] for r in obs if r["_ia"])
    sb = next(r["s"] for r in obs if not r["_ia"])
    d_obs = round(sa / na - sb / nb, 6)
    p_a = na / (na + nb)

    # same parallelism floor as poisson_bootstrap: the per-(row,
    # replicate) md5 fan-out dominates, diffs round to 6 dp
    rep = spread(base).select(
        "_id", "_y", F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("_b")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("#", F.col("_id"), F.lit(str(seed)), F.col("_b"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    side = (u < F.lit(float(p_a))).cast("int")
    # bounded 2B-row table after map-side combine
    diffs = (
        rep.select("_b", side.alias("_s"), "_y")
        .groupBy("_b", "_s")
        .agg(F.sum("_y").alias("_sum"), F.count(F.lit(1)).alias("_n"))
        .groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_s") == 1, F.col("_sum"))).alias("_sa"),
            F.sum(F.when(F.col("_s") == 1, F.col("_n"))).alias("_na"),
            F.sum(F.when(F.col("_s") == 0, F.col("_sum"))).alias("_sb"),
            F.sum(F.when(F.col("_s") == 0, F.col("_n"))).alias("_nb"),
        )
        .select(
            F.round(
                F.col("_sa") / F.col("_na") - F.col("_sb") / F.col("_nb"), 6
            ).alias("_d")
        )
        .filter(F.col("_d").isNotNull())  # degenerate one-sided replicates
    )
    out = diffs.agg(
        F.count(F.lit(1)).alias("_np"),
        F.sum((F.abs(F.col("_d")) >= F.lit(abs(d_obs))).cast("long")).alias("_ne"),
    )
    return out.select(
        F.lit(int(na)).cast("long").alias("n_a"),
        F.lit(int(nb)).cast("long").alias("n_b"),
        F.lit(float(d_obs)).alias("diff"),
        F.col("_np").cast("long").alias("n_perm"),
        F.col("_ne").cast("long").alias("n_extreme"),
        F.round(
            (F.col("_ne") + 1).cast("double") / (F.col("_np") + 1).cast("double"),
            6,
        ).alias("p_value"),
    )


def covariate_balance(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    cols: list,
) -> DataFrame:
    """Covariate balance diagnostics between two assignment groups —
    the pre-experiment / post-matching QA table (Austin 2009): for every
    covariate the standardized mean difference

        SMD = (mean_a − mean_b) / sqrt((var_a + var_b) / 2)

    and the variance ratio var_a/var_b. |SMD| < 0.1 is the conventional
    "balanced" bar. Output: one row per covariate ``(covariate, n_a,
    n_b, mean_a, mean_b, smd, var_ratio)`` (floats rounded 6, SMD NULL
    when the pooled variance is 0, ratio NULL when var_b = 0), ordered
    by covariate name.

    Plan shape: ONE fused map-side-combinable aggregation computes all
    6·k moments (count/sum/sumsq per group per covariate) in a single
    corpus pass; the per-covariate rows are unpivoted from that 1-row
    table with an inline explode — the corpus is never touched per
    covariate. Per-covariate NULL metrics are excluded per covariate
    (pairwise deletion), matching how balance tables treat missingness.
    """
    if not cols:
        raise DataFrameValidationError("covariate_balance: cols must be non-empty")
    missing = [c for c in [group_col, *cols] if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"covariate_balance: missing columns {missing}"
        )
    g = F.col(group_col).cast("string")
    ia = g == F.lit(str(group_a))
    ib = g == F.lit(str(group_b))
    aggs = []
    for c in cols:
        y = F.col(c).cast("double")
        for tag, flag in (("a", ia), ("b", ib)):
            v = F.when(flag, y)
            aggs += [
                F.count(v).alias(f"_n_{tag}_{c}"),
                F.sum(v).alias(f"_s_{tag}_{c}"),
                F.sum(v * v).alias(f"_q_{tag}_{c}"),
            ]
    one = df.filter(ia | ib).agg(*aggs)
    structs = []
    for c in cols:
        fields = [F.lit(c).alias("covariate")]
        for tag in ("a", "b"):
            n = F.col(f"_n_{tag}_{c}").cast("double")
            s = F.col(f"_s_{tag}_{c}")
            q = F.col(f"_q_{tag}_{c}")
            mean = F.when(n > 0, s / n)
            var = F.when(n > 1, (q - s * s / n) / (n - 1.0))
            fields += [
                n.cast("long").alias(f"n_{tag}"),
                mean.alias(f"mean_{tag}"),
                var.alias(f"var_{tag}"),
            ]
        structs.append(F.struct(*fields))
    rows = one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
    pooled = F.sqrt((F.col("var_a") + F.col("var_b")) / 2.0)
    return rows.select(
        "covariate",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(
            F.when(pooled > 0, (F.col("mean_a") - F.col("mean_b")) / pooled), 6
        ).alias("smd"),
        F.round(
            F.when(F.col("var_b") > 0, F.col("var_a") / F.col("var_b")), 6
        ).alias("var_ratio"),
    ).orderBy("covariate")


def srm_check(
    df: DataFrame,
    variant_col: str,
    expected: dict,
) -> DataFrame:
    """Sample-ratio-mismatch check — the first thing every experiment
    platform tests before reading any metric (Fabijan et al. 2019
    "Diagnosing sample ratio mismatch"): a chi-square goodness-of-fit of
    observed assignment counts against the design shares. A significant
    chi2 means the assignment itself is broken and every downstream
    metric is untrustworthy.

    ``expected`` maps variant → design share (must sum to 1 within
    1e-6). Variants observed in the data but absent from ``expected``
    raise (an unknown arm IS a mismatch, not a statistic); expected
    variants with zero observed rows contribute their full deficit.
    Output: one row ``(n, k, chi2, dof, max_abs_dev)`` where
    ``max_abs_dev`` is the largest |observed − expected| share across
    arms (rounded 6) — the effect-size companion to the statistic.

    Plan shape: ONE groupBy(variant) count to the bounded C-row table,
    full-outer join against the broadcast k-row design table, one fold.
    NULL variants are bucketed under the ``'__null__'`` key: they count
    toward n but raise unless ``expected`` contains a ``'__null__'``
    share for them — i.e. assignment must be total.
    """
    if variant_col not in df.columns:
        raise DataFrameValidationError(f"srm_check: missing column {variant_col!r}")
    if not expected:
        raise DataFrameValidationError("srm_check: expected shares must be non-empty")
    tot = sum(float(v) for v in expected.values())
    if abs(tot - 1.0) > 1e-6:
        raise DataFrameValidationError(
            f"srm_check: expected shares sum to {tot}, need 1.0"
        )
    if any(float(v) <= 0 for v in expected.values()):
        raise DataFrameValidationError("srm_check: expected shares must be > 0")
    counts = df.groupBy(
        F.coalesce(F.col(variant_col).cast("string"), F.lit("__null__")).alias(
            "variant"
        )
    ).agg(F.count(F.lit(1)).alias("o"))
    exp = df.sparkSession.createDataFrame(
        [(str(k), float(v)) for k, v in expected.items()],
        "variant string, share double",
    )
    joined = counts.join(exp, "variant", "full_outer").select(
        "variant",
        F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        "share",
    )
    unknown = F.when(
        F.col("share").isNull(),
        F.raise_error(
            F.concat(
                F.lit("srm_check: variant not in expected shares: "),
                F.col("variant"),
            )
        ).cast("double"),
    )
    joined = joined.select(
        "variant", "o", F.coalesce(unknown, F.col("share")).alias("share")
    )
    # total as a broadcast 1-row join, not a window — no partition warning
    total = joined.agg(F.sum("o").cast("double").alias("_nt"))
    n = F.col("_nt")
    e = F.col("share") * n
    cell = joined.crossJoin(F.broadcast(total)).select(
        F.col("o").cast("double").alias("o"),
        e.alias("e"),
        n.alias("n"),
        (F.abs(F.col("o").cast("double") / n - F.col("share"))).alias("_dev"),
    )
    out = cell.agg(
        F.max("n").alias("_n"),
        F.count(F.lit(1)).alias("_k"),
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "_chi2"
        ),
        F.max("_dev").alias("_md"),
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_k").cast("long").alias("k"),
        F.round("_chi2", 6).alias("chi2"),
        (F.col("_k") - 1).cast("long").alias("dof"),
        F.round("_md", 6).alias("max_abs_dev"),
    )


def ipw_estimate(
    df: DataFrame,
    y_col: str,
    treat_col: str,
    p_col: str,
    m1_col: str | None = None,
    m0_col: str | None = None,
    trim: float = 0.01,
) -> DataFrame:
    """Inverse-propensity-weighted average-treatment-effect estimate —
    the observational companion to :func:`ab_test` when assignment was
    NOT randomized: given a propensity score column ``p_col`` (e.g. from
    ``modeling.logistic.fit_logistic`` on pre-treatment covariates),

        μ̂₁ = Σ T·y/p / Σ T/p,   μ̂₀ = Σ (1−T)·y/(1−p) / Σ (1−T)/(1−p)

    (the Hájek / stabilized ratio form — self-normalizing, so weights
    need no scaling) and ``ATE = μ̂₁ − μ̂₀``. Rows with propensity outside
    ``[trim, 1−trim]`` are DROPPED (trimming, Crump et al. 2009), the
    standard guard against exploding weights; the dropped count is
    reported. Kish effective sample sizes ``(Σw)²/Σw²`` per arm are the
    overlap diagnostic — an ESS far below n means the estimate rides on
    a few extreme weights.

    With ``m1_col``/``m0_col`` (outcome-model predictions under treat /
    control) the output adds the doubly-robust AIPW estimate (Robins,
    Rotnitzky & Zhao 1994)

        ATE_dr = mean( m₁−m₀ + T·(y−m₁)/p − (1−T)·(y−m₀)/(1−p) )

    which stays consistent if EITHER the propensity or the outcome model
    is right. Output: one row ``(n, n_trimmed, n_treat, n_control,
    mu_treat, mu_control, ate, ess_treat, ess_control, ate_dr)``
    (floats rounded 6; ``ate_dr`` NULL without outcome columns).

    Plan shape: ONE map-side-combinable aggregation over the corpus —
    every estimator above is a ratio of weighted sums. Binary treatment
    enforced (non-0/1 raises via the same guard style as
    :func:`did_estimate`).
    """
    need = [y_col, treat_col, p_col] + [c for c in (m1_col, m0_col) if c]
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"ipw_estimate: missing columns {missing}")
    if not (0.0 <= trim < 0.5):
        raise DataFrameValidationError("ipw_estimate: trim must be in [0, 0.5)")
    if (m1_col is None) != (m0_col is None):
        raise DataFrameValidationError(
            "ipw_estimate: m1_col and m0_col must be given together"
        )
    y = F.col(y_col).cast("double")
    tr = F.col(treat_col).cast("double")
    p = F.col(p_col).cast("double")
    badt = F.when(
        ~tr.isin([0.0, 1.0]),
        F.raise_error(
            F.lit(f"ipw_estimate: {treat_col!r} must be 0/1")
        ).cast("double"),
    )
    tr = F.coalesce(badt, tr)
    base = df.filter(y.isNotNull() & p.isNotNull() & F.col(treat_col).isNotNull())
    # boundary propensities (exactly 0 or 1) always trim: with trim = 0
    # they would otherwise divide the weights/AIPW influence term by
    # zero (ANSI raise / inf) instead of being dropped-and-counted
    kept = (p >= F.lit(float(trim))) & (p <= F.lit(1.0 - trim)) & (p > 0) & (p < 1)
    wt = tr / p
    wc = (1.0 - tr) / (1.0 - p)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum((~kept).cast("long")).alias("_tr"),
        F.sum(F.when(kept, tr)).alias("_nt"),
        F.sum(F.when(kept, 1.0 - tr)).alias("_nc"),
        F.sum(F.when(kept, wt * y)).alias("_swy1"),
        F.sum(F.when(kept, wt)).alias("_sw1"),
        F.sum(F.when(kept, wt * wt)).alias("_sq1"),
        F.sum(F.when(kept, wc * y)).alias("_swy0"),
        F.sum(F.when(kept, wc)).alias("_sw0"),
        F.sum(F.when(kept, wc * wc)).alias("_sq0"),
    ]
    if m1_col is not None:
        m1 = F.col(m1_col).cast("double")
        m0 = F.col(m0_col).cast("double")
        infl = m1 - m0 + tr * (y - m1) / p - (1.0 - tr) * (y - m0) / (1.0 - p)
        aggs.append(F.avg(F.when(kept, infl)).alias("_dr"))
    else:
        aggs.append(F.lit(None).cast("double").alias("_dr"))
    one = base.agg(*aggs)
    mu1 = F.col("_swy1") / F.col("_sw1")
    mu0 = F.col("_swy0") / F.col("_sw0")
    return one.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_tr").cast("long").alias("n_trimmed"),
        F.col("_nt").cast("long").alias("n_treat"),
        F.col("_nc").cast("long").alias("n_control"),
        F.round(mu1, 6).alias("mu_treat"),
        F.round(mu0, 6).alias("mu_control"),
        F.round(mu1 - mu0, 6).alias("ate"),
        F.round(F.col("_sw1") * F.col("_sw1") / F.col("_sq1"), 6).alias(
            "ess_treat"
        ),
        F.round(F.col("_sw0") * F.col("_sw0") / F.col("_sq0"), 6).alias(
            "ess_control"
        ),
        F.round(F.col("_dr"), 6).alias("ate_dr"),
    )


def msprt_test(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    tau2: float = 1.0,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) — the
    always-valid p-value behind continuous-monitoring experiment
    platforms (Johari, Koomen, Pekelis & Walsh, KDD 2017 "Peeking at
    A/B tests"): unlike the fixed-horizon z test, the decision
    "significant at α" stays valid no matter how often (or when) the
    experimenter looks.

    For the two-stream mean difference with H₀: δ = 0 and a N(0, τ²)
    mixing prior over the alternative,

        V_n = σ̂²·(1/n_a + 1/n_b)                 (pooled variance)
        Λ_n = sqrt(V_n/(V_n+τ²)) · exp(δ̂² τ² / (2 V_n (V_n+τ²)))
        p_n = min(1, 1/Λ_n)

    (the paper's closed form; the always-valid p over a RUN is the
    running min of p_n — this operator reports the current snapshot,
    which upstream monitoring folds with ``least``). ``tau2`` is the
    prior variance of the effect; the paper's guidance is to match the
    typical effect size (it tunes power, not validity).

    Output: one row ``(n_a, n_b, diff, v_n, lambda_n, p_value)``
    (rounded 6; ``lambda_n`` capped at 1e12 before rounding to keep the
    replay finite — p has already hit its floor long before the cap).
    Plan shape: ONE map-side-combinable moment aggregation; everything
    downstream is a bounded fold. Missing groups raise; a degenerate
    V_n = 0 yields NULL lambda/p.
    """
    if tau2 <= 0:
        raise DataFrameValidationError("msprt_test: tau2 must be > 0")
    for c in (metric_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"msprt_test: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    ia = (g == F.lit(str(group_a))).cast("double")
    ib = (g == F.lit(str(group_b))).cast("double")
    base = df.filter(y.isNotNull() & g.isin([str(group_a), str(group_b)]))
    one = base.agg(
        F.sum(ia).alias("_na"),
        F.sum(ib).alias("_nb"),
        F.sum(ia * y).alias("_sa"),
        F.sum(ib * y).alias("_sb"),
        F.sum(ia * y * y).alias("_qa"),
        F.sum(ib * y * y).alias("_qb"),
    )
    na = F.col("_na")
    nb = F.col("_nb")
    guard = F.when(
        (na == 0) | (nb == 0),
        F.raise_error(
            F.lit(
                f"msprt_test: group {group_a!r} or {group_b!r} has no "
                "non-null rows"
            )
        ).cast("double"),
    )
    ma = F.col("_sa") / na
    mb = F.col("_sb") / nb
    diff = ma - mb
    # pooled variance: (Σq − n·m²) summed over arms / (N − 2)
    ss = (F.col("_qa") - na * ma * ma) + (F.col("_qb") - nb * mb * mb)
    sig2 = F.when(na + nb > 2, ss / (na + nb - 2.0))
    vn = sig2 * (1.0 / na + 1.0 / nb)
    t2 = F.lit(float(tau2))
    lam = F.sqrt(vn / (vn + t2)) * F.exp(
        F.least(
            diff * diff * t2 / (2.0 * vn * (vn + t2)), F.lit(700.0)
        )
    )
    lam = F.least(lam, F.lit(1e12))
    return one.select(
        F.coalesce(guard, na).cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(diff, 6).alias("diff"),
        F.round(vn, 6).alias("v_n"),
        F.round(F.when(vn > 0, lam), 6).alias("lambda_n"),
        F.round(F.when(vn > 0, F.least(F.lit(1.0), 1.0 / lam)), 6).alias(
            "p_value"
        ),
    )


def stratified_att(
    df: DataFrame,
    y_col: str,
    treat_col: str,
    p_col: str,
    n_strata: int = 5,
) -> DataFrame:
    """Propensity-subclassification treatment effect (Rosenbaum & Rubin
    1984 — the third leg next to :func:`ipw_estimate` and
    :func:`covariate_balance`): bucket units into propensity-score
    quantile strata, difference means within each stratum, and weight
    by where the TREATED units live:

        ATT = Σ_k (n_treat_k / n_treat) · (ȳ_treat,k − ȳ_ctl,k)

    (weighting by total stratum size instead gives the ATE — also
    reported). Strata missing either arm carry no comparison and are
    dropped from both estimates; their treated count is reported so the
    caller sees the overlap loss (the honest-reporting convention of
    ``ipw_estimate``'s trim count).

    Output: one row ``(n, n_strata, n_strata_used, att, ate,
    n_treat_dropped)`` (rounded 6). Plan shape: ONE exact-percentile fit
    of the stratum edges (rounded-6 plan literals — `percentile_approx`
    is the 100 TB swap, the corpus_stats convention), then ONE
    groupBy(stratum) moment aggregation and a bounded fold.
    """
    if n_strata < 2:
        raise DataFrameValidationError("stratified_att: n_strata must be >= 2")
    for c in (y_col, treat_col, p_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"stratified_att: missing column {c!r}")
    y = F.col(y_col).cast("double")
    tr = F.col(treat_col).cast("double")
    p = F.col(p_col).cast("double")
    base = df.filter(y.isNotNull() & p.isNotNull() & tr.isNotNull())
    probs = [k / n_strata for k in range(1, n_strata)]
    edges_row = base.agg(
        F.percentile(p, F.array(*[F.lit(q) for q in probs])).alias("_e")
    ).first()
    edges = [round(float(v), 6) for v in edges_row["_e"]]
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + (p > F.lit(e)).cast("int")
    badt = F.when(
        ~tr.isin([0.0, 1.0]),
        F.raise_error(
            F.lit(f"stratified_att: {treat_col!r} must be 0/1")
        ).cast("double"),
    )
    tr = F.coalesce(badt, tr)
    g = base.groupBy(bucket.alias("_k")).agg(
        F.sum(tr).alias("_nt"),
        F.sum(1.0 - tr).alias("_nc"),
        F.sum(tr * y).alias("_st"),
        F.sum((1.0 - tr) * y).alias("_sc"),
    )
    ok = (F.col("_nt") > 0) & (F.col("_nc") > 0)
    gap = F.col("_st") / F.col("_nt") - F.col("_sc") / F.col("_nc")
    out = g.agg(
        F.sum(F.col("_nt") + F.col("_nc")).alias("_n"),
        F.count(F.lit(1)).alias("_ks"),
        F.sum(ok.cast("long")).alias("_ku"),
        F.sum(F.when(ok, F.col("_nt"))).alias("_ntu"),
        F.sum(F.when(ok, (F.col("_nt") + F.col("_nc")))).alias("_nu"),
        F.sum(F.when(ok, F.col("_nt") * gap)).alias("_wt"),
        F.sum(F.when(ok, (F.col("_nt") + F.col("_nc")) * gap)).alias("_wa"),
        F.sum(F.when(~ok, F.col("_nt")).otherwise(F.lit(0.0))).alias("_drop"),
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.lit(int(n_strata)).cast("long").alias("n_strata"),
        F.col("_ku").cast("long").alias("n_strata_used"),
        F.round(F.col("_wt") / F.col("_ntu"), 6).alias("att"),
        F.round(F.col("_wa") / F.col("_nu"), 6).alias("ate"),
        F.col("_drop").cast("long").alias("n_treat_dropped"),
    )


def kruskal_wallis(
    df: DataFrame,
    metric_col: str,
    group_col: str,
) -> DataFrame:
    """Kruskal–Wallis H test (1952) — the k-group generalization of
    :func:`mann_whitney_u` ("do ANY of these variants differ"), sharing
    its machinery: joint average ranks from ONE groupBy(value) count
    table + the distributed prefix sum, per-group rank sums folded over
    the bounded (value × group) table,

        H = [12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)] / (1 − Σ(t³−t)/(N³−N))

    (tie-corrected, scipy ``kruskal`` parity). H ~ χ²(k−1) under H₀.
    Output: one row ``(n, k, h_stat, dof)`` rounded 6 (NULL h when every
    pooled value ties). Groups = every distinct non-NULL ``group_col``
    value with at least one non-NULL metric; fewer than 2 groups raise.
    """
    for c in (metric_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"kruskal_wallis: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull() & g.isNotNull()).select(
        y.alias("_y"), g.alias("_g")
    )
    counts = base.groupBy("_y").agg(F.count(F.lit(1)).alias("_n"))

    from temporalscope_spark.plans.rownum import with_global_cumsum

    ranked = with_global_cumsum(counts, ["_y"], ["_n"], materialize_input=True)
    avg_rank = (
        (F.col("_n_cum") - F.col("_n")).cast("double")
        + (F.col("_n").cast("double") + 1.0) / 2.0
    )
    rank_tbl = ranked.select("_y", avg_rank.alias("_r"), "_n")
    # per-(value, group) counts join the value-keyed rank table, then one
    # bounded per-group fold; ties fold from the value table
    vg = base.groupBy("_y", "_g").agg(F.count(F.lit(1)).alias("_c"))
    per_g = (
        vg.join(rank_tbl.select("_y", "_r"), "_y")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_ng"),
            F.sum(F.col("_c").cast("double") * F.col("_r")).alias("_rg"),
        )
    )
    ties = ranked.agg(
        F.sum(
            F.col("_n").cast("double") * F.col("_n") * F.col("_n")
            - F.col("_n").cast("double")
        ).alias("_t")
    )
    fold = per_g.agg(
        F.sum("_ng").alias("_nt"),
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.col("_rg") * F.col("_rg") / F.col("_ng").cast("double")).alias(
            "_rr"
        ),
    ).crossJoin(F.broadcast(ties))
    n = F.col("_nt").cast("double")
    guard = F.when(
        F.col("_k") < 2,
        F.raise_error(
            F.lit("kruskal_wallis: need >= 2 groups with non-null metrics")
        ).cast("long"),
    )
    h_raw = 12.0 / (n * (n + 1.0)) * F.col("_rr") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("_t") / (n * n * n - n)
    return fold.select(
        F.coalesce(guard, F.col("_nt")).cast("long").alias("n"),
        F.col("_k").cast("long").alias("k"),
        F.round(F.when(corr > 0, h_raw / corr), 6).alias("h_stat"),
        (F.col("_k") - 1).cast("long").alias("dof"),
    )


def levene_test(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    center: str = "median",
) -> DataFrame:
    """Levene / Brown–Forsythe variance-homogeneity test (Levene 1960;
    Brown & Forsythe 1974 — ``center='median'``, the robust default):
    one-way ANOVA F on the absolute deviations ``z = |y − center_g|``.
    The precondition check for pooled-variance methods and a drift
    screen for "did the SPREAD change even if the mean didn't".

    Plan shape: per-group centers from ONE grouped aggregation (exact
    grouped ``percentile`` for the median lane — ``percentile_approx``
    is the 100 TB swap, the corpus_stats convention) broadcast back to
    the rows; then ONE grouped moment aggregation of z and a bounded
    fold computes the F ratio. Output: one row ``(n, k, f_stat, dof1,
    dof2)`` rounded 6.
    """
    if center not in ("median", "mean"):
        raise DataFrameValidationError(
            "levene_test: center must be 'median' or 'mean'"
        )
    for c in (metric_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"levene_test: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull() & g.isNotNull()).select(
        y.alias("_y"), g.alias("_g")
    )
    if center == "median":
        cen = F.percentile("_y", F.lit(0.5))
    else:
        cen = F.avg("_y")
    centers = base.groupBy("_g").agg(F.round(cen, 6).alias("_c"))
    z = F.abs(F.col("_y") - F.col("_c"))
    zs = base.join(F.broadcast(centers), "_g").select("_g", z.alias("_z"))
    per_g = zs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_z").alias("_s"),
        F.sum(F.col("_z") * F.col("_z")).alias("_q"),
    )
    fold = per_g.agg(
        F.sum("_n").alias("_nt"),
        F.count(F.lit(1)).alias("_k"),
        F.sum("_s").alias("_st"),
        F.sum(F.col("_s") * F.col("_s") / F.col("_n").cast("double")).alias(
            "_bg"
        ),
        F.sum(
            F.col("_q") - F.col("_s") * F.col("_s") / F.col("_n").cast("double")
        ).alias("_wg"),
    )
    n = F.col("_nt").cast("double")
    k = F.col("_k").cast("double")
    guard = F.when(
        F.col("_k") < 2,
        F.raise_error(
            F.lit("levene_test: need >= 2 groups with non-null metrics")
        ).cast("long"),
    )
    ssb = F.col("_bg") - F.col("_st") * F.col("_st") / n
    fstat = (ssb / (k - 1.0)) / (F.col("_wg") / (n - k))
    return fold.select(
        F.coalesce(guard, F.col("_nt")).cast("long").alias("n"),
        F.col("_k").cast("long").alias("k"),
        F.round(F.when(F.col("_wg") > 0, fstat), 6).alias("f_stat"),
        (F.col("_k") - 1).cast("long").alias("dof1"),
        (F.col("_nt") - F.col("_k")).cast("long").alias("dof2"),
    )


def yuen_test(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    trim: float = 0.2,
) -> DataFrame:
    """Yuen's trimmed-mean test (Yuen 1974) — the robust two-sample t
    for heavy-tailed metrics: compare γ-trimmed means with winsorized
    variances,

        t = (x̄_t,a − x̄_t,b) / sqrt(d_a + d_b),
        d = s²_w·(n−1) / (h·(h−1)),   h = n − 2⌊γn⌋

    where s²_w is the winsorized sample variance. Falls back to Welch
    at ``trim=0`` (then it IS :func:`ab_test`'s z with small-sample
    dof). Output: one row ``(n_a, n_b, h_a, h_b, tmean_a, tmean_b,
    diff, t_stat, dof)`` rounded 6.

    Plan shape: the trim fractions need each group's γ and 1−γ exact
    quantiles — ONE grouped ``percentile`` fit (rounded-6 plan
    literals; ``percentile_approx`` the 100 TB swap), then ONE grouped
    aggregation computing trimmed sums (values strictly inside the
    quantile band) and winsorized moments (values CLAMPED to the band)
    in the same pass, and a bounded fold. Degenerate bands (zero
    winsorized variance) yield NULL t.
    """
    if not (0.0 <= trim < 0.5):
        raise DataFrameValidationError("yuen_test: trim must be in [0, 0.5)")
    for c in (metric_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"yuen_test: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull() & g.isin([str(group_a), str(group_b)])).select(
        g.alias("_g"), y.alias("_y")
    )
    qs = base.groupBy("_g").agg(
        F.round(F.percentile("_y", F.lit(float(trim))), 6).alias("_lo"),
        F.round(F.percentile("_y", F.lit(1.0 - float(trim))), 6).alias("_hi"),
        F.count(F.lit(1)).alias("_nq"),
    )
    rows = qs.collect()  # 2 bounded rows: band literals + group sizes
    bands = {r["_g"]: (r["_lo"], r["_hi"], int(r["_nq"])) for r in rows}
    for grp in (str(group_a), str(group_b)):
        if grp not in bands:
            raise DataFrameValidationError(
                f"yuen_test: group {grp!r} has no non-null rows"
            )
    import math  # noqa: PLC0415

    out_rows = []
    for grp in (str(group_a), str(group_b)):
        lo, hi, nq = bands[grp]
        gcut = int(math.floor(float(trim) * nq))
        wins = F.least(F.greatest(F.col("_y"), F.lit(lo)), F.lit(hi))
        agg = base.filter(F.col("_g") == grp).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(wins).alias("ws"),
            F.sum(wins * wins).alias("wq"),
        ).first()
        n = int(agg["n"])
        h = n - 2 * gcut
        if h < 2:
            raise DataFrameValidationError(
                f"yuen_test: group {grp!r} too small after trimming"
            )
        # trimmed mean from winsorized sum: the winsorized sum counts the
        # clamped tails at lo/hi; subtract them to get the interior sum
        tsum = float(agg["ws"]) - gcut * (lo + hi)
        tmean = tsum / h
        wmean = float(agg["ws"]) / n
        wvar = (float(agg["wq"]) - n * wmean * wmean) / (n - 1.0)
        d = wvar * (n - 1.0) / (h * (h - 1.0))
        out_rows.append((n, h, tmean, d))
    (na, ha, ta, da), (nb, hb, tb, db) = out_rows
    diff = ta - tb
    t_stat = diff / math.sqrt(da + db) if (da + db) > 0 else None
    dof = (
        (da + db) ** 2 / (da**2 / (ha - 1) + db**2 / (hb - 1))
        if (da > 0 or db > 0)
        else None
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            na, nb, ha, hb,
            round(ta, 6), round(tb, 6), round(diff, 6),
            round(t_stat, 6) if t_stat is not None else None,
            round(dof, 6) if dof is not None else None,
        )],
        "n_a long, n_b long, h_a long, h_b long, tmean_a double, "
        "tmean_b double, diff double, t_stat double, dof double",
    )


def eb_shrink_means(
    df: DataFrame,
    value_col: str,
    group_col: str,
    min_n: int = 2,
) -> DataFrame:
    """Empirical-Bayes (James–Stein / Efron–Morris 1975) shrinkage of
    per-group means toward the grand mean — THE fix for "rank a million
    sources by average quality" where small groups dominate the top and
    bottom by luck:

        shrunk_g = B_g·x̄_g + (1−B_g)·μ̂,   B_g = τ̂² / (τ̂² + σ̂²_g/n_g)

    with method-of-moments hyperparameters from ONE pass over the
    bounded group table: μ̂ = the group-size-weighted grand mean, σ̂² =
    the pooled within-group variance, and
    τ̂² = max(0, Σn(x̄_g−μ̂)²/Σn − σ̂²·G/Σn) (between-variance minus its
    sampling noise). Groups with fewer than ``min_n`` rows still shrink
    (they shrink the MOST — that is the point).

    Output: one row per group ``(group, n, mean, shrunk, weight)``
    (rounded 6, ``weight`` = B_g). Plan shape: ONE grouped moment
    aggregation → bounded hyperparameter fold (broadcast back) →
    expression scoring of the group table. NULL values excluded.
    """
    if min_n < 2:
        raise DataFrameValidationError("eb_shrink_means: min_n must be >= 2")
    for c in (value_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"eb_shrink_means: missing column {c!r}")
    y = F.col(value_col).cast("double")
    g = F.col(group_col).cast("string")
    per = (
        df.filter(y.isNotNull() & g.isNotNull())
        .groupBy(g.alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("_s"),
            F.sum(y * y).alias("_q"),
        )
    )
    n = F.col("n").cast("double")
    mean = F.col("_s") / n
    ssw = F.col("_q") - F.col("_s") * F.col("_s") / n
    hyper = per.agg(
        F.sum("n").alias("_nt"),
        F.count(F.lit(1)).alias("_gk"),
        F.sum("_s").alias("_st"),
        F.sum(ssw).alias("_ssw"),
        F.sum(F.when(n >= int(min_n), ssw)).alias("_sswok"),
        F.sum(F.when(n >= int(min_n), n - 1.0)).alias("_dofok"),
        F.sum(F.col("_s") * F.col("_s") / n).alias("_bg"),
    ).first()
    nt = float(hyper["_nt"])
    gk = float(hyper["_gk"])
    mu = float(hyper["_st"]) / nt
    sig2 = (
        float(hyper["_sswok"]) / float(hyper["_dofok"])
        if hyper["_dofok"] and float(hyper["_dofok"]) > 0
        else 0.0
    )
    ss_between = float(hyper["_bg"]) - nt * mu * mu
    tau2 = max(0.0, ss_between / nt - sig2 * gk / nt)
    mu, sig2, tau2 = round(mu, 6), round(sig2, 6), round(tau2, 6)
    w = F.when(
        F.lit(tau2) + F.lit(sig2) / n > 0,
        F.lit(tau2) / (F.lit(tau2) + F.lit(sig2) / n),
    ).otherwise(F.lit(1.0))
    return per.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(w * mean + (1.0 - w) * F.lit(mu), 6).alias("shrunk"),
        F.round(w, 6).alias("weight"),
    )


def dispersion_test(
    df: DataFrame,
    count_col: str,
) -> DataFrame:
    """Poisson over-dispersion screen (Cox 1983; the routine check
    before trusting :mod:`modeling.poisson`): under an intercept-only
    Poisson model the Pearson statistic ``X² = Σ(y−ȳ)²/ȳ`` has mean
    n−1 and variance 2(n−1), so

        index = s²/ȳ   (variance-to-mean ratio; 1 under Poisson)
        z = (X² − (n−1)) / sqrt(2(n−1))

    flags clumped (z ≫ 0 — fit negative binomial / add exposure) or
    under-dispersed counts. Output: one row ``(n, mean, var,
    dispersion_index, pearson_chi2, z)`` rounded 6 from ONE moment
    aggregation; zero mean yields NULL index/χ²/z.
    """
    if count_col not in df.columns:
        raise DataFrameValidationError(f"dispersion_test: missing column {count_col!r}")
    y = F.col(count_col).cast("double")
    one = df.filter(y.isNotNull()).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(y).alias("_s"),
        F.sum(y * y).alias("_q"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s") / n
    var = (F.col("_q") - F.col("_s") * F.col("_s") / n) / (n - 1.0)
    chi2 = (F.col("_q") - F.col("_s") * F.col("_s") / n) / mean
    z = (chi2 - (n - 1.0)) / F.sqrt(2.0 * (n - 1.0))
    return one.select(
        F.col("_n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(F.when(F.col("_n") > 1, var), 6).alias("var"),
        F.round(F.when(mean > 0, var / mean), 6).alias("dispersion_index"),
        F.round(F.when(mean > 0, chi2), 6).alias("pearson_chi2"),
        F.round(F.when((mean > 0) & (F.col("_n") > 1), z), 6).alias("z"),
    )


def ratio_metric_test(
    df: DataFrame,
    num_col: str,
    den_col: str,
    variant_col: str,
    control: str,
) -> DataFrame:
    """Per-variant RATIO metric (clicks/views, revenue/sessions —
    aggregated per randomization unit) with the delta-method standard
    error (Deng, Knoblich & Lu, KDD 2018 "Applying the Delta method in
    metric analytics"): the naive per-row proportion SE is wrong when
    the unit of analysis (impression) differs from the unit of
    randomization (user); with x = unit numerator, y = unit denominator,

        r̂ = x̄/ȳ,
        Var[r̂] ≈ (σ²_x − 2r̂σ_xy + r̂²σ²_y) / (n·ȳ²)

    Against the named control: ``diff``, and z from the independent-sum
    of the two delta variances. Output: one row per variant ``(variant,
    n, ratio, se, diff, z)`` rounded 6 (control's diff/z NULL; missing
    control raises; zero ȳ yields NULL ratio/se).

    Plan shape: ONE variant-keyed moment aggregation (5 sums) → bounded
    fold over the C-row variant table (the ``ab_test`` conventions).
    """
    for c in (num_col, den_col, variant_col):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"ratio_metric_test: missing column {c!r}"
            )
    x = F.col(num_col).cast("double")
    yv = F.col(den_col).cast("double")
    base = df.filter(x.isNotNull() & yv.isNotNull())
    agg = base.groupBy(
        F.col(variant_col).cast("string").alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(yv).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(yv * yv).alias("_syy"),
        F.sum(x * yv).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    mx = F.col("_sx") / n
    my = F.col("_sy") / n
    vx = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / (n - 1.0)
    vy = (F.col("_syy") - F.col("_sy") * F.col("_sy") / n) / (n - 1.0)
    cxy = (F.col("_sxy") - F.col("_sx") * F.col("_sy") / n) / (n - 1.0)
    r = mx / my
    var_r = (vx - 2.0 * r * cxy + r * r * vy) / (n * my * my)
    stats = agg.select(
        "variant",
        "n",
        F.when(my != 0, r).alias("_r"),
        F.when((my != 0) & (F.col("n") > 1), var_r).alias("_v"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # bounded C-row variant table
    is_ctl = F.col("variant") == F.lit(str(control))
    rc = F.max(F.when(is_ctl, F.col("_r"))).over(wall)
    vc = F.max(F.when(is_ctl, F.col("_v"))).over(wall)
    seen = F.max(is_ctl.cast("int")).over(wall)
    guard = F.when(
        seen == 0,
        F.raise_error(
            F.lit(f"ratio_metric_test: control variant {control!r} not present")
        ).cast("double"),
    )
    diff = F.col("_r") - rc
    se_diff = F.sqrt(F.col("_v") + vc)
    return stats.select(
        "variant",
        "n",
        F.coalesce(guard, F.round(F.col("_r"), 6)).alias("ratio"),
        F.round(F.sqrt(F.col("_v")), 6).alias("se"),
        F.round(F.when(~is_ctl, diff), 6).alias("diff"),
        F.round(F.when(~is_ctl & (se_diff > 0), diff / se_diff), 6).alias("z"),
    ).orderBy("variant")
