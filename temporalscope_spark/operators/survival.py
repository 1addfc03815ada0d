"""Survival analysis: the Kaplan–Meier product-limit estimator.

The reference's temporal story ends at the leakage-safe label builders
(``operators/shift.py:time_to_event`` is the duration/censor-flag
producer; reference target semantics at /root/reference/src/temporalscope/
target_shifters/single_step.py:265-301); a feature/evaluation engine that
emits churn labels also needs the standard way to LOOK at them — the
Kaplan–Meier survival curve (Kaplan & Meier 1958) with Greenwood's
variance, per cohort/group.

Plan shape (100 TB-safe): the corpus collapses in ONE map-side-combinable
``groupBy(group, duration)`` aggregation to a distinct-duration table
(bounded by #groups × #distinct durations, the same shape every KM
implementation sorts); the at-risk counts and the cumulative
log-survival / Greenwood sums are windows PARTITIONED BY GROUP over that
bounded table — no single-partition window at any size, and the group
partitioning means a million cohorts parallelize. The survival product is
computed as ``exp(Σ ln((n−d)/n))`` — a running SUM both engines fold in
the same (duration-ordered) sequence, so the oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


def _stepped(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None,
    caller: str,
):
    """Shared product-limit event table: ONE corpus aggregation to the
    bounded distinct-duration grid with (n_event, n_censored, n_risk) per
    (group,) time, 0/1 validation riding inside the aggregation. Returns
    (stepped_df, group_name_list)."""
    for c in [duration_col, event_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise DataFrameValidationError(f"{caller}: missing column {c!r}")

    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("double")
    gcols = [F.col(group_col).alias("group")] if group_col else []
    gnames = ["group"] if group_col else []

    base = df.filter(dur.isNotNull() & ev.isNotNull()).select(
        *gcols, dur.alias("t"), ev.alias("_e")
    )
    counts = base.groupBy(*gnames, "t").agg(
        F.sum("_e").alias("n_event"),
        F.sum(F.lit(1.0) - F.col("_e")).alias("n_censored"),
        F.count(F.lit(1)).alias("_n"),
        F.max(
            F.when((F.col("_e") != 0.0) & (F.col("_e") != 1.0), 1).otherwise(0)
        ).alias("_bad"),
    )
    w = Window.partitionBy(*gnames).orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stepped = counts.select(
        *gnames,
        "t",
        F.col("n_event").cast("long").alias("n_event"),
        F.col("n_censored").cast("long").alias("n_censored"),
        (F.sum("_n").over(full) - (F.sum("_n").over(cum) - F.col("_n")))
        .cast("long")
        .alias("n_risk"),
        F.max("_bad").over(full).alias("_bad"),
    )
    return stepped, gnames


def _guarded(col, event_col: str, caller: str):
    """Wrap an output expression with the 0/1 event-flag gate so column
    pruning can never drop the check."""
    return F.when(
        F.col("_bad") == 1,
        F.raise_error(F.lit(f"{caller}: event {event_col!r} must be 0/1")).cast(
            "double"
        ),
    ).otherwise(col)


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kaplan–Meier survival curve per group.

    ``duration_col`` is the observed time (event time if ``event_col`` = 1,
    censoring time if 0); rows with NULL duration or NULL event flag are
    excluded; an event flag outside {0, 1} raises. At each distinct
    observed duration ``t`` (ascending, the standard product-limit grid):

        n_t = #subjects with duration ≥ t          (at risk)
        d_t = #events at exactly t
        S(t) = Π_{s ≤ t} (n_s − d_s) / n_s         (survival)
        Var(S) = S(t)² · Σ_{s ≤ t, d>0} d_s / (n_s (n_s − d_s))
                                                    (Greenwood 1926)

    Censored-only times keep S flat (factor 1) but still appear as curve
    rows — lifelines' ``event_table`` convention. If at some time every
    remaining subject dies (``d = n``), S drops to exactly 0 and stays
    there; the Greenwood term is undefined from that point (SE = NULL),
    matching lifelines.

    Output: one row per (group,) duration —
    ``(group?, t, n_risk, n_event, n_censored, survival, se)`` with
    ``survival``/``se`` rounded to 6, ordered by (group, t).
    """
    stepped, gnames = _stepped(df, duration_col, event_col, group_col, "kaplan_meier")
    w = Window.partitionBy(*gnames).orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    d = F.col("n_event").cast("double")
    n = F.col("n_risk").cast("double")
    terms = stepped.select(
        *gnames,
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        "_bad",
        # d = n ⇒ S hits exactly 0: exclude the −inf log term and carry a
        # sticky zero flag instead
        F.when(d < n, F.log((n - d) / n)).otherwise(F.lit(0.0)).alias("_ln"),
        F.when((d > 0) & (d < n), d / (n * (n - d)))
        .otherwise(F.lit(0.0))
        .alias("_gw"),
        F.when(d >= n, 1).otherwise(0).alias("_z"),
    )

    zcum = F.max("_z").over(cum)
    scurve = F.when(zcum == 1, F.lit(0.0)).otherwise(F.exp(F.sum("_ln").over(cum)))
    # the 0/1 gate rides inside the survival expression itself so column
    # pruning can never drop it (a free-standing check column would be
    # dead code to Catalyst)
    out = terms.select(
        *gnames,
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        _guarded(F.round(scurve, 6), event_col, "kaplan_meier").alias("survival"),
        F.when(
            zcum == 0,
            F.round(scurve * F.sqrt(F.sum("_gw").over(cum)), 6),
        ).alias("se"),
    )
    return out.orderBy(*gnames, "t")


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator per group (Nelson 1972;
    Aalen 1978) — the KM curve's hazard-scale twin and the standard input
    to proportional-hazards eyeballing:

        H(t) = Σ_{s ≤ t} d_s / n_s ,   Var = Σ_{s ≤ t} d_s / n_s²

    over the same bounded distinct-duration grid as
    :func:`kaplan_meier` (ONE corpus aggregation + group-partitioned
    cumulative windows — identical plan shape, identical validation).

    Output: ``(group?, t, n_risk, n_event, hazard, se)`` rounded to 6,
    ordered by (group, t).
    """
    stepped, gnames = _stepped(df, duration_col, event_col, group_col, "nelson_aalen")
    w = Window.partitionBy(*gnames).orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col("n_event").cast("double")
    n = F.col("n_risk").cast("double")
    terms = stepped.select(
        *gnames,
        "t",
        "n_risk",
        "n_event",
        "_bad",
        (d / n).alias("_h"),
        (d / (n * n)).alias("_v"),
    )
    out = terms.select(
        *gnames,
        "t",
        "n_risk",
        "n_event",
        _guarded(F.round(F.sum("_h").over(cum), 6), event_col, "nelson_aalen").alias(
            "hazard"
        ),
        F.round(F.sqrt(F.sum("_v").over(cum)), 6).alias("se"),
    )
    return out.orderBy(*gnames, "t")


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Log-rank test (Mantel 1966; Peto & Peto 1972): are the groups'
    survival curves the same? Per group: observed events ``O_g = Σ_t
    d_gt`` and expected-under-H0 ``E_g = Σ_t d_t·n_gt/n_t`` over the
    pooled distinct EVENT-time grid; with exactly two groups the
    chi-square statistic (1 df) is

        χ² = (O_1 − E_1)² / V ,
        V = Σ_t d_t·(n_1t/n_t)·(1 − n_1t/n_t)·(n_t − d_t)/(n_t − 1)

    (the hypergeometric variance; times with n_t = 1 contribute 0). With
    more than two groups O/E per group still come out (the k-sample
    statistic needs the covariance matrix — out of scope) and ``chi2``
    is NULL.

    Plan shape: the per-(group, t) event table is ONE corpus
    aggregation; the group-at-risk values on the pooled grid come from a
    backward STRICT as-of join (``operators/asof.py``) of the
    grid × group spine against each group's cumulative-exit steps —
    entity-keyed union window, no time-range explosion; the per-time
    totals are a window keyed BY TIME over the bounded grid×group table;
    the final reduction is ONE k-row aggregation.

    Output: one row per group — ``(group, n_subjects, observed,
    expected, chi2)`` (chi2 repeated on both rows for k = 2), rounded to
    6, ordered by group.
    """
    stepped, _ = _stepped(df, duration_col, event_col, group_col, "logrank_test")
    # exits (event + censored) per (group, t), cumulative through t
    w = Window.partitionBy("group").orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps = stepped.select(
        "group",
        "t",
        "n_event",
        "_bad",
        F.sum(F.col("n_event") + F.col("n_censored")).over(cum).alias("_cumexit"),
        F.max(F.col("n_risk") + F.lit(0)).over(
            Window.partitionBy("group").orderBy("t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_ng_total"),
    )
    from pyspark import StorageLevel

    steps = steps.persist(StorageLevel.MEMORY_AND_DISK)

    # pooled event-time grid × group spine (bounded: |times| × k)
    times = (
        steps.filter(F.col("n_event") > 0).select("t").distinct()
    )
    groups = steps.select(
        "group", F.col("_ng_total").alias("n_subjects"), "_bad"
    ).distinct()
    grid = times.crossJoin(F.broadcast(groups))

    from temporalscope_spark.operators.asof import asof_join

    # at risk in g at time t = N_g − exits strictly before t
    att = asof_join(
        grid,
        steps.select("group", F.col("t").alias("_st"), "_cumexit"),
        on="group",
        left_time="t",
        right_time="_st",
        value_cols=["_cumexit"],
        allow_exact_matches=False,
        direction="backward",
    ).select(
        "group",
        "t",
        "n_subjects",
        "_bad",
        (F.col("n_subjects") - F.coalesce(F.col("_cumexit"), F.lit(0))).alias(
            "_ngt"
        ),
    )
    # events in g at t (0 where the group had none)
    ev = steps.filter(F.col("n_event") > 0).select(
        "group", "t", F.col("n_event").alias("_dgt")
    )
    att = att.join(ev, ["group", "t"], "left").fillna({"_dgt": 0})

    wt = Window.partitionBy("t")  # bounded grid×group table
    nt = F.sum("_ngt").over(wt).cast("double")
    dt = F.sum("_dgt").over(wt).cast("double")
    ngt = F.col("_ngt").cast("double")
    per = att.select(
        "group",
        "n_subjects",
        "_bad",
        F.col("_dgt").alias("_obs"),
        (dt * ngt / nt).alias("_exp"),
        F.when(
            nt > 1,
            dt * (ngt / nt) * (F.lit(1.0) - ngt / nt) * (nt - dt) / (nt - F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("_var"),
    )
    agg = per.groupBy("group", "n_subjects", "_bad").agg(
        F.sum("_obs").alias("_o"),
        F.sum("_exp").alias("_e"),
        F.sum("_var").alias("_v"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # k-row group table
    k = F.count(F.lit(1)).over(wall)
    # 2-group chi2: (O_g − E_g)² is the same for both groups (they are
    # negatives of each other), and the per-group variance sum _v is the
    # pair variance V by the symmetry of n_1t/n_t·(1 − n_1t/n_t)
    dmax = F.max(F.col("_o").cast("double") - F.col("_e")).over(wall)
    chi2 = F.when((k == 2) & (F.col("_v") > 0), (dmax * dmax) / F.col("_v"))
    out = agg.select(
        "group",
        "n_subjects",
        F.col("_o").cast("long").alias("observed"),
        _guarded(F.round(F.col("_e"), 6), event_col, "logrank_test").alias(
            "expected"
        ),
        F.round(chi2, 6).alias("chi2"),
    )
    return out.orderBy("group")


def cox_step(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    feature_cols,
    beta: dict | None = None,
    ridge: float = 0.0,
):
    """ONE Newton step of Cox proportional-hazards partial likelihood
    (Cox 1972; Breslow tie handling) — the regression member of the
    survival family (KM/Nelson–Aalen/log-rank describe; Cox explains).

    With risk-set sums ``S_k(t) = Σ_{j: t_j ≥ t} w_j·x_j^{⊗k}`` at
    ``w = e^{x'β}``, the score and information are

        U_k  = Σ_{event times t} [ Σ_{i∈D_t} x_ik − d_t·S1_k/S0 ]
        I_jk = Σ_{event times t}   d_t·(S2_jk/S0 − S1_j·S1_k/S0²)

    and the step is ``β' = β + (I + λI)⁻¹U``. Returns
    ``(new_beta, n_rows, n_events, partial_loglik)``; iterate to fit
    (Newton converges in a handful of rounds — same contract as
    ``modeling.logistic.irls_step``).

    Plan shape (100 TB-safe): the corpus collapses in ONE map-side-
    combinable ``groupBy(duration)`` aggregation to the bounded
    distinct-duration grid carrying the per-time event sums and w-moment
    sums; the risk-set suffix sums are the quantile-bucket two-phase
    prefix sum of ``plans/rownum.py`` ordered by DESCENDING duration (NO
    single-partition window even when durations are continuous); the
    final U/I fold ships p + p(p+1)/2 + 1 doubles to the driver for the
    numpy solve — the irls_step convention. Event must be 0/1 (validated
    in-aggregation); NULL rows are dropped.
    """
    import numpy as np  # noqa: PLC0415

    feature_cols = list(feature_cols)
    if not feature_cols:
        raise DataFrameValidationError("cox_step: feature_cols must be non-empty")
    for c in [duration_col, event_col, *feature_cols]:
        if c not in df.columns:
            raise DataFrameValidationError(f"cox_step: missing column {c!r}")
    beta = dict(beta or {c: 0.0 for c in feature_cols})
    p = len(feature_cols)
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("double")
    xs = [F.col(c).cast("double") for c in feature_cols]
    cond = t.isNotNull() & e.isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    eta = F.lit(0.0)
    for c, x in zip(feature_cols, xs):
        eta = eta + F.lit(float(beta[c])) * x
    w = F.exp(eta)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(e).alias("_d"),
        F.sum(e * eta).alias("_se"),
        F.sum(w).alias("_sw"),
        F.max((~e.isin(0.0, 1.0)).cast("int")).alias("_bad"),
    ]
    for i, x in enumerate(xs):
        aggs.append(F.sum(e * x).alias(f"_sx{i}"))
        aggs.append(F.sum(w * x).alias(f"_swx{i}"))
        for j in range(i, p):
            aggs.append(F.sum(w * x * xs[j]).alias(f"_swxx{i}_{j}"))
    grid = df.filter(cond).groupBy(t.alias("_t")).agg(*aggs)

    from temporalscope_spark.plans.rownum import with_global_cumsum

    cum_cols = ["_sw"] + [f"_swx{i}" for i in range(p)] + [
        f"_swxx{i}_{j}" for i in range(p) for j in range(i, p)
    ]
    grid = grid.withColumn("_negt", -F.col("_t"))
    cum = with_global_cumsum(grid, ["_negt"], cum_cols, materialize_input=True)
    s0 = F.col("_sw_cum")
    s1 = [F.col(f"_swx{i}_cum") for i in range(p)]
    s2 = {(i, j): F.col(f"_swxx{i}_{j}_cum") for i in range(p) for j in range(i, p)}
    ev = F.col("_d") > 0
    folds = [
        F.sum("_n").alias("_nr"),
        F.sum("_d").alias("_ne"),
        F.max("_bad").alias("_badmax"),
        F.sum(F.when(ev, F.col("_se") - F.col("_d") * F.log(s0))).alias("_ll"),
    ]
    for i in range(p):
        folds.append(
            F.sum(
                F.when(ev, F.col(f"_sx{i}") - F.col("_d") * s1[i] / s0)
            ).alias(f"_u{i}")
        )
        for j in range(i, p):
            folds.append(
                F.sum(
                    F.when(
                        ev,
                        F.col("_d")
                        * (s2[(i, j)] / s0 - s1[i] * s1[j] / (s0 * s0)),
                    )
                ).alias(f"_i{i}_{j}")
            )
    row = cum.agg(*folds).first()
    if int(row["_badmax"] or 0) > 0:
        raise DataFrameValidationError(
            f"cox_step: event column '{event_col}' must be 0/1"
        )
    n_events = int(row["_ne"] or 0)
    if n_events == 0:
        raise DataFrameValidationError("cox_step: no events (all censored)")
    U = np.array([row[f"_u{i}"] for i in range(p)])
    I = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            I[i, j] = I[j, i] = row[f"_i{i}_{j}"]
    if ridge:
        I = I + float(ridge) * np.eye(p)
    delta = np.linalg.solve(I, U)
    new_beta = {c: float(beta[c] + delta[i]) for i, c in enumerate(feature_cols)}
    return new_beta, int(row["_nr"]), n_events, float(row["_ll"])


def fit_cox(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    feature_cols,
    ridge: float = 0.0,
    max_iters: int = 25,
    tol: float = 1e-8,
) -> dict:
    """Fit Cox PH by iterating :func:`cox_step` to convergence. Returns
    ``{"coefs": {...}, "n_rows", "n_events", "loglik", "n_iters"}``;
    raises on non-convergence."""
    feature_cols = list(feature_cols)
    beta = {c: 0.0 for c in feature_cols}
    for it in range(1, max_iters + 1):
        new_beta, n, ne, ll = cox_step(
            df, duration_col, event_col, feature_cols, beta, ridge=ridge
        )
        delta = max(abs(new_beta[c] - beta[c]) for c in feature_cols)
        beta = new_beta
        if delta < tol:
            return {
                "coefs": beta, "n_rows": n, "n_events": ne,
                "loglik": ll, "n_iters": it,
            }
    raise DataFrameValidationError(
        f"fit_cox did not converge in {max_iters} Newton rounds"
    )


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: float,
    group_col: str | None = None,
) -> DataFrame:
    """Restricted mean survival time to horizon τ (Royston & Parmar
    2013; Uno et al. 2014 — the recommended effect summary when
    proportional hazards is doubtful): the area under the Kaplan–Meier
    curve on [0, τ],

        RMST(τ) = ∫₀^τ S(t) dt
                = min(t₁, τ) + Σ_i S(t_i)·(min(t_{i+1}, τ) − min(t_i, τ))

    — "expected survival time over the next τ", in the duration's own
    units, valid under any hazard shape. Output: one row per group
    ``(group?, tau, n, n_events, rmst)`` rounded 6.

    Plan shape: rides :func:`kaplan_meier` (one corpus aggregation to
    the bounded distinct-duration table) + a GROUP-PARTITIONED lead and
    one grouped fold over that bounded table — the KM conventions
    exactly; a million cohorts parallelize.
    """
    if tau <= 0:
        raise DataFrameValidationError("rmst: tau must be > 0")
    km = kaplan_meier(df, duration_col, event_col, group_col)
    gnames = ["group"] if group_col else []
    w = Window.partitionBy(*gnames).orderBy("t")
    t_cl = F.least(F.col("t").cast("double"), F.lit(float(tau)))
    nxt = F.lead(F.col("t").cast("double")).over(w)
    nxt_cl = F.least(F.coalesce(nxt, F.lit(float(tau))), F.lit(float(tau)))
    first = F.row_number().over(w) == 1
    seg = F.col("survival") * (nxt_cl - t_cl) + F.when(
        first, t_cl  # S = 1 on [0, t1)
    ).otherwise(F.lit(0.0))
    per = km.select(
        *gnames,
        seg.alias("_seg"),
        F.col("n_event"),
        F.col("n_risk"),
        first.cast("int").alias("_first"),
    )
    agg = per.groupBy(*gnames).agg(
        F.round(F.sum("_seg"), 6).alias("rmst"),
        F.sum("n_event").alias("n_events"),
        F.max(F.when(F.col("_first") == 1, F.col("n_risk"))).alias("_n"),
    )
    return agg.select(
        *gnames,
        F.lit(float(tau)).alias("tau"),
        F.col("_n").cast("long").alias("n"),
        F.col("n_events").cast("long").alias("n_events"),
        "rmst",
    )
