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
    for c in [duration_col, event_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise DataFrameValidationError(f"kaplan_meier: missing column {c!r}")

    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("double")
    gcols = [F.col(group_col).alias("group")] if group_col else []
    gnames = ["group"] if group_col else []

    base = df.filter(dur.isNotNull() & ev.isNotNull()).select(
        *gcols, dur.alias("t"), ev.alias("_e")
    )

    # ONE corpus aggregation → the bounded distinct-duration table; the
    # 0/1 validation rides inside it (the woe_iv_table pattern) so the
    # corpus is never scanned twice.
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

    # at risk at t = group total − everyone who exited strictly before t
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
    guarded = F.when(
        F.col("_bad") == 1,
        F.raise_error(F.lit(f"kaplan_meier: event {event_col!r} must be 0/1")).cast(
            "double"
        ),
    ).otherwise(F.round(scurve, 6))
    out = terms.select(
        *gnames,
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        guarded.alias("survival"),
        F.when(
            zcum == 0,
            F.round(scurve * F.sqrt(F.sum("_gw").over(cum)), 6),
        ).alias("se"),
    )
    return out.orderBy(*gnames, "t")
