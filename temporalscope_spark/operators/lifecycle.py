"""Entity-lifecycle analytics: cohort retention and ordered funnels.

The reference's entity story is per-entity windows (sliding-window
partitioner, /root/reference/src/temporalscope/partition/sliding_window.py)
and leakage-safe shifts; the two product-analytics staples built on the
same (entity, timestamp) spine are the cohort retention matrix (what
fraction of each signup cohort is still active k periods later) and the
ordered funnel (of the users who did step 1, how many did step 2 AFTER
it, then step 3 after that).

Plan shapes (100 TB-safe):

* ``cohort_retention``: the cohort period comes from ONE entity-keyed
  window min (single exchange on the entity key — exchange-free on the
  bucketed layout), activity collapses via ``distinct`` on (cohort, age,
  entity) → ONE ``groupBy(cohort, age)`` count; the cohort-size
  denominator is a window over the BOUNDED (cohort, age) table. No
  single-partition window, no join against a row-sized table.
* ``funnel_conversion``: per-entity per-step sorted timestamp arrays from
  ONE ``groupBy(entity)`` aggregation (arrays are entity-bounded — the
  ``packing.py`` justification), the step chain is a narrow expression
  fold (``array_min`` over filtered arrays), and the k-row summary is one
  1-row aggregation exploded against a literal step table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds
from temporalscope_spark.exceptions import DataFrameValidationError


def cohort_retention(
    df: DataFrame,
    time_col: str,
    id_col: str,
    period_seconds: int = 86400,
) -> DataFrame:
    """Cohort × age retention counts over an event stream.

    An entity's cohort is the period (``floor(epoch_seconds /
    period_seconds)``, a fixed-width grid — engine-portable where
    calendar ``date_trunc`` week conventions are not) of its FIRST event;
    its age at any event is ``period − cohort``. Retention at age k =
    distinct entities active in period (cohort + k) / cohort size (every
    entity is active at age 0 by construction, so the age-0 row IS the
    cohort size).

    Output: ``(cohort_period, age, n_active, retention)`` with retention
    rounded to 6, ordered by (cohort_period, age).
    """
    if period_seconds <= 0:
        raise DataFrameValidationError("cohort_retention: period_seconds must be > 0")
    for c in (time_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"cohort_retention: missing column {c!r}")

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.floor(t / F.lit(float(period_seconds))).cast("long").alias("_p"),
    ).filter(F.col("_p").isNotNull())

    w = Window.partitionBy("_id")
    aged = base.select(
        "_id",
        F.min("_p").over(w).alias("cohort_period"),
        (F.col("_p") - F.min("_p").over(w)).alias("age"),
    ).distinct()

    counts = aged.groupBy("cohort_period", "age").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    wc = Window.partitionBy("cohort_period")
    out = counts.select(
        "cohort_period",
        "age",
        "n_active",
        F.round(
            F.col("n_active").cast("double")
            / F.max(F.when(F.col("age") == 0, F.col("n_active"))).over(wc),
            6,
        ).alias("retention"),
    )
    return out.orderBy("cohort_period", "age")


def funnel_conversion(
    df: DataFrame,
    time_col: str,
    id_col: str,
    type_col: str,
    steps: Sequence[str],
    horizon_seconds: float | None = None,
) -> DataFrame:
    """Ordered funnel: per entity, step k counts only if it happened at or
    after the entity's step-(k−1) time (earliest qualifying occurrence is
    taken, the standard product-analytics convention), and — when
    ``horizon_seconds`` is given — within that horizon of the previous
    step.

    Output: one row per step —
    ``(step_idx, step, n_entities, pct_of_first, pct_of_prev)`` with
    percentages rounded to 6 (``pct_of_prev`` NULL on step 1, 0-division
    → NULL), ordered by step_idx.
    """
    if len(steps) < 2:
        raise DataFrameValidationError("funnel_conversion: need >= 2 steps")
    if len(set(steps)) != len(steps):
        raise DataFrameValidationError("funnel_conversion: steps must be distinct")
    for c in (time_col, id_col, type_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"funnel_conversion: missing column {c!r}")

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    base = df.select(
        F.col(id_col).alias("_id"),
        t.alias("_t"),
        F.col(type_col).alias("_ty"),
    ).filter(F.col("_t").isNotNull())

    # ONE entity aggregation: a sorted timestamp array per step
    # (collect_list drops the non-matching NULLs); entity-bounded.
    arrs = base.groupBy("_id").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_ty") == s, F.col("_t")))
            ).alias(f"_a{i}")
            for i, s in enumerate(steps)
        ]
    )

    # narrow step-chain fold: t_k = earliest step-k time >= t_{k-1}
    # (and <= t_{k-1} + horizon when bounded). The lambda factory MUST
    # return a one-argument callable: a two-parameter lambda (even with a
    # default) is treated by F.filter as an (element, index) function and
    # the captured column silently becomes the array index.
    def _after(p):
        if horizon_seconds is None:
            return lambda x: x >= p
        h = F.lit(float(horizon_seconds))
        return lambda x: (x >= p) & (x <= p + h)

    cur = F.try_element_at(F.col("_a0"), F.lit(1))
    reach = [cur.isNotNull()]
    for i in range(1, len(steps)):
        cur = F.array_min(F.filter(F.col(f"_a{i}"), _after(cur)))
        reach.append(cur.isNotNull())

    summary = arrs.agg(
        *[F.sum(r.cast("long")).alias(f"_n{i}") for i, r in enumerate(reach)]
    )

    step_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_entities"),
            )
            for i, s in enumerate(steps)
        ]
    )
    exploded = summary.select(F.explode(step_rows).alias("r")).select("r.*")
    wprev = Window.orderBy("step_idx")  # k-row table: bounded, never data-sized
    n = F.col("n_entities").cast("double")
    first = F.first("n_entities").over(
        wprev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prevn = F.lag("n_entities").over(wprev)
    out = exploded.select(
        "step_idx",
        "step",
        "n_entities",
        F.round(
            F.when(first > 0, n / first.cast("double")), 6
        ).alias("pct_of_first"),
        F.round(
            F.when(prevn > 0, n / prevn.cast("double")), 6
        ).alias("pct_of_prev"),
    )
    return out.orderBy("step_idx")


def session_paths(
    df: DataFrame,
    time_col: str,
    id_col: str,
    type_col: str,
    gap_seconds: float,
    max_steps: int = 5,
    k: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k session paths: gap-sessionize each entity's stream
    (:func:`operators.sessionize.sessionize` semantics — a new session
    when the gap exceeds ``gap_seconds``), truncate each session to its
    first ``max_steps`` event types in (time, tiebreak) order, join with
    ``" > "``, and count identical paths — the standard user-journey
    report.

    Plan shape: the session id is one entity-keyed cumulative window;
    the path is ONE ``groupBy(entity, session)`` aggregation collecting
    a session-bounded sorted struct array (the funnel/packing
    justification); path counts are map-side combinable and the top-k is
    ``TakeOrderedAndProject`` (n desc, path asc — deterministic), never
    a full sort.

    Output: ``(path, n)`` ordered by (n desc, path), at most ``k`` rows.
    """
    if max_steps < 1 or k < 1:
        raise DataFrameValidationError(
            "session_paths: max_steps and k must be >= 1"
        )
    for c in [time_col, id_col, type_col] + (
        [tiebreak_col] if tiebreak_col else []
    ):
        if c not in df.columns:
            raise DataFrameValidationError(f"session_paths: missing column {c!r}")

    from temporalscope_spark.operators.sessionize import sessionize

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    base = df.filter(t.isNotNull() & F.col(type_col).isNotNull())
    sess = sessionize(base, time_col, id_col, gap_seconds, session_col="_sid")
    tb = (
        [F.col(tiebreak_col).alias("tb")]
        if tiebreak_col
        else [F.lit(0).alias("tb")]
    )
    arr = (
        sess.select(
            F.col(id_col).alias("_id"),
            "_sid",
            F.struct(
                epoch_seconds(
                    F.col(time_col), df.schema[time_col].dataType
                ).alias("t"),
                *tb,
                F.col(type_col).alias("ty"),
            ).alias("_s"),
        )
        .groupBy("_id", "_sid")
        .agg(F.sort_array(F.collect_list("_s")).alias("_arr"))
    )
    path = F.concat_ws(
        " > ",
        F.transform(F.slice(F.col("_arr"), 1, max_steps), lambda x: x["ty"]),
    )
    counts = arr.select(path.alias("path")).groupBy("path").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.orderBy(F.col("n").desc(), F.col("path")).limit(k)
