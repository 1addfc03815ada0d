"""Split-conformal prediction intervals — distribution-free uncertainty.

Split (inductive) conformal prediction (Papadopoulos et al. 2002; Vovk et
al. 2005 "Algorithmic Learning in a Random World"; Lei et al. 2018 JASA)
wraps ANY point predictor in finite-sample-valid intervals: hold out a
calibration slice, take the k-th smallest absolute residual with
``k = ceil((n+1)·(1−α))``, and emit ``ŷ ± q``. Under exchangeability the
interval covers the truth with probability ≥ 1−α — no model or noise
assumptions. In a training-data pipeline this is the honest error bar on
any learned scorer (quality regressor, length predictor, reward model).

Distributed shape — the engineering content is WHERE the order statistic
comes from:

* **grouped (Mondrian) lane** (``group_col`` set — per-group validity,
  Vovk's taxonomy-conditional variant): residual ranks are a window
  PARTITIONED BY the group, so every group sorts in parallel; per-group
  ``(n_g, k_g, q_g)`` live on a bounded G-row table joined back broadcast.
  A group whose calibration slice is too small for a finite interval
  (``k_g > n_g``) emits NULL bounds rather than lying.
* **ungrouped lane**: a global ``Window.orderBy`` would collapse to one
  task, so the k-th residual comes from
  :func:`temporalscope_spark.plans.rownum.order_statistics` — the
  quantile-bucket two-phase global rank; exactly ONE row reaches the
  driver.

Determinism contract: the k-th order statistic of a multiset is
tie-invariant (equal residuals are equal), so ``q`` is engine-exact;
bounds round to 6 and ``covered`` compares ROUNDED |residual| against
ROUNDED q so the boolean cannot flip on the last ulp.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


def conformal_interval(
    df: DataFrame,
    y_col: str,
    yhat_col: str,
    calib_col: str,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Split-conformal intervals for the rows where ``calib_col`` is false.

    Rows with ``calib_col`` true form the calibration slice; the rest are
    scored. Returns one row per scored row:
    ``(id, [group], y, yhat, qhat, lo, hi, covered)`` with ``lo = ŷ − q``,
    ``hi = ŷ + q`` (rounded 6) and ``covered`` the rounded-residual
    containment test. ``group_col`` switches to Mondrian (per-group)
    calibration; groups without enough calibration rows for
    ``ceil((n+1)(1−α)) ≤ n`` yield NULL ``qhat``/bounds.
    """
    if not (0.0 < alpha < 1.0):
        raise DataFrameValidationError("alpha must be in (0, 1)")
    for c in (y_col, yhat_col, calib_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"column {c!r} must exist")

    res = F.abs(F.col(y_col).cast("double") - F.col(yhat_col).cast("double"))
    calib = df.filter(F.col(calib_col).cast("boolean")).select(
        *([group_col] if group_col else []), res.alias("_r")
    )
    serve = df.filter(~F.col(calib_col).cast("boolean"))

    if group_col is None:
        from temporalscope_spark.plans.rownum import order_statistics

        n = calib.count()
        if n == 0:
            raise DataFrameValidationError("calibration slice is empty")
        k = math.ceil((n + 1) * (1.0 - alpha))
        if k > n:
            raise DataFrameValidationError(
                f"calibration slice too small for alpha={alpha}: "
                f"need ceil((n+1)(1-alpha)) <= n, got k={k} > n={n}"
            )
        q = order_statistics(calib, ["_r"], [k])[k][0]
        qcol = F.lit(float(q))
        joined = serve
    else:
        # per-group k-th order statistic: group-partitioned window (each
        # group ranks in parallel), then the bounded G-row (group, q) table
        # joins back broadcast. k_g > n_g => no finite interval => NULL q.
        w = Window.partitionBy(group_col).orderBy("_r")
        ranked = calib.withColumn("_rn", F.row_number().over(w))
        stats = calib.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
        kexpr = F.ceil((F.col("_n") + 1) * F.lit(1.0 - alpha)).cast("long")
        want = stats.select(
            group_col,
            F.when(kexpr <= F.col("_n"), kexpr).alias("_k"),
        )
        qtab = (
            ranked.join(F.broadcast(want), group_col)
            .filter(F.col("_rn") == F.col("_k"))
            .select(group_col, F.col("_r").alias("_q"))
        )
        joined = serve.join(F.broadcast(qtab), group_col, "left")
        qcol = F.col("_q")

    out = joined.select(
        id_col,
        *([group_col] if group_col else []),
        F.col(y_col).cast("double").alias("y"),
        F.col(yhat_col).cast("double").alias("yhat"),
        F.round(qcol, 6).alias("qhat"),
        F.round(F.col(yhat_col).cast("double") - qcol, 6).alias("lo"),
        F.round(F.col(yhat_col).cast("double") + qcol, 6).alias("hi"),
        (
            F.round(
                F.abs(F.col(y_col).cast("double") - F.col(yhat_col).cast("double")),
                6,
            )
            <= F.round(qcol, 6)
        ).alias("covered"),
    )
    return out
