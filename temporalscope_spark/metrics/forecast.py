"""Per-entity forecast evaluation: MAE / RMSE / MAPE / sMAPE / MASE.

The engine's shift/rolling operators produce leakage-safe forecasts and
baselines (reference target semantics: /root/reference/src/temporalscope/
target_shifters/single_step.py); this module scores them with the
standard point-forecast battery, per entity, including the
scale-invariant MASE (Hyndman & Koehler 2006) whose denominator is the
in-sample naive one-step error — the only member that stays defined when
actuals cross zero.

Plan shape (100 TB-safe): ONE entity-keyed lag window (for the naive
scale) sharing the entity exchange, then ONE map-side-combinable
``groupBy(entity)`` aggregation producing every metric's sufficient sums
— the output is entity-sized, the corpus is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.rolling import _time_expr


def forecast_eval(
    df: DataFrame,
    actual_col: str,
    forecast_col: str,
    time_col: str,
    id_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Score ``forecast_col`` against ``actual_col`` per entity.

    Rows with NULL actual or NULL forecast are excluded from the error
    sums; the MASE scale is the mean absolute one-step naive error
    ``mean |a_t − a_{t−1}|`` over consecutive SCORED rows in
    (time, tiebreak) order (the in-sample convention), so

        mase = mae / scale        (NULL when the scale is 0)
        mape = mean |a − f| / |a| over rows with a ≠ 0  (NULL if none)
        smape = mean 2·|a − f| / (|a| + |f|) over rows with a or f ≠ 0

    Output: one row per entity — ``(id, n, mae, rmse, mape, smape,
    mase)`` rounded to 6, ordered by id.
    """
    for c in [actual_col, forecast_col, time_col, id_col] + (
        [tiebreak_col] if tiebreak_col else []
    ):
        if c not in df.columns:
            raise DataFrameValidationError(f"forecast_eval: missing column {c!r}")

    t = _time_expr(df, time_col)
    a = F.col(actual_col).cast("double")
    f = F.col(forecast_col).cast("double")
    base = df.filter(a.isNotNull() & f.isNotNull() & t.isNotNull()).select(
        F.col(id_col).alias("id"),
        t.alias("_t"),
        a.alias("_a"),
        f.alias("_f"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    order = ["_t"] + (["_tb"] if tiebreak_col else [])
    w = Window.partitionBy("id").orderBy(*order)
    lagged = base.select(
        "id",
        "_a",
        "_f",
        F.lag("_a").over(w).alias("_pa"),
    )

    err = F.abs(F.col("_a") - F.col("_f"))
    aa = F.abs(F.col("_a"))
    af = F.abs(F.col("_f"))
    naive = F.abs(F.col("_a") - F.col("_pa"))
    agg = lagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(err).alias("_se"),
        F.sum(err * err).alias("_sq"),
        F.sum(F.when(F.col("_a") != 0, err / aa)).alias("_sp"),
        F.count(F.when(F.col("_a") != 0, F.lit(1))).alias("_np"),
        F.sum(
            F.when(aa + af > 0, F.lit(2.0) * err / (aa + af)).otherwise(F.lit(0.0))
        ).alias("_ss"),
        F.count(F.when(aa + af > 0, F.lit(1))).alias("_ns"),
        F.sum(naive).alias("_sn"),
        F.count(F.col("_pa")).alias("_nn"),
    )
    n = F.col("n").cast("double")
    mae = F.col("_se") / n
    scale = F.col("_sn") / F.col("_nn").cast("double")
    out = agg.select(
        "id",
        "n",
        F.round(mae, 6).alias("mae"),
        F.round(F.sqrt(F.col("_sq") / n), 6).alias("rmse"),
        F.round(
            F.when(F.col("_np") > 0, F.col("_sp") / F.col("_np").cast("double")), 6
        ).alias("mape"),
        F.round(
            F.when(F.col("_ns") > 0, F.col("_ss") / F.col("_ns").cast("double")), 6
        ).alias("smape"),
        F.round(
            F.when((F.col("_nn") > 0) & (scale > 0), mae / scale), 6
        ).alias("mase"),
    )
    return out.orderBy("id")
