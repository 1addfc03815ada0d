"""Per-entity time-grid operators: resampling and gap interpolation.

The reference validates mixed-frequency/non-equidistant series
(/root/reference/src/temporalscope/core/core_utils.py:1062-1207) but offers
no way to REGULARIZE them; a point-in-time engine needs both directions:

  * ``resample`` — downsample to a fixed step: one hash aggregate keyed on
    (entity, floor(time/step)); at 10^12 scale this is the canonical partial
    (map-side-combined) aggregation — no window, no sort.
  * ``interpolate_linear`` — fill NULL values by linear interpolation between
    the nearest non-null neighbors within the entity; everything is two
    ignore-nulls window lookups (previous / next non-null as (time, value)
    structs) sharing one entity partitioning — a single exchange, zero on a
    pre-clustered layout.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds
from temporalscope_spark.exceptions import DataFrameValidationError

_AGGS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    # first/last = earliest/latest NON-NULL value by event time (pandas
    # resample semantics); min/max over (t, v) structs skips nulls, whereas
    # min_by(v, t) would return the earliest row's value even when NULL
    "first": lambda c: F.min(
        F.when(c.isNotNull(), F.struct(F.col("__t").alias("t"), c.alias("v")))
    )["v"],
    "last": lambda c: F.max(
        F.when(c.isNotNull(), F.struct(F.col("__t").alias("t"), c.alias("v")))
    )["v"],
}


def _time_expr(df: DataFrame, time_col: str) -> tuple[Column, T.DataType]:
    for f in df.schema.fields:
        if f.name == time_col:
            return epoch_seconds(F.col(time_col), f.dataType), f.dataType
    raise DataFrameValidationError(f"Column '{time_col}' does not exist in the DataFrame")


def resample(
    df: DataFrame,
    time_col: str,
    step_seconds: float,
    value_aggs: Mapping[str, Sequence[str]],
    id_col: str | None = "doc_id",
    origin: float = 0.0,
) -> DataFrame:
    """Downsample to a fixed time grid: one row per (entity, bucket).

    Buckets are ``[origin + k·step, origin + (k+1)·step)``; the output
    ``bucket_start`` column is the bucket's left edge in epoch seconds
    (double — type-stable across timestamp/numeric time columns). Aggregates
    named ``{col}_{agg}``; ``first``/``last`` are time-ordered (min_by/max_by
    on the event time), plus ``n_rows`` per bucket.

    Physical shape: ONE hash aggregate with map-side partial combine — the
    cheapest possible reduction at scale; no window, no sort, no skew
    sensitivity beyond the entity key itself.
    """
    if step_seconds <= 0:
        raise DataFrameValidationError("step_seconds must be > 0")
    bad = [a for aggs in value_aggs.values() for a in aggs if a not in _AGGS]
    if bad:
        raise DataFrameValidationError(f"Unsupported aggs {bad}; supported: {sorted(_AGGS)}")

    t, _ = _time_expr(df, time_col)
    out = df.withColumn("__t", t)
    # bucket index on an exact integer-µs axis: double division puts rows
    # exactly on a bucket edge into the previous bucket when step is not
    # binary-representable (0.3/0.1 -> 2.999...); integer floor-div is exact
    step_us = max(1, int(round(float(step_seconds) * 1_000_000)))
    origin_us = int(round(float(origin) * 1_000_000))
    t_us = F.round(F.col("__t") * F.lit(1_000_000.0)).cast("long")
    idx = F.floor((t_us - F.lit(origin_us)) / F.lit(step_us)).cast("long")
    bucket = (
        (idx * F.lit(step_us) + F.lit(origin_us)).cast("double") / F.lit(1e6)
    ).alias("bucket_start")

    keys = ([F.col(id_col)] if id_col else []) + [bucket]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, fns in value_aggs.items():
        for a in fns:
            aggs.append(_AGGS[a](F.col(c)).alias(f"{c}_{a}"))
    return out.groupBy(*keys).agg(*aggs)


def interpolate_linear(
    df: DataFrame,
    time_col: str,
    value_col: str,
    id_col: str | None = "doc_id",
    out_col: str | None = None,
    extrapolate: str = "null",
) -> DataFrame:
    """Linearly interpolate NULL ``value_col`` entries between the nearest
    non-null neighbors within each entity (time-ordered).

    ``out_col`` (default ``{value}_interp``):
      * non-null rows keep their value;
      * interior nulls get ``prev + (next - prev)·(t - t_prev)/(t_next - t_prev)``;
      * edge nulls (no neighbor on one side): ``extrapolate='null'`` leaves
        NULL, ``'nearest'`` copies the single available neighbor.

    Both neighbor lookups are ignore-nulls window expressions over the SAME
    (entity, time) partitioning — one exchange total.
    """
    if extrapolate not in ("null", "nearest"):
        raise DataFrameValidationError("extrapolate must be 'null' or 'nearest'")
    out_col = out_col or f"{value_col}_interp"
    t, _ = _time_expr(df, time_col)
    out = df.withColumn("__t", t)

    w = Window.orderBy("__t")
    if id_col is not None:
        w = w.partitionBy(id_col)
    v = F.col(value_col).cast("double")
    obs = F.when(v.isNotNull(), F.struct(F.col("__t").alias("t"), v.alias("v")))
    prev = F.last(obs, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, -1))
    nxt = F.first(obs, ignorenulls=True).over(w.rowsBetween(1, Window.unboundedFollowing))

    # try_divide: under ANSI mode (Spark 4 default) a plain x/0 THROWS, and
    # t_next == t_prev happens whenever the null row's nearest neighbors
    # share its timestamp (dup-timestamp gate bypassed)
    frac = F.try_divide(F.col("__t") - prev["t"], nxt["t"] - prev["t"])
    # ...then the NULL frac falls back to the midpoint of the two neighbors
    # instead of silently leaving the gap unfilled
    interp = F.coalesce(
        prev["v"] + (nxt["v"] - prev["v"]) * frac,
        (prev["v"] + nxt["v"]) / F.lit(2.0),
    )
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(prev.isNotNull() & nxt.isNotNull(), interp).otherwise(
            F.coalesce(prev["v"], nxt["v"]) if extrapolate == "nearest" else F.lit(None)
        )
    )
    return out.withColumn(out_col, filled).drop("__t")
