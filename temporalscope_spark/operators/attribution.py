"""Marketing-style conversion attribution over an event stream.

The reference's as-of machinery (rebuilt Spark-first in
``operators/asof.py``; reference join semantics at /root/reference/src/
temporalscope/target_shifters/single_step.py) answers "what was true at
this row's time?"; attribution is that question productized: for every
conversion event, WHICH earlier touch event gets the credit — the
last-touch model (latest qualifying touch at or before the conversion)
or the first-touch model (earliest touch inside the lookback window).

Plan shape (100 TB-safe): touches first collapse to ONE row per
(entity, timestamp) via a map-side-combinable max-struct argmax on the
tiebreak key — this makes the downstream pick deterministic AND bounds
the union fed to the as-of join; the join itself is
:func:`operators.asof.asof_join` (entity-keyed union window — one
exchange, no range explosion). First-touch is the SAME backward/forward
machinery on a window-shifted left time: the earliest touch in
``[t_conv − W, t_conv]`` is the forward as-of match of ``t_conv − W``
with tolerance ``W``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.core.convert import epoch_seconds
from temporalscope_spark.exceptions import DataFrameValidationError


def attribution(
    df: DataFrame,
    time_col: str,
    id_col: str,
    type_col: str,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    tiebreak_col: str,
    window_seconds: float | None = None,
    model: str = "last",
) -> DataFrame:
    """Attribute each conversion event to one touch event.

    ``model='last'``: the touch with the greatest timestamp ≤ the
    conversion's (within ``window_seconds`` when given). ``model=
    'first'``: the earliest touch in ``[t_conv − window, t_conv]``
    (``window_seconds`` required — "first touch ever" is unbounded
    state). Simultaneous touches at one timestamp resolve to the
    greatest ``tiebreak_col`` value — deterministically, in the
    pre-join reduction, not in window luck. Conversions with no
    qualifying touch keep NULL attribution (they are still rows — the
    unattributed-share metric needs them).

    Output: ``(conversion_id, entity, conv_t, attr_type, attr_id,
    touch_t, gap_seconds)`` — times as double epoch seconds, gap
    rounded to 6, ordered by conversion_id.
    """
    if model not in {"last", "first"}:
        raise DataFrameValidationError("attribution: model must be last|first")
    if model == "first" and window_seconds is None:
        raise DataFrameValidationError(
            "attribution: first-touch requires window_seconds"
        )
    if set(conversion_types) & set(touch_types):
        raise DataFrameValidationError(
            "attribution: conversion and touch types must be disjoint"
        )
    for c in (time_col, id_col, type_col, tiebreak_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"attribution: missing column {c!r}")

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    base = df.filter(t.isNotNull()).select(
        F.col(id_col).alias("entity"),
        t.alias("_t"),
        F.col(type_col).alias("_ty"),
        F.col(tiebreak_col).alias("_k"),
    )
    conv = base.filter(F.col("_ty").isin(list(conversion_types))).select(
        F.col("_k").alias("conversion_id"),
        "entity",
        F.col("_t").alias("conv_t"),
    )
    # deterministic per-(entity, t) touch: greatest tiebreak wins — ONE
    # map-side-combinable argmax, also shrinking the as-of union
    touch = (
        base.filter(F.col("_ty").isin(list(touch_types)))
        .groupBy("entity", F.col("_t").alias("touch_t"))
        .agg(
            F.max(F.struct(F.col("_k").alias("k"), F.col("_ty").alias("ty"))).alias(
                "_m"
            )
        )
        .select(
            "entity",
            "touch_t",
            F.col("_m.ty").alias("attr_type"),
            F.col("_m.k").alias("attr_id"),
        )
    )

    from temporalscope_spark.operators.asof import asof_join

    if model == "last":
        left = conv.withColumn("_jt", F.col("conv_t"))
        direction = "backward"
    else:
        left = conv.withColumn(
            "_jt", F.col("conv_t") - F.lit(float(window_seconds))
        )
        direction = "forward"

    joined = asof_join(
        left,
        touch.withColumn("_jt", F.col("touch_t")),
        on="entity",
        left_time="_jt",
        right_time="_jt",
        value_cols=["attr_type", "attr_id", "touch_t"],
        tolerance=window_seconds,
        direction=direction,
    )
    out = joined.select(
        "conversion_id",
        "entity",
        "conv_t",
        "attr_type",
        "attr_id",
        "touch_t",
        F.round(F.col("conv_t") - F.col("touch_t"), 6).alias("gap_seconds"),
    )
    return out.orderBy("conversion_id")
