"""Gap-based sessionization — the W2 (adjacent-delta) derivative the north
rule names.

Reference primitive: adjacent time delta via shift
(/root/reference/src/temporalscope/core/core_utils.py:1177-1203 — deltas are
used there only to validate equidistance; the engine generalizes them to
session assignment, per BASELINE.json north_rule "sessionize").

Spark shape: classic gap-and-island in ONE window pass per entity —
``delta = t - lag(t)``; ``is_new = delta is null or delta > gap``;
``session_seq = sum(is_new) over (partition id order t)``. Both window
expressions share one Window spec → one sort, one shuffle on the entity key.

Cross-checkable against the built-in ``F.session_window`` aggregation (which
works on static frames too); the batch analytic version keeps every row with
its session id, which session_window's tumbling aggregation does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds as _as_seconds


def sessionize(
    df: DataFrame,
    time_col: str,
    id_col: str,
    gap: float,
    session_col: str = "session_id",
    delta_col: str | None = None,
) -> DataFrame:
    """Assign a per-entity session sequence number (1-based).

    ``gap`` is in seconds for timestamp columns, in raw units for numeric
    time. A new session starts when the gap since the previous event is
    strictly greater than ``gap`` (first event always starts session 1).
    ``session_col`` = per-entity session index; rows keep their identity.
    """
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    w = Window.partitionBy(id_col).orderBy(time_col)
    t = _as_seconds(F.col(time_col), dt)
    delta = t - F.lag(t).over(w)
    is_new = F.when(delta.isNull() | (delta > gap), 1).otherwise(0)
    out = df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    if delta_col:
        out = out.withColumn(delta_col, delta)
    return out


def session_bounds(
    df: DataFrame,
    time_col: str,
    id_col: str,
    gap: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Aggregate sessionized rows to one row per (entity, session):
    start/end time + event count. Reuses the sessionize shuffle key, so the
    groupBy is a map-side-combinable hash aggregate on already-clustered data.
    """
    s = sessionize(df, time_col, id_col, gap, session_col)
    return s.groupBy(id_col, session_col).agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_builtin(
    df: DataFrame,
    time_col: str,
    id_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Idiomatic cross-check: ``F.session_window`` aggregation on a static
    frame — yields (id, window.start, window.end, n_events) per session.
    """
    return (
        df.groupBy(id_col, F.session_window(F.col(time_col), f"{gap_seconds} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            id_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
