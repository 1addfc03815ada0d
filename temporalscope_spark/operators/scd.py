"""Slowly-changing-dimension Type-2 history — collapse a change-event
stream into effective-dated rows (Kimball's SCD2), the warehouse twin of
the engine's as-of joins: :func:`operators.asof.asof_join` READS
point-in-time state; this BUILDS the versioned table it reads from.

Given per-entity observations ordered by time, consecutive rows whose
tracked attributes are unchanged collapse into one validity interval:

    (key, attrs..., valid_from, valid_to, is_current)

with half-open ``[valid_from, valid_to)`` intervals (``valid_to`` NULL
on the current row — chain them straight into ``range_join``).

Plan shape (100 TB-safe): everything is windows PARTITIONED BY the
entity key — change detection is a null-safe lag comparison, interval
ids a per-entity cumulative sum, interval bounds one groupBy, and the
closing ``valid_to`` a per-entity lead — four narrow stages over ONE
entity-keyed exchange (Spark reuses the partitioning), no global
windows, a million entities parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def scd2_history(
    df: DataFrame,
    key_col: str,
    time_col: str,
    attr_cols,
    order_col: str | None = None,
) -> DataFrame:
    """Build the SCD2 table. ``attr_cols`` are the tracked attributes
    (null-safe comparison: NULL→NULL is "no change"); ties on
    ``time_col`` break by ``order_col`` when given (pass the ingestion
    sequence for determinism — with ties and no tiebreak the collapsed
    history depends on window luck, so ties WITHOUT ``order_col``
    raise). Rows with NULL key or time are rejected (raise) — a
    versioned row without identity or effectivity is meaningless.
    """
    attrs = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    if not attrs:
        raise DataFrameValidationError("scd2_history: attr_cols must be non-empty")
    need = [key_col, time_col, *attrs] + ([order_col] if order_col else [])
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"scd2_history: missing columns {missing}")
    order = [F.col(time_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.lag(F.col(time_col)).over(w).isNull()
    # guards ride INSIDE the used flag expression (prune-proof — the
    # did_estimate convention): a dropped-then-unused guard column is
    # silently eliminated by Catalyst
    null_guard = F.when(
        F.col(key_col).isNull() | F.col(time_col).isNull(),
        F.raise_error(
            F.lit("scd2_history: NULL key or time — clean the stream first")
        ).cast("long"),
    ).otherwise(F.lit(0))
    flag = (first | changed).cast("long") + null_guard
    if order_col is None:
        dup = F.count(F.lit(1)).over(Window.partitionBy(key_col, time_col))
        flag = flag + F.when(
            dup > 1,
            F.raise_error(
                F.lit(
                    "scd2_history: tied timestamps without order_col — "
                    "pass the ingestion sequence for a deterministic history"
                )
            ).cast("long"),
        ).otherwise(F.lit(0))
    vid = F.sum(flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn("_vid", vid)
    per = marked.groupBy(key_col, "_vid").agg(
        F.min(time_col).alias("valid_from"),
        *[F.min_by(a, F.struct(*order)).alias(a) for a in attrs],
        F.count(F.lit(1)).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_vid")
    out = per.withColumn("valid_to", F.lead("valid_from").over(w2))
    return out.select(
        key_col,
        *attrs,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "n_rows",
    )
