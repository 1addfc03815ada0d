"""Validation operators (the reference's "query-planner guards"), fused.

Reference semantics (SURVEY.md §2.7):
  V1 is_dataframe_empty               core_utils.py:303-378
  V2 validate_column_numeric_or_datetime  core_utils.py:805-899
  V3 validate_feature_columns_numeric core_utils.py:978-1059
  V5 validate_temporal_ordering       core_utils.py:1062-1207
  A2 per-column null counts           core_utils.py:381-483

The reference runs ~6 eager passes per TimeFrame construction; here every
schema check is static and ALL data-touching checks fuse into at most ONE
Spark job (a single multi-aggregate), which is the scale-critical fix called
out in BASELINE.md's anti-pattern list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds, is_datetime_type, is_numeric_type
from temporalscope_spark.exceptions import DataFrameValidationError, TimeColumnError

# Reference: core_utils.py:102 — at most 1 distinct delta per entity when
# equidistant sampling is enforced.
MAX_UNIQUE_DELTAS = 1


def is_dataframe_empty(df: DataFrame | None) -> bool:
    """V1: no columns, or zero rows. None raises (core_utils.py:303-378)."""
    if df is None:
        raise ValueError("DataFrame cannot be None")
    if len(df.columns) == 0:
        return True
    return df.isEmpty()


def validate_dataframe_schema(
    df: DataFrame,
    time_col: str,
    target_col: str,
    exempt_cols: tuple[str, ...] = (),
) -> None:
    """V2+V3 as static schema checks — zero data passes.

    Every non-time, non-exempt column must be numeric; the time column must be
    numeric or datetime. ``exempt_cols`` carries the engine's non-numeric
    payload columns (``tokens: array<int32>``, id/source strings) that the
    reference never had (its categoricals had to be pre-encoded).
    """
    names = [f.name for f in df.schema.fields]
    for c in (time_col, target_col):
        if c not in names:
            raise DataFrameValidationError(f"Column '{c}' does not exist in the DataFrame")
    for f in df.schema.fields:
        if f.name == time_col:
            if not (is_numeric_type(f.dataType) or is_datetime_type(f.dataType)):
                raise TimeColumnError(
                    f"Column '{time_col}' must be numeric or datetime, "
                    f"got {f.dataType.simpleString()}"
                )
        elif f.name in exempt_cols:
            continue
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, T.NumericType
        ):
            # array<numeric> payloads (multi_target / tokens) are allowed
            continue
        elif not is_numeric_type(f.dataType):
            raise DataFrameValidationError(
                f"Column '{f.name}' must be numeric (got {f.dataType.simpleString()}); "
                "categorical columns must be pre-encoded"
            )


def null_counts(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """A2: per-column null (incl. NaN for doubles) counts — ONE fused job.

    The reference loops one aggregation per column (dataset_validator.py:386-394);
    here all columns aggregate in a single pass.
    """
    cols = cols or df.columns
    aggs = []
    for f in df.schema.fields:
        if f.name not in cols:
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            pred = c.isNull() | F.isnan(c)
        else:
            pred = c.isNull()
        aggs.append(F.sum(pred.cast("long")).alias(f.name))
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c] or 0) for c in cols}


def check_temporal_ordering(
    df: DataFrame,
    time_col: str,
    id_col: str | None = None,
    enforce_equidistant_sampling: bool = False,
) -> None:
    """V5: strict temporal ordering — the engine's zero-leakage gate.

    Reference: core_utils.py:1062-1207. Duplicate timestamps within an entity
    (or globally when no id_col) raise TimeColumnError; optionally each entity
    must have exactly one distinct inter-row delta (equidistant sampling).

    Scale shape: ONE job. Duplicate detection is a hash-aggregate on
    (id, time); the equidistance check is a window delta + per-entity
    ``count_distinct`` — both shuffle on the same id key, and AQE coalesces.
    At extreme scale swap count_distinct → approx_count_distinct with an
    exact re-check on violators (SURVEY.md A5 note).
    """
    keys = [id_col, time_col] if id_col else [time_col]
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1)
    if enforce_equidistant_sampling:
        if id_col:
            w = Window.partitionBy(id_col).orderBy(time_col)
        else:
            w = Window.orderBy(time_col)
        t_type = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
        t_num = epoch_seconds(F.col(time_col), t_type)
        delta = F.lead(t_num).over(w) - t_num
        deltas = df.select(*( [id_col] if id_col else [] ), delta.alias("_delta")).filter(
            F.col("_delta").isNotNull()
        )
        grouped = (
            deltas.groupBy(id_col).agg(F.count_distinct("_delta").alias("n"))
            if id_col
            else deltas.agg(F.count_distinct("_delta").alias("n"))
        )
        bad = grouped.filter(F.col("n") > MAX_UNIQUE_DELTAS)
        if not bad.isEmpty():
            raise TimeColumnError(
                "Non-equidistant sampling detected: more than "
                f"{MAX_UNIQUE_DELTAS} distinct time delta per entity"
            )
    if not dup.isEmpty():
        scope = f"within '{id_col}' groups" if id_col else "globally"
        raise TimeColumnError(f"Duplicate timestamps detected {scope} in column '{time_col}'")
