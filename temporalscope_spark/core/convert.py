"""Time-column conversions.

Reference semantics: /root/reference/src/temporalscope/core/core_utils.py
  - datetime → epoch numeric at µs/ms/ns (:486-683): µs/ms come back as
    DoubleType, ns as LongType (TimestampType is µs-precision, so ns must
    live as a long — core_utils.py:682).
  - any → datetime cascade (:686-802): direct cast, else string parse, else
    numeric-epoch interpretation; BooleanType rejected (:787).

The reference *discovers* types by attempted casts (eager passes over the
data); on Spark every dispatch here is a free static check against
``df.schema`` — zero data passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from temporalscope_spark.exceptions import TimeColumnError

VALID_TIME_UNITS = ("us", "ms", "ns", "s")


def _field(df: DataFrame, col: str) -> T.StructField:
    for f in df.schema.fields:
        if f.name == col:
            return f
    raise TimeColumnError(f"Column '{col}' does not exist in the DataFrame")


def epoch_seconds(col: Column, dt: T.DataType) -> Column:
    """Time column → double seconds since epoch, NTZ-safe.

    TIMESTAMP_NTZ (what plain parquet timestamps load as) is first cast to
    session-local TIMESTAMP (session TZ is pinned to UTC in session.py, so
    this is the identity on the wall-clock value); numerics pass through.
    """
    if isinstance(dt, T.TimestampNTZType):
        col = col.cast("timestamp")
        dt = T.TimestampType()
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(col).cast("double") / F.lit(1e6)
    if isinstance(dt, T.DateType):
        return F.unix_micros(col.cast("timestamp")).cast("double") / F.lit(1e6)
    return col.cast("double")


def is_numeric_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def is_datetime_type(dt: T.DataType) -> bool:
    return isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType))


def time_to_numeric(df: DataFrame, time_col: str, time_unit: str = "us") -> DataFrame:
    """Convert a datetime time column to numeric epoch (in-place replace).

    µs/ms/s → DoubleType, ns → LongType (overflow-safe), mirroring
    core_utils.py:569,615,682. Already-numeric columns pass through
    unchanged (early-return semantics of core_utils.py:561,674).
    """
    if time_unit not in VALID_TIME_UNITS:
        raise ValueError(f"Invalid time_unit '{time_unit}'. Must be one of {VALID_TIME_UNITS}")
    f = _field(df, time_col)
    if is_numeric_type(f.dataType):
        return df
    if not is_datetime_type(f.dataType):
        raise TimeColumnError(
            f"Column '{time_col}' must be numeric or datetime, got {f.dataType.simpleString()}"
        )
    c = F.col(time_col)
    if isinstance(f.dataType, (T.DateType, T.TimestampNTZType)):
        # NTZ (plain-parquet timestamps) → session-TZ timestamp; session TZ is
        # pinned to UTC in session.py so the wall-clock value is unchanged
        c = c.cast("timestamp")
    if time_unit == "us":
        expr: Column = F.unix_micros(c).cast("double")
    elif time_unit == "ms":
        expr = F.unix_millis(c).cast("double")
    elif time_unit == "s":
        expr = (F.unix_micros(c) / F.lit(1_000_000.0)).cast("double")
    else:  # ns — LongType lane, Spark timestamps are µs precision
        expr = (F.unix_micros(c) * F.lit(1000)).cast("long")
    return df.withColumn(time_col, expr)


def time_to_datetime(df: DataFrame, time_col: str, time_unit: str = "us") -> DataFrame:
    """Convert a numeric/string time column to TimestampType (in-place).

    Cascade mirrors core_utils.py:686-802: datetime passes through; string
    parses with ``to_timestamp``; numeric is interpreted as epoch in
    ``time_unit``; boolean rejected.
    """
    f = _field(df, time_col)
    dt = f.dataType
    if is_datetime_type(dt):
        if isinstance(dt, T.DateType):
            return df.withColumn(time_col, F.col(time_col).cast("timestamp"))
        return df
    if isinstance(dt, T.BooleanType):
        raise TimeColumnError(f"Column '{time_col}' is boolean; cannot convert to datetime")
    c = F.col(time_col)
    if isinstance(dt, T.StringType):
        return df.withColumn(time_col, F.to_timestamp(c))
    if is_numeric_type(dt):
        if time_unit == "us":
            expr = F.timestamp_micros(c.cast("long"))
        elif time_unit == "ms":
            expr = F.timestamp_millis(c.cast("long"))
        elif time_unit == "s":
            expr = F.timestamp_micros((c.cast("double") * 1_000_000).cast("long"))
        elif time_unit == "ns":
            expr = F.timestamp_micros((c.cast("long") / F.lit(1000)).cast("long"))
        else:
            raise ValueError(f"Invalid time_unit '{time_unit}'. Must be one of {VALID_TIME_UNITS}")
        return df.withColumn(time_col, expr)
    raise TimeColumnError(
        f"Column '{time_col}' of type {dt.simpleString()} cannot be converted to datetime"
    )


def validate_time_column_type(df: DataFrame, time_col: str) -> None:
    """Time column must be numeric or datetime (core_utils.py:805-899).

    Static schema check — the reference's try-cast probes become free here.
    """
    f = _field(df, time_col)
    if not (is_numeric_type(f.dataType) or is_datetime_type(f.dataType)):
        raise TimeColumnError(
            f"Column '{time_col}' must be numeric or datetime, got {f.dataType.simpleString()}"
        )


def convert_time_column(
    df: DataFrame, time_col: str, conversion_type: str | None, time_unit: str = "us"
) -> DataFrame:
    """Dispatcher mirroring validate_and_convert_time_column (core_utils.py:902-975)."""
    if conversion_type is None:
        validate_time_column_type(df, time_col)
        return df
    if conversion_type == "numeric":
        return time_to_numeric(df, time_col, time_unit)
    if conversion_type == "datetime":
        return time_to_datetime(df, time_col, time_unit)
    raise ValueError(
        f"Invalid conversion_type '{conversion_type}'. Must be one of 'numeric', 'datetime', or None"
    )
