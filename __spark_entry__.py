"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 run
over /root/testdata parquet; ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL. Column names/aliases match exactly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: sliding-window partition + target-shift feature pass (W3 + W1)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: bucket `events` into sliding windows, then run the
    leakage-safe target shift per user inside each bucket."""
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
    from temporalscope_spark.operators.shift import shift_target

    events = _t(spark, "/root/testdata/sf0.001", "events")
    tf = TemporalFrame(
        events,
        time_col="ts",
        target_col="value",
        id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"),
        sort=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    labeled = part.with_bucket_labels()
    shifted = shift_target(
        labeled, time_col="ts", target_col="value", n_lags=1, id_col="user_id",
        check_empty=False,
    )
    return shifted.select(
        "event_id", "user_id", "ts", "bucket", "split", "value",
        F.col("value_shift_1").alias("target"),
    )


# --------------------------------------------------------------------------
# per-operator queries + DuckDB oracles
# --------------------------------------------------------------------------

def q_target_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.shift import shift_target

    events = _t(spark, sf_dir, "events")
    out = shift_target(events, "ts", "value", n_lags=1, id_col="user_id")
    return out.select("event_id", "user_id", "value", F.col("value_shift_1").alias("value_shift_1"))


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    out = lag_features(events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True)
    return out.select("event_id", "user_id", "value_lag_1", "value_lag_2")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.sessionize import sessionize

    events = _t(spark, sf_dir, "events")
    out = sessionize(events, "ts", "user_id", gap=3600.0)
    return out.select("event_id", "user_id", F.col("session_id").cast("long").alias("session_id"))


def q_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.sessionize import session_bounds

    events = _t(spark, sf_dir, "events")
    out = session_bounds(events, "ts", "user_id", gap=3600.0)
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_window_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.plans.rownum import with_global_row_number

    events = _t(spark, sf_dir, "events")
    numbered = with_global_row_number(events, ["ts"], "_rn")
    return (
        numbered.withColumn("bucket", F.floor((F.col("_rn") - 1) / F.lit(1000)).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["last_price"],
    )
    return out.select("event_id", "user_id", "last_price")


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.asof import forward_fill

    events = _t(spark, sf_dir, "events").withColumn(
        "value_ff",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    out = forward_fill(events, "ts", ["value_ff"], id_col="user_id")
    return out.select("event_id", "user_id", "value_ff")


def q_validation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.avg("value").alias("avg_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def q_dup_timestamp_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") > 1)
        .select("user_id", "ts", "n")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "target_shift": q_target_shift,
        "lag_features": q_lag_features,
        "sessionize": q_sessionize,
        "session_bounds": q_session_bounds,
        "window_buckets": q_window_buckets,
        "asof_join": q_asof_join,
        "forward_fill": q_forward_fill,
        "validation_stats": q_validation_stats,
        "dup_timestamp_check": q_dup_timestamp_check,
    }


def oracle_sql() -> dict[str, str]:
    session_expr = (
        "SUM(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 3600 "
        "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    sessionized = (
        "SELECT event_id, user_id, ts, "
        f"CAST({session_expr} AS BIGINT) AS session_id "
        "FROM (SELECT event_id, user_id, ts, "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events)"
    )
    return {
        "target_shift": """
            SELECT event_id, user_id, value, value_shift_1 FROM (
                SELECT event_id, user_id, value,
                       LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_shift_1
                FROM events
            ) WHERE value_shift_1 IS NOT NULL
        """,
        "lag_features": """
            SELECT event_id, user_id, value_lag_1, value_lag_2 FROM (
                SELECT event_id, user_id,
                       LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag_1,
                       LAG(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag_2
                FROM events
            ) WHERE value_lag_1 IS NOT NULL AND value_lag_2 IS NOT NULL
        """,
        "sessionize": f"SELECT event_id, user_id, session_id FROM ({sessionized})",
        "session_bounds": f"""
            SELECT user_id, session_id,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM ({sessionized})
            GROUP BY user_id, session_id
        """,
        "window_buckets": """
            SELECT CAST(FLOOR((rn - 1) / 1000) AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts
            FROM (SELECT ts, ROW_NUMBER() OVER (ORDER BY ts) AS rn FROM events)
            GROUP BY 1
        """,
        "asof_join": """
            WITH r AS (
                SELECT o_custkey AS user_id, o_orderdate,
                       MAX(o_totalprice) AS last_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, r.last_price
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
        """,
        "forward_fill": """
            SELECT event_id, user_id,
                   LAST_VALUE(value_n IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value_ff
            FROM (SELECT event_id, user_id, ts,
                         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n
                  FROM events)
        """,
        "validation_stats": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   AVG(value) AS avg_value,
                   MIN(ts) AS min_ts, MAX(ts) AS max_ts
            FROM events
        """,
        "dup_timestamp_check": """
            SELECT user_id, ts, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, ts HAVING COUNT(*) > 1
        """,
    }
