"""Structured Streaming variants of the temporal operators.

The reference has NO streaming surface (SURVEY.md §2.8) — its "sliding
window" is a batch dataset partitioner. These operators are the engine's
forward extension for continuously-arriving training data: the SAME
session/window semantics as the batch operators, expressed as streaming
aggregations with watermarks for late data. The batch/stream parity test
(tests/test_streaming.py) replays a static table through the streaming path
and asserts it matches the batch result — the correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_bounds(
    stream: DataFrame,
    time_col: str,
    id_col: str,
    gap_seconds: float,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization via ``F.session_window``.

    Emits one row per closed (entity, session): start/end/count. Late rows
    inside the watermark merge into their session; later ones are dropped —
    the streaming analogue of operators.sessionize.session_bounds.
    """
    t = F.col(time_col)
    if dict(stream.dtypes)[time_col] == "timestamp_ntz":
        stream = stream.withColumn(time_col, t.cast("timestamp"))
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(id_col, F.session_window(F.col(time_col), f"{gap_seconds} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            id_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_windowed_stats(
    stream: DataFrame,
    time_col: str,
    id_col: str,
    value_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with watermark:
    per (entity, window) count/mean/min/max of ``value_col``."""
    t = F.col(time_col)
    if dict(stream.dtypes)[time_col] == "timestamp_ntz":
        stream = stream.withColumn(time_col, t.cast("timestamp"))
    win = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(id_col, win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            id_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def replay_static_as_stream(
    spark, parquet_dir: str, schema, query_builder, out_table: str
):
    """Test/backfill helper: replay a static parquet dir through the
    streaming pipeline with an availableNow trigger into a memory sink;
    returns the materialized result DataFrame (batch/stream parity check)."""
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    out = query_builder(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)
