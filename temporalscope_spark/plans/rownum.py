"""Distributed global row numbering / order statistics.

``Window.orderBy(t)`` with no partition key collapses to ONE task (Spark
warns ``WindowExec: No Partition Defined``) — unusable at 100 TB. This module
computes exact global row numbers with the classic two-pass range-partition
technique, all DataFrame-side:

  1. range-partition + locally sort by the order keys (``repartitionByRange``
     gives non-overlapping sorted ranges across partitions);
  2. count rows per physical partition (tiny aggregate, one row per
     partition) and prefix-sum the counts on the driver;
  3. broadcast-join the offsets back and add the intra-partition
     ``row_number`` (now partitioned by ``spark_partition_id`` — parallel).

Cost: one extra shuffle + a ~P-row driver collect, versus the reference's
full ``collect().to_numpy()`` of the entire time column
(/root/reference/src/temporalscope/partition/single_target/static/
sliding_window.py:378 — the anti-pattern this replaces).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@contextmanager
def _numbered(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str,
    num_range_partitions: int | None,
) -> Iterator[DataFrame]:
    """Yield a row-numbered DataFrame; unpersist the pinned intermediate on exit.

    The range-partitioned sorted intermediate must be persisted so the
    per-partition counts (pass 2) and the numbering join (pass 3) observe the
    exact same partitioning — range partitioner boundaries come from sampling
    and are not guaranteed stable across recomputations.
    """
    if num_range_partitions:
        part = df.repartitionByRange(num_range_partitions, *order_cols)
    else:
        part = df.repartitionByRange(*order_cols)
    part = part.sortWithinPartitions(*order_cols).withColumn("_pid", F.spark_partition_id())
    part = part.persist()
    try:
        counts = {
            r["_pid"]: r["cnt"]
            for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        }
        offsets, acc = [], 0
        for pid in sorted(counts):
            offsets.append((pid, acc))
            acc += counts[pid]
        offsets_df = df.sparkSession.createDataFrame(offsets or [(0, 0)], ["_pid", "_offset"])
        w = Window.partitionBy("_pid").orderBy(*order_cols)
        yield (
            part.join(F.broadcast(offsets_df), "_pid")
            .withColumn(rn_col, F.row_number().over(w) + F.col("_offset"))
            .drop("_pid", "_offset")
        )
    finally:
        part.unpersist()


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "_rn",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based exact global row number ``rn_col`` ordered by ``order_cols``.

    The returned plan references a persisted intermediate that stays cached
    for the session (Spark evicts LRU); callers doing one-shot extraction
    should prefer :func:`order_statistics`. Ties break deterministically only
    if ``order_cols`` is a unique key.
    """
    if num_range_partitions:
        part = df.repartitionByRange(num_range_partitions, *order_cols)
    else:
        part = df.repartitionByRange(*order_cols)
    part = part.sortWithinPartitions(*order_cols).withColumn("_pid", F.spark_partition_id())
    part = part.persist()
    counts = {
        r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    offsets_df = df.sparkSession.createDataFrame(offsets or [(0, 0)], ["_pid", "_offset"])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.join(F.broadcast(offsets_df), "_pid")
        .withColumn(rn_col, F.row_number().over(w) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def order_statistics(
    df: DataFrame,
    order_cols: list[str],
    positions: list[int],
    num_range_partitions: int | None = None,
) -> dict[int, tuple]:
    """Exact values of ``order_cols`` at the given 1-based global positions.

    Collects only ``len(positions)`` rows to the driver — the scalable
    replacement for materializing a whole sorted column.
    """
    wanted = sorted(set(positions))
    with _numbered(df, order_cols, "_rn", num_range_partitions) as numbered:
        rows = numbered.filter(F.col("_rn").isin(wanted)).select("_rn", *order_cols).collect()
    return {r["_rn"]: tuple(r[c] for c in order_cols) for r in rows}
