"""Scan-parallelism floor for compute-bound per-row stages.

A stage whose per-row CPU dwarfs its per-row bytes (interpreted HOF
folds, per-row md5 draws, in-row DP) should never be pinned to fewer
tasks than the session has slots — but a small input (one parquet file /
one row group) plans exactly one scan task, serializing the whole stage.
``spread`` round-robins the rows across ``defaultParallelism`` tasks
ONLY when the input has fewer partitions than that: at scale it is a
no-op (the scan already yields thousands of splits), locally it unlocks
the other N-1 cores for ~one exchange of the (small) payload.

The trade is guide §8's: move cheap bytes once so expensive compute
balances. Apply it to stages where per-row work dominates; do NOT apply
it upstream of aggregations whose doubles are compared unrounded
(repartitioning changes double-sum merge order at the ~1e-15 level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the session's task slots when (and only
    when) it has fewer partitions than ``defaultParallelism``.

    Delegates to the dedup module's anti-straggler helper so the
    partition-count probe stays memoized per analyzed plan (one RDD
    conversion per distinct input, not one per operator call)."""
    from temporalscope_spark.operators.dedup import _parallelize_before_explode

    return _parallelize_before_explode(df)
