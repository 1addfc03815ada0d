"""Distributed global row numbering / order statistics.

``Window.orderBy(t)`` with no partition key collapses to ONE task (Spark
warns ``WindowExec: No Partition Defined``) — unusable at 100 TB. Exact
global row numbers are computed with a quantile-bucket two-phase plan, all
DataFrame-side and with NO persisted intermediate:

  1. approximate quantiles of the primary order column define ``B`` bucket
     boundary VALUES (tiny driver array). Bucket assignment is then a pure
     deterministic comparison against literals — identical on every
     recomputation, unlike ``repartitionByRange``'s sampled partitioner;
  2. one hash-aggregate counts rows per bucket; the driver prefix-sums the
     ``B`` counts into offsets (broadcast back as a literal map);
  3. ``row_number() over (partition by bucket order by ...)`` + offset gives
     the exact global rank — a single parallel window per bucket.

Rows sharing the primary order value always land in one bucket (comparison
is on the value), so cross-bucket ordering is total. Cost: two lightweight
aggregate passes + one window shuffle. The reference instead materializes the
whole sorted time column on the driver
(/root/reference/src/temporalscope/partition/single_target/static/
sliding_window.py:378) — the anti-pattern this replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds

_BUCKET = "_rn_bucket"


def _numeric_order_expr(df: DataFrame, col: str) -> F.Column:
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[col]
    return epoch_seconds(F.col(col), dt)


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "_rn",
    num_buckets: int | None = None,
    materialize_input: bool = False,
) -> DataFrame:
    """Add a 1-based exact global row number ordered by ``order_cols``.

    The primary order column must be numeric/timestamp (bucket boundaries
    come from quantiles). Ties across ALL ``order_cols`` break arbitrarily
    but within one bucket; pass a unique key suffix for full determinism.

    ``materialize_input`` localCheckpoints ``df`` so the three passes
    (quantile probe, bucket counts, final window) read one materialized
    copy instead of re-evaluating the input plan per action. Opt in when
    the input is a DERIVED table (an aggregation, a narrow projection of
    an expensive pipeline); leave off when the input is a raw scan, where
    re-reading beats writing a copy.
    """
    if num_buckets is None:
        num_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if materialize_input:
        df = df.localCheckpoint()
    primary = order_cols[0]
    tnum = _numeric_order_expr(df, primary)
    probed = df.withColumn("_rn_t", tnum)

    probs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = (
        probed.stat.approxQuantile("_rn_t", probs, 0.001) if probs else []
    )
    # strictly increasing unique boundaries (quantiles may repeat on skew)
    bnds = sorted(set(boundaries))

    if bnds:
        barr = F.array(*[F.lit(float(b)) for b in bnds])
        bucket = F.aggregate(
            barr, F.lit(0), lambda acc, b: acc + (F.col("_rn_t") > b).cast("int")
        )
    else:
        bucket = F.lit(0)
    bucketed = probed.withColumn(_BUCKET, bucket)

    counts = {
        r[_BUCKET]: r["cnt"]
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        off = F.coalesce(F.element_at(mapping, F.col(_BUCKET)), F.lit(0))
    else:
        off = F.lit(0)

    w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    return (
        bucketed.withColumn(rn_col, (F.row_number().over(w) + off).cast("long"))
        .drop("_rn_t", _BUCKET)
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    num_buckets: int | None = None,
    materialize_input: bool = False,
) -> DataFrame:
    """Add exact global running sums ``{c}_cum`` ordered by ``order_cols``.

    Same quantile-bucket two-phase plan as :func:`with_global_row_number`,
    generalized from rank to SUM: per-bucket window cumsums run in parallel,
    then the driver prefix-sums one ``(bucket, partial)`` row per bucket and
    broadcasts the offsets back as literal maps. No single-partition window
    appears for any input size; the driver holds ``B × len(sum_cols)``
    numbers. The primary order column must be numeric/timestamp; rows tie
    within a bucket, so the running sum at each ROW depends on the full
    ``order_cols`` ordering — pass a unique key suffix for determinism when
    the leading columns tie.

    ``materialize_input``: same contract as
    :func:`with_global_row_number` — one localCheckpoint feeding the
    quantile probe, the per-bucket partial sums, and the final window.
    """
    if num_buckets is None:
        num_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if materialize_input:
        df = df.localCheckpoint()
    primary = order_cols[0]
    tnum = _numeric_order_expr(df, primary)
    probed = df.withColumn("_cs_t", tnum)

    probs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = (
        probed.stat.approxQuantile("_cs_t", probs, 0.001) if probs else []
    )
    bnds = sorted(set(boundaries))
    if bnds:
        barr = F.array(*[F.lit(float(b)) for b in bnds])
        bucket = F.aggregate(
            barr, F.lit(0), lambda acc, b: acc + (F.col("_cs_t") > b).cast("int")
        )
    else:
        bucket = F.lit(0)
    bucketed = probed.withColumn(_BUCKET, bucket)

    partials = (
        bucketed.groupBy(_BUCKET)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )
    # offsets keep the partials' own Python type (int stays int, so long
    # counts stay exact; doubles are exact to 2^53 anyway)
    offsets: dict[str, dict[int, float]] = {c: {} for c in sum_cols}
    acc = {c: 0 for c in sum_cols}
    for r in sorted(partials, key=lambda x: x[_BUCKET]):
        for c in sum_cols:
            offsets[c][r[_BUCKET]] = acc[c]
            acc[c] += r[c] or 0

    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed
    for c in sum_cols:
        if offsets[c]:
            mapping = F.create_map(
                *[F.lit(x) for kv in offsets[c].items() for x in kv]
            )
            off = F.coalesce(F.element_at(mapping, F.col(_BUCKET)), F.lit(0))
        else:
            off = F.lit(0)
        out = out.withColumn(f"{c}_cum", F.sum(c).over(w) + off)
    return out.drop("_cs_t", _BUCKET)


def order_statistics(
    df: DataFrame,
    order_cols: list[str],
    positions: list[int],
    num_buckets: int | None = None,
) -> dict[int, tuple]:
    """Exact values of ``order_cols`` at the given 1-based global positions.

    Collects only ``len(positions)`` rows to the driver — the scalable
    replacement for materializing a whole sorted column. Only
    ``order_cols`` matter, so the input is projected to them and
    materialized once: the quantile probe, the bucket counts, and the
    final collect read one narrow checkpointed copy instead of
    re-evaluating the full input plan three times.
    """
    wanted = sorted(set(positions))
    numbered = with_global_row_number(
        df.select(*order_cols), order_cols, "_rn", num_buckets,
        materialize_input=True,
    )
    rows = numbered.filter(F.col("_rn").isin(wanted)).select("_rn", *order_cols).collect()
    return {r["_rn"]: tuple(r[c] for c in order_cols) for r in rows}
