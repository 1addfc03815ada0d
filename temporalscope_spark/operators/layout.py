"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A 100-TB table is pruned or it is scanned. Range-partitioning on ONE
column gives min/max pruning on that column only; interleaving the bits
of SEVERAL columns into one Morton key and range-partitioning on the
key gives every file a small hyper-rectangle of the combined space, so
min/max file statistics prune on ANY of the interleaved columns (the
same layout idea behind Delta Lake's ``OPTIMIZE ZORDER BY`` and
Iceberg's z-ordered rewrites; Morton 1966).

Design:

* ``zorder_key`` is EXPRESSION-ONLY given the column bounds: each
  column is affinely mapped to ``[0, 2^bits)`` and the bit-interleave
  is an unrolled sum of ``((x >> b) & 1) << (b*k + j)`` terms —
  ``bits × k`` integer ops inside whole-stage codegen, no UDF.
* Bounds come from the caller or from ONE min/max aggregation (a
  k-column fused agg; only 2k doubles reach the driver and they enter
  the plan as literals).
* ``zorder_layout`` = ``repartitionByRange`` on the key: one range
  shuffle, the write-side exchange any layout rewrite needs anyway.
  Skew caveat: heavily duplicated points land in one key; pass a
  higher ``bits`` or salt downstream if a single cell exceeds a
  partition.
* NULL in any interleaved column propagates to a NULL key (sorts
  first in the range partitioner — the usual "nulls bucket" file).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _check(df: DataFrame, cols: list[str], bits: int) -> None:
    if not cols or len(cols) < 2:
        raise DataFrameValidationError("zorder: need at least 2 columns")
    if bits < 1 or bits * len(cols) > 62:
        raise DataFrameValidationError(
            f"zorder: bits*len(cols) must be in [len(cols), 62], got "
            f"{bits} * {len(cols)}"
        )
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"zorder: missing columns {missing}")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per column via ONE fused aggregation — 2k doubles to
    the driver, entering downstream plans as literals."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).first()
    return {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}


def _scaled(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Affine map to [0, 2^bits - 1] as a long; constant column -> 0."""
    top = float((1 << bits) - 1)
    if mx <= mn:
        return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    scaled = F.floor(
        (col.cast("double") - F.lit(float(mn)))
        * F.lit(top)
        / F.lit(float(mx) - float(mn))
    ).cast("long")
    # least/greatest SKIP nulls in Spark — gate explicitly so a NULL
    # input yields a NULL key instead of clamping to 0
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(int(top)))
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Morton (Z-order) key of ``cols`` as ``out_col``.

    Bit ``b`` of scaled column ``j`` lands at position ``b*k + j`` of
    the key (LSB-first round-robin interleave), so the key's high bits
    split every dimension equally — the locality property file-level
    min/max pruning relies on.
    """
    _check(df, cols, bits)
    if bounds is None:
        bounds = column_bounds(df, cols)
    k = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = bounds[c]
        if mn is None or mx is None:  # all-NULL column: key is NULL
            return df.withColumn(out_col, F.lit(None).cast("long"))
        x = _scaled(F.col(c), mn, mx, bits)
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(x, b).bitwiseAND(F.lit(1)), b * k + j
            ).cast("long")
    return df.withColumn(out_col, key)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Range-partition the frame by its Morton key (the layout rewrite:
    follow with a parquet write). One range exchange; the key column is
    kept so file statistics can be audited."""
    keyed = zorder_key(df, cols, bits=bits, bounds=bounds)
    if num_partitions is None:
        return keyed.repartitionByRange("zkey")
    return keyed.repartitionByRange(num_partitions, "zkey")
