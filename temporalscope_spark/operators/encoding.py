"""Categorical encoders — count/frequency encoding, top-K one-hot,
rare-category collapse, and hashed feature crosses: the encoder family a
tabular feature pipeline applies to id-like and categorical columns
before model fitting (the supervised member, target encoding, lives in
``operators/rolling.py``'s strictly-past lane).

Scale shape shared by every encoder here: the category statistics table
is AGGREGATED first (map-side combinable, C rows for C distinct
categories) and then rejoined to the corpus as the small build side —
the fat side is never shuffled. ``count_encode``/``rare_collapse``
broadcast that C-row table by default (C = distinct categories; at
vocabulary-sized C pass ``broadcast_counts=False`` and let AQE pick the
join); ``one_hot_top_k`` and :func:`hash_cross` are expression-only
(literals / pure hash), so they fold into whatever scan already reads
the columns. Hash crosses use the first 8 hex chars of ``md5`` — the
engine's portable hash (``operators/dsir.py``) with an exact DuckDB
twin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

#: NULL categories are encoded via this sentinel so they join/count like
#: any other level (sklearn's ``handle_unknown`` has no NULL story; a
#: real pipeline needs one).
NULL_TOKEN = "__null__"


def _cat(col: str):
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_TOKEN))


def count_encode(
    df: DataFrame,
    col: str,
    normalize: bool = False,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Append ``{col}_count`` (occurrences of the row's category) or,
    with ``normalize``, ``{col}_freq`` (share of rows, rounded 6).

    One map-side-combined aggregation builds the C-row count table; the
    corpus then takes a broadcast hash join against it — no fat-side
    exchange (set ``broadcast_counts=False`` for vocabulary-sized C).
    NULL categories count as their own level.
    """
    if col not in df.columns:
        raise DataFrameValidationError(f"count_encode: missing column {col!r}")
    total = df.count() if normalize else None
    counts = (
        df.groupBy(_cat(col).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if normalize:
        counts = counts.select(
            "_k", F.round(F.col("_n") / F.lit(float(total)), 6).alias("_n")
        )
    if broadcast_counts:
        counts = F.broadcast(counts)
    out_col = f"{col}_freq" if normalize else f"{col}_count"
    return (
        df.withColumn("_k", _cat(col))
        .join(counts, "_k", "left")
        .withColumnRenamed("_n", out_col)
        .drop("_k")
    )


def fit_top_categories(df: DataFrame, col: str, k: int) -> list[str]:
    """Top-``k`` categories by (count desc, value asc) — the
    deterministic tie-break makes the fitted list engine-replayable.
    NULLs participate as :data:`NULL_TOKEN`."""
    if k < 1:
        raise DataFrameValidationError("fit_top_categories: k must be >= 1")
    if col not in df.columns:
        raise DataFrameValidationError(f"fit_top_categories: missing column {col!r}")
    rows = (
        df.groupBy(_cat(col).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_k"))
        .limit(k)
        .collect()
    )
    return [r["_k"] for r in rows]


def one_hot_top_k(
    df: DataFrame,
    col: str,
    k: int = 16,
    categories: Sequence[str] | None = None,
) -> DataFrame:
    """Append indicator columns ``{col}_oh_1..m`` for the top-``k``
    categories (rank order — stable column NAMES regardless of the data's
    values) plus ``{col}_oh_other`` for everything else.

    Pass pre-fit ``categories`` (from :func:`fit_top_categories` on the
    train slice) for train→serve column stability. The transform is
    expression-only: m+1 literal comparisons, no join, no shuffle.
    """
    cats = list(categories) if categories is not None else fit_top_categories(df, col, k)
    if not cats:
        raise DataFrameValidationError("one_hot_top_k: empty category list")
    v = _cat(col)
    out = df
    for i, c in enumerate(cats, start=1):
        out = out.withColumn(f"{col}_oh_{i}", (v == F.lit(c)).cast("int"))
    other = ~v.isin([str(c) for c in cats])
    return out.withColumn(f"{col}_oh_other", other.cast("int"))


def rare_collapse(
    df: DataFrame,
    col: str,
    min_count: int = 2,
    other: str = "__other__",
    broadcast_keep: bool = True,
) -> DataFrame:
    """Append ``{col}_rc``: the category itself when it occurs at least
    ``min_count`` times, else ``other`` — the long-tail guard that keeps
    downstream encoders/contingency tables bounded.

    The KEEP set (categories ≥ min_count — at most corpus/min_count
    rows, so it shrinks as the threshold grows) broadcasts into a left
    join; tail categories fall through to the sentinel via coalesce.
    """
    if min_count < 1:
        raise DataFrameValidationError("rare_collapse: min_count must be >= 1")
    if col not in df.columns:
        raise DataFrameValidationError(f"rare_collapse: missing column {col!r}")
    keep = (
        df.groupBy(_cat(col).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_k", F.col("_k").alias("_keep"))
    )
    if broadcast_keep:
        keep = F.broadcast(keep)
    return (
        df.withColumn("_k", _cat(col))
        .join(keep, "_k", "left")
        .withColumn(f"{col}_rc", F.coalesce("_keep", F.lit(other)))
        .drop("_k", "_keep")
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 20.0,
    seed: int = 0,
) -> DataFrame:
    """Out-of-fold smoothed target encoding — the leakage guard for
    NON-temporal data (the temporal twin, strictly-past expanding
    encoding, is ``operators/rolling.py:target_encode_expanding``): each
    row's encoding is the m-estimate mean of its category computed from
    the OTHER folds only, so a row never sees its own label.

        {cat}_te = (S_c − S_cf + m·prior) / (N_c − N_cf + m)

    with ``S_c/N_c`` the category's total target sum/count, ``S_cf/N_cf``
    the row's own fold's share, ``prior`` the global target mean and
    ``m = smoothing``. Folds come from the portable md5 hash of
    ``(id, seed)`` (deterministic, partition-invariant, DuckDB-exact —
    the ``entity_split`` map). Plan: ONE ``groupBy(cat, fold)``
    aggregation (≤ C·F rows, map-side combined), per-category totals
    folded from it with a second tiny aggregation, broadcast join back —
    the corpus is scanned once and never shuffled. NULL targets are
    excluded from the statistics but still receive an encoding; NULL
    categories encode via their own level.
    """
    if n_folds < 2:
        raise DataFrameValidationError("target_encode_oof: n_folds must be >= 2")
    if smoothing < 0.0:
        raise DataFrameValidationError("target_encode_oof: smoothing must be >= 0")
    for c in (cat_col, target_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"target_encode_oof: missing column {c!r}")
    y = F.col(target_col).cast("double")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(n_folds)
    ).cast("int")
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    base = df.withColumn("_fold", fold).withColumn("_k", _cat(cat_col))
    # the ≤C·F-row fold table feeds BOTH the per-cat rollup and the join:
    # persist it or the corpus-sized aggregation scan runs twice
    per_fold = base.groupBy("_k", "_fold").agg(
        F.sum(y).alias("_sf"), F.count(y).alias("_nf")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_cat = per_fold.groupBy("_k").agg(
        F.sum("_sf").alias("_sc"), F.sum("_nf").alias("_nc")
    )
    stats = per_fold.join(per_cat, "_k")
    prior_row = df.agg(F.avg(y).alias("_p")).collect()[0]
    if prior_row["_p"] is None:
        raise DataFrameValidationError(
            f"target_encode_oof: target {target_col!r} has no non-null values"
        )
    prior = round(float(prior_row["_p"]), 6)
    m = float(smoothing)
    enc = F.round(
        (
            F.coalesce(F.col("_sc"), F.lit(0.0))
            - F.coalesce(F.col("_sf"), F.lit(0.0))
            + F.lit(m * prior)
        )
        / (
            F.coalesce(F.col("_nc"), F.lit(0)).cast("double")
            - F.coalesce(F.col("_nf"), F.lit(0)).cast("double")
            + F.lit(m)
        ),
        6,
    )
    return hold(
        base.join(F.broadcast(stats), ["_k", "_fold"], "left")
        .withColumn(f"{cat_col}_te", enc)
        .drop("_k", "_sf", "_nf", "_sc", "_nc")
        .withColumnRenamed("_fold", f"{cat_col}_te_fold"),
        per_fold,
    )


def woe_iv_table(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    adjust: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence / information-value table for a BINARY target —
    the credit-scoring encoder and its univariate predictive-power
    summary (IV rule of thumb: < 0.02 useless, > 0.3 strong):

        woe_c = ln( ((pos_c + a)/pos_tot) / ((neg_c + a)/neg_tot) )
        iv_c  = (pos_c/pos_tot − neg_c/neg_tot) · woe_c

    with the standard ``a = 0.5`` zero-cell adjustment (the adjustment
    enters WOE only — IV shares use raw counts). ONE map-side-combined
    ``groupBy(category)`` aggregation; output is C rows (category,
    n, pos, neg, woe, iv), floats rounded 6, ordered by category. NULL
    categories participate via the sentinel; NULL targets are excluded;
    a target with values outside {0, 1} raises.
    """
    if adjust <= 0.0:
        raise DataFrameValidationError("woe_iv_table: adjust must be > 0")
    for c in (cat_col, target_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"woe_iv_table: missing column {c!r}")
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    y = F.col(target_col).cast("double")
    # the C-row count table feeds the totals collect AND the output
    # projection: persist it or the corpus scan runs twice
    counts = (
        df.filter(y.isNotNull())
        .groupBy(_cat(cat_col).alias("category"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("_pos"),
            F.sum(F.lit(1.0) - y).alias("_neg"),
            F.max(F.when((y != 0.0) & (y != 1.0), 1).otherwise(0)).alias("_bad"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = counts.agg(
        F.sum("_pos").alias("_pt"),
        F.sum("_neg").alias("_nt"),
        F.max("_bad").alias("_anybad"),
    )
    trow = tot.collect()[0]
    if trow["_anybad"]:
        raise DataFrameValidationError(
            f"woe_iv_table: target {target_col!r} must be 0/1"
        )
    pt, nt = float(trow["_pt"]), float(trow["_nt"])
    if pt == 0.0 or nt == 0.0:
        raise DataFrameValidationError(
            "woe_iv_table: target needs both classes present"
        )
    a = float(adjust)
    woe = F.log(
        ((F.col("_pos") + F.lit(a)) / F.lit(pt))
        / ((F.col("_neg") + F.lit(a)) / F.lit(nt))
    )
    iv = (F.col("_pos") / F.lit(pt) - F.col("_neg") / F.lit(nt)) * woe
    return hold(
        counts.select(
            "category",
            F.col("n").cast("long").alias("n"),
            F.col("_pos").cast("long").alias("pos"),
            F.col("_neg").cast("long").alias("neg"),
            F.round(woe, 6).alias("woe"),
            F.round(iv, 6).alias("iv"),
        ).orderBy("category"),
        counts,
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    adjust: float = 0.5,
) -> DataFrame:
    """Append ``{cat}_woe`` by broadcast-joining the C-row
    :func:`woe_iv_table` back onto the corpus — the fat side never
    shuffles. (For leakage-sensitive training use
    :func:`target_encode_oof`; WOE's aggregate-level leakage is the
    standard accepted trade in scorecard practice.)"""
    tab = woe_iv_table(df, cat_col, target_col, adjust).select(
        F.col("category").alias("_k"), F.col("woe").alias(f"{cat_col}_woe")
    )
    return (
        df.withColumn("_k", _cat(cat_col))
        .join(F.broadcast(tab), "_k", "left")
        .drop("_k")
    )


def hash_cross(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 1024,
    out_col: str | None = None,
) -> DataFrame:
    """Append a hashed interaction feature of ``cols`` — the
    hashing-trick cross (``hash(colA × colB) % n_buckets``) that gives a
    model second-order structure without materializing the cross
    vocabulary.

    Pure expression: unit-separator concat (values never alias across
    the boundary) → first 8 md5 hex chars as a 32-bit int, mod
    ``n_buckets`` — the portable bucket map DSIR's features use, exactly
    replayable in DuckDB. NULLs participate via :data:`NULL_TOKEN`.
    """
    if len(cols) < 2:
        raise DataFrameValidationError("hash_cross: need >= 2 columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"hash_cross: missing columns {missing}")
    if n_buckets <= 0:
        raise DataFrameValidationError("hash_cross: n_buckets must be > 0")
    name = out_col or ("cross_" + "_".join(cols))
    key = F.concat_ws("\x1f", *[_cat(c) for c in cols])
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")
    return df.withColumn(name, bucket)
