"""Purged time-series cross-validation splits with embargo.

Extends the sliding-window partitioner family (reference spec:
/root/reference/src/temporalscope/partition/single_target/static/
sliding_window.py — train/test ranges per window) with the standard
leakage-safe CV scheme for temporal ML: K contiguous equal-count test folds;
for each fold, training data is everything strictly OUTSIDE the test time
range plus an embargo buffer after it (so features computed from trailing
windows near the fold boundary cannot leak test information back into
training).

Spark-first physics: fold boundaries come from ~2K boundary order statistics
(plans/rownum.py) — never a full sort or collect. Fold filters compare the
time column against literals of the column's OWN type (never
``cast(col as double)``, which silently disables parquet predicate pushdown
— verified by the PushedFilters plan test), so every per-fold frame is
partition-prunable at the scan. The summary is ONE pass: all K folds'
train/test indicators evaluated in a single projection and aggregate.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.plans.rownum import order_statistics


def _num(v) -> float:
    """Native time value → epoch seconds / native numeric units (reporting)."""
    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - epoch).total_seconds()
    if isinstance(v, _dt.date):
        return (_dt.datetime(v.year, v.month, v.day) - _dt.datetime(1970, 1, 1)).total_seconds()
    return float(v)


def _plus_seconds(v, seconds: float):
    """Native time value + seconds, preserving the native type where exact.

    Integer values keep integer type for whole-second offsets (a float
    literal would force the COLUMN to double in the comparison and kill
    predicate pushdown); fractional offsets on integer axes fall back to
    float — correct, just not scan-prunable.
    """
    if isinstance(v, _dt.datetime):
        return v + _dt.timedelta(seconds=seconds)
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day) + _dt.timedelta(seconds=seconds)
    if isinstance(v, int) and float(seconds).is_integer():
        return v + int(seconds)
    return v + seconds


def _lit(df: DataFrame, time_col: str, v) -> Column:
    """Literal of the time column's own dataType (foldable cast — the column
    side stays uncast, so the predicate reaches the parquet scan)."""
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    return F.lit(v).cast(dt)


def fit_fold_bounds(
    df: DataFrame,
    time_col: str,
    n_folds: int,
    total_rows: Optional[int] = None,
) -> list[tuple]:
    """Equal-count contiguous fold time bounds [lo_f, hi_f] (inclusive,
    NATIVE time values — timestamps stay timestamps).

    Fold f covers global sort positions (p_{f-1}, p_f] with
    p_f = floor(f·n/K) — NTILE-style sizing (remainder spread over the later
    folds). Only 2K boundary order statistics are computed.
    """
    if n_folds < 2:
        raise DataFrameValidationError("n_folds must be >= 2")
    if total_rows is None:
        total_rows = df.count()
    if total_rows < n_folds:
        raise DataFrameValidationError(
            f"Total rows ({total_rows}) are insufficient for {n_folds} folds."
        )
    edges = [(f * total_rows) // n_folds for f in range(n_folds + 1)]
    # fold f: positions edges[f]+1 .. edges[f+1]
    positions = sorted({e + 1 for e in edges[:-1]} | {e for e in edges[1:]})
    stats = order_statistics(df, [time_col], positions)
    return [
        (stats[edges[f] + 1][0], stats[edges[f + 1]][0]) for f in range(n_folds)
    ]


def _fold_test_pred(df: DataFrame, time_col: str, bounds: list, f: int) -> Column:
    """Fold membership by EXCLUSIVE cut points: test_f = (hi_{f-1}, hi_f]
    (fold 0 lower-unbounded). With inclusive [lo_f, hi_f] ranges, a
    timestamp value spanning a positional fold edge (duplicate timestamps)
    would satisfy BOTH adjacent folds' filters and be double-counted; cut
    points put every row in exactly one fold. On unique timestamps the two
    formulations are identical (lo_f is the first value after hi_{f-1})."""
    t = F.col(time_col)
    pred = t <= _lit(df, time_col, bounds[f][1])
    if f > 0:
        pred = pred & (t > _lit(df, time_col, bounds[f - 1][1]))
    return pred


def _fold_train_pred(
    df: DataFrame, time_col: str, bounds: list, f: int, embargo_seconds: float
) -> Column:
    """train_f = before the fold's cut-in (t <= hi_{f-1}) OR after the
    embargo (t > hi_f + embargo); rows in (hi_f, hi_f+embargo] are purged."""
    t = F.col(time_col)
    after = t > _lit(df, time_col, _plus_seconds(bounds[f][1], embargo_seconds))
    if f == 0:
        return after
    return (t <= _lit(df, time_col, bounds[f - 1][1])) | after


def purged_fold_summary(
    df: DataFrame,
    time_col: str,
    n_folds: int,
    embargo_seconds: float = 0.0,
    bounds: Optional[list[tuple]] = None,
) -> DataFrame:
    """Per-fold (train_rows, test_rows) counts + test bounds — ONE data pass.

    For fold f: test = time ∈ [lo_f, hi_f]; train = time < lo_f (strictly
    before the test range) OR time > hi_f + embargo (after the embargo
    buffer). Rows inside (hi_f, hi_f + embargo] are purged entirely.
    All K folds' indicators are evaluated in a single projection and summed
    in a single aggregate — no per-fold re-scan.
    """
    if bounds is None:
        bounds = fit_fold_bounds(df, time_col, n_folds)
    t = F.col(time_col)

    aggs = []
    for f, (lo, hi) in enumerate(bounds):
        is_test = _fold_test_pred(df, time_col, bounds, f)
        is_train = _fold_train_pred(df, time_col, bounds, f, embargo_seconds)
        aggs.append(F.sum(is_test.cast("long")).alias(f"_test_{f}"))
        aggs.append(F.sum(is_train.cast("long")).alias(f"_train_{f}"))
    row = df.agg(*aggs).first()

    spark = df.sparkSession
    out = [
        (f, int(row[f"_train_{f}"]), int(row[f"_test_{f}"]), _num(lo), _num(hi))
        for f, (lo, hi) in enumerate(bounds)
    ]
    return spark.createDataFrame(
        out, "fold int, train_rows long, test_rows long, test_lo double, test_hi double"
    )


def purged_time_series_splits(
    df: DataFrame,
    time_col: str,
    n_folds: int,
    embargo_seconds: float = 0.0,
    bounds: Optional[list[tuple]] = None,
) -> Iterator[dict[str, DataFrame]]:
    """Lazily yield {train, test} DataFrames per fold (purged + embargoed).

    Each frame is a pure literal time-range filter over ``df`` — pushdown-
    eligible and partition-prunable; nothing is materialized here.
    """
    if bounds is None:
        bounds = fit_fold_bounds(df, time_col, n_folds)
    for f in range(len(bounds)):
        yield {
            "test": df.filter(_fold_test_pred(df, time_col, bounds, f)),
            "train": df.filter(
                _fold_train_pred(df, time_col, bounds, f, embargo_seconds)
            ),
        }


def entity_split(
    df: DataFrame,
    id_col: str,
    test_frac: float,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic entity-level train/test assignment.

    Every row of an entity lands on the SAME side (no temporal leakage
    through shared entities across splits — the document-level split a
    training corpus needs). Assignment = first 8 hex chars of
    ``md5(id || '#' || seed)`` as a uniform 32-bit integer; test iff
    ``u / 2^32 < test_frac``. md5 (not xxhash64) so the mapping is
    bit-reproducible in ANY engine — the DuckDB oracle replays it exactly.
    Pure map — no shuffle, no state, stable under repartitioning.
    """
    from temporalscope_spark.operators.sampling import _uniform01

    if not 0.0 <= test_frac <= 1.0:
        raise DataFrameValidationError("test_frac must be between 0.0 and 1.0")
    is_test = _uniform01(id_col, seed, portable=True) < F.lit(float(test_frac))
    return df.withColumn(out_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def split_leakage_check(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-duplicate leakage across train/test splits: fingerprint
    groups whose identical normalized content appears in MORE THAN ONE
    split — the evaluation-integrity check a corpus split must pass
    (a test document whose exact duplicate sits in train is memorized,
    not generalized; Lee et al. 2022 §6 measure precisely this effect).

    Plan shape: one narrow fingerprint projection (md5 of normalized
    text — the `dedup_exact` key) and ONE map-side-combinable groupBy on
    the fingerprint; no joins, no windows. The near-dup extension is a
    composition, not a new operator: run `minhash_lsh_pairs` and filter
    pairs whose endpoints' splits differ.

    Output: one row per leaking fingerprint —
    (fingerprint, n_docs, n_splits, splits) with ``splits`` the sorted
    distinct split labels joined with ','; only groups spanning ≥ 2
    splits are returned.
    """
    from temporalscope_spark.operators.text import with_fingerprint

    for c in (split_col, text_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"missing column {c!r}")
    fp = with_fingerprint(df, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_set(split_col)).alias("_sp"),
        )
        .filter(F.size("_sp") >= 2)
        .select(
            "fingerprint",
            "n_docs",
            F.size("_sp").alias("n_splits"),
            F.array_join("_sp", ",").alias("splits"),
        )
    )
