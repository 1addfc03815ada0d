"""Point-in-time (as-of) joins and backfill — the north rule's J1 operators.

The reference has ZERO joins (SURVEY.md §2.6) — it avoids them by keeping one
table and shifting. At corpus scale the same point-in-time semantics must be
expressed across tables, so the engine provides:

  * :func:`asof_join` — for each left row, the single most recent right row
    with ``right.time <= left.time`` (optionally within a tolerance window),
    per join key. Implemented as union + window (the sort-merge-style
    single-shuffle plan), not as an inequality theta-join which Spark would
    execute as BroadcastNestedLoop.
  * :func:`backfill` / :func:`forward_fill` — self-table as-of:
    ``F.last(value, ignorenulls=True)`` over an entity window
    (the north star's stated implementation for the self-table case).
  * :func:`range_join` — interval containment with a range-join-friendly
    equi-bucket prefilter.

Plan shape of asof_join: both sides shuffle ONCE on the key, the union sorts
within (key, time, side-tag), and ``last(right_value, ignorenulls=True)``
propagates the latest right values onto left rows — O(n log n) per key group,
no nested loop, skew handled by AQE since it's a plain window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Pandas-``merge_asof``-style join, distributed.

    ``direction='backward'`` (default): for every left row attach
    ``value_cols`` from the LATEST right row with ``right_time <= left_time``
    (strict ``<`` if ``allow_exact_matches`` is False) sharing the join
    key(s). ``direction='forward'``: from the EARLIEST right row with
    ``right_time >= left_time``. ``tolerance`` (seconds for timestamps, raw
    units for numerics) drops matches farther than the window.
    """
    if direction not in {"backward", "forward"}:
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]

    from temporalscope_spark.core.convert import epoch_seconds

    t_type = dict((f.name, f.dataType) for f in right.schema.fields)[right_time]

    def _num(c):
        return epoch_seconds(c, t_type)

    # tag: backward — right rows sort BEFORE left rows at equal time when
    # exact matches are allowed (so last() over the preceding frame sees
    # them), AFTER when not. forward — mirrored (first() over the following
    # frame must include/exclude the equal-time right row).
    if direction == "backward":
        right_tag = 0 if allow_exact_matches else 1
    else:
        right_tag = 1 if allow_exact_matches else 0
    left_tag = 1 - right_tag

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(right_tag).alias("_side"),
        F.lit(None).cast("long").alias("_left_rowid"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    lrowid = F.monotonically_increasing_id()
    l = left.withColumn("_left_rowid", lrowid)
    l_tagged = l.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("_t"),
        F.lit(left_tag).alias("_side"),
        F.col("_left_rowid"),
        *[F.lit(None).cast(dict((f.name, f.dataType) for f in right.schema.fields)[c]).alias(f"_v_{c}") for c in value_cols],
    )

    unioned = r.unionByName(l_tagged)
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy("_t", "_side").rowsBetween(
            Window.unboundedPreceding, 0
        )
        pick = F.last
    else:
        w = Window.partitionBy(*keys).orderBy("_t", "_side").rowsBetween(
            0, Window.unboundedFollowing
        )
        pick = F.first
    filled = unioned.select(
        "*",
        *[pick(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
        pick(F.when(F.col("_side") == right_tag, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_match_t"),
    )
    matched = filled.filter(F.col("_left_rowid").isNotNull())

    if tolerance is not None:
        gap = (
            _num(F.col("_t")) - _num(F.col("_match_t"))
            if direction == "backward"
            else _num(F.col("_match_t")) - _num(F.col("_t"))
        )
        in_window = gap <= tolerance
        matched = matched.select(
            "*",
            *[
                F.when(in_window, F.col(f"_f_{c}")).otherwise(F.lit(None)).alias(f"_fv_{c}")
                for c in value_cols
            ],
        )
        fcol = "_fv_"
    else:
        fcol = "_f_"

    out_vals = matched.select(
        "_left_rowid",
        *[
            F.col(f"{fcol}{c}").alias(c if c not in left.columns else f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return l.join(out_vals, "_left_rowid", "left").drop("_left_rowid")


def forward_fill(
    df: DataFrame,
    time_col: str,
    value_cols: list[str],
    id_col: str | None = None,
) -> DataFrame:
    """LOCF backfill of nulls from the most recent prior non-null value —
    ``F.last(c, ignorenulls=True)`` over an entity window."""
    base = Window.partitionBy(id_col) if id_col else Window.partitionBy(F.lit(1))
    w = base.orderBy(time_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def backward_fill(
    df: DataFrame,
    time_col: str,
    value_cols: list[str],
    id_col: str | None = None,
) -> DataFrame:
    """NOCB fill from the next non-null value (reverse-direction window)."""
    base = Window.partitionBy(id_col) if id_col else Window.partitionBy(F.lit(1))
    w = base.orderBy(time_col).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: left.point ∈ [right.lo, right.hi).

    The equality keys make this a hash/sort-merge join with a post-filter
    (NOT a nested loop); a RANGE_JOIN hint is attached for engines that
    support range-join optimization.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = cond & (left[point_col] >= right[lo_col]) & (left[point_col] < right[hi_col])
    return left.hint("RANGE_JOIN", point_col, 1).join(right, cond, how)


def serve_features(
    spine: DataFrame,
    specs: list[dict],
    on: str | list[str],
    spine_time: str,
) -> DataFrame:
    """Point-in-time feature serving — the feature-store
    "get historical features" operation (Feast/Tecton semantics): for
    every entity-time row of the SPINE, attach the LATEST value of each
    feature table at or before that time, optionally expiring values
    older than a per-table TTL. Zero leakage by construction: every
    attach is a backward as-of join, so a spine row can never see a
    feature written after its own timestamp.

    Each spec is ``{"df": DataFrame, "time_col": str,
    "value_cols": [...] (default: all non-key/non-time),
    "ttl": seconds | None, "prefix": str (default "")}``. Prefixes
    namespace the attached columns; a name that would collide with a
    spine column (or an earlier table's output) raises rather than
    silently suffixing.

    Feature tables should be unique per (key, time) — pre-aggregate
    first (duplicate timestamps tie-break arbitrarily, the
    ``asof_join`` contract).

    Plan shape: one :func:`asof_join` per table = one union + one
    entity-keyed window pass each (T tables → T passes over
    spine+table, never a cross product). With the bucketed layout all
    passes share the entity shuffle key.
    """
    if not specs:
        raise DataFrameValidationError("serve_features: specs must be non-empty")
    keys = [on] if isinstance(on, str) else list(on)
    missing = [c for c in (*keys, spine_time) if c not in spine.columns]
    if missing:
        raise DataFrameValidationError(f"serve_features: spine missing {missing}")
    out = spine
    for i, spec in enumerate(specs):
        df, tc = spec["df"], spec["time_col"]
        miss = [c for c in (*keys, tc) if c not in df.columns]
        if miss:
            raise DataFrameValidationError(
                f"serve_features: table {i} missing {miss}"
            )
        vcs = spec.get("value_cols") or [
            c for c in df.columns if c not in keys and c != tc
        ]
        prefix = spec.get("prefix", "")
        if prefix:
            df = df.select(
                *keys, tc, *[F.col(c).alias(prefix + c) for c in vcs]
            )
            vcs = [prefix + c for c in vcs]
        clash = [c for c in vcs if c in out.columns]
        if clash:
            raise DataFrameValidationError(
                f"serve_features: output columns {clash} collide — set a prefix"
            )
        out = asof_join(
            out,
            df,
            on=on,
            left_time=spine_time,
            right_time=tc,
            value_cols=vcs,
            tolerance=spec.get("ttl"),
        )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    on: str | list[str] | None = None,
    chunk: float = 3600.0,
    suffix: str = "_r",
    max_chunks: int = 4096,
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open ``[lo, hi)`` on both
    sides): emit one row per (left, right) pair whose intervals
    intersect, optionally also matching equality keys ``on``. The join
    shape :func:`range_join` cannot express — both sides are ranges, so
    there is no single point to hash on.

    The scalable plan is the genomics/telemetry chunking trick (the same
    decomposition BinSort/GenAp use for overlap joins): each interval
    explodes into the fixed-width time chunks it touches, the two sides
    EQUI-join on ``(keys..., chunk_id)`` — a plain hash/sort-merge
    shuffle, never a BroadcastNestedLoop/cartesian — and the overlap
    predicate filters inside matching chunks only. Duplicate pair hits
    (long intervals share many chunks) are eliminated WITHOUT a distinct:
    a pair is kept only in the one chunk containing ``max(lo_l, lo_r)``,
    which every truly-overlapping pair contains exactly once.

    ``chunk`` is in the time unit's seconds (timestamps are converted to
    integer µs internally; numeric lo/hi are treated as seconds, the
    engine-wide convention). Pick it near the median interval length:
    too-small chunks explode long intervals into many rows (guarded by
    ``max_chunks``, which raises rather than silently truncating);
    too-large chunks co-locate non-overlapping intervals and push work
    into the post-filter. Empty intervals (``hi <= lo``) match nothing.
    Right-side columns that collide with left names get ``suffix``.
    """
    from temporalscope_spark.operators.rolling import _time_micros

    keys = [on] if isinstance(on, str) else list(on or [])
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in [lo_col, hi_col, *keys] if c not in df.columns]
        if missing:
            raise DataFrameValidationError(
                f"interval_overlap_join: {side} side missing columns {missing}"
            )
    if chunk <= 0:
        raise DataFrameValidationError("interval_overlap_join: chunk must be > 0")
    ch_us = int(round(chunk * 1_000_000))

    def prep(df: DataFrame, tag: str) -> DataFrame:
        lo = _time_micros(df, lo_col)
        hi = _time_micros(df, hi_col)
        out = df.withColumn(f"_lo{tag}", lo).withColumn(f"_hi{tag}", hi)
        out = out.filter(F.col(f"_hi{tag}") > F.col(f"_lo{tag}"))
        c0 = F.floor(F.col(f"_lo{tag}") / ch_us)
        c1 = F.floor((F.col(f"_hi{tag}") - 1) / ch_us)  # half-open: hi excluded
        guard = F.when(
            c1 - c0 + 1 > int(max_chunks),
            F.raise_error(
                F.lit(
                    f"interval_overlap_join: an interval spans more than "
                    f"max_chunks={max_chunks} chunks; raise `chunk` or split "
                    "the interval"
                )
            ).cast("long"),
        )
        return out.withColumn(
            "_chunk", F.explode(F.sequence(F.coalesce(guard, c0), c1))
        )

    lt = prep(left, "_l")
    rt = prep(right, "_r")
    renames = {
        c: c + suffix
        for c in right.columns
        if c in set(left.columns) and c not in keys
    }
    for old, new in renames.items():
        rt = rt.withColumnRenamed(old, new)
    cond = lt["_chunk"] == rt["_chunk"]
    for k in keys:
        cond = cond & (lt[k] == rt[k])
    joined = lt.join(rt, cond).drop(rt["_chunk"])
    for k in keys:
        joined = joined.drop(rt[k])
    keep = (
        (F.col("_lo_l") < F.col("_hi_r"))
        & (F.col("_lo_r") < F.col("_hi_l"))
        & (F.col("_chunk") == F.floor(F.greatest("_lo_l", "_lo_r") / ch_us))
    )
    return joined.filter(keep).drop("_chunk", "_lo_l", "_hi_l", "_lo_r", "_hi_r")
