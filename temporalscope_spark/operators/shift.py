"""Leakage-safe target shifting (lag/lead) — operator W1.

Reference: SingleStepTargetShifter
(/root/reference/src/temporalscope/target_shifters/single_step.py:88-544).
Semantics reproduced:
  * adds ``{target}_shift_{n}`` = value ``n_lags`` rows AHEAD in the frame's
    sort order (the reference's ``shift(-n)`` = lead), then drops rows whose
    shifted value is null (exactly the ``n_lags`` trailing rows per entity),
    optionally drops the original target (single_step.py:265-301);
  * ``n_lags <= 0`` → ValueError "`n_lags` must be greater than 0" (:183-184);
  * empty input → "Cannot transform empty DataFrame" (:261);
  * everything dropped → "All rows were dropped during transformation" (:468).

Spark shape: one ``F.lead`` over ``Window.partitionBy(id).orderBy(time)`` —
a single narrow window stage after the entity shuffle; no Python UDF. The
reference's TWO count actions + full re-validate/re-sort on re-wrap
(single_step.py:458-487) collapse to one optional count.

Global-order mode (no ``id_col``) matches the shipped reference exactly but
runs the window on ONE partition — acceptable only at parity-fixture scale,
flagged via warning. Production always passes ``id_col`` (north star:
``Window.partitionBy(doc_id).orderBy(event_time)``).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.frame import TemporalFrame


def shift_target(
    df: DataFrame,
    time_col: str,
    target_col: str,
    n_lags: int = 1,
    id_col: str | None = None,
    drop_target: bool = False,
    direction: str = "lead",
    check_empty: bool = True,
) -> DataFrame:
    """Add ``{target}_shift_{n_lags}`` and drop rows made null by the shift.

    ``direction='lead'`` (reference default): the shifted column holds the
    target ``n_lags`` steps in the FUTURE — the label for forecasting at time
    t, leakage-free because features at t never see it as input.
    ``direction='lag'``: value from the past (feature engineering).
    """
    if n_lags <= 0:
        raise ValueError("`n_lags` must be greater than 0")
    if target_col not in df.columns:
        raise ValueError(f"target_col '{target_col}' not found in DataFrame")

    if check_empty and df.isEmpty():
        raise ValueError("Cannot transform empty DataFrame")

    if id_col:
        w = Window.partitionBy(id_col).orderBy(time_col)
    else:
        warnings.warn(
            "shift_target without id_col runs a single-partition global window; "
            "use id_col for distributed execution",
            stacklevel=2,
        )
        w = Window.orderBy(time_col)

    shifted_name = f"{target_col}_shift_{n_lags}"
    fn = F.lead if direction == "lead" else F.lag
    out = df.withColumn(shifted_name, fn(F.col(target_col), n_lags).over(w))
    out = out.filter(F.col(shifted_name).isNotNull())
    if drop_target:
        out = out.drop(target_col)

    if check_empty and out.isEmpty():
        raise ValueError("All rows were dropped during transformation")
    return out


class TargetShifter:
    """sklearn-style fit/transform wrapper mirroring SingleStepTargetShifter.

    ``fit`` adopts the target column (from a TemporalFrame or explicit);
    ``transform`` runs :func:`shift_target`; ``fit_transform`` is the eager
    combo. Law preserved from the reference tests:
    ``fit_transform(X) == fit(X).transform(X)``.
    """

    def __init__(
        self,
        target_col: str | None = None,
        n_lags: int = 1,
        drop_target: bool = True,
        verbose: bool = False,
    ):
        if n_lags <= 0:
            raise ValueError("`n_lags` must be greater than 0")
        self.target_col = target_col
        self.n_lags = n_lags
        self.drop_target = drop_target
        self.verbose = verbose

    def fit(self, X: TemporalFrame | DataFrame, y=None) -> "TargetShifter":
        if isinstance(X, TemporalFrame):
            self.target_col = self.target_col or X.target_col
        if self.target_col is None:
            raise ValueError("`target_col` must be set before fit on a plain DataFrame")
        if isinstance(X, DataFrame) and self.target_col not in X.columns:
            raise ValueError(f"Column '{self.target_col}' not found in DataFrame")
        return self

    def transform(self, X: TemporalFrame | DataFrame, y=None) -> TemporalFrame | DataFrame:
        if self.target_col is None:
            raise ValueError("target_col must be set before transform (call fit first)")
        if isinstance(X, TemporalFrame):
            out = shift_target(
                X.df,
                time_col=X.time_col,
                target_col=self.target_col,
                n_lags=self.n_lags,
                id_col=X.id_col,
                drop_target=self.drop_target,
            )
            # Re-wrap WITHOUT re-validating/re-sorting (the reference redoes
            # both — single_step.py:474-481 — an O(data) anti-pattern; our
            # sort order is preserved by the window op).
            new = X._with_df(out)
            new._target_col = f"{self.target_col}_shift_{self.n_lags}"
            if self.verbose:
                print(f"Shifted target by {self.n_lags}; new target {new._target_col}")
            return new
        return shift_target(
            X,
            time_col=X.columns[0],
            target_col=self.target_col,
            n_lags=self.n_lags,
            id_col=None,
            drop_target=self.drop_target,
        )

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


def lag_features(
    df: DataFrame,
    time_col: str,
    value_cols: list[str],
    lags: list[int],
    id_col: str | None = None,
    drop_incomplete: bool = False,
) -> DataFrame:
    """Multi-column multi-lag feature builder — one window, k×m expressions.

    All lags share a single Window spec, so Spark computes them in ONE
    window physical operator (single sort, single pass) — the fused
    generalization of repeated reference shifts.
    """
    if id_col:
        w = Window.partitionBy(id_col).orderBy(time_col)
    else:
        w = Window.orderBy(time_col)
    out = df
    for c in value_cols:
        for n in lags:
            out = out.withColumn(f"{c}_lag_{n}", F.lag(F.col(c), n).over(w))
    if drop_incomplete:
        conds = None
        for c in value_cols:
            for n in lags:
                cond = F.col(f"{c}_lag_{n}").isNotNull()
                conds = cond if conds is None else (conds & cond)
        if conds is not None:
            out = out.filter(conds)
    return out


def delta_features(
    df: DataFrame,
    time_col: str,
    value_cols: list[str],
    lags: list[int],
    id_col: str | None = None,
    order_cols: list[str] | None = None,
    include_rate: bool = True,
) -> DataFrame:
    """First-difference / pct-change / per-second-rate features — the change
    companions to :func:`lag_features`, all strictly-past (a row only sees
    values ``n`` rows BEHIND it in the entity's time order, so zero leakage).

    Per value column ``c`` and lag ``n``:

    * ``{c}_diff_{n}``  = ``c - lag(c, n)``
    * ``{c}_pct_{n}``   = ``c / lag(c, n) - 1`` (null when the lag is null
      or exactly 0 — no synthetic infinities)
    * ``{c}_rate_{n}``  = ``diff / Δt_seconds`` against the lagged row's
      timestamp (null when Δt = 0; irregular grids get a real slope, which
      a plain diff misrepresents)

    All expressions share ONE window spec, so Spark fuses them into a single
    window physical operator — one entity shuffle, one sort, k×m narrow
    projections. ``order_cols`` appends tie-break columns to the time
    ordering (pass the row key when timestamps can collide — lag semantics
    on ties are otherwise engine-arbitrary). Floats are rounded to 6 for
    engine-portable comparison.
    """
    if not value_cols or not lags:
        raise ValueError("value_cols and lags must be non-empty")
    if any(n <= 0 for n in lags):
        raise ValueError("`n_lags` must be greater than 0")
    from temporalscope_spark.core.convert import epoch_seconds

    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    if id_col:
        w = Window.partitionBy(id_col).orderBy(*order)
    else:
        warnings.warn(
            "delta_features without id_col runs the window on one partition",
            stacklevel=2,
        )
        w = Window.orderBy(*order)
    dt_type = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    t_now = epoch_seconds(F.col(time_col), dt_type)

    new_cols = []
    for c in value_cols:
        for n in lags:
            lagged = F.lag(F.col(c), n).over(w)
            diff = F.col(c) - lagged
            new_cols.append(F.round(diff, 6).alias(f"{c}_diff_{n}"))
            new_cols.append(
                F.round(F.when(lagged != 0, F.col(c) / lagged - 1.0), 6).alias(
                    f"{c}_pct_{n}"
                )
            )
            if include_rate:
                dt = t_now - F.lag(t_now, n).over(w)
                new_cols.append(
                    F.round(F.when(dt != 0, diff / dt), 6).alias(f"{c}_rate_{n}")
                )
    # one select (not chained withColumn) => ONE Window physical operator
    return df.select("*", *new_cols)


def with_time_chunk(
    df: DataFrame,
    time_col: str,
    chunk_seconds: int,
    chunk_col: str = "time_chunk",
) -> DataFrame:
    """Add the deterministic time-chunk id ``floor(epoch_us(t) / chunk_us)``.

    The chunk is the engine's explicit salt for skewed entities: clustering a
    table by ``(id, time_chunk)`` spreads a monster entity's rows across all
    buckets/partitions while keeping each chunk's rows co-located and
    time-contiguous — the precondition for :func:`shift_target_chunked`.
    """
    from temporalscope_spark.core.convert import epoch_seconds

    dt = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    epoch = epoch_seconds(F.col(time_col), dt)
    return df.withColumn(chunk_col, F.floor(epoch / F.lit(float(chunk_seconds))).cast("long"))


def shift_target_chunked(
    df: DataFrame,
    time_col: str,
    target_col: str,
    n_lags: int = 1,
    id_col: str = "doc_id",
    chunk_col: str | None = None,
    chunk_seconds: int | None = None,
    drop_incomplete: bool = True,
    direction: str = "lead",
    out_col: str | None = None,
    repair_join: str = "merge",
) -> DataFrame:
    """Skew-proof shift: identical result to :func:`shift_target` but with
    per-task state bounded by the time chunk, not by the entity.
    ``direction='lead'`` (label) repairs chunk tails from the NEXT chunk's
    first values; ``direction='lag'`` (feature) repairs chunk heads from the
    PREVIOUS chunk's last values.

    A plain ``Window.partitionBy(id)`` serializes a hot entity into ONE task
    and buffers ALL its rows (the straggler + spill that kills N→4N scaling
    at 10^12 rows). Here:

    1. rows are windowed by ``(id_col, chunk_col)`` — if the table is stored
       clustered by these keys (``bucketBy(n, id, chunk)``), the window needs
       NO exchange and buffers at most one chunk;
    2. the ``n_lags`` trailing rows of each chunk take their lead values from
       the next chunk's first rows via a join against a per-chunk boundary
       table (one aggregate row per (id, chunk) — map-side-combinable,
       skew-free). ``repair_join`` picks the strategy: ``'merge'`` (default)
       sort-merge joins on the keys the fat side is already clustered by —
       the boundary table grows with the corpus (one row per (id, chunk), so
       ~10^9 rows at 10^12 input rows) and must never be broadcast;
       ``'broadcast'`` is opt-in for small bounded-cardinality cases.

    Correctness requires every chunk to hold ≥ ``n_lags`` rows of its entity
    (chunk_seconds ≫ n_lags × max event spacing); rows whose lead lies beyond
    the immediately-next chunk come out null and are dropped with the other
    trailing rows when ``drop_incomplete``.
    """
    if n_lags <= 0:
        raise ValueError("`n_lags` must be greater than 0")
    if chunk_col is None:
        if chunk_seconds is None:
            raise ValueError("pass chunk_col or chunk_seconds")
        chunk_col = "time_chunk"
        df = with_time_chunk(df, time_col, chunk_seconds, chunk_col)

    if direction not in {"lead", "lag"}:
        raise ValueError("direction must be 'lead' or 'lag'")
    if repair_join not in {"merge", "broadcast"}:
        raise ValueError("repair_join must be 'merge' or 'broadcast'")
    lead_mode = direction == "lead"

    w = Window.partitionBy(id_col, chunk_col).orderBy(time_col)
    shifted_name = out_col or f"{target_col}_shift_{n_lags}"

    # boundary rows of every (id, chunk), time-ordered: the first n_lags
    # targets (lead repair) or the last n_lags targets (lag repair). One
    # aggregate row per chunk — map-side-combinable, skew-free.
    if n_lags == 1:
        agg_fn = F.min_by if lead_mode else F.max_by
        edge = df.groupBy(id_col, chunk_col).agg(
            agg_fn(target_col, time_col).alias("_edge_targets")
        )
        edge = edge.withColumn("_edge_targets", F.array("_edge_targets"))
    else:
        sorted_pairs = F.array_sort(F.collect_list(F.struct(time_col, target_col)))
        head = (
            F.slice(sorted_pairs, 1, n_lags)
            if lead_mode
            # negative start must not exceed the array length (short chunks)
            else F.slice(
                sorted_pairs,
                -F.least(F.lit(n_lags), F.size(sorted_pairs)),
                F.lit(n_lags),
            )
        )
        edge = df.groupBy(id_col, chunk_col).agg(head.alias("_head")).select(
            id_col,
            chunk_col,
            F.transform(F.col("_head"), lambda s: s[target_col]).alias("_edge_targets"),
        )
    wb = Window.partitionBy(id_col).orderBy(chunk_col)
    neighbor = F.lead("_edge_targets", 1) if lead_mode else F.lag("_edge_targets", 1)
    boundary = edge.select(
        id_col, chunk_col, neighbor.over(wb).alias("_nbr_targets")
    )

    if repair_join == "broadcast":
        boundary = F.broadcast(boundary)
    else:
        # matches pipelines/feature_pass.py:124 — the boundary table is one
        # row per (id, chunk) and GROWS with the corpus; sort-merge on the
        # keys the fat side is clustered by, never a driver-side broadcast
        boundary = boundary.hint("merge")
    out = df.join(boundary, [id_col, chunk_col], "left")
    shift_fn = F.lead if lead_mode else F.lag
    in_chunk = shift_fn(F.col(target_col), n_lags).over(w)
    # row position within the (bounded) chunk group
    cnt = F.count(F.lit(1)).over(Window.partitionBy(id_col, chunk_col))
    rn = F.row_number().over(w)
    if lead_mode:
        # pos 1 = last row of chunk; lead crosses n_lags - pos rows into the
        # next chunk's first-targets array
        pos = cnt - rn + 1
        idx = F.lit(n_lags) - pos  # 0-based into _nbr_targets (length n_lags)
    else:
        # pos 1 = first row of chunk; lag reaches rn-th-from-end of the
        # previous chunk's last-targets array (length L <= n_lags)
        pos = rn
        idx = F.size("_nbr_targets") - (F.lit(n_lags) - pos) - 1
    # 0-based null-safe indexing (F.get): out-of-range → null, never an
    # ANSI error
    cross = F.get(F.col("_nbr_targets"), idx.cast("int"))
    out = out.withColumn(
        shifted_name,
        F.coalesce(in_chunk, F.when(pos <= n_lags, cross)),
    ).drop("_nbr_targets")
    if drop_incomplete:
        out = out.filter(F.col(shifted_name).isNotNull())
    return out


def multi_step_targets(
    df: DataFrame,
    time_col: str,
    target_col: str,
    horizon: int,
    id_col: str | None = None,
    out_col: str | None = None,
    drop_incomplete: bool = True,
) -> DataFrame:
    """multi_target / seq2seq mode (reference core_utils.py:61-72, reserved):
    attach the array of the next ``horizon`` target values —
    ``[target(t+1), ..., target(t+horizon)]`` — as one array column.

    One window, ``horizon`` lead expressions fused into a single WindowExec;
    ``drop_incomplete`` removes trailing rows whose full horizon is not
    observable (the multi-step analogue of the shifter's row drop).
    """
    if horizon <= 0:
        raise ValueError("`horizon` must be greater than 0")
    if id_col:
        w = Window.partitionBy(id_col).orderBy(time_col)
    else:
        warnings.warn(
            "multi_step_targets without id_col runs a single-partition global "
            "window; use id_col for distributed execution",
            stacklevel=2,
        )
        w = Window.orderBy(time_col)
    name = out_col or f"{target_col}_next_{horizon}"
    arr = F.array(*[F.lead(F.col(target_col), i).over(w) for i in range(1, horizon + 1)])
    out = df.withColumn(name, arr)
    if drop_incomplete:
        # complete horizons only: no null slot in the array
        out = out.filter(~F.array_contains(F.transform(F.col(name), F.isnull), True))
    return out


def time_to_event(
    df: DataFrame,
    time_col: str,
    event_expr,
    id_col: str | None = None,
    out_col: str = "tte_seconds",
    order_cols: list[str] | None = None,
    include_current: bool = False,
) -> DataFrame:
    """Seconds until the entity's NEXT qualifying event — the
    survival/churn label builder (the time-to-event target a hazard or
    churn model trains on; rows after an entity's last qualifying event
    get NULL = right-censored, exactly the semantics a survival loss
    expects).

    ``event_expr`` is a boolean Column marking qualifying rows (e.g.
    ``F.col("event_type") == "purchase"``). For each row, ``out_col`` is
    the gap to the MINIMUM qualifying timestamp strictly after it in the
    entity's time order (``include_current=True`` lets a qualifying row
    label itself 0 — the "already converted" convention).

    Strictly-forward semantics mirror the strictly-past contract of the
    rolling features: the label looks only FORWARD (it is a target, so
    it must leak the future — that is its job), computed as a reverse
    running ``min`` of the gated timestamp over ONE entity-keyed window
    (``rowsBetween(1, unbounded)``), the frame twin of the expanding
    features. One exchange; pass ``order_cols`` (e.g. a unique id) to
    pin tie order on duplicate timestamps.

    Output: the input columns + ``out_col`` (double seconds, NULL when
    censored).
    """
    from temporalscope_spark.core.convert import epoch_seconds

    if time_col not in df.columns:
        raise DataFrameValidationError(f"time_to_event: missing column {time_col!r}")
    if out_col in df.columns:
        raise DataFrameValidationError(
            f"time_to_event: output column {out_col!r} already exists"
        )
    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.orderBy(*order)
    if id_col:
        w = Window.partitionBy(id_col).orderBy(*order)
    start = 0 if include_current else 1
    frame = w.rowsBetween(start, Window.unboundedFollowing)
    next_t = F.min(F.when(event_expr, t)).over(frame)
    return df.withColumn(
        out_col, F.round(next_t - t, 6) + F.lit(0.0)
    )
