"""Leakage-safe rolling (trailing-window) feature aggregates.

The reference's only windowed primitives are shift (lead/lag) and adjacent
deltas (/root/reference/src/temporalscope/target_shifters/single_step.py:265-301,
core_utils.py:1177-1203). A point-in-time feature engine additionally needs
trailing aggregates — "mean of the value over the last N seconds, strictly
before now" — the canonical backfill-free rolling feature. This module
provides them as pure ``Window.rangeBetween`` expressions (JVM-side, one
shuffle on the entity key, shared by every feature column and every window
length).

Leakage contract: frames end at ``-1`` (time-range) or ``Window.currentRow - 1``
(row-count), so the feature at time t aggregates rows with time strictly
< t — the zero-leakage property the north star asserts (each feature at t
uses only data with event_time < t).

At 100 TB scale this is the cheapest feature family the engine has: with the
table pre-clustered by (doc_id bucket, sorted event_time) — see
``TemporalFrame.ensure_layout`` / the bucketed bench layout — the window runs
exchange-free, and all windows/columns share one sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds
from temporalscope_spark.exceptions import DataFrameValidationError

_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev_samp,
}


def _validate_aggs(aggs, table=None) -> None:
    table = table if table is not None else _AGG_FNS
    bad = [a for a in aggs if a not in table]
    if bad:
        raise DataFrameValidationError(
            f"Unsupported aggs {bad}; supported: {sorted(table)}"
        )


def _time_expr(df: DataFrame, time_col: str) -> Column:
    for f in df.schema.fields:
        if f.name == time_col:
            return epoch_seconds(F.col(time_col), f.dataType)
    raise DataFrameValidationError(f"Column '{time_col}' does not exist in the DataFrame")


def _time_micros(df: DataFrame, time_col: str) -> Column:
    """Integer-µs ordering key. Range frames need an integer axis for an
    exact strictly-past bound: on a *double* seconds ordering, an upper bound
    of ``-1`` means "1 second before now" and silently drops rows in
    ``(t-1s, t)``; on integer µs, ``-1`` is exactly "< t" at µs resolution
    (TimestampType's native precision — lossless). Numeric time columns are
    interpreted as seconds and discretized the same way."""
    return F.round(_time_expr(df, time_col) * F.lit(1_000_000.0)).cast("long")


def rolling_features(
    df: DataFrame,
    value_cols: Sequence[str],
    windows_seconds: Sequence[int],
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    aggs: Sequence[str] = ("count", "sum", "avg"),
    include_current: bool = False,
) -> DataFrame:
    """Add trailing time-range aggregates per entity.

    For each ``c`` in ``value_cols``, ``w`` in ``windows_seconds`` and ``a``
    in ``aggs``, adds ``{c}_{a}_{w}s`` = a(c) over rows of the same entity
    with time in ``[t - w, t)`` (half-open; ``include_current=True`` closes
    it to ``[t - w, t]`` for non-leakage-sensitive uses).

    All output columns share a single window partitioning/ordering, so the
    physical plan has ONE exchange + sort (or none on a pre-clustered
    layout), regardless of how many features are requested.
    """
    if not value_cols or not windows_seconds:
        raise DataFrameValidationError("value_cols and windows_seconds must be non-empty")
    _validate_aggs(aggs)

    t = _time_micros(df, time_col)
    out = df.withColumn("__t", t)
    base = Window.orderBy("__t")
    if id_col is not None:
        base = base.partitionBy(id_col)
    upper = 0 if include_current else -1

    cols = []
    for w in windows_seconds:
        frame = base.rangeBetween(-int(w) * 1_000_000, upper)
        for c in value_cols:
            for a in aggs:
                cols.append(_AGG_FNS[a](F.col(c)).over(frame).alias(f"{c}_{a}_{w}s"))
    return out.select("*", *cols).drop("__t")


def rolling_row_features(
    df: DataFrame,
    value_cols: Sequence[str],
    lookback_rows: Sequence[int],
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    aggs: Sequence[str] = ("avg",),
) -> DataFrame:
    """Trailing row-count aggregates: a(c) over the previous ``n`` rows of the
    same entity (current row excluded — frame ``[-n, -1]``), time-ordered.

    Column naming: ``{c}_{a}_last{n}``. ROWS frames are deterministic only
    under a total per-entity order — run the V5 temporal-uniqueness gate
    (``check_temporal_ordering``) first; duplicate timestamps would make the
    frame contents partition-order-dependent.
    """
    if not value_cols or not lookback_rows:
        raise DataFrameValidationError("value_cols and lookback_rows must be non-empty")
    _validate_aggs(aggs)

    t = _time_expr(df, time_col)
    out = df.withColumn("__t", t)
    base = Window.orderBy("__t")
    if id_col is not None:
        base = base.partitionBy(id_col)

    cols = []
    for n in lookback_rows:
        if n < 1:
            raise DataFrameValidationError("lookback_rows entries must be >= 1")
        frame = base.rowsBetween(-int(n), -1)
        for c in value_cols:
            for a in aggs:
                cols.append(_AGG_FNS[a](F.col(c)).over(frame).alias(f"{c}_{a}_last{n}"))
    return out.select("*", *cols).drop("__t")


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    windows_seconds: Sequence[int],
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    include_current: bool = False,
    sample: bool = True,
) -> DataFrame:
    """Trailing covariance/correlation between two columns per entity —
    the point-in-time co-movement feature (strictly-past ``[t - w, t)``
    frame, so zero leakage; ``include_current=True`` closes the frame).

    Per window ``w`` adds ``{x}_{y}_n_{w}s`` (pairwise-complete count —
    rows where BOTH columns are non-null), ``{x}_{y}_cov_{w}s`` and
    ``{x}_{y}_corr_{w}s``. Covariance divides by ``n - 1`` when
    ``sample=True`` (else ``n``); both are null below 2 pairs, correlation
    additionally null on zero variance (no synthetic ±inf).

    Plan shape: FIVE windowed sums + one count per window, all sharing one
    window spec — ONE exchange + sort total, with Catalyst deduplicating
    repeated window expressions; the moments combine in a narrow projection
    (textbook ``cov = (Σxy - ΣxΣy/n) / (n-1)``). The same closed form is
    what the oracle replays from ITS windowed sums, so engines agree to
    rounding — unlike built-in ``covar_samp``/``corr`` whose incremental
    update orders differ per engine.
    """
    if not windows_seconds:
        raise DataFrameValidationError("windows_seconds must be non-empty")
    for c in (x_col, y_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"rolling_corr: missing column {c!r}")

    t = _time_micros(df, time_col)
    out = df.withColumn("__t", t)
    base = Window.orderBy("__t")
    if id_col is not None:
        base = base.partitionBy(id_col)
    upper = 0 if include_current else -1

    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    xg = F.when(both, F.col(x_col).cast("double"))
    yg = F.when(both, F.col(y_col).cast("double"))

    cols = []
    for w in windows_seconds:
        frame = base.rangeBetween(-int(w) * 1_000_000, upper)
        n = F.count(xg).over(frame).cast("double")
        sx = F.sum(xg).over(frame)
        sy = F.sum(yg).over(frame)
        sxy = F.sum(xg * yg).over(frame)
        sxx = F.sum(xg * xg).over(frame)
        syy = F.sum(yg * yg).over(frame)
        cov_num = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        denom = n - 1 if sample else n
        prefix = f"{x_col}_{y_col}"
        cols.append(F.count(xg).over(frame).alias(f"{prefix}_n_{w}s"))
        cols.append(
            F.round(F.when(n >= 2, cov_num / denom), 6).alias(
                f"{prefix}_cov_{w}s"
            )
        )
        cols.append(
            F.round(
                F.when(
                    (n >= 2) & (varx > 0) & (vary > 0),
                    cov_num / F.sqrt(varx * vary),
                ),
                6,
            ).alias(f"{prefix}_corr_{w}s")
        )
    return out.select("*", *cols).drop("__t")


def ewma(
    df: DataFrame,
    value_col: str,
    halflife_rows: float,
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    out_col: str | None = None,
    include_current: bool = True,
    rel_tol: float = 1e-12,
) -> DataFrame:
    """Exponentially-weighted moving average per entity, expression-only.

    Adjusted EWMA with decay a = 2^(-1/halflife) over row positions:
        ewma_t = Σ_{i<=t} a^(t-i) x_i / Σ_{i<=t} a^(t-i)

    Implementation: collect the trailing frame (bounded at K rows where the
    dropped tail's weight a^K < ``rel_tol`` — exact to machine-irrelevant
    truncation) with ``collect_list`` over a rows window, then fold the EWMA
    recurrence ``(num, den) -> (num*a + x, den*a + 1)`` with ``F.aggregate``
    — a JVM higher-order function, no Python, no joins, no overflow (the
    naive a^(-i) cumsum rebasing trick overflows doubles on long series).

    ``include_current=False`` gives the strictly-past (leakage-safe feature)
    variant: frame ``[-K, -1]``; rows with no past yield NULL.

    When the rel_tol-exact frame would exceed the 100k-row buffer cap
    (halflife ≳ 2.5k at the default tolerance) this DELEGATES to
    :func:`ewma_segmented` over row-number-derived chunks instead of
    silently truncating weights at the cap — the segmented path is exact
    over the unbounded history with per-task buffers bounded by the chunk.
    """
    import math as _math

    if not float(halflife_rows) > 0:
        raise DataFrameValidationError("halflife_rows must be > 0")
    a = 2.0 ** (-1.0 / float(halflife_rows))
    # a^K < rel_tol  =>  K > log(rel_tol)/log(a)
    k_exact = max(1, int(_math.ceil(_math.log(rel_tol) / _math.log(a))))
    out_col = out_col or f"{value_col}_ewma"
    if k_exact > 100_000:
        # row-count chunks bound the segmented scan's state regardless of
        # the entity's time density; the rebased O(L) scan makes larger
        # chunks strictly better (fewer summary rows), and L=32768 keeps
        # the rebasing exponent 2^(L/halflife) ≤ 2^13 in the delegated
        # regime (halflife > ~2.5k)
        t0 = _time_expr(df, time_col)
        wrn = Window.orderBy(F.col("__t0"))
        if id_col is not None:
            wrn = wrn.partitionBy(id_col)
        chunked = df.withColumn("__t0", t0).withColumn(
            "_ewma_rchunk",
            ((F.row_number().over(wrn) - 1) / F.lit(32_768)).cast("long"),
        ).drop("__t0")
        return ewma_segmented(
            chunked, value_col, halflife_rows, time_col=time_col, id_col=id_col,
            chunk_col="_ewma_rchunk", out_col=out_col, include_current=include_current,
            scan="rebase",
        ).drop("_ewma_rchunk")
    k_rows = k_exact

    t = _time_expr(df, time_col)
    out = df.withColumn("__t", t)
    w = Window.orderBy("__t")
    if id_col is not None:
        w = w.partitionBy(id_col)
    frame = w.rowsBetween(-k_rows, 0 if include_current else -1)

    xs = F.collect_list(F.col(value_col).cast("double")).over(frame)
    acc0 = F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den"))
    folded = F.aggregate(
        xs,
        acc0,
        lambda acc, x: F.struct(
            (acc["num"] * a + x).alias("num"), (acc["den"] * a + F.lit(1.0)).alias("den")
        ),
    )
    val = F.when(folded["den"] > 0, folded["num"] / folded["den"])
    return out.withColumn(out_col, val).drop("__t")


def ewma_segmented(
    df: DataFrame,
    value_col: str,
    halflife_rows: float,
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    chunk_col: str | None = None,
    chunk_seconds: int | None = None,
    out_col: str | None = None,
    include_current: bool = True,
    scan: str = "fold",
) -> DataFrame:
    """Segmented-scan EWMA: exact over the entity's UNBOUNDED history with
    per-task state bounded by the time chunk, not by ``40·halflife``.

    :func:`ewma` buffers a K = min(100k, 40·halflife)-row trailing frame per
    output row — gigabytes per partition once the halflife reaches the
    thousands. Here the linear recurrence ``acc_t = a·acc_{t-1} + x_t`` is
    split at chunk boundaries using its affine composition law (running a
    length-L segment from incoming state s lands on ``s·a^L + seg_fold``):

    1. within each ``(id, chunk)``: prefix fold over the CHUNK-bounded
       expanding frame — buffer ≤ chunk rows (`_lnum/_lden` at local
       position p). NOTE the within-chunk cost: the expanding
       ``collect_list`` + per-row re-fold is O(L²) work and O(L) memory
       per row for a length-L chunk (the sequential fold is what the
       DuckDB ``list_reduce`` oracle replays bit-for-bit — an incremental
       rebased running sum would change summation order and break exact
       cross-engine equality). Size ``chunk_seconds`` so per-(id, chunk)
       row counts stay in the low tens of thousands; row-derived chunks
       (what :func:`ewma` auto-delegation uses) cap L at 32k;
    2. per-chunk summaries (total fold + row count) collapse to one row per
       chunk — map-side-combinable, skew-free;
    3. the cross-chunk carry ``s_c = s_{c-1}·a^{L_{c-1}} + tot_{c-1}`` folds
       over the tiny ordered summary table and sort-merge-joins back (the
       same shape as ``shift_target_chunked``'s boundary repair);
    4. ``value = (s_c·a^p + lnum_p) / (s_den·a^p + lden_p)``.

    ``a^p`` underflows to 0 for p ≫ halflife — exactly where the true carry
    contribution is below machine precision, so the result matches the
    mathematical EWMA to double rounding. Output is identical to
    :func:`ewma` up to its ``rel_tol`` frame truncation.

    ``include_current=False`` is the strictly-past (leakage-safe feature)
    variant; first row of the first chunk yields NULL.

    ``scan='fold'`` (default) is the sequential within-chunk fold above —
    O(L²) per chunk but replayed bit-for-bit by the DuckDB ``list_reduce``
    oracle. ``scan='rebase'`` computes the same prefix via incremental
    running sums rebased at the chunk origin — O(L) per chunk, the fast
    lane :func:`ewma` auto-delegation uses — valid while the within-chunk
    exponent stays in double range (chunk rows < 600·halflife; a row-level
    ``assert_true`` guard raises past it instead of silently overflowing).
    The two scans agree to double rounding, including on NULL values: a
    NULL row is skipped entirely — it contributes nothing AND does not
    advance the decay (``collect_list`` drops NULLs, so the fold's decay
    index is the non-NULL position; the rebase sums and the cross-chunk
    carry index decay by the running non-NULL count to match). This is
    pandas ``ewm(..., adjust=True, ignore_na=True)`` semantics and what
    plain :func:`ewma` computes, so the auto-delegation boundary is
    seamless on NULL-containing data.
    """
    if not float(halflife_rows) > 0:
        raise DataFrameValidationError("halflife_rows must be > 0")
    if scan not in ("fold", "rebase"):
        raise DataFrameValidationError("scan must be 'fold' or 'rebase'")
    a = 2.0 ** (-1.0 / float(halflife_rows))
    out_col = out_col or f"{value_col}_ewma"

    if chunk_col is None:
        if chunk_seconds is None:
            raise DataFrameValidationError("pass chunk_col or chunk_seconds")
        from temporalscope_spark.operators.shift import with_time_chunk

        chunk_col = "_ewma_chunk"
        df = with_time_chunk(df, time_col, chunk_seconds, chunk_col)
        drop_chunk = True
    else:
        drop_chunk = False

    t = _time_expr(df, time_col)
    base = df.withColumn("__t", t)
    part = ([id_col] if id_col else []) + [chunk_col]
    w = Window.partitionBy(*part).orderBy("__t")
    inc_frame = w.rowsBetween(Window.unboundedPreceding, 0)

    # NULL semantics shared by every scan (and by plain ewma's collect_list
    # fold): a NULL value row is skipped — no contribution, no decay step.
    # All decay exponents therefore index by the running NON-NULL count
    # (F.count skips NULLs), never by the row number.
    base = base.withColumn("_rn_inc", F.row_number().over(w)).withColumn(
        "_nn_inc", F.count(F.col(value_col)).over(inc_frame)
    )

    # 1. within-chunk prefix scan (expanding frame bounded by the chunk)
    acc0 = F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den"))
    if scan == "rebase":
        # num_p = a^p · Σ_{i<=p, x_i not null} x_i·a^(−i): two incremental
        # running sums (Spark evaluates unbounded-preceding frames with a
        # running accumulator — O(L) per chunk) + a rebasing power per row,
        # i = non-null position. The exponent a^(−i) = 2^(i/halflife) must
        # stay in double range: guarded at i = 600·halflife (delegation
        # chunks are 32768 rows at halflife > 2509, safe by construction)
        nn = F.col("_nn_inc")
        limit = max(1, int(600.0 * float(halflife_rows)))
        guard = F.coalesce(
            F.assert_true(
                nn <= F.lit(limit),
                F.lit(
                    "ewma_segmented(scan='rebase'): chunk longer than "
                    f"600*halflife non-null rows ({limit}) — the rebased "
                    "exponent would overflow; shrink chunks or use "
                    "scan='fold'"
                ),
            ).cast("double"),
            F.lit(0.0),
        )
        notnull = F.col(value_col).isNotNull()
        inv = F.pow(F.lit(a), -nn)
        snum = F.sum(F.when(notnull, F.col(value_col).cast("double") * inv)).over(
            inc_frame
        )
        sden = F.sum(F.when(notnull, inv)).over(inc_frame)
        apr = F.pow(F.lit(a), nn)
        # coalesce: an all-NULL prefix must fold to (0, 0) — NULL here would
        # poison the carry merge in step 4 and wrongly NULL rows whose EWMA
        # is carried entirely from earlier chunks
        folded = F.struct(
            (apr * F.coalesce(snum, F.lit(0.0)) + guard).alias("num"),
            (apr * F.coalesce(sden, F.lit(0.0))).alias("den"),
        )
    else:
        xs = F.collect_list(F.col(value_col).cast("double")).over(inc_frame)
        folded = F.aggregate(
            xs,
            acc0,
            lambda acc, x: F.struct(
                (acc["num"] * a + x).alias("num"), (acc["den"] * a + F.lit(1.0)).alias("den")
            ),
        )
    # _p: the rebasing power for the cross-chunk carry — the number of
    # non-NULL values in the within-chunk prefix the row sees
    base = base.withColumn("_lf_inc", folded).withColumn(
        "_p",
        F.col("_nn_inc")
        if include_current
        else F.col("_nn_inc") - F.col(value_col).isNotNull().cast("int"),
    )
    if include_current:
        base = base.withColumn("_lf", F.col("_lf_inc"))
    else:
        # strictly past: previous row's INCLUSIVE prefix (= fold over the
        # non-NULLs strictly before the current row); first row of a chunk
        # falls back to the pure carry (lnum=lden=0, a^0=1). _p was already
        # computed as the strictly-past non-null count above.
        zero = F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den"))
        base = base.withColumn(
            "_lf", F.coalesce(F.lag("_lf_inc", 1).over(w), zero)
        )

    # 2. one summary row per (id, chunk): total INCLUSIVE fold + row count.
    # max_by keys on the ROW NUMBER, not the timestamp — with duplicate
    # timestamps max_by(.., __t) tie-breaks non-deterministically and could
    # carry an incomplete prefix into every later chunk
    # _L counts NON-NULL values (count(col) skips NULLs): the carry decays
    # by the chunk's non-null length — a NULL row adds no decay step, same
    # as within-chunk
    summ = base.groupBy(*part).agg(
        F.max_by(F.col("_lf_inc"), F.col("_rn_inc")).alias("_tot"),
        F.count(F.col(value_col)).alias("_L"),
    )
    base = base.drop("_lf_inc", "_rn_inc", "_nn_inc")

    # 3. cross-chunk carry over the ordered summary table (tiny: one row per
    # chunk), prefix fold with the affine composition law
    wc = Window.partitionBy(*([id_col] if id_col else [F.lit(1)])).orderBy(chunk_col)
    hist = F.collect_list(F.struct(F.col("_tot"), F.col("_L"))).over(
        wc.rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = F.aggregate(
        hist,
        acc0,
        lambda acc, h: F.struct(
            (acc["num"] * F.pow(F.lit(a), h["_L"]) + h["_tot"]["num"]).alias("num"),
            (acc["den"] * F.pow(F.lit(a), h["_L"]) + h["_tot"]["den"]).alias("den"),
        ),
    )
    carry_df = summ.select(*part, carry.alias("_carry"))

    # 4. merge-join the carry back (grows with the corpus — never broadcast)
    out = base.join(carry_df.hint("merge"), part, "left")
    apow = F.pow(F.lit(a), F.col("_p"))
    num = F.col("_carry")["num"] * apow + F.col("_lf")["num"]
    den = F.col("_carry")["den"] * apow + F.col("_lf")["den"]
    out = out.withColumn(out_col, F.when(den > 0, num / den)).drop(
        "__t", "_lf", "_p", "_carry"
    )
    return out.drop(chunk_col) if drop_chunk else out


def expanding_features(
    df: DataFrame,
    value_cols: Sequence[str],
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    aggs: Sequence[str] = ("count", "avg"),
    include_current: bool = False,
) -> DataFrame:
    """Expanding (cumulative since entity start) aggregates, strictly past.

    ``{c}_{a}_expanding`` = a(c) over ALL prior rows of the entity
    (``[-inf, -1]``; ``include_current=True`` closes to the current row).
    Same one-exchange plan shape as :func:`rolling_features` — expanding
    frames are the w→∞ special case and share the window partitioning.
    """
    if not value_cols:
        raise DataFrameValidationError("value_cols must be non-empty")
    _validate_aggs(aggs)
    t = _time_micros(df, time_col)
    out = df.withColumn("__t", t)
    base = Window.orderBy("__t")
    if id_col is not None:
        base = base.partitionBy(id_col)
    # RANGE (not ROWS) frame on the integer-µs axis: with duplicate
    # timestamps a rows-frame would include same-time rows (simultaneous-
    # information leakage) nondeterministically; range excludes ALL rows at
    # the current timestamp from the strictly-past frame.
    frame = base.rangeBetween(Window.unboundedPreceding, 0 if include_current else -1)
    cols = [
        _AGG_FNS[a](F.col(c)).over(frame).alias(f"{c}_{a}_expanding")
        for c in value_cols
        for a in aggs
    ]
    return out.select("*", *cols).drop("__t")


def target_encode_expanding(
    df: DataFrame,
    category_col: str,
    target_col: str,
    time_col: str = "event_time",
    out_col: str | None = None,
    prior: float | None = None,
    smoothing: float = 0.0,
) -> DataFrame:
    """Leakage-safe temporal target encoding: each row's category is encoded
    as the mean of STRICTLY EARLIER targets of the same category.

    The classic target-encoding leak (a row's own target influencing its
    encoding) is structurally impossible here: the frame is
    ``[-inf, -1]`` over time order within the category. With ``smoothing``
    m > 0 the encoding shrinks toward ``prior`` (default: global mean of
    strictly-nothing — pass an explicit prior at scale; computing the global
    mean here would add a job): ``(sum + m·prior) / (count + m)``. Rows with
    no history encode as ``prior`` (or NULL without one).

    One exchange on the category key — the same shape as any per-entity
    window; skewed categories behave like skewed entities (salt upstream or
    pre-cluster by category).
    """
    out_col = out_col or f"{category_col}_te"
    t = _time_micros(df, time_col)
    out = df.withColumn("__t", t)
    # RANGE frame on integer µs: rows sharing a timestamp within a category
    # must not see each other's targets (same-instant leakage) — a rows
    # frame would include one of them nondeterministically
    w = Window.partitionBy(category_col).orderBy("__t").rangeBetween(
        Window.unboundedPreceding, -1
    )
    s = F.sum(F.col(target_col).cast("double")).over(w)
    n = F.count(F.col(target_col)).over(w)
    if smoothing > 0:
        if prior is None:
            raise DataFrameValidationError("smoothing > 0 requires an explicit prior")
        enc = (F.coalesce(s, F.lit(0.0)) + F.lit(smoothing * prior)) / (
            n + F.lit(float(smoothing))
        )
    else:
        enc = s / n  # NULL when no history
        if prior is not None:
            enc = F.coalesce(enc, F.lit(float(prior)))
    return out.withColumn(out_col, enc).drop("__t")


def normalize_features(
    df: DataFrame,
    value_cols: Sequence[str],
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
    method: str = "zscore",
    include_current: bool = False,
) -> DataFrame:
    """Leakage-safe per-entity feature normalization.

    ``zscore``: ``(x − mean_past) / std_past``; ``minmax``:
    ``(x − min_past) / (max_past − min_past)`` — statistics computed over
    the entity's STRICTLY-PAST rows (RANGE frame on the integer-µs axis, so
    duplicate timestamps never leak same-instant values;
    ``include_current=True`` closes the frame for train-time use). The
    point-in-time analogue of sklearn's StandardScaler/MinMaxScaler that a
    temporal pipeline actually needs — fitting a global scaler on the full
    table leaks future distribution shift into early rows.

    Degenerate windows (no past, zero variance/range) yield NULL via
    ``try_divide`` — never an ANSI error. All normalized columns share ONE
    window partitioning (single exchange, like :func:`rolling_features`).
    Output columns: ``{c}_norm``.
    """
    if not value_cols:
        raise DataFrameValidationError("value_cols must be non-empty")
    if method not in ("zscore", "minmax"):
        raise DataFrameValidationError("method must be 'zscore' or 'minmax'")
    t = _time_micros(df, time_col)
    out = df.withColumn("__t", t)
    base = Window.orderBy("__t")
    if id_col is not None:
        base = base.partitionBy(id_col)
    frame = base.rangeBetween(Window.unboundedPreceding, 0 if include_current else -1)
    cols = []
    for c in value_cols:
        x = F.col(c).cast("double")
        if method == "zscore":
            norm = F.try_divide(x - F.avg(x).over(frame), F.stddev_samp(x).over(frame))
        else:
            lo, hi = F.min(x).over(frame), F.max(x).over(frame)
            norm = F.try_divide(x - lo, hi - lo)
        cols.append(norm.alias(f"{c}_norm"))
    return out.select("*", *cols).drop("__t")
