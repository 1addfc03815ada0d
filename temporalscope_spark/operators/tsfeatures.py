"""Per-series temporal feature extraction: autocorrelation and Fourier
time encodings.

The reference's feature story stops at lag/lead shifts and sliding-window
partitions (/root/reference/src/temporalscope/target_shifters/
single_step.py:265-301, partition/sliding_window.py); a temporal feature
engine additionally needs the classic series-level descriptors — the
autocorrelation function (the first thing a forecaster computes per
series, and the standard seasonality/AR-order diagnostic) and periodic
sin/cos encodings (the standard way to hand a model time-of-day /
day-of-week as continuous features).

Plan shapes (both 100 TB-safe):

* ``acf_features``: K ``lag()`` columns sharing ONE window spec (one
  exchange + sort, amortized across every lag) → ONE map-side-combinable
  ``groupBy(entity)`` aggregation producing all cross-moments → a narrow
  closed-form projection. Output is entity-sized, not row-sized. With the
  bucketed layout (``TemporalFrame.ensure_layout``) the window and the
  aggregation both run exchange-free.
* ``fourier_time_features``: pure narrow projection — zero exchanges at
  any scale.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.rolling import _time_expr, _time_micros


def acf_features(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity sample autocorrelation at lags ``1..max_lag``.

    Uses the standard global-mean estimator (statsmodels' ``acf`` /
    Box–Jenkins): with ``x̄`` the series mean over its n non-null points,

        ρ(k) = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²

    (denominator is the full-series sum of squares, NOT the lag-k
    subset's — that keeps |ρ| ≤ 1 and matches every published ACF
    implementation). Null values are dropped first, so the ACF is over
    the series' non-null subsequence in time order; pass ``tiebreak_col``
    (a unique row id) to make the order — and therefore the ACF on data
    with duplicate timestamps — fully deterministic (the shipped query
    orders by (ts, event_id)).

    Expanding the numerator gives a pure cross-moment form the SQL
    oracle replays exactly from integer-count + double sums:

        num_k = Σ x_t·x_{t−k} − x̄·(Σ_{t>k} x_t + Σ_{t>k} x_{t−k}) + m_k·x̄²

    Output: one row per entity — ``(id, n_obs, mean, acf_1..acf_K)``,
    floats rounded to 6; ``acf_k`` is NULL when the series has zero
    variance or fewer than ``k + 1`` points.
    """
    if max_lag < 1:
        raise DataFrameValidationError("max_lag must be >= 1")
    if value_col not in df.columns:
        raise DataFrameValidationError(f"acf_features: missing column {value_col!r}")

    x = F.col(value_col).cast("double")
    tb = [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []
    base = (
        df.filter(x.isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            _time_micros(df, time_col).alias("_t"),
            *tb,
            x.alias("_x"),
        )
    )
    order = ["_t", "_tb"] if tiebreak_col else ["_t"]
    w = Window.partitionBy("_id").orderBy(*order)
    lagged = base.select(
        "_id",
        "_x",
        *[F.lag("_x", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )

    aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_s1"),
        F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        aggs.extend(
            [
                F.count(lk).cast("double").alias(f"_m{k}"),
                F.sum(F.col("_x") * lk).alias(f"_cxy{k}"),
                F.sum(F.when(lk.isNotNull(), F.col("_x"))).alias(f"_ca{k}"),
                F.sum(lk).alias(f"_cb{k}"),
            ]
        )
    mom = lagged.groupBy("_id").agg(*aggs)

    mean = F.col("_s1") / F.col("_n")
    sse = F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")
    out_cols = [
        F.col("_id").alias(id_col),
        F.col("_n").cast("long").alias("n_obs"),
        (F.round(mean, 6) + F.lit(0.0)).alias("mean"),
    ]
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"_cxy{k}")
            - mean * (F.col(f"_ca{k}") + F.col(f"_cb{k}"))
            + F.col(f"_m{k}") * mean * mean
        )
        out_cols.append(
            (
                F.round(
                    F.when((F.col(f"_m{k}") >= 1) & (sse > 0), num / sse), 6
                )
                + F.lit(0.0)  # canonicalize -0.0; NULL + 0.0 stays NULL
            ).alias(f"acf_{k}")
        )
    return mom.select(*out_cols)


def series_features(
    df: DataFrame,
    value_col: str,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity tsfresh-style series descriptors over the time-ordered
    non-null values (the classic per-series feature battery — tsfresh's
    ``abs_energy`` / ``mean_abs_change`` / ``mean_change`` / ``cid_ce``
    / peak and direction-change counts, plus the longest strictly
    increasing streak):

    * ``abs_energy``       — Σ x² (tsfresh ``abs_energy``).
    * ``mean_abs_change``  — mean |x_t − x_{t−1}|; NULL when n < 2.
    * ``mean_change``      — mean (x_t − x_{t−1}) = (x_n − x_1)/(n−1);
      NULL when n < 2.
    * ``cid_ce``           — √Σ (x_t − x_{t−1})² (CID complexity,
      unnormalized — tsfresh ``cid_ce(normalize=False)``); NULL when
      n < 2.
    * ``n_peaks``          — count of strict local maxima
      (x_{t−1} < x_t > x_{t+1}).
    * ``n_dir_changes``    — count of sign flips between consecutive
      diffs ((x_t − x_{t−1})·(x_{t−1} − x_{t−2}) < 0).
    * ``longest_inc_run``  — longest streak of consecutive strictly
      increasing STEPS (0 when no step increases).

    Pass ``tiebreak_col`` (a unique row id) for a fully deterministic
    order on duplicate timestamps — the same contract as
    :func:`acf_features`.

    Plan shape: ONE entity-keyed window computes lag/lead/diffs AND the
    run id (a cumulative count of non-increasing steps — the sessionize
    idiom) in a single exchange+sort; a second window keyed by
    (entity, run) turns runs into streak lengths; ONE ``groupBy(entity)``
    folds everything. Three exchanges total, one corpus scan, no joins,
    no duplicated subtree; output is entity-sized.

    Output: ``(id, n_obs, abs_energy, mean_abs_change, mean_change,
    cid_ce, n_peaks, n_dir_changes, longest_inc_run)``, floats rounded
    to 6.
    """
    if value_col not in df.columns:
        raise DataFrameValidationError(
            f"series_features: missing column {value_col!r}"
        )
    x = F.col(value_col).cast("double")
    tb = [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []
    base = df.filter(x.isNotNull()).select(
        F.col(id_col).alias("_id"),
        _time_micros(df, time_col).alias("_t"),
        *tb,
        x.alias("_x"),
    )
    order = ["_t", "_tb"] if tiebreak_col else ["_t"]
    w = Window.partitionBy("_id").orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inc = F.col("_x") > F.lag("_x", 1).over(w)  # NULL on the first row
    lagged = base.select(
        "_id",
        "_x",
        F.lag("_x", 1).over(w).alias("_l1"),
        F.lag("_x", 2).over(w).alias("_l2"),
        F.lead("_x", 1).over(w).alias("_f1"),
        # run id increments on every non-increasing (or first) step, so
        # consecutive increasing steps share an id
        F.sum(F.when(inc, F.lit(0)).otherwise(F.lit(1)))
        .over(wcum)
        .alias("_run"),
        F.when(inc, F.lit(1)).otherwise(F.lit(0)).alias("_inc"),
    )
    wrun = Window.partitionBy("_id", "_run")
    streaked = lagged.withColumn("_streak", F.sum("_inc").over(wrun))

    d1 = F.col("_x") - F.col("_l1")
    d0 = F.col("_l1") - F.col("_l2")
    mom = streaked.groupBy("_id").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
        F.count("_l1").cast("double").alias("_nd"),
        F.sum(F.abs(d1)).alias("_sad"),
        F.sum(d1).alias("_sd"),
        F.sum(d1 * d1).alias("_sdd"),
        F.sum(
            F.when((F.col("_l1") < F.col("_x")) & (F.col("_x") > F.col("_f1")), 1)
            .otherwise(0)
        ).alias("_peaks"),
        F.sum(F.when(d1 * d0 < 0, 1).otherwise(0)).alias("_dirch"),
        F.max("_streak").alias("_maxrun"),
    )
    nd = F.col("_nd")
    return mom.select(
        F.col("_id").alias(id_col),
        F.col("_n").cast("long").alias("n_obs"),
        (F.round(F.col("_s2"), 6) + F.lit(0.0)).alias("abs_energy"),
        (F.round(F.when(nd >= 1, F.col("_sad") / nd), 6) + F.lit(0.0)).alias(
            "mean_abs_change"
        ),
        (F.round(F.when(nd >= 1, F.col("_sd") / nd), 6) + F.lit(0.0)).alias(
            "mean_change"
        ),
        (F.round(F.when(nd >= 1, F.sqrt(F.col("_sdd"))), 6) + F.lit(0.0)).alias(
            "cid_ce"
        ),
        F.col("_peaks").cast("long").alias("n_peaks"),
        F.col("_dirch").cast("long").alias("n_dir_changes"),
        F.col("_maxrun").cast("long").alias("longest_inc_run"),
    )


def dft_features(
    df: DataFrame,
    value_col: str,
    n_coeffs: int = 3,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity discrete-Fourier coefficients at the ``n_coeffs``
    lowest positive frequencies over the time-ordered non-null series —
    tsfresh's ``fft_coefficient`` / the periodogram screen a forecaster
    runs to find dominant cycles. For frequency ``k``:

        Re_k = Σ_t x_t · cos(2π·k·t/n),   Im_k = −Σ_t x_t · sin(2π·k·t/n)

    with ``t`` the 0-based position in the entity's ordered series and
    ``n`` its length (numpy ``fft.fft`` sign convention). Output per
    frequency: magnitude ``|c_k| = √(Re²+Im²)``. ``dft_mag_k`` is NULL
    when the series is shorter than ``k + 1`` points (the frequency is
    not resolvable). Positions index the non-null SUBSEQUENCE — gaps
    compress, the same convention as :func:`acf_features`; pass
    ``tiebreak_col`` for determinism on duplicate timestamps.

    Plan shape: ONE entity-keyed window computes the 0-based position
    AND the series length (row_number + a whole-partition count sharing
    the exchange), then ONE map-side-combinable ``groupBy(entity)``
    folds all 2·K trigonometric sums. Output is entity-sized.

    Output: ``(id, n_obs, dft_mag_1..dft_mag_K)``, floats rounded to 6.
    """
    if n_coeffs < 1:
        raise DataFrameValidationError("n_coeffs must be >= 1")
    if value_col not in df.columns:
        raise DataFrameValidationError(f"dft_features: missing column {value_col!r}")
    x = F.col(value_col).cast("double")
    tb = [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []
    base = df.filter(x.isNotNull()).select(
        F.col(id_col).alias("_id"),
        _time_micros(df, time_col).alias("_t"),
        *tb,
        x.alias("_x"),
    )
    order = ["_t", "_tb"] if tiebreak_col else ["_t"]
    w = Window.partitionBy("_id").orderBy(*order)
    wall = Window.partitionBy("_id")
    pos = (F.row_number().over(w) - 1).cast("double")
    n = F.count(F.lit(1)).over(wall).cast("double")
    theta = F.lit(2.0 * math.pi) * pos / n
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for k in range(1, n_coeffs + 1):
        aggs += [
            F.sum(F.col("_x") * F.cos(F.lit(float(k)) * F.col("_th"))).alias(
                f"_re{k}"
            ),
            F.sum(-F.col("_x") * F.sin(F.lit(float(k)) * F.col("_th"))).alias(
                f"_im{k}"
            ),
        ]
    mom = (
        base.select("_id", "_x", theta.alias("_th"))
        .groupBy("_id")
        .agg(*aggs)
    )
    out = [
        F.col("_id").alias(id_col),
        F.col("_n").cast("long").alias("n_obs"),
    ]
    for k in range(1, n_coeffs + 1):
        mag = F.sqrt(
            F.col(f"_re{k}") * F.col(f"_re{k}")
            + F.col(f"_im{k}") * F.col(f"_im{k}")
        )
        out.append(
            (F.round(F.when(F.col("_n") > k, mag), 6) + F.lit(0.0)).alias(
                f"dft_mag_{k}"
            )
        )
    return mom.select(*out)


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    period_seconds: int,
    phase_seconds: int,
    time_col: str = "event_time",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """Classical additive decomposition (the moving-average method of
    statsmodels' ``seasonal_decompose``, adapted to irregular distributed
    series): ``x = trend + seasonal + resid`` where

    * ``trend``     — centered mean over ``[t − period/2, t + period/2]``
      (time-RANGE frame, so gaps and irregular sampling are handled by
      construction);
    * ``seasonal``  — per-(entity, phase) mean of the detrended values,
      with ``phase = floor((epoch mod period) / phase_seconds)`` (e.g.
      period 86400 / phase 3600 = hour-of-day);
    * ``resid``     — what's left.

    DIAGNOSTIC op: the trend window is two-sided, so this is NOT
    leakage-safe — use :func:`~temporalscope_spark.operators.rolling.
    rolling_features` for point-in-time features; this is the corpus-level
    seasonality profile (drift dashboards, anomaly baselines).

    Plan shape: one windowed sum+count (single exchange on the entity
    key), one bounded ``groupBy(entity, phase)`` mean broadcast back, one
    narrow projection. Output: input + ``(phase, trend, seasonal, resid)``
    rounded to 6 (NULL where the value is NULL).
    """
    if period_seconds <= 0 or phase_seconds <= 0:
        raise DataFrameValidationError("period_seconds and phase_seconds must be > 0")
    if period_seconds % phase_seconds != 0:
        raise DataFrameValidationError(
            "phase_seconds must divide period_seconds evenly"
        )
    if value_col not in df.columns:
        raise DataFrameValidationError(
            f"seasonal_decompose: missing column {value_col!r}"
        )
    x = F.col(value_col).cast("double")
    t_us = _time_micros(df, time_col)
    half = int(period_seconds) * 1_000_000 // 2
    out = df.withColumn("__t", t_us).withColumn(
        "phase",
        F.floor(
            (F.col("__t") % (int(period_seconds) * 1_000_000))
            / (int(phase_seconds) * 1_000_000)
        ).cast("int"),
    )
    base = Window.orderBy("__t")
    keys = [id_col] if id_col is not None else []
    if id_col is not None:
        base = base.partitionBy(id_col)
    frame = base.rangeBetween(-half, half)
    trend = F.sum(x).over(frame) / F.count(x).over(frame)
    out = out.withColumn("_trend", trend).withColumn("_det", x - F.col("_trend"))
    seas = out.groupBy(*keys, "phase").agg(
        (F.sum("_det") / F.count("_det")).alias("_seasonal")
    )
    joined = out.join(F.broadcast(seas), [*keys, "phase"])
    return joined.select(
        *[c for c in df.columns],
        "phase",
        (F.round("_trend", 6) + F.lit(0.0)).alias("trend"),
        (F.round("_seasonal", 6) + F.lit(0.0)).alias("seasonal"),
        (F.round(F.col("_det") - F.col("_seasonal"), 6) + F.lit(0.0)).alias(
            "resid"
        ),
    )


def recency_features(
    df: DataFrame,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    type_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append strictly-past recency gaps in seconds (rounded 6):
    ``since_any`` — time since the entity's previous event — and, given
    ``type_col``, ``since_same_type`` — time since the previous event of
    the SAME type (the "how long since this user last erred / last
    purchased" feature family). First events get NULL (no past exists —
    never 0, which would alias "just happened").

    One ``lag()`` per window spec, both partitioned by entity (the
    second additionally by type): two window operators sharing the
    entity shuffle key; with the bucketed layout this runs
    exchange-free. Pass ``tiebreak_col`` for deterministic order under
    duplicate timestamps.
    """
    if time_col not in df.columns or id_col not in df.columns:
        raise DataFrameValidationError(
            f"recency_features: missing column {time_col!r} or {id_col!r}"
        )
    if type_col is not None and type_col not in df.columns:
        raise DataFrameValidationError(
            f"recency_features: missing column {type_col!r}"
        )
    t = _time_micros(df, time_col)
    out = df.withColumn("_t_us", t)
    order = ["_t_us"] + ([tiebreak_col] if tiebreak_col else [])
    w_any = Window.partitionBy(id_col).orderBy(*order)
    out = out.withColumn(
        "since_any",
        F.round(
            (F.col("_t_us") - F.lag("_t_us", 1).over(w_any))
            / F.lit(1_000_000.0),
            6,
        ),
    )
    if type_col is not None:
        w_type = Window.partitionBy(id_col, type_col).orderBy(*order)
        out = out.withColumn(
            "since_same_type",
            F.round(
                (F.col("_t_us") - F.lag("_t_us", 1).over(w_type))
                / F.lit(1_000_000.0),
                6,
            ),
        )
    return out.drop("_t_us")


def entity_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    time_col: str = "event_time",
    value_col: str | None = None,
) -> DataFrame:
    """One row per entity with its lifetime descriptors — the entity
    feature table an as-of join (``operators/asof.py``) serves back onto
    event streams: ``n_events``, ``first_ts``/``last_ts``,
    ``tenure_seconds``, ``active_days`` (distinct UTC dates), and, given
    ``value_col``, ``{v}_mean/_min/_max`` (rounded 6).

    ONE map-side-combinable ``groupBy(entity)`` aggregation; output is
    entity-sized. ``count(DISTINCT date)`` keeps the partial aggregation
    combinable per group (dates per entity are bounded by tenure).
    """
    if id_col not in df.columns or time_col not in df.columns:
        raise DataFrameValidationError(
            f"entity_profile: missing column {id_col!r} or {time_col!r}"
        )
    if value_col is not None and value_col not in df.columns:
        raise DataFrameValidationError(
            f"entity_profile: missing column {value_col!r}"
        )
    t_us = _time_micros(df, time_col)
    base = df.withColumn("_t_us", t_us)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.col(time_col)).alias("first_ts"),
        F.max(F.col(time_col)).alias("last_ts"),
        F.round(
            (F.max("_t_us") - F.min("_t_us")) / F.lit(1_000_000.0), 6
        ).alias("tenure_seconds"),
        F.countDistinct(F.to_date(F.col(time_col))).alias("active_days"),
    ]
    if value_col is not None:
        x = F.col(value_col).cast("double")
        aggs += [
            F.round(F.avg(x), 6).alias(f"{value_col}_mean"),
            F.round(F.min(x), 6).alias(f"{value_col}_min"),
            F.round(F.max(x), 6).alias(f"{value_col}_max"),
        ]
    return base.groupBy(id_col).agg(*aggs)


def trend_features(
    df: DataFrame,
    value_col: str,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    time_unit_seconds: float = 3600.0,
) -> DataFrame:
    """Per-entity linear trend: OLS of the value on time — one row per
    entity with ``(id, n_obs, slope, intercept, r2)``, the "is this
    series drifting and how fast" descriptor next to
    :func:`acf_features`.

    Time is measured in ``time_unit_seconds`` units (default: hours)
    FROM THE ENTITY'S FIRST EVENT — re-zeroing both conditions the
    normal equations (epoch-seconds² overflows double precision's 15
    digits) and makes the intercept "level at the series start", the
    quantity a feature actually wants. Closed forms from ONE
    map-side-combinable aggregation of (n, Σt, Σy, Σt², Σy², Σty):

        slope = (nΣty − ΣtΣy) / (nΣt² − (Σt)²),  r² = corr²

    NULL slope/r² on < 2 points or zero time variance; NULL r² also on
    zero value variance. Floats round to 6. The per-entity min-time
    re-zeroing needs the entity's min first — a window ``min`` sharing
    the same entity key as the aggregation (one shuffle total).
    """
    for c in (value_col, time_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"trend_features: missing column {c!r}")
    if time_unit_seconds <= 0:
        raise DataFrameValidationError(
            "trend_features: time_unit_seconds must be > 0"
        )
    y = F.col(value_col).cast("double")
    t_us = _time_micros(df, time_col)
    base = df.select(
        F.col(id_col).alias("_id"), t_us.alias("_tu"), y.alias("_y")
    ).filter(F.col("_y").isNotNull())
    w = Window.partitionBy("_id")
    base = base.withColumn(
        "_t",
        (F.col("_tu") - F.min("_tu").over(w))
        / F.lit(1_000_000.0 * float(time_unit_seconds)),
    )
    agg = base.groupBy("_id").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_t").alias("_st"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_t") * F.col("_t")).alias("_stt"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_t") * F.col("_y")).alias("_sty"),
    )
    n = F.col("_n")
    dt_ = n * F.col("_stt") - F.col("_st") * F.col("_st")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = n * F.col("_sty") - F.col("_st") * F.col("_sy")
    slope = F.when((n >= 2) & (dt_ > 0), num / dt_)
    return agg.select(
        F.col("_id").alias(id_col),
        n.cast("long").alias("n_obs"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(
                (n >= 2) & (dt_ > 0),
                (F.col("_sy") - slope * F.col("_st")) / n,
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when((n >= 2) & (dt_ > 0) & (dy > 0), num * num / (dt_ * dy)),
            6,
        ).alias("r2"),
    )


def calendar_features(
    df: DataFrame,
    time_col: str = "event_time",
    prefix: str | None = None,
) -> DataFrame:
    """Append the discrete calendar encodings models consume alongside
    the Fourier pair: ``{p}_hour`` (0–23), ``{p}_dow`` (ISO 1=Mon..7=Sun
    — the convention both engines and every scheduler agree on, unlike
    Spark's Sunday-first ``dayofweek``), ``{p}_day``, ``{p}_month``,
    ``{p}_quarter``, ``{p}_year``, ``{p}_is_weekend``,
    ``{p}_is_month_start``, ``{p}_is_month_end`` (via ``last_day``, so
    leap-February works). Pure narrow projection — folds into whatever
    scan reads the time column; NULL timestamps yield NULL features.
    """
    if time_col not in df.columns:
        raise DataFrameValidationError(
            f"calendar_features: missing column {time_col!r}"
        )
    p = prefix if prefix is not None else time_col
    t = F.col(time_col)
    dow = (F.weekday(t) + 1).cast("int")  # ISO: Monday=1 .. Sunday=7
    return df.select(
        "*",
        F.hour(t).cast("int").alias(f"{p}_hour"),
        dow.alias(f"{p}_dow"),
        F.dayofmonth(t).cast("int").alias(f"{p}_day"),
        F.month(t).cast("int").alias(f"{p}_month"),
        F.quarter(t).cast("int").alias(f"{p}_quarter"),
        F.year(t).cast("int").alias(f"{p}_year"),
        (dow >= 6).cast("int").alias(f"{p}_is_weekend"),
        (F.dayofmonth(t) == 1).cast("int").alias(f"{p}_is_month_start"),
        (F.dayofmonth(t) == F.dayofmonth(F.last_day(t)))
        .cast("int")
        .alias(f"{p}_is_month_end"),
    )


def fourier_time_features(
    df: DataFrame,
    time_col: str = "event_time",
    period_seconds: int = 86_400,
    harmonics: int = 2,
    prefix: str | None = None,
) -> DataFrame:
    """Append periodic sin/cos encodings of the time column: for each
    harmonic ``h`` in ``1..harmonics``,

        sin(2π·h·(epoch mod period)/period),  cos(...)

    — the standard continuous encoding for time-of-day / day-of-week
    seasonality (period 86400 = daily, 604800 = weekly). Column names:
    ``{prefix}_sin_{h}`` / ``{prefix}_cos_{h}`` with the prefix
    defaulting to ``{time_col}_{period}s``. Pure narrow projection; at
    100 TB this folds into whatever scan already reads the time column.
    """
    if harmonics < 1:
        raise DataFrameValidationError("harmonics must be >= 1")
    if period_seconds <= 0:
        raise DataFrameValidationError("period_seconds must be > 0")
    p = prefix if prefix is not None else f"{time_col}_{period_seconds}s"
    sec = _time_expr(df, time_col)
    phase = (sec % F.lit(float(period_seconds))) / F.lit(float(period_seconds))
    two_pi = 2.0 * 3.141592653589793
    cols = []
    for h in range(1, harmonics + 1):
        ang = F.lit(two_pi * h) * phase
        # + 0.0 canonicalizes IEEE -0.0 (sin at half-period rounds to a
        # signed zero whose byte representation differs across engines)
        cols.append((F.round(F.sin(ang), 6) + F.lit(0.0)).alias(f"{p}_sin_{h}"))
        cols.append((F.round(F.cos(ang), 6) + F.lit(0.0)).alias(f"{p}_cos_{h}"))
    return df.select("*", *cols)


def rfm_features(
    df: DataFrame,
    time_col: str,
    id_col: str,
    value_col: str,
    asof: float | None = None,
    n_bins: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) entity features with quantile
    scores — the classic customer-value segmentation (Hughes 1994) and a
    staple entity-level feature block.

    Per entity: ``recency_s`` = seconds from its last event to ``asof``
    (default: the global max timestamp — one bounded 1-row aggregate),
    ``frequency`` = event count, ``monetary`` = sum of ``value_col``
    (0.0 when all-null). Scores bin each measure into ``1..n_bins`` by
    EXACT quantile edges fitted on the entity table (edges rounded to 6
    and inlined as plan literals — the ``quantile_bin`` convention; the
    ``percentile_approx`` sketch is the 100 TB swap). Recency is
    inverted (most recent → highest score), so ``r=f=m=n_bins`` is the
    best segment.

    Plan shape: ONE ``groupBy(entity)`` aggregation builds the entity
    table (persisted — it feeds the edge fit AND the output), ONE fused
    1-row aggregation fits all 3×(n_bins−1) edges, scoring is
    expression-only. Output: ``(id, recency_s, frequency, monetary,
    r_score, f_score, m_score)`` rounded to 6, ordered by id.
    """
    if n_bins < 2:
        raise DataFrameValidationError("rfm_features: n_bins must be >= 2")
    for c in (time_col, id_col, value_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"rfm_features: missing column {c!r}")

    from pyspark import StorageLevel

    t = _time_expr(df, time_col)
    ent = (
        df.filter(t.isNotNull())
        .select(
            F.col(id_col).alias("id"),
            t.alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("id")
        .agg(
            F.max("_t").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.coalesce(F.sum("_v"), F.lit(0.0)).alias("monetary"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if asof is None:
        asof = ent.agg(F.max("_last").alias("m")).collect()[0]["m"]
    ent2 = ent.select(
        "id",
        F.round(F.lit(float(asof)) - F.col("_last"), 6).alias("recency_s"),
        "frequency",
        F.round(F.col("monetary"), 6).alias("monetary"),
    )

    probs = [i / n_bins for i in range(1, n_bins)]
    parr = F.array(*[F.lit(p) for p in probs])
    fit = ent2.agg(
        F.percentile(F.col("recency_s"), parr).alias("re"),
        F.percentile(F.col("frequency").cast("double"), parr).alias("fe"),
        F.percentile(F.col("monetary"), parr).alias("me"),
    ).collect()[0]
    edges = {
        k: [round(float(e), 6) for e in fit[k]] for k in ("re", "fe", "me")
    }

    def _bin(col, es):
        b = F.lit(1)
        for e in es:
            b = b + (col > F.lit(e)).cast("int")
        return b

    rec_bin = _bin(F.col("recency_s"), edges["re"])
    out = ent2.select(
        "id",
        "recency_s",
        "frequency",
        "monetary",
        (F.lit(n_bins + 1) - rec_bin).alias("r_score"),
        _bin(F.col("frequency").cast("double"), edges["fe"]).alias("f_score"),
        _bin(F.col("monetary"), edges["me"]).alias("m_score"),
    )
    return out.orderBy("id")


def durbin_watson(
    df: DataFrame,
    value_col: str,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity Durbin–Watson statistic (Durbin & Watson 1950) — the
    standard residual-autocorrelation screen:

        DW = Σ_{t≥2} (x_t − x_{t−1})² / Σ_t (x_t − x̄)²

    ≈ 2(1 − ρ₁): 2 means no first-order autocorrelation, → 0 positive,
    → 4 negative. Feed it residuals (e.g. ``y − ŷ`` from
    ``modeling.linear``) to test the regression's independence
    assumption, or raw values as a quick serial-dependence probe.

    Plan shape: one entity-partitioned lag window sharing the entity
    exchange + ONE grouped moment fold (the ``acf_features``
    conventions, including the ``tiebreak_col`` determinism contract).
    Output: ``(id, n_obs, dw)`` rounded 6; NULL dw for zero-variance or
    single-point series.
    """
    for c in [value_col, time_col, id_col] + (
        [tiebreak_col] if tiebreak_col else []
    ):
        if c not in df.columns:
            raise DataFrameValidationError(f"durbin_watson: missing column {c!r}")
    y = F.col(value_col).cast("double")
    order = [F.col(time_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(id_col).orderBy(*order)
    base = df.filter(y.isNotNull()).select(
        F.col(id_col).alias("_id"), *order, y.alias("_y")
    )
    prev = F.lag("_y").over(
        Window.partitionBy("_id").orderBy(*[c for c in order])
    )
    marked = base.withColumn("_d", F.col("_y") - prev)
    g = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_s"),
        F.sum(F.col("_y") * F.col("_y")).alias("_q"),
        F.sum(F.col("_d") * F.col("_d")).alias("_dd"),
    )
    n = F.col("_n").cast("double")
    ss = F.col("_q") - F.col("_s") * F.col("_s") / n
    return g.select(
        F.col("_id").alias(id_col),
        F.col("_n").cast("long").alias("n_obs"),
        F.round(
            F.when((F.col("_n") > 1) & (ss > 0), F.col("_dd") / ss), 6
        ).alias("dw"),
    )


def ljung_box(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity Ljung–Box portmanteau statistic (Ljung & Box 1978) —
    "is there ANY autocorrelation up to lag K":

        Q = n(n+2) · Σ_{k=1..K} ρ̂_k² / (n−k),   Q ~ χ²(K) under H₀

    built directly ON :func:`acf_features` (same estimator, same
    determinism contract — one extra bounded projection, no new corpus
    pass). Output: ``(id, n_obs, q_stat, dof)`` rounded 6; NULL q when
    any required lag is undefined (short or zero-variance series — a
    partial Q would silently understate dependence).
    """
    if max_lag < 1:
        raise DataFrameValidationError("ljung_box: max_lag must be >= 1")
    acf = acf_features(
        df, value_col, max_lag, time_col=time_col, id_col=id_col,
        tiebreak_col=tiebreak_col,
    )
    n = F.col("n_obs").cast("double")
    q = F.lit(0.0)
    for k in range(1, max_lag + 1):
        r = F.col(f"acf_{k}")
        q = q + r * r / (n - float(k))
    q = n * (n + 2.0) * q
    return acf.select(
        id_col,
        "n_obs",
        F.round(q, 6).alias("q_stat"),
        F.lit(int(max_lag)).cast("long").alias("dof"),
    )


def pacf_features(
    df: DataFrame,
    value_col: str,
    max_lag: int = 3,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity partial autocorrelation at lags 1..``max_lag`` (≤ 3) —
    the AR-order diagnostic read next to :func:`acf_features` (Box &
    Jenkins identification: ACF tails off + PACF cuts at p ⇒ AR(p)).

    Computed from the (rounded, replayable) ACF by the closed-form
    Durbin–Levinson recursion, which for the supported depths is pure
    arithmetic — no matrix solve, no new corpus pass:

        φ₁₁ = ρ₁
        φ₂₂ = (ρ₂ − ρ₁²) / (1 − ρ₁²)
        φ₃₃ = numerator/denominator of the k=3 recursion expanded

    Output: ``(id, n_obs, pacf_1..pacf_K)`` rounded 6; NULL where the
    underlying ACFs are NULL or a denominator is 0. Depths beyond 3
    need the Levinson loop proper (a bounded driver recursion per
    entity) — out of scope for the expression lane, so ``max_lag > 3``
    raises rather than silently approximating.
    """
    if not (1 <= max_lag <= 3):
        raise DataFrameValidationError(
            "pacf_features: max_lag must be in 1..3 (expression lane)"
        )
    acf = acf_features(
        df, value_col, max_lag, time_col=time_col, id_col=id_col,
        tiebreak_col=tiebreak_col,
    )
    cols = [F.col(id_col), F.col("n_obs")]
    r1 = F.col("acf_1")
    cols.append(F.round(r1, 6).alias("pacf_1"))
    if max_lag >= 2:
        r2 = F.col("acf_2")
        d2 = 1.0 - r1 * r1
        p22 = F.when(F.abs(d2) > 1e-12, (r2 - r1 * r1) / d2)
        cols.append(F.round(p22, 6).alias("pacf_2"))
    if max_lag >= 3:
        r2 = F.col("acf_2")
        r3 = F.col("acf_3")
        # Durbin-Levinson k=3: phi21 = r1(1-r2)/(1-r1^2); phi22 as above;
        # phi33 = (r3 - phi21*r2 - phi22*r1) / (1 - phi21*r1 - phi22*r2)
        d2 = 1.0 - r1 * r1
        phi22 = (r2 - r1 * r1) / d2
        phi21 = r1 * (1.0 - r2) / d2
        den3 = 1.0 - phi21 * r1 - phi22 * r2
        p33 = F.when(
            (F.abs(d2) > 1e-12) & (F.abs(den3) > 1e-12),
            (r3 - phi21 * r2 - phi22 * r1) / den3,
        )
        cols.append(F.round(p33, 6).alias("pacf_3"))
    return acf.select(*cols)
