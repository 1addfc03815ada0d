"""Robust per-entity trend estimation: Theil–Sen slope and the
Mann–Kendall trend test.

The nonparametric complement to :func:`tsfeatures.trend_features` (OLS):
OLS slopes blow up on a single corrupted point, while the Theil–Sen
estimator (Theil 1950; Sen 1968 — the median of all pairwise slopes) has
a 29.3% breakdown point, and the Mann–Kendall test (Mann 1945; Kendall
1975) asks "is there ANY monotone trend" without assuming linearity or a
noise distribution. Both are standard drift screens over sensor /
metric / data-quality time series.

Plan shape (100 TB-safe): both estimators need the per-entity i<j pair
set. Pairs are an equi-join ON THE ENTITY KEY with a strict time
inequality inside the entity — never a cross join; the cost is O(L²)
per entity where L is the series length, the estimator's own definition
(same bounded-per-entity class as :func:`tsfeatures.acf_features`).
Per-entity reductions are grouped aggregations (the exact grouped
``percentile`` buffers one entity's pair slopes, bounded by L²; at very
long series swap ``percentile_approx`` exactly as
:func:`corpus_stats.token_quantiles` documents). No global windows, no
driver collection.

Determinism / oracle replay: slopes are computed in integer-µs time
(lossless for TimestampType) and the outputs round to 6 dp; DuckDB
replays the same pair join, the same ``quantile_cont`` median and the
same tie-corrected variance bit-for-bit at that rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.rolling import _time_micros


def _pair_base(
    df: DataFrame, value_col: str, time_col: str, id_col: str
) -> DataFrame:
    """(_id, _t µs, _y) with NULL values dropped — the shared spine."""
    for c in (value_col, time_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"missing column {c!r}")
    return df.select(
        F.col(id_col).alias("_id"),
        _time_micros(df, time_col).alias("_t"),
        F.col(value_col).cast("double").alias("_y"),
    ).filter(F.col("_y").isNotNull() & F.col("_t").isNotNull())


def _pairs(base: DataFrame) -> DataFrame:
    """Per-entity i<j pairs under strict time order.

    Equal-timestamp pairs are EXCLUDED (their slope is undefined and
    their Mann–Kendall orientation is ambiguous); the equi-join key is
    the entity, so the pair explosion is entity-bounded by construction.
    """
    a = base.select(
        F.col("_id"), F.col("_t").alias("_t1"), F.col("_y").alias("_y1")
    )
    b = base.select(
        F.col("_id"), F.col("_t").alias("_t2"), F.col("_y").alias("_y2")
    )
    return a.join(b, "_id").filter(F.col("_t1") < F.col("_t2"))


def theil_sen(
    df: DataFrame,
    value_col: str,
    time_col: str = "event_time",
    id_col: str = "doc_id",
    time_unit_seconds: float = 3600.0,
) -> DataFrame:
    """Per-entity Theil–Sen slope: the MEDIAN of all pairwise slopes
    ``(y_j − y_i) / (t_j − t_i)`` over i<j (strictly increasing time),
    with time measured in ``time_unit_seconds`` units (default hours —
    the :func:`tsfeatures.trend_features` convention).

    Output one row per entity: ``(id, n_obs, n_pairs, slope)`` ordered
    by id; ``slope`` is NULL when no valid pair exists (a single
    observation, or all observations share one timestamp). The median is
    the exact linearly-interpolated ``percentile`` (= DuckDB
    ``quantile_cont``), grouped per entity — bounded by the entity's own
    pair count. Floats round to 6.
    """
    if time_unit_seconds <= 0:
        raise DataFrameValidationError("time_unit_seconds must be > 0")
    base = _pair_base(df, value_col, time_col, id_col)
    n_obs = base.groupBy("_id").agg(F.count(F.lit(1)).alias("n_obs"))
    unit_us = F.lit(1_000_000.0 * float(time_unit_seconds))
    slopes = _pairs(base).select(
        "_id",
        (
            (F.col("_y2") - F.col("_y1"))
            / ((F.col("_t2") - F.col("_t1")) / unit_us)
        ).alias("_s"),
    )
    med = slopes.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("_s", F.lit(0.5)).alias("_med"),
    )
    return (
        n_obs.join(med, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_obs",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.round("_med", 6).alias("slope"),
        )
        .orderBy(id_col)
    )


def mann_kendall(
    df: DataFrame,
    value_col: str,
    time_col: str = "event_time",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-entity Mann–Kendall trend test.

    ``S = Σ_{i<j} sign(y_j − y_i)`` over the same strict-time pair set
    as :func:`theil_sen`; the tie-corrected normal-approximation
    variance (Kendall 1975)

        Var(S) = ( n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) ) / 18

    sums over groups of tied VALUES within the entity, and the
    continuity-corrected statistic is ``z = (S−1)/σ`` for S>0,
    ``(S+1)/σ`` for S<0, 0 at S=0 (NULL when σ=0 — a constant or
    too-short series).

    Output per entity: ``(id, n_obs, s_stat, var_s, z)`` ordered by id,
    floats rounded to 6. Three grouped aggregations over entity-bounded
    tables (pair signs, value-tie counts, observation counts) joined on
    the entity key — the pair join is the only super-linear step and is
    entity-bounded by definition of the statistic.
    """
    base = _pair_base(df, value_col, time_col, id_col)
    n_obs = base.groupBy("_id").agg(F.count(F.lit(1)).alias("n_obs"))
    s_tbl = (
        _pairs(base)
        .select("_id", F.signum(F.col("_y2") - F.col("_y1")).alias("_sgn"))
        .groupBy("_id")
        .agg(F.sum("_sgn").cast("long").alias("s_stat"))
    )
    t = F.col("_tg").cast("double")
    ties = (
        base.groupBy("_id", "_y")
        .agg(F.count(F.lit(1)).alias("_tg"))
        .groupBy("_id")
        .agg(
            F.sum(t * (t - 1) * (2 * t + 5)).alias("_tie_term")
        )
    )
    n = F.col("n_obs").cast("double")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("_tie_term")) / F.lit(18.0)
    joined = (
        n_obs.join(s_tbl, "_id", "left")
        .join(ties, "_id", "left")
        .withColumn("_s", F.coalesce("s_stat", F.lit(0)))
        .withColumn("_var", var_s)
    )
    sigma = F.sqrt(F.col("_var"))
    s = F.col("_s").cast("double")
    z = (
        F.when(s > 0, (s - 1) / sigma)
        .when(s < 0, (s + 1) / sigma)
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        F.col("_id").alias(id_col),
        "n_obs",
        F.col("_s").alias("s_stat"),
        F.round("_var", 6).alias("var_s"),
        F.round(F.when(sigma > 0, z), 6).alias("z"),
    ).orderBy(id_col)


def holt_forecast(
    df: DataFrame,
    value_col: str,
    time_col: str,
    id_col: str,
    alpha: float = 0.5,
    beta: float | None = None,
    horizon: int = 3,
    order_col: str | None = None,
    max_len: int = 100_000,
) -> DataFrame:
    """Per-entity exponential-smoothing forecast: simple exponential
    smoothing (``beta=None``) or Holt's linear trend (Holt 1957; the
    `statsmodels Holt(initialization_method='legacy-heuristic')` family)
    — the first actual FORECASTER behind :func:`metrics.forecast.
    forecast_eval`, which until now only scored caller-supplied
    forecasts.

    Recursions (classic init ``l₁ = y₁``, ``b₁ = y₂ − y₁``; 0 for SES or
    single-point series), run in observation order with deterministic
    ``(time, order_col)`` tie-breaks:

        SES :  l_t = α·y_t + (1−α)·l_{t−1}
        Holt:  l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
               b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    and ``ŷ_{n+h} = l_n + h·b_n``. Output: ``horizon`` rows per entity
    ``(id, n, level, trend, step, yhat)`` (floats rounded 6).

    Plan shape (100 TB-safe): ONE grouped aggregation per entity — the
    sorted-fold idiom (``array_sort(collect_list(struct))`` +
    ``F.aggregate``, the lm.py/ranking.py convention): the recursion is
    inherently sequential per entity, so the engine buffers exactly one
    entity's series (bounded by ``max_len``, which raises rather than
    silently truncating) and folds it JVM-side in O(L) — no Python UDF,
    no window, no shuffle beyond the one groupBy. Entities fold in
    parallel; series order is total, so results are partition-invariant
    and the DuckDB oracle replays the identical recursion (identical
    literal arithmetic, e.g. ``1 − α`` computed, not pasted) via a
    recursive CTE. NULL values are dropped before folding.
    """
    if not (0.0 < alpha <= 1.0):
        raise DataFrameValidationError("holt_forecast: alpha must be in (0, 1]")
    if beta is not None and not (0.0 < beta <= 1.0):
        raise DataFrameValidationError("holt_forecast: beta must be in (0, 1]")
    if horizon < 1:
        raise DataFrameValidationError("holt_forecast: horizon must be >= 1")
    need = [value_col, time_col, id_col] + ([order_col] if order_col else [])
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"holt_forecast: missing columns {missing}")

    t = _time_micros(df, time_col)
    y = F.col(value_col).cast("double")
    tb = F.col(order_col).cast("long") if order_col else F.lit(0).cast("long")
    base = df.filter(y.isNotNull()).select(
        F.col(id_col).alias("_id"), t.alias("_t"), tb.alias("_k"), y.alias("_y")
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("_t"), F.col("_k"), F.col("_y")))
    )
    grouped = base.groupBy("_id").agg(arr.alias("_a"))
    ys = F.transform(F.col("_a"), lambda x: x["_y"])
    n = F.size(ys)
    guard = F.when(
        n > int(max_len),
        F.raise_error(
            F.concat(
                F.lit(f"holt_forecast: series longer than max_len={max_len} for id "),
                F.col("_id").cast("string"),
            )
        ).cast("double"),
    )
    l0 = F.coalesce(guard, F.element_at(ys, 1))
    rest = F.slice(ys, 2, F.greatest(n - 1, F.lit(0)))
    a = F.lit(float(alpha))
    one_a = F.lit(1.0 - alpha)
    if beta is None:
        level = F.aggregate(rest, l0, lambda acc, yv: a * yv + one_a * acc)
        trend = F.lit(0.0)
    else:
        b = F.lit(float(beta))
        one_b = F.lit(1.0 - beta)
        b0 = F.when(n >= 2, F.element_at(ys, 2) - F.element_at(ys, 1)).otherwise(
            F.lit(0.0)
        )
        state = F.aggregate(
            rest,
            F.struct(l0.alias("l"), b0.alias("b")),
            lambda acc, yv: F.struct(
                (a * yv + one_a * (acc["l"] + acc["b"])).alias("l"),
                (
                    b * ((a * yv + one_a * (acc["l"] + acc["b"])) - acc["l"])
                    + one_b * acc["b"]
                ).alias("b"),
            ),
        )
        level = state["l"]
        trend = state["b"]
    fitted = grouped.select(
        F.col("_id").alias(id_col),
        n.cast("long").alias("n"),
        level.alias("_l"),
        trend.alias("_b"),
    )
    step = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step")
    return fitted.select(id_col, "n", "_l", "_b", step).select(
        id_col,
        "n",
        F.round("_l", 6).alias("level"),
        F.round("_b", 6).alias("trend"),
        F.col("step").cast("int").alias("step"),
        F.round(
            F.col("_l") + F.col("step").cast("double") * F.col("_b"), 6
        ).alias("yhat"),
    )


def holt_winters_forecast(
    df: DataFrame,
    value_col: str,
    time_col: str,
    id_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 3,
    order_col: str | None = None,
    max_len: int = 100_000,
) -> DataFrame:
    """Per-entity Holt–Winters ADDITIVE seasonal forecast (Winters 1960;
    the fpp2 component form) — the seasonal completion of
    :func:`holt_forecast`:

        l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(y_t − l_{t−1} − b_{t−1}) + (1−γ)·s_{t−m}
        ŷ_{n+h} = l_n + h·b_n + s_{n+h−m·⌈h/m⌉}

    Classic deterministic initialization over the first season(s):
    ``l₀ = mean(y₁..y_m)``, ``b₀ = (mean(y_{m+1}..y_{2m}) − l₀)/m`` when
    two full seasons exist else 0, ``s_i = y_i − l₀``; the recursion runs
    for t = m+1..n. Entities with fewer than ``period`` observations have
    no seasonal estimate and are EXCLUDED from the output (documented
    contract — silently falling back to Holt would change model class per
    row).

    Same plan shape as :func:`holt_forecast` — ONE grouped sorted-fold
    per entity, the accumulator now carrying ``(l, b, seasonal array)``
    with the array rotated by slice+append each step (O(m) per step,
    JVM expressions only); ``max_len`` bounds the buffered series. The
    DuckDB oracle replays the identical recursion via a recursive CTE
    with LIST state, so results are exact at the 6-dp rounding.
    """
    if period < 2:
        raise DataFrameValidationError("holt_winters_forecast: period must be >= 2")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < v <= 1.0):
            raise DataFrameValidationError(
                f"holt_winters_forecast: {nm} must be in (0, 1]"
            )
    if horizon < 1:
        raise DataFrameValidationError("holt_winters_forecast: horizon must be >= 1")
    need = [value_col, time_col, id_col] + ([order_col] if order_col else [])
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"holt_winters_forecast: missing columns {missing}"
        )
    m = int(period)
    t = _time_micros(df, time_col)
    y = F.col(value_col).cast("double")
    tb = F.col(order_col).cast("long") if order_col else F.lit(0).cast("long")
    base = df.filter(y.isNotNull()).select(
        F.col(id_col).alias("_id"), t.alias("_t"), tb.alias("_k"), y.alias("_y")
    )
    grouped = base.groupBy("_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_t"), F.col("_k"), F.col("_y")))
        ).alias("_a")
    )
    ys = F.transform(F.col("_a"), lambda x: x["_y"])
    n = F.size(ys)
    grouped = grouped.withColumn("_n", n).filter(F.col("_n") >= m)
    ys = F.transform(F.col("_a"), lambda x: x["_y"])
    n = F.col("_n")
    guard = F.when(
        n > int(max_len),
        F.raise_error(
            F.concat(
                F.lit(
                    f"holt_winters_forecast: series longer than max_len={max_len}"
                    " for id "
                ),
                F.col("_id").cast("string"),
            )
        ).cast("double"),
    )
    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    l0 = F.coalesce(guard, fsum(F.slice(ys, 1, m)) / F.lit(float(m)))
    b0 = F.when(
        n >= 2 * m,
        (fsum(F.slice(ys, m + 1, m)) / F.lit(float(m)) - l0) / F.lit(float(m)),
    ).otherwise(F.lit(0.0))
    s0 = F.transform(F.slice(ys, 1, m), lambda x: x - l0)
    a = F.lit(float(alpha))
    one_a = F.lit(1.0 - alpha)
    b = F.lit(float(beta))
    one_b = F.lit(1.0 - beta)
    g = F.lit(float(gamma))
    one_g = F.lit(1.0 - gamma)
    rest = F.slice(ys, m + 1, F.greatest(n - m, F.lit(0)))

    def step(acc, yv):
        s1 = F.element_at(acc["s"], 1)
        lnew = a * (yv - s1) + one_a * (acc["l"] + acc["b"])
        return F.struct(
            lnew.alias("l"),
            (b * ((a * (yv - s1) + one_a * (acc["l"] + acc["b"])) - acc["l"])
             + one_b * acc["b"]).alias("b"),
            F.concat(
                F.slice(acc["s"], 2, m - 1),
                F.array(g * (yv - acc["l"] - acc["b"]) + one_g * s1),
            ).alias("s"),
        )

    state = F.aggregate(
        rest, F.struct(l0.alias("l"), b0.alias("b"), s0.alias("s")), step
    )
    fitted = grouped.select(
        F.col("_id").alias(id_col),
        n.cast("long").alias("n"),
        state["l"].alias("_l"),
        state["b"].alias("_b"),
        state["s"].alias("_s"),
    )
    stepc = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step")
    out = fitted.select(id_col, "n", "_l", "_b", "_s", stepc)
    seas = F.element_at(F.col("_s"), ((F.col("step") - 1) % m + 1).cast("int"))
    return out.select(
        id_col,
        "n",
        F.round("_l", 6).alias("level"),
        F.round("_b", 6).alias("trend"),
        F.col("step").cast("int").alias("step"),
        F.round(seas, 6).alias("seasonal"),
        F.round(
            F.col("_l") + F.col("step").cast("double") * F.col("_b") + seas, 6
        ).alias("yhat"),
    )


def kalman_local_level(
    df: DataFrame,
    value_col: str,
    time_col: str,
    id_col: str,
    q_var: float = 1.0,
    r_var: float = 1.0,
    horizon: int = 1,
    order_col: str | None = None,
    max_len: int = 100_000,
) -> DataFrame:
    """Per-entity local-level Kalman filter (the random-walk-plus-noise
    state space, Harvey 1989 §2; equivalent in steady state to SES with
    an optimally chosen α — this is the PRINCIPLED lane where
    :func:`holt_forecast` takes α as given): per observation

        P⁻ = P + q              (predict)
        K  = P⁻ / (P⁻ + r)      (gain)
        x  = x + K·(y − x)      (update)
        P  = (1 − K)·P⁻

    initialized diffusely at ``x₁ = y₁, P₁ = r``. The h-step forecast is
    the level with widening uncertainty ``Var[ŷ_{n+h}] = P + h·q + r``.

    ``q_var``/``r_var`` are the state and observation noise variances
    (their RATIO sets the effective smoothing). Output: ``horizon`` rows
    per entity ``(id, n, level, p_var, step, yhat, forecast_var)``
    rounded 6.

    Same plan shape as :func:`holt_forecast` — ONE grouped sorted fold
    (struct accumulator (x, P)), JVM expressions only, ``max_len``
    raises on over-long series; the DuckDB oracle replays the identical
    recursion via a recursive CTE.
    """
    if q_var <= 0 or r_var <= 0:
        raise DataFrameValidationError(
            "kalman_local_level: q_var and r_var must be > 0"
        )
    if horizon < 1:
        raise DataFrameValidationError("kalman_local_level: horizon must be >= 1")
    need = [value_col, time_col, id_col] + ([order_col] if order_col else [])
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"kalman_local_level: missing columns {missing}"
        )
    t = _time_micros(df, time_col)
    y = F.col(value_col).cast("double")
    tb = F.col(order_col).cast("long") if order_col else F.lit(0).cast("long")
    base = df.filter(y.isNotNull()).select(
        F.col(id_col).alias("_id"), t.alias("_t"), tb.alias("_k"), y.alias("_y")
    )
    grouped = base.groupBy("_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_t"), F.col("_k"), F.col("_y")))
        ).alias("_a")
    )
    ys = F.transform(F.col("_a"), lambda x: x["_y"])
    n = F.size(ys)
    guard = F.when(
        n > int(max_len),
        F.raise_error(
            F.concat(
                F.lit(
                    f"kalman_local_level: series longer than max_len={max_len}"
                    " for id "
                ),
                F.col("_id").cast("string"),
            )
        ).cast("double"),
    )
    qv = F.lit(float(q_var))
    rv = F.lit(float(r_var))
    x0 = F.coalesce(guard, F.element_at(ys, 1))
    rest = F.slice(ys, 2, F.greatest(n - 1, F.lit(0)))

    def step(acc, yv):
        pminus = acc["p"] + qv
        k = pminus / (pminus + rv)
        return F.struct(
            (acc["x"] + k * (yv - acc["x"])).alias("x"),
            ((1.0 - k) * pminus).alias("p"),
        )

    state = F.aggregate(
        rest, F.struct(x0.alias("x"), rv.alias("p")), step
    )
    fitted = grouped.select(
        F.col("_id").alias(id_col),
        n.cast("long").alias("n"),
        state["x"].alias("_x"),
        state["p"].alias("_p"),
    )
    stepc = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step")
    out = fitted.select(id_col, "n", "_x", "_p", stepc)
    return out.select(
        id_col,
        "n",
        F.round("_x", 6).alias("level"),
        F.round("_p", 6).alias("p_var"),
        F.col("step").cast("int").alias("step"),
        F.round("_x", 6).alias("yhat"),
        F.round(
            F.col("_p") + F.col("step").cast("double") * qv + rv, 6
        ).alias("forecast_var"),
    )
