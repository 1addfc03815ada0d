"""Alternating-least-squares matrix factorization (one exposed round) —
the collaborative-filtering member of the modeling family (Zhou,
Wilkinson, Schreiber & Pan 2008, "Large-scale parallel collaborative
filtering for the Netflix prize": ALS with weighted-λ regularization).

Each half-round solves, for every entity u on the side being updated,

    p_u = (Σ_{i∈R(u)} q_i q_iᵀ + λ·n_u·I)⁻¹ · Σ_{i∈R(u)} r_ui·q_i

with the OTHER side's factors held fixed. The plan is the engine's
sufficient-statistics shape end to end:

* the ratings table joins the fixed side's (id, factors) table — a
  factor table is one row per entity, so it is orders smaller than the
  ratings and broadcastable for most catalogs (items); the user side
  falls back to a hash join on the rating key;
* ONE map-side-combinable aggregation per solve side collects the
  k(k+1)/2 Gram entries and k right-hand-side entries per entity —
  the shuffle carries (k²+k)/2+k doubles per entity, never ratings;
* the per-entity k×k solve runs on the AGGREGATED entity-sized table:
  closed-form expressions for k = 2 (the exact/oracle lane — DuckDB
  replays it bit-for-bit), an Arrow-batched pandas UDF doing a batched
  ``numpy.linalg.solve`` for general k (the big-k lane; the linear
  algebra touches one row per entity, not per rating).

Initial factors are DETERMINISTIC md5 uniforms in [−0.5, 0.5] (the
engine's hash convention) — no RNG state, resume-safe, replayable.
Factors round to 6 dp on output (the replayable-model contract).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def als_seed_factors(
    df: DataFrame, id_col: str, k: int = 2, seed: int = 42, scale: float = 0.5
) -> DataFrame:
    """Deterministic initial factors: one row per distinct id with
    ``factors[j] = scale · (2·u_j − 1)`` for the md5 uniform
    ``u_j = md5(id#seed#j)`` — portable across engines and partitionings.
    """
    if k < 1:
        raise DataFrameValidationError("als_seed_factors: k must be >= 1")
    if id_col not in df.columns:
        raise DataFrameValidationError(f"als_seed_factors: missing column {id_col!r}")
    ids = df.select(F.col(id_col).cast("string").alias("id")).distinct()
    comps = []
    for j in range(k):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id"), F.lit(f"#{seed}#{j}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 1000000000
        ).cast("double") / F.lit(1e9)
        comps.append(F.lit(float(scale)) * (F.lit(2.0) * u - F.lit(1.0)))
    return ids.select(F.col("id").alias(id_col), F.array(*comps).alias("factors"))


def _solve2_cols(reg: float):
    """Closed-form 2x2 ridge solve from Gram sums (a, b, c), rhs (d, e)
    and count n: inverse of [[a+λn, b], [b, c+λn]]."""
    a = F.col("_g00") + F.lit(float(reg)) * F.col("_n")
    b = F.col("_g01")
    c = F.col("_g11") + F.lit(float(reg)) * F.col("_n")
    det = a * c - b * b
    f0 = (c * F.col("_r0") - b * F.col("_r1")) / det
    f1 = (a * F.col("_r1") - b * F.col("_r0")) / det
    return F.array(f0, f1)


def als_half_round(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_col: str,
    fixed_col: str,
    rating_col: str,
    k: int = 2,
    reg: float = 0.1,
    broadcast_fixed: bool = True,
) -> DataFrame:
    """Solve one side's factors with the other side fixed. Returns
    ``(solve_col, factors array<double>)`` (rounded 6). ``fixed`` must
    be an ``(fixed_col, factors)`` table as produced by
    :func:`als_seed_factors` / a previous half-round."""
    if k < 1:
        raise DataFrameValidationError("als_half_round: k must be >= 1")
    if reg < 0:
        raise DataFrameValidationError("als_half_round: reg must be >= 0")
    for c in (solve_col, fixed_col, rating_col):
        if c not in ratings.columns:
            raise DataFrameValidationError(f"als_half_round: missing column {c!r}")
    if "factors" not in fixed.columns or fixed_col not in fixed.columns:
        raise DataFrameValidationError(
            f"als_half_round: fixed side needs ({fixed_col!r}, 'factors')"
        )
    r = F.col(rating_col).cast("double")
    base = ratings.filter(r.isNotNull()).select(
        F.col(solve_col).cast("string").alias("_u"),
        F.col(fixed_col).cast("string").alias("_i"),
        r.alias("_r"),
    )
    fx = fixed.select(
        F.col(fixed_col).cast("string").alias("_i"), F.col("factors").alias("_q")
    )
    joined = base.join(F.broadcast(fx) if broadcast_fixed else fx, "_i")
    q = lambda j: F.element_at(F.col("_q"), j + 1)  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for a in range(k):
        aggs.append(F.sum(F.col("_r") * q(a)).alias(f"_r{a}"))
        for b in range(a, k):
            aggs.append(F.sum(q(a) * q(b)).alias(f"_g{a}{b}"))
    ent = joined.groupBy("_u").agg(*aggs)
    if k == 2:
        fac = _solve2_cols(reg)
        out = ent.select(
            F.col("_u").alias(solve_col),
            F.transform(fac, lambda x: F.round(x, 6)).alias("factors"),
        )
        return out
    # general k: batched numpy solve over the ENTITY-sized aggregate table
    from pyspark.sql.types import ArrayType, DoubleType  # noqa: PLC0415

    gram_cols = [f"_g{a}{b}" for a in range(k) for b in range(a, k)]
    rhs_cols = [f"_r{a}" for a in range(k)]

    @F.pandas_udf(ArrayType(DoubleType()))
    def _solve(n: pd.Series, grams: pd.Series, rhs: pd.Series) -> pd.Series:
        import numpy as np  # noqa: PLC0415

        m = len(n)
        gm = np.array(grams.tolist())
        rh = np.array(rhs.tolist())
        A = np.zeros((m, k, k))
        pos = 0
        for a in range(k):
            for b in range(a, k):
                A[:, a, b] = gm[:, pos]
                A[:, b, a] = gm[:, pos]
                pos += 1
        A += float(reg) * n.to_numpy()[:, None, None] * np.eye(k)[None, :, :]
        sol = np.linalg.solve(A, rh)
        return pd.Series([np.round(row, 6).tolist() for row in sol])

    return ent.select(
        F.col("_u").alias(solve_col),
        _solve(
            F.col("_n"),
            F.array(*[F.col(c) for c in gram_cols]),
            F.array(*[F.col(c) for c in rhs_cols]),
        ).alias("factors"),
    )


def als_round(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 2,
    reg: float = 0.1,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """One full ALS round from the deterministic seed: items seeded,
    users solved against them, items re-solved against the users.
    Returns ``(user_factors, item_factors)``; iterate by feeding
    ``item_factors`` back through :func:`als_half_round` pairs."""
    q0 = als_seed_factors(ratings, item_col, k=k, seed=seed)
    users = als_half_round(
        ratings, q0, user_col, item_col, rating_col, k=k, reg=reg
    )
    items = als_half_round(
        ratings, users, item_col, user_col, rating_col, k=k, reg=reg,
        broadcast_fixed=False,
    )
    return users, items
