"""Coreset selection: k-center greedy (Gonzalez 1985 farthest-point
traversal; the "greedy k-center" coreset of Sener & Savarese 2018
active-learning / data-pruning lineage).

Picks ``k`` rows whose vectors 2-approximate the optimal k-center
cover: every unselected vector is within the selection's coverage
radius, so the selected rows are a geometry-preserving sample of the
embedding space — the diversity-first alternative to the
prototypicality pruning in ``similarity.prototype_prune``.

Spark shape: the greedy recurrence is inherently sequential in k, so
the driver runs ``k − 1`` rounds; each round is ONE narrow map over
the corpus (update the running min-distance against the single new
center, a plan literal) plus ONE TakeOrderedAndProject argmax — no
join, no window, no shuffle beyond the 1-row top. The running
min-distance column is ``localCheckpoint``-ed per round so the plan
stays O(1) deep and each round costs O(n) regardless of k. Only k
(id, vector) rows ever reach the driver.

Determinism / cross-engine replay: the argmax ranks on the ROUNDED
(6 dp) min-distance with ties to the smaller id — last-ulp float
summation differences across engines collapse into exact ties with a
deterministic winner (the `knn_label_agreement.rank_decimals` move).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _l2sq(vec: Column, cent: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(
            vec, lit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    seed_hash: str = "xxhash64",
    rank_decimals: int = 6,
) -> DataFrame:
    """Greedy k-center selection. Returns one row per selected center:
    ``(rank, id, min_dist)`` where ``min_dist`` is the squared L2
    distance to the previously-selected set at selection time (0.0 for
    the seed; the LAST row's value is the coverage radius the 2-approx
    guarantee is about). The seed is the smallest ``hash(id, seed)``
    row (``md5`` lane replays in SQL)."""
    if k < 1:
        raise DataFrameValidationError("kcenter_select: k must be >= 1")
    missing = [c for c in (vec_col, id_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"kcenter_select: missing columns {missing}")
    if seed_hash == "md5":
        order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    else:
        order = F.xxhash64(F.col(id_col), F.lit(seed))
    first = df.select(id_col, vec_col).orderBy(order).limit(1).collect()
    if not first:
        raise DataFrameValidationError("kcenter_select: empty input")
    sel_id = first[0][0]
    sel_vec = [float(x) for x in first[0][1]]
    out = [(1, sel_id, 0.0)]

    spark = df.sparkSession
    state = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _l2sq(F.col(vec_col), sel_vec).alias("_mind"),
    ).localCheckpoint()
    for r in range(2, k + 1):
        top = (
            state.filter(~F.col("_id").isin([i for _, i, _ in out]))
            .select(
                "_id", "_v",
                # engine-side rounding: Python round() is banker's, Spark
                # HALF_UP — take the already-rounded value from the plan
                F.round(F.col("_mind"), rank_decimals).alias("_mr"),
            )
            .orderBy(F.col("_mr").desc(), F.col("_id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # fewer than k rows
        nid, nvec, nd = top[0][0], [float(x) for x in top[0][1]], float(top[0][2])
        out.append((r, nid, nd))
        if r < k:
            state = state.select(
                "_id",
                "_v",
                F.least(F.col("_mind"), _l2sq(F.col("_v"), nvec)).alias("_mind"),
            ).localCheckpoint()
    return spark.createDataFrame(
        out, f"rank int, {id_col} long, min_dist double"
    ).select("rank", id_col, (F.round("min_dist", 6) + F.lit(0.0)).alias("min_dist"))
