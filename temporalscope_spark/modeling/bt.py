"""Bradley–Terry preference-strength fitting via the MM algorithm
(Bradley & Terry 1952; Hunter 2004, "MM algorithms for generalized
Bradley–Terry models") — the model behind pairwise human-preference
data (RLHF comparison logs, arena-style model rankings, A/B judgments).

Scale design: the comparison LOG is the only corpus-sized input, and it
is touched exactly once — one aggregation collapses it into the bounded
(item, item, count) comparison matrix plus per-item win totals (items
are model variants / sources / policies: a bounded set by construction).
Every MM round then runs on those bounded tables only:

    w_i  <-  W_i / Σ_{j≠i} n_ij / (w_i + w_j)        (Hunter 2004 eq. 2)

followed by sum-normalization — per round: two broadcast joins of the
I-row strength table into the ≤I² matrix, one fold-aggregation per
item, one 1-row total crossed back in. No driver collect in the loop;
``localCheckpoint`` truncates lineage per round (the BPE/IRLS
precedent).

Determinism: fixed round count (never an epsilon test), all sums are
item-ordered sorted folds, and strengths are quantized to 1e-12 per
round — the unigram-LM contract that makes the DuckDB oracle an exact
unrolled-CTE replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def bt_comparison_matrix(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> tuple[DataFrame, DataFrame]:
    """Collapse a comparison log into the bounded MM inputs: the
    symmetric comparison matrix (i, j, n) — one row per ORDERED pair
    with n = total comparisons between the two — and per-item win
    totals (item, wins). This is the single corpus-sized pass."""
    for c in (winner_col, loser_col):
        if c not in pairs.columns:
            raise DataFrameValidationError(f"missing column {c!r}")
    p = pairs.select(
        F.col(winner_col).alias("_w"), F.col(loser_col).alias("_l")
    ).filter(F.col("_w") != F.col("_l"))
    und = p.groupBy(
        F.least("_w", "_l").alias("_a"), F.greatest("_w", "_l").alias("_b")
    ).agg(F.count(F.lit(1)).alias("n"))
    matrix = und.select(
        F.col("_a").alias("i"), F.col("_b").alias("j"), "n"
    ).unionByName(und.select(F.col("_b").alias("i"), F.col("_a").alias("j"), "n"))
    wins = p.groupBy(F.col("_w").alias("item")).agg(
        F.count(F.lit(1)).alias("wins")
    )
    return matrix, wins


def fit_bradley_terry(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    num_rounds: int = 5,
) -> DataFrame:
    """Fit Bradley–Terry strengths from a (winner, loser) comparison
    log: ``num_rounds`` MM rounds from the uniform start, strengths
    sum-normalized and quantized to 1e-12 each round.

    Items that never win keep strength 0 (the MM fixed point for
    all-loss items); self-comparisons are dropped.

    Output: (item, strength) — strength rounded to 6, summing to ~1.
    """
    if num_rounds < 1:
        raise DataFrameValidationError("num_rounds must be >= 1")
    matrix, wins = bt_comparison_matrix(pairs, winner_col, loser_col)
    matrix = matrix.localCheckpoint()
    items = matrix.select(F.col("i").alias("item")).distinct()
    wins = (
        items.join(wins, "item", "left")
        .select("item", F.coalesce("wins", F.lit(0)).alias("wins"))
        .localCheckpoint()
    )
    n_items = items.count()
    if n_items < 2:
        raise DataFrameValidationError("need at least 2 distinct items")
    w = wins.select(
        "item", F.round(F.lit(1.0 / n_items), 12).alias("w")
    ).localCheckpoint()

    def _fold(term: str, ord_col: str) -> F.Column:
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(ord_col), F.col(term).alias("_t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["_t"],
        )

    for _ in range(num_rounds):
        wi = w.withColumnsRenamed({"item": "i", "w": "_wi"})
        wj = w.withColumnsRenamed({"item": "j", "w": "_wj"})
        denom = (
            matrix.join(F.broadcast(wi), "i")
            .join(F.broadcast(wj), "j")
            .withColumn(
                "_term", F.col("n").cast("double") / (F.col("_wi") + F.col("_wj"))
            )
            .groupBy("i")
            .agg(_fold("_term", "j").alias("_den"))
        )
        upd = denom.join(F.broadcast(wins.withColumnRenamed("item", "i")), "i").select(
            F.col("i").alias("item"),
            (F.col("wins").cast("double") / F.col("_den")).alias("_u"),
        )
        tot = upd.select(F.col("item").alias("_o"), F.col("_u").alias("_t")).agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_o", "_t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_t"],
            ).alias("_tot")
        )
        w = (
            upd.crossJoin(F.broadcast(tot))
            .select("item", F.round(F.col("_u") / F.col("_tot"), 12).alias("w"))
            .localCheckpoint()
        )
    return w.select("item", (F.round("w", 6) + F.lit(0.0)).alias("strength"))


def bt_win_probability(
    strengths: DataFrame,
    item_col: str = "item",
    strength_col: str = "strength",
) -> DataFrame:
    """Pairwise predicted win probabilities from fitted strengths:
    P(i beats j) = w_i / (w_i + w_j) for every ordered pair — a
    broadcast self-join of the bounded strength table.

    Output: (item_a, item_b, p_win) for a ≠ b, rounded to 6."""
    for c in (item_col, strength_col):
        if c not in strengths.columns:
            raise DataFrameValidationError(f"missing column {c!r}")
    a = strengths.select(
        F.col(item_col).alias("item_a"), F.col(strength_col).alias("_sa")
    )
    b = strengths.select(
        F.col(item_col).alias("item_b"), F.col(strength_col).alias("_sb")
    )
    return (
        a.join(F.broadcast(b), F.col("item_a") != F.col("item_b"))
        .filter((F.col("_sa") + F.col("_sb")) > 0)
        .select(
            "item_a",
            "item_b",
            (
                F.round(F.col("_sa") / (F.col("_sa") + F.col("_sb")), 6)
                + F.lit(0.0)
            ).alias("p_win"),
        )
    )
