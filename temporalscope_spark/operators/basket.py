"""Co-occurrence mining over (entity, item) data: association rules and
first-order Markov transitions.

The reference's grouped-window machinery (/root/reference/src/
temporalscope/partition/sliding_window.py) slices per-entity event
streams; the two classic mining passes OVER those streams are
market-basket association rules (Agrawal & Srikant 1994 — support /
confidence / lift with the Apriori infrequent-item prune) and the
first-order Markov transition matrix (the next-event model product and
session analytics both start from).

Plan shapes (100 TB-safe):

* ``association_rules``: distinct (basket, item) → ONE item-count
  aggregation; the Apriori property prunes items below min-support
  BEFORE the pair self-join (a pair of items can only be frequent if
  both members are), so the basket self-join fans out only over
  frequent items; pair counts are one map-side-combinable aggregation;
  the item-count table (C rows) joins back broadcast. Never all-pairs
  across baskets — the self-join is an equi-join ON basket.
* ``transition_matrix``: one entity-keyed ``lag`` window (exchange-free
  on the bucketed layout) → ONE ``groupBy(from, to)`` count; row
  normalization is a window over the bounded C×C transition table.
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.core.convert import epoch_seconds
from temporalscope_spark.exceptions import DataFrameValidationError


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Pairwise association rules with support / confidence / lift.

    ``support(a→b) = n_ab / N`` (N = #distinct baskets),
    ``confidence = n_ab / n_a``, ``lift = confidence / (n_b / N)``.
    Both rule directions of each frequent pair are emitted; pairs (and,
    via Apriori, their member items) must clear ``min_support``; rules
    below ``min_confidence`` are dropped. Duplicate (basket, item) rows
    and NULLs are ignored.

    Output: ``(antecedent, consequent, n_pair, support, confidence,
    lift)`` with floats rounded to 6, ordered by (antecedent,
    consequent).
    """
    if not (0.0 < min_support <= 1.0):
        raise DataFrameValidationError(
            "association_rules: min_support must be in (0, 1]"
        )
    for c in (basket_col, item_col):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"association_rules: missing column {c!r}"
            )

    pairs0 = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # bounded driver scalar (one long), the woe-totals convention
    n_baskets = pairs0.select(F.countDistinct("_b").alias("n")).collect()[0]["n"]
    if n_baskets == 0:
        pairs0.unpersist()
        return df.sparkSession.createDataFrame(
            [],
            "antecedent string, consequent string, n_pair long, "
            "support double, confidence double, lift double",
        )
    min_count = max(1, math.ceil(min_support * n_baskets))

    item_counts = (
        pairs0.groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    freq_items = item_counts.filter(F.col("_n") >= min_count).select("_i")
    kept = pairs0.join(F.broadcast(freq_items), "_i")

    left = kept.select("_b", F.col("_i").alias("_ia"))
    right = kept.select("_b", F.col("_i").alias("_ib"))
    pair_counts = (
        left.join(right, "_b")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )

    rules = pair_counts.select(
        F.col("_ia").alias("antecedent"),
        F.col("_ib").alias("consequent"),
        "n_pair",
    ).unionByName(
        pair_counts.select(
            F.col("_ib").alias("antecedent"),
            F.col("_ia").alias("consequent"),
            "n_pair",
        )
    )

    ca = item_counts.select(
        F.col("_i").alias("antecedent"), F.col("_n").alias("_na")
    )
    cb = item_counts.select(
        F.col("_i").alias("consequent"), F.col("_n").alias("_nb")
    )
    n_d = F.lit(float(n_baskets))
    conf = F.col("n_pair").cast("double") / F.col("_na").cast("double")
    out = (
        rules.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair").cast("double") / n_d, 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(conf / (F.col("_nb").cast("double") / n_d), 6).alias("lift"),
        )
        .filter(F.col("confidence") >= F.lit(float(min_confidence)))
    )
    return out.orderBy("antecedent", "consequent")


def transition_matrix(
    df: DataFrame,
    time_col: str,
    id_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive event types within each entity's (time, tiebreak)-ordered
    stream. ``prob`` is row-normalized: P(to | from). NULL types and NULL
    times are excluded; entities with one event contribute nothing.

    Output: ``(from_type, to_type, n, prob)`` with prob rounded to 6,
    ordered by (from_type, to_type).
    """
    for c in [time_col, id_col, type_col] + (
        [tiebreak_col] if tiebreak_col else []
    ):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"transition_matrix: missing column {c!r}"
            )

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    base = df.filter(
        t.isNotNull() & F.col(type_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        t.alias("_t"),
        F.col(type_col).alias("_ty"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    order = ["_t"] + (["_tb"] if tiebreak_col else [])
    w = Window.partitionBy("_id").orderBy(*order)
    pairs = base.select(
        F.col("_ty").alias("from_type"),
        F.lead("_ty").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())

    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("from_type")  # bounded C×C table
    out = counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double"), 6
        ).alias("prob"),
    )
    return out.orderBy("from_type", "to_type")
