"""Preference-pair construction for RLHF/DPO post-training data.

DPO (Rafailov et al. 2023, "Direct Preference Optimization") and RLHF
reward modeling both consume (prompt, chosen, rejected) triples. Given a
table of scored responses — many candidate completions per prompt, each
with a reward/quality score — the standard construction picks the
highest- and lowest-scored response per prompt and keeps the pair only
when the reward gap clears a margin (small gaps are label noise: the
scorer cannot reliably order near-ties).

Pairs with deterministic tie-breaking: the chosen (rejected) response is
the max (min) of ``struct(reward, response_id)`` — a partition-invariant
aggregate, so the SAME pair comes out on every run, engine, and
partitioning. Plan shape: ONE map-side-combinable groupBy on the prompt
key; the response table never shuffles on anything else, and there is no
window, no sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def dpo_pairs(
    df: DataFrame,
    prompt_col: str,
    response_col: str,
    reward_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """Build one (chosen, rejected) pair per prompt from scored responses.

    A prompt yields a pair iff it has >= 2 responses with non-null
    rewards and ``max(reward) - min(reward) > min_margin`` (strict — a
    zero-margin prompt has no learnable preference). Ties inside the
    max/min are broken by response id (max side: larger id; min side:
    smaller id), making the output a pure function of the input set.

    Output: (prompt, chosen, rejected, reward_chosen, reward_rejected,
    margin) with floats rounded to 6.
    """
    for c in (prompt_col, response_col, reward_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"dpo_pairs: missing column {c!r}")
    if min_margin < 0:
        raise DataFrameValidationError("dpo_pairs: min_margin must be >= 0")
    r = F.col(reward_col).cast("double")
    scored = df.filter(r.isNotNull()).select(
        F.col(prompt_col).alias("prompt"),
        F.col(response_col).alias("_resp"),
        r.alias("_r"),
    )
    agg = scored.groupBy("prompt").agg(
        F.max(F.struct(F.col("_r"), F.col("_resp"))).alias("_hi"),
        F.min(F.struct(F.col("_r"), F.col("_resp"))).alias("_lo"),
        F.count(F.lit(1)).alias("_n"),
    )
    margin = F.col("_hi._r") - F.col("_lo._r")
    return (
        agg.filter((F.col("_n") >= 2) & (margin > F.lit(float(min_margin))))
        .select(
            "prompt",
            F.col("_hi._resp").alias("chosen"),
            F.col("_lo._resp").alias("rejected"),
            (F.round("_hi._r", 6) + F.lit(0.0)).alias("reward_chosen"),
            (F.round("_lo._r", 6) + F.lit(0.0)).alias("reward_rejected"),
            (F.round(margin, 6) + F.lit(0.0)).alias("margin"),
        )
    )
