"""Differentially-private releases — deterministic Laplace noise on
counts and bounded means (Dwork, McSherry, Nissim & Smith 2006), the
release side of the privacy family (``operators/pii.py`` measures
k-anonymity/l-diversity/t-closeness of the data; this module publishes
aggregates with a formal ε guarantee).

Noise is the engine's hash convention, NOT an RNG: the Laplace draw for
a group is the inverse-CDF transform of ``u = md5(groupkey#seed)`` —

    noise = −b · sign(u − ½) · ln(1 − 2|u − ½|),   b = sensitivity/ε

so releases are partition-invariant, resume-safe, and exactly
replayable by the SQL oracle. IMPORTANT CAVEAT (documented, not
hidden): a DETERMINISTIC noise function keyed on the group is the right
tool for reproducible pipelines and tests, but re-releasing the same
group under the same seed does not compose privacy loss the way fresh
randomness would — rotate ``seed`` per release epoch and account ε
across epochs.

Plan shape: ONE groupBy aggregation; the noise is a pure expression on
the bounded group table. ln is an IEEE-portable builtin, so both
engines produce bit-identical noise for identical (key, seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _laplace(key: "F.Column", seed: int, b: float) -> "F.Column":
    u = (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f"#dp{seed}"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    c = u - 0.5
    mag = F.greatest(1.0 - 2.0 * F.abs(c), F.lit(1e-12))
    return -F.lit(float(b)) * F.signum(c) * F.log(mag)


def dp_counts(
    df: DataFrame,
    group_cols,
    epsilon: float = 1.0,
    seed: int = 42,
    sensitivity: float = 1.0,
) -> DataFrame:
    """ε-DP noisy group counts: ``count + Laplace(sensitivity/ε)`` per
    group (sensitivity 1 = one row per individual; pass the true
    user-contribution bound otherwise). Output: group cols +
    ``(n_noisy, epsilon)`` with the noisy count rounded 6 and floored
    at 0 (a negative released count is pure noise). The TRUE count is
    deliberately NOT in the output — returning it next to the noisy one
    would defeat the release.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not keys:
        raise DataFrameValidationError("dp_counts: group_cols must be non-empty")
    if epsilon <= 0:
        raise DataFrameValidationError("dp_counts: epsilon must be > 0")
    missing = [c for c in keys if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"dp_counts: missing columns {missing}")
    b = float(sensitivity) / float(epsilon)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    noisy = F.col("_n").cast("double") + _laplace(key, seed, b)
    return counts.select(
        *keys,
        F.round(F.greatest(noisy, F.lit(0.0)), 6).alias("n_noisy"),
        F.lit(float(epsilon)).alias("epsilon"),
    )


def dp_mean(
    df: DataFrame,
    value_col: str,
    group_cols,
    lo: float,
    hi: float,
    epsilon: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """ε-DP noisy bounded mean per group (the standard clip-and-release
    recipe): values clip to ``[lo, hi]``; ε splits evenly between the
    sum (sensitivity hi−lo) and the count (sensitivity 1);

        mean = (Σ clip(y) + Lap(2(hi−lo)/ε)) / max(n + Lap(2/ε), 1)

    Output: group cols + ``(mean_noisy, epsilon)`` rounded 6 and
    clamped to [lo, hi] (the released mean cannot leave the stated
    bounds). NULL values are excluded before clipping.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not keys:
        raise DataFrameValidationError("dp_mean: group_cols must be non-empty")
    if epsilon <= 0:
        raise DataFrameValidationError("dp_mean: epsilon must be > 0")
    if not (hi > lo):
        raise DataFrameValidationError("dp_mean: need hi > lo")
    missing = [c for c in [*keys, value_col] if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"dp_mean: missing columns {missing}")
    y = F.col(value_col).cast("double")
    clipped = F.least(F.greatest(y, F.lit(float(lo))), F.lit(float(hi)))
    agg = (
        df.filter(y.isNotNull())
        .groupBy(*keys)
        .agg(F.sum(clipped).alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    half = float(epsilon) / 2.0
    key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    nsum = F.col("_s") + _laplace(F.concat(key, F.lit("#sum")), seed, (hi - lo) / half)
    ncnt = F.col("_n").cast("double") + _laplace(
        F.concat(key, F.lit("#cnt")), seed, 1.0 / half
    )
    mean = nsum / F.greatest(ncnt, F.lit(1.0))
    return agg.select(
        *keys,
        F.round(
            F.least(F.greatest(mean, F.lit(float(lo))), F.lit(float(hi))), 6
        ).alias("mean_noisy"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
