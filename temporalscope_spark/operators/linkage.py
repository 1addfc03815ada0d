"""Probabilistic record linkage (Fellegi & Sunter 1969) — blocked
candidate generation + log-odds agreement scoring, the entity-resolution
companion to the dedup family: dedup asks "are these the SAME string",
linkage asks "do these two RECORDS describe the same entity" across
tables with per-field reliability.

Model: for candidate pair (a, b) and comparison fields f with match /
non-match agreement probabilities m_f = P(agree | match), u_f =
P(agree | non-match), the match weight is

    W(a,b) = Σ_f  log2(m_f/u_f)          if field f agrees
             Σ_f  log2((1−m_f)/(1−u_f))  if it disagrees

and pairs are classified by thresholds (link / possible / non-link).
m/u are caller-supplied (from domain knowledge or a labeled sample —
the EM fit is a separate concern; these weights are exactly what EM
would plug in).

Scale shape: candidate pairs come ONLY from an equi-join on the
blocking key(s) — the classic blocking discipline (never n²; the same
guard as the LSH-banded dedup joins). Agreement tests and weights are
pure expressions; NULL fields contribute 0 weight (the standard
"missing is uninformative" convention). A field can compare exactly or
on a normalized form via an optional expression.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def fs_link(
    left: DataFrame,
    right: DataFrame,
    block_on: str | list[str],
    compare: dict,
    left_id: str,
    right_id: str,
    lower: float = 0.0,
    upper: float = 8.0,
) -> DataFrame:
    """Fellegi–Sunter linkage. ``compare`` maps field name → ``(m, u)``
    with 0 < u < m < 1 (a field must be MORE likely to agree on true
    matches than on random pairs, or it carries no signal). Returns one
    row per blocked candidate pair:

        (left_id, right_id, weight, n_agree, n_known, decision)

    with ``decision`` ∈ {'link', 'possible', 'non_link'} by
    ``weight >= upper`` / ``>= lower`` / below, and weight rounded 6.
    NULL on either side of a field skips it (0 contribution,
    uncounted in ``n_known``).
    """
    keys = [block_on] if isinstance(block_on, str) else list(block_on)
    if not compare:
        raise DataFrameValidationError("fs_link: compare fields must be non-empty")
    if lower > upper:
        raise DataFrameValidationError("fs_link: lower must be <= upper")
    for side, df, idc in (("left", left, left_id), ("right", right, right_id)):
        missing = [c for c in [idc, *keys, *compare] if c not in df.columns]
        if missing:
            raise DataFrameValidationError(
                f"fs_link: {side} side missing columns {missing}"
            )
    for f, (m, u) in compare.items():
        if not (0.0 < u < m < 1.0):
            raise DataFrameValidationError(
                f"fs_link: field {f!r} needs 0 < u < m < 1, got m={m}, u={u}"
            )
    lsel = left.select(
        F.col(left_id).alias("_lid"),
        *[F.col(k).alias(f"_bk{i}") for i, k in enumerate(keys)],
        *[F.col(f).alias(f"_l_{f}") for f in compare],
    )
    rsel = right.select(
        F.col(right_id).alias("_rid"),
        *[F.col(k).alias(f"_bk{i}") for i, k in enumerate(keys)],
        *[F.col(f).alias(f"_r_{f}") for f in compare],
    )
    pairs = lsel.join(rsel, [f"_bk{i}" for i in range(len(keys))])
    weight: Column = F.lit(0.0)
    agree_n: Column = F.lit(0)
    known_n: Column = F.lit(0)
    for f, (m, u) in compare.items():
        lv, rv = F.col(f"_l_{f}"), F.col(f"_r_{f}")
        known = lv.isNotNull() & rv.isNotNull()
        agree = known & (lv == rv)
        w_agree = math.log2(m / u)
        w_disagree = math.log2((1.0 - m) / (1.0 - u))
        weight = weight + F.when(agree, F.lit(w_agree)).when(
            known, F.lit(w_disagree)
        ).otherwise(F.lit(0.0))
        agree_n = agree_n + agree.cast("int")
        known_n = known_n + known.cast("int")
    w6 = F.round(weight, 6)
    decision = (
        F.when(w6 >= F.lit(float(upper)), F.lit("link"))
        .when(w6 >= F.lit(float(lower)), F.lit("possible"))
        .otherwise(F.lit("non_link"))
    )
    return pairs.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        w6.alias("weight"),
        agree_n.alias("n_agree"),
        known_n.alias("n_known"),
        decision.alias("decision"),
    )


def fs_em_round(
    pairs: DataFrame,
    agree_cols: list,
    m: dict,
    u: dict,
    p: float,
) -> dict:
    """ONE EM round for the Fellegi–Sunter parameters (Winkler 1988 —
    the standard way to GET the m/u probabilities :func:`fs_link`
    consumes, fitted on the blocked candidate pairs themselves, no
    labels needed).

    E-step (expressions, per pair): likelihood ratio
    ``R = Π_f (m_f/u_f)^[agree] · ((1−m_f)/(1−u_f))^[disagree]`` over
    KNOWN fields; posterior match weight ``g = pR / (pR + 1 − p)``.
    M-step (ONE map-side-combinable aggregation):

        m_f' = Σ g·agree_f / Σ g·known_f
        u_f' = Σ (1−g)·agree_f / Σ (1−g)·known_f
        p'   = Σ g / N

    Returns ``{"m": {...}, "u": {...}, "p": ..., "n_pairs": ...,
    "expected_matches": ...}`` (full precision; round at the edge).
    NULL agreement values mean "field unknown for this pair" — they are
    skipped in both steps. Iterate to fit; each round is one scan of
    the bounded candidate-pair table (already blocked — never n²).
    Updated probabilities are clamped to [1e-6, 1−1e-6] (the standard
    EM degeneracy guard). ``agree_cols`` must be boolean-like columns.
    """
    if not agree_cols:
        raise DataFrameValidationError("fs_em_round: agree_cols must be non-empty")
    missing = [c for c in agree_cols if c not in pairs.columns]
    if missing:
        raise DataFrameValidationError(f"fs_em_round: missing columns {missing}")
    if not (0.0 < p < 1.0):
        raise DataFrameValidationError("fs_em_round: p must be in (0, 1)")
    for f in agree_cols:
        if f not in m or f not in u:
            raise DataFrameValidationError(f"fs_em_round: m/u missing field {f!r}")
        if not (0.0 < u[f] < 1.0 and 0.0 < m[f] < 1.0):
            raise DataFrameValidationError(
                f"fs_em_round: m/u for {f!r} must be in (0, 1)"
            )
    r: "F.Column" = F.lit(1.0)
    for f in agree_cols:
        a = F.col(f).cast("boolean")
        r = r * F.when(a, F.lit(float(m[f]) / float(u[f]))).when(
            ~a, F.lit((1.0 - float(m[f])) / (1.0 - float(u[f])))
        ).otherwise(F.lit(1.0))
    g = F.lit(float(p)) * r / (F.lit(float(p)) * r + F.lit(1.0 - float(p)))
    aggs = [F.count(F.lit(1)).alias("_n"), F.sum(g).alias("_sg")]
    for f in agree_cols:
        a = F.col(f).cast("boolean")
        known = a.isNotNull()
        aggs += [
            F.sum(F.when(a, g)).alias(f"_ga_{f}"),
            F.sum(F.when(known, g)).alias(f"_gk_{f}"),
            F.sum(F.when(a, 1.0 - g)).alias(f"_ua_{f}"),
            F.sum(F.when(known, 1.0 - g)).alias(f"_uk_{f}"),
        ]
    row = pairs.agg(*aggs).first()
    n = int(row["_n"])
    if n == 0:
        raise DataFrameValidationError("fs_em_round: no candidate pairs")
    eps = 1e-6
    clamp = lambda v: min(max(v, eps), 1.0 - eps)  # noqa: E731
    new_m = {
        f: clamp((row[f"_ga_{f}"] or 0.0) / row[f"_gk_{f}"])
        if row[f"_gk_{f}"] else float(m[f])
        for f in agree_cols
    }
    new_u = {
        f: clamp((row[f"_ua_{f}"] or 0.0) / row[f"_uk_{f}"])
        if row[f"_uk_{f}"] else float(u[f])
        for f in agree_cols
    }
    return {
        "m": new_m,
        "u": new_u,
        "p": clamp(row["_sg"] / n),
        "n_pairs": n,
        "expected_matches": float(row["_sg"]),
    }
