"""Mean Absolute SHAP Values (MASV) — temporal feature importance per phase.

Implements the shell of the reference's ``calculate_masv``
(/root/reference/src/temporalscope/metrics/masv.py:26-98, commented-out in
the snapshot): for every partitioner phase p and feature f,

    MASV[f][p] = (1/n_p) * Σ_{rows i in phase p's split} |importance_i(f)|

The reference hard-wires a SHAP ``Explainer(model)``; neither SHAP nor a
model stack exists in this environment, so the explainer is a PLUGGABLE
``importance_fn`` — any callable that maps (DataFrame, feature_cols) to the
same DataFrame with one ``imp_{f}`` column per feature (vectorized,
expression-only or Pandas-UDF). The default :func:`abs_deviation_importance`
is an explicit stand-in (|x - global mean|), NOT SHAP. For the built-in
closed-form linear trainer, however,
:func:`temporalscope_spark.modeling.linear_shap_importance` IS exact SHAP
(Linear SHAP: φ_f(x) = coef_f·(x_f − E[x_f]), Lundberg & Lee 2017) with no
``shap`` dependency — MASV over linear models is therefore the real metric,
not a proxy (driver query ``masv_linear`` verifies it end-to-end).

Spark-first shape: the reference loops partitions and runs the explainer
per phase (P driver round-trips). Here every row is labeled with its
(bucket, split) in one pass (``with_bucket_labels`` — a narrow map against
the fitted boundary literals), importance columns are added map-side, and
all P×F means fold in ONE hash aggregation; only the P×F result matrix
reaches the driver. Overlapping windows (stride < window) fall back to a
union of the partitioner's range filters, still submitted as one job.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

ImportanceFn = Callable[[DataFrame, list[str]], DataFrame]


def abs_deviation_importance(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Default pluggable importance: ``imp_f = |x_f - mean(x_f)|``.

    A deterministic, model-free magnitude proxy so the MASV pipeline is
    runnable and testable without SHAP; swap in a real explainer via
    ``importance_fn`` for production use. The per-feature global means are
    ONE tiny aggregate row inlined as literals — no join, no second scan
    of the labeled data.
    """
    means = df.select(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in feature_cols]
    ).first()
    cols = [
        F.abs(F.col(c).cast("double") - F.lit(float(means[c] or 0.0))).alias(f"imp_{c}")
        for c in feature_cols
    ]
    return df.select("*", *cols)


def calculate_masv(
    partitioner: SlidingWindowPartitioner,
    feature_cols: list[str],
    importance_fn: Optional[ImportanceFn] = None,
    split: str = "train",
) -> dict[str, list[float]]:
    """MASV per feature per phase (reference masv.py:33-98 semantics).

    Returns ``{feature: [masv_phase_0, masv_phase_1, ...]}`` over the
    partitioner's fitted phases, computed on each phase's ``split`` rows
    (the reference uses 'train'). Empty phases contribute 0.0 (the
    reference's np.mean would NaN; an explicit zero is the documented
    deviation).
    """
    if partitioner.metadata is None:
        raise RuntimeError("Call `fit` before `calculate_masv`.")
    if split not in ("train", "test", "validation"):
        raise ValueError("split must be 'train', 'test' or 'validation'")
    importance_fn = importance_fn or abs_deviation_importance
    n_parts = len(partitioner.metadata["partitions"])

    if partitioner.metadata["stride"] == partitioner.metadata["window_size"]:
        labeled = partitioner.with_bucket_labels().filter(F.col("split") == split)
    else:
        # overlapping windows: rows belong to several phases — union the
        # partitioner's range filters with a bucket literal (one job; each
        # branch is a pushdown-eligible time-range scan)
        parts = []
        for b, part in enumerate(partitioner.transform()):
            sdf = part[split]
            if sdf is None:
                continue
            parts.append(sdf.withColumn("bucket", F.lit(b)))
        if not parts:
            return {f: [0.0] * n_parts for f in feature_cols}
        labeled = parts[0]
        for p in parts[1:]:
            labeled = labeled.unionByName(p)

    scored = importance_fn(labeled, list(feature_cols))
    rows = (
        scored.groupBy("bucket")
        .agg(*[F.avg(F.abs(F.col(f"imp_{c}"))).alias(c) for c in feature_cols])
        .collect()
    )
    by_bucket = {r["bucket"]: r for r in rows}
    return {
        c: [
            float(by_bucket[b][c]) if b in by_bucket and by_bucket[b][c] is not None else 0.0
            for b in range(n_parts)
        ]
        for c in feature_cols
    }
