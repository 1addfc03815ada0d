"""MASV (Mean Absolute SHAP Values) shell — reference masv.py:26-98 parity.

The reference's docstring math: MASV[f][phase] = (1/n) Σ |importance_i(f)|
over the phase's train rows. SHAP itself is not in this environment, so the
explainer is pluggable; these tests pin the aggregation contract with a
hand-computable importance function and check the default proxy end-to-end.
"""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.frame import TemporalFrame
from temporalscope_spark.metrics import abs_deviation_importance, calculate_masv
from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
from tests.conftest import make_ts_df


@pytest.fixture
def fitted(spark):
    df = make_ts_df(spark, n=100, k=2, time_numeric=True)
    tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
    p = SlidingWindowPartitioner(tf, num_partitions=5, train_pct=0.7)
    p.setup()
    p.fit()
    return p


def test_masv_shape_and_order(fitted):
    masv = calculate_masv(fitted, ["feature_1", "feature_2"])
    assert set(masv) == {"feature_1", "feature_2"}
    assert all(len(v) == 5 for v in masv.values())
    assert all(x >= 0.0 for v in masv.values() for x in v)


def test_masv_matches_hand_computation(spark, fitted):
    """With importance = 2*x the docstring formula is checkable by hand:
    MASV[f][p] = mean over phase-p train rows of |2*x_f|."""

    def doubled(df, cols):
        return df.select(
            "*", *[ (F.col(c) * 2).alias(f"imp_{c}") for c in cols ]
        )

    masv = calculate_masv(fitted, ["feature_1"], importance_fn=doubled)

    labeled = fitted.with_bucket_labels().filter(F.col("split") == "train")
    pdf = labeled.select("bucket", "feature_1").toPandas()
    for b in range(5):
        want = (pdf[pdf["bucket"] == b]["feature_1"] * 2).abs().mean()
        assert masv["feature_1"][b] == pytest.approx(float(want), rel=1e-9)


def test_default_importance_is_abs_deviation(spark, fitted):
    labeled = fitted.with_bucket_labels().filter(F.col("split") == "train")
    scored = abs_deviation_importance(labeled, ["feature_1"])
    pdf = scored.select("feature_1", "imp_feature_1").toPandas()
    mean = pdf["feature_1"].mean()
    assert ((pdf["feature_1"] - mean).abs() - pdf["imp_feature_1"]).abs().max() < 1e-9


def test_masv_default_end_to_end(fitted):
    masv = calculate_masv(fitted, ["feature_1", "feature_2"])
    # deviation importance is strictly positive on non-constant features
    assert all(x > 0.0 for x in masv["feature_1"])


def test_masv_overlapping_windows_fallback(spark):
    """stride < window: rows belong to several phases; the union path must
    still produce one MASV entry per phase."""
    df = make_ts_df(spark, n=100, k=1, time_numeric=True)
    tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
    p = SlidingWindowPartitioner(tf, window_size=40, stride=20, train_pct=0.7)
    p.setup()
    p.fit()
    masv = calculate_masv(p, ["feature_1"])
    assert len(masv["feature_1"]) == len(p.metadata["partitions"])
    assert all(x > 0.0 for x in masv["feature_1"])


def test_masv_requires_fit(spark):
    df = make_ts_df(spark, n=50, k=1, time_numeric=True)
    tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
    p = SlidingWindowPartitioner(tf, num_partitions=5)
    with pytest.raises(RuntimeError, match="fit"):
        calculate_masv(p, ["feature_1"])


def test_masv_bad_split(fitted):
    with pytest.raises(ValueError, match="split must be"):
        calculate_masv(fitted, ["feature_1"], split="holdout")
