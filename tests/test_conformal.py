"""Split-conformal intervals (metrics/conformal.py).

Correctness gauge: numpy's k-th order statistic on the same calibration
residuals (exact, not an interpolated quantile) and the finite-sample
marginal-coverage guarantee on exchangeable synthetic data. The Mondrian
lane is checked for per-group isolation and the NULL contract on
too-small groups.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.metrics.conformal import conformal_interval


@pytest.fixture(scope="module")
def reg_df(spark):
    rng = np.random.RandomState(7)
    n = 2000
    y = rng.randn(n) * 2.0
    yhat = y + rng.randn(n) * 0.5  # noisy predictor, exchangeable errors
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "grp": np.where(np.arange(n) % 3 == 0, "a", "b"),
            "y": y,
            "yhat": yhat,
            "is_calib": np.arange(n) % 2 == 0,
        }
    )
    return spark.createDataFrame(pdf)


def _np_q(pdf, alpha):
    r = np.sort(np.abs(pdf.y - pdf.yhat).values)
    n = len(r)
    k = math.ceil((n + 1) * (1 - alpha))
    return r[k - 1]


class TestUngrouped:
    def test_q_is_exact_order_statistic(self, reg_df):
        out = conformal_interval(
            reg_df, "y", "yhat", "is_calib", alpha=0.1, id_col="rid"
        )
        pdf = reg_df.toPandas()
        q = _np_q(pdf[pdf.is_calib], 0.1)
        got = out.select("qhat").distinct().collect()
        assert len(got) == 1
        assert got[0]["qhat"] == pytest.approx(round(q, 6), abs=1e-6)

    def test_bounds_and_covered(self, reg_df):
        out = conformal_interval(
            reg_df, "y", "yhat", "is_calib", alpha=0.1, id_col="rid"
        ).toPandas()
        assert np.allclose(out.lo, np.round(out.yhat - out.qhat, 6), atol=2e-6)
        assert np.allclose(out.hi, np.round(out.yhat + out.qhat, 6), atol=2e-6)
        want = np.round(np.abs(out.y - out.yhat), 6) <= out.qhat
        assert (out.covered == want).all()

    def test_marginal_coverage_guarantee(self, reg_df):
        # exchangeable calib/serve split => coverage >= 1 - alpha
        # (finite-sample; allow tiny slack for the binomial wobble)
        out = conformal_interval(
            reg_df, "y", "yhat", "is_calib", alpha=0.2, id_col="rid"
        ).toPandas()
        assert out.covered.mean() >= 0.8 - 0.03

    def test_only_serve_rows_emitted(self, reg_df):
        out = conformal_interval(
            reg_df, "y", "yhat", "is_calib", alpha=0.1, id_col="rid"
        )
        n_serve = reg_df.filter(~F.col("is_calib")).count()
        assert out.count() == n_serve

    def test_validation(self, reg_df, spark):
        with pytest.raises(DataFrameValidationError):
            conformal_interval(reg_df, "y", "yhat", "is_calib", alpha=1.5)
        with pytest.raises(DataFrameValidationError):
            conformal_interval(reg_df, "nope", "yhat", "is_calib")
        tiny = spark.createDataFrame(
            [(1, 1.0, 1.1, True), (2, 2.0, 2.2, False)],
            "rid long, y double, yhat double, is_calib boolean",
        )
        # n=1 calib, alpha=0.1 => k=ceil(2*0.9)=2 > 1 => no finite interval
        with pytest.raises(DataFrameValidationError):
            conformal_interval(tiny, "y", "yhat", "is_calib", alpha=0.1)

    def test_partition_invariance(self, reg_df):
        a = (
            conformal_interval(reg_df, "y", "yhat", "is_calib", id_col="rid")
            .orderBy("rid")
            .toPandas()
        )
        b = (
            conformal_interval(
                reg_df.repartition(11), "y", "yhat", "is_calib", id_col="rid"
            )
            .orderBy("rid")
            .toPandas()
        )
        pd.testing.assert_frame_equal(a, b)


class TestMondrian:
    def test_per_group_q(self, reg_df):
        out = conformal_interval(
            reg_df, "y", "yhat", "is_calib", alpha=0.1, id_col="rid", group_col="grp"
        ).toPandas()
        pdf = reg_df.toPandas()
        for g in ("a", "b"):
            q = _np_q(pdf[pdf.is_calib & (pdf.grp == g)], 0.1)
            got = out[out.grp == g].qhat.unique()
            assert len(got) == 1
            assert got[0] == pytest.approx(round(q, 6), abs=1e-6)

    def test_small_group_yields_null(self, spark):
        rows = [(i, "big", float(i), float(i) + 0.1, i % 2 == 0) for i in range(100)]
        rows += [(1000, "tiny", 5.0, 5.5, True), (1001, "tiny", 6.0, 6.1, False)]
        df = spark.createDataFrame(
            rows, "rid long, grp string, y double, yhat double, is_calib boolean"
        )
        out = conformal_interval(
            df, "y", "yhat", "is_calib", alpha=0.1, id_col="rid", group_col="grp"
        ).toPandas()
        tiny = out[out.grp == "tiny"]
        assert len(tiny) == 1 and tiny.qhat.isna().all() and tiny.lo.isna().all()
        big = out[out.grp == "big"]
        assert big.qhat.notna().all()
