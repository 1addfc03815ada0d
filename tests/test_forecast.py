"""Forecast metrics: numpy formula parity, perfect-forecast zeros, MASE
naive identity, NULL exclusion."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.metrics.forecast import forecast_eval


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, ts double, a double, f double")


class TestForecastEval:
    def test_numpy_parity(self, spark):
        rng = np.random.RandomState(5)
        a = rng.rand(50) * 10 + 1
        f = a + rng.randn(50)
        rows = [("u", float(i), float(x), float(y)) for i, (x, y) in enumerate(zip(a, f))]
        r = forecast_eval(_df(spark, rows), "a", "f", "ts", "id").collect()[0]
        err = np.abs(a - f)
        assert r["mae"] == pytest.approx(err.mean(), abs=1e-6)
        assert r["rmse"] == pytest.approx(np.sqrt((err ** 2).mean()), abs=1e-6)
        assert r["mape"] == pytest.approx((err / np.abs(a)).mean(), abs=1e-6)
        assert r["smape"] == pytest.approx(
            (2 * err / (np.abs(a) + np.abs(f))).mean(), abs=1e-6
        )
        scale = np.abs(np.diff(a)).mean()
        assert r["mase"] == pytest.approx(err.mean() / scale, abs=1e-6)

    def test_naive_forecast_mase_is_one(self, spark):
        # forecast == previous actual -> MAE equals the naive scale... but
        # the scored subset drops the first row (null forecast), so build
        # the identity explicitly on the scored rows
        a = [3.0, 5.0, 4.0, 8.0, 6.0, 7.0]
        rows = [("u", float(i), a[i], a[i - 1]) for i in range(1, len(a))]
        r = forecast_eval(_df(spark, rows), "a", "f", "ts", "id").collect()[0]
        # scored actuals: a[1:]; naive scale over consecutive scored rows
        act = a[1:]
        mae = np.mean([abs(act[i] - a[i]) for i in range(len(act))])
        scale = np.abs(np.diff(act)).mean()
        assert r["mase"] == pytest.approx(mae / scale, abs=1e-6)

    def test_perfect_forecast(self, spark):
        rows = [("u", float(i), float(i + 1), float(i + 1)) for i in range(5)]
        r = forecast_eval(_df(spark, rows), "a", "f", "ts", "id").collect()[0]
        assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["mase"] == 0.0

    def test_constant_actuals_null_mase(self, spark):
        rows = [("u", float(i), 5.0, 4.0) for i in range(5)]
        r = forecast_eval(_df(spark, rows), "a", "f", "ts", "id").collect()[0]
        assert r["mase"] is None and r["mae"] == 1.0

    def test_null_rows_excluded_and_entities_isolated(self, spark):
        rows = [
            ("u1", 1.0, 2.0, 1.0), ("u1", 2.0, None, 1.0), ("u1", 3.0, 4.0, 5.0),
            ("u2", 1.0, 1.0, None), ("u2", 2.0, 3.0, 3.0),
        ]
        got = {r["id"]: r for r in
               forecast_eval(_df(spark, rows), "a", "f", "ts", "id").collect()}
        assert got["u1"]["n"] == 2 and got["u2"]["n"] == 1
        assert got["u1"]["mae"] == 1.0
        assert got["u2"]["mae"] == 0.0 and got["u2"]["mase"] is None
