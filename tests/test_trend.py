"""Theil–Sen slope and Mann–Kendall trend test: brute-force pure-Python
reference parity, entity isolation, ties, degenerate series, contracts."""

from __future__ import annotations

import math

import numpy as np

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.trend import mann_kendall, theil_sen


def _mk_df(spark, rows):
    """rows: (id, t_seconds, y)"""
    return spark.createDataFrame(
        [(i, float(t), float(y) if y is not None else None) for i, t, y in rows],
        "doc_id string, event_time double, y double",
    )


def _ref_pairs(series):
    """series: [(t, y)] -> strict-time i<j pairs"""
    out = []
    s = sorted(series)
    for i in range(len(s)):
        for j in range(len(s)):
            if s[i][0] < s[j][0]:
                out.append((s[i], s[j]))
    return out


def _ref_theil_sen(series, unit=3600.0):
    slopes = sorted(
        (y2 - y1) / ((t2 - t1) / unit) for (t1, y1), (t2, y2) in _ref_pairs(series)
    )
    if not slopes:
        return None
    n = len(slopes)
    # linear interpolation (quantile_cont / Spark percentile semantics)
    h = (n - 1) * 0.5
    lo, hi = int(math.floor(h)), int(math.ceil(h))
    return slopes[lo] + (h - lo) * (slopes[hi] - slopes[lo])


def _ref_mk(series):
    pairs = _ref_pairs(series)
    s = sum(
        (y2 > y1) - (y2 < y1) for (t1, y1), (t2, y2) in pairs
    )
    n = len(series)
    ties = {}
    for _, y in series:
        ties[y] = ties.get(y, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    sigma = math.sqrt(var) if var > 0 else 0.0
    if sigma == 0:
        z = None
    elif s > 0:
        z = (s - 1) / sigma
    elif s < 0:
        z = (s + 1) / sigma
    else:
        z = 0.0
    return s, var, z


SERIES_A = [(0, 1.0), (3600, 2.0), (7200, 1.5), (10800, 4.0), (14400, 3.5)]
SERIES_B = [(0, 5.0), (1800, 5.0), (3600, 4.0), (5400, 2.0)]  # tied values
SERIES_C = [(0, 2.0), (0, 9.0), (3600, 3.0)]  # tied timestamps


class TestTheilSen:
    def test_reference_parity(self, spark):
        rows = [("a", t, y) for t, y in SERIES_A] + [
            ("b", t, y) for t, y in SERIES_B
        ]
        got = {
            r["doc_id"]: r
            for r in theil_sen(_mk_df(spark, rows), "y").collect()
        }
        for eid, series in (("a", SERIES_A), ("b", SERIES_B)):
            exp = _ref_theil_sen(series)
            assert got[eid]["slope"] == pytest.approx(exp, abs=1e-6)
            assert got[eid]["n_obs"] == len(series)
            assert got[eid]["n_pairs"] == len(_ref_pairs(series))

    def test_robust_to_outlier(self, spark):
        # a clean unit-slope line with one wild outlier: OLS moves, TS holds
        series = [(i * 3600, float(i)) for i in range(11)]
        series[5] = (5 * 3600, 1000.0)
        got = theil_sen(_mk_df(spark, [("a", t, y) for t, y in series]), "y").collect()[0]
        assert abs(got["slope"] - 1.0) < 0.2

    def test_tied_timestamps_excluded(self, spark):
        got = theil_sen(
            _mk_df(spark, [("c", t, y) for t, y in SERIES_C]), "y"
        ).collect()[0]
        # pairs only against t=3600: (2->3), (9->3); the t==0 pair is excluded
        assert got["n_pairs"] == 2
        assert got["slope"] == pytest.approx(
            _ref_theil_sen(SERIES_C), abs=1e-6
        )

    def test_single_point_null(self, spark):
        got = theil_sen(_mk_df(spark, [("x", 0, 1.0)]), "y").collect()[0]
        assert got["n_pairs"] == 0 and got["slope"] is None

    def test_null_values_dropped(self, spark):
        rows = [("a", 0, 1.0), ("a", 3600, None), ("a", 7200, 3.0)]
        got = theil_sen(_mk_df(spark, rows), "y").collect()[0]
        assert got["n_obs"] == 2 and got["n_pairs"] == 1
        assert got["slope"] == pytest.approx(1.0, abs=1e-6)

    def test_contracts(self, spark):
        df = _mk_df(spark, [("a", 0, 1.0)])
        with pytest.raises(DataFrameValidationError):
            theil_sen(df, "nope")
        with pytest.raises(DataFrameValidationError):
            theil_sen(df, "y", time_unit_seconds=0)

    def test_partition_invariance(self, spark):
        rows = [("a", t, y) for t, y in SERIES_A] + [
            ("b", t, y) for t, y in SERIES_B
        ]
        one = theil_sen(_mk_df(spark, rows).coalesce(1), "y").collect()
        many = theil_sen(_mk_df(spark, rows).repartition(7), "y").collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))


class TestMannKendall:
    def test_reference_parity(self, spark):
        rows = [("a", t, y) for t, y in SERIES_A] + [
            ("b", t, y) for t, y in SERIES_B
        ]
        got = {
            r["doc_id"]: r
            for r in mann_kendall(_mk_df(spark, rows), "y").collect()
        }
        for eid, series in (("a", SERIES_A), ("b", SERIES_B)):
            s, var, z = _ref_mk(series)
            assert got[eid]["s_stat"] == s
            assert got[eid]["var_s"] == pytest.approx(var, abs=1e-6)
            if z is None:
                assert got[eid]["z"] is None
            else:
                assert got[eid]["z"] == pytest.approx(z, abs=1e-6)

    def test_monotone_series_strong_z(self, spark):
        series = [(i * 3600, float(i)) for i in range(12)]
        got = mann_kendall(
            _mk_df(spark, [("m", t, y) for t, y in series]), "y"
        ).collect()[0]
        n = 12
        assert got["s_stat"] == n * (n - 1) // 2
        assert got["z"] > 3.0

    def test_constant_series_null_z(self, spark):
        series = [(i * 3600, 7.0) for i in range(5)]
        got = mann_kendall(
            _mk_df(spark, [("k", t, y) for t, y in series]), "y"
        ).collect()[0]
        # all values tied: tie_term == n(n-1)(2n+5) -> var 0 -> NULL z
        assert got["s_stat"] == 0 and got["var_s"] == 0.0 and got["z"] is None

    def test_entity_isolation(self, spark):
        # up-trend in a, down-trend in b: signs must not bleed
        rows = [("a", i * 60, float(i)) for i in range(6)] + [
            ("b", i * 60, float(-i)) for i in range(6)
        ]
        got = {r["doc_id"]: r for r in mann_kendall(_mk_df(spark, rows), "y").collect()}
        assert got["a"]["s_stat"] == 15 and got["b"]["s_stat"] == -15
        assert got["a"]["z"] > 0 and got["b"]["z"] < 0


def _holt_ref(ys, a, b=None):
    l = ys[0]
    bb = (ys[1] - ys[0]) if (b is not None and len(ys) >= 2) else 0.0
    for yv in ys[1:]:
        if b is None:
            l = a * yv + (1 - a) * l
        else:
            ln = a * yv + (1 - a) * (l + bb)
            bb = b * (ln - l) + (1 - b) * bb
            l = ln
    return l, bb


class TestHoltForecast:
    def _df(self, spark, series):
        import datetime

        rows = []
        for uid, ys in series.items():
            for i, yv in enumerate(ys):
                rows.append((uid, datetime.datetime(2024, 1, 1) +
                             datetime.timedelta(hours=i), i, yv))
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    def test_holt_parity(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        rng = np.random.RandomState(4)
        series = {u: [float(v) for v in rng.randn(30).cumsum() + 10] for u in range(5)}
        df = self._df(spark, series)
        got = holt_forecast(
            df, "value", "ts", "user_id", alpha=0.4, beta=0.3, horizon=3,
            order_col="event_id",
        )
        rows = {(r["user_id"], r["step"]): r for r in got.collect()}
        for u, ys in series.items():
            l, b = _holt_ref(ys, 0.4, 0.3)
            for h in (1, 2, 3):
                r = rows[(u, h)]
                assert r["level"] == pytest.approx(round(l, 6), abs=1e-6)
                assert r["trend"] == pytest.approx(round(b, 6), abs=1e-6)
                assert r["yhat"] == pytest.approx(l + h * b, abs=1e-5)
                assert r["n"] == 30

    def test_ses_parity_and_flat(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        series = {1: [3.0, 5.0, 4.0, 7.0], 2: [10.0]}
        df = self._df(spark, series)
        got = holt_forecast(df, "value", "ts", "user_id", alpha=0.3, horizon=2,
                            order_col="event_id")
        rows = {(r["user_id"], r["step"]): r for r in got.collect()}
        l, _ = _holt_ref(series[1], 0.3)
        assert rows[(1, 1)]["yhat"] == pytest.approx(l, abs=1e-6)
        assert rows[(1, 2)]["yhat"] == pytest.approx(l, abs=1e-6)  # SES is flat
        assert rows[(2, 1)]["yhat"] == pytest.approx(10.0)
        assert rows[(2, 1)]["trend"] == 0.0

    def test_single_point_holt(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        df = self._df(spark, {7: [4.5]})
        r = holt_forecast(df, "value", "ts", "user_id", alpha=0.5, beta=0.5,
                          horizon=1, order_col="event_id").collect()[0]
        assert r["level"] == 4.5 and r["trend"] == 0.0 and r["yhat"] == 4.5

    def test_nulls_dropped_and_order_ties(self, spark):
        import datetime

        from temporalscope_spark.operators.trend import holt_forecast

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, t0, 2, 5.0),      # tied timestamps: event_id breaks the tie
            (1, t0, 1, 3.0),
            (1, t0 + datetime.timedelta(hours=1), 3, None),
            (1, t0 + datetime.timedelta(hours=2), 4, 7.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )
        r = holt_forecast(df, "value", "ts", "user_id", alpha=0.5, horizon=1,
                          order_col="event_id").collect()[0]
        l, _ = _holt_ref([3.0, 5.0, 7.0], 0.5)
        assert r["n"] == 3
        assert r["yhat"] == pytest.approx(l, abs=1e-6)

    def test_partition_invariance(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        rng = np.random.RandomState(9)
        series = {u: [float(v) for v in rng.randn(20)] for u in range(4)}
        df = self._df(spark, series)
        a = holt_forecast(df, "value", "ts", "user_id", alpha=0.6, beta=0.2,
                          horizon=2, order_col="event_id")
        b = holt_forecast(df.repartition(11), "value", "ts", "user_id", alpha=0.6,
                          beta=0.2, horizon=2, order_col="event_id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_max_len_guard(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        df = self._df(spark, {1: [1.0, 2.0, 3.0]})
        with pytest.raises(Exception, match="max_len"):
            holt_forecast(df, "value", "ts", "user_id", alpha=0.5, horizon=1,
                          max_len=2, order_col="event_id").collect()

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.trend import holt_forecast

        df = self._df(spark, {1: [1.0]})
        with pytest.raises(DataFrameValidationError):
            holt_forecast(df, "value", "ts", "user_id", alpha=0.0)
        with pytest.raises(DataFrameValidationError):
            holt_forecast(df, "value", "ts", "user_id", beta=1.5)
        with pytest.raises(DataFrameValidationError):
            holt_forecast(df, "value", "ts", "user_id", horizon=0)
        with pytest.raises(DataFrameValidationError):
            holt_forecast(df, "nope", "ts", "user_id")


def _hw_ref(ys, m, a, b, g, H):
    l = sum(ys[:m]) / m
    bb = (sum(ys[m:2 * m]) / m - l) / m if len(ys) >= 2 * m else 0.0
    s = [yv - l for yv in ys[:m]]
    for yv in ys[m:]:
        s1 = s[0]
        ln = a * (yv - s1) + (1 - a) * (l + bb)
        bn = b * (ln - l) + (1 - b) * bb
        sn = g * (yv - l - bb) + (1 - g) * s1
        s = s[1:] + [sn]
        l, bb = ln, bn
    return {h: l + h * bb + s[(h - 1) % m] for h in range(1, H + 1)}, l, bb, s


class TestHoltWinters:
    def _df(self, spark, series):
        import datetime

        rows = []
        for uid, ys in series.items():
            for i, yv in enumerate(ys):
                rows.append((uid, datetime.datetime(2024, 1, 1) +
                             datetime.timedelta(days=i), i, yv))
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    def test_seasonal_parity_and_wraparound(self, spark):
        from temporalscope_spark.operators.trend import holt_winters_forecast

        rng = np.random.RandomState(8)
        series = {}
        for u, n in enumerate((25, 10)):  # >= 2m and between m and 2m
            base = rng.randn(n).cumsum()
            seas = [3 * math.sin(2 * math.pi * i / 7) for i in range(n)]
            series[u] = [float(base[i] + seas[i]) for i in range(n)]
        df = self._df(spark, series)
        got = {
            (r["user_id"], r["step"]): r
            for r in holt_winters_forecast(
                df, "value", "ts", "user_id", period=7,
                alpha=0.3, beta=0.1, gamma=0.2, horizon=9, order_col="event_id",
            ).collect()
        }
        for u, ys in series.items():
            fc, l, bb, s = _hw_ref(ys, 7, 0.3, 0.1, 0.2, 9)
            for h in range(1, 10):   # h > m exercises the seasonal wraparound
                assert got[(u, h)]["yhat"] == pytest.approx(fc[h], abs=1e-5)
            assert got[(u, 1)]["level"] == pytest.approx(l, abs=1e-6)
            assert got[(u, 1)]["trend"] == pytest.approx(bb, abs=1e-6)
            assert got[(u, 1)]["seasonal"] == pytest.approx(s[0], abs=1e-6)

    def test_short_series_excluded(self, spark):
        from temporalscope_spark.operators.trend import holt_winters_forecast

        series = {1: [1.0, 2.0, 3.0], 2: [float(i) for i in range(8)]}
        df = self._df(spark, series)
        got = holt_winters_forecast(
            df, "value", "ts", "user_id", period=4, horizon=1, order_col="event_id"
        )
        assert sorted(r["user_id"] for r in got.collect()) == [2]

    def test_pure_seasonal_signal_recovered(self, spark):
        from temporalscope_spark.operators.trend import holt_winters_forecast

        pattern = [10.0, 20.0, 5.0, 15.0]
        series = {1: pattern * 8}   # perfectly periodic, no trend
        df = self._df(spark, series)
        got = {
            r["step"]: r["yhat"]
            for r in holt_winters_forecast(
                df, "value", "ts", "user_id", period=4,
                alpha=0.5, beta=0.1, gamma=0.5, horizon=4, order_col="event_id",
            ).collect()
        }
        for h in range(1, 5):   # forecasts continue the pattern
            assert got[h] == pytest.approx(pattern[(len(series[1]) + h - 1) % 4],
                                           abs=0.2)

    def test_partition_invariance(self, spark):
        from temporalscope_spark.operators.trend import holt_winters_forecast

        rng = np.random.RandomState(3)
        series = {u: [float(v) for v in rng.randn(15)] for u in range(4)}
        df = self._df(spark, series)
        a = holt_winters_forecast(df, "value", "ts", "user_id", period=5,
                                  horizon=2, order_col="event_id")
        b = holt_winters_forecast(df.repartition(13), "value", "ts", "user_id",
                                  period=5, horizon=2, order_col="event_id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.trend import holt_winters_forecast

        df = self._df(spark, {1: [1.0, 2.0]})
        with pytest.raises(DataFrameValidationError):
            holt_winters_forecast(df, "value", "ts", "user_id", period=1)
        with pytest.raises(DataFrameValidationError):
            holt_winters_forecast(df, "value", "ts", "user_id", period=2, gamma=0.0)
        with pytest.raises(DataFrameValidationError):
            holt_winters_forecast(df, "value", "ts", "user_id", period=2, horizon=0)


class TestKalmanLocalLevel:
    def _df(self, spark, series):
        import datetime

        rows = []
        for uid, ys in series.items():
            for i, yv in enumerate(ys):
                rows.append((uid, datetime.datetime(2024, 1, 1) +
                             datetime.timedelta(hours=i), i, yv))
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    @staticmethod
    def _ref(ys, q, r):
        x, P = ys[0], r
        for yv in ys[1:]:
            pm = P + q
            K = pm / (pm + r)
            x = x + K * (yv - x)
            P = (1 - K) * pm
        return x, P

    def test_recursion_parity(self, spark):
        from temporalscope_spark.operators.trend import kalman_local_level

        rng = np.random.RandomState(5)
        series = {u: [float(v) for v in rng.randn(40).cumsum()] for u in range(4)}
        df = self._df(spark, series)
        got = {r["user_id"]: r for r in kalman_local_level(
            df, "value", "ts", "user_id", q_var=0.5, r_var=2.0, horizon=1,
            order_col="event_id").collect()}
        for u, ys in series.items():
            x, P = self._ref(ys, 0.5, 2.0)
            assert got[u]["level"] == pytest.approx(x, abs=1e-6)
            assert got[u]["p_var"] == pytest.approx(P, abs=1e-6)
            assert got[u]["forecast_var"] == pytest.approx(P + 0.5 + 2.0, abs=1e-6)

    def test_tracks_level_and_uncertainty_widens(self, spark):
        from temporalscope_spark.operators.trend import kalman_local_level

        series = {1: [10.0] * 30}
        df = self._df(spark, series)
        got = kalman_local_level(df, "value", "ts", "user_id", q_var=0.1,
                                 r_var=1.0, horizon=3,
                                 order_col="event_id").collect()
        rows = sorted(got, key=lambda r: r["step"])
        assert rows[0]["level"] == pytest.approx(10.0, abs=1e-6)
        assert rows[0]["forecast_var"] < rows[1]["forecast_var"] < rows[2]["forecast_var"]

    def test_smoothing_ratio(self, spark):
        from temporalscope_spark.operators.trend import kalman_local_level

        series = {1: [0.0] * 20 + [10.0]}  # one surprise observation
        df = self._df(spark, series)
        smooth = kalman_local_level(df, "value", "ts", "user_id", q_var=0.01,
                                    r_var=10.0, order_col="event_id").collect()[0]
        reactive = kalman_local_level(df, "value", "ts", "user_id", q_var=10.0,
                                      r_var=0.01, order_col="event_id").collect()[0]
        assert smooth["level"] < 1.0       # low q/r barely moves
        assert reactive["level"] > 9.0     # high q/r chases the new point

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.trend import kalman_local_level

        df = self._df(spark, {1: [1.0]})
        with pytest.raises(DataFrameValidationError):
            kalman_local_level(df, "value", "ts", "user_id", q_var=0.0)
        with pytest.raises(DataFrameValidationError):
            kalman_local_level(df, "value", "ts", "user_id", horizon=0)
