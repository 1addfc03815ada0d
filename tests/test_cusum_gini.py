"""CUSUM changepoint, Gini concentration, Benford digits: numpy/pure
reference parity, degenerate inputs, tie determinism."""

from __future__ import annotations

import math

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import benford_digits, gini_concentration
from temporalscope_spark.operators.drift import cusum_changepoint


def _gini_ref(vals):
    xs = sorted(vals)
    n = len(xs)
    s = sum(xs)
    if s == 0:
        return None
    return round(2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n, 6)


class TestCusum:
    def test_planted_level_shift(self, spark):
        rng = np.random.RandomState(3)
        xs = np.concatenate([rng.randn(40), rng.randn(40) + 5.0])
        rows = [("u", float(i), float(x)) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "id string, ts double, x double")
        r = cusum_changepoint(df, "ts", "x", "id").collect()[0]
        # CUSUM peaks at the true break (position 40, i.e. ts 39)
        assert abs(r["change_t"] - 39.0) <= 2.0
        assert r["stat"] > 1.0

    def test_reference_arithmetic(self, spark):
        xs = [1.0, 2.0, 3.0, 10.0, 11.0]
        rows = [("u", float(i), x) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "id string, ts double, x double")
        r = cusum_changepoint(df, "ts", "x", "id").collect()[0]
        mu = sum(xs) / len(xs)
        cs = np.cumsum([x - mu for x in xs])
        assert r["cusum_abs_max"] == pytest.approx(max(abs(c) for c in cs), abs=1e-6)
        assert r["s_range"] == pytest.approx(cs.max() - cs.min(), abs=1e-6)
        sd = np.std(xs, ddof=1)
        assert r["stat"] == pytest.approx(
            (cs.max() - cs.min()) / (sd * math.sqrt(len(xs))), abs=1e-6
        )
        assert r["change_t"] == 2.0  # |C| peaks right before the jump

    def test_constant_series_null_stat(self, spark):
        rows = [("u", float(i), 7.0) for i in range(5)]
        df = spark.createDataFrame(rows, "id string, ts double, x double")
        r = cusum_changepoint(df, "ts", "x", "id").collect()[0]
        assert r["stat"] is None and r["s_range"] == 0.0

    def test_entities_isolated(self, spark):
        rows = [("a", float(i), float(i)) for i in range(4)] + [
            ("b", float(i), 1.0) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "id string, ts double, x double")
        got = {r["id"]: r for r in cusum_changepoint(df, "ts", "x", "id").collect()}
        assert got["a"]["n_obs"] == 4 and got["b"]["n_obs"] == 3
        assert got["b"]["stat"] is None


class TestGini:
    def test_reference_parity(self, spark):
        vals = [1.0, 1.0, 2.0, 5.0, 20.0, 20.0, 100.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = gini_concentration(df, "x").collect()[0]
        assert r["gini"] == pytest.approx(_gini_ref(vals), abs=1e-6)
        assert r["n"] == len(vals) and r["total"] == sum(vals)

    def test_equal_values_zero(self, spark):
        df = spark.createDataFrame([(3.0,)] * 10, "x double")
        assert gini_concentration(df, "x").collect()[0]["gini"] == 0.0

    def test_extreme_concentration(self, spark):
        vals = [0.0] * 99 + [1000.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = gini_concentration(df, "x").collect()[0]
        assert r["gini"] == pytest.approx(0.99, abs=1e-6)

    def test_groups(self, spark):
        rows = [("a", v) for v in [1.0, 9.0]] + [("b", v) for v in [5.0, 5.0]]
        df = spark.createDataFrame(rows, "g string, x double")
        got = {r["group"]: r["gini"] for r in
               gini_concentration(df, "x", group_col="g").collect()}
        assert got["a"] == pytest.approx(_gini_ref([1.0, 9.0]), abs=1e-6)
        assert got["b"] == 0.0

    def test_zero_total_null(self, spark):
        df = spark.createDataFrame([(0.0,), (0.0,)], "x double")
        assert gini_concentration(df, "x").collect()[0]["gini"] is None


class TestBenford:
    def test_digit_extraction_and_chi(self, spark):
        vals = [1.0, 19.5, 0.002, 300.0, 9.99, 0.91, -25.0]
        # first digits: 1, 1, 2, 3, 9, 9, 2
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {r["digit"]: r for r in benford_digits(df, "x").collect()}
        assert len(got) == 9
        assert got[1]["n"] == 2 and got[2]["n"] == 2 and got[3]["n"] == 1
        assert got[9]["n"] == 2 and got[4]["n"] == 0
        n = len(vals)
        for d in range(1, 10):
            exp = math.log10(1 + 1 / d)
            assert got[d]["expected"] == pytest.approx(exp, abs=1e-6)
            share = got[d]["n"] / n
            assert got[d]["share"] == pytest.approx(share, abs=1e-6)
            assert got[d]["chi_term"] == pytest.approx(
                n * (share - exp) ** 2 / exp, abs=1e-5
            )

    def test_benford_sample_low_chi(self, spark):
        # a log-uniform sample IS Benford: chi-square stays small
        rng = np.random.RandomState(0)
        vals = np.power(10.0, rng.uniform(0, 3, 5000))
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        chi = sum(r["chi_term"] for r in benford_digits(df, "x").collect())
        assert chi < 20.0  # 8 df, 95% crit = 15.5; generous margin

    def test_zeros_excluded(self, spark):
        df = spark.createDataFrame([(0.0,), (5.0,)], "x double")
        got = {r["digit"]: r["n"] for r in benford_digits(df, "x").collect()}
        assert got[5] == 1 and sum(got.values()) == 1
