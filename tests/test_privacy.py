"""DP releases (operators/privacy.py): md5-Laplace replay parity,
utility at reasonable epsilon, guards."""

from __future__ import annotations

import hashlib
import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.privacy import dp_counts, dp_mean


def _lap(keystr, seed, b):
    u = (
        int(hashlib.md5(f"{keystr}#dp{seed}".encode()).hexdigest()[:15], 16)
        % 10**9
    ) / 1e9
    c = u - 0.5
    if c == 0:
        return 0.0
    return -b * math.copysign(1, c) * math.log(max(1 - 2 * abs(c), 1e-12))


def _df(spark):
    rows = [("a", 1.0)] * 100 + [("b", 5.0)] * 50 + [("c", 9.0)] * 3
    return spark.createDataFrame(rows, "g string, y double")


class TestDpCounts:
    def test_replay_parity(self, spark):
        got = {r["g"]: r["n_noisy"] for r in dp_counts(_df(spark), "g").collect()}
        for g, n in (("a", 100), ("b", 50), ("c", 3)):
            assert got[g] == pytest.approx(
                round(max(n + _lap(g, 42, 1.0), 0.0), 6), abs=1e-6
            )

    def test_epsilon_scales_noise(self, spark):
        tight = {r["g"]: r["n_noisy"]
                 for r in dp_counts(_df(spark), "g", epsilon=100.0).collect()}
        assert tight["a"] == pytest.approx(100.0, abs=0.2)

    def test_floor_at_zero(self, spark):
        # find a seed whose draw is negative enough to push 0-ish counts < 0
        df = _df(spark)
        for seed in range(40):
            got = dp_counts(df.filter(df.g == "c"), "g", epsilon=0.05,
                            seed=seed).collect()[0]
            if _lap("c", seed, 20.0) < -3:
                assert got["n_noisy"] >= 0.0
                break

    def test_partition_invariance(self, spark):
        df = _df(spark)
        a = sorted(map(tuple, dp_counts(df, "g").collect()))
        b = sorted(map(tuple, dp_counts(df.repartition(7), "g").collect()))
        assert a == b

    def test_bad_args(self, spark):
        df = _df(spark)
        with pytest.raises(DataFrameValidationError):
            dp_counts(df, [], epsilon=1.0)
        with pytest.raises(DataFrameValidationError):
            dp_counts(df, "g", epsilon=0.0)


class TestDpMean:
    def test_replay_parity_and_clip(self, spark):
        got = {r["g"]: r["mean_noisy"]
               for r in dp_mean(_df(spark), "y", "g", 0.0, 10.0,
                                epsilon=2.0).collect()}
        for g, s, n in (("a", 100.0, 100), ("b", 250.0, 50), ("c", 27.0, 3)):
            ns = s + _lap(f"{g}#sum", 42, 10.0)
            nc = n + _lap(f"{g}#cnt", 42, 1.0)
            ref = round(min(max(ns / max(nc, 1.0), 0.0), 10.0), 6)
            assert got[g] == pytest.approx(ref, abs=1e-6)

    def test_values_clip_before_sum(self, spark):
        df = spark.createDataFrame([("a", 1000.0)] * 10, "g string, y double")
        got = dp_mean(df, "y", "g", 0.0, 10.0, epsilon=50.0).collect()[0]
        assert got["mean_noisy"] <= 10.0  # outliers cannot drag the release

    def test_bad_args(self, spark):
        df = _df(spark)
        with pytest.raises(DataFrameValidationError):
            dp_mean(df, "y", "g", 5.0, 5.0)
        with pytest.raises(DataFrameValidationError):
            dp_mean(df, "nope", "g", 0.0, 1.0)
