"""A/B effect summary and CUPED: formula parity vs numpy, degenerate
cases, variance-reduction property."""

from __future__ import annotations

import math

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.experiment import ab_test, cuped_adjust


class TestAbTest:
    def test_two_proportion_parity(self, spark):
        rows = [("c", 1.0)] * 40 + [("c", 0.0)] * 60 + \
               [("t", 1.0)] * 55 + [("t", 0.0)] * 45
        df = spark.createDataFrame(rows, "variant string, y double")
        got = {r["variant"]: r for r in ab_test(df, "variant", "y", "c").collect()}
        pc, pt = 0.4, 0.55
        assert got["c"]["mean"] == pytest.approx(pc)
        assert got["t"]["diff"] == pytest.approx(pt - pc, abs=1e-6)
        assert got["t"]["lift"] == pytest.approx((pt - pc) / pc, abs=1e-6)
        vc = np.var([1.0] * 40 + [0.0] * 60, ddof=1)
        vt = np.var([1.0] * 55 + [0.0] * 45, ddof=1)
        z = (pt - pc) / math.sqrt(vt / 100 + vc / 100)
        assert got["t"]["z"] == pytest.approx(z, abs=1e-6)
        assert got["c"]["diff"] is None and got["c"]["z"] is None

    def test_continuous_welch(self, spark):
        rng = np.random.RandomState(1)
        a = rng.randn(80) * 2 + 10
        b = rng.randn(120) * 3 + 11
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "variant string, y double")
        got = {r["variant"]: r for r in ab_test(df, "variant", "y", "a").collect()}
        z = (b.mean() - a.mean()) / math.sqrt(
            b.var(ddof=1) / len(b) + a.var(ddof=1) / len(a)
        )
        assert got["b"]["z"] == pytest.approx(z, abs=1e-5)
        assert got["a"]["var"] == pytest.approx(a.var(ddof=1), abs=1e-5)

    def test_missing_control_raises(self, spark):
        df = spark.createDataFrame([("t", 1.0)], "variant string, y double")
        with pytest.raises(Exception, match="not present"):
            ab_test(df, "variant", "y", "c").collect()

    def test_single_row_variant_null_var(self, spark):
        rows = [("c", 1.0), ("c", 0.0), ("t", 1.0)]
        df = spark.createDataFrame(rows, "variant string, y double")
        got = {r["variant"]: r for r in ab_test(df, "variant", "y", "c").collect()}
        assert got["t"]["var"] is None and got["t"]["z"] is None


class TestCuped:
    def test_theta_and_variance_reduction(self, spark):
        rng = np.random.RandomState(7)
        x = rng.randn(500)
        y = 2.0 * x + rng.randn(500) * 0.5 + 3.0
        rows = [(int(i), float(xi), float(yi)) for i, (xi, yi) in enumerate(zip(x, y))]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        out = cuped_adjust(df, "y", "x", keep_cols=["id"]).collect()
        adj = np.array([r["y_cuped"] for r in out])
        theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
        ref = y - theta * (x - x.mean())
        by_id = {r["id"]: r["y_cuped"] for r in out}
        for i in range(500):
            assert by_id[i] == pytest.approx(ref[i], abs=1e-5)
        # the point of CUPED: the adjusted metric has (much) less variance
        assert adj.var(ddof=1) < 0.3 * y.var(ddof=1)
        # means are preserved
        assert adj.mean() == pytest.approx(y.mean(), abs=1e-6)

    def test_null_rows_pass_through(self, spark):
        rows = [(1, 1.0, 2.0), (2, None, 5.0), (3, 2.0, None)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {r["id"]: r["y_cuped"] for r in
               cuped_adjust(df, "y", "x", keep_cols=["id"]).collect()}
        assert got[2] is None and got[3] is None

    def test_constant_covariate_noop(self, spark):
        rows = [(i, 5.0, float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        for r in cuped_adjust(df, "y", "x", keep_cols=["id"]).collect():
            assert r["y_cuped"] == pytest.approx(r["y"], abs=1e-9)


class TestDiD:
    def test_reference_arithmetic(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        cells = {
            (0, 0): rng.randn(40) + 10.0,
            (0, 1): rng.randn(45) + 10.5,
            (1, 0): rng.randn(50) + 9.8,
            (1, 1): rng.randn(55) + 12.0,
        }
        rows = [
            (int(t), int(p), float(v))
            for (t, p), vs in cells.items()
            for v in vs
        ]
        from temporalscope_spark.operators.experiment import did_estimate

        df = spark.createDataFrame(rows, "tr int, po int, y double")
        r = did_estimate(df, "y", "tr", "po").collect()[0]
        m = {k: v.mean() for k, v in cells.items()}
        did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
        se = math.sqrt(
            sum(v.var(ddof=1) / len(v) for v in cells.values())
        )
        assert r["did"] == pytest.approx(did, abs=1e-6)
        assert r["se"] == pytest.approx(se, abs=1e-6)
        assert r["z"] == pytest.approx(did / se, abs=1e-5)
        assert r["n"] == 190
        assert r["m_treat_post"] == pytest.approx(m[(1, 1)], abs=1e-6)

    def test_parallel_trends_zero(self, spark):
        from temporalscope_spark.operators.experiment import did_estimate

        rows = []
        for t in (0, 1):
            for p in (0, 1):
                base = 5.0 + 2.0 * t + 3.0 * p  # additive: DiD = 0
                rows += [(t, p, base), (t, p, base + 1.0), (t, p, base - 1.0)]
        df = spark.createDataFrame(rows, "tr int, po int, y double")
        r = did_estimate(df, "y", "tr", "po").collect()[0]
        assert r["did"] == pytest.approx(0.0, abs=1e-9)

    def test_empty_cell_raises(self, spark):
        from temporalscope_spark.operators.experiment import did_estimate

        rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)]  # no (1,1)
        df = spark.createDataFrame(rows, "tr int, po int, y double")
        with pytest.raises(Exception, match="four treat x post cells"):
            did_estimate(df, "y", "tr", "po").collect()

    def test_non_binary_raises(self, spark):
        from temporalscope_spark.operators.experiment import did_estimate

        rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (2, 1, 4.0)]
        df = spark.createDataFrame(rows, "tr int, po int, y double")
        with pytest.raises(Exception, match="must be 0/1"):
            did_estimate(df, "y", "tr", "po").collect()
