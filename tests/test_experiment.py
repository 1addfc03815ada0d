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


class TestFdrBh:
    """Benjamini–Hochberg step-up: pure-Python reference parity."""

    @staticmethod
    def _ref(pvals):
        m = len(pvals)
        order = sorted(range(m), key=lambda i: (pvals[i], str(i)))
        adj = [0.0] * m
        running = 1.0
        for rank in range(m, 0, -1):
            i = order[rank - 1]
            running = min(running, pvals[i] * m / rank)
            adj[i] = running
        return adj

    def _df(self, spark, pvals):
        return spark.createDataFrame(
            [(f"t{i:02d}", float(p)) for i, p in enumerate(pvals)],
            "test string, p double",
        )

    def test_reference_parity(self, spark):
        from temporalscope_spark.operators.experiment import fdr_bh

        pvals = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
        exp = self._ref(pvals)
        got = {r["test"]: r for r in fdr_bh(self._df(spark, pvals), "p", "test").collect()}
        for i, p in enumerate(pvals):
            assert got[f"t{i:02d}"]["p_adj"] == pytest.approx(exp[i], abs=1e-6)
        # reject set == step-up envelope <= alpha (here: the first two)
        rejected = {t for t, r in got.items() if r["reject"]}
        assert rejected == {
            f"t{i:02d}" for i in range(len(pvals)) if exp[i] <= 0.05
        }
        assert rejected == {"t00", "t01"}

    def test_monotone_in_rank(self, spark):
        from temporalscope_spark.operators.experiment import fdr_bh

        pvals = [0.5, 0.01, 0.04, 0.03, 0.9, 0.2]
        rows = fdr_bh(self._df(spark, pvals), "p", "test").collect()
        adj = [r["p_adj"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert adj == sorted(adj)
        assert all(0.0 <= a <= 1.0 for a in adj)

    def test_ties_and_clamp(self, spark):
        from temporalscope_spark.operators.experiment import fdr_bh

        pvals = [0.8, 0.8, 0.8]
        rows = fdr_bh(self._df(spark, pvals), "p", "test").collect()
        assert all(r["p_adj"] == pytest.approx(0.8, abs=1e-6) for r in rows)
        assert not any(r["reject"] for r in rows)

    def test_contracts(self, spark):
        from temporalscope_spark.operators.experiment import fdr_bh

        df = self._df(spark, [0.1])
        with pytest.raises(DataFrameValidationError):
            fdr_bh(df, "nope", "test")
        with pytest.raises(DataFrameValidationError):
            fdr_bh(df, "p", "test", alpha=1.5)
        bad = spark.createDataFrame([("a", 1.7)], "test string, p double")
        with pytest.raises(Exception):
            fdr_bh(bad, "p", "test").collect()


class TestChi2Independence:
    @staticmethod
    def _ref(rows):
        from collections import Counter

        cells = Counter(rows)
        n = sum(cells.values())
        na = Counter()
        nb = Counter()
        for (a, b), c in cells.items():
            na[a] += c
            nb[b] += c
        chi2 = sum(
            (c - na[a] * nb[b] / n) ** 2 / (na[a] * nb[b] / n)
            for (a, b), c in cells.items()
        )
        mi = sum(
            (c / n) * math.log((c / n) / ((na[a] / n) * (nb[b] / n)))
            for (a, b), c in cells.items()
        )
        dof = (len(na) - 1) * (len(nb) - 1)
        vmin = min(len(na) - 1, len(nb) - 1)
        v = math.sqrt(chi2 / (n * vmin)) if vmin > 0 else None
        return n, len(na), len(nb), dof, chi2, v, mi

    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(a, b) for a, b in rows], "a string, b string"
        )

    def test_reference_parity(self, spark):
        from temporalscope_spark.operators.experiment import chi2_independence

        rows = (
            [("x", "u")] * 20 + [("x", "v")] * 5 + [("y", "u")] * 7
            + [("y", "v")] * 18 + [("z", "u")] * 9 + [("z", "v")] * 9
        )
        n, ka, kb, dof, chi2, v, mi = self._ref(rows)
        got = chi2_independence(self._df(spark, rows), "a", "b").collect()[0]
        assert got["n"] == n and got["n_a"] == ka and got["n_b"] == kb
        assert got["dof"] == dof
        assert got["chi2"] == pytest.approx(chi2, abs=1e-5)
        assert got["cramers_v"] == pytest.approx(v, abs=1e-6)
        assert got["mi"] == pytest.approx(mi, abs=1e-6)

    def test_independent_table_near_zero(self, spark):
        from temporalscope_spark.operators.experiment import chi2_independence

        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
        got = chi2_independence(self._df(spark, rows), "a", "b").collect()[0]
        assert got["chi2"] == pytest.approx(0.0, abs=1e-6)
        assert got["mi"] == pytest.approx(0.0, abs=1e-6)

    def test_null_is_a_level(self, spark):
        from temporalscope_spark.operators.experiment import chi2_independence

        df = spark.createDataFrame(
            [("x", "u"), ("x", None), (None, "u"), ("y", "v")],
            "a string, b string",
        )
        got = chi2_independence(df, "a", "b").collect()[0]
        assert got["n"] == 4 and got["n_a"] == 3 and got["n_b"] == 3

    def test_degenerate_single_level(self, spark):
        from temporalscope_spark.operators.experiment import chi2_independence

        rows = [("x", "u")] * 10
        got = chi2_independence(self._df(spark, rows), "a", "b").collect()[0]
        assert got["dof"] is None and got["cramers_v"] is None
        assert got["chi2"] == pytest.approx(0.0, abs=1e-6)

    def test_contracts(self, spark):
        from temporalscope_spark.operators.experiment import chi2_independence

        df = self._df(spark, [("x", "u")])
        with pytest.raises(DataFrameValidationError):
            chi2_independence(df, "nope", "b")


class TestPoissonBootstrap:
    def _df(self, spark, n=400, spread=1.0):
        rows = [(str(i), 10.0 + spread * math.sin(i * 0.7)) for i in range(n)]
        return spark.createDataFrame(rows, "id string, y double")

    def test_shape_and_point_estimate(self, spark):
        from temporalscope_spark.operators.experiment import poisson_bootstrap

        df = self._df(spark)
        got = poisson_bootstrap(df, "y", "id", n_boot=50).collect()[0]
        exp_mean = sum(10.0 + math.sin(i * 0.7) for i in range(400)) / 400
        assert got["n"] == 400 and got["n_boot"] == 50
        assert got["mean"] == pytest.approx(exp_mean, abs=1e-5)
        assert got["lo"] <= got["boot_mean"] <= got["hi"]
        # CI brackets the true mean and is tight for this spread
        assert got["lo"] <= exp_mean <= got["hi"]
        assert (got["hi"] - got["lo"]) < 1.0

    def test_deterministic_and_partition_invariant(self, spark):
        from temporalscope_spark.operators.experiment import poisson_bootstrap

        df = self._df(spark, n=200)
        a = poisson_bootstrap(df.coalesce(1), "y", "id", n_boot=30).collect()[0]
        b = poisson_bootstrap(df.repartition(13), "y", "id", n_boot=30).collect()[0]
        assert tuple(a) == tuple(b)

    def test_seed_sensitivity(self, spark):
        from temporalscope_spark.operators.experiment import poisson_bootstrap

        df = self._df(spark, n=200)
        a = poisson_bootstrap(df, "y", "id", n_boot=30, seed=1).collect()[0]
        b = poisson_bootstrap(df, "y", "id", n_boot=30, seed=2).collect()[0]
        assert a["boot_mean"] != b["boot_mean"] or a["se"] != b["se"]
        # but the point estimate never depends on the seed
        assert a["mean"] == b["mean"]

    def test_weights_are_poisson1(self, spark):
        # mean weight ~= 1 -> replicate means concentrate near the sample
        # mean; se scales like sigma/sqrt(n)
        from temporalscope_spark.operators.experiment import poisson_bootstrap

        df = self._df(spark, n=900, spread=3.0)
        got = poisson_bootstrap(df, "y", "id", n_boot=60).collect()[0]
        sigma = math.sqrt(sum((3.0 * math.sin(i * 0.7)) ** 2 for i in range(900)) / 900)
        expected_se = sigma / math.sqrt(900)
        assert got["se"] == pytest.approx(expected_se, rel=0.5)

    def test_contracts(self, spark):
        from temporalscope_spark.operators.experiment import poisson_bootstrap

        df = self._df(spark, n=5)
        with pytest.raises(DataFrameValidationError):
            poisson_bootstrap(df, "nope", "id")
        with pytest.raises(DataFrameValidationError):
            poisson_bootstrap(df, "y", "id", n_boot=1)
        with pytest.raises(DataFrameValidationError):
            poisson_bootstrap(df, "y", "id", alpha=0.0)


def _mwu_ref(a, b):
    """Pure-python MWU (scipy asymptotic, continuity-corrected, tie-aware)."""
    import collections

    cnt = collections.Counter(list(a) + list(b))
    cum, avg = 0, {}
    for v in sorted(cnt):
        n = cnt[v]
        avg[v] = cum + (n + 1) / 2
        cum += n
    na, nb = len(a), len(b)
    ra = sum(avg[v] for v in a)
    ua = ra - na * (na + 1) / 2
    nn = na + nb
    ties = sum(t**3 - t for t in cnt.values())
    mu = na * nb / 2
    sigma = math.sqrt(na * nb / 12 * (nn + 1 - ties / (nn * (nn - 1))))
    dev = ua - mu
    cc = 0.5 if dev > 0 else (-0.5 if dev < 0 else 0.0)
    return ua, na * nb - ua, (dev - cc) / sigma if sigma > 0 else None


class TestMannWhitney:
    def test_tie_heavy_parity(self, spark):
        from temporalscope_spark.operators.experiment import mann_whitney_u

        rng = np.random.RandomState(7)
        a = [float(v) for v in rng.randint(0, 6, 90)]   # heavy ties
        b = [float(v) for v in rng.randint(1, 7, 70)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, y double")
        got = mann_whitney_u(df, "y", "g", "a", "b").collect()[0]
        ua, ub, z = _mwu_ref(a, b)
        assert got["n_a"] == 90 and got["n_b"] == 70
        assert got["u_a"] == pytest.approx(ua)
        assert got["u_b"] == pytest.approx(ub)
        assert got["z"] == pytest.approx(z, abs=1e-6)

    def test_continuous_and_nulls(self, spark):
        from temporalscope_spark.operators.experiment import mann_whitney_u

        rng = np.random.RandomState(3)
        a = list(rng.randn(50) + 0.8)
        b = list(rng.randn(60))
        rows = (
            [("a", float(v)) for v in a]
            + [("b", float(v)) for v in b]
            + [("a", None), ("c", 99.0)]  # NULL metric + foreign group excluded
        )
        df = spark.createDataFrame(rows, "g string, y double")
        got = mann_whitney_u(df, "y", "g", "a", "b").collect()[0]
        ua, ub, z = _mwu_ref(a, b)
        assert got["u_a"] == pytest.approx(ua)
        assert got["z"] == pytest.approx(z, abs=1e-6)
        assert got["z"] > 0  # a shifted up => stochastic dominance

    def test_all_tied_null_z(self, spark):
        from temporalscope_spark.operators.experiment import mann_whitney_u

        df = spark.createDataFrame(
            [("a", 5.0)] * 4 + [("b", 5.0)] * 3, "g string, y double"
        )
        got = mann_whitney_u(df, "y", "g", "a", "b").collect()[0]
        assert got["z"] is None
        assert got["u_a"] == pytest.approx(4 * 3 / 2)

    def test_missing_group_raises(self, spark):
        from temporalscope_spark.operators.experiment import mann_whitney_u

        df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, y double")
        with pytest.raises(Exception, match="has no"):
            mann_whitney_u(df, "y", "g", "a", "b").collect()

    def test_missing_column_raises(self, spark):
        from temporalscope_spark.operators.experiment import mann_whitney_u

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(DataFrameValidationError):
            mann_whitney_u(df, "nope", "g", "a", "b")


class TestPermutationTest:
    @staticmethod
    def _replay(rows, n_perm, seed=42):
        import hashlib

        a = [y for _, g, y in rows if g == "a"]
        b = [y for _, g, y in rows if g == "b"]
        na, nb = len(a), len(b)
        d_obs = round(sum(a) / na - sum(b) / nb, 6)
        p_a = na / (na + nb)
        ne = npm = 0
        for bi in range(n_perm):
            sa = ca = sb = cb = 0
            for i, g, y in rows:
                u = (
                    int(hashlib.md5(f"{i}#{seed}#{bi}".encode()).hexdigest()[:15], 16)
                    % 10**9
                ) / 1e9
                if u < p_a:
                    sa, ca = sa + y, ca + 1
                else:
                    sb, cb = sb + y, cb + 1
            if ca and cb:
                npm += 1
                if abs(round(sa / ca - sb / cb, 6)) >= abs(d_obs):
                    ne += 1
        return d_obs, npm, ne, round((ne + 1) / (npm + 1), 6)

    def test_md5_replay_parity(self, spark):
        from temporalscope_spark.operators.experiment import permutation_test

        rows = [
            (i, "a" if i % 3 else "b", float((i * 7) % 13) + (1.0 if i % 3 else 0.0))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "event_id long, g string, y double")
        got = permutation_test(df, "y", "g", "a", "b", n_perm=40).collect()[0]
        d_obs, npm, ne, p = self._replay(rows, 40)
        assert got["diff"] == pytest.approx(d_obs)
        assert got["n_perm"] == npm and got["n_extreme"] == ne
        assert got["p_value"] == pytest.approx(p)

    def test_null_effect_large_p(self, spark):
        from temporalscope_spark.operators.experiment import permutation_test

        rng = np.random.RandomState(5)
        rows = [(i, "a" if i % 2 else "b", float(v)) for i, v in enumerate(rng.randn(400))]
        df = spark.createDataFrame(rows, "event_id long, g string, y double")
        got = permutation_test(df, "y", "g", "a", "b", n_perm=60).collect()[0]
        assert got["p_value"] > 0.05  # no planted effect

    def test_real_effect_small_p(self, spark):
        from temporalscope_spark.operators.experiment import permutation_test

        rng = np.random.RandomState(6)
        rows = [
            (i, "a" if i % 2 else "b", float(v) + (2.0 if i % 2 else 0.0))
            for i, v in enumerate(rng.randn(400))
        ]
        df = spark.createDataFrame(rows, "event_id long, g string, y double")
        got = permutation_test(df, "y", "g", "a", "b", n_perm=60).collect()[0]
        assert got["p_value"] == pytest.approx(1 / 61, abs=1e-6)  # never exceeded

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import permutation_test

        df = spark.createDataFrame([(1, "a", 1.0)], "event_id long, g string, y double")
        with pytest.raises(DataFrameValidationError):
            permutation_test(df, "y", "g", "a", "b", n_perm=0)
        with pytest.raises(DataFrameValidationError):
            permutation_test(df, "y", "g", "a", "b")  # group b absent


class TestCovariateBalance:
    def test_smd_parity(self, spark):
        from temporalscope_spark.operators.experiment import covariate_balance

        rng = np.random.RandomState(2)
        rows = [
            ("a" if i % 2 else "b", float(v), float(v * 3 + rng.randn()))
            for i, v in enumerate(rng.randn(300))
        ]
        df = spark.createDataFrame(rows, "g string, x1 double, x2 double")
        got = {r["covariate"]: r for r in covariate_balance(df, "g", "a", "b", ["x1", "x2"]).collect()}
        a1 = np.array([x for g, x, _ in rows if g == "a"])
        b1 = np.array([x for g, x, _ in rows if g == "b"])
        smd = (a1.mean() - b1.mean()) / math.sqrt((a1.var(ddof=1) + b1.var(ddof=1)) / 2)
        assert got["x1"]["smd"] == pytest.approx(smd, abs=1e-6)
        assert got["x1"]["var_ratio"] == pytest.approx(a1.var(ddof=1) / b1.var(ddof=1), abs=1e-6)
        assert got["x1"]["n_a"] == len(a1) and got["x1"]["n_b"] == len(b1)
        assert set(got) == {"x1", "x2"}

    def test_pairwise_nulls_and_balance(self, spark):
        from temporalscope_spark.operators.experiment import covariate_balance

        rows = [("a", 1.0), ("a", None), ("a", 3.0), ("b", 1.0), ("b", 3.0), ("c", 9.0)]
        df = spark.createDataFrame(rows, "g string, x double")
        got = covariate_balance(df, "g", "a", "b", ["x"]).collect()[0]
        assert got["n_a"] == 2 and got["n_b"] == 2   # NULL excluded, 'c' ignored
        assert got["smd"] == pytest.approx(0.0)
        assert got["var_ratio"] == pytest.approx(1.0)

    def test_zero_variance_nulls(self, spark):
        from temporalscope_spark.operators.experiment import covariate_balance

        df = spark.createDataFrame(
            [("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)], "g string, x double"
        )
        got = covariate_balance(df, "g", "a", "b", ["x"]).collect()[0]
        assert got["smd"] is None and got["var_ratio"] is None

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import covariate_balance

        df = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(DataFrameValidationError):
            covariate_balance(df, "g", "a", "b", [])
        with pytest.raises(DataFrameValidationError):
            covariate_balance(df, "g", "a", "b", ["nope"])


class TestSrmCheck:
    def test_chi2_parity(self, spark):
        from temporalscope_spark.operators.experiment import srm_check

        rows = [("a",)] * 520 + [("b",)] * 480
        df = spark.createDataFrame(rows, "v string")
        got = srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()[0]
        chi2 = (520 - 500) ** 2 / 500 + (480 - 500) ** 2 / 500
        assert got["chi2"] == pytest.approx(chi2, abs=1e-6)
        assert got["n"] == 1000 and got["k"] == 2 and got["dof"] == 1
        assert got["max_abs_dev"] == pytest.approx(0.02)

    def test_missing_arm_counts_deficit(self, spark):
        from temporalscope_spark.operators.experiment import srm_check

        df = spark.createDataFrame([("a",)] * 10, "v string")
        got = srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()[0]
        # arm b expected 5, observed 0: chi2 = 25/5 + 25/5
        assert got["chi2"] == pytest.approx(10.0)
        assert got["k"] == 2

    def test_unknown_arm_raises(self, spark):
        from temporalscope_spark.operators.experiment import srm_check

        df = spark.createDataFrame([("a",), ("zz",)], "v string")
        with pytest.raises(Exception, match="not in expected"):
            srm_check(df, "v", {"a": 1.0}).collect()

    def test_bad_shares(self, spark):
        from temporalscope_spark.operators.experiment import srm_check

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(DataFrameValidationError):
            srm_check(df, "v", {"a": 0.7})
        with pytest.raises(DataFrameValidationError):
            srm_check(df, "v", {})


class TestIpwEstimate:
    def _data(self, with_models=True, seed=1, n=1500):
        rng = np.random.RandomState(seed)
        x = rng.rand(n)
        p = 0.2 + 0.6 * x
        t = (rng.rand(n) < p).astype(float)
        y = 2 * x + 3 * t + rng.randn(n) * 0.3
        m1, m0 = 2 * x + 3, 2 * x
        return x, p, t, y, m1, m0

    def test_hajek_and_aipw_parity(self, spark):
        from temporalscope_spark.operators.experiment import ipw_estimate

        x, p, t, y, m1, m0 = self._data()
        rows = [tuple(map(float, r)) for r in zip(y, t, p, m1, m0)]
        df = spark.createDataFrame(rows, "y double, t double, p double, m1 double, m0 double")
        got = ipw_estimate(df, "y", "t", "p", "m1", "m0").collect()[0]
        wt, wc = t / p, (1 - t) / (1 - p)
        mu1 = (wt * y).sum() / wt.sum()
        mu0 = (wc * y).sum() / wc.sum()
        infl = (m1 - m0) + t * (y - m1) / p - (1 - t) * (y - m0) / (1 - p)
        assert got["ate"] == pytest.approx(mu1 - mu0, abs=1e-6)
        assert got["ate_dr"] == pytest.approx(infl.mean(), abs=1e-6)
        assert got["ess_treat"] == pytest.approx(wt.sum() ** 2 / (wt**2).sum(), abs=1e-4)
        # both estimators recover the planted effect of 3
        assert abs(got["ate"] - 3.0) < 0.25 and abs(got["ate_dr"] - 3.0) < 0.15

    def test_trimming_drops_extremes(self, spark):
        from temporalscope_spark.operators.experiment import ipw_estimate

        rows = [(1.0, 1.0, 0.001), (2.0, 0.0, 0.5), (3.0, 1.0, 0.5), (4.0, 0.0, 0.999)]
        df = spark.createDataFrame(rows, "y double, t double, p double")
        got = ipw_estimate(df, "y", "t", "p", trim=0.01).collect()[0]
        assert got["n_trimmed"] == 2
        assert got["n_treat"] == 1 and got["n_control"] == 1
        assert got["ate"] == pytest.approx(3.0 - 2.0)
        assert got["ate_dr"] is None

    def test_non_binary_treatment_raises(self, spark):
        from temporalscope_spark.operators.experiment import ipw_estimate

        df = spark.createDataFrame([(1.0, 2.0, 0.5)], "y double, t double, p double")
        with pytest.raises(Exception, match="must be 0/1"):
            ipw_estimate(df, "y", "t", "p").collect()

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import ipw_estimate

        df = spark.createDataFrame([(1.0, 1.0, 0.5)], "y double, t double, p double")
        with pytest.raises(DataFrameValidationError):
            ipw_estimate(df, "y", "t", "p", trim=0.6)
        with pytest.raises(DataFrameValidationError):
            ipw_estimate(df, "y", "t", "p", m1_col="m1")  # m0 missing
        with pytest.raises(DataFrameValidationError):
            ipw_estimate(df, "nope", "t", "p")


class TestMsprt:
    def _ref(self, a, b, tau2=1.0):
        import numpy as np

        a, b = np.array(a), np.array(b)
        na, nb = len(a), len(b)
        diff = a.mean() - b.mean()
        ss = ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
        vn = ss / (na + nb - 2) * (1 / na + 1 / nb)
        lam = min(
            math.sqrt(vn / (vn + tau2))
            * math.exp(min(diff * diff * tau2 / (2 * vn * (vn + tau2)), 700.0)),
            1e12,
        )
        return diff, vn, lam, min(1.0, 1 / lam)

    def test_formula_parity(self, spark):
        from temporalscope_spark.operators.experiment import msprt_test

        rng = np.random.RandomState(11)
        a = [float(v) for v in rng.randn(300) + 0.2]
        b = [float(v) for v in rng.randn(280)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, y double")
        got = msprt_test(df, "y", "g", "a", "b", tau2=0.5).collect()[0]
        diff, vn, lam, p = self._ref(a, b, 0.5)
        assert got["diff"] == pytest.approx(diff, abs=1e-6)
        assert got["v_n"] == pytest.approx(vn, abs=1e-6)
        assert got["lambda_n"] == pytest.approx(lam, rel=1e-5)
        assert got["p_value"] == pytest.approx(p, abs=1e-6)

    def test_null_effect_p_near_one(self, spark):
        from temporalscope_spark.operators.experiment import msprt_test

        rng = np.random.RandomState(12)
        rows = [("a" if i % 2 else "b", float(v)) for i, v in enumerate(rng.randn(600))]
        df = spark.createDataFrame(rows, "g string, y double")
        got = msprt_test(df, "y", "g", "a", "b").collect()[0]
        assert got["p_value"] > 0.5

    def test_huge_effect_caps(self, spark):
        from temporalscope_spark.operators.experiment import msprt_test

        rows = [("a", 100.0 + i * 0.001) for i in range(50)] + [
            ("b", float(i) * 0.001) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, y double")
        got = msprt_test(df, "y", "g", "a", "b").collect()[0]
        assert got["lambda_n"] == 1e12 and got["p_value"] == 0.0

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import msprt_test

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(DataFrameValidationError):
            msprt_test(df, "y", "g", "a", "b", tau2=0.0)
        with pytest.raises(Exception, match="has no"):
            msprt_test(df, "y", "g", "a", "b").collect()


class TestStratifiedAtt:
    def test_parity_and_recovery(self, spark):
        rng = np.random.RandomState(1)
        n = 3000
        x = rng.rand(n)
        pp = 0.2 + 0.6 * x
        t = (rng.rand(n) < pp).astype(float)
        y = 2 * x + 3 * t + rng.randn(n) * 0.3
        from temporalscope_spark.operators.experiment import stratified_att

        df = spark.createDataFrame(
            [(float(y[i]), float(t[i]), float(pp[i])) for i in range(n)],
            "y double, t double, p double",
        )
        got = stratified_att(df, "y", "t", "p", n_strata=5).collect()[0]
        edges = [round(float(np.percentile(pp, 100 * k / 5)), 6) for k in range(1, 5)]
        k = np.zeros(n, dtype=int)
        for e in edges:
            k += (pp > e).astype(int)
        att_n = att_d = ate_n = ate_d = 0.0
        for s in range(5):
            m = k == s
            nt, nc = t[m].sum(), (1 - t[m]).sum()
            if nt > 0 and nc > 0:
                gap = y[m][t[m] == 1].mean() - y[m][t[m] == 0].mean()
                att_n += nt * gap
                att_d += nt
                ate_n += (nt + nc) * gap
                ate_d += nt + nc
        assert got["att"] == pytest.approx(att_n / att_d, abs=1e-6)
        assert got["ate"] == pytest.approx(ate_n / ate_d, abs=1e-6)
        assert abs(got["att"] - 3.0) < 0.15   # planted effect, confounding removed
        assert got["n_strata_used"] == 5 and got["n_treat_dropped"] == 0

    def test_naive_mean_is_confounded_but_att_is_not(self, spark):
        rng = np.random.RandomState(4)
        n = 4000
        x = rng.rand(n)
        pp = 0.1 + 0.8 * x
        t = (rng.rand(n) < pp).astype(float)
        y = 10 * x + 1.0 * t + rng.randn(n) * 0.2   # strong confounder
        from temporalscope_spark.operators.experiment import stratified_att

        df = spark.createDataFrame(
            [(float(y[i]), float(t[i]), float(pp[i])) for i in range(n)],
            "y double, t double, p double",
        )
        naive = y[t == 1].mean() - y[t == 0].mean()
        got = stratified_att(df, "y", "t", "p", n_strata=10).collect()[0]
        assert abs(naive - 1.0) > 1.0          # naive diff badly biased
        assert abs(got["att"] - 1.0) < 0.25    # stratification fixes it

    def test_one_sided_strata_dropped(self, spark):
        from temporalscope_spark.operators.experiment import stratified_att

        # p clustered so the lowest stratum is all-control
        rows = [(1.0, 0.0, 0.01)] * 50 + [(2.0, 1.0, 0.9)] * 25 + \
               [(1.5, 0.0, 0.9)] * 25
        df = spark.createDataFrame(rows, "y double, t double, p double")
        got = stratified_att(df, "y", "t", "p", n_strata=2).collect()[0]
        assert got["n_strata_used"] == 1
        assert got["att"] == pytest.approx(2.0 - 1.5)

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import stratified_att

        df = spark.createDataFrame([(1.0, 1.0, 0.5)], "y double, t double, p double")
        with pytest.raises(DataFrameValidationError):
            stratified_att(df, "y", "t", "p", n_strata=1)
        with pytest.raises(DataFrameValidationError):
            stratified_att(df, "nope", "t", "p")


class TestKruskalWallis:
    def test_parity_and_tie_correction(self, spark):
        import collections

        from temporalscope_spark.operators.experiment import kruskal_wallis

        rng = np.random.RandomState(7)
        groups = {"a": [float(v) for v in rng.randint(0, 8, 70)],
                  "b": [float(v) for v in rng.randint(1, 9, 60)],
                  "c": [float(v) for v in rng.randint(0, 8, 80)]}
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, y double")
        got = kruskal_wallis(df, "y", "g").collect()[0]
        allv = [(v, g) for g, vs in groups.items() for v in vs]
        cnt = collections.Counter(v for v, _ in allv)
        cum, avg = 0, {}
        for v in sorted(cnt):
            n = cnt[v]
            avg[v] = cum + (n + 1) / 2
            cum += n
        N = len(allv)
        H = 12 / (N * (N + 1)) * sum(
            sum(avg[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
        ) - 3 * (N + 1)
        H /= 1 - sum(t**3 - t for t in cnt.values()) / (N**3 - N)
        assert got["h_stat"] == pytest.approx(H, abs=1e-6)
        assert got["k"] == 3 and got["dof"] == 2

    def test_identical_groups_small_h(self, spark):
        from temporalscope_spark.operators.experiment import kruskal_wallis

        rows = [(g, float(i % 11)) for g in "abc" for i in range(60)]
        df = spark.createDataFrame(rows, "g string, y double")
        got = kruskal_wallis(df, "y", "g").collect()[0]
        assert got["h_stat"] == pytest.approx(0.0, abs=1e-6)

    def test_single_group_raises(self, spark):
        from temporalscope_spark.operators.experiment import kruskal_wallis

        df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, y double")
        with pytest.raises(Exception, match="2 groups"):
            kruskal_wallis(df, "y", "g").collect()


class TestLeveneTest:
    def test_brown_forsythe_parity(self, spark):
        from temporalscope_spark.operators.experiment import levene_test

        rng = np.random.RandomState(1)
        groups = {"a": rng.randn(80) + 0.5, "b": rng.randn(90),
                  "c": rng.randn(70) * 2}
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, y double")
        got = levene_test(df, "y", "g").collect()[0]
        zs = {g: np.abs(vs - round(float(np.median(vs)), 6))
              for g, vs in groups.items()}
        N = sum(len(z) for z in zs.values())
        zbar = np.mean(np.concatenate(list(zs.values())))
        ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs.values())
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zs.values())
        ref = (ssb / 2) / (ssw / (N - 3))
        assert got["f_stat"] == pytest.approx(ref, abs=1e-5)
        assert got["f_stat"] > 10   # planted variance difference detected

    def test_equal_spread_small_f(self, spark):
        from temporalscope_spark.operators.experiment import levene_test

        rng = np.random.RandomState(9)
        rows = [("a" if i % 2 else "b", float(v + (5.0 if i % 2 else 0.0)))
                for i, v in enumerate(rng.randn(400))]
        df = spark.createDataFrame(rows, "g string, y double")
        got = levene_test(df, "y", "g").collect()[0]
        assert got["f_stat"] < 4   # mean shift but equal spread

    def test_mean_center_lane(self, spark):
        from temporalscope_spark.operators.experiment import levene_test

        rng = np.random.RandomState(3)
        rows = [("a" if i % 2 else "b", float(v)) for i, v in enumerate(rng.randn(200))]
        df = spark.createDataFrame(rows, "g string, y double")
        got = levene_test(df, "y", "g", center="mean").collect()[0]
        assert got["f_stat"] is not None

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import levene_test

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(DataFrameValidationError):
            levene_test(df, "y", "g", center="mode")
        with pytest.raises(DataFrameValidationError):
            levene_test(df, "nope", "g")


class TestYuenTest:
    def test_parity_with_outliers(self, spark):
        import math

        from temporalscope_spark.operators.experiment import yuen_test

        rng = np.random.RandomState(2)
        a = np.concatenate([rng.randn(90) + 0.5, [50.0, -40.0]])
        b = rng.randn(85)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, y double")
        got = yuen_test(df, "y", "g", "a", "b", trim=0.2).collect()[0]

        def ref(x, trim=0.2):
            n = len(x)
            lo = round(float(np.percentile(x, trim * 100)), 6)
            hi = round(float(np.percentile(x, (1 - trim) * 100)), 6)
            gc = int(math.floor(trim * n))
            w = np.clip(x, lo, hi)
            h = n - 2 * gc
            tmean = (w.sum() - gc * (lo + hi)) / h
            wvar = ((w - w.mean()) ** 2).sum() / (n - 1)
            return n, h, tmean, wvar * (n - 1) / (h * (h - 1))

        na, ha, ta, da = ref(a)
        nb, hb, tb, db = ref(b)
        assert got["tmean_a"] == pytest.approx(ta, abs=1e-6)
        assert got["t_stat"] == pytest.approx((ta - tb) / math.sqrt(da + db), abs=1e-5)
        assert got["dof"] == pytest.approx(
            (da + db) ** 2 / (da**2 / (ha - 1) + db**2 / (hb - 1)), abs=1e-3
        )
        # robustness: the outliers shift the RAW mean far more than the trimmed
        assert abs((a.mean() - b.mean()) - got["diff"]) > 0.05

    def test_zero_trim_is_welch_like(self, spark):
        from temporalscope_spark.operators.experiment import yuen_test

        rng = np.random.RandomState(5)
        a, b = rng.randn(60) + 1.0, rng.randn(70)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, y double")
        got = yuen_test(df, "y", "g", "a", "b", trim=0.0).collect()[0]
        import math

        welch = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert got["t_stat"] == pytest.approx(welch, abs=1e-4)

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import yuen_test

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(DataFrameValidationError):
            yuen_test(df, "y", "g", "a", "b", trim=0.5)
        with pytest.raises(DataFrameValidationError):
            yuen_test(df, "y", "g", "a", "b")  # b missing


class TestEbShrink:
    def test_shrinkage_properties(self, spark):
        from temporalscope_spark.operators.experiment import eb_shrink_means

        rng = np.random.RandomState(6)
        rows, sizes = [], {}
        for gi in range(25):
            n_g = rng.randint(2, 40)
            sizes[f"g{gi}"] = n_g
            mu_g = rng.randn() * 2
            rows += [(f"g{gi}", float(v + mu_g)) for v in rng.randn(n_g)]
        df = spark.createDataFrame(rows, "g string, y double")
        out = {r["group"]: r for r in eb_shrink_means(df, "y", "g").collect()}
        grand = np.average([r["mean"] for r in out.values()],
                           weights=[r["n"] for r in out.values()])
        for r in out.values():
            # shrunk value lies between the group mean and the grand mean
            lo, hi = sorted([r["mean"], grand])
            assert lo - 1e-4 <= r["shrunk"] <= hi + 1e-4
            assert 0.0 <= r["weight"] <= 1.0
        smallest = min(sizes, key=sizes.get)
        biggest = max(sizes, key=sizes.get)
        assert out[smallest]["weight"] < out[biggest]["weight"]  # small shrinks harder

    def test_zero_between_variance_full_shrink(self, spark):
        from temporalscope_spark.operators.experiment import eb_shrink_means

        rng = np.random.RandomState(7)
        rows = [(f"g{i % 10}", float(v)) for i, v in enumerate(rng.randn(500))]
        df = spark.createDataFrame(rows, "g string, y double")
        out = eb_shrink_means(df, "y", "g").collect()
        # same-population groups: tau2 ~ 0 -> heavy shrink toward grand mean
        spread_raw = np.std([r["mean"] for r in out])
        spread_shr = np.std([r["shrunk"] for r in out])
        assert spread_shr < 0.6 * spread_raw

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.experiment import eb_shrink_means

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(DataFrameValidationError):
            eb_shrink_means(df, "y", "g", min_n=1)
        with pytest.raises(DataFrameValidationError):
            eb_shrink_means(df, "nope", "g")


class TestDispersionTest:
    def test_overdispersed_flagged(self, spark):
        from temporalscope_spark.operators.experiment import dispersion_test

        rng = np.random.RandomState(1)
        y = rng.negative_binomial(2, 0.3, 1500).astype(float)
        df = spark.createDataFrame([(float(v),) for v in y], "y double")
        got = dispersion_test(df, "y").collect()[0]
        n, mean = len(y), y.mean()
        chi2 = ((y - mean) ** 2).sum() / mean
        assert got["dispersion_index"] == pytest.approx(y.var(ddof=1) / mean, abs=1e-5)
        assert got["pearson_chi2"] == pytest.approx(chi2, rel=1e-6)
        assert got["z"] == pytest.approx((chi2 - (n - 1)) / np.sqrt(2 * (n - 1)),
                                         abs=1e-4)
        assert got["z"] > 10  # clumping detected

    def test_poisson_near_one(self, spark):
        from temporalscope_spark.operators.experiment import dispersion_test

        rng = np.random.RandomState(2)
        y = rng.poisson(5.0, 3000).astype(float)
        df = spark.createDataFrame([(float(v),) for v in y], "y double")
        got = dispersion_test(df, "y").collect()[0]
        assert abs(got["dispersion_index"] - 1.0) < 0.1
        assert abs(got["z"]) < 3.5

    def test_zero_mean_nulls(self, spark):
        from temporalscope_spark.operators.experiment import dispersion_test

        df = spark.createDataFrame([(0.0,)] * 5, "y double")
        got = dispersion_test(df, "y").collect()[0]
        assert got["dispersion_index"] is None and got["z"] is None


class TestRatioMetricTest:
    def test_delta_method_parity(self, spark):
        from temporalscope_spark.operators.experiment import ratio_metric_test

        rng = np.random.RandomState(1)
        rows = []
        for v, eff in (("c", 0.10), ("t", 0.12)):
            for _ in range(600):
                views = rng.poisson(20) + 1
                clicks = rng.binomial(views, eff)
                rows.append((v, float(clicks), float(views)))
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        got = {r["variant"]: r
               for r in ratio_metric_test(df, "x", "y", "variant", "c").collect()}
        xs = np.array([r[1] for r in rows if r[0] == "t"])
        ys = np.array([r[2] for r in rows if r[0] == "t"])
        r_ = xs.mean() / ys.mean()
        v_ = (xs.var(ddof=1) - 2 * r_ * np.cov(xs, ys, ddof=1)[0, 1]
              + r_**2 * ys.var(ddof=1)) / (len(xs) * ys.mean() ** 2)
        assert got["t"]["ratio"] == pytest.approx(r_, abs=1e-6)
        assert got["t"]["se"] == pytest.approx(np.sqrt(v_), abs=1e-6)
        assert got["t"]["z"] > 3       # planted lift detected
        assert got["c"]["diff"] is None

    def test_unit_vs_row_se_differ(self, spark):
        # perfectly correlated numerator/denominator: delta SE collapses
        from temporalscope_spark.operators.experiment import ratio_metric_test

        rows = [("c", float(2 * k), float(10 * k)) for k in range(1, 50)]
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        got = ratio_metric_test(df, "x", "y", "variant", "c").collect()[0]
        assert got["ratio"] == pytest.approx(0.2)
        assert got["se"] == pytest.approx(0.0, abs=1e-9)  # ratio is constant

    def test_missing_control_raises(self, spark):
        from temporalscope_spark.operators.experiment import ratio_metric_test

        df = spark.createDataFrame([("t", 1.0, 2.0)], "variant string, x double, y double")
        with pytest.raises(Exception, match="not present"):
            ratio_metric_test(df, "x", "y", "variant", "c").collect()


def test_ipw_trim_zero_boundary_propensities_dropped(spark):
    """trim=0.0 must drop (and count) propensities of exactly 0 or 1
    instead of dividing the weights by zero (ADVICE r6 guard)."""
    from temporalscope_spark.operators.experiment import ipw_estimate

    rows = [
        (1.0, 1, 0.5), (0.0, 0, 0.5), (2.0, 1, 0.25), (1.0, 0, 0.75),
        (9.0, 1, 1.0), (9.0, 0, 0.0),  # boundary rows: must be trimmed
    ]
    df = spark.createDataFrame(rows, "y double, t int, p double")
    out = ipw_estimate(df, "y", "t", "p", trim=0.0).collect()[0]
    assert out["n_trimmed"] == 2
    assert math.isfinite(out["ate"])
