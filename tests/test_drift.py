"""Drift diagnostics: PSI across a time split, two-sample KS, and the
two-phase global cumulative sum they build on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.drift import ks_drift, psi_drift
from temporalscope_spark.plans.rownum import with_global_cumsum

EPS = 1e-6


def _events(spark, ref_vals, cur_vals):
    rows = [
        Row(ts="2024-01-01 00:00:00", value=float(v)) for v in ref_vals
    ] + [Row(ts="2024-02-01 00:00:00", value=float(v)) for v in cur_vals]
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )


SPLIT = "2024-01-15 00:00:00"


class TestGlobalCumsum:
    def test_matches_single_partition_scan(self, spark):
        df = spark.createDataFrame(
            [(float(v), v % 3, 1) for v in range(200)], "v double, a int, one int"
        ).repartition(7)
        out = {
            r["v"]: (r["a_cum"], r["one_cum"])
            for r in with_global_cumsum(df, ["v"], ["a", "one"], num_buckets=5).collect()
        }
        acc_a = acc_1 = 0
        for v in range(200):
            acc_a += v % 3
            acc_1 += 1
            assert out[float(v)] == (acc_a, acc_1)

    def test_partition_invariance(self, spark):
        rows = [(float(i * 7 % 101), i) for i in range(101)]
        df1 = spark.createDataFrame(rows, "v double, x int").repartition(2)
        df2 = spark.createDataFrame(rows, "v double, x int").repartition(13)
        a = sorted(
            (r["v"], r["x_cum"]) for r in with_global_cumsum(df1, ["v"], ["x"]).collect()
        )
        b = sorted(
            (r["v"], r["x_cum"]) for r in with_global_cumsum(df2, ["v"], ["x"]).collect()
        )
        assert a == b


class TestPsiDrift:
    def test_identical_slices_zero_psi(self, spark):
        vals = [float(v) for v in range(100)]
        out = psi_drift(_events(spark, vals, vals), "value", "ts", SPLIT, bins=4)
        rows = out.collect()
        assert len(rows) == 4
        assert all(abs(r["psi_total"]) < 1e-9 for r in rows)
        assert all(r["n_ref"] == r["n_cur"] == 25 for r in rows)

    def test_known_shift_matches_hand_psi(self, spark):
        # ref uniform over 4 quartiles; cur mass concentrated in top bin
        ref = [float(v) for v in range(1, 41)]  # 10 per bin at bins=4
        cur = [35.5] * 30 + [5.5] * 10
        out = psi_drift(_events(spark, ref, cur), "value", "ts", SPLIT, bins=4)
        rows = {r["bin"]: r for r in out.collect()}
        # hand PSI with the same edge convention (edges = ref quantiles)
        p = [0.25, 0.25, 0.25, 0.25]
        q = [0.25, 0.0, 0.0, 0.75]
        expect = sum(
            (pi - max(qi, EPS)) * math.log(pi / max(qi, EPS))
            for pi, qi in zip(p, q)
        )
        assert rows[1]["n_cur"] == 10 and rows[4]["n_cur"] == 30
        assert rows[2]["n_cur"] == 0 and rows[2]["cur_share"] == pytest.approx(EPS)
        assert rows[1]["psi_total"] == pytest.approx(expect, abs=2e-6)

    def test_empty_bins_report_and_open_ends(self, spark):
        ref = [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0]
        cur = [0.5, 3.0]  # outside the ref range: lands in open-ended bins
        out = psi_drift(_events(spark, ref, cur), "value", "ts", SPLIT, bins=2)
        rows = {r["bin"]: r for r in out.collect()}
        assert rows[1]["lo"] is None and rows[2]["hi"] is None
        assert rows[1]["n_cur"] == 1 and rows[2]["n_cur"] == 1

    def test_approx_lane_close_to_exact(self, spark):
        import random

        rng = random.Random(7)
        ref = [rng.gauss(0, 1) for _ in range(2000)]
        cur = [rng.gauss(0.3, 1) for _ in range(2000)]
        ev = _events(spark, ref, cur)
        exact = psi_drift(ev, "value", "ts", SPLIT, bins=10).collect()[0]["psi_total"]
        approx = psi_drift(ev, "value", "ts", SPLIT, bins=10, approx=True).collect()[0][
            "psi_total"
        ]
        assert approx == pytest.approx(exact, abs=0.02)

    def test_validation(self, spark):
        ev = _events(spark, [1.0], [2.0])
        with pytest.raises(DataFrameValidationError):
            psi_drift(ev, "value", "ts", SPLIT, bins=1)
        with pytest.raises(DataFrameValidationError):
            psi_drift(ev, "nope", "ts", SPLIT)
        with pytest.raises(DataFrameValidationError):
            # empty reference slice
            psi_drift(ev, "value", "ts", "2023-01-01 00:00:00")


class TestKsDrift:
    def test_matches_scipy_style_reference(self, spark):
        import random

        rng = random.Random(11)
        ref = [rng.gauss(0, 1) for _ in range(300)]
        cur = [rng.gauss(0.5, 1.3) for _ in range(250)]
        out = ks_drift(_events(spark, ref, cur), "value", "ts", SPLIT).collect()[0]
        # brute-force two-sample KS over pooled points
        pooled = sorted(set(ref + cur))
        d = max(
            abs(
                sum(1 for x in ref if x <= v) / len(ref)
                - sum(1 for x in cur if x <= v) / len(cur)
            )
            for v in pooled
        )
        assert out["ks_stat"] == pytest.approx(d, abs=1e-6)
        assert (out["n_ref"], out["n_cur"]) == (300, 250)

    def test_identical_distributions_zero(self, spark):
        vals = [float(v) for v in range(50)]
        out = ks_drift(_events(spark, vals, vals), "value", "ts", SPLIT).collect()[0]
        assert out["ks_stat"] == 0.0

    def test_disjoint_supports_one(self, spark):
        out = ks_drift(
            _events(spark, [1.0, 2.0, 3.0], [10.0, 11.0]), "value", "ts", SPLIT
        ).collect()[0]
        assert out["ks_stat"] == 1.0

    def test_tie_heavy_inputs_exact(self, spark):
        ref = [1.0] * 10 + [2.0] * 10
        cur = [1.0] * 5 + [2.0] * 15
        out = ks_drift(_events(spark, ref, cur), "value", "ts", SPLIT).collect()[0]
        # ECDFs: at v=1 ref=0.5 cur=0.25 -> D=0.25
        assert out["ks_stat"] == pytest.approx(0.25, abs=1e-9)


class TestPsiScore:
    """fit_psi_reference + psi_score (train→serve PSI): brute parity from
    the fitted model, psi_drift composition equality, group lane,
    degenerate groups."""

    def _brute_psi(self, ref, vals):
        counts = [0] * ref["bins"]
        for v in vals:
            b = 1 + sum(1 for e in ref["edges"] if v > e)
            counts[b - 1] += 1
        n = float(len(vals))
        psi = 0.0
        for b in range(ref["bins"]):
            p = ref["ref_shares"][b]
            q = max(counts[b] / n, EPS)
            psi += (p - q) * math.log(p / q)
        return psi

    def test_fit_and_score_brute(self, spark):
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_score,
        )

        ref_vals = [float(v) for v in range(100)]
        cur_vals = [float(v) * 1.8 + 30 for v in range(50)]  # shifted
        ref_df = _events(spark, ref_vals, [])
        ref = fit_psi_reference(ref_df, "value", bins=5)
        assert len(ref["edges"]) == 4 and ref["n_ref"] == 100
        # uniform 0..99 into quintiles: every share 0.2
        for s in ref["ref_shares"]:
            assert s == pytest.approx(0.2, abs=1e-6)

        cur_df = _events(spark, [], cur_vals)
        row = psi_score(cur_df, ref).collect()[0]
        assert row["n"] == 50
        assert row["psi"] == pytest.approx(self._brute_psi(ref, cur_vals), abs=2e-6)

    def test_identical_distribution_near_zero(self, spark):
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_score,
        )

        vals = [float(v % 40) for v in range(200)]
        df = _events(spark, vals, [])
        ref = fit_psi_reference(df, "value", bins=4)
        row = psi_score(df, ref).collect()[0]
        assert abs(row["psi"]) < 1e-6

    def test_composition_equals_psi_drift(self, spark):
        """fit on the reference slice + score the current slice ==
        psi_drift's psi_total on the same split (same edges, same floors,
        same closed form) — the train→serve lane is the one-shot
        diagnostic, factored."""
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_drift,
            psi_score,
        )

        ref_vals = [float(v % 37) for v in range(150)]
        cur_vals = [float((v * 7) % 61) for v in range(90)]
        df = _events(spark, ref_vals, cur_vals)
        want = psi_drift(df, "value", "ts", SPLIT, bins=6).collect()[0]["psi_total"]
        ref = fit_psi_reference(
            df.filter(F.col("ts") < SPLIT), "value", bins=6
        )
        got = psi_score(df.filter(F.col("ts") >= SPLIT), ref).collect()[0]["psi"]
        assert got == pytest.approx(want, abs=2e-6)

    def test_group_lane_and_null_group(self, spark):
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_score,
        )

        ref = fit_psi_reference(
            _events(spark, [float(v) for v in range(50)], []), "value", bins=5
        )
        rows = [("a", float(v)) for v in range(25)] + [("b", None)] * 3
        df = spark.createDataFrame(rows, ["g", "value"])
        got = {r["g"]: r for r in psi_score(df, ref, group_cols=["g"]).collect()}
        assert got["a"]["n"] == 25 and got["a"]["psi"] is not None
        assert got["b"]["n"] == 0 and got["b"]["psi"] is None

    def test_errors(self, spark):
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_score,
        )

        df = _events(spark, [1.0, 2.0], [])
        with pytest.raises(DataFrameValidationError, match=">= 2"):
            fit_psi_reference(df, "value", bins=1)
        with pytest.raises(DataFrameValidationError, match="missing column"):
            fit_psi_reference(df, "nope")
        ref = fit_psi_reference(df, "value", bins=2)
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            psi_score(df, ref, group_cols=["nope"])
        bad = df.select(F.col("value").alias("other"))
        with pytest.raises(DataFrameValidationError, match="missing column"):
            psi_score(bad, ref)

    def test_single_aggregation_plan(self, spark):
        from temporalscope_spark.operators.drift import (
            fit_psi_reference,
            psi_score,
        )

        df = _events(spark, [float(v) for v in range(30)], [])
        ref = fit_psi_reference(df, "value", bins=5)
        plan = (
            psi_score(df, ref)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("Aggregate") == 1


class TestWasserstein1d:
    def test_scipy_formula_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.drift import wasserstein_1d

        rng = np.random.RandomState(2)
        a = rng.randn(400) + 1.0
        b = rng.randn(300)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, y double")
        got = wasserstein_1d(df, "y", "g", "a", "b").collect()[0]
        vals = np.sort(np.unique(np.concatenate([a, b])))
        fa = np.searchsorted(np.sort(a), vals, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), vals, side="right") / len(b)
        ref = np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(vals))
        assert got["w1"] == pytest.approx(ref, abs=1e-6)
        assert got["n_a"] == 400 and got["n_b"] == 300

    def test_pure_shift_equals_shift(self, spark):
        from temporalscope_spark.operators.drift import wasserstein_1d

        a = [float(v) for v in range(100)]
        rows = [("a", v) for v in a] + [("b", v + 7.5) for v in a]
        df = spark.createDataFrame(rows, "g string, y double")
        got = wasserstein_1d(df, "y", "g", "a", "b").collect()[0]
        assert got["w1"] == pytest.approx(7.5, abs=1e-6)  # W1 of a shift = shift

    def test_identical_zero(self, spark):
        from temporalscope_spark.operators.drift import wasserstein_1d

        rows = [("a", float(v % 13)) for v in range(50)] + [
            ("b", float(v % 13)) for v in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, y double")
        assert wasserstein_1d(df, "y", "g", "a", "b").collect()[0]["w1"] == 0.0

    def test_missing_group_raises(self, spark):
        from temporalscope_spark.operators.drift import wasserstein_1d

        df = spark.createDataFrame([("a", 1.0)], "g string, y double")
        with pytest.raises(Exception, match="has no"):
            wasserstein_1d(df, "y", "g", "a", "b")
