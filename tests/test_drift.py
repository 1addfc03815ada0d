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
