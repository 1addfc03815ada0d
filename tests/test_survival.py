"""Kaplan–Meier: pure-Python product-limit parity, censoring semantics,
sticky zero, group isolation, validation contract."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.survival import kaplan_meier


def _ref_km(pairs):
    """lifelines-convention product-limit over (duration, event) pairs."""
    times = sorted({t for t, _ in pairs})
    out = []
    s, gw, dead = 1.0, 0.0, False
    for t in times:
        n = sum(1 for d, _ in pairs if d >= t)
        ev = sum(1 for d, e in pairs if d == t and e == 1)
        ce = sum(1 for d, e in pairs if d == t and e == 0)
        if ev >= n:
            dead = True
            s = 0.0
        elif not dead:
            s *= (n - ev) / n
            if ev > 0:
                gw += ev / (n * (n - ev))
        se = None if dead else s * math.sqrt(gw)
        out.append((t, n, ev, ce, round(s, 6), None if se is None else round(se, 6)))
    return out


def _df(spark, pairs, group=None):
    if group is None:
        rows = [(float(t), int(e)) for t, e in pairs]
        return spark.createDataFrame(rows, "dur double, ev int")
    rows = [(g, float(t), int(e)) for g, (t, e) in zip(group, pairs)]
    return spark.createDataFrame(rows, "g string, dur double, ev int")


class TestKaplanMeier:
    def test_reference_parity_with_censoring(self, spark):
        # the classic lifelines worked example shape: ties, mixed censoring
        pairs = [
            (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
            (10, 0), (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0),
            (22, 1), (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
        ]
        got = kaplan_meier(_df(spark, pairs), "dur", "ev").collect()
        ref = _ref_km(pairs)
        assert [
            (r["t"], r["n_risk"], r["n_event"], r["n_censored"], r["survival"], r["se"])
            for r in got
        ] == ref

    def test_no_censoring_matches_empirical(self, spark):
        pairs = [(t, 1) for t in [1, 2, 2, 3, 5, 5, 5, 8]]
        got = kaplan_meier(_df(spark, pairs), "dur", "ev").collect()
        n = len(pairs)
        for r in got:
            surv_frac = sum(1 for t, _ in pairs if t > r["t"]) / n
            assert r["survival"] == pytest.approx(surv_frac, abs=1e-6)
        # everyone eventually dies → S reaches exactly 0 and SE is NULL there
        assert got[-1]["survival"] == 0.0
        assert got[-1]["se"] is None

    def test_censored_only_time_keeps_curve_flat(self, spark):
        pairs = [(1, 1), (2, 0), (3, 1)]
        got = {r["t"]: r for r in kaplan_meier(_df(spark, pairs), "dur", "ev").collect()}
        assert got[2.0]["survival"] == got[1.0]["survival"]
        assert got[2.0]["n_censored"] == 1 and got[2.0]["n_event"] == 0
        # the censored subject reduces the at-risk set for t=3: S = 2/3 * 1 * 0
        assert got[3.0]["survival"] == 0.0

    def test_groups_are_isolated(self, spark):
        pa = [(1, 1), (2, 1), (4, 0)]
        pb = [(1, 0), (3, 1), (3, 1)]
        df = _df(spark, pa + pb, group=["a"] * 3 + ["b"] * 3)
        got = kaplan_meier(df, "dur", "ev", group_col="g").collect()
        ra = [(r["t"], r["survival"]) for r in got if r["group"] == "a"]
        rb = [(r["t"], r["survival"]) for r in got if r["group"] == "b"]
        assert ra == [(t, s) for t, _, _, _, s, _ in _ref_km(pa)]
        assert rb == [(t, s) for t, _, _, _, s, _ in _ref_km(pb)]

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (None, 1), (2.0, None), (2.0, 0)], "dur double, ev int"
        )
        got = kaplan_meier(df, "dur", "ev").collect()
        assert sum(r["n_risk"] for r in got if r["t"] == 1.0) == 2

    def test_non_binary_event_raises(self, spark):
        df = _df(spark, [(1, 1), (2, 2)])
        with pytest.raises(Exception, match="must be 0/1"):
            kaplan_meier(df, "dur", "ev").collect()

    def test_missing_column_raises(self, spark):
        df = _df(spark, [(1, 1)])
        with pytest.raises(DataFrameValidationError, match="missing column"):
            kaplan_meier(df, "nope", "ev")


def _ref_na(pairs):
    times = sorted({t for t, _ in pairs})
    out, h, v = [], 0.0, 0.0
    for t in times:
        n = sum(1 for d, _ in pairs if d >= t)
        ev = sum(1 for d, e in pairs if d == t and e == 1)
        h += ev / n
        v += ev / (n * n)
        out.append((t, round(h, 6), round(math.sqrt(v), 6)))
    return out


def _ref_logrank(groups):
    """groups: {name: [(dur, event), ...]} -> (O, E per group, chi2)."""
    times = sorted({t for ps in groups.values() for t, e in ps if e == 1})
    O = {g: 0.0 for g in groups}
    E = {g: 0.0 for g in groups}
    V = 0.0
    names = sorted(groups)
    for t in times:
        ngt = {g: sum(1 for d, _ in ps if d >= t) for g, ps in groups.items()}
        dgt = {g: sum(1 for d, e in ps if d == t and e == 1)
               for g, ps in groups.items()}
        nt = sum(ngt.values())
        dt = sum(dgt.values())
        for g in groups:
            O[g] += dgt[g]
            E[g] += dt * ngt[g] / nt
        if len(names) == 2 and nt > 1:
            p = ngt[names[0]] / nt
            V += dt * p * (1 - p) * (nt - dt) / (nt - 1)
    chi2 = None
    if len(names) == 2 and V > 0:
        d = O[names[0]] - E[names[0]]
        chi2 = d * d / V
    return O, E, chi2


class TestNelsonAalen:
    def test_reference_parity(self, spark):
        from temporalscope_spark.operators.survival import nelson_aalen

        pairs = [(6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (13, 1),
                 (16, 0), (22, 1), (23, 1)]
        got = nelson_aalen(_df(spark, pairs), "dur", "ev").collect()
        ref = _ref_na(pairs)
        assert [(r["t"], r["hazard"], r["se"]) for r in got] == ref

    def test_hazard_monotone_nondecreasing(self, spark):
        from temporalscope_spark.operators.survival import nelson_aalen

        pairs = [(t, t % 2) for t in range(1, 20)]
        got = nelson_aalen(_df(spark, pairs), "dur", "ev").collect()
        hz = [r["hazard"] for r in got]
        assert hz == sorted(hz)


class TestLogRank:
    def test_two_group_reference_parity(self, spark):
        from temporalscope_spark.operators.survival import logrank_test

        ga = [(3, 1), (5, 1), (7, 0), (9, 1), (11, 1), (14, 0), (15, 1)]
        gb = [(8, 1), (10, 0), (12, 1), (16, 1), (20, 0), (22, 1), (25, 1)]
        df = _df(spark, ga + gb, group=["a"] * len(ga) + ["b"] * len(gb))
        got = {r["group"]: r for r in
               logrank_test(df, "dur", "ev", "g").collect()}
        O, E, chi2 = _ref_logrank({"a": ga, "b": gb})
        for g in ("a", "b"):
            assert got[g]["observed"] == O[g]
            assert got[g]["expected"] == pytest.approx(E[g], abs=1e-6)
            assert got[g]["chi2"] == pytest.approx(chi2, abs=1e-5)
        assert got["a"]["n_subjects"] == 7

    def test_identical_groups_low_chi2(self, spark):
        from temporalscope_spark.operators.survival import logrank_test

        g = [(t, 1) for t in [2, 4, 6, 8, 10, 12]]
        df = _df(spark, g + g, group=["a"] * 6 + ["b"] * 6)
        got = logrank_test(df, "dur", "ev", "g").collect()
        assert got[0]["chi2"] == pytest.approx(0.0, abs=1e-9)

    def test_separated_groups_high_chi2(self, spark):
        from temporalscope_spark.operators.survival import logrank_test

        ga = [(t, 1) for t in range(1, 15)]
        gb = [(t + 50, 1) for t in range(1, 15)]
        df = _df(spark, ga + gb, group=["a"] * 14 + ["b"] * 14)
        got = logrank_test(df, "dur", "ev", "g").collect()
        O, E, chi2 = _ref_logrank({"a": ga, "b": gb})
        assert got[0]["chi2"] == pytest.approx(chi2, abs=1e-4)
        assert got[0]["chi2"] > 10.0

    def test_three_groups_null_chi2(self, spark):
        from temporalscope_spark.operators.survival import logrank_test

        rows = [(1, 1), (2, 1), (3, 1)]
        df = _df(spark, rows * 3, group=["a"] * 3 + ["b"] * 3 + ["c"] * 3)
        got = logrank_test(df, "dur", "ev", "g").collect()
        O, E, _ = _ref_logrank(
            {"a": rows, "b": rows, "c": rows}
        )
        for r in got:
            assert r["chi2"] is None
            assert r["expected"] == pytest.approx(E[r["group"]], abs=1e-6)


class TestRmst:
    def test_km_area_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.survival import rmst

        rng = np.random.RandomState(1)
        T = rng.exponential(10, 400)
        C = rng.exponential(25, 400)
        dur = np.minimum(T, C)
        ev = (T <= C).astype(float)
        df = spark.createDataFrame(
            [(float(dur[i]), float(ev[i])) for i in range(400)],
            "dur double, ev double",
        )
        got = rmst(df, "dur", "ev", tau=15.0).collect()[0]
        order = np.argsort(dur)
        d_, e_ = dur[order], ev[order]
        S, prev, area, at_risk = 1.0, 0.0, 0.0, len(d_)
        for t in np.unique(d_):
            m = d_ == t
            area += S * (min(t, 15.0) - min(prev, 15.0))
            dth = e_[m].sum()
            if dth > 0:
                S *= (at_risk - dth) / at_risk
            at_risk -= m.sum()
            prev = t
        if prev < 15.0:
            area += S * (15.0 - prev)
        assert got["rmst"] == pytest.approx(area, abs=1e-4)
        assert got["n"] == 400 and got["n_events"] == int(ev.sum())

    def test_no_censoring_equals_truncated_mean(self, spark):
        import numpy as np

        from temporalscope_spark.operators.survival import rmst

        rng = np.random.RandomState(3)
        dur = rng.exponential(5, 600)
        df = spark.createDataFrame(
            [(float(d), 1.0) for d in dur], "dur double, ev double"
        )
        got = rmst(df, "dur", "ev", tau=100.0).collect()[0]
        assert got["rmst"] == pytest.approx(np.minimum(dur, 100.0).mean(), abs=1e-3)

    def test_grouped_and_tau_caps(self, spark):
        from temporalscope_spark.operators.survival import rmst

        rows = [("a", 5.0, 1.0), ("a", 10.0, 0.0), ("b", 1.0, 1.0), ("b", 2.0, 1.0)]
        df = spark.createDataFrame(rows, "g string, dur double, ev double")
        got = {r["group"]: r for r in rmst(df, "dur", "ev", tau=4.0,
                                           group_col="g").collect()}
        # group a: S=1 on [0,4) since first event at 5 > tau
        assert got["a"]["rmst"] == pytest.approx(4.0)
        # group b: S=1 to 1, S=0.5 on [1,2), S=0 after
        assert got["b"]["rmst"] == pytest.approx(1.0 + 0.5 * 1.0)

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.survival import rmst

        df = spark.createDataFrame([(1.0, 1.0)], "dur double, ev double")
        with pytest.raises(DataFrameValidationError):
            rmst(df, "dur", "ev", tau=0.0)
