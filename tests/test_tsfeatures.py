"""Autocorrelation + Fourier time features (operators/tsfeatures.py)."""

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.tsfeatures import acf_features, fourier_time_features


@pytest.fixture
def series(spark):
    rows = []
    # entity 1: strong AR(1)-ish alternation -> negative acf_1
    vals1 = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
    rows += [(1, float(t), v) for t, v in enumerate(vals1)]
    # entity 2: slow ramp -> strongly positive acf_1
    vals2 = [float(t) for t in range(10)]
    rows += [(2, float(t), v) for t, v in enumerate(vals2)]
    # entity 3: constant (zero variance) -> acf null
    rows += [(3, float(t), 5.0) for t in range(5)]
    # entity 4: too short for lag 2
    rows += [(4, 0.0, 1.0), (4, 1.0, 2.0)]
    # entity 5: nulls interleaved -> ACF over the non-null subsequence
    rows += [(5, 0.0, 1.0), (5, 1.0, None), (5, 2.0, 3.0), (5, 3.0, 2.0), (5, 4.0, None), (5, 5.0, 4.0)]
    return spark.createDataFrame(rows, ["uid", "t", "x"])


def _brute_acf(xs, max_lag):
    n = len(xs)
    m = sum(xs) / n
    sse = sum((v - m) ** 2 for v in xs)
    out = {}
    for k in range(1, max_lag + 1):
        if n > k and sse > 0:
            num = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n))
            out[k] = num / sse
        else:
            out[k] = None
    return m, out


class TestAcfFeatures:
    def test_matches_bruteforce(self, spark, series):
        got = {
            r["uid"]: r
            for r in acf_features(series, "x", 2, time_col="t", id_col="uid").collect()
        }
        data = {}
        for r in series.collect():
            if r["x"] is not None:
                data.setdefault(r["uid"], []).append((r["t"], r["x"]))
        assert set(got) == set(data)
        for uid, pts in data.items():
            xs = [v for _, v in sorted(pts)]
            m, acf = _brute_acf(xs, 2)
            row = got[uid]
            assert row["n_obs"] == len(xs)
            assert row["mean"] == pytest.approx(m, abs=2e-6)
            for k in (1, 2):
                if acf[k] is None:
                    assert row[f"acf_{k}"] is None
                else:
                    assert row[f"acf_{k}"] == pytest.approx(acf[k], abs=2e-6)

    def test_alternating_vs_ramp_signs(self, spark, series):
        got = {
            r["uid"]: r
            for r in acf_features(series, "x", 1, time_col="t", id_col="uid").collect()
        }
        assert got[1]["acf_1"] < -0.8  # alternating
        assert got[2]["acf_1"] > 0.5  # ramp
        assert got[3]["acf_1"] is None  # zero variance

    def test_acf_bounded(self, spark, series):
        rows = acf_features(series, "x", 3, time_col="t", id_col="uid").collect()
        for r in rows:
            for k in (1, 2, 3):
                v = r[f"acf_{k}"]
                assert v is None or -1.0 - 1e-9 <= v <= 1.0 + 1e-9

    def test_tiebreak_makes_duplicate_ts_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, 10, 1.0), (1, 0.0, 11, 5.0), (1, 1.0, 12, 2.0), (1, 1.0, 13, 7.0)],
            ["uid", "t", "rid", "x"],
        )
        a = acf_features(df, "x", 1, time_col="t", id_col="uid", tiebreak_col="rid")
        b = acf_features(
            df.orderBy("x"), "x", 1, time_col="t", id_col="uid", tiebreak_col="rid"
        )
        assert a.collect() == b.collect()

    def test_validations(self, spark, series):
        with pytest.raises(DataFrameValidationError, match="max_lag"):
            acf_features(series, "x", 0, time_col="t", id_col="uid")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            acf_features(series, "nope", 1, time_col="t", id_col="uid")


class TestFourierTimeFeatures:
    def test_matches_math(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0), (2, 21600.0), (3, 43200.0), (4, 86400.0), (5, 90000.0)],
            ["eid", "t"],
        )
        got = {
            r["eid"]: r
            for r in fourier_time_features(
                df, "t", period_seconds=86400, harmonics=2
            ).collect()
        }
        for eid, sec in [(1, 0.0), (2, 21600.0), (3, 43200.0), (4, 86400.0), (5, 90000.0)]:
            phase = (sec % 86400) / 86400
            for h in (1, 2):
                ang = 2 * math.pi * h * phase
                assert got[eid][f"t_86400s_sin_{h}"] == pytest.approx(
                    math.sin(ang), abs=2e-6
                )
                assert got[eid][f"t_86400s_cos_{h}"] == pytest.approx(
                    math.cos(ang), abs=2e-6
                )

    def test_period_wraps(self, spark):
        df = spark.createDataFrame([(1, 3600.0), (2, 90000.0)], ["eid", "t"])
        got = fourier_time_features(df, "t", 86400, 1).collect()
        by = {r["eid"]: (r["t_86400s_sin_1"], r["t_86400s_cos_1"]) for r in got}
        assert by[1] == by[2]  # 90000 mod 86400 == 3600

    def test_validations(self, spark):
        df = spark.createDataFrame([(1, 0.0)], ["eid", "t"])
        with pytest.raises(DataFrameValidationError, match="harmonics"):
            fourier_time_features(df, "t", 86400, 0)
        with pytest.raises(DataFrameValidationError, match="period_seconds"):
            fourier_time_features(df, "t", 0, 1)

    def test_no_exchange_in_plan(self, spark):
        df = spark.createDataFrame([(1, 0.0)], ["eid", "t"])
        plan = (
            fourier_time_features(df, "t")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestSeasonalDecompose:
    @pytest.fixture
    def seasonal_series(self, spark):
        # period 4s, phase buckets of 1s; planted pattern [0, 10, 0, -10]
        pat = [0.0, 10.0, 0.0, -10.0]
        rows = [
            (1, float(t), pat[t % 4] + 0.5 * t)  # pattern + linear trend
            for t in range(32)
        ]
        rows.append((1, 32.0, None))  # null value row
        return spark.createDataFrame(rows, ["uid", "t", "x"])

    def _brute(self, rows, period, phase_s):
        from collections import defaultdict

        half = period / 2
        pts = sorted((t, x) for _, t, x in rows)
        trend = {}
        for t, x in pts:
            vals = [v for u, v in pts if abs(u - t) <= half and v is not None]
            trend[t] = (sum(vals) / len(vals)) if vals else None
        det = {
            t: (x - trend[t]) if (x is not None and trend[t] is not None) else None
            for t, x in pts
        }
        byphase = defaultdict(list)
        for t, _ in pts:
            if det[t] is not None:
                byphase[int((t % period) // phase_s)].append(det[t])
        seas = {p: sum(v) / len(v) for p, v in byphase.items()}
        out = {}
        for t, x in pts:
            p = int((t % period) // phase_s)
            s = seas.get(p)
            out[t] = (
                p,
                None if trend[t] is None else round(trend[t], 6),
                None if s is None else round(s, 6),
                None if (det[t] is None or s is None) else round(det[t] - s, 6),
            )
        return out

    def test_matches_bruteforce(self, spark, seasonal_series):
        from temporalscope_spark.operators.tsfeatures import seasonal_decompose

        got = {
            r["t"]: (r["phase"], r["trend"], r["seasonal"], r["resid"])
            for r in seasonal_decompose(
                seasonal_series, "x", 4, 1, time_col="t", id_col="uid"
            ).collect()
        }
        want = self._brute(
            [(r["uid"], r["t"], r["x"]) for r in seasonal_series.collect()], 4, 1
        )
        for t, w in want.items():
            g = got[t]
            assert g[0] == w[0]
            for gi, wi in zip(g[1:], w[1:]):
                if wi is None:
                    assert gi is None
                else:
                    assert gi == pytest.approx(wi, abs=2e-6)

    def test_additive_identity(self, spark, seasonal_series):
        from temporalscope_spark.operators.tsfeatures import seasonal_decompose

        rows = seasonal_decompose(
            seasonal_series, "x", 4, 1, time_col="t", id_col="uid"
        ).collect()
        for r in rows:
            if r["x"] is not None and r["resid"] is not None:
                assert r["trend"] + r["seasonal"] + r["resid"] == pytest.approx(
                    r["x"], abs=5e-6
                )

    def test_recovers_planted_pattern(self, spark, seasonal_series):
        from temporalscope_spark.operators.tsfeatures import seasonal_decompose

        rows = seasonal_decompose(
            seasonal_series, "x", 4, 1, time_col="t", id_col="uid"
        ).collect()
        by_phase = {}
        for r in rows:
            if r["seasonal"] is not None:
                by_phase[r["phase"]] = r["seasonal"]
        # planted [0, 10, 0, -10]: phase 1 highest, phase 3 lowest
        assert by_phase[1] == max(by_phase.values())
        assert by_phase[3] == min(by_phase.values())

    def test_validations(self, spark, seasonal_series):
        from temporalscope_spark.operators.tsfeatures import seasonal_decompose

        with pytest.raises(DataFrameValidationError, match="divide"):
            seasonal_decompose(seasonal_series, "x", 5, 2, time_col="t", id_col="uid")
        with pytest.raises(DataFrameValidationError, match="must be > 0"):
            seasonal_decompose(seasonal_series, "x", 0, 1, time_col="t", id_col="uid")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            seasonal_decompose(seasonal_series, "nope", 4, 1, time_col="t", id_col="uid")


class TestCalendarFeatures:
    def test_known_dates(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import calendar_features

        rows = [
            (1, datetime(2024, 2, 29, 13, 5)),   # leap-Feb month end, Thursday
            (2, datetime(2024, 3, 1, 0, 0)),     # month start, Friday
            (3, datetime(2024, 3, 31, 23, 59)),  # month end, Sunday
            (4, None),
        ]
        df = spark.createDataFrame(rows, "rid int, t timestamp")
        got = {
            r["rid"]: r
            for r in calendar_features(df, "t").collect()
        }
        r1 = got[1]
        assert (r1["t_hour"], r1["t_dow"], r1["t_day"], r1["t_month"]) == (13, 4, 29, 2)
        assert (r1["t_quarter"], r1["t_year"]) == (1, 2024)
        assert (r1["t_is_weekend"], r1["t_is_month_start"], r1["t_is_month_end"]) == (0, 0, 1)
        r2 = got[2]
        assert (r2["t_dow"], r2["t_is_month_start"], r2["t_is_month_end"]) == (5, 1, 0)
        r3 = got[3]
        assert (r3["t_dow"], r3["t_is_weekend"], r3["t_is_month_end"]) == (7, 1, 1)
        r4 = got[4]
        assert r4["t_hour"] is None and r4["t_is_month_end"] is None

    def test_expression_only(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import calendar_features

        df = spark.createDataFrame([(1, datetime(2024, 1, 1))], "rid int, t timestamp")
        plan = calendar_features(df, "t")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_missing_column(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import calendar_features

        df = spark.createDataFrame([(1, datetime(2024, 1, 1))], "rid int, t timestamp")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            calendar_features(df, "nope")


class TestRecencyFeatures:
    def test_gaps_and_first_event_null(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import recency_features

        rows = [
            (1, "u1", "a", datetime(2024, 1, 1, 0, 0, 0)),
            (2, "u1", "b", datetime(2024, 1, 1, 0, 0, 10)),
            (3, "u1", "a", datetime(2024, 1, 1, 0, 0, 25)),
            (4, "u2", "a", datetime(2024, 1, 1, 0, 1, 0)),
        ]
        df = spark.createDataFrame(rows, "eid int, uid string, typ string, t timestamp")
        got = {
            r["eid"]: r
            for r in recency_features(
                df, "t", "uid", type_col="typ", tiebreak_col="eid"
            ).collect()
        }
        assert got[1]["since_any"] is None and got[1]["since_same_type"] is None
        assert got[2]["since_any"] == 10.0
        assert got[2]["since_same_type"] is None  # first 'b' for u1
        assert got[3]["since_any"] == 15.0
        assert got[3]["since_same_type"] == 25.0  # previous 'a' at t=0
        assert got[4]["since_any"] is None  # other entity: no bleed

    def test_without_type(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import recency_features

        df = spark.createDataFrame(
            [(1, "u", datetime(2024, 1, 1)), (2, "u", datetime(2024, 1, 2))],
            "eid int, uid string, t timestamp",
        )
        out = recency_features(df, "t", "uid")
        assert "since_same_type" not in out.columns
        got = {r["eid"]: r["since_any"] for r in out.collect()}
        assert got[2] == 86400.0


class TestEntityProfile:
    def test_profile_values(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import entity_profile

        rows = [
            ("u1", datetime(2024, 1, 1, 10), 1.0),
            ("u1", datetime(2024, 1, 1, 12), 3.0),
            ("u1", datetime(2024, 1, 3, 9), 5.0),
            ("u2", datetime(2024, 2, 1), 7.0),
        ]
        df = spark.createDataFrame(rows, "uid string, t timestamp, v double")
        got = {r["uid"]: r for r in entity_profile(df, "uid", "t", "v").collect()}
        u1 = got["u1"]
        assert u1["n_events"] == 3
        assert u1["tenure_seconds"] == (2 * 86400 - 3600 * 1.0)
        assert u1["active_days"] == 2
        assert (u1["v_mean"], u1["v_min"], u1["v_max"]) == (3.0, 1.0, 5.0)
        u2 = got["u2"]
        assert u2["n_events"] == 1 and u2["tenure_seconds"] == 0.0

    def test_missing_cols(self, spark):
        from datetime import datetime

        from temporalscope_spark.operators.tsfeatures import entity_profile

        df = spark.createDataFrame([("u", datetime(2024, 1, 1))], "uid string, t timestamp")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            entity_profile(df, "uid", "nope")


class TestTrendFeatures:
    def test_matches_numpy_polyfit(self, spark):
        import datetime as dt

        import numpy as np

        from temporalscope_spark.operators.tsfeatures import trend_features

        base = dt.datetime(2024, 1, 1)
        rows = []
        rng = np.random.default_rng(5)
        for u, (a, b) in enumerate([(2.0, 1.5), (-0.5, 10.0)]):
            for i in range(50):
                noise = float(rng.normal(scale=0.1))
                rows.append((f"u{u}", base + dt.timedelta(hours=i), a * i + b + noise))
        df = spark.createDataFrame(rows, "uid string, t timestamp, v double")
        got = {r["uid"]: r for r in trend_features(df, "v", "t", "uid").collect()}
        for u in ("u0", "u1"):
            ts = np.arange(50.0)
            vs = np.array([r[2] for r in rows if r[0] == u])
            sl, ic = np.polyfit(ts, vs, 1)
            r2 = float(np.corrcoef(ts, vs)[0, 1] ** 2)
            assert got[u]["slope"] == pytest.approx(round(float(sl), 6), abs=1e-6)
            assert got[u]["intercept"] == pytest.approx(round(float(ic), 6), abs=1e-6)
            assert got[u]["r2"] == pytest.approx(r2, abs=1e-5)
            assert got[u]["n_obs"] == 50

    def test_degenerate_series(self, spark):
        import datetime as dt

        from temporalscope_spark.operators.tsfeatures import trend_features

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("single", base, 5.0),
            ("flat", base, 3.0),
            ("flat", base + dt.timedelta(hours=1), 3.0),
        ]
        df = spark.createDataFrame(rows, "uid string, t timestamp, v double")
        got = {r["uid"]: r for r in trend_features(df, "v", "t", "uid").collect()}
        assert got["single"]["slope"] is None
        assert got["flat"]["slope"] == 0.0 and got["flat"]["r2"] is None

    def test_one_shuffle_plan(self, spark):
        import datetime as dt

        from temporalscope_spark.operators.tsfeatures import trend_features

        df = spark.createDataFrame(
            [("u", dt.datetime(2024, 1, 1), 1.0)], "uid string, t timestamp, v double"
        )
        plan = trend_features(df, "v", "t", "uid")._jdf.queryExecution().executedPlan().toString()
        # window min + groupBy share the entity hash partitioning: the agg
        # reuses the window's exchange
        assert plan.count("Exchange hashpartitioning") <= 1


class TestWoe:
    def test_hand_computed(self, spark):
        import math

        from temporalscope_spark.operators.encoding import woe_encode, woe_iv_table

        rows = (
            [("a", 1.0)] * 8 + [("a", 0.0)] * 2
            + [("b", 1.0)] * 3 + [("b", 0.0)] * 7
            + [(None, 1.0)] * 1 + [(None, 0.0)] * 1
        )
        df = spark.createDataFrame(
            [(i, c, y) for i, (c, y) in enumerate(rows)], ["rid", "cat", "y"]
        )
        pt, nt = 12.0, 10.0
        tab = {r["category"]: r for r in woe_iv_table(df, "cat", "y").collect()}
        for cat, pos, neg in (("a", 8, 2), ("b", 3, 7), ("__null__", 1, 1)):
            woe = math.log(((pos + 0.5) / pt) / ((neg + 0.5) / nt))
            iv = (pos / pt - neg / nt) * woe
            assert tab[cat]["woe"] == pytest.approx(round(woe, 6), abs=1e-9)
            assert tab[cat]["iv"] == pytest.approx(round(iv, 6), abs=1e-9)
        enc = woe_encode(df, "cat", "y").collect()
        for r in enc:
            k = r["cat"] if r["cat"] is not None else "__null__"
            assert r["cat_woe"] == tab[k]["woe"]

    def test_validations(self, spark):
        from temporalscope_spark.operators.encoding import woe_iv_table

        df = spark.createDataFrame([(1, "a", 2.0)], ["rid", "cat", "y"])
        with pytest.raises(DataFrameValidationError, match="0/1"):
            woe_iv_table(df, "cat", "y")
        one_class = spark.createDataFrame([(1, "a", 1.0)], ["rid", "cat", "y"])
        with pytest.raises(DataFrameValidationError, match="both classes"):
            woe_iv_table(one_class, "cat", "y")


def _brute_series(xs):
    n = len(xs)
    diffs = [xs[i] - xs[i - 1] for i in range(1, n)]
    best = cur = 0
    for d in diffs:
        cur = cur + 1 if d > 0 else 0
        best = max(best, cur)
    return {
        "n_obs": n,
        "abs_energy": sum(v * v for v in xs),
        "mean_abs_change": sum(abs(d) for d in diffs) / len(diffs) if diffs else None,
        "mean_change": sum(diffs) / len(diffs) if diffs else None,
        "cid_ce": math.sqrt(sum(d * d for d in diffs)) if diffs else None,
        "n_peaks": sum(
            1 for i in range(1, n - 1) if xs[i - 1] < xs[i] > xs[i + 1]
        ),
        "n_dir_changes": sum(
            1
            for i in range(2, n)
            if (xs[i] - xs[i - 1]) * (xs[i - 1] - xs[i - 2]) < 0
        ),
        "longest_inc_run": best,
    }


class TestSeriesFeatures:
    """series_features (operators/tsfeatures.py): tsfresh-formula brute
    parity per entity, null/short-series edges, 3-exchange plan."""

    @pytest.fixture
    def sdf(self, spark, series):
        from pyspark.sql import functions as F

        # add a single-point entity on top of the shared ACF fixture
        extra = spark.createDataFrame([(6, 0.0, 7.0)], ["uid", "t", "x"])
        return series.unionByName(extra)

    def test_matches_bruteforce(self, spark, sdf):
        from temporalscope_spark.operators.tsfeatures import series_features

        raw = sdf.collect()
        got = {
            r["uid"]: r
            for r in series_features(sdf, "x", time_col="t", id_col="uid").collect()
        }
        for uid in (1, 2, 3, 4, 5, 6):
            xs = [
                float(r["x"])
                for r in sorted(raw, key=lambda r: (r["uid"], r["t"]))
                if r["uid"] == uid and r["x"] is not None
            ]
            want = _brute_series(xs)
            row = got[uid]
            assert row["n_obs"] == want["n_obs"], uid
            assert row["abs_energy"] == pytest.approx(want["abs_energy"], abs=2e-6)
            for k in ("mean_abs_change", "mean_change", "cid_ce"):
                if want[k] is None:
                    assert row[k] is None, (uid, k)
                else:
                    assert row[k] == pytest.approx(want[k], abs=2e-6), (uid, k)
            for k in ("n_peaks", "n_dir_changes", "longest_inc_run"):
                assert row[k] == want[k], (uid, k)

    def test_known_values(self, spark):
        from temporalscope_spark.operators.tsfeatures import series_features

        # 1,3,2,4,6,5: peaks at 3 and 6; dir changes at every turn;
        # longest increasing streak = 2 steps (4->6 wait: 2,4,6)
        xs = [1.0, 3.0, 2.0, 4.0, 6.0, 5.0]
        df = spark.createDataFrame(
            [(1, float(t), v) for t, v in enumerate(xs)], ["uid", "t", "x"]
        )
        row = series_features(df, "x", time_col="t", id_col="uid").collect()[0]
        assert row["n_peaks"] == 2
        assert row["longest_inc_run"] == 2
        assert row["n_dir_changes"] == 3
        assert row["mean_change"] == pytest.approx((5.0 - 1.0) / 5, abs=1e-6)

    def test_tiebreak_determinism(self, spark):
        from temporalscope_spark.operators.tsfeatures import series_features

        rows = [(1, 0.0, 10, 1.0), (1, 0.0, 11, 5.0), (1, 0.0, 12, 2.0)]
        df = spark.createDataFrame(rows, ["uid", "t", "rid", "x"])
        a = series_features(
            df.repartition(1), "x", time_col="t", id_col="uid", tiebreak_col="rid"
        ).collect()[0]
        b = series_features(
            df.repartition(8), "x", time_col="t", id_col="uid", tiebreak_col="rid"
        ).collect()[0]
        assert a == b
        assert a["n_peaks"] == 1  # 1 < 5 > 2 in rid order

    def test_errors(self, spark, sdf):
        from temporalscope_spark.operators.tsfeatures import series_features

        with pytest.raises(DataFrameValidationError, match="missing column"):
            series_features(sdf, "nope", time_col="t", id_col="uid")

    def test_plan_three_exchanges(self, spark, sdf):
        from temporalscope_spark.operators.tsfeatures import series_features

        plan = (
            series_features(sdf, "x", time_col="t", id_col="uid")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 3
        assert "SinglePartition" not in plan


class TestDftFeatures:
    """dft_features: numpy fft parity, short-series gating, pure-tone
    detection, determinism."""

    def test_matches_numpy_fft(self, spark, series):
        import numpy as np

        from temporalscope_spark.operators.tsfeatures import dft_features

        raw = series.collect()
        got = {
            r["uid"]: r
            for r in dft_features(
                series, "x", 3, time_col="t", id_col="uid"
            ).collect()
        }
        for uid in (1, 2, 3, 5):
            xs = np.array(
                [
                    float(r["x"])
                    for r in sorted(raw, key=lambda r: (r["uid"], r["t"]))
                    if r["uid"] == uid and r["x"] is not None
                ]
            )
            want = np.abs(np.fft.fft(xs))
            row = got[uid]
            assert row["n_obs"] == len(xs)
            for k in (1, 2, 3):
                if len(xs) > k:
                    assert row[f"dft_mag_{k}"] == pytest.approx(
                        want[k], abs=2e-5
                    ), (uid, k)
                else:
                    assert row[f"dft_mag_{k}"] is None, (uid, k)

    def test_pure_tone_peaks_at_its_frequency(self, spark):
        import numpy as np

        from temporalscope_spark.operators.tsfeatures import dft_features

        n = 32
        xs = [math.sin(2 * math.pi * 2 * t / n) for t in range(n)]
        df = spark.createDataFrame(
            [(1, float(t), v) for t, v in enumerate(xs)], ["uid", "t", "x"]
        )
        row = dft_features(df, "x", 3, time_col="t", id_col="uid").collect()[0]
        # a k=2 tone: |c_2| = n/2, other coefficients ~ 0
        assert row["dft_mag_2"] == pytest.approx(n / 2, abs=1e-4)
        assert row["dft_mag_1"] == pytest.approx(0.0, abs=1e-4)
        assert row["dft_mag_3"] == pytest.approx(0.0, abs=1e-4)

    def test_partition_invariance(self, spark, series):
        from temporalscope_spark.operators.tsfeatures import dft_features

        a = sorted(
            map(
                tuple,
                dft_features(
                    series.repartition(1), "x", 2, time_col="t", id_col="uid"
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                dft_features(
                    series.repartition(8), "x", 2, time_col="t", id_col="uid"
                ).collect(),
            )
        )
        assert a == b

    def test_errors(self, spark, series):
        from temporalscope_spark.operators.tsfeatures import dft_features

        with pytest.raises(DataFrameValidationError, match="n_coeffs"):
            dft_features(series, "x", 0, time_col="t", id_col="uid")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            dft_features(series, "nope", 2, time_col="t", id_col="uid")

    def test_plan_shape(self, spark, series):
        from temporalscope_spark.operators.tsfeatures import dft_features

        plan = (
            dft_features(series, "x", 3, time_col="t", id_col="uid")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 2
        assert "SinglePartition" not in plan


class TestResidualDiagnostics:
    def _df(self, spark, seed=3):
        import datetime

        import numpy as np

        rng = np.random.RandomState(seed)
        rows, series = [], {}
        for uid in range(3):
            x = rng.randn(60)
            if uid == 1:
                for t in range(1, 60):
                    x[t] = 0.8 * x[t - 1] + 0.3 * x[t]
            series[uid] = x
            for t in range(60):
                rows.append((uid, datetime.datetime(2024, 1, 1) +
                             datetime.timedelta(hours=t), t, float(x[t])))
        return series, spark.createDataFrame(
            rows, "doc_id long, event_time timestamp, seq long, y double"
        )

    def test_durbin_watson_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.tsfeatures import durbin_watson

        series, df = self._df(spark)
        got = {r["doc_id"]: r["dw"]
               for r in durbin_watson(df, "y", "event_time", "doc_id",
                                      "seq").collect()}
        for uid, x in series.items():
            ref = (np.diff(x) ** 2).sum() / ((x - x.mean()) ** 2).sum()
            assert got[uid] == pytest.approx(ref, abs=1e-6)
        assert got[1] < 1.0      # AR(1) series: strong positive autocorr
        assert 1.5 < got[0] < 2.5

    def test_ljung_box_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.tsfeatures import ljung_box

        series, df = self._df(spark)
        got = {r["doc_id"]: r for r in
               ljung_box(df, "y", 5, "event_time", "doc_id", "seq").collect()}
        for uid, x in series.items():
            n = len(x)
            den = ((x - x.mean()) ** 2).sum()
            acf6 = [round(float(((x[k:] - x.mean()) * (x[:-k] - x.mean())).sum()
                          / den), 6) for k in range(1, 6)]
            Q = n * (n + 2) * sum(a * a / (n - k)
                                  for k, a in zip(range(1, 6), acf6))
            assert got[uid]["q_stat"] == pytest.approx(Q, abs=1e-5)
            assert got[uid]["dof"] == 5
        assert got[1]["q_stat"] > 50    # dependence detected

    def test_degenerate_series(self, spark):
        import datetime

        from temporalscope_spark.operators.tsfeatures import (
            durbin_watson,
            ljung_box,
        )

        rows = [(1, datetime.datetime(2024, 1, 1, h), h, 5.0) for h in range(8)]
        rows += [(2, datetime.datetime(2024, 1, 1), 0, 1.0)]  # single point
        df = spark.createDataFrame(
            rows, "doc_id long, event_time timestamp, seq long, y double"
        )
        dw = {r["doc_id"]: r["dw"]
              for r in durbin_watson(df, "y", "event_time", "doc_id", "seq").collect()}
        assert dw[1] is None and dw[2] is None   # zero variance / single point
        lb = {r["doc_id"]: r["q_stat"]
              for r in ljung_box(df, "y", 2, "event_time", "doc_id", "seq").collect()}
        assert lb[1] is None and lb[2] is None

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.tsfeatures import (
            durbin_watson,
            ljung_box,
        )

        _, df = self._df(spark)
        with pytest.raises(DataFrameValidationError):
            durbin_watson(df, "nope")
        with pytest.raises(DataFrameValidationError):
            ljung_box(df, "y", 0)


class TestPacf:
    def test_durbin_levinson_parity_and_ar_cutoff(self, spark):
        import datetime

        import numpy as np

        from temporalscope_spark.operators.tsfeatures import pacf_features

        rng = np.random.RandomState(3)
        rows, series = [], {}
        for uid in range(2):
            x = rng.randn(200)
            if uid == 1:
                for t in range(1, 200):
                    x[t] = 0.6 * x[t - 1] + x[t] * 0.5
            series[uid] = x
            for t in range(200):
                rows.append((uid, datetime.datetime(2024, 1, 1) +
                             datetime.timedelta(hours=t), t, float(x[t])))
        df = spark.createDataFrame(
            rows, "doc_id long, event_time timestamp, seq long, y double"
        )
        got = {r["doc_id"]: r
               for r in pacf_features(df, "y", 3, "event_time", "doc_id",
                                      "seq").collect()}
        for uid, x in series.items():
            xm = x.mean()
            den = ((x - xm) ** 2).sum()
            r1, r2, r3 = [round(float(((x[k:] - xm) * (x[:-k] - xm)).sum()
                                      / den), 6) for k in (1, 2, 3)]
            p22 = (r2 - r1 * r1) / (1 - r1 * r1)
            phi21 = r1 * (1 - r2) / (1 - r1 * r1)
            p33 = (r3 - phi21 * r2 - p22 * r1) / (1 - phi21 * r1 - p22 * r2)
            assert got[uid]["pacf_1"] == pytest.approx(r1, abs=1e-6)
            assert got[uid]["pacf_2"] == pytest.approx(p22, abs=1e-6)
            assert got[uid]["pacf_3"] == pytest.approx(p33, abs=1e-6)
        # AR(1): PACF cuts off after lag 1
        assert got[1]["pacf_1"] > 0.5
        assert abs(got[1]["pacf_2"]) < 0.15 and abs(got[1]["pacf_3"]) < 0.15

    def test_depth_cap_raises(self, spark):
        import datetime

        from temporalscope_spark.operators.tsfeatures import pacf_features

        df = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), 0, 1.0)],
            "doc_id long, event_time timestamp, seq long, y double",
        )
        with pytest.raises(DataFrameValidationError):
            pacf_features(df, "y", 4)
