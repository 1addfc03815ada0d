"""Attribution (first/last touch) and RFM features: hand-computed
references, tie determinism, window gating, score binning."""

from __future__ import annotations

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.attribution import attribution
from temporalscope_spark.operators.tsfeatures import rfm_features


def _ev(spark, rows):
    return spark.createDataFrame(rows, "eid long, user string, ts double, ty string")


ROWS = [
    (1, "u1", 10.0, "ad"),
    (2, "u1", 20.0, "email"),
    (3, "u1", 30.0, "buy"),
    (4, "u1", 40.0, "ad"),
    (5, "u1", 50.0, "buy"),
    (6, "u2", 5.0, "buy"),       # no touch at all
    (7, "u3", 8.0, "ad"),
    (8, "u3", 8.0, "email"),     # same-timestamp tie -> greater eid wins
    (9, "u3", 9.0, "buy"),
]


class TestAttribution:
    def _run(self, spark, model, window=None):
        df = _ev(spark, ROWS)
        return {
            r["conversion_id"]: r
            for r in attribution(
                df, "ts", "user", "ty", ["buy"], ["ad", "email"],
                tiebreak_col="eid", window_seconds=window, model=model,
            ).collect()
        }

    def test_last_touch(self, spark):
        got = self._run(spark, "last")
        assert got[3]["attr_id"] == 2 and got[3]["attr_type"] == "email"
        assert got[5]["attr_id"] == 4 and got[5]["gap_seconds"] == 10.0
        assert got[6]["attr_id"] is None
        assert got[9]["attr_id"] == 8  # tie at t=8 -> max eid

    def test_last_touch_window_gates(self, spark):
        got = self._run(spark, "last", window=12.0)
        assert got[3]["attr_id"] == 2      # gap 10 <= 12
        assert got[5]["attr_id"] == 4      # gap 10
        assert got[9]["attr_id"] == 8      # gap 1
        got5 = self._run(spark, "last", window=5.0)
        assert got5[3]["attr_id"] is None  # nearest touch gap 10 > 5

    def test_first_touch_in_window(self, spark):
        got = self._run(spark, "first", window=25.0)
        # conv@30: window [5, 30] -> earliest touch is ad@10
        assert got[3]["attr_id"] == 1 and got[3]["gap_seconds"] == 20.0
        # conv@50: window [25, 50] -> ad@40
        assert got[5]["attr_id"] == 4
        assert got[6]["attr_id"] is None
        assert got[9]["attr_id"] == 8

    def test_first_requires_window(self, spark):
        with pytest.raises(DataFrameValidationError, match="window_seconds"):
            attribution(
                _ev(spark, ROWS), "ts", "user", "ty", ["buy"], ["ad"],
                tiebreak_col="eid", model="first",
            )

    def test_overlapping_types_raise(self, spark):
        with pytest.raises(DataFrameValidationError, match="disjoint"):
            attribution(
                _ev(spark, ROWS), "ts", "user", "ty", ["buy"], ["buy", "ad"],
                tiebreak_col="eid",
            )


class TestRFM:
    def test_hand_values(self, spark):
        rows = []
        # u1: 3 events, last at t=100, total value 30
        rows += [(1, "u1", 50.0, 10.0), (2, "u1", 80.0, 5.0), (3, "u1", 100.0, 15.0)]
        # u2: 1 event at t=10, value 1
        rows += [(4, "u2", 10.0, 1.0)]
        # u3: 2 events, last t=90, values null
        rows += [(5, "u3", 60.0, None), (6, "u3", 90.0, None)]
        df = spark.createDataFrame(rows, "eid long, user string, ts double, v double")
        got = {r["id"]: r for r in
               rfm_features(df, "ts", "user", "v", n_bins=2).collect()}
        assert got["u1"]["recency_s"] == 0.0  # asof defaults to global max 100
        assert got["u2"]["recency_s"] == 90.0
        assert got["u3"]["monetary"] == 0.0
        assert got["u1"]["frequency"] == 3
        # most recent, most frequent, highest spend -> all top scores
        assert (got["u1"]["r_score"], got["u1"]["f_score"], got["u1"]["m_score"]) == (2, 2, 2)
        # least recent, least frequent, lowest spend -> all bottom
        assert (got["u2"]["r_score"], got["u2"]["f_score"], got["u2"]["m_score"]) == (1, 1, 1)

    def test_explicit_asof(self, spark):
        df = spark.createDataFrame(
            [(1, "u", 10.0, 2.0)], "eid long, user string, ts double, v double"
        )
        r = rfm_features(df, "ts", "user", "v", asof=110.0).collect()[0]
        assert r["recency_s"] == 100.0

    def test_scores_in_range(self, spark):
        rows = [(i, f"u{i % 7}", float(i), float(i % 13)) for i in range(200)]
        df = spark.createDataFrame(rows, "eid long, user string, ts double, v double")
        for r in rfm_features(df, "ts", "user", "v", n_bins=5).collect():
            for k in ("r_score", "f_score", "m_score"):
                assert 1 <= r[k] <= 5

    def test_bad_bins_raise(self, spark):
        df = spark.createDataFrame([(1, "u", 1.0, 1.0)],
                                   "eid long, user string, ts double, v double")
        with pytest.raises(DataFrameValidationError, match="n_bins"):
            rfm_features(df, "ts", "user", "v", n_bins=1)
