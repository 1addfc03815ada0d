"""Cohort retention and funnel conversion: hand-computed references,
ordering semantics, horizon gating, degenerate inputs."""

from __future__ import annotations

import datetime as dt

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.lifecycle import cohort_retention, funnel_conversion

EPOCH = dt.datetime(1970, 1, 1)


def _ts(day, sec=0):
    return EPOCH + dt.timedelta(days=day, seconds=sec)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user string, ts timestamp, ty string")


class TestCohortRetention:
    def test_hand_matrix(self, spark):
        rows = [
            # cohort day 0: u1 active d0,d1,d2; u2 active d0,d2
            ("u1", _ts(0), "x"), ("u1", _ts(1), "x"), ("u1", _ts(2), "x"),
            ("u2", _ts(0, 5), "x"), ("u2", _ts(2, 5), "x"),
            # cohort day 1: u3 active d1 only
            ("u3", _ts(1, 9), "x"),
        ]
        got = {
            (r["cohort_period"], r["age"]): (r["n_active"], r["retention"])
            for r in cohort_retention(
                _events(spark, rows), "ts", "user", period_seconds=86400
            ).collect()
        }
        assert got[(0, 0)] == (2, 1.0)
        assert got[(0, 1)] == (1, 0.5)
        assert got[(0, 2)] == (2, 1.0)
        assert got[(1, 0)] == (1, 1.0)
        assert (1, 1) not in got

    def test_multiple_events_same_period_count_once(self, spark):
        rows = [("u1", _ts(0, s), "x") for s in range(5)]
        got = cohort_retention(_events(spark, rows), "ts", "user").collect()
        assert len(got) == 1 and got[0]["n_active"] == 1

    def test_bad_period_raises(self, spark):
        with pytest.raises(DataFrameValidationError, match="period_seconds"):
            cohort_retention(_events(spark, []), "ts", "user", period_seconds=0)


class TestFunnelConversion:
    def test_order_matters(self, spark):
        rows = [
            # completes a->b->c in order
            ("u1", _ts(0), "a"), ("u1", _ts(1), "b"), ("u1", _ts(2), "c"),
            # has b BEFORE a, never after: stops at a
            ("u2", _ts(1), "b"), ("u2", _ts(2), "a"),
            # a then c (skips b): stops at a
            ("u3", _ts(0), "a"), ("u3", _ts(1), "c"),
            # never does a: counted nowhere
            ("u4", _ts(0), "b"), ("u4", _ts(1), "c"),
        ]
        got = funnel_conversion(
            _events(spark, rows), "ts", "user", "ty", ["a", "b", "c"]
        ).collect()
        assert [(r["step"], r["n_entities"]) for r in got] == [
            ("a", 3), ("b", 1), ("c", 1)
        ]
        assert got[0]["pct_of_prev"] is None
        assert got[1]["pct_of_first"] == pytest.approx(1 / 3, abs=1e-6)
        assert got[2]["pct_of_prev"] == 1.0

    def test_same_timestamp_counts(self, spark):
        # step-2 at exactly the step-1 time qualifies (>=)
        rows = [("u1", _ts(0), "a"), ("u1", _ts(0), "b")]
        got = funnel_conversion(
            _events(spark, rows), "ts", "user", "ty", ["a", "b"]
        ).collect()
        assert [r["n_entities"] for r in got] == [1, 1]

    def test_horizon_gates(self, spark):
        rows = [
            ("u1", _ts(0), "a"), ("u1", _ts(0, 30), "b"),   # within 60s
            ("u2", _ts(0), "a"), ("u2", _ts(0, 120), "b"),  # outside
        ]
        got = funnel_conversion(
            _events(spark, rows), "ts", "user", "ty", ["a", "b"],
            horizon_seconds=60,
        ).collect()
        assert [r["n_entities"] for r in got] == [2, 1]

    def test_earliest_qualifying_occurrence_chains(self, spark):
        # u1: a@0, b@10, c@5 -> c must be >= b-time (10): not reached;
        # second c@20 reaches
        rows = [
            ("u1", _ts(0, 0), "a"), ("u1", _ts(0, 10), "b"),
            ("u1", _ts(0, 5), "c"), ("u1", _ts(0, 20), "c"),
        ]
        got = funnel_conversion(
            _events(spark, rows), "ts", "user", "ty", ["a", "b", "c"]
        ).collect()
        assert [r["n_entities"] for r in got] == [1, 1, 1]

    def test_validation(self, spark):
        df = _events(spark, [("u", _ts(0), "a")])
        with pytest.raises(DataFrameValidationError, match=">= 2 steps"):
            funnel_conversion(df, "ts", "user", "ty", ["a"])
        with pytest.raises(DataFrameValidationError, match="distinct"):
            funnel_conversion(df, "ts", "user", "ty", ["a", "a"])


class TestSessionPaths:
    def test_hand_paths(self, spark):
        rows = [
            ("u", _ts(0, 0), "a"), ("u", _ts(0, 10), "b"),      # session 1: a>b
            ("u", _ts(1, 0), "c"),                               # session 2: c
            ("v", _ts(0, 0), "a"), ("v", _ts(0, 5), "b"),        # a>b
        ]
        df = spark.createDataFrame(
            [(u, t, i, y) for i, (u, t, y) in enumerate(rows)],
            "user string, ts timestamp, k int, ty string",
        )
        from temporalscope_spark.operators.lifecycle import session_paths

        got = session_paths(
            df, "ts", "user", "ty", gap_seconds=1800, tiebreak_col="k"
        ).collect()
        assert [(r["path"], r["n"]) for r in got] == [("a > b", 2), ("c", 1)]

    def test_max_steps_truncates(self, spark):
        rows = [("u", _ts(0, i), i, t) for i, t in enumerate("abcdef")]
        df = spark.createDataFrame(rows, "user string, ts timestamp, k int, ty string")
        from temporalscope_spark.operators.lifecycle import session_paths

        got = session_paths(
            df, "ts", "user", "ty", gap_seconds=1800, max_steps=3,
            tiebreak_col="k",
        ).collect()
        assert got[0]["path"] == "a > b > c"

    def test_tiebreak_orders_equal_timestamps(self, spark):
        rows = [("u", _ts(0), 2, "b"), ("u", _ts(0), 1, "a")]
        df = spark.createDataFrame(rows, "user string, ts timestamp, k int, ty string")
        from temporalscope_spark.operators.lifecycle import session_paths

        got = session_paths(
            df, "ts", "user", "ty", gap_seconds=60, tiebreak_col="k"
        ).collect()
        assert got[0]["path"] == "a > b"

    def test_k_limits(self, spark):
        rows = [(f"u{i}", _ts(0), i, t) for i, t in enumerate("abcdefgh")]
        df = spark.createDataFrame(rows, "user string, ts timestamp, k int, ty string")
        from temporalscope_spark.operators.lifecycle import session_paths

        got = session_paths(
            df, "ts", "user", "ty", gap_seconds=60, k=3, tiebreak_col="k"
        ).collect()
        assert len(got) == 3
