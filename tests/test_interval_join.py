"""Bucketed interval-overlap join (operators/asof.py): randomized parity
vs the quadratic reference, half-open semantics, chunk-size invariance,
dedup correctness for long intervals, and the no-cartesian plan check."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.asof import interval_overlap_join


def _ref_pairs(L, R, keyed=True):
    return sorted(
        (l[0], r[0])
        for l in L
        for r in R
        if (not keyed or l[1] == r[1]) and l[2] < r[3] and r[2] < l[3]
    )


def _dfs(spark, L, R):
    ldf = spark.createDataFrame(L, "lid long, k string, lo double, hi double")
    rdf = spark.createDataFrame(R, "rid long, k string, lo double, hi double")
    return ldf, rdf


class TestIntervalOverlapJoin:
    def test_randomized_parity_multiple_chunks(self, spark):
        rng = np.random.RandomState(13)
        L, R = [], []
        for i in range(120):
            lo = float(rng.uniform(0, 500))
            L.append((i, "k%d" % (i % 3), lo, lo + float(rng.uniform(0.1, 80))))
        for j in range(120):
            lo = float(rng.uniform(0, 500))
            R.append((1000 + j, "k%d" % (j % 3), lo, lo + float(rng.uniform(0.1, 80))))
        ldf, rdf = _dfs(spark, L, R)
        ref = _ref_pairs(L, R)
        for chunk in (7.0, 33.0, 1000.0):   # result must not depend on chunk
            out = interval_overlap_join(ldf, rdf, "lo", "hi", on="k", chunk=chunk)
            got = sorted((r["lid"], r["rid"]) for r in out.collect())
            assert got == ref, f"chunk={chunk}"

    def test_unkeyed_and_exact_once(self, spark):
        # long intervals share many chunks: every pair must appear exactly once
        L = [(1, "x", 0.0, 400.0), (2, "x", 100.0, 101.0)]
        R = [(10, "y", 50.0, 350.0), (11, "y", 399.0, 500.0)]
        ldf, rdf = _dfs(spark, L, R)
        out = interval_overlap_join(ldf, rdf, "lo", "hi", on=None, chunk=10.0)
        got = sorted((r["lid"], r["rid"]) for r in out.collect())
        assert got == _ref_pairs(L, R, keyed=False)
        assert len(got) == len(set(got))

    def test_half_open_touching_no_match(self, spark):
        L = [(1, "k", 0.0, 10.0)]
        R = [(2, "k", 10.0, 20.0), (3, "k", 9.999999, 20.0)]
        ldf, rdf = _dfs(spark, L, R)
        got = sorted(
            r["rid"]
            for r in interval_overlap_join(ldf, rdf, "lo", "hi", on="k", chunk=5.0).collect()
        )
        assert got == [3]   # touching endpoints don't overlap; interior does

    def test_timestamp_columns(self, spark):
        t0 = datetime.datetime(2024, 1, 1)

        def ts(h):
            return t0 + datetime.timedelta(hours=h)

        L = [(1, ts(0), ts(5)), (2, ts(10), ts(12))]
        R = [(7, ts(4), ts(11))]
        ldf = spark.createDataFrame(L, "lid long, lo timestamp, hi timestamp")
        rdf = spark.createDataFrame(R, "rid long, lo timestamp, hi timestamp")
        out = interval_overlap_join(ldf, rdf, "lo", "hi", chunk=3600.0)
        assert sorted((r["lid"], r["rid"]) for r in out.collect()) == [(1, 7), (2, 7)]

    def test_empty_intervals_match_nothing(self, spark):
        L = [(1, "k", 5.0, 5.0)]     # empty [5,5)
        R = [(2, "k", 0.0, 10.0)]
        ldf, rdf = _dfs(spark, L, R)
        assert interval_overlap_join(ldf, rdf, "lo", "hi", on="k").count() == 0

    def test_no_cartesian_in_plan(self, spark):
        L = [(i, "k", float(i), float(i) + 1.0) for i in range(20)]
        ldf, rdf = _dfs(spark, L, L)
        plan = interval_overlap_join(
            ldf, rdf.withColumnRenamed("lid", "rid"), "lo", "hi", on="k", chunk=2.0
        )._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    def test_max_chunks_guard(self, spark):
        L = [(1, "k", 0.0, 1e6)]
        ldf, rdf = _dfs(spark, L, L)
        with pytest.raises(Exception, match="max_chunks"):
            interval_overlap_join(
                ldf, rdf, "lo", "hi", on="k", chunk=1.0, max_chunks=100
            ).count()

    def test_bad_args(self, spark):
        L = [(1, "k", 0.0, 1.0)]
        ldf, rdf = _dfs(spark, L, L)
        with pytest.raises(DataFrameValidationError):
            interval_overlap_join(ldf, rdf, "nope", "hi")
        with pytest.raises(DataFrameValidationError):
            interval_overlap_join(ldf, rdf, "lo", "hi", chunk=0.0)
