"""Edit-distance similarity join vs brute force: completeness of the
(gram, occurrence) prefix filter and the short-string length-band lane,
repetitive-string edge cases, banded-verify semantics, plan shape."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.edjoin import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        dist = _lev(sa, sb)
        if dist <= d:
            out.add((min(ia, ib), max(ia, ib), dist))
    return out


def _run(spark, rows, d, q=3):
    df = spark.createDataFrame(rows, "id long, text string")
    got = edit_distance_pairs(df, "id", "text", max_dist=d, q=q)
    return {(r["id_a"], r["id_b"], r["dist"]) for r in got.collect()}


class TestEditDistancePairs:
    def test_brute_force_parity_mixed(self, spark):
        # deterministic word salad incl. planted near pairs, lengths that
        # straddle the short/long lane boundary (q=3, d=2 -> min_long 9)
        rows = [
            (1, "the quick brown fox"),
            (2, "the quick brown fix"),      # 1 sub
            (3, "the quick brown foxes"),    # 2 ins
            (4, "a completely different sentence"),
            (5, "short"),                    # short lane
            (6, "shorts"),                   # short, ed 1 to 5
            (7, "shirt"),                    # short, ed 1 to 5
            (8, "abcdefgh"),                 # len 8 < 9: short lane
            (9, "abcdefghi"),                # len 9: long lane, ed 1 to 8
            (10, "the quick brown fox"),     # exact dup of 1
            (11, ""),                        # empty string
            (12, "ab"),                      # ed 2 to empty
        ]
        for d in (0, 1, 2):
            assert _run(spark, rows, d) == _brute([(i, s) for i, s in rows], d)

    def test_repetitive_strings(self, spark):
        # one distinct gram each — the (gram, occurrence) tokens keep the
        # prefix filter complete where distinct-gram sets would not
        rows = [(1, "aaaaaaaaaaaa"), (2, "aaaaaaaaaaa"), (3, "aaaaaaaabaaa"),
                (4, "bbbbbbbbbbbb")]
        for d in (1, 2):
            assert _run(spark, rows, d) == _brute(rows, d)

    def test_nulls_dropped(self, spark):
        rows = [(1, "hello world"), (2, None), (3, "hello world!")]
        assert _run(spark, rows, 1) == {(1, 3, 1)}

    def test_q_variants_agree(self, spark):
        rows = [(i, f"prefix shared {i % 3} suffix tail") for i in range(12)]
        assert _run(spark, rows, 2, q=2) == _run(spark, rows, 2, q=4)

    def test_partition_invariance(self, spark):
        rows = [(i, f"entity number {i // 4} variant {i % 4}") for i in range(24)]
        df = spark.createDataFrame(rows, "id long, text string")
        a = set(map(tuple, edit_distance_pairs(df.repartition(1), max_dist=2,
                                               id_col="id", text_col="text").collect()))
        b = set(map(tuple, edit_distance_pairs(df.repartition(16), max_dist=2,
                                               id_col="id", text_col="text").collect()))
        assert a == b == _brute(rows, 2)

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame([(1, "abcdefghij")], "id long, text string")
        plan = edit_distance_pairs(df)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(DataFrameValidationError):
            edit_distance_pairs(df, max_dist=-1)
        with pytest.raises(DataFrameValidationError):
            edit_distance_pairs(df, q=1)
        with pytest.raises(DataFrameValidationError):
            edit_distance_pairs(df, id_col="nope")
