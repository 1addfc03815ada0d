"""Table diff + FD validation (operators/diffing.py)."""

from __future__ import annotations

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.diffing import fd_violations, table_diff


def _dfs(spark):
    L = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)]
    R = [(1, "a", 10.0), (2, "bb", 20.0), (3, "c", 30.0), (5, "e", 50.0)]
    return (
        spark.createDataFrame(L, "id long, s string, v double"),
        spark.createDataFrame(R, "id long, s string, v double"),
    )


class TestTableDiff:
    def test_counts(self, spark):
        ldf, rdf = _dfs(spark)
        got = {r["column"]: r for r in table_diff(ldf, rdf, "id").collect()}
        rows = got["__rows__"]
        assert (rows["n_left"], rows["n_right"]) == (4, 4)
        assert (rows["n_added"], rows["n_removed"]) == (1, 1)
        assert got["s"]["n_changed"] == 1 and got["s"]["n_unchanged"] == 2
        # NULL -> 30.0 counts as changed; NULL == NULL would not
        assert got["v"]["n_changed"] == 1 and got["v"]["n_unchanged"] == 2

    def test_null_eq_null_unchanged(self, spark):
        ldf = spark.createDataFrame([(1, None)], "id long, v double")
        rdf = spark.createDataFrame([(1, None)], "id long, v double")
        got = {r["column"]: r for r in table_diff(ldf, rdf, "id").collect()}
        assert got["v"]["n_unchanged"] == 1 and got["v"]["n_changed"] == 0

    def test_identical_tables(self, spark):
        ldf, _ = _dfs(spark)
        got = {r["column"]: r for r in table_diff(ldf, ldf, "id").collect()}
        assert got["__rows__"]["n_added"] == 0
        assert got["s"]["n_changed"] == 0 and got["s"]["n_unchanged"] == 4

    def test_duplicate_key_raises(self, spark):
        ldf = spark.createDataFrame([(1, 1.0), (1, 2.0)], "id long, v double")
        rdf = spark.createDataFrame([(1, 1.0)], "id long, v double")
        with pytest.raises(DataFrameValidationError, match="not unique"):
            table_diff(ldf, rdf, "id")

    def test_bad_args(self, spark):
        ldf, rdf = _dfs(spark)
        with pytest.raises(DataFrameValidationError):
            table_diff(ldf, rdf, [])
        with pytest.raises(DataFrameValidationError):
            table_diff(ldf, rdf, "id", compare_cols=["nope"])


class TestFdViolations:
    def _df(self, spark):
        rows = [("x", "p"), ("x", "p"), ("y", "q"), ("y", "r"),
                ("z", None), ("z", None)]
        return spark.createDataFrame(rows, "g string, r string")

    def test_summary(self, spark):
        got = fd_violations(self._df(spark), "g", "r").collect()[0]
        assert got["n_groups"] == 3 and got["n_violating_groups"] == 1
        assert got["n_violating_rows"] == 2 and got["holds"] is False

    def test_holding_fd(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "g string, r int")
        got = fd_violations(df, "g", "r").collect()[0]
        assert got["holds"] is True and got["n_violating_groups"] == 0

    def test_null_is_a_value(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", "x")], "g string, r string"
        )
        got = fd_violations(df, "g", "r").collect()[0]
        assert got["n_violating_groups"] == 1  # NULL vs 'x' = two values

    def test_examples_lane(self, spark):
        got = fd_violations(self._df(spark), "g", "r", max_examples=10).collect()
        assert len(got) == 1 and got[0]["g"] == "y" and got[0]["n_rhs_values"] == 2

    def test_bad_args(self, spark):
        df = self._df(spark)
        with pytest.raises(DataFrameValidationError):
            fd_violations(df, [], "r")
        with pytest.raises(DataFrameValidationError):
            fd_violations(df, "g", "nope")
