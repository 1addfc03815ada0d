"""SCD Type-2 history builder (operators/scd.py)."""

from __future__ import annotations

import datetime

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.scd import scd2_history

T0 = datetime.datetime(2024, 1, 1)


def _ts(d):
    return T0 + datetime.timedelta(days=d)


def _df(spark):
    rows = [
        (1, _ts(0), 0, "gold", "NY"),
        (1, _ts(1), 1, "gold", "NY"),
        (1, _ts(2), 2, "plat", "NY"),
        (1, _ts(5), 3, "plat", "SF"),
        (2, _ts(0), 4, "free", None),
        (2, _ts(3), 5, "free", None),
        (2, _ts(4), 6, "gold", "LA"),
    ]
    return spark.createDataFrame(
        rows, "uid long, ts timestamp, seq long, tier string, city string"
    )


class TestScd2:
    def test_collapse_and_intervals(self, spark):
        out = scd2_history(_df(spark), "uid", "ts", ["tier", "city"],
                           order_col="seq").orderBy("uid", "valid_from").collect()
        got = [(r["uid"], r["tier"], r["city"], r["valid_from"], r["valid_to"],
                r["is_current"], r["n_rows"]) for r in out]
        assert got == [
            (1, "gold", "NY", _ts(0), _ts(2), False, 2),
            (1, "plat", "NY", _ts(2), _ts(5), False, 1),
            (1, "plat", "SF", _ts(5), None, True, 1),
            (2, "free", None, _ts(0), _ts(4), False, 2),   # NULL==NULL collapses
            (2, "gold", "LA", _ts(4), None, True, 1),
        ]

    def test_intervals_tile_without_gaps(self, spark):
        out = scd2_history(_df(spark), "uid", "ts", ["tier"], order_col="seq")
        rows = sorted(out.collect(), key=lambda r: (r["uid"], r["valid_from"]))
        for a, b in zip(rows, rows[1:]):
            if a["uid"] == b["uid"]:
                assert a["valid_to"] == b["valid_from"]
        assert sum(r["is_current"] for r in rows) == 2  # one current row per key

    def test_flapping_value_reopens_interval(self, spark):
        rows = [(1, _ts(i), i, v) for i, v in enumerate(["a", "b", "a"])]
        df = spark.createDataFrame(rows, "uid long, ts timestamp, seq long, v string")
        out = scd2_history(df, "uid", "ts", ["v"], order_col="seq")
        assert out.count() == 3  # a -> b -> a is three versions, not two

    def test_tied_times_without_order_raise(self, spark):
        rows = [(1, _ts(0), 0, "a"), (1, _ts(0), 1, "b")]
        df = spark.createDataFrame(rows, "uid long, ts timestamp, seq long, v string")
        with pytest.raises(Exception, match="order_col"):
            scd2_history(df, "uid", "ts", ["v"]).collect()
        assert scd2_history(df, "uid", "ts", ["v"], order_col="seq").count() == 2

    def test_null_key_raises(self, spark):
        rows = [(None, _ts(0), 0, "a")]
        df = spark.createDataFrame(rows, "uid long, ts timestamp, seq long, v string")
        with pytest.raises(Exception, match="NULL key"):
            scd2_history(df, "uid", "ts", ["v"], order_col="seq").collect()

    def test_partition_invariance(self, spark):
        df = _df(spark)
        a = scd2_history(df, "uid", "ts", ["tier", "city"], order_col="seq")
        b = scd2_history(df.repartition(13), "uid", "ts", ["tier", "city"],
                         order_col="seq")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bad_args(self, spark):
        df = _df(spark)
        with pytest.raises(DataFrameValidationError):
            scd2_history(df, "uid", "ts", [])
        with pytest.raises(DataFrameValidationError):
            scd2_history(df, "uid", "ts", ["nope"])
