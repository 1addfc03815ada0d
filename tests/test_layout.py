"""Z-order (Morton) layout keys: hand-computed interleave, quadrant
locality, clamping/NULL/constant-column semantics, range layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.layout import (
    column_bounds,
    zorder_key,
    zorder_layout,
)


def _keys(spark, rows, bits, bounds=None):
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_key(df, ["x", "y"], bits=bits, bounds=bounds)
    return {(r["x"], r["y"]): r["zkey"] for r in out.collect()}


class TestZorderKey:
    def test_hand_computed_interleave(self, spark):
        # bounds (0,3), bits=2: identity scaling. x=2 (10), y=1 (01):
        # pos0=x0=0, pos1=y0=1, pos2=x1=1, pos3=y1=0 -> 0b0110 = 6
        rows = [(0, 0), (3, 3), (2, 1), (1, 2)]
        k = _keys(spark, rows, bits=2)
        assert k[(0, 0)] == 0
        assert k[(3, 3)] == 15
        assert k[(2, 1)] == 6
        assert k[(1, 2)] == 9

    def test_quadrant_locality(self, spark):
        # 4x4 grid, bits=2: the two TOP key bits are the two columns' top
        # bits, so each key quartile is exactly one spatial quadrant
        rows = [(x, y) for x in range(4) for y in range(4)]
        k = _keys(spark, rows, bits=2)
        for (x, y), key in k.items():
            assert (key >= 8) == (y >= 2)
            assert (key % 8 >= 4) == (x >= 2)

    def test_explicit_bounds_clamp(self, spark):
        # values outside the given bounds clamp to the ends
        k = _keys(spark, [(-5, 0), (99, 3)], bits=2, bounds={"x": (0, 3), "y": (0, 3)})
        assert k[(-5, 0)] == 0
        assert k[(99, 3)] == 15

    def test_null_propagates(self, spark):
        df = spark.createDataFrame([(1, None), (2, 3)], "x long, y long")
        out = {r["x"]: r["zkey"] for r in
               zorder_key(df, ["x", "y"], bits=2,
                          bounds={"x": (0, 3), "y": (0, 3)}).collect()}
        assert out[1] is None and out[2] is not None

    def test_constant_column_is_zero_plane(self, spark):
        k = _keys(spark, [(5, 0), (5, 3)], bits=2)
        # x constant -> x bits all 0; key = interleave(0, y)
        assert k[(5, 0)] == 0
        assert k[(5, 3)] == 0b1010

    def test_column_bounds_one_agg(self, spark):
        df = spark.createDataFrame([(1, 10.0), (9, -2.0)], "x long, y double")
        b = column_bounds(df, ["x", "y"])
        assert b == {"x": (1.0, 9.0), "y": (-2.0, 10.0)}

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(DataFrameValidationError):
            zorder_key(df, ["x"])
        with pytest.raises(DataFrameValidationError):
            zorder_key(df, ["x", "y"], bits=32)  # 64 > 62
        with pytest.raises(DataFrameValidationError):
            zorder_key(df, ["x", "nope"])


class TestZorderLayout:
    def test_range_partitions_disjoint(self, spark):
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = zorder_layout(df, ["x", "y"], bits=4, num_partitions=4)
        parts = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(parts) > 1
        for a, b in zip(parts, parts[1:]):
            assert a["hi"] <= b["lo"]

    def test_layout_preserves_rows(self, spark):
        rows = [(x, x * 7 % 13) for x in range(50)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = zorder_layout(df, ["x", "y"], bits=5, num_partitions=3)
        assert sorted((r["x"], r["y"]) for r in out.collect()) == sorted(rows)
