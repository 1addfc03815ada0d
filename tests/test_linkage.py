"""Fellegi-Sunter record linkage (operators/linkage.py): weight
arithmetic parity, NULL conventions, decision bands, blocking contract."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.linkage import fs_link

CMP = {"name": (0.95, 0.05), "city": (0.9, 0.1)}
WN_A, WN_D = math.log2(0.95 / 0.05), math.log2(0.05 / 0.95)
WC_A, WC_D = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)


def _dfs(spark):
    L = [(1, "b1", "anna", "NYC"), (2, "b1", "bob", None), (3, "b2", "carol", "LA")]
    R = [(10, "b1", "anna", "NYC"), (11, "b1", "anna", "SF"), (12, "b2", "carol", "LA")]
    return (
        spark.createDataFrame(L, "lid long, blk string, name string, city string"),
        spark.createDataFrame(R, "rid long, blk string, name string, city string"),
    )


class TestFsLink:
    def test_weights_and_decisions(self, spark):
        ldf, rdf = _dfs(spark)
        got = {
            (r["lid"], r["rid"]): r
            for r in fs_link(
                ldf, rdf, "blk", CMP, "lid", "rid", lower=1.0, upper=6.0
            ).collect()
        }
        assert got[(1, 10)]["weight"] == pytest.approx(WN_A + WC_A, abs=1e-6)
        assert got[(1, 10)]["decision"] == "link"
        assert got[(1, 11)]["weight"] == pytest.approx(WN_A + WC_D, abs=1e-6)
        assert got[(1, 11)]["decision"] == "possible"
        assert got[(2, 10)]["weight"] == pytest.approx(WN_D, abs=1e-6)  # NULL city: 0
        assert got[(2, 10)]["n_known"] == 1
        assert got[(2, 10)]["decision"] == "non_link"
        # blocking: cross-block pairs never materialize
        assert (3, 10) not in got and (1, 12) not in got

    def test_multi_key_blocking(self, spark):
        ldf, rdf = _dfs(spark)
        ldf2 = ldf.withColumn("blk2", ldf.lid % 2)
        rdf2 = rdf.withColumn("blk2", rdf.rid % 2)
        got = fs_link(ldf2, rdf2, ["blk", "blk2"], CMP, "lid", "rid").collect()
        for r in got:
            assert (r["lid"] % 2) == (r["rid"] % 2)

    def test_bad_args(self, spark):
        ldf, rdf = _dfs(spark)
        with pytest.raises(DataFrameValidationError):
            fs_link(ldf, rdf, "blk", {}, "lid", "rid")
        with pytest.raises(DataFrameValidationError):
            fs_link(ldf, rdf, "blk", {"name": (0.5, 0.6)}, "lid", "rid")  # u > m
        with pytest.raises(DataFrameValidationError):
            fs_link(ldf, rdf, "nope", CMP, "lid", "rid")
        with pytest.raises(DataFrameValidationError):
            fs_link(ldf, rdf, "blk", CMP, "lid", "rid", lower=5.0, upper=1.0)

    def test_planted_linkage_recovers(self, spark):
        import numpy as np

        rng = np.random.RandomState(4)
        names = [f"n{i:03d}" for i in range(200)]
        L = [(i, i % 7, names[i], f"c{i % 31}") for i in range(200)]
        # right = same entities, 20% city corrupted
        R = [
            (1000 + i, i % 7, names[i],
             f"c{(i % 31) + (100 if rng.rand() < 0.2 else 0)}")
            for i in range(200)
        ]
        ldf = spark.createDataFrame(L, "lid long, blk long, name string, city string")
        rdf = spark.createDataFrame(R, "rid long, blk long, name string, city string")
        got = fs_link(
            ldf, rdf, "blk", {"name": (0.98, 1 / 200), "city": (0.9, 1 / 31)},
            "lid", "rid", lower=2.0, upper=6.0,
        )
        links = got.filter(got.decision == "link").collect()
        true_hits = [r for r in links if r["rid"] == r["lid"] + 1000]
        assert len(true_hits) >= 150          # name weight alone crosses upper
        assert all(r["rid"] == r["lid"] + 1000 for r in links)  # no false links
