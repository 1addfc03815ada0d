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


class TestFsEmRound:
    def _pairs(self, spark, n=4000, seed=6):
        import numpy as np

        rng = np.random.RandomState(seed)
        rows = []
        for _ in range(n):
            match = rng.rand() < 0.1
            na = rng.rand() < (0.95 if match else 0.005)
            ca = rng.rand() < (0.9 if match else 0.03)
            rows.append((bool(na), bool(ca)))
        return rows, spark.createDataFrame(rows, "a_name boolean, a_city boolean")

    def test_one_round_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.linkage import fs_em_round

        rows, df = self._pairs(spark)
        m = {"a_name": 0.8, "a_city": 0.8}
        u = {"a_name": 0.1, "a_city": 0.1}
        out = fs_em_round(df, ["a_name", "a_city"], m, u, 0.05)
        gs = []
        for na, ca in rows:
            r = (m["a_name"] / u["a_name"]) if na else \
                (1 - m["a_name"]) / (1 - u["a_name"])
            r *= (m["a_city"] / u["a_city"]) if ca else \
                 (1 - m["a_city"]) / (1 - u["a_city"])
            gs.append(0.05 * r / (0.05 * r + 0.95))
        gs = np.array(gs)
        na_ = np.array([a for a, _ in rows])
        assert out["m"]["a_name"] == pytest.approx((gs * na_).sum() / gs.sum(), abs=1e-9)
        assert out["p"] == pytest.approx(gs.mean(), abs=1e-9)
        assert out["n_pairs"] == len(rows)

    def test_em_recovers_planted(self, spark):
        from temporalscope_spark.operators.linkage import fs_em_round

        _, df = self._pairs(spark, n=6000)
        params = {"m": {"a_name": 0.8, "a_city": 0.8},
                  "u": {"a_name": 0.1, "a_city": 0.1}, "p": 0.05}
        for _ in range(25):
            params = fs_em_round(
                df, ["a_name", "a_city"], params["m"], params["u"], params["p"]
            )
        assert abs(params["p"] - 0.1) < 0.03
        assert params["m"]["a_name"] > 0.9
        assert params["u"]["a_name"] < 0.03

    def test_null_field_skipped(self, spark):
        from temporalscope_spark.operators.linkage import fs_em_round

        df = spark.createDataFrame(
            [(True, None), (False, None), (True, True)],
            "a_name boolean, a_city boolean",
        )
        out = fs_em_round(df, ["a_name", "a_city"],
                          {"a_name": 0.9, "a_city": 0.9},
                          {"a_name": 0.1, "a_city": 0.1}, 0.5)
        assert out["n_pairs"] == 3        # NULL city rows still count as pairs
        assert 0 < out["m"]["a_city"] < 1  # fitted from the one known row only

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.linkage import fs_em_round

        df = spark.createDataFrame([(True,)], "a boolean")
        with pytest.raises(DataFrameValidationError):
            fs_em_round(df, [], {}, {}, 0.5)
        with pytest.raises(DataFrameValidationError):
            fs_em_round(df, ["a"], {"a": 0.9}, {"a": 0.1}, 1.5)
        with pytest.raises(DataFrameValidationError):
            fs_em_round(df, ["a"], {"a": 1.2}, {"a": 0.1}, 0.5)
