"""DPO pair construction and SSL-prototype pruning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.preference import dpo_pairs
from temporalscope_spark.operators.similarity import prototype_prune, with_ivf_cell


@pytest.fixture(scope="module")
def responses(spark):
    rows = [
        # prompt 1: clear winner/loser
        (1, 10, 0.9), (1, 11, 0.2), (1, 12, 0.5),
        # prompt 2: tie on max reward -> larger id chosen
        (2, 20, 0.8), (2, 21, 0.8), (2, 22, 0.1),
        # prompt 3: single response -> no pair
        (3, 30, 0.7),
        # prompt 4: all equal -> zero margin, dropped
        (4, 40, 0.5), (4, 41, 0.5),
        # prompt 5: small margin
        (5, 50, 0.52), (5, 51, 0.48),
        # prompt 6: null rewards ignored
        (6, 60, None), (6, 61, 0.3), (6, 62, 0.9),
    ]
    return spark.createDataFrame(rows, "prompt_id long, resp_id long, reward double")


class TestDpoPairs:
    def test_basic_pairs(self, responses):
        out = {r["prompt"]: r for r in
               dpo_pairs(responses, "prompt_id", "resp_id", "reward").collect()}
        assert out[1]["chosen"] == 10 and out[1]["rejected"] == 11
        assert out[1]["margin"] == pytest.approx(0.7, abs=1e-6)
        assert 3 not in out and 4 not in out
        assert out[6]["chosen"] == 62 and out[6]["rejected"] == 61

    def test_tie_break_deterministic(self, responses):
        out = {r["prompt"]: r for r in
               dpo_pairs(responses, "prompt_id", "resp_id", "reward").collect()}
        # max side tie: larger resp id wins
        assert out[2]["chosen"] == 21 and out[2]["rejected"] == 22

    def test_min_margin_gate(self, responses):
        out = {r["prompt"] for r in
               dpo_pairs(responses, "prompt_id", "resp_id", "reward",
                         min_margin=0.1).collect()}
        assert 5 not in out and 1 in out

    def test_partition_invariant(self, responses):
        a = sorted(map(tuple, dpo_pairs(responses, "prompt_id", "resp_id", "reward").collect()))
        b = sorted(map(tuple, dpo_pairs(responses.repartition(7), "prompt_id",
                                        "resp_id", "reward").collect()))
        assert a == b

    def test_errors(self, responses):
        with pytest.raises(DataFrameValidationError):
            dpo_pairs(responses, "nope", "resp_id", "reward")
        with pytest.raises(DataFrameValidationError):
            dpo_pairs(responses, "prompt_id", "resp_id", "reward", min_margin=-1)


@pytest.fixture(scope="module")
def vectors(spark):
    # two tight clusters around (1,0) and (0,1) with per-point jitter that
    # grows with index -> prototypicality strictly decreases with index
    rows = []
    for i in range(40):
        eps = 0.01 * i
        rows.append((i, [1.0, eps]))
        rows.append((100 + i, [eps, 1.0]))
    rows.append((999, [0.0, 0.0]))  # zero-norm: NULL proto, always kept
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTS = [[1.0, 0.0], [0.0, 1.0]]


class TestPrototypePrune:
    def test_keeps_hardest_fraction(self, vectors):
        kept = prototype_prune(vectors, CENTS, keep_frac=0.5).collect()
        ids = {r["vec_id"] for r in kept}
        # hardest = largest jitter = HIGHEST indices within each cluster
        assert all(i >= 20 for i in ids if i < 100)
        assert all(i >= 120 for i in ids if 100 <= i < 200)
        assert 999 in ids  # zero-norm always kept
        # ceil(0.5 * 40) = 20 per cell + the null row
        assert len(ids) == 41

    def test_cells_match_ivf_assignment(self, vectors):
        kept = prototype_prune(vectors, CENTS, keep_frac=1.0)
        ref = with_ivf_cell(vectors, CENTS, out_col="cell")
        j = kept.join(ref, "vec_id")
        assert j.filter(F.col("ivf_cell") != F.col("cell")).count() == 0
        assert kept.count() == vectors.count()  # frac=1 keeps everything

    def test_proto_cos_values(self, vectors):
        out = {r["vec_id"]: r["proto_cos"]
               for r in prototype_prune(vectors, CENTS, keep_frac=1.0).collect()}
        # point (1, 0.39): cos to (1,0) = 1/sqrt(1+0.39^2)
        assert out[39] == pytest.approx(round(1 / math.sqrt(1 + 0.39 ** 2), 6), abs=1e-6)
        assert out[999] is None

    def test_approx_lane_close_to_exact(self, vectors):
        exact = {r["vec_id"] for r in prototype_prune(vectors, CENTS, 0.5).collect()}
        approx = {r["vec_id"] for r in
                  prototype_prune(vectors, CENTS, 0.5, exact=False).collect()}
        # boundary may move within sketch error; overlap must dominate
        assert len(exact & approx) >= 0.8 * len(exact)

    def test_partition_invariant(self, vectors):
        a = {r["vec_id"] for r in prototype_prune(vectors, CENTS, 0.4).collect()}
        b = {r["vec_id"] for r in
             prototype_prune(vectors.repartition(9), CENTS, 0.4).collect()}
        assert a == b

    def test_errors(self, vectors):
        with pytest.raises(DataFrameValidationError):
            prototype_prune(vectors, [], 0.5)
        with pytest.raises(DataFrameValidationError):
            prototype_prune(vectors, CENTS, 0.0)
        with pytest.raises(DataFrameValidationError):
            prototype_prune(vectors, CENTS, 0.5, id_col="nope")
