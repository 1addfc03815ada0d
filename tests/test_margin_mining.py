"""Margin-based nearest-neighbor pair mining (Artetxe & Schwenk 2019)."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.similarity import margin_mining


@pytest.fixture(scope="module")
def vectors(spark):
    # a tight hub cluster (pairwise cos ~0.9999), a probe vector at
    # moderate cosine to the cluster, and an isolated pair at the SAME
    # moderate cosine in an orthogonal direction: absolute cosine cannot
    # separate probe-into-hub from the isolated pair, margin can — the
    # hub members' top-k neighborhoods are far closer than the probe
    rows = []
    for i in range(5):
        a = 0.01 * i
        rows.append((i, [math.cos(a), math.sin(a), 0.0]))
    probe_a = 0.32  # cos(0.32) ~ 0.949 to hub member 0
    rows.append((50, [math.cos(probe_a), math.sin(probe_a), 0.0]))
    iso_a = 0.32
    rows.append((100, [0.0, 0.0, 1.0]))
    rows.append((101, [0.0, math.sin(iso_a), math.cos(iso_a)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestMarginMining:
    def test_isolated_pair_beats_hub_probe(self, vectors):
        out = margin_mining(
            vectors, knn_k=3, margin_threshold=0.0, candidate_threshold=0.5
        ).collect()
        by_pair = {(r["id_a"], r["id_b"]): r for r in out}
        iso = by_pair[(100, 101)]
        probe = by_pair[(0, 50)]
        # same raw cosine, very different margins: the hub side's top-3
        # neighbors sit at ~0.9999, diluting the probe pair
        assert abs(iso["cosine"] - probe["cosine"]) < 1e-3
        assert iso["margin"] > probe["margin"] + 0.02

    def test_threshold_filters(self, vectors):
        all_pairs = margin_mining(vectors, knn_k=3, margin_threshold=0.0,
                                  candidate_threshold=0.1).count()
        some = margin_mining(vectors, knn_k=3, margin_threshold=1.0,
                             candidate_threshold=0.1).count()
        assert 0 < some < all_pairs

    def test_partition_invariant(self, vectors):
        a = sorted(map(tuple, margin_mining(vectors, knn_k=2, margin_threshold=0.9,
                                            candidate_threshold=0.1).collect()))
        b = sorted(map(tuple, margin_mining(vectors.repartition(5), knn_k=2,
                                            margin_threshold=0.9,
                                            candidate_threshold=0.1).collect()))
        assert a == b and len(a) > 0

    def test_margin_math_two_vectors(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.1])], "vec_id long, embedding array<double>"
        )
        out = margin_mining(df, knn_k=4, margin_threshold=0.0,
                            candidate_threshold=0.0).collect()
        # each side's only neighbor is the other: margin == cos / cos == 1
        assert len(out) == 1 and out[0]["margin"] == pytest.approx(1.0, abs=1e-4)

    def test_errors(self, vectors):
        with pytest.raises(DataFrameValidationError):
            margin_mining(vectors, knn_k=0)
        with pytest.raises(DataFrameValidationError):
            margin_mining(vectors, margin_threshold=0.0 - 1.0)
