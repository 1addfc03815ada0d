"""k-center greedy coreset: farthest-point reference parity, coverage
property, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.coreset import kcenter_select


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ref_greedy(vecs, k, seed_id):
    sel = [seed_id]
    mind = ((vecs - vecs[seed_id]) ** 2).sum(axis=1)
    dists = [0.0]
    for _ in range(k - 1):
        cand = [
            (-round(mind[i], 6), i) for i in range(len(vecs)) if i not in sel
        ]
        if not cand:
            break
        d, i = min(cand)
        sel.append(i)
        dists.append(-d)
        mind = np.minimum(mind, ((vecs - vecs[i]) ** 2).sum(axis=1))
    return sel, dists


class TestKCenter:
    def test_reference_parity(self, spark):
        rng = np.random.RandomState(4)
        vecs = rng.randn(40, 6).astype("float32").astype("float64")
        df = _df(spark, vecs)
        got = kcenter_select(df, k=6, seed=7).collect()
        seed_id = got[0]["vec_id"]
        sel, dists = _ref_greedy(vecs, 6, seed_id)
        assert [r["vec_id"] for r in got] == sel
        for r, d in zip(got, dists):
            assert r["min_dist"] == pytest.approx(d, abs=1e-6)

    def test_blobs_one_center_each(self, spark):
        rng = np.random.RandomState(2)
        centers = rng.randn(4, 6) * 20
        vecs = np.vstack([c + 0.01 * rng.randn(25, 6) for c in centers])
        df = _df(spark, vecs)
        got = [r["vec_id"] for r in kcenter_select(df, k=4).collect()]
        # greedy k-center on 4 far blobs picks one point per blob
        assert sorted(i // 25 for i in got) == [0, 1, 2, 3]

    def test_coverage_radius_decreases(self, spark):
        rng = np.random.RandomState(8)
        vecs = rng.randn(60, 4)
        df = _df(spark, vecs)
        d4 = kcenter_select(df, k=4).collect()[-1]["min_dist"]
        d12 = kcenter_select(df, k=12).collect()[-1]["min_dist"]
        assert d12 <= d4

    def test_k_exceeds_corpus(self, spark):
        vecs = np.eye(3)
        got = kcenter_select(_df(spark, vecs), k=10).collect()
        assert len(got) == 3

    def test_errors(self, spark):
        df = _df(spark, np.eye(2))
        with pytest.raises(DataFrameValidationError):
            kcenter_select(df, k=0)
        with pytest.raises(DataFrameValidationError):
            kcenter_select(df, k=2, vec_col="nope")
        with pytest.raises(DataFrameValidationError):
            kcenter_select(df.limit(0), k=1)
