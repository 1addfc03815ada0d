"""Product quantization: encode/ADC parity with a numpy reference,
Lloyd refinement improving quantization error, error contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.pq import pq_codebooks, pq_encode, pq_topk


def _mk(spark, n=64, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _np_encode(vecs, books):
    m, dsub = len(books), len(books[0][0])
    codes = np.zeros((len(vecs), m), dtype=int)
    for j in range(m):
        sub = vecs[:, j * dsub : (j + 1) * dsub].astype("float64")
        cents = np.array(books[j], dtype="float64")
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    return codes


class TestPQ:
    @pytest.fixture(scope="class")
    def data(self, spark):
        return _mk(spark)

    def test_encode_matches_numpy(self, spark, data):
        df, vecs = data
        books = pq_codebooks(df, dim=8, m=2, ksub=4, seed=1)
        got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
        want = _np_encode(vecs, books)
        for i in range(len(vecs)):
            assert got[i] == list(want[i])

    def test_adc_matches_numpy(self, spark, data):
        df, vecs = data
        books = pq_codebooks(df, dim=8, m=2, ksub=4, seed=1)
        coded = pq_encode(df, books)
        q = [float(x) for x in vecs[0]]
        got = [(r["vec_id"], r["adc"]) for r in pq_topk(coded, q, books, k=5).collect()]
        codes = _np_encode(vecs, books)
        m, dsub = len(books), len(books[0][0])
        lut = np.array(
            [
                [
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(q[j * dsub : (j + 1) * dsub], cent)
                    )
                    for cent in books[j]
                ]
                for j in range(m)
            ]
        )
        adc = np.array([sum(lut[j][codes[i, j]] for j in range(m))
                        for i in range(len(vecs))])
        order = sorted(range(len(vecs)), key=lambda i: (adc[i], i))[:5]
        assert [i for i, _ in got] == order
        for (i, a) in got:
            assert a == pytest.approx(adc[i], abs=1e-9)

    def test_refinement_reduces_error(self, spark):
        # well-separated blobs: Lloyd must not increase total quantization
        # error, and on blobs it should strictly improve over raw seeds
        rng = np.random.RandomState(3)
        centers = rng.randn(4, 8) * 5
        vecs = np.vstack([c + 0.1 * rng.randn(32, 8) for c in centers]).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

        def err(books):
            codes = _np_encode(vecs, books)
            m, dsub = len(books), len(books[0][0])
            tot = 0.0
            for j in range(m):
                cents = np.array(books[j])
                sub = vecs[:, j * dsub : (j + 1) * dsub]
                tot += ((sub - cents[codes[:, j]]) ** 2).sum()
            return tot

        b0 = pq_codebooks(df, dim=8, m=2, ksub=4, seed=5, refine_iters=0)
        b2 = pq_codebooks(df, dim=8, m=2, ksub=4, seed=5, refine_iters=3)
        assert err(b2) < err(b0)

    def test_encode_partition_invariant(self, spark, data):
        df, _ = data
        books = pq_codebooks(df, dim=8, m=4, ksub=4, seed=2)
        a = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(df.repartition(1), books).collect()}
        b = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(df.repartition(13), books).collect()}
        assert a == b

    def test_errors(self, spark, data):
        df, vecs = data
        with pytest.raises(DataFrameValidationError):
            pq_codebooks(df, dim=8, m=3, ksub=4)   # 3 does not divide 8
        with pytest.raises(DataFrameValidationError):
            pq_codebooks(df, dim=8, m=2, ksub=1)
        with pytest.raises(DataFrameValidationError):
            pq_codebooks(df.limit(2), dim=8, m=2, ksub=4)  # too few rows
        books = pq_codebooks(df, dim=8, m=2, ksub=4)
        coded = pq_encode(df, books)
        with pytest.raises(DataFrameValidationError):
            pq_topk(coded, [0.0] * 7, books, k=5)  # wrong query dim
        with pytest.raises(DataFrameValidationError):
            pq_topk(coded, [0.0] * 8, books, k=0)


class TestIVFPQ:
    @pytest.fixture(scope="class")
    def blobs(self, spark):
        # 4 well-separated blobs so cell assignment is unambiguous and
        # residuals are small relative to inter-cell distance
        rng = np.random.RandomState(11)
        centers = rng.randn(4, 8) * 10
        vecs = np.vstack([c + 0.05 * rng.randn(40, 8) for c in centers]).astype(
            "float32"
        )
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return df, vecs

    def test_encode_matches_numpy(self, spark, blobs):
        from temporalscope_spark.operators.pq import ivfpq_encode, ivfpq_train

        df, vecs = blobs
        cells, books = ivfpq_train(df, dim=8, num_cells=4, m=2, ksub=4, seed=3)
        got = {r["vec_id"]: (r["cell"], list(r["codes"]))
               for r in ivfpq_encode(df, cells, books).collect()}
        C = np.array(cells)
        for i, v in enumerate(vecs):
            v64 = v.astype("float64")
            cell = min(range(4), key=lambda c: (((v64 - C[c]) ** 2).sum(), c))
            resid = v64 - C[cell]
            codes = []
            for j in range(2):
                cents = np.array(books[j])
                d = ((resid[j * 4 : (j + 1) * 4][None, :] - cents) ** 2).sum(axis=1)
                codes.append(int(d.argmin()))
            assert got[i] == (cell, codes)

    def test_search_finds_query_blob(self, spark, blobs):
        from temporalscope_spark.operators.pq import (
            ivfpq_encode,
            ivfpq_topk,
            ivfpq_train,
        )

        df, vecs = blobs
        cells, books = ivfpq_train(df, dim=8, num_cells=4, m=2, ksub=4, seed=3)
        coded = ivfpq_encode(df, cells, books)
        q = [float(x) for x in vecs[0]]
        got = [r["vec_id"] for r in
               ivfpq_topk(coded, q, cells, books, k=10, nprobe=1).collect()]
        # nprobe=1 restricts to vec 0's blob: all hits share its cell
        blob_of = {r["vec_id"]: r["cell"] for r in coded.collect()}
        assert len(got) == 10
        assert all(blob_of[i] == blob_of[0] for i in got)

    def test_nprobe_full_covers_all_cells(self, spark, blobs):
        from temporalscope_spark.operators.pq import (
            ivfpq_encode,
            ivfpq_topk,
            ivfpq_train,
        )

        df, vecs = blobs
        cells, books = ivfpq_train(df, dim=8, num_cells=4, m=2, ksub=4, seed=3)
        coded = ivfpq_encode(df, cells, books)
        q = [float(x) for x in vecs[0]]
        out = ivfpq_topk(coded, q, cells, books, k=160, nprobe=4)
        assert out.count() == 160  # every row scored at full probe

    def test_errors(self, spark, blobs):
        from temporalscope_spark.operators.pq import (
            ivfpq_encode,
            ivfpq_topk,
            ivfpq_train,
        )

        df, vecs = blobs
        with pytest.raises(DataFrameValidationError):
            ivfpq_train(df, dim=8, num_cells=0)
        cells, books = ivfpq_train(df, dim=8, num_cells=4, m=2, ksub=4, seed=3)
        coded = ivfpq_encode(df, cells, books)
        q = [0.0] * 8
        with pytest.raises(DataFrameValidationError):
            ivfpq_topk(coded, q, cells, books, nprobe=0)
        with pytest.raises(DataFrameValidationError):
            ivfpq_topk(coded, q, cells, books, nprobe=5)
        with pytest.raises(DataFrameValidationError):
            ivfpq_topk(coded, [0.0] * 7, cells, books)
