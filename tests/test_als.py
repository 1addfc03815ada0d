"""ALS matrix factorization (modeling/als.py): numpy replay parity for
the k=2 closed-form lane, general-k pandas lane parity, RMSE descent,
determinism, guards."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling.als import (
    als_half_round,
    als_round,
    als_seed_factors,
)


def _seed_f(idv, k=2, seed=42, scale=0.5):
    out = []
    for j in range(k):
        u = (
            int(hashlib.md5(f"{idv}#{seed}#{j}".encode()).hexdigest()[:15], 16)
            % 10**9
        ) / 1e9
        out.append(scale * (2 * u - 1))
    return np.array(out)


def _ratings():
    return [
        (u, i, float((u * 3 + i * 7) % 5 + 1))
        for u in range(20)
        for i in range(6)
        if (u + i) % 3
    ]


def _numpy_round(ratings, k=2, reg=0.1, seed=42):
    items = sorted(set(i for _, i, _ in ratings))
    users = sorted(set(u for u, _, _ in ratings))
    q = {i: _seed_f(i, k, seed) for i in items}
    p = {}
    for u in users:
        rs = [(i, r) for uu, i, r in ratings if uu == u]
        A = sum(np.outer(q[i], q[i]) for i, _ in rs) + reg * len(rs) * np.eye(k)
        b = sum(r * q[i] for i, r in rs)
        p[u] = np.round(np.linalg.solve(A, b), 6)
    qn = {}
    for i in items:
        rs = [(u, r) for u, ii, r in ratings if ii == i]
        A = sum(np.outer(p[u], p[u]) for u, _ in rs) + reg * len(rs) * np.eye(k)
        b = sum(r * p[u] for u, r in rs)
        qn[i] = np.round(np.linalg.solve(A, b), 6)
    return p, qn, q


class TestAls:
    def test_k2_closed_form_parity(self, spark):
        ratings = _ratings()
        df = spark.createDataFrame(ratings, "u long, i long, r double")
        users, items = als_round(df, "u", "i", "r", k=2, reg=0.1, seed=42)
        p, qn, _ = _numpy_round(ratings)
        su = {int(r["u"]): r["factors"] for r in users.collect()}
        si = {int(r["i"]): r["factors"] for r in items.collect()}
        for u, f in su.items():
            assert np.allclose(f, p[u], atol=2e-6)
        for i, f in si.items():
            assert np.allclose(f, qn[i], atol=2e-6)

    def test_general_k_pandas_lane_parity(self, spark):
        ratings = _ratings()
        df = spark.createDataFrame(ratings, "u long, i long, r double")
        q0 = als_seed_factors(df, "i", k=3, seed=7)
        users = als_half_round(df, q0, "u", "i", "r", k=3, reg=0.2)
        su = {int(r["u"]): r["factors"] for r in users.collect()}
        q = {i: _seed_f(i, 3, 7) for i in set(i for _, i, _ in ratings)}
        for u in set(u for u, _, _ in ratings):
            rs = [(i, r) for uu, i, r in ratings if uu == u]
            A = sum(np.outer(q[i], q[i]) for i, _ in rs) + 0.2 * len(rs) * np.eye(3)
            b = sum(r * q[i] for i, r in rs)
            assert np.allclose(su[u], np.linalg.solve(A, b), atol=2e-6)

    def test_rmse_descends(self, spark):
        ratings = _ratings()
        df = spark.createDataFrame(ratings, "u long, i long, r double")
        users, items = als_round(df, "u", "i", "r", k=2, reg=0.05)
        su = {int(r["u"]): np.array(r["factors"]) for r in users.collect()}
        si = {int(r["i"]): np.array(r["factors"]) for r in items.collect()}
        q0 = {i: _seed_f(i) for i in si}
        rmse0 = np.sqrt(np.mean([(r - su[u] @ q0[i]) ** 2 for u, i, r in ratings]))
        rmse1 = np.sqrt(np.mean([(r - su[u] @ si[i]) ** 2 for u, i, r in ratings]))
        assert rmse1 < rmse0

    def test_seed_factors_deterministic_and_bounded(self, spark):
        df = spark.createDataFrame([(i,) for i in range(50)], "i long")
        a = als_seed_factors(df, "i", k=4, seed=9).collect()
        b = als_seed_factors(df.repartition(7), "i", k=4, seed=9).collect()
        assert sorted(map(tuple, ((r["i"], tuple(r["factors"])) for r in a))) == \
               sorted(map(tuple, ((r["i"], tuple(r["factors"])) for r in b)))
        for r in a:
            assert all(-0.5 <= v <= 0.5 for v in r["factors"])

    def test_null_ratings_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 2.0), (1, 2, None), (2, 1, 3.0)], "u long, i long, r double"
        )
        q0 = als_seed_factors(df, "i", k=2)
        users = als_half_round(df, q0, "u", "i", "r", k=2)
        assert users.count() == 2

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, 1, 2.0)], "u long, i long, r double")
        q0 = als_seed_factors(df, "i", k=2)
        with pytest.raises(DataFrameValidationError):
            als_half_round(df, q0, "u", "i", "r", k=0)
        with pytest.raises(DataFrameValidationError):
            als_half_round(df, q0, "u", "i", "r", reg=-1.0)
        with pytest.raises(DataFrameValidationError):
            als_half_round(df, q0, "nope", "i", "r")
        with pytest.raises(DataFrameValidationError):
            als_seed_factors(df, "i", k=0)
