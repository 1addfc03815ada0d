"""Distributed PCA (operators/pca.py): numpy/sklearn-convention parity
for both the column and embedding-array lanes, sign determinism, the
closed-form 2x2 check the driver oracle relies on, and plan guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.pca import (
    fit_pca,
    fit_pca_array,
    pca_project,
    pca_project_array,
)


def _data(n=200, seed=7):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, 3))
    # correlated structure so components are well-separated
    x = np.column_stack([z[:, 0] * 3 + z[:, 1], z[:, 0] - z[:, 1] * 2, z[:, 2] * 0.5])
    return x


def _numpy_model(x, k):
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = []
    for j in order[:k]:
        v = evecs[:, j]
        i = int(np.argmax(np.abs(v)))
        comps.append(v if v[i] >= 0 else -v)
    return mu, np.array(comps), evals[order]


@pytest.fixture
def xdf(spark):
    x = _data()
    return spark.createDataFrame(
        [(i, *map(float, r)) for i, r in enumerate(x)], ["rid", "a", "b", "c"]
    )


class TestColumnsLane:
    def test_matches_numpy(self, spark, xdf):
        x = _data()
        m = fit_pca(xdf, ["a", "b", "c"], k=2)
        mu, comps, evals = _numpy_model(x, 2)
        assert list(m.means) == pytest.approx(mu.tolist(), abs=2e-6)
        for got, want in zip(m.components, comps):
            assert list(got) == pytest.approx(want.tolist(), abs=2e-6)
        assert list(m.eigenvalues) == pytest.approx(evals[:2].tolist(), rel=1e-6)
        assert m.explained_variance_ratio[0] > m.explained_variance_ratio[1]

    def test_projection_matches_numpy(self, spark, xdf):
        x = _data()
        m = fit_pca(xdf, ["a", "b", "c"], k=2)
        out = pca_project(xdf, ["a", "b", "c"], k=2, model=m).orderBy("rid").collect()
        mu = np.array(m.means)
        comps = np.array(m.components)
        want = (x - mu) @ comps.T
        got = np.array([[r["pc_1"], r["pc_2"]] for r in out])
        assert got == pytest.approx(np.round(want, 6), abs=2e-6)

    def test_null_rows_dropped_and_project_null(self, spark, xdf):
        withnull = xdf.union(
            xdf.sparkSession.createDataFrame([(999, None, 1.0, 1.0)], xdf.schema)
        )
        m = fit_pca(withnull, ["a", "b", "c"], k=1)
        m2 = fit_pca(xdf, ["a", "b", "c"], k=1)
        assert m.means == m2.means  # null row excluded from the fit
        r = (
            pca_project(withnull, ["a", "b", "c"], k=1, model=m)
            .filter(F.col("rid") == 999)
            .collect()[0]
        )
        assert r["pc_1"] is None

    def test_projection_is_expression_only(self, spark, xdf):
        m = fit_pca(xdf, ["a", "b", "c"], k=2)
        plan = (
            pca_project(xdf, ["a", "b", "c"], k=2, model=m)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_closed_form_2x2(self, spark, xdf):
        # the driver oracle's closed form: v1 ∝ [cov, λ1 − var_x]
        x = _data()[:, :2]
        m = fit_pca(xdf, ["a", "b"], k=1)
        cov = np.cov(x, rowvar=False, ddof=1)
        a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
        lam1 = ((a + c) + np.sqrt((a - c) ** 2 + 4 * b * b)) / 2
        v = np.array([b, lam1 - a])
        v = v / np.linalg.norm(v)
        i = int(np.argmax(np.abs(v)))
        if v[i] < 0:
            v = -v
        assert list(m.components[0]) == pytest.approx(v.tolist(), abs=2e-6)

    def test_errors(self, spark, xdf):
        with pytest.raises(DataFrameValidationError):
            fit_pca(xdf, ["a"], k=1)
        with pytest.raises(DataFrameValidationError):
            fit_pca(xdf, ["a", "b"], k=3)
        with pytest.raises(DataFrameValidationError):
            fit_pca(xdf, ["a", "nope"], k=1)


class TestArrayLane:
    def test_matches_columns_lane(self, spark, xdf):
        arr = xdf.select("rid", F.array("a", "b", "c").alias("v"))
        m_arr = fit_pca_array(arr, "v", k=2)
        m_col = fit_pca(xdf, ["a", "b", "c"], k=2)
        assert m_arr.means == pytest.approx(m_col.means, abs=1e-6)
        for ga, gc in zip(m_arr.components, m_col.components):
            assert list(ga) == pytest.approx(list(gc), abs=2e-6)
        assert m_arr.n_rows == m_col.n_rows

    def test_array_projection(self, spark, xdf):
        x = _data()
        arr = xdf.select("rid", F.array("a", "b", "c").alias("v"))
        m = fit_pca_array(arr, "v", k=2)
        out = pca_project_array(arr, "v", m, id_cols=["rid"]).orderBy("rid").collect()
        mu = np.array(m.means)
        comps = np.array(m.components)
        want = np.round((x - mu) @ comps.T, 6)
        got = np.array([[r["pc_1"], r["pc_2"]] for r in out])
        assert got == pytest.approx(want, abs=2e-6)

    def test_partition_invariance(self, spark, xdf):
        arr = xdf.select("rid", F.array("a", "b", "c").alias("v"))
        m1 = fit_pca_array(arr.repartition(1), "v", k=1)
        m8 = fit_pca_array(arr.repartition(8), "v", k=1)
        assert m1.means == pytest.approx(m8.means, abs=1e-6)
        assert list(m1.components[0]) == pytest.approx(
            list(m8.components[0]), abs=1e-6
        )

    def test_wrong_length_vectors_dropped(self, spark):
        rows = [(1, [1.0, 2.0]), (2, [2.0, 1.0]), (3, [1.0]), (4, None), (5, [0.0, 3.0])]
        df = spark.createDataFrame(rows, "rid int, v array<double>")
        m = fit_pca_array(df, "v", k=1)
        assert m.n_rows == 3
