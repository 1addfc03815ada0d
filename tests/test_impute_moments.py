"""Imputation (operators/impute.py) and the moment profile
(operators/scaling.py:moment_profile): scipy/numpy parity, fit/transform
reuse, indicator semantics, degenerate columns."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.impute import fit_impute, impute
from temporalscope_spark.operators.scaling import moment_profile


@pytest.fixture
def holey(spark):
    rows = [(i, float(i) if i % 4 else None, float(i * i)) for i in range(1, 41)]
    return spark.createDataFrame(rows, ["rid", "x", "y"])


class TestImpute:
    def test_mean_fill_and_indicator(self, spark, holey):
        xs = [float(i) for i in range(1, 41) if i % 4]
        want = round(float(np.mean(xs)), 6)
        out = {r["rid"]: r for r in impute(holey, ["x"]).collect()}
        assert out[4]["x_filled"] == want and out[4]["x_was_null"] == 1
        assert out[5]["x_filled"] == 5.0 and out[5]["x_was_null"] == 0

    def test_median_fill(self, spark, holey):
        xs = [float(i) for i in range(1, 41) if i % 4]
        want = round(float(np.percentile(xs, 50, method="linear")), 6)
        model = fit_impute(holey, ["x"], strategy="median")
        assert model["x"] == want

    def test_constant_and_no_indicator(self, spark, holey):
        out = impute(
            holey, ["x"], strategy="constant", fill_value=-1.0, add_indicator=False
        )
        assert "x_was_null" not in out.columns
        assert out.filter(F.col("rid") == 4).collect()[0]["x_filled"] == -1.0

    def test_train_serve_reuse(self, spark, holey):
        model = fit_impute(holey.filter(F.col("rid") <= 20), ["x"])
        out = impute(holey, ["x"], model=model)
        fills = {r["rid"]: r["x_filled"] for r in out.collect()}
        xs = [float(i) for i in range(1, 21) if i % 4]
        assert fills[39] == 39.0  # non-null serve row passes through
        assert fills[40] == round(float(np.mean(xs)), 6)  # TRAIN mean

    def test_errors(self, spark, holey):
        with pytest.raises(DataFrameValidationError):
            fit_impute(holey, ["x"], strategy="mode")
        with pytest.raises(DataFrameValidationError):
            fit_impute(holey, ["nope"])
        all_null = holey.select("rid", F.lit(None).cast("double").alias("x"))
        with pytest.raises(DataFrameValidationError):
            fit_impute(all_null, ["x"])


class TestMomentProfile:
    def test_matches_scipy(self, spark, holey):
        try:
            from scipy import stats as sps  # noqa: PLC0415
        except ImportError:
            sps = None
        xs = np.array([float(i * i) for i in range(1, 41)])
        got = {r["column"]: r for r in moment_profile(holey, ["y"]).collect()}
        r = got["y"]
        assert r["n"] == 40
        assert r["mean"] == pytest.approx(round(float(xs.mean()), 6), abs=1e-9)
        assert r["variance"] == pytest.approx(float(xs.var(ddof=1)), rel=1e-9)
        m = xs - xs.mean()
        g1 = float((m**3).mean() / (m**2).mean() ** 1.5)
        g2 = float((m**4).mean() / (m**2).mean() ** 2 - 3)
        assert r["skewness"] == pytest.approx(g1, abs=1e-5)
        assert r["kurtosis"] == pytest.approx(g2, abs=1e-5)
        if sps is not None:
            assert r["skewness"] == pytest.approx(float(sps.skew(xs)), abs=1e-5)
            assert r["kurtosis"] == pytest.approx(float(sps.kurtosis(xs)), abs=1e-5)
        assert (r["min"], r["max"]) == (1.0, 1600.0)

    def test_nulls_ignored_and_degenerate(self, spark):
        rows = [(1, 5.0, 2.0), (2, 5.0, None), (3, 5.0, 4.0)]
        df = spark.createDataFrame(rows, ["rid", "c", "x"])
        got = {r["column"]: r for r in moment_profile(df, ["c", "x"]).collect()}
        assert got["c"]["skewness"] is None  # zero variance
        assert got["x"]["n"] == 2 and got["x"]["mean"] == 3.0

    def test_one_aggregation_plan(self, spark, holey):
        plan = (
            moment_profile(holey, ["x", "y"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # all columns' moments come from one aggregate: a single pair of
        # HashAggregate stages (partial + final), one exchange
        assert plan.count("Exchange") <= 1


class TestEcdf:
    def test_matches_cume_dist(self, spark):
        import numpy as np

        from temporalscope_spark.operators.scaling import ecdf_feature

        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, None, 5.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "rid int, x double"
        )
        got = {r["rid"]: r["x_ecdf"] for r in ecdf_feature(df, "x").collect()}
        xs = [v for v in vals if v is not None]
        for i, v in enumerate(vals):
            if v is None:
                assert got[i] is None
            else:
                want = round(sum(1 for u in xs if u <= v) / len(xs), 6)
                assert got[i] == pytest.approx(want, abs=1e-9), (i, v)

    def test_partition_invariance(self, spark):
        from temporalscope_spark.operators.scaling import ecdf_feature

        df = spark.range(500).select(
            F.col("id").alias("rid"), (F.pmod(F.col("id") * 37, F.lit(101))).cast("double").alias("x")
        )
        a = {r["rid"]: r["x_ecdf"] for r in ecdf_feature(df.repartition(1), "x").collect()}
        b = {r["rid"]: r["x_ecdf"] for r in ecdf_feature(df.repartition(8), "x").collect()}
        assert a == b

    def test_no_single_partition_window(self, spark):
        from temporalscope_spark.operators.scaling import ecdf_feature

        df = spark.range(100).select(
            F.col("id").alias("rid"), F.col("id").cast("double").alias("x")
        )
        plan = ecdf_feature(df, "x")._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestPolynomial:
    def test_values_and_names(self, spark):
        from temporalscope_spark.operators.scaling import polynomial_features

        df = spark.createDataFrame([(1, 2.0, 3.0, 4.0)], ["rid", "a", "b", "c"])
        r = polynomial_features(df, ["a", "b", "c"]).collect()[0]
        assert (r["a_pow2"], r["b_pow2"], r["c_pow2"]) == (4.0, 9.0, 16.0)
        assert (r["a_x_b"], r["a_x_c"], r["b_x_c"]) == (6.0, 8.0, 12.0)

    def test_interaction_only_and_null(self, spark):
        from temporalscope_spark.operators.scaling import polynomial_features

        df = spark.createDataFrame([(1, None, 3.0)], "rid int, a double, b double")
        out = polynomial_features(df, ["a", "b"], interaction_only=True)
        assert "a_pow2" not in out.columns
        assert out.collect()[0]["a_x_b"] is None

    def test_errors(self, spark):
        from temporalscope_spark.operators.scaling import polynomial_features

        df = spark.createDataFrame([(1, 2.0)], ["rid", "a"])
        with pytest.raises(DataFrameValidationError):
            polynomial_features(df, ["a"], degree=3)
        with pytest.raises(DataFrameValidationError):
            polynomial_features(df, ["nope"])
