"""Scalers (operators/scaling.py) and categorical encoders
(operators/encoding.py): numpy/hand parity, fit/transform reuse, null
handling, tie-breaks, and the plan guards that pin the scale shapes
(expression-only transforms, broadcast count joins)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.encoding import (
    NULL_TOKEN,
    count_encode,
    fit_top_categories,
    hash_cross,
    one_hot_top_k,
    rare_collapse,
)
from temporalscope_spark.operators.scaling import fit_scaler, scale_features


@pytest.fixture
def nums(spark):
    rows = [(i, float(i), 7.0) for i in range(1, 101)] + [(101, None, 7.0)]
    return spark.createDataFrame(rows, ["rid", "x", "const"])


@pytest.fixture
def cats(spark):
    # a: 5, b: 3, c: 3, d: 1, NULL: 2  (b/c tie broken by value asc)
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] + [None] * 2
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["rid", "cat"]
    )


class TestScaler:
    def test_zscore_matches_numpy(self, spark, nums):
        x = np.arange(1.0, 101.0)
        model = fit_scaler(nums, ["x"])
        assert model["x"] == (round(float(x.mean()), 6), round(float(x.std(ddof=1)), 6))
        out = scale_features(nums, ["x"], model=model).orderBy("rid").collect()
        want = np.round((x - model["x"][0]) / model["x"][1], 6)
        got = [r["x_scaled"] for r in out]
        assert got[:-1] == pytest.approx(want.tolist(), abs=1e-9)
        assert got[-1] is None  # NULL in, NULL out

    def test_minmax(self, spark, nums):
        out = scale_features(nums, ["x"], method="minmax").orderBy("rid").collect()
        assert out[0]["x_scaled"] == 0.0
        assert out[99]["x_scaled"] == 1.0
        assert out[49]["x_scaled"] == pytest.approx(49 / 99, abs=1e-6)

    def test_robust_matches_numpy(self, spark, nums):
        x = np.arange(1.0, 101.0)
        model = fit_scaler(nums, ["x"], method="robust")
        med = round(float(np.percentile(x, 50, method="linear")), 6)
        iqr = round(
            float(
                np.percentile(x, 75, method="linear")
                - np.percentile(x, 25, method="linear")
            ),
            6,
        )
        assert model["x"] == (med, iqr)

    def test_constant_column_scales_by_one(self, spark, nums):
        model = fit_scaler(nums, ["const"], method="zscore")
        assert model["const"] == (7.0, 1.0)
        out = scale_features(nums, ["const"], model=model).collect()
        assert all(r["const_scaled"] == 0.0 for r in out)

    def test_train_serve_reuse(self, spark, nums):
        train = nums.filter(F.col("rid") <= 50)
        model = fit_scaler(train, ["x"])
        out = scale_features(nums, ["x"], model=model)
        # serve-time rows scale by TRAIN statistics, not their own
        r100 = out.filter(F.col("rid") == 100).collect()[0]["x_scaled"]
        a, b = model["x"]
        assert r100 == pytest.approx(round((100.0 - a) / b, 6), abs=1e-9)

    def test_transform_is_expression_only(self, spark, nums):
        model = fit_scaler(nums, ["x"])
        plan = (
            scale_features(nums, ["x"], model=model)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_errors(self, spark, nums):
        with pytest.raises(DataFrameValidationError):
            fit_scaler(nums, ["x"], method="bogus")
        with pytest.raises(DataFrameValidationError):
            fit_scaler(nums, [])
        with pytest.raises(DataFrameValidationError):
            fit_scaler(nums, ["nope"])
        all_null = nums.select("rid", F.lit(None).cast("double").alias("x"))
        with pytest.raises(DataFrameValidationError):
            fit_scaler(all_null, ["x"])


class TestCountEncode:
    def test_counts_including_null(self, spark, cats):
        out = {r["cat"]: r["cat_count"] for r in count_encode(cats, "cat").collect()}
        assert out["a"] == 5 and out["b"] == 3 and out["d"] == 1
        assert out[None] == 2  # NULL level counted via the sentinel

    def test_normalize(self, spark, cats):
        out = count_encode(cats, "cat", normalize=True).collect()
        a = [r["cat_freq"] for r in out if r["cat"] == "a"][0]
        assert a == pytest.approx(5 / 14, abs=1e-6)

    def test_broadcast_join_shape(self, spark, cats):
        plan = (
            count_encode(cats, "cat")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestTopKOneHot:
    def test_fit_tiebreak(self, spark, cats):
        assert fit_top_categories(cats, "cat", 3) == ["a", "b", "c"]
        # NULL level competes: count 2 beats d's 1
        assert fit_top_categories(cats, "cat", 4) == ["a", "b", "c", NULL_TOKEN]

    def test_indicators(self, spark, cats):
        out = one_hot_top_k(cats, "cat", k=2).orderBy("rid").collect()
        r0 = out[0]  # 'a'
        assert (r0["cat_oh_1"], r0["cat_oh_2"], r0["cat_oh_other"]) == (1, 0, 0)
        r8 = out[8]  # 'c' -> other
        assert (r8["cat_oh_1"], r8["cat_oh_2"], r8["cat_oh_other"]) == (0, 0, 1)

    def test_pre_fit_categories_stable_columns(self, spark, cats):
        out = one_hot_top_k(cats, "cat", categories=["z", "a"])
        assert {"cat_oh_1", "cat_oh_2", "cat_oh_other"} <= set(out.columns)
        rows = out.orderBy("rid").collect()
        assert rows[0]["cat_oh_2"] == 1  # 'a' is rank 2 in the given list

    def test_expression_only(self, spark, cats):
        plan = (
            one_hot_top_k(cats, "cat", categories=["a", "b"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestRareCollapse:
    def test_threshold(self, spark, cats):
        out = {r["rid"]: r["cat_rc"] for r in rare_collapse(cats, "cat", 3).collect()}
        assert out[0] == "a" and out[5] == "b" and out[8] == "c"
        assert out[11] == "__other__"  # d occurs once
        assert out[12] == "__other__"  # NULL level: 2 occurrences < 3

    def test_null_level_can_survive(self, spark, cats):
        out = rare_collapse(cats, "cat", 2).filter(F.col("cat").isNull()).collect()
        assert all(r["cat_rc"] == NULL_TOKEN for r in out)


class TestHashCross:
    def test_portable_md5_replay(self, spark, cats):
        out = hash_cross(cats.withColumn("u", F.col("rid") % 3), ["cat", "u"], 64)
        for r in out.collect():
            key = (r["cat"] if r["cat"] is not None else NULL_TOKEN) + "\x1f" + str(r["u"])
            want = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 64
            assert r["cross_cat_u"] == want

    def test_expression_only_and_range(self, spark, cats):
        df = cats.withColumn("u", F.col("rid") % 3)
        out = hash_cross(df, ["cat", "u"], 8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        vals = [r["cross_cat_u"] for r in out.collect()]
        assert all(0 <= v < 8 for v in vals)

    def test_errors(self, spark, cats):
        with pytest.raises(DataFrameValidationError):
            hash_cross(cats, ["cat"], 8)
        with pytest.raises(DataFrameValidationError):
            hash_cross(cats, ["cat", "nope"], 8)


class TestGroupScale:
    def test_per_group_zscore(self, spark):
        import numpy as np

        from temporalscope_spark.operators.scaling import scale_by_group

        rows = [(i, i % 3, float(i) + (i % 3) * 100) for i in range(30)]
        df = spark.createDataFrame(rows, ["rid", "g", "x"])
        got = {r["rid"]: r["x_gz"] for r in scale_by_group(df, ["x"], "g").collect()}
        xs = {g: np.array([r[2] for r in rows if r[1] == g]) for g in range(3)}
        for rid, g, x in rows:
            m = round(float(xs[g].mean()), 6)
            s = round(float(xs[g].std(ddof=1)), 6)
            assert got[rid] == pytest.approx(round((x - m) / s, 6), abs=1e-9)

    def test_small_and_constant_groups_null(self, spark):
        from temporalscope_spark.operators.scaling import scale_by_group

        rows = [(1, "solo", 5.0), (2, "const", 1.0), (3, "const", 1.0)]
        df = spark.createDataFrame(rows, ["rid", "g", "x"])
        got = {r["rid"]: r["x_gz"] for r in scale_by_group(df, ["x"], "g").collect()}
        assert got[1] is None  # < min_rows
        assert got[2] is None and got[3] is None  # zero variance


class TestMadOutliers:
    def test_flags_planted_outlier(self, spark):
        from temporalscope_spark.operators.scaling import mad_outliers

        rows = [(i, float(i % 7)) for i in range(100)] + [(100, 500.0), (101, None)]
        df = spark.createDataFrame(rows, ["rid", "x"])
        got = {r["rid"]: r for r in mad_outliers(df, "x").collect()}
        assert got[100]["x_is_outlier"] == 1
        assert got[0]["x_is_outlier"] == 0
        assert got[101]["x_mz"] is None

    def test_matches_numpy(self, spark):
        import numpy as np

        from temporalscope_spark.operators.scaling import mad_outliers

        vals = [float(v) for v in np.linspace(0, 10, 51)]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["rid", "x"])
        x = np.array(vals)
        med = round(float(np.median(x)), 6)
        mad = round(float(np.median(np.abs(x - med))), 6)
        got = {r["rid"]: r["x_mz"] for r in mad_outliers(df, "x").collect()}
        for i, v in enumerate(vals):
            assert got[i] == pytest.approx(round(0.6745 * (v - med) / mad, 6), abs=1e-9)

    def test_zero_mad_null(self, spark):
        from temporalscope_spark.operators.scaling import mad_outliers

        df = spark.createDataFrame([(i, 3.0) for i in range(10)], ["rid", "x"])
        out = mad_outliers(df, "x").collect()
        assert all(r["x_mz"] is None and r["x_is_outlier"] is None for r in out)


class TestTargetEncodeOOF:
    def test_no_self_leakage_hand_check(self, spark):
        import hashlib

        from temporalscope_spark.operators.encoding import target_encode_oof

        rows = [(i, "a" if i < 12 else "b", float(i % 2)) for i in range(20)]
        df = spark.createDataFrame(rows, ["rid", "cat", "y"])
        out = {r["rid"]: r for r in
               target_encode_oof(df, "cat", "y", "rid", n_folds=3, smoothing=2.0).collect()}
        prior = round(sum(r[2] for r in rows) / 20, 6)
        # hand-replay: md5 fold, OOF m-estimate
        folds = {i: int(hashlib.md5(f"{i}\x1f0".encode()).hexdigest()[:8], 16) % 3
                 for i, _, _ in rows}
        for i, c, y in rows:
            mine = folds[i]
            s_c = sum(r[2] for r in rows if r[1] == c)
            n_c = sum(1 for r in rows if r[1] == c)
            s_f = sum(r[2] for r in rows if r[1] == c and folds[r[0]] == mine)
            n_f = sum(1 for r in rows if r[1] == c and folds[r[0]] == mine)
            want = round((s_c - s_f + 2.0 * prior) / (n_c - n_f + 2.0), 6)
            assert out[i]["cat_te"] == pytest.approx(want, abs=1e-9), i
            assert out[i]["cat_te_fold"] == mine

    def test_unseen_in_other_folds_falls_to_prior_side(self, spark):
        from temporalscope_spark.operators.encoding import target_encode_oof

        # a category entirely inside one fold: OOF stats empty -> encoding
        # is pulled to the prior (m·prior / m)
        rows = [(i, "common", 1.0) for i in range(30)] + [(1000, "rare", 0.0)]
        df = spark.createDataFrame(rows, ["rid", "cat", "y"])
        out = {r["rid"]: r["cat_te"] for r in
               target_encode_oof(df, "cat", "y", "rid", n_folds=5, smoothing=10.0).collect()}
        prior = round(30 / 31, 6)
        assert out[1000] == pytest.approx(round(prior, 6), abs=1e-5)

    def test_errors(self, spark):
        from temporalscope_spark.operators.encoding import target_encode_oof

        df = spark.createDataFrame([(1, "a", 1.0)], ["rid", "cat", "y"])
        with pytest.raises(DataFrameValidationError):
            target_encode_oof(df, "cat", "y", "rid", n_folds=1)
        with pytest.raises(DataFrameValidationError):
            target_encode_oof(df, "nope", "y", "rid")
