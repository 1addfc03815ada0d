"""Resample, linear interpolation, entity split."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.cv import entity_split
from temporalscope_spark.operators.resample import interpolate_linear, resample


@pytest.fixture(scope="module")
def series(spark):
    # 2 entities, irregular integer times, some null values
    rows = []
    for u in ("a", "b"):
        t = 0
        for i in range(30):
            t += 3 + (i * 7) % 5
            v = None if i % 5 == 2 else float(i + (10 if u == "b" else 0))
            rows.append((u, t, v))
    return spark.createDataFrame(rows, "uid string, t long, v double")


class TestResample:
    def test_bucket_aggregates(self, series):
        out = resample(
            series, "t", step_seconds=20,
            value_aggs={"v": ("count", "avg", "min", "max", "first", "last")},
            id_col="uid",
        ).toPandas()
        pdf = series.toPandas()
        pdf["bucket_start"] = (pdf["t"] // 20) * 20.0
        for _, r in out.iterrows():
            grp = pdf[(pdf["uid"] == r["uid"]) & (pdf["bucket_start"] == r["bucket_start"])]
            assert r["n_rows"] == len(grp)
            vals = grp["v"].dropna()
            assert r["v_count"] == len(vals)
            if len(vals):
                assert abs(r["v_avg"] - vals.mean()) < 1e-9
                assert r["v_min"] == vals.min() and r["v_max"] == vals.max()
                # first/last are time-ordered over non-null values
                assert r["v_first"] == grp.dropna(subset=["v"]).sort_values("t")["v"].iloc[0]
                assert r["v_last"] == grp.dropna(subset=["v"]).sort_values("t")["v"].iloc[-1]

    def test_buckets_partition_time(self, series):
        out = resample(series, "t", 20, {"v": ("count",)}, id_col="uid")
        total = out.agg(F.sum("n_rows")).first()[0]
        assert total == series.count()

    def test_origin_shift(self, series):
        out = resample(series, "t", 20, {"v": ("count",)}, id_col="uid", origin=5.0)
        starts = {r["bucket_start"] for r in out.collect()}
        assert all((s - 5.0) % 20 == 0 for s in starts)

    def test_errors(self, series):
        with pytest.raises(DataFrameValidationError, match="step_seconds"):
            resample(series, "t", 0, {"v": ("count",)})
        with pytest.raises(DataFrameValidationError, match="Unsupported aggs"):
            resample(series, "t", 20, {"v": ("median",)})


class TestInterpolate:
    def _expected(self, pdf):
        out = []
        for _, r in pdf.iterrows():
            if not math.isnan(r["v"]):
                out.append(r["v"])
                continue
            ent = pdf[pdf["uid"] == r["uid"]]
            before = ent[(ent["t"] < r["t"]) & ent["v"].notna()]
            after = ent[(ent["t"] > r["t"]) & ent["v"].notna()]
            if len(before) and len(after):
                p, n = before.iloc[-1], after.iloc[0]
                out.append(p["v"] + (n["v"] - p["v"]) * (r["t"] - p["t"]) / (n["t"] - p["t"]))
            else:
                out.append(float("nan"))
        return out

    def test_matches_bruteforce(self, series):
        got = (
            interpolate_linear(series, "t", "v", id_col="uid")
            .toPandas().sort_values(["uid", "t"]).reset_index(drop=True)
        )
        pdf = series.toPandas().sort_values(["uid", "t"]).reset_index(drop=True)
        want = self._expected(pdf)
        for g, w in zip(got["v_interp"], want):
            if math.isnan(w):
                assert g is None or math.isnan(g)
            else:
                assert abs(g - w) < 1e-9

    def test_non_null_rows_unchanged(self, series):
        got = interpolate_linear(series, "t", "v", id_col="uid")
        assert got.filter(
            F.col("v").isNotNull() & (F.col("v") != F.col("v_interp"))
        ).count() == 0

    def test_nearest_extrapolation(self, spark):
        df = spark.createDataFrame(
            [("a", 1, None), ("a", 2, 5.0), ("a", 3, None)], "uid string, t long, v double"
        )
        got = {r["t"]: r["v_interp"] for r in
               interpolate_linear(df, "t", "v", id_col="uid", extrapolate="nearest").collect()}
        assert got == {1: 5.0, 2: 5.0, 3: 5.0}

    def test_single_exchange(self, series):
        out = interpolate_linear(series, "t", "v", id_col="uid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1


class TestEntitySplit:
    def test_entity_atomic(self, series):
        out = entity_split(series, "uid", test_frac=0.5, seed=1)
        mixed = out.groupBy("uid").agg(F.count_distinct("split").alias("k")).filter("k > 1")
        assert mixed.count() == 0

    def test_deterministic_and_partition_invariant(self, series):
        a = entity_split(series, "uid", 0.5, seed=1).toPandas()
        b = entity_split(series.repartition(7), "uid", 0.5, seed=1).toPandas()
        am = dict(zip(a["uid"] + a["t"].astype(str), a["split"]))
        bm = dict(zip(b["uid"] + b["t"].astype(str), b["split"]))
        assert am == bm

    def test_fraction_roughly_respected(self, spark):
        ids = spark.range(2000).select(F.col("id").cast("string").alias("uid"))
        out = entity_split(ids, "uid", 0.3, seed=7)
        frac = out.filter("split = 'test'").count() / 2000
        assert 0.25 < frac < 0.35

    def test_bad_frac(self, series):
        with pytest.raises(DataFrameValidationError, match="test_frac"):
            entity_split(series, "uid", 1.5)


class TestReviewRegressions:
    def test_fractional_step_edge_exact(self, spark):
        """t exactly on a bucket edge with a non-binary step must open the
        new bucket (review finding: double division put 0.3 into [0.2,0.3))."""
        df = spark.createDataFrame([("a", 0.3, 1.0)], "uid string, t double, v double")
        out = resample(df, "t", step_seconds=0.1, value_aggs={"v": ("count",)},
                       id_col="uid").collect()
        assert abs(out[0]["bucket_start"] - 0.3) < 1e-12

    def test_interpolate_same_instant_neighbors(self, spark):
        """Three-way timestamp tie (dup gate bypassed): the neighbor lookups
        are order-dependent among ties, but the result must never crash and
        never extrapolate outside the two observed values — the x/0 path now
        falls back to the neighbor midpoint instead of silently NULL."""
        df = spark.createDataFrame(
            [("a", 2, 5.0), ("a", 2, None), ("a", 2, 7.0)],
            "uid string, t long, v double",
        )
        got = [r["v_interp"] for r in
               interpolate_linear(df, "t", "v", id_col="uid").collect()
               if r["v"] is None]
        assert len(got) == 1
        assert got[0] is None or 5.0 <= got[0] <= 7.0

    def test_pack_greedy_null_tokens(self, spark):
        from temporalscope_spark.operators.packing import pack_greedy

        df = spark.createDataFrame(
            [("d", 0, [1, 2]), ("d", 1, None), ("d", 2, [3])],
            "doc_id string, seq_idx int, tokens array<int>",
        )
        out = pack_greedy(df, bin_tokens=8).collect()
        assert sum(r["n_tok"] for r in out) == 3  # NULL treated as empty, no crash
