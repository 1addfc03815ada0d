"""MAD outlier gate, Efraimidis-Spirakis weighted sampling, DoReMi round."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.binning import mad_outliers_grouped
from temporalscope_spark.operators.sampling import doremi_round, weighted_sample


@pytest.fixture(scope="module")
def scored(spark):
    # two groups, values 0..99 plus planted extreme outliers
    rows = [(i, "a", float(i % 100)) for i in range(500)]
    rows += [(1000 + i, "a", 1e6) for i in range(3)]  # far outliers
    rows += [(2000 + i, "b", 50.0 + (i % 5)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, src string, score double")


class TestMadOutliers:
    def test_flags_planted_extremes(self, scored):
        out = mad_outliers_grouped(scored, "score", "src").collect()
        flagged = {r["doc_id"] for r in out if r["score_outlier"]}
        assert {1000, 1001, 1002} <= flagged
        # the bulk 0..99 values are not outliers under MAD
        assert all(d >= 1000 for d in flagged if d < 2000)

    def test_zero_mad_group_flags_nothing(self, spark):
        df = spark.createDataFrame(
            [(i, "c", 7.0) for i in range(10)] + [(99, "c", 1e9)],
            "doc_id long, src string, score double",
        )
        # >half identical -> MAD 0 -> NULL rz, no flags (no rule can rank)
        out = mad_outliers_grouped(df, "score", "src").collect()
        assert all(not r["score_outlier"] for r in out)
        assert all(r["score_rz"] is None for r in out)

    def test_matches_numpy_definition(self, scored):
        rows = [r for r in scored.collect() if r["src"] == "a"]
        vals = sorted(r["score"] for r in rows)
        n = len(vals)
        # type-7 interpolated median, as Spark percentile computes
        def q50(v):
            h = (len(v) - 1) * 0.5
            lo = int(math.floor(h))
            return v[lo] + (h - lo) * (v[lo + 1] - v[lo])
        med = round(q50(vals), 6)
        mad = round(q50(sorted(abs(x - med) for x in vals)), 6)
        out = {r["doc_id"]: r for r in mad_outliers_grouped(scored, "score", "src").collect()
               if r["src"] == "a"}
        some = out[0]
        assert some["score_rz"] == pytest.approx(
            round(0.6745 * (0.0 - med) / mad, 6), abs=1e-6
        )
        assert len(out) == n

    def test_global_mode_and_errors(self, scored):
        assert mad_outliers_grouped(scored, "score").count() == scored.count()
        with pytest.raises(DataFrameValidationError):
            mad_outliers_grouped(scored, "nope")
        with pytest.raises(DataFrameValidationError):
            mad_outliers_grouped(scored, "score", z=0.0)


@pytest.fixture(scope="module")
def weighted(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books")), (F.col("id") % 2 + 1).cast("int")
        ).alias("source"),
        # heavy weights on ids divisible by 40
        F.when(F.col("id") % 40 == 0, 500.0).otherwise(1.0).alias("w"),
    )


class TestWeightedSample:
    def test_partition_invariant(self, weighted):
        a = {r["doc_id"] for r in weighted_sample(weighted, "w", 50, "doc_id", seed=7).collect()}
        b = {r["doc_id"] for r in
             weighted_sample(weighted.repartition(13), "w", 50, "doc_id", seed=7).collect()}
        assert a == b and len(a) == 50

    def test_weight_proportional(self, weighted):
        # 50 heavy rows carry 500/(500*50 + 1*1950) ~ 93% of the mass;
        # a k=50 draw should be dominated by them
        sel = weighted_sample(weighted, "w", 50, "doc_id", seed=3).collect()
        heavy = sum(1 for r in sel if r["doc_id"] % 40 == 0)
        assert heavy >= 35

    def test_per_stratum_k(self, weighted):
        sel = weighted_sample(weighted, "w", 10, "doc_id", strata_col="source").collect()
        per = {}
        for r in sel:
            per[r["source"]] = per.get(r["source"], 0) + 1
        assert per == {"web": 10, "books": 10}

    def test_portable_lane_and_excludes_nonpositive(self, spark):
        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, None), (4, 1.0)], "doc_id long, w double"
        )
        sel = weighted_sample(df, "w", 10, "doc_id", portable=True).collect()
        assert {r["doc_id"] for r in sel} == {1, 4}
        assert all(0.0 <= r["wkey"] <= 1.0 for r in sel)

    def test_errors(self, weighted):
        with pytest.raises(DataFrameValidationError):
            weighted_sample(weighted, "w", 0, "doc_id")
        with pytest.raises(DataFrameValidationError):
            weighted_sample(weighted, "nope", 5, "doc_id")


@pytest.fixture(scope="module")
def losses(spark):
    rows = []
    for i in range(300):
        dom = ["web", "books", "code"][i % 3]
        # web trails the reference by 0.5, books by 0.1, code ahead (clipped)
        excess = {"web": 0.5, "books": 0.1, "code": -0.2}[dom]
        rows.append((i, dom, 2.0 + excess, 2.0))
    return spark.createDataFrame(rows, "ex_id long, domain string, loss double, ref double")


class TestDoremiRound:
    def test_uniform_init_math(self, losses):
        out = {r["domain"]: r for r in
               doremi_round(losses, "domain", "loss", "ref", eta=1.0).collect()}
        lam = {"web": 0.5, "books": 0.1, "code": 0.0}
        z = sum(math.exp(v) / 3 for v in lam.values())
        for d, r in out.items():
            assert r["excess_loss"] == pytest.approx(lam[d], abs=1e-6)
            assert r["weight_in"] == pytest.approx(1 / 3, abs=1e-6)
            assert r["weight_out"] == pytest.approx(
                math.exp(lam[d]) / 3 / z, abs=1e-5
            )
        assert sum(r["weight_out"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)

    def test_smoothing_and_given_weights(self, losses):
        out = {r["domain"]: r for r in doremi_round(
            losses, "domain", "loss", "ref",
            weights={"web": 0.6, "books": 0.3, "code": 0.1},
            eta=2.0, smoothing=0.3,
        ).collect()}
        raw = {"web": 0.6 * math.exp(1.0), "books": 0.3 * math.exp(0.2),
               "code": 0.1}
        z = sum(raw.values())
        for d, r in out.items():
            assert r["mix_alpha"] == pytest.approx(
                0.7 * raw[d] / z + 0.3 / 3, abs=1e-5
            )
        assert sum(r["mix_alpha"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)

    def test_higher_excess_gets_more_weight(self, losses):
        out = {r["domain"]: r["weight_out"] for r in
               doremi_round(losses, "domain", "loss", "ref").collect()}
        assert out["web"] > out["books"] > out["code"]

    def test_errors(self, losses):
        with pytest.raises(DataFrameValidationError):
            doremi_round(losses, "domain", "loss", "ref", eta=0.0)
        with pytest.raises(DataFrameValidationError):
            doremi_round(losses, "domain", "loss", "ref", smoothing=1.5)
        with pytest.raises(DataFrameValidationError):
            doremi_round(losses, "nope", "loss", "ref")
