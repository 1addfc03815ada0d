"""Deterministic sampling and per-group top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    top_k_per_group,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("web"), F.lit("books"), F.lit("code")),
                     (F.col("id") % 3 + 1).cast("int")).alias("source"),
        (F.col("id") % 97).cast("double").alias("quality"),
    )


class TestDeterministicSample:
    def test_partition_invariant(self, corpus):
        a = {r["doc_id"] for r in deterministic_sample(corpus, 0.3, "doc_id", seed=1).collect()}
        b = {r["doc_id"] for r in deterministic_sample(corpus.repartition(17), 0.3, "doc_id", seed=1).collect()}
        assert a == b and 0.25 < len(a) / 3000 < 0.35

    def test_portable_matches_fraction(self, corpus):
        n = deterministic_sample(corpus, 0.5, "doc_id", seed=2, portable=True).count()
        assert 0.45 < n / 3000 < 0.55

    def test_monotone_in_fraction(self, corpus):
        small = {r["doc_id"] for r in deterministic_sample(corpus, 0.2, "doc_id").collect()}
        big = {r["doc_id"] for r in deterministic_sample(corpus, 0.6, "doc_id").collect()}
        assert small <= big  # nested samples: same hash, larger cutoff

    def test_bad_fraction(self, corpus):
        with pytest.raises(DataFrameValidationError, match="fraction"):
            deterministic_sample(corpus, -0.1, "doc_id")


class TestStratifiedSample:
    def test_per_stratum_rates(self, corpus):
        out = stratified_sample(
            corpus, "source", {"books": 1.0, "web": 0.2}, key_col="doc_id", seed=3
        )
        got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got.get("books") == 1000          # keep all
        assert 120 < got.get("web", 0) < 280     # ~20%
        assert "code" not in got                  # default 0.0


class TestTopKPerGroup:
    def test_topk(self, corpus):
        out = top_k_per_group(corpus, ["source"], "quality", k=5, tie_break="doc_id").toPandas()
        pdf = corpus.toPandas()
        for src, grp in pdf.groupby("source"):
            want = grp.sort_values(["quality", "doc_id"], ascending=[False, True]).head(5)
            got = out[out["source"] == src].sort_values("rank")
            assert list(got["doc_id"]) == list(want["doc_id"])

    def test_group_limit_pushed_below_exchange(self, corpus):
        """Small-k per-group limit must run as WindowGroupLimit (partial
        top-k before the shuffle), not a full per-group sort of everything."""
        out = top_k_per_group(corpus, ["source"], "quality", k=5, tie_break="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_bad_k(self, corpus):
        with pytest.raises(DataFrameValidationError, match="k must be"):
            top_k_per_group(corpus, ["source"], "quality", k=0)
