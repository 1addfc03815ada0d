"""Length-bucketed batching and score-based cluster survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.dedup import dedup_cluster_survivors
from temporalscope_spark.operators.packing import (
    batch_padding_stats,
    length_bucket_batches,
)


@pytest.fixture(scope="module")
def seqs(spark):
    # lengths 1..100, shuffled ids so id order != length order
    rows = [((i * 37) % 100, (i % 100) + 1) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


class TestLengthBucketBatches:
    def test_batches_are_length_contiguous(self, seqs):
        out = length_bucket_batches(seqs, "n_tok", 10).collect()
        by_batch = {}
        for r in out:
            by_batch.setdefault(r["batch_id"], []).append(r["n_tok"])
        assert len(by_batch) == 10
        # every batch spans a contiguous length range, disjoint from others
        ranges = sorted((min(v), max(v)) for v in by_batch.values())
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2
        assert all(len(v) == 10 for v in by_batch.values())

    def test_padding_waste_beats_random(self, seqs):
        bucketed = length_bucket_batches(seqs, "n_tok", 10)
        stats = batch_padding_stats(bucketed, "n_tok")
        bw = stats.agg(F.avg("pad_waste")).collect()[0][0]
        # random batching: batch = doc_id div 10 (ids are shuffled vs length)
        rand = seqs.withColumn("batch_id", (F.col("doc_id") / 10).cast("long"))
        rw = batch_padding_stats(rand, "n_tok").agg(F.avg("pad_waste")).collect()[0][0]
        assert bw < rw * 0.5

    def test_partition_invariant(self, seqs):
        a = sorted(map(tuple, length_bucket_batches(seqs, "n_tok", 7).collect()))
        b = sorted(map(tuple, length_bucket_batches(seqs.repartition(9), "n_tok", 7).collect()))
        assert a == b

    def test_last_batch_partial(self, seqs):
        out = length_bucket_batches(seqs, "n_tok", 30)
        sizes = {r["batch_id"]: r["n"] for r in batch_padding_stats(out, "n_tok").collect()}
        assert sorted(sizes.values(), reverse=True) == [30, 30, 30, 10]

    def test_errors(self, seqs):
        with pytest.raises(DataFrameValidationError):
            length_bucket_batches(seqs, "n_tok", 0)
        with pytest.raises(DataFrameValidationError):
            batch_padding_stats(seqs, "n_tok", batch_col="nope")


class TestScoreSurvivors:
    def test_keep_best_score(self, spark):
        docs = spark.createDataFrame(
            [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)],
            "doc_id long, quality double",
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        out = {r["doc_id"]: r["canonical_id"] for r in
               dedup_cluster_survivors(docs, pairs, keep="score",
                                       score_col="quality").collect()}
        # cluster {1,2,3}: best quality is doc 2; unpaired doc 9 keeps itself
        assert out[1] == out[2] == out[3] == 2
        assert out[9] == 9

    def test_score_tie_breaks_by_larger_id(self, spark):
        docs = spark.createDataFrame(
            [(1, 0.5), (2, 0.5)], "doc_id long, quality double"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        out = {r["doc_id"]: r["canonical_id"] for r in
               dedup_cluster_survivors(docs, pairs, keep="score",
                                       score_col="quality").collect()}
        assert out[1] == out[2] == 2

    def test_errors(self, spark):
        docs = spark.createDataFrame([(1, 0.5)], "doc_id long, quality double")
        pairs = spark.createDataFrame([(1, 1)], "id_a long, id_b long")
        with pytest.raises(DataFrameValidationError):
            dedup_cluster_survivors(docs, pairs, keep="score")
        with pytest.raises(DataFrameValidationError):
            dedup_cluster_survivors(docs, pairs, keep="bogus")
