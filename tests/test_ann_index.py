"""Persisted IVF ANN index (operators/ann_index.py) — the embedding twin
of DedupIndex: train-once coarse quantizer, batch-sized incremental adds,
file-pruned probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.operators.ann_index import AnnIndex
from temporalscope_spark.operators.similarity import ivf_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _qvec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]


@pytest.mark.slow
def test_incremental_add_equals_one_shot_assignment(spark, emb, tmp_path):
    """create(v0) + add_batch(rest) must answer queries identically to
    assigning the WHOLE corpus under the same (v0-trained) centroids —
    the frozen-quantizer contract."""
    v0 = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    idx = AnnIndex.create(
        str(tmp_path / "ann"), v0, num_centroids=8, seed=7, refine_iters=1
    )
    idx.add_batch(batch)
    qvec = _qvec(emb)
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in idx.topk(spark, qvec, k=5, nprobe=3).collect()
    ]
    want = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(emb, qvec, idx.centroids(), k=5, nprobe=3).collect()
    ]
    assert got == want
    # two commits: the create's index pass + one batch append
    assert idx.rows.current_version() == 2
    assert idx.rows.read(spark).count() == emb.count()


def test_probe_filter_reaches_the_scan(spark, emb, tmp_path):
    """The nprobe cell filter must be PUSHED to the parquet scan (file/
    row-group pruning) — at 100 TB with ivf_cell as a partition field this
    becomes metadata-only partition pruning."""
    idx = AnnIndex.create(
        str(tmp_path / "ann2"), emb, num_centroids=8, seed=7, refine_iters=0
    )
    plan = (
        idx.topk(spark, _qvec(emb), k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(ivf_cell" in plan


def test_quantizer_is_frozen_and_guarded(spark, emb, tmp_path):
    idx = AnnIndex.create(
        str(tmp_path / "ann3"), emb, num_centroids=4, seed=7, refine_iters=0
    )
    with pytest.raises(ValueError, match="already exists"):
        AnnIndex.create(str(tmp_path / "ann3"), emb, num_centroids=4, seed=7)
    # reopening reads the same frozen centroids
    again = AnnIndex(str(tmp_path / "ann3"))
    assert again.centroids() == idx.centroids()


def test_add_batch_meta_enables_idempotent_streaming(spark, emb, tmp_path):
    """add_batch records commit meta — the same version_with_meta probe
    DedupIndex's foreachBatch sink uses for replay-safe ingestion."""
    v0 = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    idx = AnnIndex.create(
        str(tmp_path / "ann4"), v0, num_centroids=4, seed=7, refine_iters=0
    )
    v = idx.add_batch(batch, meta={"stream_batch_id": 0})
    assert idx.rows.version_with_meta("stream_batch_id", 0) == v
    assert idx.rows.version_with_meta("stream_batch_id", 1) is None
