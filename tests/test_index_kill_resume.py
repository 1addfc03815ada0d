"""Kill-resume coverage for the persisted index classes (VERDICT r5 #7).

``PostingsIndex.append_batch`` commits three SnapshotTables in a fixed
order (postings → termdf → stats) with a per-batch id in each commit's
meta; ``AnnIndex.add_batch`` is one commit whose meta carries the stream
batch id. The crash window that matters is BETWEEN commits: a process
dying there leaves partial progress that a replayed append must complete
without double-committing. These tests open that exact window
deterministically — a fault injected into ``SnapshotTable.write`` at the
chosen commit stands in for SIGKILL between the same two commits, with
none of the timing fragility of a subprocess kill — then replay and
assert convergence to the one-shot artifact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.datasets.snapshots import SnapshotTable
from temporalscope_spark.operators.ann_index import AnnIndex
from temporalscope_spark.operators.retrieval import PostingsIndex, bm25_topk_multi


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"alpha beta gamma doc{i} " + ("common words here " * (i % 3 + 1)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_rows(spark, idx, words):
    postings, stats, termdf = idx.read(spark)
    out = bm25_topk_multi(
        postings,
        stats,
        termdf,
        spark.createDataFrame(
            [(0, w) for w in words], "query_id long, word string"
        ),
        k=10,
    )
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in out.collect()
    )


def _crashing_write(crash_on_call: int):
    """A SnapshotTable.write replacement (a real function, so it binds as
    a method) that raises on the Nth call of the append being tested."""
    state = {"calls": 0}
    orig = SnapshotTable.write

    def write(self, df, mode="overwrite", meta=None):
        state["calls"] += 1
        if state["calls"] == crash_on_call:
            raise RuntimeError("injected crash between index commits")
        return orig(self, df, mode=mode, meta=meta)

    return write


class TestPostingsIndexKillResume:
    @pytest.mark.parametrize("crash_on_call", [1, 2, 3])
    def test_crash_between_commits_then_replay(
        self, spark, tmp_path, docs, monkeypatch, crash_on_call
    ):
        v0 = docs.filter(F.col("doc_id") < 30)
        batch = docs.filter(F.col("doc_id") >= 30)

        oneshot = PostingsIndex.create(str(tmp_path / "oneshot"), docs)
        idx = PostingsIndex.create(str(tmp_path / "incr"), v0)

        monkeypatch.setattr(SnapshotTable, "write", _crashing_write(crash_on_call))
        with pytest.raises(RuntimeError, match="injected crash"):
            idx.append_batch(batch, batch_id="b1")
        monkeypatch.undo()

        # partial state: exactly crash_on_call-1 of the three commits landed
        committed = sum(
            t.version_with_meta(PostingsIndex._BKEY, "b1") is not None
            for t in (idx.postings, idx.termdf, idx.stats)
        )
        assert committed == crash_on_call - 1

        # replay completes the batch...
        idx.append_batch(batch, batch_id="b1")
        for t in (idx.postings, idx.termdf, idx.stats):
            assert t.version_with_meta(PostingsIndex._BKEY, "b1") is not None
        # ...idempotently: a second replay adds no commits
        versions = [t.current_version() for t in (idx.postings, idx.termdf, idx.stats)]
        idx.append_batch(batch, batch_id="b1")
        assert versions == [
            t.current_version() for t in (idx.postings, idx.termdf, idx.stats)
        ]

        words = ["common", "alpha"]
        assert _bm25_rows(spark, idx, words) == _bm25_rows(spark, oneshot, words)


class TestAnnIndexKillResume:
    def test_uncommitted_batch_replays_to_oneshot(self, spark, tmp_path):
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        v0 = vecs.filter(F.col("vec_id") < 45)
        batch = vecs.filter(F.col("vec_id") >= 45)

        oneshot = AnnIndex.create(str(tmp_path / "oneshot"), vecs, num_centroids=4)
        # the incremental twin trains its quantizer on v0 only; probing
        # every cell below (nprobe == num_centroids) makes both indexes
        # exact, so their top-k must agree whatever the quantizers did
        idx = AnnIndex.create(str(tmp_path / "incr"), v0, num_centroids=4)

        # crash BEFORE the batch commit: nothing persisted for batch 1
        orig = SnapshotTable.write
        SnapshotTable.write = _crashing_write(1)
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                idx.add_batch(batch, meta={"stream_batch_id": 1})
        finally:
            SnapshotTable.write = orig
        assert idx.rows.version_with_meta("stream_batch_id", 1) is None

        # foreachBatch-style replay: guard on the meta tag, then append once
        if idx.rows.version_with_meta("stream_batch_id", 1) is None:
            idx.add_batch(batch, meta={"stream_batch_id": 1})
        assert idx.rows.version_with_meta("stream_batch_id", 1) is not None
        ver = idx.rows.current_version()
        # replayed delivery of the same batch id is skipped by the guard
        if idx.rows.version_with_meta("stream_batch_id", 1) is None:
            idx.add_batch(batch, meta={"stream_batch_id": 1})
        assert idx.rows.current_version() == ver

        q = rows[0][1]
        got = sorted(
            (r["vec_id"], round(r["cosine"], 9))
            for r in idx.topk(spark, q, k=5, nprobe=4).collect()
        )
        want = sorted(
            (r["vec_id"], round(r["cosine"], 9))
            for r in oneshot.topk(spark, q, k=5, nprobe=4).collect()
        )
        # the incremental index holds every vector exactly once, so probes
        # rank identically to the one-shot build
        assert got == want
