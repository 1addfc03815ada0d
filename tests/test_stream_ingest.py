"""Streaming maintenance of the persisted dedup index.

The write path twin of ``streaming.sessions.stream_near_dup``: a
``foreachBatch`` sink (``DedupIndex.stream_sink``) that, per micro-batch,
dedups the arriving docs against the index and appends BOTH the raw docs
(corpus table) and the batch's index rows — every commit tagged with the
micro-batch id in the snapshot manifest, so Structured Streaming's
replay-after-failure contract becomes idempotent completion instead of a
double commit.

THE property under test: streaming the corpus in micro-batches yields an
index whose ``components()`` equals one-shot full-corpus clustering — and
stays equal under replayed and partially-failed batches.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from temporalscope_spark.datasets.snapshots import SnapshotTable
from temporalscope_spark.operators.incremental_dedup import (
    DedupIndex,
    cluster_corpus,
)

# same hash-deterministic corpus as test_incremental_dedup (bridge doc 101
# merges the A and B clusters, 103 exact-dups 30, 104/105 pair up)
from tests.test_incremental_dedup import BATCH, PARAMS, V0


def _full_labels(spark):
    full = spark.createDataFrame(V0 + BATCH, "doc_id long, text string")
    return {
        r["doc_id"]: r["component"]
        for r in cluster_corpus(full, **PARAMS).collect()
    }


def _components(spark, idx):
    return {
        r["doc_id"]: r["component"] for r in idx.components(spark).collect()
    }


@pytest.fixture()
def seeded(spark, tmp_path):
    """v0 docs in BOTH the corpus table and the index — the state a
    streaming deployment starts from."""
    v0 = spark.createDataFrame(V0, "doc_id long, text string")
    corpus = SnapshotTable(str(tmp_path / "corpus"))
    corpus.write(v0, mode="append")
    idx = DedupIndex.create(str(tmp_path / "idx"), v0, **PARAMS)
    return corpus, idx


def test_stream_ingest_matches_full_clustering(spark, tmp_path, seeded):
    """Real readStream → foreachBatch wiring: the batch docs arrive as
    one-file micro-batches; the final index equals one-shot clustering of
    v0 ∪ batch, and the corpus table holds every doc exactly once."""
    corpus, idx = seeded

    src = tmp_path / "arrivals"
    src.mkdir()
    # three micro-batches: (100, 101), (102, 103), (104, 105) — the bridge
    # lands in the first, the exact dup in the second, the batch-internal
    # near-dup pair in the third
    for i, chunk in enumerate([BATCH[0:2], BATCH[2:4], BATCH[4:6]]):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(idx.stream_sink(corpus))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert _components(spark, idx) == _full_labels(spark)
    got_docs = {
        r["doc_id"] for r in corpus.read(spark).select("doc_id").collect()
    }
    assert got_docs == {d for d, _ in V0 + BATCH}
    assert corpus.read(spark).count() == len(V0) + len(BATCH)
    # every streamed commit carries its micro-batch id
    metas = [
        s.get("meta", {}).get("stream_batch_id")
        for s in idx.rows.snapshots()[1:]
    ]
    assert sorted(metas) == [0, 1, 2]


def test_replayed_batch_is_a_noop(spark, tmp_path, seeded):
    """Re-delivering an already-committed micro-batch (the replay
    Structured Streaming performs after any post-commit failure) changes
    nothing: no new versions on any table."""
    corpus, idx = seeded
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    idx.ingest_stream_batch(spark, batch, 7, corpus)
    before = (
        idx.rows.current_version(),
        idx.relabels.current_version(),
        corpus.current_version(),
    )
    labels_before = _components(spark, idx)

    idx.ingest_stream_batch(spark, batch, 7, corpus)  # replay

    assert (
        idx.rows.current_version(),
        idx.relabels.current_version(),
        corpus.current_version(),
    ) == before
    assert _components(spark, idx) == labels_before == _full_labels(spark)


def test_replay_completes_a_partially_failed_batch(spark, tmp_path, seeded):
    """Inject a crash AFTER the relabels + corpus commits but BEFORE the
    index-rows commit (the worst interleaving: the batch is half-landed).
    The replay must read the corpus at the pre-batch version (so the batch
    never matches its own half-landed copy), skip the already-written
    relabels, and finish with state identical to a clean run."""
    corpus, idx = seeded
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")

    real_write = idx.rows.write
    def boom(df, mode="append", meta=None):
        raise RuntimeError("injected crash before the index-rows commit")

    idx.rows.write = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.ingest_stream_batch(spark, batch, 3, corpus)
    idx.rows.write = real_write

    # half-landed: corpus + relabels committed, rows not
    assert corpus.version_with_meta("stream_batch_id", 3) is not None
    assert idx.relabels.version_with_meta("stream_batch_id", 3) is not None
    assert idx.rows.version_with_meta("stream_batch_id", 3) is None

    idx.ingest_stream_batch(spark, batch, 3, corpus)  # the replay

    assert _components(spark, idx) == _full_labels(spark)
    # exactly one corpus append and one relabels commit for the batch
    assert corpus.read(spark).count() == len(V0) + len(BATCH)
    relabel_commits = [
        s for s in idx.relabels.snapshots()
        if s.get("meta", {}).get("stream_batch_id") == 3
    ]
    assert len(relabel_commits) == 1


def test_matcher_reads_post_merge_labels(spark, tmp_path, seeded):
    """Lifecycle unification (read half): after the stream sink lands the
    bridge batch (doc 101 merges v0 clusters {1,2} and {10,11}), a NEW
    arrival near-duplicating BASE_B must be matched via band rows that
    were WRITTEN with the pre-merge label 10 — and still come back with
    the post-merge component (1), because stream_near_dup_indexed folds
    the relabel log into the band index. Matching the raw rows table
    instead would emit the stale label (asserted as the negative
    control)."""
    from tests.test_incremental_dedup import BASE_B
    from temporalscope_spark.streaming.sessions import (
        replay_static_as_stream,
        stream_near_dup,
        stream_near_dup_indexed,
    )

    corpus, idx = seeded
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    idx.ingest_stream_batch(spark, batch, 0, corpus)
    final = _components(spark, idx)
    assert final == _full_labels(spark)
    # the merge actually happened: B-cluster docs now share A's label
    assert final[10] == final[1]
    assert idx.relabels.current_version() is not None

    arrivals = [(500, BASE_B + " freshly arriving copy")]
    src = str(tmp_path / "probe")
    arr_df = spark.createDataFrame(arrivals, "doc_id long, text string")
    arr_df.write.parquet(src)

    got = replay_static_as_stream(
        spark,
        src,
        arr_df.schema,
        lambda s: stream_near_dup_indexed(s, idx, corpus),
        "near_dup_indexed_out",
        output_mode="append",
    ).toPandas()
    assert len(got) > 0  # the planted near-dup fires
    # matches the B cluster and the bridge doc that carries B's text
    assert set(got["matched_id"]) <= {10, 11, 101}
    assert set(got["matched_id"]) & {10, 11}  # pre-merge rows did match
    # every emitted component is the POST-merge label
    assert set(got["component"]) == {final[10]}

    # negative control: the raw rows table still carries the stale label,
    # so an un-unified matcher would emit pre-merge components
    raw = replay_static_as_stream(
        spark,
        src,
        arr_df.schema,
        lambda s: stream_near_dup(
            s,
            idx.rows.read(spark).select("_band", "_bh", "_id", "component"),
            corpus.read(spark),
            **PARAMS,
        ),
        "near_dup_raw_out",
        output_mode="append",
    ).toPandas()
    stale = {r for r in raw["component"]}
    assert stale and stale != {final[10]}


class TestLineDedupIndex:
    """Streaming/index lifecycle for CCNet line dedup
    (dedup.py:LineDedupIndex) — the foreachBatch twin of
    dedup_lines_incremental."""

    CORPUS = [(0, "nav bar\nzero only\nfooter"), (1, "nav bar\none only")]
    B1 = [(10, "nav bar\nten only\ncross batch")]
    B2 = [(11, "cross batch\neleven only\nfooter")]

    def _mk(self, spark, tmp_path):
        from temporalscope_spark.operators.dedup import LineDedupIndex

        idx = LineDedupIndex(str(tmp_path / "lidx"))
        idx.build(spark.createDataFrame(self.CORPUS, "doc_id long, text string"))
        return idx

    def _expected(self, spark, landed, batch):
        """One-shot dedup_lines over everything landed so far, restricted
        to the batch — the online-semantics contract."""
        from temporalscope_spark.operators.dedup import dedup_lines

        full = spark.createDataFrame(landed + batch, "doc_id long, text string")
        ids = {d for d, _ in batch}
        return {
            r["doc_id"]: (r["cleaned_text"], r["n_lines"], r["n_kept"])
            for r in dedup_lines(full).collect()
            if r["doc_id"] in ids
        }

    def test_sequential_batches_match_oneshot_prefixes(self, spark, tmp_path):
        idx = self._mk(spark, tmp_path)
        b1 = spark.createDataFrame(self.B1, "doc_id long, text string")
        got1 = {
            r["doc_id"]: (r["cleaned_text"], r["n_lines"], r["n_kept"])
            for r in idx.ingest_stream_batch(b1, batch_id=0).collect()
        }
        assert got1 == self._expected(spark, self.CORPUS, self.B1)
        # b1's 'cross batch' was fresh then -> kept
        assert got1[10] == ("ten only\ncross batch", 3, 2)

        b2 = spark.createDataFrame(self.B2, "doc_id long, text string")
        got2 = {
            r["doc_id"]: (r["cleaned_text"], r["n_lines"], r["n_kept"])
            for r in idx.ingest_stream_batch(b2, batch_id=1).collect()
        }
        assert got2 == self._expected(spark, self.CORPUS + self.B1, self.B2)
        # b2 sees 'cross batch' (landed by b1) and 'footer' (corpus) as dups
        assert got2[11] == ("eleven only", 3, 1)

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        idx = self._mk(spark, tmp_path)
        b1 = spark.createDataFrame(self.B1, "doc_id long, text string")
        assert idx.ingest_stream_batch(b1, batch_id=0) is not None
        v = idx.partials.current_version()
        assert idx.ingest_stream_batch(b1, batch_id=0) is None
        assert idx.partials.current_version() == v  # no double count

    def test_foreachbatch_wiring(self, spark, tmp_path):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        idx = self._mk(spark, tmp_path)
        src = str(tmp_path / "src")
        b1 = spark.createDataFrame(self.B1, "doc_id long, text string")
        b2 = spark.createDataFrame(self.B2, "doc_id long, text string")
        b1.coalesce(1).write.mode("overwrite").parquet(src)
        b2.coalesce(1).write.mode("append").parquet(src)
        out = SnapshotTable(str(tmp_path / "out"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(idx.stream_sink(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["n_kept"] for r in out.read(spark).collect()
        }
        assert set(got) == {10, 11}
        # whichever arrival order the two one-file micro-batches took, the
        # cross-batch line survives exactly once across the two docs
        assert sorted(got.values()) == [1, 2] or got == {10: 2, 11: 1}
        # index now folds corpus + both batches
        folded = idx.index(spark)
        nav = folded.filter("_c >= 3").count()
        assert nav >= 1  # 'nav bar' seen 3x (corpus x2 + b1)
