"""Incremental dedup against a persisted fingerprint/minhash-band index.

THE property under test (VERDICT r3 #1): full-corpus dedup of C0 ∪ B is
EXACTLY reproduced by (index built from C0) + (incremental dedup of batch B)
— same candidate criterion, same exact-Jaccard verification, same min-label
clustering — including the transitive case where a batch doc bridges two
pre-existing components (which forces a relabel of a stored cluster).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from temporalscope_spark.operators.incremental_dedup import (
    DedupIndex,
    cluster_corpus,
    dedup_index_rows,
    incremental_dedup,
)

BASE_A = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge daily"
)
BASE_B = (
    "pack my box with five dozen liquor jugs as the wizard quickly jinxed "
    "the gnomes before they vaporized under amazingly few discotheques"
)
BASE_C = (
    "colorless green ideas sleep furiously beneath the surface of a "
    "perfectly ordinary sentence about nothing in particular at all here"
)

# v0 corpus: cluster {1,2} (near-dups of A), cluster {10,11} (near-dups of
# B), singleton 20 (C), exact-dup pair {30, 31} (identical after whitespace
# normalization)
V0 = [
    (1, BASE_A),
    (2, BASE_A + " with a tiny suffix"),
    (10, BASE_B),
    (11, BASE_B + " plus some extra"),
    (20, BASE_C),
    (30, "an exactly duplicated document body right here"),
    (31, "an   exactly DUPLICATED document body right here"),
]
# batch: 100 = near-dup of A (joins cluster 1); 101 = BRIDGE between A and B
# (≥ threshold jaccard with both → merges clusters 1 and 10); 102 = fresh;
# 103 = exact dup of 30; 104/105 = near-dup pair within the batch
BATCH = [
    (100, BASE_A + " with another suffix"),
    (101, BASE_A + " " + BASE_B),
    (102, "a completely novel document unlike anything indexed before now"),
    (103, "AN EXACTLY duplicated document body right here"),
    (104, "twin batch documents that duplicate each other nearly verbatim ok"),
    (105, "twin batch documents that duplicate each other nearly verbatim"),
]

# bands=8 (2 rows/band): the bridge doc shares only ~half its shingles with
# each side, so wider bands would fire on neither side — r=2 makes both
# bridge candidacies deterministic for THIS fixed text (everything is
# hash-deterministic; verified by test_fixture_is_interesting)
PARAMS = dict(num_hashes=16, bands=8, shingle_n=6, threshold=0.3)


@pytest.fixture(scope="module")
def corpora(spark):
    v0 = spark.createDataFrame(V0, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    full = spark.createDataFrame(V0 + BATCH, "doc_id long, text string")
    return v0, batch, full


@pytest.fixture(scope="module")
def full_labels(corpora):
    _, _, full = corpora
    return {
        r["doc_id"]: r["component"]
        for r in cluster_corpus(full, **PARAMS).collect()
    }


class TestEquivalence:
    def test_fixture_is_interesting(self, full_labels):
        """The planted corpus must actually exercise merge + exact + near
        lanes — otherwise the equivalence assertions are vacuous."""
        # bridge doc 101 merges clusters 1 and 10 into component 1
        assert full_labels[101] == 1
        assert full_labels[10] == 1 and full_labels[11] == 1
        assert full_labels[100] == 1
        # exact dups cluster with their original
        assert full_labels[103] == 30 and full_labels[31] == 30
        # batch-internal near-dup pair
        assert full_labels[105] == 104 and full_labels[104] == 104
        # untouched docs stay singletons
        assert full_labels[20] == 20 and full_labels[102] == 102

    def test_incremental_equals_full(self, spark, corpora, full_labels):
        """v0 labels (+relabels) ∪ batch labels == full-corpus labels."""
        v0, batch, _ = corpora
        v0_labels = cluster_corpus(v0, **PARAMS)
        index = dedup_index_rows(v0, components=v0_labels, **PARAMS)
        res = incremental_dedup(index, batch, v0, **PARAMS)

        relabels = {
            r["old_component"]: r["component"] for r in res.relabels.collect()
        }
        got = {
            r["doc_id"]: relabels.get(r["component"], r["component"])
            for r in v0_labels.collect()
        }
        got.update(
            {r["doc_id"]: r["component"] for r in res.batch_components.collect()}
        )
        assert got == full_labels
        # the bridge really produced a relabel of a stored component
        assert relabels == {10: 1}

    def test_exact_dup_flag(self, spark, corpora):
        v0, batch, _ = corpora
        index = dedup_index_rows(v0, **PARAMS)
        res = incremental_dedup(index, batch, v0, **PARAMS)
        flags = {
            r["doc_id"]: r["is_exact_dup"] for r in res.batch_components.collect()
        }
        assert flags == {100: False, 101: False, 102: False,
                         103: True, 104: False, 105: False}

    def test_clean_batch_is_a_noop(self, spark, corpora):
        """A batch with no duplicates: no relabels, every doc labels itself."""
        v0, _, _ = corpora
        clean = spark.createDataFrame(
            [(200, "some wholly fresh content never seen anywhere"),
             (201, "and a second novel text sharing nothing with the first")],
            "doc_id long, text string",
        )
        index = dedup_index_rows(v0, **PARAMS)
        res = incremental_dedup(index, clean, v0, **PARAMS)
        assert res.relabels.count() == 0
        got = {r["doc_id"]: r["component"] for r in res.batch_components.collect()}
        assert got == {200: 200, 201: 201}

    def test_index_rows_shape(self, corpora):
        v0, _, _ = corpora
        index = dedup_index_rows(v0, **PARAMS)
        assert index.columns == ["_id", "component", "fingerprint", "_band", "_bh"]
        # one row per (doc, band)
        assert index.count() == len(V0) * PARAMS["bands"]


class TestDedupIndexPersistence:
    def test_end_to_end_matches_full(self, spark, corpora, full_labels, tmp_path):
        """create(v0) → dedup_batch(B) → components() == full-corpus labels
        for EVERY indexed doc, with the relabel log folded in."""
        v0, batch, _ = corpora
        idx = DedupIndex.create(str(tmp_path / "idx"), v0, **PARAMS)
        res = idx.dedup_batch(spark, batch, v0)
        assert res.batch_components.count() == len(BATCH)
        got = {r["doc_id"]: r["component"]
               for r in idx.components(spark).collect()}
        assert got == full_labels
        # the rows table committed exactly one append (batch-sized commit)
        assert idx.rows.current_version() == 2
        assert idx.relabels.current_version() == 1

    def test_multi_batch_relabel_chain(self, spark, tmp_path):
        """Two successive batches producing a relabel CHAIN (c3→c2 then
        c2→c1) must fold transitively at read time."""
        t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
        t2 = "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " * 3
        v0 = spark.createDataFrame(
            [(5, t1), (6, t1 + " tail"), (8, t2), (9, t2 + " tail")],
            "doc_id long, text string",
        )
        idx = DedupIndex.create(str(tmp_path / "idx2"), v0, **PARAMS)
        # batch 1: doc 3 near-dups t2's cluster → relabel 8 → 3
        b1 = spark.createDataFrame([(3, t2 + " x")], "doc_id long, text string")
        idx.dedup_batch(spark, b1, v0)
        # batch 2: doc 1 bridges t1 and t2 clusters → everything labels 1
        corpus_so_far = v0.unionByName(b1)
        b2 = spark.createDataFrame(
            [(1, t1 + " " + t2)], "doc_id long, text string"
        )
        idx.dedup_batch(spark, b2, corpus_so_far)
        got = {r["doc_id"]: r["component"]
               for r in idx.components(spark).collect()}
        full = {r["doc_id"]: r["component"]
                for r in cluster_corpus(
                    corpus_so_far.unionByName(b2), **PARAMS
                ).collect()}
        assert got == full
        assert set(got.values()) == {1}

    def test_dedup_batch_folds_relabel_log_before_matching(self, spark, tmp_path):
        """rows/ is append-only, so after a merge the old rows still carry
        their pre-merge component label. dedup_batch must fold the relabel
        log into the index BEFORE matching: a batch doc whose only
        near-dups are stale-labeled rows must come back with the
        POST-merge component — otherwise the documented "survives dedup
        iff component == id" rule keeps a duplicate."""
        t2 = "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " * 3
        v0 = spark.createDataFrame(
            [(8, t2), (9, t2 + " tail")], "doc_id long, text string"
        )
        idx = DedupIndex.create(str(tmp_path / "idx4"), v0, **PARAMS)
        # simulate a prior batch having merged component 8 into component 4
        # (only the log matters for the stale-label property)
        idx.relabels.write(
            spark.createDataFrame(
                [(8, 4)], "old_component long, component long"
            ),
            mode="append",
        )
        batch = spark.createDataFrame(
            [(7, t2 + " y")], "doc_id long, text string"
        )
        res = idx.dedup_batch(spark, batch, v0)
        got = {
            r["doc_id"]: r["component"] for r in res.batch_components.collect()
        }
        # the stale lane would yield {7: 7} — doc 7 "survives" although it
        # duplicates the (merged) cluster — or {7: 8} for larger batch ids
        assert got == {7: 4}
        comp = {
            r["doc_id"]: r["component"] for r in idx.components(spark).collect()
        }
        assert comp == {7: 4, 8: 4, 9: 4}
        res.unpersist()

    def test_params_manifest_guards_config(self, spark, corpora, tmp_path):
        v0, _, _ = corpora
        idx = DedupIndex.create(str(tmp_path / "idx3"), v0, **PARAMS)
        assert idx.params()["shingle_n"] == PARAMS["shingle_n"]
        with pytest.raises(ValueError, match="already exists"):
            DedupIndex.create(str(tmp_path / "idx3"), v0, **PARAMS)

    def test_create_rejects_missing_index_columns(self, spark, corpora):
        v0, batch, _ = corpora
        from temporalscope_spark.exceptions import DataFrameValidationError

        with pytest.raises(DataFrameValidationError, match="missing column"):
            incremental_dedup(v0.select("doc_id"), batch, v0, **PARAMS)


def test_read_increment_feeds_dedup_batch(spark, tmp_path):
    """The full incremental story (VERDICT r3 #1 wiring): a corpus
    SnapshotTable takes an append; read_increment yields exactly the landed
    batch (metadata-only diff); DedupIndex.dedup_batch dedups it against
    the persisted index; the final labels equal full-corpus clustering."""
    from temporalscope_spark.datasets.snapshots import SnapshotTable

    v0 = spark.createDataFrame(V0, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")

    corpus_table = SnapshotTable(str(tmp_path / "corpus"))
    v_base = corpus_table.write(v0, mode="append")
    idx = DedupIndex.create(str(tmp_path / "idx"), v0, **PARAMS)

    # a batch lands as an append commit
    corpus_table.write(batch, mode="append")
    landed = corpus_table.read_increment(spark, from_version=v_base)
    assert landed.count() == len(BATCH)

    # dedup ONLY the landed increment against the index; corpus text for
    # candidate verification comes from the base snapshot (time travel)
    res = idx.dedup_batch(
        spark, landed, corpus_table.read(spark, version=v_base)
    )
    got = {r["doc_id"]: r["component"] for r in idx.components(spark).collect()}
    full = {
        r["doc_id"]: r["component"]
        for r in cluster_corpus(corpus_table.read(spark), **PARAMS).collect()
    }
    assert got == full
    # survivors of the batch: docs whose component is themselves
    survivors = {
        r["doc_id"] for r in res.batch_components.collect()
        if r["component"] == r["doc_id"]
    }
    assert survivors == {102, 104}
