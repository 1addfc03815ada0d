"""SnapshotTable: commit isolation, time travel, rollback, lineage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.datasets.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("x"))


class TestSnapshots:
    def test_append_and_time_travel(self, spark, table):
        v1 = table.write(_df(spark, 0, 10))
        v2 = table.write(_df(spark, 10, 25))
        assert (v1, v2) == (1, 2)
        assert table.read(spark, 1).count() == 10
        assert table.read(spark, 2).count() == 25
        assert table.read(spark).count() == 25  # latest

    def test_old_snapshot_immune_to_later_commits(self, spark, table):
        table.write(_df(spark, 0, 10))
        before = sorted(r["id"] for r in table.read(spark, 1).collect())
        table.write(_df(spark, 100, 200))
        table.write(_df(spark, 0, 1), mode="overwrite")
        after = sorted(r["id"] for r in table.read(spark, 1).collect())
        assert before == after == list(range(10))

    def test_overwrite_replaces_visible_set_keeps_history(self, spark, table):
        table.write(_df(spark, 0, 10))
        v2 = table.write(_df(spark, 50, 55), mode="overwrite")
        assert table.read(spark, v2).count() == 5
        assert table.read(spark, 1).count() == 10  # history intact

    def test_rollback_is_a_new_commit(self, spark, table):
        table.write(_df(spark, 0, 10))
        table.write(_df(spark, 10, 30))
        v3 = table.rollback(1)
        assert v3 == 3
        assert table.read(spark).count() == 10           # current = v1 contents
        assert table.read(spark, 2).count() == 30        # history preserved
        assert table.snapshot_id(3) == table.snapshot_id(1)  # same content id

    def test_lineage_log(self, spark, table):
        table.write(_df(spark, 0, 10))
        table.write(_df(spark, 10, 20))
        snaps = table.snapshots()
        assert [s["version"] for s in snaps] == [1, 2]
        assert snaps[1]["parent"] == 1 and snaps[0]["parent"] is None
        assert snaps[0]["operation"] == "append"
        assert snaps[0]["snapshot_id"].startswith("snap-")

    def test_read_empty_table_raises(self, spark, table):
        with pytest.raises(ValueError, match="no snapshots"):
            table.read(spark)

    def test_bad_mode(self, spark, table):
        with pytest.raises(ValueError, match="mode must be"):
            table.write(_df(spark, 0, 1), mode="merge")

    def test_snapshot_id_feeds_checkpoint_guard(self, spark, table, tmp_path):
        """Integration: the table's snapshot id keys the checkpoint store —
        a new snapshot invalidates old bucket manifests."""
        from temporalscope_spark.checkpoint import CheckpointStore

        table.write(_df(spark, 0, 10))
        ck = CheckpointStore(str(tmp_path / "ck"), snapshot_id=table.snapshot_id())
        ck.record_bucket(0, row_count=10)
        assert ck.completed_buckets() == {0}
        table.write(_df(spark, 10, 20))  # new snapshot
        ck2 = CheckpointStore(str(tmp_path / "ck"), snapshot_id=table.snapshot_id())
        assert ck2.completed_buckets() == set()  # invalidated


class TestIncrementalRead:
    def test_increment_is_exactly_the_new_rows(self, spark, table):
        table.write(_df(spark, 0, 10))
        table.write(_df(spark, 10, 25))
        v3 = table.write(_df(spark, 25, 30))
        inc = table.read_increment(spark, 1, v3)
        got = sorted(r["id"] for r in inc.collect())
        assert got == list(range(10, 30))
        # the planning set is disjoint from the base snapshot's files and
        # is exactly what the incremental scan reads
        base_files = set(table._load(1)["files"])
        diff = set(table.diff_files(1, v3))
        assert diff and diff.isdisjoint(base_files)
        assert set(inc.inputFiles()) <= {f"file://{f}" for f in diff} | diff
        inc2 = table.read_increment(spark, 2, v3)
        assert sorted(r["id"] for r in inc2.collect()) == list(range(25, 30))

    def test_empty_increment_keeps_schema(self, spark, table):
        v1 = table.write(_df(spark, 0, 10))
        inc = table.read_increment(spark, v1, v1)
        assert inc.count() == 0
        assert inc.columns == ["id", "x"]

    def test_overwrite_in_range_raises(self, spark, table):
        table.write(_df(spark, 0, 10))
        table.write(_df(spark, 10, 20), mode="overwrite")
        with pytest.raises(ValueError, match="not an append"):
            table.read_increment(spark, 1)

    def test_increment_after_overwrite_base_is_fine(self, spark, table):
        # the overwrite is the BASE snapshot, not inside the range — valid
        table.write(_df(spark, 0, 10))
        v2 = table.write(_df(spark, 10, 20), mode="overwrite")
        v3 = table.write(_df(spark, 20, 23))
        inc = table.read_increment(spark, v2, v3)
        assert sorted(r["id"] for r in inc.collect()) == [20, 21, 22]

    def test_bad_range_raises(self, spark, table):
        table.write(_df(spark, 0, 5))
        v2 = table.write(_df(spark, 5, 8))
        with pytest.raises(ValueError, match="precedes"):
            table.read_increment(spark, v2, 1)


class TestIncrementalFeatures:
    def _tok_df(self, spark, rows):
        # (doc_id, second, n_tok) -> tokenized-sequence shaped frame
        return spark.createDataFrame(
            [(d, f"2023-01-01 00:00:{s:02d}", n, list(range(n))) for d, s, n in rows],
            "doc_id long, event_time string, n_tok int, tokens array<int>",
        ).withColumn("event_time", F.col("event_time").cast("timestamp"))

    def test_affected_entity_recompute_matches_full(self, spark, tmp_path):
        from temporalscope_spark.pipelines.feature_pass import (
            build_features,
            incremental_features,
        )

        table = SnapshotTable(str(tmp_path / "tok"))
        v1_rows = [(1, 0, 3), (1, 10, 4), (1, 20, 5), (2, 0, 6), (2, 10, 7)]
        table.write(self._tok_df(spark, v1_rows))
        # append touches ONLY entity 2 — its earlier rows' lead target and
        # lag chain change, entity 1 must not be recomputed
        v2 = table.write(self._tok_df(spark, [(2, 20, 8), (2, 30, 9)]))

        inc = incremental_features(spark, table, 1, v2, pad_to=8).toPandas()
        assert set(inc["doc_id"]) == {2}
        full = (
            build_features(table.read(spark, v2), pad_to=8)
            .filter(F.col("doc_id") == 2)
            .toPandas()
        )
        key = ["doc_id", "event_time"]
        inc_s = inc.sort_values(key).reset_index(drop=True)
        full_s = full.sort_values(key).reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_series_equal(inc_s["target"], full_s["target"])
        pd.testing.assert_series_equal(inc_s["n_tok_lag_1"], full_s["n_tok_lag_1"])
        assert len(inc_s) == len(full_s)

    def test_no_new_rows_empty_frame(self, spark, tmp_path):
        from temporalscope_spark.pipelines.feature_pass import incremental_features

        table = SnapshotTable(str(tmp_path / "tok2"))
        v1 = table.write(self._tok_df(spark, [(1, 0, 3), (1, 10, 4)]))
        out = incremental_features(spark, table, v1, v1, pad_to=8)
        assert out.count() == 0


class TestSnapshotPipeline:
    def test_resume_same_snapshot_reprocess_new_snapshot(self, spark, tmp_path):
        from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
        from temporalscope_spark.pipelines.feature_pass import run_pipeline_on_snapshot

        table = SnapshotTable(str(tmp_path / "tbl"))
        tok = generate_tokenized_sequences(spark, num_rows=2000, num_docs=20)
        table.write(tok)

        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        s1 = run_pipeline_on_snapshot(spark, str(tmp_path / "tbl"), out, ck, num_buckets=4)
        assert s1["processed"] == 4 and s1["snapshot_version"] == 1
        # same snapshot -> pure resume
        s2 = run_pipeline_on_snapshot(spark, str(tmp_path / "tbl"), out, ck, num_buckets=4)
        assert s2 == {"processed": 0, "skipped": 4, "snapshot_version": 1}
        # append -> new snapshot -> checkpoint invalidated, full reprocess
        table.write(generate_tokenized_sequences(spark, num_rows=500, num_docs=20,
                                                 random_seed=7))
        s3 = run_pipeline_on_snapshot(spark, str(tmp_path / "tbl"), out, ck, num_buckets=4)
        assert s3["processed"] == 4 and s3["snapshot_version"] == 2
        # but time travel back to v1 with a fresh checkpoint dir reproduces v1
        s4 = run_pipeline_on_snapshot(
            spark, str(tmp_path / "tbl"), str(tmp_path / "out1"),
            str(tmp_path / "ck1"), version=1, num_buckets=4,
        )
        assert s4["snapshot_version"] == 1 and s4["processed"] == 4


class TestCompact:
    def test_compact_zorder_layout(self, spark, tmp_path):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        st = SnapshotTable(str(tmp_path / "t"))
        rows = [(i, i * 37 % 101, float(i % 13)) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, a long, b double")
        # simulate small-file accretion: 4 appends of 8 partitions each
        for part in range(4):
            st.write(df.filter(F.col("id") % 4 == part).repartition(8))
        v_before = st.current_version()
        n_files_before = st.snapshots()[-1]["n_files"]

        v = st.compact(spark, zorder_cols=["a", "b"], num_files=4, bits=8)
        man = st.snapshots()[-1]
        assert v == st.current_version() and v == v_before + 1
        assert man["operation"] == "overwrite"
        assert man["meta"]["zorder"] == ["a", "b"]
        assert man["n_files"] < n_files_before

        # row parity with the pre-compaction snapshot (zkey column added)
        out = st.read(spark)
        assert out.count() == 2000
        got = sorted((r["id"], r["a"], r["b"]) for r in out.collect())
        assert got == sorted(rows)
        # old snapshot still readable (time travel untouched)
        assert st.read(spark, version=v_before).count() == 2000

        # files cover DISJOINT zkey ranges (the pruning property)
        per_file = (
            out.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(per_file) > 1
        for x, y in zip(per_file, per_file[1:]):
            assert x["hi"] <= y["lo"]

    def test_compact_plain_repartition(self, spark, tmp_path):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        st = SnapshotTable(str(tmp_path / "t2"))
        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        st.write(df.repartition(16))
        v = st.compact(spark, num_files=2)
        man = st.snapshots()[-1]
        assert man["meta"]["target_files"] == 2 and "zorder" not in man["meta"]
        assert st.read(spark, version=v).count() == 100

    def test_compact_empty_table_raises(self, spark, tmp_path):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        st = SnapshotTable(str(tmp_path / "t3"))
        with pytest.raises(ValueError):
            st.compact(spark)
