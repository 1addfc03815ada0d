"""Copy-on-write MERGE / DELETE / forget on SnapshotTable.

The contract under test: result-set correctness (upsert/delete semantics),
FILE-GRANULAR rewrites (untouched files carry into the new manifest by
reference — the cost model that survives 100 TB), history preservation
(time travel still sees pre-merge data), and the audit-trail manifest
metadata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.datasets.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def _df(spark, lo, hi, tag="base"):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("x"), F.lit(tag).alias("tag")
    )


def _rows(df):
    return sorted((r["id"], r["x"], r["tag"]) for r in df.collect())


class TestMerge:
    def test_upsert_semantics(self, spark, table):
        table.write(_df(spark, 0, 10))
        src = _df(spark, 5, 15, tag="new").withColumn("x", F.col("id") * 100)
        v = table.merge(spark, src, ["id"])
        got = _rows(table.read(spark, v))
        want = [(i, i * 2, "base") for i in range(5)] + [
            (i, i * 100, "new") for i in range(5, 15)
        ]
        assert got == sorted(want)

    def test_untouched_files_carry_by_reference(self, spark, table):
        # two disjoint commits => distinct file sets; merge touching only
        # the second commit's keys must keep the first commit's files as-is
        table.write(_df(spark, 0, 10).coalesce(1))
        table.write(_df(spark, 100, 110).coalesce(1))
        before = set(table._load(table.current_version())["files"])
        src = _df(spark, 105, 108, tag="upd")
        v = table.merge(spark, src, ["id"])
        after = table._load(v)["files"]
        kept = [f for f in after if f in before]
        # the 0-9 file survives verbatim; the 100-109 file was rewritten
        assert len(kept) == 1
        assert table._load(v)["meta"]["rewritten_files"] == 1
        assert table.read(spark, v).count() == 20

    def test_pure_insert_rewrites_nothing(self, spark, table):
        table.write(_df(spark, 0, 10).coalesce(1))
        before = set(table._load(table.current_version())["files"])
        v = table.merge(spark, _df(spark, 50, 55, tag="ins"), ["id"])
        man = table._load(v)
        assert man["meta"]["rewritten_files"] == 0
        assert before.issubset(set(man["files"]))
        assert table.read(spark, v).count() == 15

    def test_history_preserved(self, spark, table):
        table.write(_df(spark, 0, 10))
        table.merge(spark, _df(spark, 0, 10, tag="v2"), ["id"])
        assert {r["tag"] for r in table.read(spark, 1).collect()} == {"base"}
        assert {r["tag"] for r in table.read(spark).collect()} == {"v2"}

    def test_duplicate_source_keys_raise(self, spark, table):
        table.write(_df(spark, 0, 5))
        dup = _df(spark, 1, 3).union(_df(spark, 2, 4))
        with pytest.raises(ValueError, match="duplicate"):
            table.merge(spark, dup, ["id"])

    def test_merge_empty_table_raises(self, spark, table):
        with pytest.raises(ValueError):
            table.merge(spark, _df(spark, 0, 1), ["id"])


class TestDeleteForget:
    def test_delete_where(self, spark, table):
        table.write(_df(spark, 0, 20))
        v = table.delete_where(spark, F.col("id") % 2 == 0)
        assert sorted(r["id"] for r in table.read(spark, v).collect()) == list(
            range(1, 20, 2)
        )

    def test_delete_sql_string_and_null_semantics(self, spark, table):
        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 50.0)], "id long, x double"
        )
        table.write(df)
        v = table.delete_where(spark, "x > 10")
        # NULL predicate rows are KEPT (SQL DELETE semantics)
        assert sorted(r["id"] for r in table.read(spark, v).collect()) == [1, 2]

    def test_no_match_delete_publishes_audit_snapshot(self, spark, table):
        table.write(_df(spark, 0, 10))
        v = table.delete_where(spark, F.col("id") > 1000)
        man = table._load(v)
        assert man["operation"] == "delete"
        assert man["meta"]["rewritten_files"] == 0
        assert table.read(spark, v).count() == 10

    def test_forget_keys_purges_only_listed(self, spark, table):
        table.write(_df(spark, 0, 10).coalesce(1))
        table.write(_df(spark, 100, 110).coalesce(1))
        optout = spark.createDataFrame([(3,), (7,)], "id long")
        v = table.forget_keys(spark, optout, ["id"])
        ids = sorted(r["id"] for r in table.read(spark, v).collect())
        assert ids == [i for i in range(10) if i not in (3, 7)] + list(range(100, 110))
        # only the file holding 0-9 was rewritten
        assert table._load(v)["meta"]["rewritten_files"] == 1

    def test_incremental_read_refuses_to_cross_a_purge(self, spark, table):
        table.write(_df(spark, 0, 10))
        v1 = table.current_version()
        table.write(_df(spark, 10, 20))
        table.delete_where(spark, F.col("id") < 5)
        with pytest.raises(ValueError, match="not an append"):
            table.read_increment(spark, v1)

    def test_expire_snapshots_true_erasure(self, spark, table):
        import os

        table.write(_df(spark, 0, 10).coalesce(1))
        optout = spark.createDataFrame([(3,), (7,)], "id long")
        table.forget_keys(spark, optout, ["id"])
        # pre-purge file still on disk (old snapshot references it)
        old_files = table._load(1)["files"]
        assert all(os.path.exists(f) for f in old_files)
        rep = table.expire_snapshots(keep_last=1)
        assert rep["expired_versions"] == [1]
        assert rep["deleted_files"] >= 1
        # the file holding the purged rows is physically gone
        cur_files = set(table._load(table.current_version())["files"])
        assert all(not os.path.exists(f) for f in old_files if f not in cur_files)
        # current snapshot unharmed
        ids = sorted(r["id"] for r in table.read(spark).collect())
        assert ids == [i for i in range(10) if i not in (3, 7)]
        # expired version unreadable by design
        with pytest.raises(FileNotFoundError):
            table._load(1)

    def test_expire_keeps_shared_files(self, spark, table):
        import os

        table.write(_df(spark, 0, 10).coalesce(1))
        table.write(_df(spark, 10, 20).coalesce(1))  # append: v2 shares v1's file
        rep = table.expire_snapshots(keep_last=1)
        assert rep["deleted_files"] == 0  # v1's file is live in v2
        assert all(os.path.exists(f) for f in table._load(2)["files"])
        assert table.read(spark).count() == 20

    def test_expire_validation(self, spark, table):
        with pytest.raises(ValueError):
            table.expire_snapshots(keep_last=1)  # empty table
        table.write(_df(spark, 0, 5))
        with pytest.raises(ValueError):
            table.expire_snapshots(keep_last=0)

    def test_full_recluster_equivalence(self, spark, table):
        # forget + merge composed == the same set ops on a plain DataFrame
        table.write(_df(spark, 0, 30))
        src = _df(spark, 20, 40, tag="m")
        table.merge(spark, src, ["id"])
        optout = spark.createDataFrame([(0,), (25,), (39,)], "id long")
        v = table.forget_keys(spark, optout, ["id"])
        base = _df(spark, 0, 30)
        expect = (
            base.join(src.select("id"), "id", "left_anti")
            .unionByName(src)
            .join(optout, "id", "left_anti")
        )
        assert _rows(table.read(spark, v)) == _rows(expect)
