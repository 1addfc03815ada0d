"""Sequence packing: concat-and-chunk (exact) and greedy whole-sequence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.packing import pack_concat_chunks, pack_greedy


@pytest.fixture(scope="module")
def seqs(spark):
    rows = []
    for d in ("d0", "d1", "d2"):
        for i in range(12):
            ln = 1 + ((hash(d) % 7) + i * 3) % 9  # lengths 1..9, varied per doc
            toks = [(ord(d[1]) * 100 + i * 10 + j) % 50257 for j in range(ln)]
            rows.append((d, i, toks))
    return spark.createDataFrame(rows, "doc_id string, seq_idx int, tokens array<int>")


def _stream(pdf, doc):
    ent = pdf[pdf["doc_id"] == doc].sort_values("seq_idx")
    return [t for arr in ent["tokens"] for t in arr]


class TestConcatChunks:
    def test_blocks_are_exact_chunks_of_the_stream(self, seqs):
        out = pack_concat_chunks(seqs, block_tokens=16).toPandas()
        pdf = seqs.toPandas()
        for doc in ("d0", "d1", "d2"):
            stream = _stream(pdf, doc)
            blocks = out[out["doc_id"] == doc].sort_values("block_id")
            assert len(blocks) == len(stream) // 16
            for k, (_, b) in enumerate(blocks.iterrows()):
                assert list(b["tokens"]) == stream[16 * k : 16 * (k + 1)]  # token equality
                assert b["n_filled"] == 16

    def test_keep_remainder_pads(self, seqs):
        out = pack_concat_chunks(seqs, 16, drop_remainder=False, pad_id=-1).toPandas()
        pdf = seqs.toPandas()
        for doc in ("d0", "d1", "d2"):
            stream = _stream(pdf, doc)
            blocks = out[out["doc_id"] == doc].sort_values("block_id")
            rem = len(stream) % 16
            assert len(blocks) == (len(stream) + 15) // 16
            if rem:
                last = blocks.iloc[-1]
                assert last["n_filled"] == rem
                assert list(last["tokens"]) == stream[-rem:] + [-1] * (16 - rem)

    def test_every_token_accounted(self, seqs):
        out = pack_concat_chunks(seqs, 16, drop_remainder=False)
        total_out = out.agg(F.sum("n_filled")).first()[0]
        total_in = seqs.agg(F.sum(F.size("tokens"))).first()[0]
        assert total_out == total_in

    def test_bad_block(self, seqs):
        with pytest.raises(DataFrameValidationError, match="block_tokens"):
            pack_concat_chunks(seqs, 0)


class TestGreedy:
    def _reference(self, pdf, doc, cap):
        bins, cur = [], []
        for arr in pdf[pdf["doc_id"] == doc].sort_values("seq_idx")["tokens"]:
            if cur and sum(len(a) for a in cur) + len(arr) > cap:
                bins.append(cur)
                cur = []
            cur.append(list(arr))
        if cur:
            bins.append(cur)
        return bins

    def test_matches_reference_greedy(self, seqs):
        out = pack_greedy(seqs, bin_tokens=12).toPandas()
        pdf = seqs.toPandas()
        for doc in ("d0", "d1", "d2"):
            want = self._reference(pdf, doc, 12)
            got = out[out["doc_id"] == doc].sort_values("bin_id")
            assert len(got) == len(want)
            for (_, g), w in zip(got.iterrows(), want):
                flat = [t for a in w for t in a]
                assert list(g["tokens"]) == flat
                assert g["n_seqs"] == len(w) and g["n_tok"] == len(flat)

    def test_capacity_respected_except_singletons(self, seqs):
        out = pack_greedy(seqs, bin_tokens=12).toPandas()
        over = out[out["n_tok"] > 12]
        assert (over["n_seqs"] == 1).all()

    def test_nothing_lost(self, seqs):
        out = pack_greedy(seqs, bin_tokens=12)
        assert out.agg(F.sum("n_tok")).first()[0] == seqs.agg(F.sum(F.size("tokens"))).first()[0]
        assert out.agg(F.sum("n_seqs")).first()[0] == seqs.count()

    def test_partition_invariant(self, seqs):
        a = pack_greedy(seqs, 12).toPandas().sort_values(["doc_id", "bin_id"]).reset_index(drop=True)
        b = (
            pack_greedy(seqs.repartition(7), 12)
            .toPandas().sort_values(["doc_id", "bin_id"]).reset_index(drop=True)
        )
        assert a["tokens"].map(tuple).equals(b["tokens"].map(tuple))


class TestTrainingWindows:
    def test_hand_example(self, spark):
        from temporalscope_spark.operators.packing import training_windows

        df = spark.createDataFrame(
            [("a", list(range(10)))], "doc_id string, tokens array<int>"
        )
        rows = sorted(
            training_windows(df, ctx_len=3, stride=2).collect(),
            key=lambda r: r["win_id"],
        )
        # starts 0,2,4,6: context = 3 tokens, target = the next one
        assert [(r["win_id"], r["context"], r["target"]) for r in rows] == [
            (0, [0, 1, 2], 3),
            (1, [2, 3, 4], 5),
            (2, [4, 5, 6], 7),
            (3, [6, 7, 8], 9),
        ]

    def test_short_sequences_emit_nothing(self, spark):
        from temporalscope_spark.operators.packing import training_windows

        df = spark.createDataFrame(
            [("eq", [1, 2, 3]), ("plus1", [1, 2, 3, 4]), ("empty", [])],
            "doc_id string, tokens array<int>",
        )
        rows = training_windows(df, ctx_len=3).collect()
        # len == ctx_len -> nothing; len == ctx_len + 1 -> exactly one window
        assert len(rows) == 1
        assert rows[0]["doc_id"] == "plus1"
        assert rows[0]["context"] == [1, 2, 3] and rows[0]["target"] == 4

    def test_nonoverlapping_stride(self, spark):
        from temporalscope_spark.operators.packing import training_windows

        df = spark.createDataFrame(
            [("a", list(range(9)))], "doc_id string, tokens array<int>"
        )
        rows = sorted(
            training_windows(df, ctx_len=2, stride=2).collect(),
            key=lambda r: r["win_id"],
        )
        assert [(r["context"], r["target"]) for r in rows] == [
            ([0, 1], 2), ([2, 3], 4), ([4, 5], 6), ([6, 7], 8),
        ]

    def test_validation(self, spark):
        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.packing import training_windows

        df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
        with pytest.raises(DataFrameValidationError):
            training_windows(df, ctx_len=0)
        with pytest.raises(DataFrameValidationError):
            training_windows(df, ctx_len=2, stride=0)

    def test_zero_shuffle_plan(self, spark):
        from temporalscope_spark.operators.packing import training_windows

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.sequence(F.lit(0), (F.col("id") % 20).cast("int")).alias("tokens"),
        )
        plan = (
            training_windows(df, ctx_len=4, stride=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
