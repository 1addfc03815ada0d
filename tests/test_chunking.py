"""Document chunking + intra-doc paragraph dedup (operators/chunking.py)
vs a pure-Python reference: coverage/overlap invariants, the n_chunks
formula, empty-doc behavior, first-occurrence paragraph semantics, and
the zero-exchange plan guarantee."""

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.chunking import chunk_words, dedup_paragraphs


def _ref_chunks(text, size, overlap):
    w = [x for x in " ".join(text.lower().split()).split(" ") if x != ""]
    stride = size - overlap
    n = len(w)
    n_chunks = 1 + math.ceil(max(0, n - size) / stride)
    return [
        (" ".join(w[i * stride : i * stride + size]),
         len(w[i * stride : i * stride + size]))
        for i in range(n_chunks)
    ]


TEXTS = [
    "a b c d e f g h i j",             # 10 words
    "one two three",                   # shorter than size
    "  ",                              # whitespace-only
    " ".join(f"w{i}" for i in range(23)),
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(TEXTS)],
        "doc_id long, text string, source string",
    )


class TestChunk:
    @pytest.mark.parametrize("size,overlap", [(5, 0), (5, 2), (8, 3), (1, 0)])
    def test_matches_reference(self, spark, size, overlap):
        out = chunk_words(_docs(spark), "text", "doc_id", size, overlap)
        got = {}
        for r in out.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["n_words"], r["n_chunks"])
            )
        for i, t in enumerate(TEXTS):
            want = _ref_chunks(t, size, overlap)
            if t.strip() == "":
                want = [("", 0)]
            rows = sorted(got[i])
            assert len(rows) == len(want)
            for cid, (ct, nw) in enumerate(want):
                assert rows[cid] == (cid, ct, nw, len(want))

    def test_every_word_covered_no_pure_overlap_chunk(self, spark):
        out = chunk_words(_docs(spark), "text", "doc_id", 5, 2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        full = " ".join(
            sorted(set(" ".join(TEXTS[3].split()).split(" ")),
                   key=lambda x: int(x[1:]))
        )
        words = set()
        for r in by_doc[3]:
            assert r["n_words"] > 2  # strictly more than the overlap
            words |= set(r["chunk_text"].split(" "))
        assert words == set(full.split(" "))

    def test_keep_cols_and_params(self, spark):
        out = chunk_words(_docs(spark), "text", "doc_id", 5, 0,
                              keep_cols=("source",))
        assert out.columns[-1] == "source"
        with pytest.raises(DataFrameValidationError):
            chunk_words(_docs(spark), size=0)
        with pytest.raises(DataFrameValidationError):
            chunk_words(_docs(spark), size=5, overlap=5)

    def test_no_exchange_in_plan(self, spark):
        out = chunk_words(_docs(spark), "text", "doc_id", 5, 2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDedupParas:
    def test_first_occurrence_kept_in_order(self, spark):
        df = spark.createDataFrame(
            [(1, "nav\nbody one\nnav\nbody two\nbody one\nfooter")],
            "doc_id long, text string",
        )
        r = dedup_paragraphs(df).collect()[0]
        assert r["n_paras"] == 6
        assert r["n_kept"] == 4
        assert r["text"] == "nav\nbody one\nbody two\nfooter"

    def test_no_dup_doc_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb\nc"), (2, "solo")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(df).collect()}
        assert got == {1: "a\nb\nc", 2: "solo"}

    def test_no_exchange_in_plan(self, spark):
        df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
        plan = dedup_paragraphs(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
