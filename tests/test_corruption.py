"""Span corruption + FIM: pure-Python replay parity, reconstruction
invariants, determinism, and validation contracts."""

from __future__ import annotations

import hashlib
import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corruption import fim_split, span_corruption


def u01(key, seed, draw):
    h = hashlib.md5(f"{key}#{seed}#{draw}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def py_span_corruption(doc_id, toks, rate=0.15, mean_span=3, seed=42):
    L = len(toks)
    if L < mean_span:
        return 0, [str(t) for t in toks], []
    n = max(1, math.floor(L * rate / mean_span + 0.5))
    spans = []
    for i in range(n):
        lo = math.floor(i * L / n) + 1
        hi = math.floor((i + 1) * L / n)
        seg_len = hi - lo + 1
        ln = min(mean_span, seg_len)
        off = math.floor(u01(doc_id, seed, i) * (seg_len - ln + 1))
        spans.append((lo + off, ln, i))
    inp, tgt = [], []
    covered = {}
    for start, ln, i in spans:
        for p in range(start, start + ln):
            covered[p] = (i, p == start)
    for p in range(1, L + 1):
        if p in covered:
            i, head = covered[p]
            if head:
                inp.append(f"<extra_id_{i}>")
                tgt.append(f"<extra_id_{i}>")
            tgt.append(str(toks[p - 1]))
        else:
            inp.append(str(toks[p - 1]))
    tgt.append(f"<extra_id_{n}>")
    return n, inp, tgt


def py_fim(doc_id, toks, fraction=0.5, seed=42, min_len=3):
    L = len(toks)
    s = [str(t) for t in toks]
    if not (u01(doc_id, seed, 0) < fraction and L >= min_len):
        return False, s, [], [], s
    u1, u2 = u01(doc_id, seed, 1), u01(doc_id, seed, 2)
    lo = min(math.floor(min(u1, u2) * (L + 1)), L)
    hi = min(math.floor(max(u1, u2) * (L + 1)), L)
    pre, mid, suf = s[:lo], s[lo:hi], s[hi:]
    return True, pre, mid, suf, ["<PRE>"] + pre + ["<SUF>"] + suf + ["<MID>"] + mid


@pytest.fixture()
def docs(spark):
    rows = [
        (i, list(range(i % 23, i % 23 + (i * 7) % 40)))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


class TestSpanCorruption:
    def test_replay_parity(self, spark, docs):
        got = {
            r["doc_id"]: r
            for r in span_corruption(docs, rate=0.2, mean_span=3, seed=7).collect()
        }
        for i in range(60):
            toks = list(range(i % 23, i % 23 + (i * 7) % 40))
            n, inp, tgt = py_span_corruption(i, toks, rate=0.2, mean_span=3, seed=7)
            r = got[i]
            assert r["n_spans"] == n, i
            assert r["input_tokens"] == inp, i
            assert r["target_tokens"] == tgt, i
            assert r["n_tok"] == len(toks)

    def test_reconstruction(self, spark, docs):
        # splice: walking input and target together recovers the original
        for r in span_corruption(docs, seed=11).collect():
            if r["n_spans"] == 0:
                assert r["target_tokens"] == []
                continue
            tgt = r["target_tokens"]
            spans = {}
            cur = None
            for t in tgt:
                if t.startswith("<extra_id_"):
                    cur = t
                    spans[cur] = []
                else:
                    spans[cur].append(t)
            rebuilt = []
            for t in r["input_tokens"]:
                rebuilt.extend(spans.get(t, [t]))
            orig = [
                str(v)
                for v in range(
                    r["doc_id"] % 23, r["doc_id"] % 23 + (r["doc_id"] * 7) % 40
                )
            ]
            assert rebuilt == orig

    def test_rate_scales_spans(self, spark, docs):
        lo = span_corruption(docs, rate=0.05, mean_span=3).agg(
            {"n_spans": "sum"}
        ).collect()[0][0]
        hi = span_corruption(docs, rate=0.5, mean_span=3).agg(
            {"n_spans": "sum"}
        ).collect()[0][0]
        assert hi > lo

    def test_partition_invariance(self, spark, docs):
        a = sorted(
            map(tuple, span_corruption(docs, seed=3).collect())
        )
        b = sorted(
            map(tuple, span_corruption(docs.repartition(7), seed=3).collect())
        )
        assert a == b

    def test_validation(self, spark, docs):
        with pytest.raises(DataFrameValidationError):
            span_corruption(docs, rate=0.0)
        with pytest.raises(DataFrameValidationError):
            span_corruption(docs, mean_span=0)


class TestFim:
    def test_replay_parity(self, spark, docs):
        got = {r["doc_id"]: r for r in fim_split(docs, seed=5).collect()}
        n_fim = 0
        for i in range(60):
            toks = list(range(i % 23, i % 23 + (i * 7) % 40))
            is_fim, pre, mid, suf, fim = py_fim(i, toks, seed=5)
            r = got[i]
            assert r["is_fim"] == is_fim, i
            assert r["prefix"] == pre, i
            assert r["middle"] == mid, i
            assert r["suffix"] == suf, i
            assert r["fim_tokens"] == fim, i
            n_fim += is_fim
        assert 0 < n_fim < 60  # both lanes exercised

    def test_parts_reassemble(self, spark, docs):
        for r in fim_split(docs, fraction=1.0, min_len=1, seed=2).collect():
            orig = [
                str(v)
                for v in range(
                    r["doc_id"] % 23, r["doc_id"] % 23 + (r["doc_id"] * 7) % 40
                )
            ]
            if r["is_fim"]:
                assert r["prefix"] + r["middle"] + r["suffix"] == orig
            else:  # only empty docs escape fraction=1.0/min_len=1
                assert orig == []

    def test_spm_order(self, spark, docs):
        for r in fim_split(docs, fraction=1.0, min_len=1, seed=2, spm=True).collect():
            if r["is_fim"]:
                assert r["fim_tokens"][:2] == ["<PRE>", "<SUF>"]
                exp = (
                    ["<PRE>", "<SUF>"]
                    + r["suffix"]
                    + ["<MID>"]
                    + r["middle"]
                    + r["prefix"]
                )
                assert r["fim_tokens"] == exp

    def test_fraction_zero(self, spark, docs):
        out = fim_split(docs, fraction=0.0).collect()
        assert all(not r["is_fim"] for r in out)
        for r in out:
            assert r["fim_tokens"] == r["prefix"]

    def test_validation(self, spark, docs):
        with pytest.raises(DataFrameValidationError):
            fim_split(docs, fraction=1.5)
        with pytest.raises(DataFrameValidationError):
            fim_split(docs, min_len=0)


class TestChatPack:
    @pytest.fixture()
    def convs(self, spark):
        rows = [
            (1, 0, "system", ["be", "helpful"]),
            (1, 1, "user", ["hi", "there"]),
            (1, 2, "assistant", ["hello"]),
            (1, 3, "user", ["bye"]),
            (1, 4, "assistant", ["see", "you"]),
            (2, 0, "user", ["lone"]),
            (3, 1, "assistant", []),
        ]
        return spark.createDataFrame(
            rows, "conv_id long, turn_id long, role string, tokens array<string>"
        )

    def test_assembly(self, spark, convs):
        from temporalscope_spark.operators.packing import chat_pack

        got = {r["conv_id"]: r for r in chat_pack(convs).collect()}
        assert got[1]["n_turns"] == 5
        assert got[1]["tokens"] == [
            "<|system|>", "be", "helpful",
            "<|user|>", "hi", "there",
            "<|assistant|>", "hello",
            "<|user|>", "bye",
            "<|assistant|>", "see", "you",
        ]
        assert got[1]["loss_mask"] == [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 1]
        assert got[2]["tokens"] == ["<|user|>", "lone"]
        assert got[2]["loss_mask"] == [0, 0]
        assert got[3]["tokens"] == ["<|assistant|>"]
        assert got[3]["loss_mask"] == [0]

    def test_mask_parallel(self, spark, convs):
        from temporalscope_spark.operators.packing import chat_pack

        for r in chat_pack(convs, loss_roles=("assistant", "user")).collect():
            assert len(r["tokens"]) == len(r["loss_mask"])
            # headers always 0
            for t, m in zip(r["tokens"], r["loss_mask"]):
                if t.startswith("<|"):
                    assert m == 0

    def test_partition_invariance(self, spark, convs):
        from temporalscope_spark.operators.packing import chat_pack

        a = sorted(map(tuple, chat_pack(convs).collect()))
        b = sorted(map(tuple, chat_pack(convs.repartition(5)).collect()))
        assert a == b

    def test_validation(self, spark, convs):
        from temporalscope_spark.operators.packing import chat_pack

        with pytest.raises(DataFrameValidationError):
            chat_pack(convs, loss_roles=())
        with pytest.raises(DataFrameValidationError):
            chat_pack(convs, header_fmt="nope")
