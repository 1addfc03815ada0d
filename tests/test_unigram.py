"""Unigram-LM tokenizer (operators/unigram.py) vs a dict-based reference
implementation of Kudo 2018's EM and Viterbi with the same quantization
and tie-break contracts."""

from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.bpe import word_vocab
from temporalscope_spark.operators.unigram import (
    apply_unigram,
    piece_seed,
    train_unigram,
    viterbi_word_tokens,
    word_lattice,
)

L, K = 4, 24


def _ref_vocab(texts):
    vocab = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                vocab[w] += 1
    return vocab


def _ref_seed(vocab, max_len=L, top_k=K):
    cnt = Counter()
    for w, c in vocab.items():
        for l in range(1, min(max_len, len(w)) + 1):
            for i in range(len(w) - l + 1):
                cnt[w[i : i + l]] += c
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    sel = {p for p, _ in ranked[:top_k]} | {p for p in cnt if len(p) == 1}
    tot = sum(cnt[p] for p in sel)
    return {p: (cnt[p], round(cnt[p] / tot, 12)) for p in sel}


def _ref_em_round(vocab, probs, max_len=L):
    e_cnt = Counter()
    for w, wc in vocab.items():
        n = len(w)
        edges = [
            (i, i + l, w[i : i + l])
            for l in range(1, min(max_len, n) + 1)
            for i in range(n - l + 1)
            if w[i : i + l] in probs
        ]
        a = [1.0] + [0.0] * n
        for j in range(1, n + 1):
            a[j] = sum(a[i] * probs[p] for (i, jj, p) in edges if jj == j)
        b = [0.0] * n + [1.0]
        for i in range(n - 1, -1, -1):
            b[i] = sum(probs[p] * b[jj] for (ii, jj, p) in edges if ii == i)
        for i, j, p in edges:
            e_cnt[p] += wc * a[i] * probs[p] * b[j] / a[n]
    tot = sum(e_cnt.values())
    return {p: (c, round(c / tot, 12)) for p, c in e_cnt.items()}


def _ref_viterbi(word, probs, max_len=L):
    n = len(word)
    # (ns, bi, piece) min-struct == max score, then smallest start, piece
    best = [(-1.0, -1, "")] + [None] * n
    for j in range(1, n + 1):
        cands = []
        for l in range(1, min(max_len, j) + 1):
            i = j - l
            p = word[i:j]
            if p in probs:
                cands.append((best[i][0] * probs[p], i, p))
        best[j] = min(cands)
    toks, pos = [], n
    while pos > 0:
        _, bi, piece = best[pos]
        toks.insert(0, piece)
        pos = bi
    return toks


TEXTS = [
    "abab banana bandana cab",
    "banana cabana abab abab",
    "band cab bandana banana",
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


class TestSeed:
    def test_matches_reference(self, spark, docs):
        ref = _ref_seed(_ref_vocab(TEXTS))
        vocab = word_vocab(docs, "text").select("word", "wc")
        got = {
            r["piece"]: (r["cnt"], r["prob"])
            for r in piece_seed(vocab, L, K).collect()
        }
        assert set(got) == set(ref)
        for p, (cnt, prob) in ref.items():
            assert got[p][0] == cnt
            assert got[p][1] == pytest.approx(prob, abs=1e-12)

    def test_single_chars_always_present(self, spark, docs):
        vocab = word_vocab(docs, "text").select("word", "wc")
        pieces = {r["piece"] for r in piece_seed(vocab, L, top_k=1).collect()}
        chars = {c for t in TEXTS for c in t.replace(" ", "")}
        assert chars <= pieces

    def test_validation(self, spark, docs):
        vocab = word_vocab(docs, "text").select("word", "wc")
        with pytest.raises(DataFrameValidationError):
            piece_seed(vocab, max_piece_len=0)
        with pytest.raises(DataFrameValidationError):
            piece_seed(vocab, top_k=0)


class TestEm:
    def test_two_rounds_match_reference(self, spark, docs):
        vocab = _ref_vocab(TEXTS)
        probs = {p: pr for p, (_, pr) in _ref_seed(vocab).items()}
        for _ in range(2):
            ref = _ref_em_round(vocab, probs)
            probs = {p: pr for p, (_, pr) in ref.items()}
        got = {
            r["piece"]: (r["e_cnt"], r["prob"])
            for r in train_unigram(docs, "text", num_rounds=2).collect()
        }
        assert set(got) == set(ref)
        for p, (e, pr) in ref.items():
            assert got[p][0] == pytest.approx(e, rel=1e-9)
            assert got[p][1] == pytest.approx(pr, abs=1e-11)

    def test_mass_conserved(self, spark, docs):
        # expected token total equals Σ prob = 1 after normalization
        pieces = train_unigram(docs, "text", num_rounds=1)
        tot = sum(r["prob"] for r in pieces.collect())
        assert tot == pytest.approx(1.0, abs=1e-9)

    def test_zero_rounds_returns_seed(self, spark, docs):
        seed = train_unigram(docs, "text", num_rounds=0)
        ref = _ref_seed(_ref_vocab(TEXTS))
        got = {r["piece"]: r["e_cnt"] for r in seed.collect()}
        assert got == {p: float(c) for p, (c, _) in ref.items()}

    def test_validation(self, spark, docs):
        with pytest.raises(DataFrameValidationError):
            train_unigram(docs, "text", num_rounds=-1)


class TestViterbi:
    def test_matches_reference_and_reassembles(self, spark, docs):
        vocab_df = word_vocab(docs, "text").select("word", "wc")
        pieces = train_unigram(docs, "text", num_rounds=2)
        probs = {r["piece"]: r["prob"] for r in pieces.collect()}
        edges = word_lattice(vocab_df, pieces, L)
        got = {
            r["word"]: list(r["toks"])
            for r in viterbi_word_tokens(edges, pieces).collect()
        }
        for w in _ref_vocab(TEXTS):
            assert got[w] == _ref_viterbi(w, probs)
            assert "".join(got[w]) == w

    def test_apply_empty_doc(self, spark, docs):
        pieces = train_unigram(docs, "text", num_rounds=1)
        out = {
            r["doc_id"]: (list(r["tokens"]), r["n_tok"])
            for r in apply_unigram(docs, pieces, "text", "doc_id").collect()
        }
        assert out[3] == ([], 0)
        assert all(n == len(t) for t, n in out.values())

    def test_doc_tokens_concat_to_text(self, spark, docs):
        pieces = train_unigram(docs, "text", num_rounds=2)
        out = apply_unigram(docs, pieces, "text", "doc_id").collect()
        norm = {
            i: "".join(" ".join(t.lower().split()).split(" "))
            for i, t in enumerate(TEXTS)
        }
        for r in out:
            assert "".join(r["tokens"]) == norm[r["doc_id"]]
