"""WordPiece (operators/wordpiece.py) vs a dict-based reference
implementation of the likelihood-scored merge loop and the BERT greedy
longest-match tokenizer (max_input_chars_per_word / [UNK] contracts)."""

from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.wordpiece import (
    UNK,
    apply_wordpiece,
    learn_wordpiece,
    wordpiece_pieces,
    wp_word_vocab,
)

TEXTS = [
    "low low low lower lowest",
    "new newer newest low new",
    "wide wider widest new low",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_vocab(texts):
    vocab = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                vocab[w] += 1
    return {
        w: (c, [w[0]] + ["##" + ch for ch in w[1:]]) for w, c in vocab.items()
    }


def _ref_merge_rounds(vocab, num_merges):
    """vocab: word -> (wc, syms). Returns merge list [(lhs, rhs, freq,
    score)] and the final vocab, replicating the greedy left-to-right
    islands+parity rewrite with '##' stripping."""
    merges = []
    for _ in range(num_merges):
        pair_f, sym_f = Counter(), Counter()
        for w, (wc, syms) in vocab.items():
            for s in syms:
                sym_f[s] += wc
            for a, b in zip(syms, syms[1:]):
                pair_f[(a, b)] += wc
        if not pair_f:
            break
        scored = {
            (a, b): f / (sym_f[a] * sym_f[b]) for (a, b), f in pair_f.items()
        }
        (a, b), sc = min(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, pair_f[(a, b)], sc))
        new = a + (b[2:] if b.startswith("##") else b)
        nv = {}
        for w, (wc, syms) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[w] = (wc, out)
        vocab = nv
    return merges, vocab


def _ref_tokenize(word, pieces, max_chars):
    """BERT WordpieceTokenizer greedy longest-match."""
    if len(word) > max_chars:
        return [UNK]
    toks, pos = [], 0
    while pos < len(word):
        best = None
        for ln in range(len(word) - pos, 0, -1):
            cand = word[pos : pos + ln]
            key = "##" + cand if pos > 0 else cand
            if key in pieces:
                best = key
                break
        if best is None:
            return [UNK]
        toks.append(best)
        pos += len(best) - 2 if best.startswith("##") else len(best)
    return toks


def test_wp_word_vocab_marks_continuations(spark):
    rows = {r["word"]: r for r in wp_word_vocab(_docs(spark)).collect()}
    assert rows["low"]["syms"] == ["l", "##o", "##w"]
    assert rows["low"]["wc"] == 5


def test_learned_merges_match_reference(spark):
    got = learn_wordpiece(_docs(spark), "text", num_merges=6).orderBy("rank").collect()
    ref, _ = _ref_merge_rounds(_ref_vocab(TEXTS), 6)
    assert len(got) == len(ref)
    for r, (a, b, f, sc) in zip(got, ref):
        assert (r["lhs"], r["rhs"], r["freq"]) == (a, b, f)
        assert r["score"] == pytest.approx(round(sc, 6), abs=1e-12)


def test_pieces_precomputed_merges_equal_trained(spark):
    docs = _docs(spark)
    m = learn_wordpiece(docs, "text", num_merges=4)
    direct = {r["piece"] for r in wordpiece_pieces(docs, "text", num_merges=4).collect()}
    shared = {r["piece"] for r in wordpiece_pieces(docs, "text", merges=m).collect()}
    assert direct == shared
    # alphabet + merge outputs, '##' stripped on the right side only
    ref, _ = _ref_merge_rounds(_ref_vocab(TEXTS), 4)
    outs = {a + (b[2:] if b.startswith("##") else b) for a, b, _, _ in ref}
    assert outs <= direct


def test_apply_matches_reference_tokenizer(spark):
    docs = _docs(spark)
    pieces_df = wordpiece_pieces(docs, "text", num_merges=6)
    pieces = {r["piece"] for r in pieces_df.collect()}
    got = {
        r["doc_id"]: (r["tokens"], r["n_tok"])
        for r in apply_wordpiece(docs, pieces_df, "text", "doc_id", max_chars=12).collect()
    }
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.lower().split():
            want += _ref_tokenize(w, pieces, 12)
        assert got[i] == (want, len(want)), f"doc {i}"


def test_apply_unk_contracts(spark):
    docs = spark.createDataFrame(
        [(0, "abc zzzz toolongword"), (1, "   ")], "doc_id long, text string"
    )
    pieces = spark.createDataFrame(
        [("a",), ("##b",), ("##c",), ("t",)], "piece string"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in apply_wordpiece(docs, pieces, "text", "doc_id", max_chars=8).collect()
    }
    # 'abc' fully covered; 'zzzz' has no match at pos 1 -> [UNK];
    # 'toolongword' (11 chars) exceeds max_chars=8 -> [UNK];
    # whitespace-only text -> empty array
    assert got[0] == ["a", "##b", "##c", UNK, UNK]
    assert got[1] == []


def test_validation_errors(spark):
    docs = _docs(spark)
    with pytest.raises(DataFrameValidationError):
        learn_wordpiece(docs, "text", num_merges=0)
    with pytest.raises(DataFrameValidationError):
        apply_wordpiece(docs, wordpiece_pieces(docs, num_merges=1), max_chars=0)
