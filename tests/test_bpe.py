"""Distributed BPE merge learning (operators/bpe.py)."""

from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.bpe import learn_bpe_merges, word_vocab


def _brute_bpe(texts, k):
    """Reference BPE: dict-based Sennrich-style training with the same
    tie-break (freq desc, then left, then right) and greedy left-to-right
    merging."""
    vocab = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for r in range(k):
        pairs = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, a, b, f))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


class TestLearnBpeMerges:
    @pytest.mark.slow
    def test_matches_reference_bpe(self, spark):
        texts = [
            "low lower lowest low low",
            "newer newest new news",
            "wider wide widest lower",
            "low low lowest newer",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["freq"])
            for r in learn_bpe_merges(df, num_merges=6).orderBy("rank").collect()
        ]
        assert got == _brute_bpe(texts, 6)

    def test_overlapping_same_symbol_runs(self, spark):
        """'aaaa' with merge (a,a): greedy left-to-right gives (aa)(aa),
        'aaa' gives (aa)a — the island-parity closed form must match."""
        texts = ["aaaa aaa aa aaaa", "aaaa aa b"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["freq"])
            for r in learn_bpe_merges(df, num_merges=4).orderBy("rank").collect()
        ]
        assert got == _brute_bpe(texts, 4)

    def test_stops_when_exhausted(self, spark):
        df = spark.createDataFrame([(1, "ab ab"), (2, "cd")], ["doc_id", "text"])
        out = learn_bpe_merges(df, num_merges=50).collect()
        # after merging every word to a single symbol no pairs remain
        assert 0 < len(out) < 50

    def test_vocab_shape(self, spark):
        df = spark.createDataFrame([(1, "Hi  hi HO"), (2, "")], ["doc_id", "text"])
        got = {r["word"]: (r["wc"], r["syms"]) for r in word_vocab(df).collect()}
        assert got == {"hi": (2, ["h", "i"]), "ho": (1, ["h", "o"])}

    def test_num_merges_validated(self, spark):
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(DataFrameValidationError, match="num_merges"):
            learn_bpe_merges(df, num_merges=0)


class TestBpeCompressionStats:
    def test_matches_reference(self, spark):
        texts = ["low lower lowest low low", "newer newest new news", "low low"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        k = 4
        # reference: replay merges on the dict model and count symbols
        from collections import Counter

        vocab = Counter(w for t in texts for w in t.lower().split())
        syms = {w: list(w) for w in vocab}
        for _, a, b, _f in _brute_bpe(texts, k):
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        before = sum(c * len(w) for w, c in vocab.items())
        after = sum(c * len(syms[w]) for w, c in vocab.items())

        from temporalscope_spark.operators.bpe import bpe_compression_stats

        row = bpe_compression_stats(df, num_merges=k).collect()[0]
        assert row["vocab_words"] == len(vocab)
        assert row["tokens_before"] == before
        assert row["tokens_after"] == after
        assert row["compression"] == round(before / after, 6)
        assert row["compression"] > 1.0  # merges must actually compress


def _brute_apply(text, merge_pairs):
    """Greedy left-to-right application of (a, b) merges in rank order to
    each normalized word of one text."""
    toks = []
    for w in " ".join(text.lower().split()).split(" "):
        if not w:
            continue
        s = list(w)
        for a, b in merge_pairs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        toks.extend(s)
    return toks


class TestApplyBpe:
    TEXTS = [
        "low lower lowest low low",
        "newer newest new news",
        "wider wide widest lower",
        "",
        "  LOW   low ",
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], ["doc_id", "text"]
        )

    def test_matches_reference_apply(self, spark):
        from temporalscope_spark.operators.bpe import apply_bpe

        df = self._df(spark)
        merges = learn_bpe_merges(df, num_merges=6)
        pairs = [(a, b) for _, a, b, _ in _brute_bpe(self.TEXTS, 6)]
        got = {
            r["doc_id"]: (list(r["tokens"]), r["n_tok"])
            for r in apply_bpe(df, merges).collect()
        }
        for i, t in enumerate(self.TEXTS):
            want = _brute_apply(t, pairs)
            assert got[i] == (want, len(want)), i

    def test_accepts_pair_list_and_empty_doc(self, spark):
        from temporalscope_spark.operators.bpe import apply_bpe

        df = self._df(spark)
        got = {
            r["doc_id"]: (list(r["tokens"]), r["n_tok"])
            for r in apply_bpe(df, [("l", "o"), ("lo", "w")]).collect()
        }
        assert got[3] == ([], 0)  # empty text -> empty array, not a drop
        assert got[4] == (["low", "low"], 2)
        assert got[0][0][:1] == ["low"]

    def test_unmerged_words_stay_char_level(self, spark):
        from temporalscope_spark.operators.bpe import apply_bpe

        df = spark.createDataFrame([(1, "xyz ab")], ["doc_id", "text"])
        got = apply_bpe(df, [("a", "b")]).collect()[0]
        assert list(got["tokens"]) == ["x", "y", "z", "ab"]


class TestCompressionSharedRounds:
    @pytest.mark.slow
    def test_precomputed_merges_match_learned_path(self, spark):
        from temporalscope_spark.operators.bpe import bpe_compression_stats

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TestApplyBpe.TEXTS)],
            ["doc_id", "text"],
        )
        merges = learn_bpe_merges(df, num_merges=5)
        learned = bpe_compression_stats(df, num_merges=5).collect()[0]
        shared = bpe_compression_stats(df, merges=merges).collect()[0]
        assert tuple(learned) == tuple(shared)
