"""Distributed suffix array + repeated-substring mining (operators/suffix.py).

Correctness gauge: pure-Python dense rank of cap-truncated suffixes and a
brute-force adjacent-pair LCP replay over the same normalized corpus.
"""

from __future__ import annotations

import random

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.suffix import repeated_substrings, suffix_ranks


def _norm(t: str) -> str:
    import re

    return re.sub(r"\s+", " ", t.lower()).strip()


def _py_ranks(docs: dict, cap: int):
    sufs = []
    for d, t in docs.items():
        t = _norm(t)
        for p in range(1, len(t) + 1):
            sufs.append((t[p - 1 : p - 1 + cap], d, p))
    uniq = sorted({s for s, _, _ in sufs})
    rank = {s: i + 1 for i, s in enumerate(uniq)}
    return sorted((d, p, rank[s]) for s, d, p in sufs)


def _py_witnesses(docs: dict, cap: int):
    """Adjacent-pair (substring, lcp) witnesses in (rank, doc, pos) order."""
    rows = []
    for d, t in docs.items():
        t = _norm(t)
        for p in range(1, len(t) + 1):
            rows.append((t[p - 1 : p - 1 + cap], d, p))
    rows.sort()
    out = []
    for (sa, da, pa), (sb, _, _) in zip(rows, rows[1:]):
        if sa == sb:
            lcp = cap
        else:
            lcp = 0
            while lcp < min(len(sa), len(sb)) and sa[lcp] == sb[lcp]:
                lcp += 1
        norm_a = _norm(docs[da])
        s = norm_a[pa - 1 : pa - 1 + lcp]
        out.append((s, len(s)))  # clamped cut defines the honest length
    return out


@pytest.fixture(scope="module")
def rand_docs():
    rng = random.Random(5)
    docs = {}
    for i in range(12):
        docs[i] = " ".join(
            rng.choice(["ab", "abc", "cab", "bca", "xyz", "q"]) for _ in range(25)
        )
    # plant an exact long repeat across two docs
    docs[100] = "PREFIX the quick brown fox jumps over it END"
    docs[101] = "other the quick brown fox jumps over it tail"
    return docs


@pytest.fixture(scope="module")
def rand_df(spark, rand_docs):
    return spark.createDataFrame(
        list(rand_docs.items()), "doc_id long, text string"
    )


class TestSuffixRanks:
    def test_matches_pure_python_dense_rank(self, rand_df, rand_docs):
        got = sorted(
            (r["doc_id"], r["pos"], r["srank"])
            for r in suffix_ranks(rand_df, cap=16).collect()
        )
        assert got == _py_ranks(rand_docs, 16)

    def test_cap_truncation_groups(self, spark):
        # two docs equal in first 8 chars, differing at 9: equal rank at
        # cap=8, distinct at cap=16
        df = spark.createDataFrame(
            [(1, "abcdefghX"), (2, "abcdefghY")], "doc_id long, text string"
        )
        r8 = {
            (r["doc_id"], r["pos"]): r["srank"]
            for r in suffix_ranks(df, cap=8).collect()
        }
        r16 = {
            (r["doc_id"], r["pos"]): r["srank"]
            for r in suffix_ranks(df, cap=16).collect()
        }
        assert r8[(1, 1)] == r8[(2, 1)]
        assert r16[(1, 1)] != r16[(2, 1)]

    def test_prefix_sorts_before_extension(self, spark):
        df = spark.createDataFrame(
            [(1, "abab")], "doc_id long, text string"
        )
        ranks = {
            (r["doc_id"], r["pos"]): r["srank"]
            for r in suffix_ranks(df, cap=8).collect()
        }
        # suffix "ab" (pos 3) < "abab" (pos 1); "b" (pos 4) < "bab" (pos 2)
        assert ranks[(1, 3)] < ranks[(1, 1)]
        assert ranks[(1, 4)] < ranks[(1, 2)]

    def test_validation(self, rand_df):
        with pytest.raises(DataFrameValidationError):
            suffix_ranks(rand_df, cap=10)  # not a power of two
        with pytest.raises(DataFrameValidationError):
            suffix_ranks(rand_df, cap=1)

    def test_partition_invariance(self, rand_df, rand_docs):
        a = sorted(
            (r["doc_id"], r["pos"], r["srank"])
            for r in suffix_ranks(rand_df.repartition(9), cap=16).collect()
        )
        assert a == _py_ranks(rand_docs, 16)


class TestRepeatedSubstrings:
    def test_finds_planted_cross_doc_repeat(self, rand_df):
        out = repeated_substrings(rand_df, min_len=12, top_k=100, cap=64).collect()
        subs = {r["substring"] for r in out}
        assert any("the quick brown fox jumps over it" in s for s in subs)

    def test_matches_bruteforce_witness_set(self, rand_df, rand_docs):
        cap, min_len, k = 16, 4, 10
        wit = {(s, l) for s, l in _py_witnesses(rand_docs, cap) if l >= min_len}
        want = sorted(wit, key=lambda x: (-x[1], x[0]))[:k]
        ref = {}
        # occurrence counts: positions whose l-cut equals the substring
        for s, l in want:
            n = 0
            for t in rand_docs.values():
                t = _norm(t)
                for p in range(1, len(t) + 1):
                    if t[p - 1 : p - 1 + l] == s:
                        n += 1
            ref[(s, l)] = n
        got = {
            (r["substring"], r["length"]): r["n_occurrences"]
            for r in repeated_substrings(
                rand_df, min_len=min_len, top_k=k, cap=cap
            ).collect()
        }
        assert got == ref

    def test_repeat_longer_than_cap_reports_cap(self, spark):
        long = "z" * 100
        df = spark.createDataFrame(
            [(1, "a" + long), (2, "b" + long)], "doc_id long, text string"
        )
        out = repeated_substrings(df, min_len=8, top_k=3, cap=16).collect()
        assert max(r["length"] for r in out) == 16

    def test_no_repeats_empty_result(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefg"), (2, "hijklmn")], "doc_id long, text string"
        )
        out = repeated_substrings(df, min_len=3, top_k=5, cap=8)
        assert out.count() == 0

    def test_validation(self, rand_df):
        with pytest.raises(DataFrameValidationError):
            repeated_substrings(rand_df, min_len=0)
        with pytest.raises(DataFrameValidationError):
            repeated_substrings(rand_df, min_len=100, cap=64)
        with pytest.raises(DataFrameValidationError):
            repeated_substrings(rand_df, top_k=0)

    def test_min_len_one_uses_single_char_bucket(self, rand_df, rand_docs):
        # min_len=1 narrows the adjacency bucket to one character so no
        # witnessing pair can straddle buckets; compare to brute force
        cap, k = 8, 5
        wit = {(s, l) for s, l in _py_witnesses(rand_docs, cap) if l >= 1}
        want = set(sorted(wit, key=lambda x: (-x[1], x[0]))[:k])
        got = {
            (r["substring"], r["length"])
            for r in repeated_substrings(
                rand_df, min_len=1, top_k=k, cap=cap
            ).collect()
        }
        assert got == want


class TestLaneEquivalence:
    """The direct (cap <= _DIRECT_CAP) and prefix-doubling lanes must
    compute identical ranks and identical repeat tables."""

    def test_both_lanes_agree(self, rand_df, monkeypatch):
        import temporalscope_spark.operators.suffix as sx

        direct_ranks = sorted(
            tuple(r) for r in suffix_ranks(rand_df, cap=16).collect()
        )
        direct_rep = sorted(
            tuple(r)
            for r in repeated_substrings(
                rand_df, min_len=4, top_k=10, cap=16
            ).collect()
        )
        monkeypatch.setattr(sx, "_DIRECT_CAP", 1)  # force doubling lane
        assert direct_ranks == sorted(
            tuple(r) for r in suffix_ranks(rand_df, cap=16).collect()
        )
        assert direct_rep == sorted(
            tuple(r)
            for r in repeated_substrings(
                rand_df, min_len=4, top_k=10, cap=16
            ).collect()
        )
