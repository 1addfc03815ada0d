"""Corpus BLEU (metrics/translation.py) vs a pure-Python reference:
clipping semantics (the paper's 'the the the' case), brevity penalty,
zero-precision gating, corpus pooling vs per-pair averaging, and the
zero-exchange pair stage."""

import math
from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.metrics.translation import bleu_corpus, bleu_pair_counts


def _toks(t):
    return [x for x in " ".join(t.lower().split()).split(" ") if x != ""]


def _grams(w, n):
    return ["\x1f".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def _ref_bleu(pairs, max_n=4):
    m = Counter()
    t = Counter()
    clen = rlen = 0
    for c, r in pairs:
        cw, rw = _toks(c), _toks(r)
        clen += len(cw)
        rlen += len(rw)
        for n in range(1, max_n + 1):
            cg, rg = Counter(_grams(cw, n)), Counter(_grams(rw, n))
            m[n] += sum(min(v, rg[g]) for g, v in cg.items())
            t[n] += max(0, len(cw) - n + 1)
    ps = [m[n] / t[n] if t[n] else 0.0 for n in range(1, max_n + 1)]
    bp = 1.0 if clen >= rlen else math.exp(1 - rlen / clen)
    if any(p <= 0 for p in ps):
        return ps, bp, 0.0
    return ps, bp, bp * math.exp(sum(math.log(p) for p in ps) / max_n)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, c, r) for i, (c, r) in enumerate(pairs)],
        "pair_id long, candidate string, reference string",
    )


class TestBleu:
    def test_identical_is_one(self, spark):
        pairs = [("the quick brown fox jumps over it", "the quick brown fox jumps over it")]
        r = bleu_corpus(_df(spark, pairs)).collect()[0]
        assert r["bleu"] == 1.0 and r["bp"] == 1.0
        assert all(r[f"p_{n}"] == 1.0 for n in range(1, 5))

    def test_clipping_the_the_the(self, spark):
        # Papineni et al. §2.1: candidate 'the'*7 vs ref with 2 'the' ->
        # clipped unigram precision 2/7
        pairs = [("the the the the the the the", "the cat is on the mat")]
        r = bleu_corpus(_df(spark, pairs), max_n=1).collect()[0]
        assert r["p_1"] == round(2 / 7, 6)

    def test_matches_reference_multi_pair(self, spark):
        pairs = [
            ("a b c d e f", "a b c d x f"),
            ("one two three four", "one two three four five"),
            ("zz", "a b"),
        ]
        ps, bp, bleu = _ref_bleu(pairs)
        r = bleu_corpus(_df(spark, pairs)).collect()[0]
        for n in range(1, 5):
            assert r[f"p_{n}"] == pytest.approx(round(ps[n - 1], 6), abs=1e-9)
        assert r["bp"] == pytest.approx(round(bp, 6), abs=1e-9)
        assert r["bleu"] == pytest.approx(round(bleu, 6), abs=1e-9)

    def test_zero_ngram_precision_gates_to_zero(self, spark):
        pairs = [("a b", "a c")]  # no bigram match -> bleu 0
        r = bleu_corpus(_df(spark, pairs), max_n=2).collect()[0]
        assert r["p_2"] == 0.0 and r["bleu"] == 0.0

    def test_brevity_penalty(self, spark):
        pairs = [("a b c", "a b c d e f")]  # clen 3 < rlen 6
        r = bleu_corpus(_df(spark, pairs), max_n=1).collect()[0]
        assert r["bp"] == pytest.approx(round(math.exp(1 - 6 / 3), 6))

    def test_pair_counts_stage_has_no_exchange(self, spark):
        df = _df(spark, [("a b", "a b")])
        plan = (
            bleu_pair_counts(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_param_validation(self, spark):
        with pytest.raises(DataFrameValidationError):
            bleu_corpus(_df(spark, [("a", "a")]), max_n=0)


def _ref_lcs(a, b):
    ca, cb = _toks(a), _toks(b)
    dp = [[0] * (len(cb) + 1) for _ in range(len(ca) + 1)]
    for i in range(1, len(ca) + 1):
        for j in range(1, len(cb) + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if ca[i - 1] == cb[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return dp[-1][-1]


class TestRouge:
    def test_rouge_n_matches_reference(self, spark):
        from temporalscope_spark.metrics.translation import rouge_n_corpus

        pairs = [
            ("the cat sat on the mat", "the cat was on the mat"),
            ("a b c", "a b c d"),
        ]
        m = t_c = t_r = 0
        m2 = tc2 = tr2 = 0
        for c, r in pairs:
            cw, rw = _toks(c), _toks(r)
            cg, rg = Counter(cw), Counter(rw)
            m += sum(min(v, rg[g]) for g, v in cg.items())
            t_c += len(cw)
            t_r += len(rw)
            cg2, rg2 = Counter(_grams(cw, 2)), Counter(_grams(rw, 2))
            m2 += sum(min(v, rg2[g]) for g, v in cg2.items())
            tc2 += max(0, len(cw) - 1)
            tr2 += max(0, len(rw) - 1)
        out = rouge_n_corpus(_df(spark, pairs)).collect()[0]
        assert out["rouge1_r"] == round(m / t_r, 6)
        assert out["rouge1_p"] == round(m / t_c, 6)
        p1, r1 = m / t_c, m / t_r
        assert out["rouge1_f"] == pytest.approx(
            round(2 * p1 * r1 / (p1 + r1), 6), abs=1e-9)
        assert out["rouge2_r"] == round(m2 / tr2, 6)

    def test_rouge_l_matches_dp(self, spark):
        from temporalscope_spark.metrics.translation import rouge_l_pairs

        pairs = [
            ("a b c d e", "a x c e"),          # LCS 3
            ("one two three", "three two one"),  # LCS 1
            ("same same", "same same"),          # LCS 2
            ("", "a b"),                          # LCS 0
        ]
        out = {r["pair_id"]: r for r in
               rouge_l_pairs(_df(spark, pairs)).collect()}
        for i, (c, r) in enumerate(pairs):
            want = _ref_lcs(c, r)
            assert out[i]["lcs"] == want
            if want:
                p = want / len(_toks(c))
                rr = want / len(_toks(r))
                assert out[i]["rougeL_f"] == pytest.approx(
                    round(2 * p * rr / (p + rr), 6), abs=1e-9)
            else:
                assert out[i]["rougeL_f"] == 0.0

    def test_rouge_l_no_exchange(self, spark):
        from temporalscope_spark.metrics.translation import rouge_l_pairs

        df = _df(spark, [("a b", "a b")])
        plan = rouge_l_pairs(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def _ref_chrf(pairs, max_n=6, beta=2.0):
    """Pure-Python chrF reference (Popović 2015): whitespace-stripped
    char n-grams, corpus-pooled clipped counts, effective-order means."""
    import re

    m, tc, tr = Counter(), Counter(), Counter()
    for c, r in pairs:
        cs = re.sub(r"\s+", "", c)
        rs = re.sub(r"\s+", "", r)
        for n in range(1, max_n + 1):
            cg = Counter(cs[i : i + n] for i in range(len(cs) - n + 1))
            rg = Counter(rs[i : i + n] for i in range(len(rs) - n + 1))
            m[n] += sum(min(v, rg[g]) for g, v in cg.items())
            tc[n] += max(0, len(cs) - n + 1)
            tr[n] += max(0, len(rs) - n + 1)
    pn = [m[n] / tc[n] for n in range(1, max_n + 1) if tc[n] > 0]
    rn = [m[n] / tr[n] for n in range(1, max_n + 1) if tr[n] > 0]
    p = sum(pn) / len(pn) if pn else 0.0
    r = sum(rn) / len(rn) if rn else 0.0
    b2 = beta * beta
    f = 0.0 if p + r <= 0 else (1 + b2) * p * r / (b2 * p + r)
    return p, r, f


class TestChrf:
    def _run(self, spark, pairs, **kw):
        from temporalscope_spark.metrics.translation import chrf_corpus

        df = spark.createDataFrame(pairs, "candidate string, reference string")
        return chrf_corpus(df, **kw).collect()[0]

    def test_identical_is_one(self, spark):
        row = self._run(spark, [("the cat sat on the mat", "the cat sat on the mat")])
        assert row["chrf"] == 1.0
        assert row["chrf_precision"] == 1.0 and row["chrf_recall"] == 1.0

    def test_disjoint_is_zero(self, spark):
        row = self._run(spark, [("aaaa", "bbbb")])
        assert row["chrf"] == 0.0

    def test_reference_parity(self, spark):
        pairs = [
            ("the quick brown fox jumps", "the quick brown fox jumped"),
            ("hello world", "hello there world"),
            ("a b c d e f g", "a b c d e f"),
            ("completely different text", "nothing shared here at all"),
            ("", "nonempty"),
        ]
        row = self._run(spark, pairs)
        p, r, f = _ref_chrf(pairs)
        assert row["chrf_precision"] == pytest.approx(p, abs=1e-6)
        assert row["chrf_recall"] == pytest.approx(r, abs=1e-6)
        assert row["chrf"] == pytest.approx(f, abs=1e-6)

    def test_beta_weights_recall(self, spark):
        # candidate is a prefix of the reference: recall < precision, so
        # beta=2 (recall-weighted) must score LOWER than beta=0.5
        pairs = [("the cat sat", "the cat sat on the mat by the door")]
        f2 = self._run(spark, pairs, beta=2.0)["chrf"]
        fh = self._run(spark, pairs, beta=0.5)["chrf"]
        assert f2 < fh
        p, r, f = _ref_chrf(pairs, beta=2.0)
        assert f2 == pytest.approx(f, abs=1e-6)

    def test_whitespace_invisible(self, spark):
        # chrF strips ALL whitespace: respacing must not change the score
        a = self._run(spark, [("the cat sat", "thecatsat")])
        assert a["chrf"] == 1.0

    def test_effective_order_short_strings(self, spark):
        # 3-char strings have no 4..6-grams: those orders must be skipped
        # from the means, not counted as zeros
        row = self._run(spark, [("abc", "abc")])
        assert row["chrf"] == 1.0

    def test_errors(self, spark):
        df = spark.createDataFrame([("a", "b")], "candidate string, reference string")
        from temporalscope_spark.metrics.translation import chrf_corpus

        with pytest.raises(DataFrameValidationError):
            chrf_corpus(df, max_n=0)
        with pytest.raises(DataFrameValidationError):
            chrf_corpus(df, beta=0.0)
