"""Unigram language-model scoring (operators/lm.py)."""

import math
from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.lm import score_unigram, unigram_counts


@pytest.fixture
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the the the the repeated head word"),
        (3, "zebra quux xylophone"),  # rare words -> high xent under corpus LM
        (4, ""),
        (5, "  the   QUICK  fox "),  # normalization: collapse + lowercase
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _norm_words(t):
    return [w for w in " ".join(t.lower().split()).split(" ") if w]


class TestUnigramCounts:
    def test_counts_match_bruteforce(self, spark, docs):
        got = {r["word"]: r["n"] for r in unigram_counts(docs).collect()}
        want = Counter(w for r in docs.collect() for w in _norm_words(r["text"]))
        assert got == dict(want)

    def test_vocab_truncation_is_deterministic(self, spark, docs):
        top = unigram_counts(docs, vocab_size=3).collect()
        # ties on n broken by word ascending: 'the' (7), then n=2 group
        # sorted by word — 'fox' and 'quick' both have n=2
        assert [r["word"] for r in sorted(top, key=lambda r: (-r["n"], r["word"]))] == [
            "the",
            "fox",
            "quick",
        ]

    def test_vocab_size_validated(self, spark, docs):
        with pytest.raises(DataFrameValidationError, match="vocab_size"):
            unigram_counts(docs, vocab_size=0)


class TestScoreUnigram:
    def test_matches_bruteforce(self, spark, docs):
        lm = unigram_counts(docs)
        got = {r["doc_id"]: r for r in score_unigram(docs, lm).collect()}

        counts = Counter(w for r in docs.collect() for w in _norm_words(r["text"]))
        total = float(sum(counts.values()))
        for row in docs.collect():
            words = _norm_words(row["text"])
            if not words:
                exp = (0, 0.0, 1.0)
            else:
                tf = Counter(words)
                # sorted-word fold, same order as the operator
                s = 0.0
                for w in sorted(tf):
                    s += tf[w] * math.log(counts[w] / total)
                xent = -s / len(words)
                exp = (len(words), round(xent, 6), round(math.exp(xent), 6))
            r = got[row["doc_id"]]
            assert (r["n_words"], r["xent_nats"], r["ppl"]) == exp, row["doc_id"]

    def test_rare_docs_score_worse(self, spark, docs):
        lm = unigram_counts(docs)
        got = {r["doc_id"]: r["ppl"] for r in score_unigram(docs, lm).collect()}
        # doc 3 is all singletons -> higher perplexity than the head-heavy doc 2
        assert got[3] > got[2]
        assert got[4] == 1.0  # empty doc reported, not dropped

    def test_oov_floors_at_one(self, spark, docs):
        # truncate the vocab to 1 word ('the'); everything else is OOV with
        # count floored at 1 over T = count('the')
        lm = unigram_counts(docs, vocab_size=1)
        got = {r["doc_id"]: r for r in score_unigram(docs, lm).collect()}
        t = 7.0  # 'the' occurs 7 times corpus-wide
        words = _norm_words("the quick brown fox jumps over the lazy dog")
        s = sum(
            (2 if w == "the" else 1) * math.log((7.0 if w == "the" else 1.0) / t)
            for w in sorted(set(words))
        )
        assert got[1]["xent_nats"] == round(-s / len(words), 6)

    def test_lm_join_is_broadcast(self, spark, docs):
        lm = unigram_counts(docs, vocab_size=100)
        plan = (
            score_unigram(docs, lm)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestStupidBackoff:
    def _brute(self, rows, bigram_top=None, alpha=0.4):
        import math
        from collections import Counter

        docs = {d: _norm_words(t) for d, t in rows}
        uni = Counter(w for ws in docs.values() for w in ws)
        big = Counter(
            (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1)
        )
        if bigram_top is not None:
            kept = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:bigram_top]
            big = dict(kept)
        t = float(sum(uni.values()))
        out = {}
        for d, ws in docs.items():
            if not ws:
                out[d] = (0, 0.0, 1.0)
                continue
            terms = Counter()
            for i, w in enumerate(ws):
                w1 = "" if i == 0 else ws[i - 1]
                terms[(w1, w)] += 1
            s = 0.0
            for (w1, w2), tf in sorted(terms.items()):
                if w1 == "":
                    v = math.log(uni.get(w2, 1) / t)
                elif (w1, w2) in big:
                    v = math.log(big[(w1, w2)] / uni.get(w1, 1))
                else:
                    v = math.log(alpha * uni.get(w2, 1) / t)
                s += tf * v
            xent = -s / len(ws)
            out[d] = (len(ws), round(xent, 6), round(math.exp(xent), 6))
        return out

    def test_matches_bruteforce(self, spark, docs):
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
            unigram_counts,
        )

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        uni = unigram_counts(docs)
        big = bigram_counts(docs)
        got = {
            r["doc_id"]: (r["n_words"], r["xent_nats"], r["ppl"])
            for r in score_stupid_backoff(docs, uni, big).collect()
        }
        assert got == self._brute(rows)

    @pytest.mark.slow
    def test_backoff_path_exercised(self, spark, docs):
        """Truncating the bigram table to 2 entries forces real backoff."""
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
            unigram_counts,
        )

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        uni = unigram_counts(docs)
        big = bigram_counts(docs, top_k=2)
        got = {
            r["doc_id"]: (r["n_words"], r["xent_nats"], r["ppl"])
            for r in score_stupid_backoff(docs, uni, big).collect()
        }
        want = self._brute(rows, bigram_top=2)
        assert got == want
        # sanity: the truncated model scores strictly worse on doc 1
        full = {
            r["doc_id"]: r["ppl"]
            for r in score_stupid_backoff(docs, uni, bigram_counts(docs)).collect()
        }
        assert got[1][2] > full[1]

    def test_repeated_bigrams_score_well(self, spark):
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
            unigram_counts,
        )

        df = spark.createDataFrame(
            [(1, "a b a b a b a b"), (2, "a x b a q b p a"), (3, "")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r
            for r in score_stupid_backoff(
                df, unigram_counts(df), bigram_counts(df)
            ).collect()
        }
        assert got[1]["ppl"] < got[2]["ppl"]
        assert (got[3]["n_words"], got[3]["ppl"]) == (0, 1.0)

    def test_alpha_validated(self, spark, docs):
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
            unigram_counts,
        )

        with pytest.raises(DataFrameValidationError, match="alpha"):
            score_stupid_backoff(
                docs, unigram_counts(docs), bigram_counts(docs), alpha=0.0
            )


class TestScoreKneserNey:
    @staticmethod
    def _brute(rows, bigram_top=None, d=0.75):
        big = Counter()
        for _, t in rows:
            ws = _norm_words(t)
            for i in range(1, len(ws)):
                big[(ws[i - 1], ws[i])] += 1
        if bigram_top is not None:
            kept = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))
            big = dict(kept[:bigram_top])
        c1, nl, r = Counter(), Counter(), Counter()
        for (w1, w2), n in big.items():
            c1[w1] += n
            nl[w1] += 1
            r[w2] += 1
        B = float(len(big))
        out = {}
        for did, t in rows:
            ws = _norm_words(t)
            if not ws:
                out[did] = (0, 0.0, 1.0)
                continue
            terms = Counter()
            for i, w in enumerate(ws):
                terms[("" if i == 0 else ws[i - 1], w)] += 1
            s = 0.0
            for (w1, w2), tf in sorted(terms.items()):
                pcont = max(float(r.get(w2, 0)), 1.0) / B
                if w1 != "" and w1 in c1:
                    n12 = float(big.get((w1, w2), 0))
                    p = max(n12 - d, 0.0) / c1[w1] + d * nl[w1] / c1[w1] * pcont
                else:
                    p = pcont
                s += tf * math.log(p)
            xent = -s / len(ws)
            out[did] = (len(ws), round(xent, 6), round(math.exp(xent), 6))
        return out

    def test_matches_bruteforce(self, spark, docs):
        from temporalscope_spark.operators.lm import bigram_counts, score_kneser_ney

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        got = {
            r["doc_id"]: (r["n_words"], r["xent_nats"], r["ppl"])
            for r in score_kneser_ney(docs, bigram_counts(docs)).collect()
        }
        assert got == self._brute(rows)

    def test_truncated_table_stays_consistent(self, spark, docs):
        """Unseen-context path (w1 absent from the truncated table)
        falls back to the continuation distribution, and ppl never
        drops below 1 — the marginals derive from the SAME table, so
        truncation can't produce the inconsistent-tables pathology the
        Stupid Backoff floor guards against."""
        from temporalscope_spark.operators.lm import bigram_counts, score_kneser_ney

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        big = bigram_counts(docs, top_k=2)
        got = {
            r["doc_id"]: (r["n_words"], r["xent_nats"], r["ppl"])
            for r in score_kneser_ney(docs, big).collect()
        }
        assert got == self._brute(rows, bigram_top=2)
        assert all(v[2] >= 1.0 for v in got.values())

    def test_repeated_bigrams_score_well(self, spark):
        from temporalscope_spark.operators.lm import bigram_counts, score_kneser_ney

        df = spark.createDataFrame(
            [(1, "a b a b a b a b"), (2, "a x b a q b p a"), (3, "")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r
            for r in score_kneser_ney(df, bigram_counts(df)).collect()
        }
        assert got[1]["ppl"] < got[2]["ppl"]
        assert (got[3]["n_words"], got[3]["ppl"]) == (0, 1.0)

    def test_discount_validated(self, spark, docs):
        from temporalscope_spark.operators.lm import bigram_counts, score_kneser_ney

        with pytest.raises(DataFrameValidationError, match="discount"):
            score_kneser_ney(docs, bigram_counts(docs), discount=1.0)
        with pytest.raises(DataFrameValidationError, match="discount"):
            score_kneser_ney(docs, bigram_counts(docs), discount=0.0)


class TestPplBuckets:
    def test_buckets_match_bruteforce(self, spark, docs):
        from temporalscope_spark.operators.lm import ppl_buckets, unigram_counts

        lm = unigram_counts(docs)
        got = {r["doc_id"]: r for r in ppl_buckets(docs, lm).collect()}
        # replicate: exact quantile_cont (type-7) over non-empty docs' ppl
        ppls = sorted(got[d]["ppl"] for d in got if got[d]["n_words"] > 0)

        def qcont(xs, f):
            h = (len(xs) - 1) * f
            lo, hi = int(h), min(int(h) + 1, len(xs) - 1)
            return xs[lo] + (h - lo) * (xs[hi] - xs[lo])

        c1, c2 = qcont(ppls, 0.333333), qcont(ppls, 0.666667)
        for d, r in got.items():
            if r["n_words"] == 0:
                assert r["bucket"] == "empty", d
            elif r["ppl"] <= c1:
                assert r["bucket"] == "head", d
            elif r["ppl"] <= c2:
                assert r["bucket"] == "middle", d
            else:
                assert r["bucket"] == "tail", d
        # non-vacuous: every non-empty label appears in this fixture
        labels = {r["bucket"] for r in got.values()}
        assert {"head", "middle", "tail", "empty"} <= labels | {"empty"}
        assert got[4]["bucket"] == "empty"

    def test_cuts_validated(self, spark, docs):
        from temporalscope_spark.operators.lm import ppl_buckets, unigram_counts

        with pytest.raises(DataFrameValidationError, match="cuts"):
            ppl_buckets(docs, unigram_counts(docs), cuts=(0.7, 0.3))


class TestBackoffDenominatorFloor:
    def test_truncated_unigram_table_never_yields_ppl_below_one(self, spark):
        """A unigram table that does not cover the bigram table's left
        words must not produce ln(n12/1) > 0 scores (ppl < 1)."""
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta alpha beta alpha beta"), (2, "gamma delta")],
            ["doc_id", "text"],
        )
        # truncated unigram vocabulary: 'alpha' (the hot w1) is MISSING
        uni = spark.createDataFrame(
            [("gamma", 1), ("delta", 1)], ["word", "n"]
        )
        big = bigram_counts(df)
        got = {
            r["doc_id"]: r for r in score_stupid_backoff(df, uni, big).collect()
        }
        # seen bigram (alpha, beta) n12=3, c1 missing -> floor at n12:
        # score ln(3/3)=0, never ln(3/1)>0
        assert got[1]["ppl"] >= 1.0
        assert got[2]["ppl"] >= 1.0

    def test_floor_inactive_with_covering_table(self, spark, docs):
        """With a full unigram table (c1 >= n12 always) the floor is a
        no-op — scores identical to the pre-floor formula."""
        from temporalscope_spark.operators.lm import (
            bigram_counts,
            score_stupid_backoff,
            unigram_counts,
        )

        uni = unigram_counts(docs)
        big = bigram_counts(docs)
        got = {r["doc_id"]: r["xent_nats"]
               for r in score_stupid_backoff(docs, uni, big).collect()}
        # replicate doc 1's first-position + seen-bigram scores by hand
        rows = {r["doc_id"]: r["text"] for r in docs.collect()}
        uni_c = Counter(w for t in rows.values() for w in _norm_words(t))
        tot = sum(uni_c.values())
        big_c = Counter()
        for t in rows.values():
            ws = _norm_words(t)
            big_c.update(zip(ws, ws[1:]))
        ws = _norm_words(rows[1])
        s = math.log(uni_c[ws[0]] / tot)
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big_c:
                s += math.log(big_c[(a, b)] / uni_c[a])
            else:
                s += math.log(0.4 * uni_c[b] / tot)
        assert got[1] == round(-s / len(ws), 6)


class TestPplBucketsApprox:
    def test_approx_labels_match_exact_within_rank_tolerance(self, spark):
        """percentile_approx rank error <= 1/accuracy: labels may differ
        from the exact lane only for docs whose ppl sits within that
        sliver of a cut point."""
        from temporalscope_spark.operators.lm import ppl_buckets, unigram_counts

        rows = [
            (i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(12)))
            for i in range(300)
        ] + [(300, "")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        lm = unigram_counts(docs)
        exact = {r["doc_id"]: r for r in ppl_buckets(docs, lm).collect()}
        approx = {
            r["doc_id"]: r for r in ppl_buckets(docs, lm, approx=True).collect()
        }
        ppls = sorted(r["ppl"] for r in exact.values() if r["n_words"] > 0)
        n = len(ppls)
        # rank window around each exact cut that approx may legally cross
        # (default accuracy 10000 -> rank error <= n/10000, i.e. <1 row
        # here; allow 1 row of slack for boundary-value equality)
        tol_ranks = max(1, n // 10000 + 1)
        import bisect

        mismatched = [
            d for d in exact if exact[d]["bucket"] != approx[d]["bucket"]
        ]
        for d in mismatched:
            r = bisect.bisect_left(ppls, exact[d]["ppl"])
            near_cut = any(
                abs(r - round(f * (n - 1))) <= tol_ranks
                for f in (0.333333, 0.666667)
            )
            assert near_cut, (d, exact[d]["ppl"], exact[d]["bucket"],
                              approx[d]["bucket"])
        # and the lanes agree on the overwhelming majority
        assert len(mismatched) <= tol_ranks * 2

    def test_release_frees_scored_cache(self, spark, docs):
        from temporalscope_spark.core.caching import release
        from temporalscope_spark.operators.lm import ppl_buckets, unigram_counts

        before = len(spark.sparkContext._jsc.getPersistentRDDs())
        out = ppl_buckets(docs, unigram_counts(docs))
        out.count()
        assert len(spark.sparkContext._jsc.getPersistentRDDs()) > before
        release(out)
        assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before


class TestGoodTuring:
    def test_reference_parity(self, spark):
        from temporalscope_spark.operators.lm import good_turing_counts

        rows = [
            (1, "a a a a b b b c c d"),
            (2, "e f g a b"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        # counts: a=5 b=4 c=2 d=1 e=1 f=1 g=1 -> N=15
        # N_1=4, N_2=1, N_4=1, N_5=1
        got = {r["r"]: r for r in good_turing_counts(df).collect()}
        assert set(got) == {0, 1, 2, 4, 5}
        assert got[0]["gt_mass"] == pytest.approx(4 / 15, abs=1e-6)
        assert got[0]["n_r"] is None and got[0]["mass"] == 0.0
        # r=1: r* = 2 * N_2/N_1 = 2*1/4 = 0.5
        assert got[1]["n_r"] == 4
        assert got[1]["r_star"] == pytest.approx(0.5, abs=1e-6)
        assert got[1]["p_gt"] == pytest.approx(0.5 / 15, abs=1e-6)
        assert got[1]["mass"] == pytest.approx(4 / 15, abs=1e-6)
        assert got[1]["gt_mass"] == pytest.approx(4 * 0.5 / 15, abs=1e-6)
        # r=2: N_3 = 0 -> NULL r*
        assert got[2]["r_star"] is None and got[2]["p_gt"] is None
        # r=4: r* = 5 * N_5/N_4 = 5
        assert got[4]["r_star"] == pytest.approx(5.0, abs=1e-6)
        # r=5 is the max count: NULL r*
        assert got[5]["r_star"] is None

    def test_raw_mass_sums_to_one(self, spark):
        from temporalscope_spark.operators.lm import good_turing_counts

        rows = [(1, "x y z x y x w v u t s r"), (2, "q p o n m x")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        body = [r for r in good_turing_counts(df).collect() if r["r"] > 0]
        assert sum(r["mass"] for r in body) == pytest.approx(1.0, abs=1e-5)

    def test_normalization_shared_with_unigram(self, spark):
        from temporalscope_spark.operators.lm import good_turing_counts

        df = spark.createDataFrame(
            [(1, "  The   THE the  "), (2, "")], ["doc_id", "text"]
        )
        got = {r["r"]: r for r in good_turing_counts(df).collect()}
        # one word 'the' x3: N_3 = 1, N = 3, unseen mass 0 (no singletons)
        assert got[3]["n_r"] == 1
        assert got[0]["gt_mass"] == 0.0
