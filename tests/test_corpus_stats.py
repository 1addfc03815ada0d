"""Corpus statistics operators (operators/corpus_stats.py)."""

from __future__ import annotations

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import (
    heavy_hitters,
    length_histogram,
    token_quantiles,
    tokenizer_fertility,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "web", 22),
        (2, "the dog", "web", 7),
        (3, "cat cat cat", "books", 11),
        (4, "", "books", 0),
        (5, "one two three four five six", "web", 27),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source", "n_chars"])


class TestHeavyHitters:
    def test_counts_and_order(self, docs):
        out = heavy_hitters(docs, "text", k=3).toPandas()
        # 'cat' 4, 'the' 3, then alphabetical among count-1... next is count 1
        assert list(out["word"][:2]) == ["cat", "the"]
        assert list(out["n"][:2]) == [4, 3]
        assert len(out) == 3

    def test_empty_docs_excluded(self, docs):
        out = heavy_hitters(docs, "text", k=100).toPandas()
        assert "" not in set(out["word"])

    def test_min_count_filter(self, docs):
        out = heavy_hitters(docs, "text", k=100, min_count=2).toPandas()
        assert set(out["word"]) == {"cat", "the"}

    def test_k_validation(self, docs):
        with pytest.raises(DataFrameValidationError):
            heavy_hitters(docs, "text", k=0)

    def test_topk_plan_no_global_sort(self, docs):
        plan = heavy_hitters(docs, "text", k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestTokenQuantiles:
    def test_exact_matches_numpy(self, docs):
        out = token_quantiles(docs, "text", group_col="source").toPandas().set_index("source")
        web = np.array([6, 2, 6])  # docs 1, 2, 5
        books = np.array([3, 0])  # docs 3, 4
        # type-7 (linear interpolation) == numpy default
        assert out.loc["web", "p50"] == pytest.approx(np.percentile(web, 50))
        assert out.loc["web", "p90"] == pytest.approx(np.percentile(web, 90))
        assert out.loc["books", "p50"] == pytest.approx(np.percentile(books, 50))
        assert out.loc["web", "n_docs"] == 3

    def test_global_group(self, docs):
        out = token_quantiles(docs, "text", group_col=None).toPandas()
        assert len(out) == 1
        assert out["n_docs"].iloc[0] == 5

    def test_approx_within_bounds(self, spark):
        # 1000 docs with token counts 1..1000: approx p50 must land within
        # the sketch's rank-error bound of the true median
        rows = [(i, " ".join(["w"] * i)) for i in range(1, 1001)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = token_quantiles(df, "text", group_col=None, approx=True).toPandas()
        assert abs(out["p50"].iloc[0] - 500) <= 20


class TestLengthHistogram:
    def test_bins(self, docs):
        out = length_histogram(docs, "n_chars", bin_width=10).toPandas()
        got = dict(zip(out["bin_start"], out["n"]))
        assert got == {0: 2, 10: 1, 20: 2}

    def test_width_validation(self, docs):
        with pytest.raises(DataFrameValidationError):
            length_histogram(docs, "n_chars", bin_width=0)


class TestSkewProfile:
    def test_top_keys_and_fractions(self, spark):
        from temporalscope_spark.operators.corpus_stats import skew_profile

        rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",), ("b",)]
        df = spark.createDataFrame(rows, ["k"])
        out = skew_profile(df, "k", k=2).toPandas()
        assert list(out["k"]) == ["hot", "warm"]
        assert list(out["n"]) == [6, 3]
        assert out["fraction"].iloc[0] == pytest.approx(6 / 11, abs=1e-6)

    def test_tie_break_deterministic(self, spark):
        from temporalscope_spark.operators.corpus_stats import skew_profile

        df = spark.createDataFrame([("b",), ("a",), ("c",)], ["k"])
        out = skew_profile(df, "k", k=2).toPandas()
        assert list(out["k"]) == ["a", "b"]  # equal counts -> key order

    def test_k_validation(self, spark):
        from temporalscope_spark.operators.corpus_stats import skew_profile

        df = spark.createDataFrame([("a",)], ["k"])
        with pytest.raises(DataFrameValidationError):
            skew_profile(df, "k", k=0)


class TestTokenizerFertility:
    def test_ratio_is_sum_ratio(self, docs):
        out = tokenizer_fertility(docs, "text", group_col="source").toPandas().set_index("source")
        # plain lowercase words: BPE regex == whitespace tokens -> fertility 1
        assert out.loc["web", "fertility"] == pytest.approx(1.0)
        assert out.loc["web", "ws_tokens"] == 14
        assert out.loc["books", "ws_tokens"] == 3

    def test_punct_raises_fertility(self, spark):
        df = spark.createDataFrame(
            [(1, "foo.bar(x=1); qux!", "code")], ["doc_id", "text", "source"]
        )
        out = tokenizer_fertility(df, "text", group_col="source").toPandas()
        assert out["fertility"].iloc[0] > 2.0

    def test_empty_corpus_null_fertility(self, spark):
        df = spark.createDataFrame([(1, "", "x")], ["doc_id", "text", "source"])
        out = tokenizer_fertility(df, "text", group_col="source").toPandas()
        assert out["ws_tokens"].iloc[0] == 0
        assert out["fertility"].isna().iloc[0]


class TestCountMinSketch:
    def test_overestimate_never_under(self, spark, docs):
        """CMS guarantee: est >= exact for every word, est == exact when the
        width is roomy enough that no buckets collide."""
        from temporalscope_spark.operators.corpus_stats import (
            countmin_estimate,
            countmin_sketch,
            heavy_hitters,
        )

        exact = {r["word"]: r["n"] for r in heavy_hitters(docs, k=1000).collect()}
        probes = spark.createDataFrame([(w,) for w in exact], "word string")
        for width in (8, 4096):
            sk = countmin_sketch(docs, depth=3, width=width)
            est = {
                r["word"]: r["est"]
                for r in countmin_estimate(sk, probes, depth=3, width=width).collect()
            }
            assert set(est) == set(exact)
            assert all(est[w] >= exact[w] for w in exact)
        # roomy width: no collisions among this tiny vocabulary
        assert est == exact

    def test_unseen_word_can_be_zero(self, spark, docs):
        from temporalscope_spark.operators.corpus_stats import (
            countmin_estimate,
            countmin_sketch,
        )

        sk = countmin_sketch(docs, depth=4, width=4096)
        probes = spark.createDataFrame([("qqzebra",)], "word string")
        [row] = countmin_estimate(sk, probes, depth=4, width=4096).collect()
        assert row["est"] == 0

    def test_bucket_matches_hashlib_and_bounded(self, spark, docs):
        """Replay one word's buckets with python hashlib (pins the oracle
        arithmetic); the sketch never exceeds depth*width rows."""
        import hashlib

        from temporalscope_spark.operators.corpus_stats import countmin_sketch

        depth, width, seed = 3, 32, 5
        sk = countmin_sketch(docs, depth=depth, width=width, seed=seed)
        assert sk.count() <= depth * width
        one = spark.createDataFrame([(1, "hello")], "doc_id int, text string")
        rows = countmin_sketch(one, depth=depth, width=width, seed=seed).collect()
        got = {(r["j"], r["bucket"]) for r in rows}
        want = {
            (j, int(hashlib.md5(f"hello#{seed}#{j}".encode()).hexdigest()[:8], 16) % width)
            for j in range(depth)
        }
        assert got == want

    def test_validation(self, spark, docs):
        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.corpus_stats import (
            countmin_estimate,
            countmin_sketch,
        )

        with pytest.raises(DataFrameValidationError):
            countmin_sketch(docs, depth=0)
        with pytest.raises(DataFrameValidationError):
            countmin_sketch(docs, width=1)
        with pytest.raises(DataFrameValidationError):
            countmin_estimate(docs, docs, depth=0)


class TestVocabCoverage:
    def test_counts_and_rates(self, spark):
        from temporalscope_spark.operators.corpus_stats import vocab_coverage

        docs = spark.createDataFrame(
            [(1, "a", "cat dog cat bird"), (2, "b", "cat cat fish")],
            "doc_id long, source string, text string",
        )
        vocab = spark.createDataFrame([("cat",), ("dog",)], "word string")
        out = {r["source"]: r for r in vocab_coverage(docs, vocab).collect()}
        a = out["a"]
        assert (a["n_tokens"], a["n_oov"], a["n_types"], a["n_oov_types"]) == (
            4, 1, 3, 1,
        )
        assert a["oov_rate"] == 0.25
        assert a["type_oov_rate"] == round(1 / 3, 6)
        b = out["b"]
        assert (b["n_tokens"], b["n_oov"]) == (3, 1)
        assert b["type_oov_rate"] == 0.5

    def test_vocab_join_is_broadcast(self, spark):
        from temporalscope_spark.operators.corpus_stats import vocab_coverage

        docs = spark.createDataFrame(
            [(1, "a", "x y")], "doc_id long, source string, text string"
        )
        vocab = spark.createDataFrame([("x",)], "word string")
        plan = (
            vocab_coverage(docs, vocab)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestCaptureRecapture:
    def test_recovers_population(self, spark):
        import numpy as np

        from temporalscope_spark.operators.corpus_stats import capture_recapture

        rng = np.random.RandomState(1)
        pop = np.arange(1000)
        sa = rng.choice(pop, 300, replace=False)
        sb = rng.choice(pop, 400, replace=False)
        a = spark.createDataFrame([(int(x),) for x in sa], "k long")
        b = spark.createDataFrame([(int(x),) for x in sb], "k long")
        r = capture_recapture(a, b, "k").collect()[0]
        m = len(set(sa) & set(sb))
        assert r["n_both"] == m
        assert r["n_hat"] == pytest.approx(301 * 401 / (m + 1) - 1, abs=1e-4)
        assert abs(r["n_hat"] - 1000) < 3 * r["se"]

    def test_zero_overlap_defined(self, spark):
        from temporalscope_spark.operators.corpus_stats import capture_recapture

        a = spark.createDataFrame([(i,) for i in range(10)], "k long")
        b = spark.createDataFrame([(i,) for i in range(100, 110)], "k long")
        r = capture_recapture(a, b, "k").collect()[0]
        assert r["n_both"] == 0 and r["n_hat"] == pytest.approx(11 * 11 - 1)

    def test_duplicates_and_nulls_ignored(self, spark):
        from temporalscope_spark.operators.corpus_stats import capture_recapture

        a = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k long")
        b = spark.createDataFrame([(2,), (3,)], "k long")
        r = capture_recapture(a, b, "k").collect()[0]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (2, 2, 1)

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.corpus_stats import capture_recapture

        a = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(DataFrameValidationError):
            capture_recapture(a, a, "nope")


class TestChao1:
    def test_formula_and_coverage(self, spark):
        from temporalscope_spark.operators.corpus_stats import chao1_richness

        # vocabulary: 3 singletons, 2 doubletons, 1 word seen 5 times
        text = "s1 s2 s3 d1 d1 d2 d2 " + "c " * 5
        df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
        r = chao1_richness(df, "text").collect()[0]
        assert (r["s_obs"], r["f1"], r["f2"]) == (6, 3, 2)
        assert r["s_chao1"] == pytest.approx(6 + 9 / 4)
        assert r["n_tokens"] == 12
        assert r["coverage"] == pytest.approx(1 - 3 / 12)

    def test_no_doubletons_corrected_form(self, spark):
        from temporalscope_spark.operators.corpus_stats import chao1_richness

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        r = chao1_richness(df, "text").collect()[0]
        assert r["s_chao1"] == pytest.approx(3 + 3 * 2 / 2)

    def test_estimates_hidden_vocabulary(self, spark):
        import numpy as np

        from temporalscope_spark.operators.corpus_stats import chao1_richness

        # zipf-ish sample from a 2000-word vocabulary: chao1 should land
        # closer to 2000 than the observed count does
        rng = np.random.RandomState(3)
        words = [f"w{int(i)}" for i in rng.zipf(1.35, 30000) if i <= 2000]
        docs = [(i, " ".join(words[i * 50:(i + 1) * 50]))
                for i in range(len(words) // 50)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = chao1_richness(df, "text").collect()[0]
        assert r["s_obs"] < 2000
        assert abs(r["s_chao1"] - 2000) < abs(r["s_obs"] - 2000)
