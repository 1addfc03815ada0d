"""BM25 retrieval scoring (operators/retrieval.py) vs a hand-rolled
reference implementation."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.retrieval import bm25_topk


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for i, w in toks.items():
        score = 0.0
        for t in set(terms):
            dft = sum(1 for ww in toks.values() if t in ww)
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if score > 0:
            out[i] = round(score, 6)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat around the yard"),
        (3, "dogs and cats living together"),
        (4, "completely unrelated text about spark"),
        (5, "cat cat cat cat"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]), rows


class TestBm25:
    def test_matches_reference(self, corpus):
        df, rows = corpus
        got = bm25_topk(df, ["cat", "dog"], k=10).toPandas()
        want = _ref_bm25(rows, ["cat", "dog"])
        assert dict(zip(got["doc_id"], got["score"])) == pytest.approx(want)
        # non-matching doc 4 is excluded, not ranked at 0
        assert 4 not in set(got["doc_id"])

    def test_ordering_and_limit(self, corpus):
        df, rows = corpus
        got = bm25_topk(df, ["cat"], k=2).toPandas()
        want = _ref_bm25(rows, ["cat"])
        expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        assert list(zip(got["doc_id"], got["score"])) == pytest.approx(expect)

    def test_tf_saturation(self, corpus):
        """BM25's k1 saturation: doc 5 (tf=4, short) beats tf=1 docs but its
        score is far below 4x a single occurrence."""
        df, rows = corpus
        got = bm25_topk(df, ["cat"], k=10).toPandas().set_index("doc_id")["score"]
        assert got.loc[5] == max(got)
        assert got.loc[5] < 4 * got.drop(5).max()

    def test_duplicate_terms_deduped(self, corpus):
        df, _ = corpus
        a = bm25_topk(df, ["cat", "cat"], k=10).toPandas()
        b = bm25_topk(df, ["cat"], k=10).toPandas()
        assert a.equals(b)

    def test_validation(self, corpus):
        df, _ = corpus
        with pytest.raises(DataFrameValidationError):
            bm25_topk(df, [], k=5)
        with pytest.raises(DataFrameValidationError):
            bm25_topk(df, ["x"], k=0)


class TestPostingsMulti:
    """Multi-query BM25 over the persisted postings index (VERDICT r3 #3):
    one pass over postings scores a whole query batch, and every score must
    equal the single-query full-scan path."""

    @pytest.mark.slow
    def test_multi_matches_single_per_query(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import (
            bm25_topk_multi,
            build_postings,
        )

        df, _ = corpus
        postings, stats, termdf = build_postings(df)
        queries = spark.createDataFrame(
            [(0, "cat"), (0, "dog"), (1, "spark"), (2, "yard"), (2, "mat")],
            "query_id int, word string",
        )
        got = bm25_topk_multi(postings, stats, termdf, queries, k=10).toPandas()
        for qid, terms in [(0, ["cat", "dog"]), (1, ["spark"]), (2, ["yard", "mat"])]:
            single = bm25_topk(df, terms, k=10).toPandas()
            sub = got[got["query_id"] == qid].sort_values(
                ["score", "doc_id"], ascending=[False, True]
            )
            assert list(sub["doc_id"]) == list(single["doc_id"]), f"query {qid}"
            assert list(sub["score"]) == pytest.approx(list(single["score"]))

    def test_per_query_topk_boundary(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import (
            bm25_topk_multi,
            build_postings,
        )

        df, _ = corpus
        postings, stats, termdf = build_postings(df)
        queries = spark.createDataFrame(
            [(0, "cat"), (1, "the")], "query_id int, word string"
        )
        got = bm25_topk_multi(postings, stats, termdf, queries, k=1).toPandas()
        # exactly one row per matching query
        assert sorted(got["query_id"]) == [0, 1]

    def test_unknown_term_is_dropped_like_single(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import (
            bm25_topk_multi,
            build_postings,
        )

        df, _ = corpus
        postings, stats, termdf = build_postings(df)
        queries = spark.createDataFrame(
            [(0, "cat"), (0, "zzz_not_in_corpus")], "query_id int, word string"
        )
        got = bm25_topk_multi(postings, stats, termdf, queries, k=10).toPandas()
        single = bm25_topk(df, ["cat", "zzz_not_in_corpus"], k=10).toPandas()
        sub = got.sort_values(["score", "doc_id"], ascending=[False, True])
        assert list(sub["doc_id"]) == list(single["doc_id"])
        assert list(sub["score"]) == pytest.approx(list(single["score"]))

    def test_postings_shapes(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import build_postings

        df, rows = corpus
        postings, stats, termdf = build_postings(df)
        assert postings.columns == ["word", "id", "tf", "dl"]
        st = stats.first()
        assert st["n_docs"] == len(rows)
        # (word, id) unique
        assert (
            postings.groupBy("word", "id").count().filter("count > 1").count() == 0
        )
        # df consistency
        w = termdf.filter("word = 'cat'").first()
        assert w["df"] == 3  # docs 1, 2, 5 ('cats' in doc 3 is a different term)

    def test_plan_broadcasts_queries_and_group_limits(self, spark, corpus):
        """The postings scan must see a BROADCAST of the matched query
        terms (never a shuffle of postings by word for a tiny query batch),
        and the per-query top-k must be a WindowGroupLimit."""
        from temporalscope_spark.operators.retrieval import (
            bm25_topk_multi,
            build_postings,
        )

        df, _ = corpus
        postings, stats, termdf = build_postings(df)
        queries = spark.createDataFrame([(0, "cat")], "query_id int, word string")
        out = bm25_topk_multi(postings, stats, termdf, queries, k=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "WindowGroupLimit" in plan

    def test_k_validation(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import (
            bm25_topk_multi,
            build_postings,
        )

        df, _ = corpus
        postings, stats, termdf = build_postings(df)
        queries = spark.createDataFrame([(0, "cat")], "query_id int, word string")
        with pytest.raises(DataFrameValidationError):
            bm25_topk_multi(postings, stats, termdf, queries, k=0)


class TestPostingsIndex:
    """Persisted postings artifact: v0 + incremental appends must score
    bit-identically to a one-shot full-corpus build."""

    def _full_and_incremental(self, spark, corpus, tmp_path):
        from temporalscope_spark.operators.retrieval import PostingsIndex

        corpus, _ = corpus
        v0 = corpus.filter("doc_id % 2 = 1")
        inc1 = corpus.filter("doc_id % 2 = 0 and doc_id <= 4")
        inc2 = corpus.filter("doc_id % 2 = 0 and doc_id > 4")
        idx = PostingsIndex.create(str(tmp_path / "pidx"), v0)
        idx.append_batch(inc1, batch_id=1)
        idx.append_batch(inc2, batch_id=2)
        return idx

    @pytest.mark.slow
    def test_incremental_equals_one_shot_build(self, spark, corpus, tmp_path):
        from temporalscope_spark.operators.retrieval import (
            PostingsIndex,
            bm25_topk_multi,
            build_postings,
        )

        idx = self._full_and_incremental(spark, corpus, tmp_path)
        got_p, got_s, got_t = idx.read(spark)
        want_p, want_s, want_t = build_postings(corpus[0])

        key = lambda r: (r["word"], r["id"])  # noqa: E731
        assert sorted(map(tuple, got_p.collect()), key=str) == sorted(
            map(tuple, want_p.collect()), key=str
        )
        assert sorted(map(tuple, got_t.collect())) == sorted(
            map(tuple, want_t.collect())
        )
        gs, ws = got_s.first(), want_s.first()
        assert gs["n_docs"] == ws["n_docs"]
        assert abs(gs["avgdl"] - ws["avgdl"]) < 1e-9

        queries = spark.createDataFrame(
            [(0, "cat"), (0, "dog"), (1, "spark")], "query_id int, word string"
        )
        got = bm25_topk_multi(got_p, got_s, got_t, queries, k=5).collect()
        want = bm25_topk_multi(want_p, want_s, want_t, queries, k=5).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_replayed_batch_is_noop(self, spark, corpus, tmp_path):
        from temporalscope_spark.operators.retrieval import PostingsIndex

        idx = self._full_and_incremental(spark, corpus, tmp_path)
        corpus, _ = corpus
        before = (
            idx.postings.current_version(),
            idx.termdf.current_version(),
            idx.stats.current_version(),
        )
        idx.append_batch(corpus.filter("doc_id % 2 = 0 and doc_id <= 4"),
                         batch_id=1)  # replay
        assert (
            idx.postings.current_version(),
            idx.termdf.current_version(),
            idx.stats.current_version(),
        ) == before

    def test_create_refuses_existing(self, spark, corpus, tmp_path):
        from temporalscope_spark.operators.retrieval import PostingsIndex

        PostingsIndex.create(str(tmp_path / "dup"), corpus[0])
        with pytest.raises(DataFrameValidationError, match="already exists"):
            PostingsIndex.create(str(tmp_path / "dup"), corpus[0])


def _ref_ql(docs, terms, mu=2000.0):
    """Full Dirichlet query-likelihood reference over normalized words."""
    toks = {i: " ".join(t.lower().split()).split(" ") for i, t in docs}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    c_tot = sum(len(ws) for ws in toks.values())
    qtf = {}
    for t in terms:
        qtf[t] = qtf.get(t, 0) + 1
    pc = {
        t: sum(ws.count(t) for ws in toks.values()) / c_tot for t in qtf
    }
    pc = {t: p for t, p in pc.items() if p > 0}
    out = {}
    for i, ws in toks.items():
        if not any(t in ws for t in pc):
            continue
        dl = len(ws)
        out[i] = sum(
            q * math.log((ws.count(t) + mu * p) / (dl + mu))
            for t, (q, p) in ((t, (qtf[t], pc[t])) for t in pc)
        )
    return out


class TestQueryLikelihood:
    def test_reference_parity(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import query_likelihood_topk

        df, rows = corpus
        terms = ["cat", "the", "cat"]  # multiplicity matters
        exp = _ref_ql(rows, terms, mu=50.0)
        got = query_likelihood_topk(df, terms, k=10, mu=50.0).collect()
        assert {r["doc_id"] for r in got} == set(exp)
        for r in got:
            assert r["score"] == pytest.approx(exp[r["doc_id"]], abs=1e-5)
        # ranking: sorted by (score desc, id)
        scores = [(r["score"], r["doc_id"]) for r in got]
        assert scores == sorted(scores, key=lambda x: (-x[0], x[1]))

    def test_oov_terms_dropped(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import query_likelihood_topk

        df, rows = corpus
        got = query_likelihood_topk(df, ["cat", "zzzznotaword"], k=10, mu=50.0).collect()
        exp = _ref_ql(rows, ["cat"], mu=50.0)
        for r in got:
            assert r["score"] == pytest.approx(exp[r["doc_id"]], abs=1e-5)

    def test_all_oov_raises(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import query_likelihood_topk

        df, _ = corpus
        with pytest.raises(DataFrameValidationError):
            query_likelihood_topk(df, ["zzzznotaword"], k=5)

    def test_length_normalization_prefers_dense_doc(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import query_likelihood_topk

        df, _ = corpus
        got = query_likelihood_topk(df, ["cat"], k=1, mu=10.0).collect()
        assert got[0]["doc_id"] == 5  # "cat cat cat cat" wins on p(cat|d)

    def test_contracts(self, spark, corpus):
        from temporalscope_spark.operators.retrieval import query_likelihood_topk

        df, _ = corpus
        with pytest.raises(DataFrameValidationError):
            query_likelihood_topk(df, [], k=5)
        with pytest.raises(DataFrameValidationError):
            query_likelihood_topk(df, ["cat"], k=0)
        with pytest.raises(DataFrameValidationError):
            query_likelihood_topk(df, ["cat"], mu=0.0)
