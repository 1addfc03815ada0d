"""Ranking metrics (metrics/ranking.py) vs a pure-Python TREC-convention
reference: nDCG@k / MRR@k / AP@k incl. tie-break, unjudged-doc and
no-positive edge cases, and RRF fusion."""

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.metrics.ranking import ranking_eval, rrf_fuse


def _ref_metrics(run, qrels, k):
    """run: [(doc, score)], qrels: {doc: rel}."""
    ranked = sorted(run, key=lambda x: (-x[1], x[0]))[:k]
    rels = [qrels.get(d, 0) for d, _ in ranked]
    dcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(rels))
    ideal = sorted((r for r in qrels.values() if r > 0), reverse=True)[:k]
    idcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
    ndcg = dcg / idcg if idcg > 0 else 0.0
    mrr = 0.0
    for i, r in enumerate(rels):
        if r > 0:
            mrr = 1.0 / (i + 1)
            break
    npos = sum(1 for r in qrels.values() if r > 0)
    hits, apnum = 0, 0.0
    for i, r in enumerate(rels):
        if r > 0:
            hits += 1
            apnum += hits / (i + 1)
    ap = apnum / min(npos, k) if npos else 0.0
    return round(ndcg, 6), round(mrr, 6), round(ap, 6)


RUNS = {
    "q1": [("a", 3.0), ("b", 2.0), ("c", 2.0), ("d", 1.0)],  # b/c score tie
    "q2": [("a", 1.0), ("b", 0.5)],  # no relevant retrieved
    "q3": [("x", 9.0), ("y", 8.0)],  # unjudged query
}
QRELS = {
    "q1": {"b": 3, "c": 1, "e": 2},  # e judged but not retrieved
    "q2": {"z": 1},
}


def _dfs(spark):
    runs = spark.createDataFrame(
        [(q, d, s) for q, rs in RUNS.items() for d, s in rs],
        "query string, doc_id string, score double",
    )
    qrels = spark.createDataFrame(
        [(q, d, r) for q, js in QRELS.items() for d, r in js.items()],
        "query string, doc_id string, rel int",
    )
    return runs, qrels


def test_metrics_match_reference(spark):
    runs, qrels = _dfs(spark)
    got = {
        r["query"]: (r["ndcg"], r["mrr"], r["ap"])
        for r in ranking_eval(runs, qrels, k=3).collect()
    }
    for q in RUNS:
        want = _ref_metrics(RUNS[q], QRELS.get(q, {}), 3)
        assert got[q] == pytest.approx(want, abs=1e-9), q
    # tie-break check: b (rel 3) sorts before c at equal score -> rank 2
    assert got["q1"][1] == 0.5
    assert got["q3"] == (0.0, 0.0, 0.0)


def test_perfect_ranking_is_one(spark):
    runs = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0)], "query string, doc_id string, score double"
    )
    qrels = spark.createDataFrame(
        [("q", "a", 2), ("q", "b", 1)], "query string, doc_id string, rel int"
    )
    row = ranking_eval(runs, qrels, k=5).collect()[0]
    assert (row["ndcg"], row["mrr"], row["ap"]) == (1.0, 1.0, 1.0)


def _ref_rrf(named_runs, c, k):
    scores = {}
    for name in sorted(named_runs):
        ranked = sorted(named_runs[name], key=lambda x: (-x[1], x[0]))
        for i, (d, _) in enumerate(ranked):
            scores[d] = scores.get(d, 0.0) + 1.0 / (c + i + 1)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 6), i + 1) for i, (d, s) in enumerate(out)]


def test_rrf_matches_reference(spark):
    r1 = spark.createDataFrame(
        [("q", d, s) for d, s in RUNS["q1"]], "query string, doc_id string, score double"
    )
    r2 = spark.createDataFrame(
        [("q", "c", 5.0), ("q", "a", 4.0), ("q", "e", 3.0)],
        "query string, doc_id string, score double",
    )
    got = [
        (r["doc_id"], r["rrf"], r["rank"])
        for r in rrf_fuse({"lex": r1, "dense": r2}, c=60, k=4)
        .orderBy("rank")
        .collect()
    ]
    want = _ref_rrf(
        {"lex": RUNS["q1"], "dense": [("c", 5.0), ("a", 4.0), ("e", 3.0)]}, 60, 4
    )
    assert got == [(d, pytest.approx(s, abs=1e-9), rk) for d, s, rk in want]


def test_validation_errors(spark):
    runs, qrels = _dfs(spark)
    with pytest.raises(DataFrameValidationError):
        ranking_eval(runs, qrels, k=0)
    with pytest.raises(DataFrameValidationError):
        ranking_eval(runs.drop("score"), qrels)
    with pytest.raises(DataFrameValidationError):
        rrf_fuse({})
    with pytest.raises(DataFrameValidationError):
        rrf_fuse({"a": runs}, c=0)


def test_topk_recall_modes(spark):
    from temporalscope_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [("q1", 1), ("q1", 2), ("q2", 3), ("q2", 4)], "q string, vec_id long"
    )
    approx = spark.createDataFrame(
        [("q1", 1), ("q1", 9), ("q2", 3), ("q2", 4)], "q string, vec_id long"
    )
    per = {
        r["q"]: (r["n_exact"], r["n_overlap"], r["recall"])
        for r in topk_recall(exact, approx, "vec_id", "q").collect()
    }
    assert per == {"q1": (2, 1, 0.5), "q2": (2, 2, 1.0)}
    glob = topk_recall(
        exact.filter("q = 'q1'"), approx.filter("q = 'q1'")
    ).collect()[0]
    assert (glob["n_exact"], glob["n_overlap"], glob["recall"]) == (2, 1, 0.5)
    with pytest.raises(DataFrameValidationError):
        topk_recall(exact.drop("vec_id"), approx)


def _ref_rbo(list_a, list_b, p, k):
    a = [d for d, _ in sorted(list_a, key=lambda x: (-x[1], x[0]))][:k]
    b = [d for d, _ in sorted(list_b, key=lambda x: (-x[1], x[0]))][:k]
    s = 0.0
    for d in range(1, k + 1):
        x = len(set(a[:d]) & set(b[:d]))
        s += p ** (d - 1) * x / d
    return round((1 - p) * s, 6)


def test_rbo_matches_reference(spark):
    from temporalscope_spark.metrics.ranking import rank_biased_overlap

    la = [("a", 5.0), ("b", 4.0), ("c", 3.0), ("d", 2.0)]
    lb = [("b", 9.0), ("a", 8.0), ("e", 7.0), ("c", 6.0)]
    ra = spark.createDataFrame(
        [("q", d, s) for d, s in la], "query string, doc_id string, score double"
    )
    rb = spark.createDataFrame(
        [("q", d, s) for d, s in lb], "query string, doc_id string, score double"
    )
    got = rank_biased_overlap(ra, rb, p=0.9, k=4).collect()[0]["rbo"]
    assert got == pytest.approx(_ref_rbo(la, lb, 0.9, 4), abs=2e-6)
    # identical lists reach the maximal truncated value (X_d = d)
    same = rank_biased_overlap(ra, ra, p=0.9, k=4).collect()[0]["rbo"]
    assert same == pytest.approx(round((1 - 0.9) * sum(0.9 ** (d - 1) for d in range(1, 5)), 6))
    # disjoint lists -> 0 (and the query still appears)
    rz = spark.createDataFrame(
        [("q", "z", 1.0)], "query string, doc_id string, score double"
    )
    zero = rank_biased_overlap(ra, rz, p=0.9, k=4).collect()[0]["rbo"]
    assert zero == 0.0
    with pytest.raises(DataFrameValidationError):
        rank_biased_overlap(ra, rb, p=1.0)
    with pytest.raises(DataFrameValidationError):
        rank_biased_overlap(ra, rb, k=0)
