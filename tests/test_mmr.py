"""Maximal Marginal Relevance re-ranking."""

from __future__ import annotations

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.similarity import mmr_rerank


def _mmr_reference(cands, k, lam):
    """Pure-Python greedy MMR with the operator's rounding + tie rules."""
    sel = []
    remaining = {d: (v, round(r, 6)) for d, v, r in cands}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else None

    for rank in range(1, k + 1):
        if not remaining:
            break
        best = None
        for d, (v, r) in sorted(remaining.items()):
            ms = max((cos(v, sv) for _, (sv, _) in sel), default=0.0) if sel else 0.0
            score = round(lam * r - (1 - lam) * ms, 6)
            if best is None or score > best[1]:
                best = (d, score)
        sel.append((best[0], (remaining[best[0]][0], best[1])))
        del remaining[best[0]]
    return [(d, i + 1, s) for i, (d, (v, s)) in enumerate(sel)]


@pytest.fixture(scope="module")
def candidates(spark):
    # query 7: three near-duplicates of the top hit + one diverse doc;
    # plain top-k would take the duplicates, MMR must interleave
    rows = [
        (7, 1, [1.0, 0.0, 0.0], 0.99),
        (7, 2, [0.999, 0.01, 0.0], 0.98),
        (7, 3, [0.998, 0.02, 0.0], 0.97),
        (7, 4, [0.0, 1.0, 0.0], 0.80),
        (7, 5, [0.0, 0.0, 1.0], 0.60),
        # query 8: two candidates only (exhausts early at k=3)
        (8, 1, [1.0, 0.0, 0.0], 0.9),
        (8, 9, [0.5, 0.5, 0.0], 0.7),
    ]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, embedding array<double>, score double"
    )


class TestMmrRerank:
    def test_diversity_beats_redundancy(self, candidates):
        out = [
            (r["doc_id"], r["rank"])
            for r in mmr_rerank(candidates, k=3, lam=0.5)
            .filter("query_id = 7")
            .orderBy("rank")
            .collect()
        ]
        # rank 1 = top relevance (doc 1); rank 2 must NOT be its near-dup
        assert out[0] == (1, 1)
        assert out[1][0] in (4, 5)

    def test_matches_python_reference(self, candidates):
        rows = [(r["doc_id"], r["embedding"], r["score"])
                for r in candidates.filter("query_id = 7").collect()]
        ref = _mmr_reference([(d, v, s) for d, v, s in rows], k=4, lam=0.7)
        got = [(r["doc_id"], r["rank"], r["mmr_score"])
               for r in mmr_rerank(candidates, k=4, lam=0.7)
               .filter("query_id = 7").orderBy("rank").collect()]
        assert [(d, rk) for d, rk, _ in got] == [(d, rk) for d, rk, _ in ref]
        for (_, _, a), (_, _, b) in zip(got, ref):
            assert a == pytest.approx(b, abs=1e-6)

    def test_exhausts_early(self, candidates):
        out = mmr_rerank(candidates, k=3).filter("query_id = 8").collect()
        assert len(out) == 2

    def test_lam_one_is_pure_relevance(self, candidates):
        out = [r["doc_id"] for r in mmr_rerank(candidates, k=3, lam=1.0)
               .filter("query_id = 7").orderBy("rank").collect()]
        assert out == [1, 2, 3]

    def test_partition_invariant(self, candidates):
        a = sorted(map(tuple, mmr_rerank(candidates, k=3, lam=0.6).collect()))
        b = sorted(map(tuple, mmr_rerank(candidates.repartition(5), k=3, lam=0.6).collect()))
        assert a == b

    def test_errors(self, candidates):
        with pytest.raises(DataFrameValidationError):
            mmr_rerank(candidates, k=0)
        with pytest.raises(DataFrameValidationError):
            mmr_rerank(candidates, lam=1.5)
        with pytest.raises(DataFrameValidationError):
            mmr_rerank(candidates, score_col="nope")
