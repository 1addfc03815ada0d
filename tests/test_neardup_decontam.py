"""Near-dup (MinHash/LSH) decontamination (operators/contamination.py)
vs a pure-Python shingle-Jaccard reference: exact-copy recall is
structural (identical signatures collide in every band), verified
Jaccard values are exact, unrelated docs survive, and the anti-join
lane removes exactly the flagged ids."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.contamination import (
    decontaminate_neardup,
    neardup_contaminated_ids,
)


def _sh(t, n=12):
    norm = " ".join(t.lower().split())
    if len(norm) < n:
        return {norm}
    return {norm[i : i + n] for i in range(len(norm) - n + 1)}


def _jac(a, b):
    sa, sb = _sh(a), _sh(b)
    return len(sa & sb) / len(sa | sb)


T1 = "the quick brown fox jumps over the lazy dog near the river bank today"
T2 = "an entirely different document about spark shuffle partitioning plans"
T3 = "short unrelated text with nothing shared at all between any of them"


def _dfs(spark):
    train = spark.createDataFrame(
        [(1, T1), (2, T2), (3, T3)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(101, T1), (102, T1[:-6]), (103, "completely disjoint eval benchmark")],
        "eval_id long, text string",
    )
    return train, ev


class TestNearDup:
    def test_exact_copy_flagged_structurally(self, spark):
        train, ev = _dfs(spark)
        out = {
            r["doc_id"]: (r["eval_id"], r["jaccard"])
            for r in neardup_contaminated_ids(train, ev, threshold=0.5).collect()
        }
        assert 1 in out
        # best match is the exact copy (j=1.0) over the truncated variant
        assert out[1][0] == 101 and out[1][1] == 1.0
        assert 2 not in out and 3 not in out

    def test_jaccard_values_exact(self, spark):
        train, ev = _dfs(spark)
        rows = neardup_contaminated_ids(
            train, ev, threshold=0.2, hash_fn="md5"
        ).collect()
        got = {(r["doc_id"], r["eval_id"]): r["jaccard"] for r in rows}
        # best match per doc only; doc 1's best is the exact copy
        assert got[(1, 101)] == 1.0
        want_trunc = _jac(T1, T1[:-6])
        assert want_trunc >= 0.2  # the variant qualifies at 0.2 ...
        assert got[(1, 101)] >= round(want_trunc, 6)  # ... but 101 wins

    def test_decontaminate_removes_flagged(self, spark):
        train, ev = _dfs(spark)
        kept = sorted(
            r["doc_id"]
            for r in decontaminate_neardup(train, ev, threshold=0.5).collect()
        )
        assert kept == [2, 3]

    def test_lanes_agree_on_flagged_set(self, spark):
        train, ev = _dfs(spark)
        md5 = {r["doc_id"] for r in
               neardup_contaminated_ids(train, ev, threshold=0.5,
                                        hash_fn="md5").collect()}
        xx = {r["doc_id"] for r in
              neardup_contaminated_ids(train, ev, threshold=0.5,
                                       hash_fn="xxhash64").collect()}
        assert md5 == xx == {1}

    def test_param_validation(self, spark):
        train, ev = _dfs(spark)
        with pytest.raises(DataFrameValidationError):
            neardup_contaminated_ids(train, ev, threshold=0.0)
        with pytest.raises(DataFrameValidationError):
            neardup_contaminated_ids(train, ev, num_hashes=16, bands=5)
