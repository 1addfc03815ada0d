"""KMV / bottom-k distinct sketch (operators/corpus_stats.py) vs a
hashlib-based reference: hash-lane parity, the (k-1)/U_(k) estimator,
exact-below-k behavior, sketch mergeability, and the bottom-k Jaccard
estimator."""

import hashlib

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import (
    kmv_distinct,
    kmv_sketch,
    kmv_source_overlap,
)

SEED = 7


def _h(e, seed=SEED):
    return int(hashlib.md5(f"{e}#{seed}".encode()).hexdigest()[:8], 16)


def _elems(texts, ngram=1):
    out = set()
    for t in texts:
        w = [x for x in " ".join(t.lower().split()).split(" ") if x != ""]
        if ngram == 1:
            out |= set(w)
        else:
            w = " ".join(t.lower().split()).split(" ")
            out |= {
                "\x1f".join(w[i : i + ngram])
                for i in range(len(w) - ngram + 1)
            }
    return out


def _ref_sketch(texts, k, ngram=1):
    hs = sorted({_h(e) for e in _elems(texts, ngram)})
    return hs[:k]


def _ref_est(hs, k):
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) * 2.0**32 / (hs[k - 1] + 1.0)


GA = ["low deep pipe rust", "low deep gold iron zinc"]
GB = ["low deep kelp moss", "fern kelp moss opal"]


def _docs(spark):
    rows = [(i, "a", t) for i, t in enumerate(GA)] + [
        (10 + i, "b", t) for i, t in enumerate(GB)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_sketch_matches_reference_hashes(spark):
    sk = {
        r["source"]: (r["ks"], r["n_hashes"])
        for r in kmv_sketch(_docs(spark), "text", "source", k=4).collect()
    }
    assert sk["a"] == (_ref_sketch(GA, 4), min(4, len(_elems(GA))))
    assert sk["b"] == (_ref_sketch(GB, 4), min(4, len(_elems(GB))))


def test_estimator_and_exact_below_k(spark):
    docs = _docs(spark)
    # k=4 < 7 distinct words in group a -> estimator lane
    got = {
        r["source"]: r["est_distinct"]
        for r in kmv_distinct(docs, "text", "source", k=4).collect()
    }
    assert got["a"] == pytest.approx(round(_ref_est(_ref_sketch(GA, 4), 4), 6))
    # k=64 > distinct counts -> exact lane
    exact = {
        r["source"]: (r["n_hashes"], r["est_distinct"])
        for r in kmv_distinct(docs, "text", "source", k=64).collect()
    }
    assert exact["a"] == (len(_elems(GA)), float(len(_elems(GA))))
    assert exact["b"] == (len(_elems(GB)), float(len(_elems(GB))))


def test_ngram_shingle_lane(spark):
    got = {
        r["source"]: r["ks"]
        for r in kmv_sketch(_docs(spark), "text", "source", k=8, ngram=2).collect()
    }
    assert got["a"] == _ref_sketch(GA, 8, ngram=2)
    assert got["b"] == _ref_sketch(GB, 8, ngram=2)


def test_union_merge_equals_pooled_sketch(spark):
    """Mergeability: the pair lane's merged bottom-k estimate equals the
    estimate from sketching the pooled corpus directly."""
    spark_df = _docs(spark)
    k = 4
    sk = kmv_sketch(spark_df, "text", "source", k=k)
    pair = kmv_source_overlap(sk, "source", k=k).collect()[0]
    pooled = spark_df.withColumn("source", spark_df.source.substr(1, 0))
    # pooled: one group (empty-string source) over all docs
    est = kmv_distinct(pooled, "text", "source", k=k).collect()[0]["est_distinct"]
    assert pair["union_est"] == pytest.approx(est)


def test_jaccard_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(0, "a", GA[0]), (1, "b", GA[0])], "doc_id long, source string, text string"
    )
    sk = kmv_sketch(same, "text", "source", k=8)
    row = kmv_source_overlap(sk, "source", k=8).collect()[0]
    assert row["jaccard_est"] == 1.0
    disjoint = spark.createDataFrame(
        [(0, "a", "pqr stu vwx"), (1, "b", "abc def ghi")],
        "doc_id long, source string, text string",
    )
    sk2 = kmv_sketch(disjoint, "text", "source", k=8)
    row2 = kmv_source_overlap(sk2, "source", k=8).collect()[0]
    assert row2["jaccard_est"] == 0.0
    # exact-union lane: 6 distinct hashes < k=8
    assert row2["union_est"] == 6.0


def test_validation_errors(spark):
    docs = _docs(spark)
    with pytest.raises(DataFrameValidationError):
        kmv_sketch(docs, k=1)
    with pytest.raises(DataFrameValidationError):
        kmv_sketch(docs, ngram=0)


def test_merge_equals_one_shot_sketch(spark):
    """Incremental lane equivalence: merge(sketch(A), sketch(B)) is
    EXACTLY sketch(A ∪ B), per group."""
    rows_a = [(0, "a", GA[0]), (1, "b", GB[0])]
    rows_b = [(2, "a", GA[1]), (3, "b", GB[1]), (4, "c", "new words here")]
    schema = "doc_id long, source string, text string"
    from temporalscope_spark.operators.corpus_stats import kmv_merge

    da = spark.createDataFrame(rows_a, schema)
    db = spark.createDataFrame(rows_b, schema)
    union = spark.createDataFrame(rows_a + rows_b, schema)
    k = 4
    merged = kmv_merge(
        kmv_sketch(da, "text", "source", k=k),
        kmv_sketch(db, "text", "source", k=k),
        "source",
        k=k,
    )
    one_shot = kmv_sketch(union, "text", "source", k=k)
    m = {r["source"]: (r["ks"], r["n_hashes"]) for r in merged.collect()}
    o = {r["source"]: (r["ks"], r["n_hashes"]) for r in one_shot.collect()}
    assert m == o
    # group 'c' exists only in batch B and passes through
    assert "c" in m
