"""TF-IDF long-form vectors + sparse cosine pairs (operators/vectorize.py):
sklearn-formula parity via a numpy replay, df filtering, blank docs, and
the unit-norm / symmetric-dot properties."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.vectorize import tfidf_cosine_pairs, tfidf_table

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, ""),  # blank doc: contributes nothing, still counts toward N
]


def _numpy_tfidf(docs, min_df=1, max_df_frac=1.0):
    n = len(docs)
    toks = {i: t.lower().split() for i, t in docs}
    vocab = sorted({w for ws in toks.values() for w in ws if w})
    dfc = {w: sum(w in set(ws) for ws in toks.values()) for w in vocab}
    keep = [
        w
        for w in vocab
        if dfc[w] >= min_df and (max_df_frac >= 1.0 or dfc[w] <= max_df_frac * n)
    ]
    out = {}
    for i, ws in toks.items():
        raw = {w: ws.count(w) * (math.log((1 + n) / (1 + dfc[w])) + 1) for w in set(ws) if w in keep}
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        if nrm > 0:
            out[i] = {w: round(v / nrm, 6) for w, v in raw.items()}
    return out


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestTfidfTable:
    def test_sklearn_formula_parity(self, spark, docs):
        got = {}
        for r in tfidf_table(docs, "text", "doc_id").collect():
            got.setdefault(r["doc_id"], {})[r["word"]] = r["tfidf"]
        want = _numpy_tfidf(DOCS)
        assert set(got) == set(want)  # blank doc absent
        for i in want:
            assert set(got[i]) == set(want[i])
            for w in want[i]:
                assert got[i][w] == pytest.approx(want[i][w], abs=2e-6)

    def test_unit_norms(self, spark, docs):
        tab = tfidf_table(docs, "text", "doc_id")
        norms = (
            tab.groupBy("doc_id")
            .agg(F.sum(F.col("tfidf") * F.col("tfidf")).alias("n2"))
            .collect()
        )
        for r in norms:
            assert r["n2"] == pytest.approx(1.0, abs=1e-5)

    def test_df_filters(self, spark, docs):
        # min_df=2 keeps only words in >= 2 docs
        words = {
            r["word"] for r in tfidf_table(docs, "text", "doc_id", min_df=2).collect()
        }
        assert words == {"the", "sat", "on"}
        # max_df_frac strict cap: 'the' is in 2/4 docs -> dropped at 0.4
        words = {
            r["word"]
            for r in tfidf_table(docs, "text", "doc_id", max_df_frac=0.4).collect()
        }
        assert "the" not in words and "cat" in words

    def test_raw_lane_unnormalized(self, spark, docs):
        n = 4
        tab = tfidf_table(docs, "text", "doc_id", l2_normalize=False).collect()
        row = [r for r in tab if r["doc_id"] == 3 and r["word"] == "cats"][0]
        assert row["tf"] == 2
        assert row["tfidf"] == pytest.approx(
            round(2 * (math.log((1 + n) / (1 + 1)) + 1), 6), abs=1e-6
        )

    def test_errors(self, spark, docs):
        with pytest.raises(DataFrameValidationError):
            tfidf_table(docs, "text", "doc_id", min_df=0)
        with pytest.raises(DataFrameValidationError):
            tfidf_table(docs, "text", "doc_id", max_df_frac=0.0)
        with pytest.raises(DataFrameValidationError):
            tfidf_table(docs, "nope", "doc_id")


class TestCosinePairs:
    def test_matches_dense_numpy(self, spark, docs):
        vecs = _numpy_tfidf(DOCS, max_df_frac=1.0)
        pairs = tfidf_cosine_pairs(
            docs, "text", "doc_id", max_df_frac=1.0, min_sim=0.0
        ).collect()
        got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
        ids = sorted(vecs)
        for i_ix, i in enumerate(ids):
            for j in ids[i_ix + 1 :]:
                want = sum(vecs[i][w] * vecs[j][w] for w in set(vecs[i]) & set(vecs[j]))
                if want > 0:
                    assert got[(i, j)] == pytest.approx(want, abs=5e-6)
                else:
                    assert (i, j) not in got or got[(i, j)] == 0.0

    def test_min_sim_threshold_and_ordering(self, spark, docs):
        pairs = tfidf_cosine_pairs(docs, "text", "doc_id", min_sim=0.2).collect()
        assert all(r["cosine"] >= 0.2 for r in pairs)
        assert all(r["id_a"] < r["id_b"] for r in pairs)

    def test_identical_docs_cosine_one(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta only")],
            ["doc_id", "text"],
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                df, "text", "doc_id", max_df_frac=1.0, min_sim=0.0
            ).collect()
        }
        assert pairs[(1, 2)] == pytest.approx(1.0, abs=1e-5)
        assert (1, 3) not in pairs  # no shared vocabulary


def _md5_int(s: str, nhex: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def _numpy_hashed(docs, n_buckets, signed=True, seed=7):
    out = {}
    for i, t in docs:
        for w in " ".join(t.lower().split()).split(" "):
            if not w:
                continue
            b = _md5_int(f"{w}#fh{seed}", 8) % n_buckets
            s = 1.0 if (not signed or _md5_int(f"{w}#fs{seed}", 2) % 2 == 0) else -1.0
            out[(i, b)] = out.get((i, b), 0.0) + s
    return {k: v for k, v in out.items() if v != 0.0}


class TestHashedFeatures:
    def test_md5_replay_parity(self, spark):
        from temporalscope_spark.operators.vectorize import hashed_features

        df = spark.createDataFrame(DOCS, "doc_id int, text string")
        got = {
            (r["doc_id"], r["bucket"]): r["value"]
            for r in hashed_features(df, "text", "doc_id", n_buckets=16).collect()
        }
        assert got == _numpy_hashed(DOCS, 16)

    def test_unsigned_counts(self, spark):
        from temporalscope_spark.operators.vectorize import hashed_features

        df = spark.createDataFrame(DOCS, "doc_id int, text string")
        got = hashed_features(df, "text", "doc_id", n_buckets=4, signed=False)
        rows = got.collect()
        ref = _numpy_hashed(DOCS, 4, signed=False)
        assert {(r["doc_id"], r["bucket"]): r["value"] for r in rows} == ref
        # unsigned values are positive word counts; totals match corpus size
        total = sum(r["value"] for r in rows)
        n_words = sum(len(t.split()) for _, t in DOCS)
        assert total == n_words

    def test_l2_norm_is_unit(self, spark):
        from temporalscope_spark.operators.vectorize import hashed_features

        df = spark.createDataFrame(DOCS, "doc_id int, text string")
        got = hashed_features(
            df, "text", "doc_id", n_buckets=64, l2_normalize=True
        ).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], 0.0)
            by_doc[r["doc_id"]] += r["value"] ** 2
        for d, sq in by_doc.items():
            assert sq == pytest.approx(1.0, abs=1e-4)

    def test_fixed_dim_and_partition_invariance(self, spark):
        from temporalscope_spark.operators.vectorize import hashed_features

        df = spark.createDataFrame(DOCS, "doc_id int, text string")
        a = hashed_features(df, "text", "doc_id", n_buckets=8)
        b = hashed_features(df.repartition(7), "text", "doc_id", n_buckets=8)
        assert a.agg(F.max("bucket")).first()[0] < 8
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bad_args(self, spark):
        from temporalscope_spark.operators.vectorize import hashed_features

        df = spark.createDataFrame(DOCS, "doc_id int, text string")
        with pytest.raises(DataFrameValidationError):
            hashed_features(df, "text", "doc_id", n_buckets=0)
        with pytest.raises(DataFrameValidationError):
            hashed_features(df, "nope", "doc_id")
