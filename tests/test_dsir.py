"""DSIR importance resampling (operators/dsir.py)."""

import hashlib
import math
from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.dsir import dsir_select, hashed_ngram_features

SEP = "\x1f"


def _norm(t):
    return [w for w in " ".join(t.lower().split()).split(" ") if w]


def _bucket(g, b):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b


def _feats(words, b):
    grams = list(words) + [words[i] + SEP + words[i + 1] for i in range(len(words) - 1)]
    return Counter(_bucket(g, b) for g in grams)


@pytest.fixture
def raw(spark):
    rows = [
        (1, "spark shuffle join aggregate broadcast partition"),
        (2, "spark shuffle join aggregate broadcast partition"),
        (3, "el gato duerme en la cocina grande"),
        (4, "la casa grande tiene una cocina"),
        (5, "spark partition shuffle broadcast plan codegen"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture
def target(spark):
    rows = [
        (101, "spark broadcast join partition shuffle"),
        (102, "aggregate plan codegen spark partition"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestHashedNgramFeatures:
    def test_matches_bruteforce(self, spark, raw):
        b = 64
        got = {
            (r["doc_id"], r["bucket"]): r["tf"]
            for r in hashed_ngram_features(raw, n_buckets=b).collect()
        }
        want = {}
        for r in raw.collect():
            words = _norm(r["text"])
            if not words:
                continue
            for bk, tf in _feats(words, b).items():
                want[(r["doc_id"], bk)] = tf
        assert got == want

    def test_buckets_validated(self, spark, raw):
        with pytest.raises(DataFrameValidationError, match="n_buckets"):
            hashed_ngram_features(raw, n_buckets=0)


class TestDsirSelect:
    def test_matches_bruteforce(self, spark, raw, target):
        b, s, k = 64, 1.0, 3
        got = {
            r["doc_id"]: (r["n_feats"], r["logratio"], r["selected"])
            for r in dsir_select(raw, target, k=k, n_buckets=b).collect()
        }
        raw_feats = {
            r["doc_id"]: _feats(_norm(r["text"]), b) if _norm(r["text"]) else Counter()
            for r in raw.collect()
        }
        cr = Counter()
        for f in raw_feats.values():
            cr.update(f)
        ct = Counter()
        for r in target.collect():
            ct.update(_feats(_norm(r["text"]), b))
        tr, tt = sum(cr.values()), sum(ct.values())
        lrs = {}
        for d, f in raw_feats.items():
            v = 0.0
            for bk in sorted(f):
                lam = math.log((ct.get(bk, 0) + s) / (tt + s * b)) - math.log(
                    (cr[bk] + s) / (tr + s * b)
                )
                v += f[bk] * lam
            lrs[d] = round(v, 6)
        order = sorted(
            (d for d in lrs if raw_feats[d]), key=lambda d: (-lrs[d], d)
        )
        sel = set(order[:k])
        for d in lrs:
            assert got[d] == (sum(raw_feats[d].values()), lrs[d], d in sel), d

    def test_target_like_docs_win(self, spark, raw, target):
        got = {
            r["doc_id"]: r
            for r in dsir_select(raw, target, k=3, n_buckets=256).collect()
        }
        # spark-themed docs (1, 2, 5) match the target; spanish docs lose
        assert got[1]["selected"] and got[2]["selected"] and got[5]["selected"]
        assert not got[3]["selected"] and not got[4]["selected"]
        assert got[5]["logratio"] > got[3]["logratio"]
        # empty doc scores 0, reports 0 features, and is never selected
        assert (got[6]["n_feats"], got[6]["logratio"]) == (0, 0.0)
        assert not got[6]["selected"]

    def test_params_validated(self, spark, raw, target):
        with pytest.raises(DataFrameValidationError, match="k must"):
            dsir_select(raw, target, k=0)
        with pytest.raises(DataFrameValidationError, match="smoothing"):
            dsir_select(raw, target, k=1, smoothing=0.0)

    def test_lambda_join_is_broadcast(self, spark, raw, target):
        plan = (
            dsir_select(raw, target, k=2, n_buckets=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
