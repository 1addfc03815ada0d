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


def _corpus(spark, n=200):
    """Deterministic 200-doc corpus with a quality gradient toward the
    target topic plus planted exact-duplicate texts (score ties)."""
    vocab_a = ["spark", "shuffle", "join", "broadcast", "partition", "plan"]
    vocab_b = ["gato", "casa", "cocina", "perro", "calle", "plaza"]
    rows = []
    for i in range(n):
        mix = i % 10  # 0..9: how target-like the doc is
        words = [vocab_a[(i + j) % 6] for j in range(mix)] + [
            vocab_b[(i * 3 + j) % 6] for j in range(10 - mix)
        ]
        if i % 17 == 0:  # planted duplicates -> identical scores, id tie-break
            words = vocab_a[:4] + vocab_b[:2]
        rows.append((i, " ".join(words)))
    rows.append((n, ""))  # one empty doc
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestDsirApproxLane:
    """exact=False: approx-quantile-bounded candidates + bucketed exact
    rank must reproduce the exact lane's selection bit-for-bit."""

    def _both(self, spark, k, **kw):
        raw = _corpus(spark)
        target = spark.createDataFrame(
            [(901, "spark broadcast join partition shuffle plan")],
            ["doc_id", "text"],
        )
        ex = dsir_select(raw, target, k=k, n_buckets=128, exact=True, **kw)
        ap = dsir_select(raw, target, k=k, n_buckets=128, exact=False, **kw)
        key = lambda r: r["doc_id"]  # noqa: E731
        return sorted(ex.collect(), key=key), sorted(ap.collect(), key=key)

    def test_equals_exact_lane(self, spark):
        ex, ap = self._both(spark, k=25)
        assert [tuple(r) for r in ex] == [tuple(r) for r in ap]
        assert sum(r["selected"] for r in ap) == 25

    @pytest.mark.slow
    def test_equals_exact_with_coarse_sketch(self, spark):
        # a deliberately sloppy sketch only widens the candidate set; the
        # exact count check + bucketed rank keep the selection identical
        ex, ap = self._both(spark, k=7, relative_error=0.4)
        assert [tuple(r) for r in ex] == [tuple(r) for r in ap]

    def test_k_exceeds_positive_docs(self, spark):
        ex, ap = self._both(spark, k=100_000)
        assert [tuple(r) for r in ex] == [tuple(r) for r in ap]
        # every non-empty doc selected, the empty doc never
        assert all(r["selected"] == (r["n_feats"] > 0) for r in ap)

    @pytest.mark.slow
    def test_partition_invariant(self, spark):
        raw = _corpus(spark)
        target = spark.createDataFrame(
            [(901, "spark broadcast join partition shuffle plan")],
            ["doc_id", "text"],
        )
        outs = []
        for parts in (1, 7):
            got = dsir_select(
                raw.repartition(parts), target, k=25, n_buckets=128, exact=False
            ).collect()
            outs.append(sorted(tuple(r) for r in got))
        assert outs[0] == outs[1]

    def test_release_frees_cached_blocks(self, spark):
        from temporalscope_spark.core.caching import release

        raw = _corpus(spark)
        target = spark.createDataFrame(
            [(901, "spark broadcast join shuffle")], ["doc_id", "text"]
        )
        before = len(spark.sparkContext._jsc.getPersistentRDDs())
        out = dsir_select(raw, target, k=10, n_buckets=64, exact=False)
        out.count()
        assert len(spark.sparkContext._jsc.getPersistentRDDs()) > before
        release(out)
        assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before

    def test_relative_error_validated(self, spark, raw, target):
        with pytest.raises(DataFrameValidationError, match="relative_error"):
            dsir_select(raw, target, k=1, exact=False, relative_error=0.5)
