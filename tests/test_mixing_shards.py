"""Temperature mixing and deterministic shard assignment (sampling.py)."""

import hashlib

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.sampling import assign_shards, temperature_sample


def _u01(key, seed):
    h = hashlib.md5(f"{key}#{seed}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


@pytest.fixture
def corpus(spark):
    # heavily skewed source mix: 80 'web', 15 'code', 5 'books'
    rows = [(i, "web" if i < 80 else ("code" if i < 95 else "books")) for i in range(100)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


class TestTemperatureSample:
    def test_matches_bruteforce(self, spark, corpus):
        alpha, budget, seed = 0.5, 60, 42
        got = {
            r["doc_id"]: (r["source"], r["keep_frac"])
            for r in temperature_sample(
                corpus, budget, alpha=alpha, seed=seed, portable=True
            ).collect()
        }
        n = {"web": 80, "code": 15, "books": 5}
        zn = sum(v**alpha for v in sorted(n.values(), key=lambda _: 0))
        # fold order: sorted by source name
        zn = 0.0
        for s in sorted(n):
            zn += n[s] ** alpha
        rates = {s: min(1.0, budget * (n[s] ** alpha / zn) / n[s]) for s in n}
        want = {
            i: (src, round(rates[src], 6))
            for i, src in [(i, "web" if i < 80 else ("code" if i < 95 else "books")) for i in range(100)]
            if _u01(i, seed) < rates[src]
        }
        assert got == want

    def test_low_resource_upweighted(self, spark, corpus):
        out = temperature_sample(corpus, 60, alpha=0.3, portable=True)
        rates = {r["source"]: r["keep_frac"] for r in out.collect()}
        # books (5 docs) must be kept whole; web keeps a smaller share
        assert rates["books"] == 1.0
        assert rates["web"] < rates["code"] <= 1.0

    def test_alpha_one_is_natural_mix(self, spark, corpus):
        out = temperature_sample(corpus, 50, alpha=1.0, portable=True)
        rates = {r["source"]: r["keep_frac"] for r in out.collect()}
        # alpha=1 -> identical keep rate for every source (budget/N)
        assert len(set(rates.values())) == 1
        assert rates["web"] == 0.5

    def test_params_validated(self, spark, corpus):
        with pytest.raises(DataFrameValidationError, match="budget_rows"):
            temperature_sample(corpus, 0)
        with pytest.raises(DataFrameValidationError, match="alpha"):
            temperature_sample(corpus, 10, alpha=0.0)


class TestAssignShards:
    def test_matches_bruteforce(self, spark, corpus):
        n_shards, seed = 4, 7
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in assign_shards(corpus, n_shards, seed=seed).collect()
        }
        want = {}
        by_shard = {}
        for i in range(100):
            h = hashlib.md5(f"{i}#{seed}".encode()).hexdigest()
            s = int(h[:8], 16) % n_shards
            by_shard.setdefault(s, []).append((int(h[8:16], 16), i))
        for s, rows in by_shard.items():
            for pos, (_, i) in enumerate(sorted(rows), 1):
                want[i] = (s, pos)
        assert got == want

    def test_partition_invariant_and_contiguous(self, spark, corpus):
        a = assign_shards(corpus, 8, seed=1)
        b = assign_shards(corpus.repartition(13), 8, seed=1)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # pos contiguous within each shard
        rows = a.collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for s, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), s

    def test_seed_reshuffles(self, spark, corpus):
        a = {r["doc_id"]: (r["shard"], r["pos"]) for r in assign_shards(corpus, 4, seed=1).collect()}
        b = {r["doc_id"]: (r["shard"], r["pos"]) for r in assign_shards(corpus, 4, seed=2).collect()}
        assert a != b

    def test_n_shards_validated(self, spark, corpus):
        with pytest.raises(DataFrameValidationError, match="n_shards"):
            assign_shards(corpus, 0)
