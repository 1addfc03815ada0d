"""SemDeDup — embedding-space semantic dedup (operators/similarity.py)."""

import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.similarity import ivf_centroids, semdedup


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return d / (na * nb)


@pytest.fixture
def vecs(spark):
    # two tight duplicate groups near orthogonal axes + two singletons
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # dup of 0
        (2, [0.998, -0.02, 0.0]),  # dup of 0/1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),   # dup of 3
        (5, [0.0, 0.0, 1.0]),      # singleton
        (6, [0.5, 0.5, 0.7]),      # singleton (below threshold to others)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestSemDeDup:
    # axis-aligned quantizer so each duplicate group co-locates in one cell
    # (hash-seeded centroids can split a group across cells — SemDeDup's
    # documented recall trade, exercised by test_matches_bruteforce)
    AXES = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

    def test_groups_and_keep_rule(self, spark, vecs):
        out = {
            r["vec_id"]: r
            for r in semdedup(
                vecs, threshold=0.995, centroids=self.AXES
            ).collect()
        }
        assert len(out) == 7
        # singletons always keep
        assert out[5]["keep"] and out[6]["keep"]
        # exactly one survivor per duplicate group
        g1 = [out[i]["keep"] for i in (0, 1, 2)]
        g2 = [out[i]["keep"] for i in (3, 4)]
        assert sum(g1) == 1 and sum(g2) == 1
        # the paper's rule: survivor = lowest centroid-cosine (id tiebreak)
        rows = [(i, out[i]["cent_cosine"]) for i in (0, 1, 2)]
        want = min(rows, key=lambda t: (t[1], t[0]))[0]
        assert out[want]["keep"]

    def test_cross_cell_pairs_not_considered(self, spark, vecs):
        """Members of different cells are never compared — the quadratic
        search is cell-bounded by construction."""
        out = {
            r["vec_id"]: r
            for r in semdedup(
                vecs, threshold=0.1, centroids=self.AXES
            ).collect()
        }
        # with a tiny threshold everything in one cell collapses to one
        # survivor per cell, so #kept == #distinct cells occupied
        cells = {r["cell"] for r in out.values()}
        assert sum(1 for r in out.values() if r["keep"]) == len(cells)

    def test_matches_bruteforce(self, spark, vecs):
        t = 0.995
        cents = ivf_centroids(vecs, num_centroids=3, seed=1, refine_iters=0)
        data = {r["vec_id"]: list(map(float, r["embedding"])) for r in vecs.collect()}
        # replicate: cell = argmax dot/|c| (ties -> larger idx, matching
        # array_max struct comparison), pairs within cell, min-label
        # components, keep = lowest (rounded cos-to-centroid, id)
        def cell_of(v):
            scores = []
            for i, c in enumerate(cents):
                n = math.sqrt(sum(x * x for x in c)) or 1.0
                scores.append((sum(a * b for a, b in zip(v, c)) / n, i))
            return max(scores)[1]

        cell = {i: cell_of(v) for i, v in data.items()}
        centcos = {
            i: round(_cos(v, cents[cell[i]]), 4) for i, v in data.items()
        }
        # union-find over within-cell pairs
        parent = {i: i for i in data}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for i in data:
            for j in data:
                if i < j and cell[i] == cell[j] and _cos(data[i], data[j]) >= t:
                    a, b = find(i), find(j)
                    if a != b:
                        parent[max(a, b)] = min(a, b)
        groups = {}
        for i in data:
            groups.setdefault(find(i), []).append(i)
        want_keep = {}
        for members in groups.values():
            surv = min(members, key=lambda i: (centcos[i], i))
            for i in members:
                want_keep[i] = (i == surv) if len(members) > 1 else True

        got = {
            r["vec_id"]: (r["cell"], r["cent_cosine"], r["keep"])
            for r in semdedup(
                vecs, threshold=t, seed=1, centroids=cents
            ).collect()
        }
        for i in data:
            assert got[i] == (cell[i], centcos[i], want_keep[i]), i

    def test_threshold_validated(self, spark, vecs):
        with pytest.raises(DataFrameValidationError, match="threshold"):
            semdedup(vecs, threshold=0.0)
