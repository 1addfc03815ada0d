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


class TestKnnLabelAgreement:
    def _df(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        # two tight clusters with consistent labels + one planted
        # mislabeled point inside cluster 0
        c0 = rng.randn(12, 8) * 0.05 + np.array([5.0] * 8)
        c1 = rng.randn(12, 8) * 0.05 - np.array([5.0] * 8)
        rows = [(i, [float(x) for x in c0[i]], 0) for i in range(12)]
        rows += [(100 + i, [float(x) for x in c1[i]], 1) for i in range(12)]
        rows.append((999, [5.0] * 8, 1))  # mislabeled: sits in cluster 0
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_mislabeled_point_flagged(self, spark):
        from temporalscope_spark.operators.similarity import knn_label_agreement

        out = {r["id"]: r for r in
               knn_label_agreement(self._df(spark), k=5).collect()}
        assert out[999]["agreement"] == 0.0           # all neighbors label 0
        clean = [out[i]["agreement"] for i in range(12)]
        assert all(a >= 0.8 for a in clean)           # cluster 0 consistent
        assert all(out[100 + i]["agreement"] == 1.0 for i in range(12))

    def test_neighbor_count_capped(self, spark):
        from temporalscope_spark.operators.similarity import knn_label_agreement

        df = self._df(spark)
        out = knn_label_agreement(df, k=5).collect()
        assert all(r["n_neighbors"] == 5 for r in out)
        # k larger than corpus: every other row is a neighbor
        small = df.limit(4)
        out2 = knn_label_agreement(small, k=10).collect()
        assert all(r["n_neighbors"] == 3 for r in out2)

    def test_brute_force_parity(self, spark):
        import numpy as np

        from temporalscope_spark.operators.similarity import knn_label_agreement

        df = self._df(spark)
        rows = df.collect()
        vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in rows}
        labels = {r["vec_id"]: r["label"] for r in rows}

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        got = {r["id"]: (r["n_agree"], r["n_neighbors"])
               for r in knn_label_agreement(df, k=4).collect()}
        for i, v in vecs.items():
            nbrs = sorted(
                ((-(cos(v, u)), j) for j, u in vecs.items() if j != i)
            )[:4]
            agree = sum(1 for _, j in nbrs if labels[j] == labels[i])
            assert got[i] == (agree, 4)

    def test_errors(self, spark):
        from temporalscope_spark.operators.similarity import knn_label_agreement

        df = self._df(spark)
        with pytest.raises(DataFrameValidationError):
            knn_label_agreement(df, k=0)
        with pytest.raises(DataFrameValidationError):
            knn_label_agreement(df, label_col="nope")
