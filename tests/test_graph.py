"""PageRank power iteration (operators/graph.py)."""

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.graph import pagerank


def _brute(edges, damping, iters):
    """Reference power iteration over an adjacency list with dangling-mass
    redistribution and multi-edge out-degree counting."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = r[outdeg == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1),
    # 5 is dangling (appears only as a destination)
    (2, 5),
    # parallel edge: 6 sends double share to 3, outdeg 3
    (6, 3), (6, 3), (6, 7),
    # self-loop
    (7, 7),
]


class TestPageRank:
    @pytest.mark.parametrize("iters", [1, 4, 10])
    def test_numpy_parity(self, spark, iters):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = {r["id"]: r["rank"] for r in pagerank(df, iters=iters).collect()}
        want = _brute(EDGES, 0.85, iters)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_ranks_sum_to_one(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        total = sum(r["rank"] for r in pagerank(df, iters=6).collect())
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_dangling_node_holds_base_plus_mass(self, spark):
        # one edge a->b: b is dangling; after 1 round
        # r(a) = 0.15/2 + 0.85*(0.5/2), r(b) = 0.15/2 + 0.85*(0.5 + 0.5/2)
        df = spark.createDataFrame([(10, 20)], "src long, dst long")
        got = {r["id"]: r["rank"] for r in pagerank(df, iters=1).collect()}
        assert got[10] == pytest.approx(0.15 / 2 + 0.85 * 0.25, abs=1e-12)
        assert got[20] == pytest.approx(0.15 / 2 + 0.85 * 0.75, abs=1e-12)

    def test_partition_invariance(self, spark):
        df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
        df7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
        r1 = {r["id"]: round(r["rank"], 12) for r in pagerank(df1, iters=5).collect()}
        r7 = {r["id"]: round(r["rank"], 12) for r in pagerank(df7, iters=5).collect()}
        assert r1 == r7

    def test_damping_extremes_validated(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(DataFrameValidationError):
            pagerank(df, damping=0.0)
        with pytest.raises(DataFrameValidationError):
            pagerank(df, damping=1.0)
        with pytest.raises(DataFrameValidationError):
            pagerank(df, iters=0)
        with pytest.raises(DataFrameValidationError):
            pagerank(df, src="nope")

    def test_string_ids(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["id"]: r["rank"] for r in pagerank(df, iters=8).collect()}
        # symmetric 3-cycle: all ranks equal 1/3
        for v in ("a", "b", "c"):
            assert got[v] == pytest.approx(1.0 / 3.0, abs=1e-12)


def _brute_hits(edges, iters):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    h = {v: 1.0 / n for v in nodes}
    a = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        an = {v: sum(h[u] for u, d in sorted(edges) if d == v) for v in nodes}
        tot = 0.0
        for v in nodes:
            tot += an[v]
        a = {v: round(an[v] / tot, 12) for v in nodes}
        hn = {
            u: sum(a[d] for uu, d in sorted(edges, key=lambda e: (e[1], e[0])) if uu == u)
            for u in nodes
        }
        tot = 0.0
        for v in nodes:
            tot += hn[v]
        h = {v: round(hn[v] / tot, 12) for v in nodes}
    return h, a


class TestHits:
    EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]

    def test_reference_parity(self, spark):
        from temporalscope_spark.operators.graph import hits

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["id"]: (round(r["hub"], 10), round(r["authority"], 10))
            for r in hits(df, iters=5).collect()
        }
        h, a = _brute_hits(self.EDGES, 5)
        for v in h:
            assert got[v] == (round(h[v], 10), round(a[v], 10)), v

    def test_sink_has_zero_hub_and_source_zero_authority(self, spark):
        from temporalscope_spark.operators.graph import hits

        # 4 only points in (pure hub); nothing points at 4 or at 1's
        # unlinked side
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {r["id"]: r for r in hits(df, iters=5).collect()}
        assert got[4]["authority"] == 0.0
        # node 3 is the dominant authority
        assert got[3]["authority"] == max(r["authority"] for r in got.values())

    def test_multi_edge_counts_twice(self, spark):
        from temporalscope_spark.operators.graph import hits

        single = spark.createDataFrame(
            [(1, 2), (3, 2), (3, 4)], "src long, dst long"
        )
        doubled = spark.createDataFrame(
            [(1, 2), (1, 2), (3, 2), (3, 4)], "src long, dst long"
        )
        s1 = {r["id"]: r["hub"] for r in hits(single, iters=3).collect()}
        s2 = {r["id"]: r["hub"] for r in hits(doubled, iters=3).collect()}
        assert s2[1] > s1[1]

    def test_scores_sum_to_one(self, spark):
        from temporalscope_spark.operators.graph import hits

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        rows = hits(df, iters=4).collect()
        assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-9)
        assert sum(r["authority"] for r in rows) == pytest.approx(1.0, abs=1e-9)

    def test_validation(self, spark):
        from temporalscope_spark.operators.graph import hits

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        with pytest.raises(DataFrameValidationError):
            hits(df, iters=0)
        with pytest.raises(DataFrameValidationError):
            hits(df, src="nope")


class TestTriangleCounts:
    def _run(self, spark, pairs):
        from temporalscope_spark.operators.graph import triangle_counts

        df = spark.createDataFrame(pairs, "src long, dst long")
        return {r["id"]: r for r in triangle_counts(df).collect()}

    def test_single_triangle(self, spark):
        out = self._run(spark, [(1, 2), (2, 3), (3, 1)])
        for i in (1, 2, 3):
            assert out[i]["triangles"] == 1
            assert out[i]["degree"] == 2
            assert out[i]["clustering_coeff"] == 1.0

    def test_k4_every_node_three(self, spark):
        pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
        out = self._run(spark, pairs)
        for i in range(4):
            assert out[i]["triangles"] == 3
            assert out[i]["clustering_coeff"] == 1.0

    def test_path_has_none(self, spark):
        out = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert all(r["triangles"] == 0 for r in out.values())
        assert out[2]["clustering_coeff"] == 0.0

    def test_direction_dups_selfloops_ignored(self, spark):
        out = self._run(
            spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1)]
        )
        assert all(r["triangles"] == 1 for r in out.values())

    def test_bowtie(self, spark):
        # two triangles sharing node 3: node 3 has 2 triangles, deg 4
        out = self._run(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)])
        assert out[3]["triangles"] == 2 and out[3]["degree"] == 4
        assert out[3]["clustering_coeff"] == pytest.approx(2 * 2 / (4 * 3))
        assert out[1]["triangles"] == 1

    def test_partition_invariance(self, spark):
        import random

        rng = random.Random(5)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
        from temporalscope_spark.operators.graph import triangle_counts

        df = spark.createDataFrame(pairs, "src long, dst long")
        a = sorted(map(tuple, triangle_counts(df.repartition(1)).collect()))
        b = sorted(map(tuple, triangle_counts(df.repartition(16)).collect()))
        assert a == b

    def test_errors(self, spark):
        from temporalscope_spark.operators.graph import triangle_counts

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(DataFrameValidationError):
            triangle_counts(df, src_col="nope")


# ---------------------------------------------------------------------------
# k-core peeling (kcore)
# ---------------------------------------------------------------------------

from temporalscope_spark.operators.graph import kcore  # noqa: E402


def _brute_kcore(edges, k):
    """Peel to fixed point over the undirected simple graph."""
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {u for e in simple for u in e}
    while True:
        deg = {n: 0 for n in nodes}
        for u, v in simple:
            if u in nodes and v in nodes:
                deg[u] += 1
                deg[v] += 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return {n: deg[n] for n in nodes}
        nodes -= drop
        simple = {e for e in simple if e[0] in nodes and e[1] in nodes}


class TestKCore:
    # triangle 1-2-3 fused to a 4-clique 3-4-5-6, plus a tail 6-7-8
    KEDGES = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6),
        (6, 7), (7, 8),
        (9, 9),          # self-loop: dropped
        (4, 5),          # duplicate edge: dropped
        (5, 4),          # reversed duplicate: dropped
    ]

    @pytest.mark.parametrize("k", [1, 2, 3, 4])
    def test_matches_bruteforce_peel(self, spark, k):
        df = spark.createDataFrame(self.KEDGES, "src long, dst long")
        got = {r["id"]: r["degree"] for r in kcore(df, k).collect()}
        assert got == _brute_kcore(self.KEDGES, k)

    def test_3core_is_the_clique(self, spark):
        df = spark.createDataFrame(self.KEDGES, "src long, dst long")
        got = {r["id"]: r["degree"] for r in kcore(df, 3).collect()}
        assert got == {3: 3, 4: 3, 5: 3, 6: 3}

    def test_empty_core(self, spark):
        df = spark.createDataFrame(self.KEDGES, "src long, dst long")
        assert kcore(df, 5).count() == 0

    def test_max_rounds_truncates(self, spark):
        # a path 1-2-3-4-5 peels one endpoint-pair per round under k=2;
        # with max_rounds=1 the first peel survives unfinished
        path = [(1, 2), (2, 3), (3, 4), (4, 5)]
        df = spark.createDataFrame(path, "src long, dst long")
        one = {r["id"] for r in kcore(df, 2, max_rounds=1).collect()}
        full = {r["id"] for r in kcore(df, 2, max_rounds=10).collect()}
        assert full == set()  # a path has no 2-core
        # after one peel the survivors are {2,3,4} with internal degrees
        # 1,2,1; the final >=k filter on the surviving graph keeps only 3
        assert one == {3}

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(DataFrameValidationError):
            kcore(df, 0)
        with pytest.raises(DataFrameValidationError):
            kcore(df, 2, max_rounds=0)
        with pytest.raises(DataFrameValidationError):
            kcore(df, 2, src_col="nope")
