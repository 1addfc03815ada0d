"""Label propagation communities and k-anonymity audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.graph import label_propagation
from temporalscope_spark.operators.pii import k_anonymity


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


class TestLabelPropagation:
    def test_two_cliques_bridge(self, spark):
        # two 4-cliques joined by ONE bridge edge: components would merge
        # them; LPA keeps two communities (the bridge is outvoted)
        k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
        e = _edges(spark, k1 + k2 + [(3, 10)])
        out = {r["id"]: r["label"] for r in label_propagation(e, iters=6).collect()}
        c1 = {out[i] for i in range(4)}
        c2 = {out[i] for i in range(10, 14)}
        assert len(c1) == 1 and len(c2) == 1 and c1 != c2

    def test_clique_converges_to_min(self, spark):
        e = _edges(spark, [(5, 6), (6, 7), (5, 7)])
        out = {r["id"]: r["label"] for r in label_propagation(e, iters=5).collect()}
        assert set(out.values()) == {5}

    def test_no_inedge_keeps_label(self, spark):
        # directed: 1 -> 2 only; node 1 has no in-edges
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        out = {r["id"]: r["label"] for r in label_propagation(e, iters=3).collect()}
        assert out[1] == 1 and out[2] == 1

    def test_partition_invariant(self, spark):
        pairs = [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]
        e = _edges(spark, pairs)
        a = sorted(map(tuple, label_propagation(e, iters=4).collect()))
        b = sorted(map(tuple, label_propagation(e.repartition(11), iters=4).collect()))
        assert a == b

    def test_errors(self, spark):
        e = _edges(spark, [(1, 2)])
        with pytest.raises(DataFrameValidationError):
            label_propagation(e, iters=0)
        with pytest.raises(DataFrameValidationError):
            label_propagation(e, src="nope")


class TestKAnonymity:
    @pytest.fixture(scope="class")
    def people(self, spark):
        rows = [(i, "10001", 1980 + i % 2) for i in range(10)]   # big group(s)
        rows += [(100, "94110", 1999), (101, "94110", 1999)]      # size 2
        rows += [(200, "60601", 2001)]                            # size 1
        rows += [(300, None, 1980), (301, None, 1980)]            # nulls match
        return spark.createDataFrame(rows, "uid long, zip string, birth int")

    def test_violations(self, people):
        out = {(r["zip"], r["birth"]): r for r in
               k_anonymity(people, ["zip", "birth"], k=3).collect()}
        assert out[("94110", 1999)]["deficit"] == 1
        assert out[("60601", 2001)]["deficit"] == 2
        assert out[(None, 1980)]["group_size"] == 2
        assert ("10001", 1980) not in out  # size 5 >= 3

    def test_anonymous_table_empty(self, people):
        assert k_anonymity(people, ["zip", "birth"], k=2).filter(
            F.col("group_size") >= 2
        ).count() == 0
        big = people.filter(F.col("zip") == "10001")
        assert k_anonymity(big, ["zip"], k=5).count() == 0

    def test_errors(self, people):
        with pytest.raises(DataFrameValidationError):
            k_anonymity(people, [], k=3)
        with pytest.raises(DataFrameValidationError):
            k_anonymity(people, ["zip"], k=1)
        with pytest.raises(DataFrameValidationError):
            k_anonymity(people, ["nope"], k=3)


class TestLDiversity:
    @pytest.fixture(scope="class")
    def people(self, spark):
        # zip 10001: 6 rows, 3 distinct diagnoses -> diverse at l=3
        rows = [(i, "10001", ["flu", "cold", "ok"][i % 3]) for i in range(6)]
        # zip 94110: 4 rows but ONE diagnosis -> homogeneity leak
        rows += [(100 + i, "94110", "flu") for i in range(4)]
        # zip 60601: 3 rows, 2 distinct -> violates l=3 with deficit 1
        rows += [(200, "60601", "flu"), (201, "60601", "cold"),
                 (202, "60601", "flu")]
        # zip 70001: sensitive all NULL -> n_sensitive 0, deficit l
        rows += [(300, "70001", None), (301, "70001", None)]
        return spark.createDataFrame(rows, "uid long, zip string, diag string")

    def test_violations(self, people):
        from temporalscope_spark.operators.pii import l_diversity

        out = {r["zip"]: r for r in
               l_diversity(people, ["zip"], "diag", l=3).collect()}
        assert "10001" not in out                       # 3 distinct >= 3
        assert out["94110"]["n_sensitive"] == 1
        assert out["94110"]["deficit"] == 2
        assert out["94110"]["group_size"] == 4          # k-anonymous, leaks
        assert out["60601"]["deficit"] == 1
        assert out["70001"]["n_sensitive"] == 0
        assert out["70001"]["deficit"] == 3

    def test_diverse_table_empty(self, people):
        from temporalscope_spark.operators.pii import l_diversity

        ok = people.filter(people.zip == "10001")
        assert l_diversity(ok, ["zip"], "diag", l=3).count() == 0

    def test_errors(self, people):
        from temporalscope_spark.operators.pii import l_diversity

        with pytest.raises(DataFrameValidationError):
            l_diversity(people, [], "diag", l=3)
        with pytest.raises(DataFrameValidationError):
            l_diversity(people, ["zip"], "diag", l=1)
        with pytest.raises(DataFrameValidationError):
            l_diversity(people, ["zip"], "nope", l=3)
        with pytest.raises(DataFrameValidationError):
            l_diversity(people, ["zip", "diag"], "diag", l=3)
