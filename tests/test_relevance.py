"""Feature-relevance battery (operators/relevance.py)."""

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.relevance import (
    correlation_matrix,
    feature_relevance,
)


def _brute(pairs):
    """(mi, chi2, dof, cramers_v, n, nv, nl) over (value, label) pairs."""
    cells = Counter(pairs)
    n = float(len(pairs))
    av = Counter(v for v, _ in pairs)
    bl = Counter(y for _, y in pairs)
    mi = chi2 = 0.0
    for v in av:
        for y in bl:
            o = float(cells.get((v, y), 0))
            e = av[v] * bl[y] / n
            if o > 0:
                mi += (o / n) * math.log(o / e)
            chi2 += (o - e) ** 2 / e
    nv, nl = len(av), len(bl)
    dof = (nv - 1) * (nl - 1)
    cv = (
        math.sqrt(chi2 / (n * min(nv - 1, nl - 1)))
        if min(nv - 1, nl - 1) >= 1
        else None
    )
    return mi, chi2, dof, cv, int(n), nv, nl


@pytest.fixture
def table(spark):
    rows = []
    # f_dep == label exactly; f_ind independent-ish; f_const constant
    data = [
        ("a", "a", "x", 1),
        ("a", "a", "y", 1),
        ("b", "b", "x", 1),
        ("b", "b", "y", 1),
        ("a", "a", "x", 1),
        ("b", "b", "y", 1),
        ("a", "a", "y", 1),
        ("b", "b", "x", 1),
    ]
    rows = [(f1, lab, f2, c) for f1, lab, f2, c in data]
    return spark.createDataFrame(rows, ["f_dep", "label", "f_ind", "f_const"])


class TestFeatureRelevance:
    def test_matches_bruteforce(self, spark, table):
        got = {
            r["feature"]: r
            for r in feature_relevance(
                table, ["f_dep", "f_ind", "f_const"], "label"
            ).collect()
        }
        raw = table.collect()
        for feat in ("f_dep", "f_ind", "f_const"):
            pairs = [
                (str(r[feat]), r["label"])
                for r in raw
                if r[feat] is not None and r["label"] is not None
            ]
            mi, chi2, dof, cv, n, nv, nl = _brute(pairs)
            row = got[feat]
            assert row["n_obs"] == n
            assert (row["n_values"], row["n_labels"]) == (nv, nl)
            assert row["mi_nats"] == pytest.approx(mi, abs=2e-6)
            assert row["chi2"] == pytest.approx(chi2, abs=2e-6)
            assert row["dof"] == dof
            if cv is None:
                assert row["cramers_v"] is None
            else:
                assert row["cramers_v"] == pytest.approx(cv, abs=2e-6)

    def test_perfect_dependence(self, spark, table):
        got = {
            r["feature"]: r
            for r in feature_relevance(table, ["f_dep"], "label").collect()
        }
        # f_dep == label: MI = H(label) = ln 2 for the 50/50 split;
        # Cramér's V = 1
        assert got["f_dep"]["mi_nats"] == pytest.approx(math.log(2), abs=2e-6)
        assert got["f_dep"]["cramers_v"] == pytest.approx(1.0, abs=2e-6)

    def test_independence_scores_zero(self, spark, table):
        got = {
            r["feature"]: r
            for r in feature_relevance(table, ["f_ind"], "label").collect()
        }
        # f_ind is exactly balanced against the label in the fixture
        assert got["f_ind"]["mi_nats"] == pytest.approx(0.0, abs=2e-6)
        assert got["f_ind"]["chi2"] == pytest.approx(0.0, abs=2e-6)

    def test_constant_feature_degenerates(self, spark, table):
        got = {
            r["feature"]: r
            for r in feature_relevance(table, ["f_const"], "label").collect()
        }
        row = got["f_const"]
        assert (row["n_values"], row["dof"]) == (1, 0)
        assert row["cramers_v"] is None
        assert row["mi_nats"] == pytest.approx(0.0, abs=2e-6)

    def test_nulls_dropped_pairwise(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), (None, "y"), ("b", "y"), ("b", "y")],
            ["f", "label"],
        )
        row = feature_relevance(df, ["f"], "label").collect()[0]
        assert row["n_obs"] == 3  # only rows with both sides non-null

    def test_numeric_features_melt_as_strings(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (1, 0), (2, 1), (2, 1)], ["f", "label"]
        )
        row = feature_relevance(df, ["f"], "label").collect()[0]
        assert row["cramers_v"] == pytest.approx(1.0, abs=2e-6)

    def test_validations(self, spark, table):
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            feature_relevance(table, [], "label")
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            feature_relevance(table, ["nope"], "label")

    def test_cell_branch_point_is_persisted(self, spark, table):
        """The cell table feeds four consumers (both marginals, totals,
        grid join); the operator persists it so the corpus melt+count runs
        once, and attaches the handle for release."""
        from temporalscope_spark.core.caching import held_handles, release

        out = feature_relevance(table, ["f_dep", "f_ind"], "label")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        handles = held_handles(out)
        assert len(handles) == 1
        out.collect()
        release(out)
        assert handles[0].storageLevel.useMemory is False


class TestCorrelationMatrix:
    @pytest.fixture
    def num(self, spark):
        rows = [
            (1.0, 2.0, 5.0),
            (2.0, 4.0, 5.0),
            (3.0, 6.0, 5.0),
            (4.0, 8.1, 5.0),
            (None, 1.0, 5.0),
            (5.0, None, 5.0),
        ]
        return spark.createDataFrame(rows, ["x", "y", "z"])

    def test_matches_pandas(self, spark, num):
        import pandas as pd

        pdf = num.toPandas()
        got = {
            (r["f1"], r["f2"]): r
            for r in correlation_matrix(num, ["x", "y", "z"]).collect()
        }
        assert set(got) == {
            ("x", "x"), ("x", "y"), ("x", "z"),
            ("y", "y"), ("y", "z"), ("z", "z"),
        }
        for (a, b), r in got.items():
            sub = pdf[[a, b]].dropna() if a != b else pdf[[a]].dropna()
            if a != b:
                want_cov = sub[a].cov(sub[b])
                want_corr = sub[a].corr(sub[b])
                assert r["n_pairs"] == len(sub)
                assert r["cov"] == pytest.approx(want_cov, abs=2e-6)
                if pd.isna(want_corr):
                    assert r["corr"] is None
                else:
                    assert r["corr"] == pytest.approx(want_corr, abs=2e-6)
            else:
                assert r["cov"] == pytest.approx(sub[a].var(), abs=2e-6)

    def test_constant_column_corr_null(self, spark, num):
        got = {
            (r["f1"], r["f2"]): r
            for r in correlation_matrix(num, ["x", "z"]).collect()
        }
        assert got[("x", "z")]["corr"] is None  # z constant -> zero variance
        assert got[("z", "z")]["corr"] is None
        assert got[("x", "x")]["corr"] == pytest.approx(1.0, abs=2e-6)

    def test_perfect_linear(self, spark):
        df = spark.createDataFrame(
            [(1.0, -2.0), (2.0, -4.0), (3.0, -6.0)], ["a", "b"]
        )
        got = {
            (r["f1"], r["f2"]): r for r in correlation_matrix(df, ["a", "b"]).collect()
        }
        assert got[("a", "b")]["corr"] == pytest.approx(-1.0, abs=2e-6)

    def test_validations(self, spark, num):
        with pytest.raises(DataFrameValidationError, match=">= 2"):
            correlation_matrix(num, ["x"])
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            correlation_matrix(num, ["x", "nope"])

    def test_one_aggregation_plan(self, spark, num):
        """All moments come from ONE aggregate over one scan."""
        plan = (
            correlation_matrix(num, ["x", "y", "z"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("Aggregate") == 1


class TestAnovaF:
    """anova_f (operators/relevance.py): one-way ANOVA F vs a numpy
    hand-fold, pairwise-complete gating, degenerate classes, t² identity."""

    @pytest.fixture
    def adf(self, spark):
        rng = np.random.default_rng(7)
        rows = []
        for i in range(300):
            cls = ("a", "b", "c")[i % 3]
            shift = {"a": 0.0, "b": 1.5, "c": -0.5}[cls]
            rows.append(
                (i, float(shift + rng.normal()), float(rng.normal()), cls)
            )
        return spark.createDataFrame(rows, ["rid", "strong", "weak", "cls"])

    @staticmethod
    def _f_oneway(groups):
        allx = np.concatenate(groups)
        n, k = len(allx), len(groups)
        mean = allx.mean()
        ssb = sum(len(g) * (g.mean() - mean) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        return (ssb / (k - 1)) / (ssw / (n - k))

    def test_matches_numpy(self, spark, adf):
        from temporalscope_spark.operators.relevance import anova_f

        pdf = adf.toPandas()
        got = {
            r["feature"]: r for r in anova_f(adf, ["strong", "weak"], "cls").collect()
        }
        for c in ("strong", "weak"):
            groups = [
                pdf.loc[pdf.cls == v, c].to_numpy() for v in ("a", "b", "c")
            ]
            assert got[c]["f_stat"] == pytest.approx(self._f_oneway(groups), rel=1e-5)
            assert got[c]["n"] == 300
            assert got[c]["k_classes"] == 3
            assert got[c]["df_between"] == 2
            assert got[c]["df_within"] == 297
        assert got["strong"]["f_stat"] > got["weak"]["f_stat"]

    def test_binary_equals_t_squared(self, spark, adf):
        """For 2 classes, ANOVA F == t² of the point-biserial correlation —
        cross-checks anova_f against numeric_relevance on the same data."""
        from temporalscope_spark.operators.relevance import (
            anova_f,
            numeric_relevance,
        )

        two = adf.filter(F.col("cls") != "c")
        fv = anova_f(two, ["strong"], "cls").collect()[0]["f_stat"]
        num = two.withColumn("ybin", (F.col("cls") == "b").cast("double"))
        t = numeric_relevance(num, ["strong"], "ybin").collect()[0]["t_stat"]
        assert fv == pytest.approx(t * t, rel=1e-4)

    def test_null_pairs_excluded(self, spark, adf):
        from temporalscope_spark.operators.relevance import anova_f

        holey = adf.withColumn(
            "strong", F.when(F.col("rid") % 3 != 0, F.col("strong"))
        )
        got = anova_f(holey, ["strong"], "cls").collect()[0]
        assert got["n"] == 200

    def test_degenerate(self, spark):
        from temporalscope_spark.operators.relevance import anova_f

        one_class = spark.createDataFrame(
            [(1.0, "a"), (2.0, "a")], ["x", "cls"]
        )
        assert anova_f(one_class, ["x"], "cls").collect()[0]["f_stat"] is None
        const_within = spark.createDataFrame(
            [(1.0, "a"), (1.0, "a"), (5.0, "b"), (5.0, "b")], ["x", "cls"]
        )
        assert anova_f(const_within, ["x"], "cls").collect()[0]["f_stat"] is None

    def test_errors(self, spark, adf):
        from temporalscope_spark.operators.relevance import anova_f

        with pytest.raises(DataFrameValidationError):
            anova_f(adf, [], "cls")
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            anova_f(adf, ["nope"], "cls")

    def test_two_exchanges(self, spark, adf):
        """One corpus melt+groupBy(feature, class), one bounded regroup."""
        from temporalscope_spark.operators.relevance import anova_f

        plan = (
            anova_f(adf, ["strong", "weak"], "cls")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 2


class TestSpearman:
    """spearman_matrix: pandas parity (ties included), monotone-invariance,
    null convention, no single-partition window."""

    def test_matches_pandas(self, spark):
        from temporalscope_spark.operators.relevance import spearman_matrix

        rng = np.random.default_rng(13)
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "a": rng.normal(size=200),
                # ties: integer-valued column exercises average ranks
                "b": rng.integers(0, 7, size=200).astype(float),
                "c": rng.normal(size=200),
            }
        )
        pdf["c"] = pdf["a"] ** 3 + 0.3 * pdf["c"]  # monotone-ish link
        df = spark.createDataFrame(pdf)
        want = pdf.corr(method="spearman")
        got = {
            (r["f1"], r["f2"]): r["rho"]
            for r in spearman_matrix(df, ["a", "b", "c"]).collect()
        }
        for (i, j), rho in got.items():
            assert rho == pytest.approx(want.loc[i, j], abs=2e-6)

    def test_monotone_transform_invariant(self, spark):
        """Spearman is invariant to strictly increasing transforms —
        rho(x, exp(x)) == 1 exactly."""
        from temporalscope_spark.operators.relevance import spearman_matrix

        df = spark.range(100).select(
            (F.col("id").cast("double") - 50).alias("x")
        ).withColumn("ex", F.exp(F.col("x") / 10))
        got = {
            (r["f1"], r["f2"]): r["rho"]
            for r in spearman_matrix(df, ["x", "ex"]).collect()
        }
        assert got[("x", "ex")] == pytest.approx(1.0, abs=2e-6)
        assert got[("x", "x")] == pytest.approx(1.0, abs=2e-6)

    def test_null_convention(self, spark):
        """Ranks come from each column's FULL non-null set; pairs with a
        NULL on either side drop from the moments."""
        from temporalscope_spark.operators.relevance import spearman_matrix

        rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, 5.0), (5.0, 50.0)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = {
            (r["f1"], r["f2"]): r
            for r in spearman_matrix(df, ["x", "y"]).collect()
        }
        assert got[("x", "y")]["n_pairs"] == 4
        # hand fold: x ranks 1..5; y ranks over {5,10,30,50} = 2,_,3,1,4
        rx, ry = np.array([1, 3, 4, 5]), np.array([2.0, 3, 1, 4])
        want = np.corrcoef(rx, ry)[0, 1]
        assert got[("x", "y")]["rho"] == pytest.approx(want, abs=2e-6)

    def test_partition_invariance(self, spark):
        from temporalscope_spark.operators.relevance import spearman_matrix

        df = spark.range(300).select(
            (F.pmod(F.col("id") * 37, F.lit(101))).cast("double").alias("x"),
            (F.pmod(F.col("id") * 11, F.lit(17))).cast("double").alias("y"),
        )
        a = sorted(map(tuple, spearman_matrix(df.repartition(1), ["x", "y"]).collect()))
        b = sorted(map(tuple, spearman_matrix(df.repartition(8), ["x", "y"]).collect()))
        assert a == b

    def test_no_single_partition_window(self, spark):
        from temporalscope_spark.operators.relevance import spearman_matrix

        df = spark.range(100).select(
            F.col("id").cast("double").alias("x"),
            (F.col("id") * 2).cast("double").alias("y"),
        )
        plan = (
            spearman_matrix(df, ["x", "y"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the ONLY single-partition exchange is the final 1-row moment
        # aggregate (map-side partials -> one scalar row, size-independent);
        # every Window is bucket-partitioned (the two-phase cumsum)
        assert plan.count("SinglePartition") == 1
        for line in plan.splitlines():
            if "+- Window " in line:
                assert "_rn_bucket" in line

    def test_errors(self, spark):
        from temporalscope_spark.operators.relevance import spearman_matrix

        df = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
        with pytest.raises(DataFrameValidationError, match=">= 2"):
            spearman_matrix(df, ["x"])
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            spearman_matrix(df, ["x", "nope"])


class TestMrmr:
    """select_features_mrmr: redundancy beats raw relevance (the mRMR
    signature), viability gating, determinism."""

    @pytest.fixture
    def mdf(self, spark):
        rng = np.random.default_rng(5)
        n = 400
        y = rng.normal(size=n)
        x1 = y + rng.normal(scale=0.3, size=n)         # strong
        x2 = x1 + rng.normal(scale=0.05, size=n)       # near-duplicate of x1
        x3 = 0.5 * y + rng.normal(scale=1.0, size=n)   # moderate, independent
        return spark.createDataFrame(
            [
                (float(a), float(b), float(c), 5.0, float(t))
                for a, b, c, t in zip(x1, x2, x3, y)
            ],
            ["x1", "x2", "x3", "xconst", "y"],
        )

    def test_redundancy_penalty(self, spark, mdf):
        from temporalscope_spark.operators.relevance import select_features_mrmr

        got = select_features_mrmr(mdf, ["x1", "x2", "x3"], "y", k=2).collect()
        assert [r["feature"] for r in got] == ["x1", "x3"]
        assert got[0]["rank"] == 1 and got[0]["redundancy"] == 0.0
        assert got[0]["score"] == got[0]["relevance"]
        # x2 (near-dup) individually outranks x3 — the penalty flipped it
        from temporalscope_spark.operators.relevance import numeric_relevance

        rel = {
            r["feature"]: abs(r["pearson_r"])
            for r in numeric_relevance(mdf, ["x2", "x3"], "y").collect()
        }
        assert rel["x2"] > rel["x3"]

    def test_constant_excluded_and_k_capped(self, spark, mdf):
        from temporalscope_spark.operators.relevance import select_features_mrmr

        got = select_features_mrmr(
            mdf, ["x1", "x2", "x3", "xconst"], "y", k=10
        ).collect()
        names = [r["feature"] for r in got]
        assert "xconst" not in names and len(names) == 3
        assert [r["rank"] for r in got] == [1, 2, 3]

    def test_greedy_replay(self, spark, mdf):
        """The selection replays exactly from the two collected tables."""
        from temporalscope_spark.operators.relevance import (
            correlation_matrix,
            numeric_relevance,
            select_features_mrmr,
        )

        cols = ["x1", "x2", "x3"]
        rel = {
            r["feature"]: abs(r["pearson_r"])
            for r in numeric_relevance(mdf, cols, "y").collect()
        }
        sym = {}
        for r in correlation_matrix(mdf, cols).collect():
            sym[(r["f1"], r["f2"])] = abs(r["corr"])
            sym[(r["f2"], r["f1"])] = abs(r["corr"])
        sel = []
        remaining = sorted(rel)
        while remaining:
            best = max(
                remaining,
                key=lambda f: (
                    rel[f]
                    - (
                        sum(sym.get((f, s), 0.0) for s in sel) / len(sel)
                        if sel
                        else 0.0
                    ),
                    # max() keeps the FIRST of ties; remaining is sorted asc
                ),
            )
            sel.append(best)
            remaining.remove(best)
        got = [
            r["feature"]
            for r in select_features_mrmr(mdf, cols, "y", k=3).collect()
        ]
        assert got == sel

    def test_errors(self, spark, mdf):
        from temporalscope_spark.operators.relevance import select_features_mrmr

        with pytest.raises(DataFrameValidationError, match="k must be"):
            select_features_mrmr(mdf, ["x1"], "y", k=0)
        with pytest.raises(DataFrameValidationError, match="missing columns"):
            select_features_mrmr(mdf, ["nope"], "y", k=1)
