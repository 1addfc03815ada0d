"""Classification metrics (metrics/classification.py): exact AUC vs the
O(n²) pairwise definition (ties included), calibration bins, decile lift."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.metrics.classification import (
    auc_roc,
    lift_table,
    reliability_curve,
)


def _brute_auc(scores, labels):
    """Pairwise Mann–Whitney: wins + half-ties over pos×neg pairs."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    return num / (len(pos) * len(neg))


@pytest.fixture
def scored(spark):
    rng = np.random.default_rng(3)
    n = 300
    y = (rng.random(n) < 0.4).astype(int)
    # informative score with heavy ties: quantized to 20 levels
    s = np.round((0.5 * y + 0.5 * rng.random(n)) * 20) / 20
    rows = [(float(a), int(b)) for a, b in zip(s, y)]
    return rows, spark.createDataFrame(rows, ["score", "y"])


class TestAuc:
    def test_matches_pairwise_bruteforce(self, spark, scored):
        rows, df = scored
        want = _brute_auc([r[0] for r in rows], [r[1] for r in rows])
        got = auc_roc(df, "score", "y").collect()[0]
        assert got["auc"] == pytest.approx(want, abs=2e-6)
        assert got["n_pos"] == sum(r[1] for r in rows)
        assert got["n_pos"] + got["n_neg"] == len(rows)

    def test_perfect_and_inverted(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], ["score", "y"]
        )
        assert auc_roc(df, "score", "y").collect()[0]["auc"] == 1.0
        inv = df.withColumn("score", 1 - F.col("score"))
        assert auc_roc(inv, "score", "y").collect()[0]["auc"] == 0.0

    def test_all_tied_is_half(self, spark):
        df = spark.createDataFrame(
            [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], ["score", "y"]
        )
        assert auc_roc(df, "score", "y").collect()[0]["auc"] == 0.5

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (None, 1), (0.1, 0), (0.2, None)],
            "score double, y int",
        )
        got = auc_roc(df, "score", "y").collect()[0]
        assert (got["n_pos"], got["n_neg"]) == (1, 1)
        assert got["auc"] == 1.0

    def test_partition_invariance(self, spark, scored):
        _, df = scored
        a = auc_roc(df.repartition(1), "score", "y").collect()[0]["auc"]
        b = auc_roc(df.repartition(8), "score", "y").collect()[0]["auc"]
        assert a == b

    def test_errors(self, spark):
        bad = spark.createDataFrame([(0.5, 2), (0.2, 0)], ["score", "y"])
        with pytest.raises(DataFrameValidationError, match="0/1"):
            auc_roc(bad, "score", "y")
        one = spark.createDataFrame([(0.5, 1), (0.2, 1)], ["score", "y"])
        with pytest.raises(DataFrameValidationError, match="both classes"):
            auc_roc(one, "score", "y")
        with pytest.raises(DataFrameValidationError, match="missing column"):
            auc_roc(one, "nope", "y")


class TestReliability:
    def test_hand_bins(self, spark):
        rows = [
            (0.05, 0), (0.08, 0),           # bin 1: frac 0
            (0.55, 1), (0.55, 0),           # bin 6: frac .5, mean .55
            (0.95, 1), (0.99, 1), (1.0, 1), # bin 10 (1.0 clamps in)
        ]
        df = spark.createDataFrame(rows, ["p", "y"])
        got = {r["bin"]: r for r in reliability_curve(df, "p", "y").collect()}
        assert set(got) == {1, 6, 10}
        assert got[6]["mean_score"] == pytest.approx(0.55, abs=1e-6)
        assert got[6]["frac_pos"] == pytest.approx(0.5, abs=1e-6)
        assert got[6]["gap"] == pytest.approx(-0.05, abs=1e-6)
        assert got[10]["n"] == 3 and got[10]["frac_pos"] == 1.0
        assert got[1]["lo"] == 0.0 and got[1]["hi"] == pytest.approx(0.1)

    def test_calibrated_scores_have_small_gap(self, spark):
        rng = np.random.default_rng(9)
        n = 4000
        p = rng.random(n)
        y = (rng.random(n) < p).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(p, y)], ["p", "y"]
        )
        worst = (
            reliability_curve(df, "p", "y", bins=5)
            .agg(F.max(F.abs(F.col("gap"))))
            .collect()[0][0]
        )
        assert worst < 0.08, worst

    def test_errors(self, spark):
        df = spark.createDataFrame([(0.5, 1)], ["p", "y"])
        with pytest.raises(DataFrameValidationError, match="bins"):
            reliability_curve(df, "p", "y", bins=1)


class TestLift:
    def test_hand_lift(self, spark):
        # 100 rows, scores 0..99 (distinct), positives = top 20 scores
        rows = [(float(i), 1 if i >= 80 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, ["s", "y"])
        got = {r["decile"]: r for r in lift_table(df, "s", "y", 10).collect()}
        assert got[1]["n"] == 10 and got[1]["n_pos"] == 10
        assert got[1]["pos_rate"] == 1.0
        assert got[1]["lift"] == pytest.approx(5.0, abs=1e-6)  # 1.0 / 0.2
        assert got[1]["cum_capture"] == pytest.approx(0.5, abs=1e-6)
        assert got[2]["cum_capture"] == pytest.approx(1.0, abs=1e-6)
        assert got[2]["cum_lift"] == pytest.approx(5.0, abs=1e-6)
        assert got[10]["n_pos"] == 0 and got[10]["lift"] == 0.0
        # cumulative capture is monotone and ends at 1
        caps = [got[d]["cum_capture"] for d in sorted(got)]
        assert caps == sorted(caps) and caps[-1] == pytest.approx(1.0)

    def test_random_scores_lift_near_one(self, spark):
        rng = np.random.default_rng(17)
        n = 5000
        rows = [
            (float(rng.random()), int(rng.random() < 0.3)) for _ in range(n)
        ]
        df = spark.createDataFrame(rows, ["s", "y"])
        got = lift_table(df, "s", "y", 5).collect()
        for r in got:
            assert 0.7 < r["lift"] < 1.3, r

    def test_errors(self, spark):
        df = spark.createDataFrame([(0.5, 1)], ["s", "y"])
        with pytest.raises(DataFrameValidationError, match="deciles"):
            lift_table(df, "s", "y", 1)
