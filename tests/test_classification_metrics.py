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


class TestIsotonic:
    """fit_isotonic_bins + calibrate_scores: PAV == the minimax closed
    form, monotonicity, empty-bin extension, calibration improvement."""

    @staticmethod
    def _minimax(ns, ps):
        """fit(i) = max_{j<=i} min_{k>=i} sum(p[j..k]) / sum(n[j..k])."""
        out = []
        B = len(ns)
        for i in range(B):
            best = -1.0
            for j in range(i + 1):
                worst = min(
                    sum(ps[j:k + 1]) / sum(ns[j:k + 1]) for k in range(i, B)
                )
                best = max(best, worst)
            out.append(best)
        return out

    def test_pav_equals_minimax(self, spark):
        from temporalscope_spark.metrics.classification import fit_isotonic_bins

        rng = np.random.default_rng(21)
        n = 2000
        s = rng.random(n)
        y = (rng.random(n) < np.clip(0.2 + 0.9 * s - 0.4 * s * s, 0, 1)).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)], ["p", "y"]
        )
        model = fit_isotonic_bins(df, "p", "y", bins=8)
        pdf = df.toPandas()
        pdf["bin"] = np.clip(np.floor(pdf.p * 8).astype(int) + 1, 1, 8)
        ns, ps = [], []
        for b in model["bin_ids"]:
            sub = pdf[pdf.bin == b]
            ns.append(len(sub))
            ps.append(float(sub.y.sum()))
        want = self._minimax(ns, ps)
        assert model["values"] == pytest.approx(want, abs=2e-6)
        assert model["values"] == sorted(model["values"])  # monotone

    def test_calibrate_and_extension(self, spark):
        from temporalscope_spark.metrics.classification import (
            calibrate_scores,
            fit_isotonic_bins,
        )

        # occupied bins 1 and 10 only; bins 2-5 extend from 1, 6-10 from 10
        rows = [(0.05, 0)] * 8 + [(0.05, 1)] * 2 + [(0.95, 1)] * 9 + [(0.95, 0)]
        df = spark.createDataFrame(rows, ["p", "y"])
        model = fit_isotonic_bins(df, "p", "y", bins=10)
        assert model["bin_ids"] == [1, 10]
        assert model["values"] == pytest.approx([0.2, 0.9], abs=1e-6)
        probe = spark.createDataFrame(
            [(0.0,), (0.45,), (0.55,), (1.0,), (None,)], "p double"
        )
        got = [
            r["calibrated"]
            for r in calibrate_scores(probe, model, "p").collect()
        ]
        assert got[0] == pytest.approx(0.2)
        assert got[1] == pytest.approx(0.2)   # bin 5 -> nearest occupied 1
        assert got[2] == pytest.approx(0.9)   # bin 6 -> nearest occupied 10
        assert got[3] == pytest.approx(0.9)
        assert got[4] is None

    def test_violator_pooling(self, spark):
        """A non-monotone middle bin gets pooled with its neighbor."""
        from temporalscope_spark.metrics.classification import fit_isotonic_bins

        # bin rates: 0.2, 0.8, 0.4 -> PAV pools bins 2+3 to 0.6
        rows = (
            [(0.1, 1)] * 2 + [(0.1, 0)] * 8
            + [(0.5, 1)] * 8 + [(0.5, 0)] * 2
            + [(0.9, 1)] * 4 + [(0.9, 0)] * 6
        )
        df = spark.createDataFrame(rows, ["p", "y"])
        model = fit_isotonic_bins(df, "p", "y", bins=3)
        assert model["values"] == pytest.approx([0.2, 0.6, 0.6], abs=1e-6)

    def test_calibration_improves(self, spark):
        """Overconfident scores: isotonic recalibration shrinks the worst
        reliability gap."""
        from temporalscope_spark.metrics.classification import (
            calibrate_scores,
            fit_isotonic_bins,
            reliability_curve,
        )

        rng = np.random.default_rng(33)
        n = 5000
        true_p = rng.random(n) * 0.5 + 0.25
        over = np.clip((true_p - 0.5) * 3 + 0.5, 0.001, 0.999)  # overconfident
        y = (rng.random(n) < true_p).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(over, y)], ["p", "y"]
        )
        model = fit_isotonic_bins(df, "p", "y", bins=20)
        cal = calibrate_scores(df, model, "p")
        gap_raw = (
            reliability_curve(df, "p", "y", 5)
            .agg(F.max(F.abs(F.col("gap")))).collect()[0][0]
        )
        gap_cal = (
            reliability_curve(cal, "calibrated", "y", 5)
            .agg(F.max(F.abs(F.col("gap")))).collect()[0][0]
        )
        assert gap_cal < gap_raw / 2, (gap_raw, gap_cal)

    def test_errors(self, spark):
        from temporalscope_spark.metrics.classification import (
            calibrate_scores,
            fit_isotonic_bins,
        )

        df = spark.createDataFrame([(0.5, 2)], ["p", "y"])
        with pytest.raises(DataFrameValidationError, match="0/1"):
            fit_isotonic_bins(df, "p", "y")
        ok = spark.createDataFrame([(0.5, 1), (0.2, 0)], ["p", "y"])
        with pytest.raises(DataFrameValidationError, match="bins"):
            fit_isotonic_bins(ok, "p", "y", bins=1)
        model = fit_isotonic_bins(ok, "p", "y", bins=4)
        with pytest.raises(DataFrameValidationError, match="missing column"):
            calibrate_scores(ok, model, "nope")


class TestPrCurve:
    def test_hand_confusion(self, spark):
        from temporalscope_spark.metrics.classification import pr_curve

        rows = [(0.9, 1), (0.8, 0), (0.6, 1), (0.4, 0), (0.2, 1)]
        df = spark.createDataFrame(rows, ["p", "y"])
        got = {r["threshold"]: r for r in pr_curve(df, "p", "y", [0.5]).collect()}
        r = got[0.5]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 1)
        assert r["precision"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["recall"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["f1"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["accuracy"] == pytest.approx(0.6, abs=1e-6)

    def test_degenerate_thresholds(self, spark):
        from temporalscope_spark.metrics.classification import pr_curve

        df = spark.createDataFrame([(0.3, 1), (0.2, 0)], ["p", "y"])
        got = {r["threshold"]: r for r in pr_curve(df, "p", "y", [0.9]).collect()}
        r = got[0.9]  # nothing predicted positive
        assert r["tp"] == 0 and r["precision"] is None and r["f1"] is None
        assert r["recall"] == 0.0

    def test_monotone_recall(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import pr_curve

        rng = np.random.default_rng(4)
        rows = [
            (float(rng.random()), int(rng.random() < 0.5)) for _ in range(500)
        ]
        df = spark.createDataFrame(rows, ["p", "y"])
        recs = [
            r["recall"]
            for r in sorted(pr_curve(df, "p", "y").collect(), key=lambda r: r["threshold"])
        ]
        assert recs == sorted(recs, reverse=True)  # recall falls with t

    def test_one_aggregation(self, spark):
        from temporalscope_spark.metrics.classification import pr_curve

        df = spark.createDataFrame([(0.3, 1), (0.2, 0)], ["p", "y"])
        plan = pr_curve(df, "p", "y")._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 1

    def test_errors(self, spark):
        from temporalscope_spark.metrics.classification import pr_curve

        df = spark.createDataFrame([(0.3, 1)], ["p", "y"])
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            pr_curve(df, "p", "y", [])


class TestRegressionMetrics:
    def test_matches_numpy(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import regression_metrics

        rng = np.random.default_rng(8)
        y = rng.normal(size=200)
        p = y + rng.normal(scale=0.5, size=200) + 0.1
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(p, y)], ["pred", "y"]
        )
        r = regression_metrics(df, "pred", "y").collect()[0]
        e = p - y
        assert r["n"] == 200
        assert r["rmse"] == pytest.approx(float(np.sqrt((e ** 2).mean())), abs=2e-6)
        assert r["mae"] == pytest.approx(float(np.abs(e).mean()), abs=2e-6)
        assert r["bias"] == pytest.approx(float(e.mean()), abs=2e-6)
        sst = ((y - y.mean()) ** 2).sum()
        assert r["r2"] == pytest.approx(1 - (e ** 2).sum() / sst, abs=2e-5)

    def test_groups_and_nulls(self, spark):
        from temporalscope_spark.metrics.classification import regression_metrics

        rows = [
            ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", None, 5.0),
            ("b", 3.0, 3.0), ("b", 5.0, 5.0),
        ]
        df = spark.createDataFrame(rows, ["g", "pred", "y"])
        got = {
            r["g"]: r
            for r in regression_metrics(df, "pred", "y", ["g"]).collect()
        }
        assert got["a"]["n"] == 2  # null pred row excluded
        assert got["a"]["mae"] == pytest.approx(0.5, abs=1e-6)
        assert got["a"]["r2"] is None  # zero target variance in 'a'
        assert got["b"]["rmse"] == 0.0 and got["b"]["r2"] == 1.0

    def test_errors(self, spark):
        from temporalscope_spark.metrics.classification import regression_metrics

        df = spark.createDataFrame([(1.0, 1.0)], ["pred", "y"])
        with pytest.raises(DataFrameValidationError, match="missing column"):
            regression_metrics(df, "nope", "y")


class TestAucByGroup:
    def test_equals_per_slice_auc(self, spark, scored):
        from temporalscope_spark.metrics.classification import (
            auc_by_group,
            auc_roc,
        )

        rows, df = scored
        g = df.withColumn("g", (F.col("score") * 100).cast("int") % 3)
        got = {r["g"]: r for r in auc_by_group(g, "score", "y", ["g"]).collect()}
        for k in got:
            want = auc_roc(
                g.filter(F.col("g") == k), "score", "y"
            ).collect()[0]
            assert got[k]["auc"] == pytest.approx(want["auc"], abs=1e-6)
            assert (got[k]["n_pos"], got[k]["n_neg"]) == (
                want["n_pos"], want["n_neg"],
            )

    def test_single_class_group_null(self, spark):
        from temporalscope_spark.metrics.classification import auc_by_group

        df = spark.createDataFrame(
            [("a", 0.9, 1), ("a", 0.1, 0), ("b", 0.5, 1), ("b", 0.6, 1)],
            ["g", "score", "y"],
        )
        got = {r["g"]: r for r in auc_by_group(df, "score", "y", ["g"]).collect()}
        assert got["a"]["auc"] == 1.0
        assert got["b"]["auc"] is None and got["b"]["n_neg"] == 0

    def test_errors(self, spark):
        from temporalscope_spark.metrics.classification import auc_by_group

        df = spark.createDataFrame([("a", 0.5, 2)], ["g", "score", "y"])
        with pytest.raises(DataFrameValidationError, match="0/1"):
            auc_by_group(df, "score", "y", ["g"])
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            auc_by_group(df, "score", "y", [])


# ---------------------------------------------------------------------------
# classification_report (thresholded confusion + derived scalars + Brier)
# ---------------------------------------------------------------------------

from temporalscope_spark.metrics.classification import classification_report  # noqa: E402


def _brute_report(rows, threshold, grid):
    tp = fp = tn = fn = 0
    sq = 0
    for s, y in rows:
        si = round(s * grid)
        p = 1 if s >= threshold else 0
        if p and y:
            tp += 1
        elif p and not y:
            fp += 1
        elif not p and y:
            fn += 1
        else:
            tn += 1
        sq += (si - grid * y) ** 2
    n = len(rows)
    pos, neg, ppos, pneg = tp + fn, fp + tn, tp + fp, fn + tn
    prec = tp / ppos if ppos else 0.0
    rec = tp / pos if pos else 0.0
    f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    bal = (rec + (tn / neg if neg else 0.0)) / 2
    den = float(pos) * float(neg) * float(ppos) * float(pneg)
    mcc = float(tp * tn - fp * fn) / den ** 0.5 if den else 0.0
    return dict(
        n=n, tp=tp, fp=fp, tn=tn, fn=fn,
        accuracy=round((tp + tn) / n, 6), precision=round(prec, 6),
        recall=round(rec, 6), f1=round(f1, 6),
        balanced_accuracy=round(bal, 6), mcc=round(mcc, 6),
        brier=round(sq / (grid * grid * n), 6),
    )


class TestClassificationReport:
    @pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
    def test_matches_bruteforce(self, spark, scored, threshold):
        rows, df = scored
        got = classification_report(df, "score", "y", threshold=threshold).collect()[0]
        want = _brute_report(rows, threshold, 100)
        for k, v in want.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=2e-6), k
            else:
                assert got[k] == v, k

    def test_all_positive_predictions(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (0.8, 0), (0.7, 1)], ["score", "y"]
        )
        got = classification_report(df, "score", "y", threshold=0.0).collect()[0]
        assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (2, 1, 0, 0)
        assert got["recall"] == 1.0
        assert got["mcc"] == 0.0  # empty predicted-negative marginal

    def test_degenerate_single_class(self, spark):
        df = spark.createDataFrame([(0.2, 0), (0.9, 0)], ["score", "y"])
        got = classification_report(df, "score", "y").collect()[0]
        assert got["recall"] == 0.0 and got["precision"] == 0.0
        assert got["accuracy"] == 0.5

    def test_brier_known_value(self, spark):
        # (0.25-1)^2 + (0.75-0)^2 over 2 rows = 0.5625
        df = spark.createDataFrame([(0.25, 1), (0.75, 0)], ["score", "y"])
        got = classification_report(df, "score", "y", grid=4).collect()[0]
        assert got["brier"] == pytest.approx(0.5625, abs=1e-9)

    def test_bad_label_raises(self, spark):
        df = spark.createDataFrame([(0.5, 2)], ["score", "y"])
        with pytest.raises(DataFrameValidationError):
            classification_report(df, "score", "y")

    def test_bad_grid_raises(self, spark):
        df = spark.createDataFrame([(0.5, 1)], ["score", "y"])
        with pytest.raises(DataFrameValidationError):
            classification_report(df, "score", "y", grid=0)


class TestCohenKappa:
    def test_parity(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import cohen_kappa

        rng = np.random.RandomState(1)
        true = rng.randint(0, 3, 800)
        a = np.where(rng.rand(800) < 0.8, true, rng.randint(0, 3, 800))
        b = np.where(rng.rand(800) < 0.7, true, rng.randint(0, 3, 800))
        df = spark.createDataFrame(
            [(f"c{a[i]}", f"c{b[i]}") for i in range(800)], "ra string, rb string"
        )
        got = cohen_kappa(df, "ra", "rb").collect()[0]
        po = (a == b).mean()
        pe = sum((a == k).mean() * (b == k).mean() for k in range(3))
        assert got["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)
        assert got["n_categories"] == 3

    def test_perfect_and_chance(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import cohen_kappa

        rng = np.random.RandomState(2)
        lab = [f"c{v}" for v in rng.randint(0, 4, 400)]
        df = spark.createDataFrame([(l, l) for l in lab], "ra string, rb string")
        assert cohen_kappa(df, "ra", "rb").collect()[0]["kappa"] == pytest.approx(1.0)
        shuffled = list(lab)
        rng.shuffle(shuffled)
        df2 = spark.createDataFrame(list(zip(lab, shuffled)), "ra string, rb string")
        assert abs(cohen_kappa(df2, "ra", "rb").collect()[0]["kappa"]) < 0.1

    def test_bad_args(self, spark):
        from temporalscope_spark.metrics.classification import cohen_kappa

        df = spark.createDataFrame([("a", "a")], "ra string, rb string")
        with pytest.raises(DataFrameValidationError):
            cohen_kappa(df, "nope", "rb")


class TestMcnemar:
    def test_parity_and_power(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import mcnemar_test

        rng = np.random.RandomState(1)
        before = (rng.rand(500) < 0.6).astype(float)
        after = np.where(rng.rand(500) < 0.15, 1 - before, before)
        df = spark.createDataFrame(
            [(float(before[i]), float(after[i])) for i in range(500)],
            "x double, y double",
        )
        got = mcnemar_test(df, "x", "y").collect()[0]
        b = int(((before == 1) & (after == 0)).sum())
        c = int(((before == 0) & (after == 1)).sum())
        assert (got["n_10"], got["n_01"]) == (b, c)
        assert got["chi2"] == pytest.approx((abs(b - c) - 1) ** 2 / (b + c), abs=1e-6)

    def test_no_discordant_null(self, spark):
        from temporalscope_spark.metrics.classification import mcnemar_test

        df = spark.createDataFrame([(1.0, 1.0), (0.0, 0.0)], "x double, y double")
        assert mcnemar_test(df, "x", "y").collect()[0]["chi2"] is None

    def test_non_binary_raises(self, spark):
        from temporalscope_spark.metrics.classification import mcnemar_test

        df = spark.createDataFrame([(2.0, 1.0)], "x double, y double")
        with pytest.raises(Exception, match="0/1"):
            mcnemar_test(df, "x", "y").collect()


class TestCalibrationReport:
    def test_murphy_terms_parity(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import calibration_report

        rng = np.random.RandomState(1)
        n = 4000
        p = rng.rand(n)
        y = (rng.rand(n) < np.clip(p * 0.8 + 0.1, 0, 1)).astype(float)
        df = spark.createDataFrame(
            [(float(p[i]), float(y[i])) for i in range(n)], "p double, y double"
        )
        got = calibration_report(df, "p", "y", n_bins=10).collect()[0]
        bins = np.minimum((p * 10).astype(int), 9)
        ybar = y.mean()
        rel = res = ece = mce = 0.0
        for b in range(10):
            m = bins == b
            if not m.any():
                continue
            pb, yb = p[m].mean(), y[m].mean()
            rel += m.sum() * (pb - yb) ** 2
            res += m.sum() * (yb - ybar) ** 2
            ece += m.sum() * abs(pb - yb)
            mce = max(mce, abs(pb - yb))
        assert got["brier"] == pytest.approx(((p - y) ** 2).mean(), abs=1e-6)
        assert got["reliability"] == pytest.approx(rel / n, abs=1e-6)
        assert got["resolution"] == pytest.approx(res / n, abs=1e-6)
        assert got["uncertainty"] == pytest.approx(ybar * (1 - ybar), abs=1e-6)
        assert got["ece"] == pytest.approx(ece / n, abs=1e-6)
        assert got["mce"] == pytest.approx(mce, abs=1e-6)

    def test_perfectly_calibrated_small_ece(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import calibration_report

        rng = np.random.RandomState(2)
        p = rng.rand(20000)
        y = (rng.rand(20000) < p).astype(float)
        df = spark.createDataFrame(
            [(float(p[i]), float(y[i])) for i in range(20000)], "p double, y double"
        )
        got = calibration_report(df, "p", "y").collect()[0]
        assert got["ece"] < 0.02 and got["reliability"] < 0.001

    def test_out_of_range_raises(self, spark):
        from temporalscope_spark.metrics.classification import calibration_report

        df = spark.createDataFrame([(1.5, 1.0)], "p double, y double")
        with pytest.raises(Exception, match="0, 1"):
            calibration_report(df, "p", "y").collect()

    def test_bad_args(self, spark):
        from temporalscope_spark.metrics.classification import calibration_report

        df = spark.createDataFrame([(0.5, 1.0)], "p double, y double")
        with pytest.raises(DataFrameValidationError):
            calibration_report(df, "p", "y", n_bins=1)


class TestFleissKappa:
    def test_parity(self, spark):
        import numpy as np
        from collections import Counter

        from temporalscope_spark.metrics.classification import fleiss_kappa

        rng = np.random.RandomState(1)
        rows = []
        for i in range(400):
            true = rng.randint(0, 3)
            for _ in range(4):
                lab = true if rng.rand() < 0.75 else rng.randint(0, 3)
                rows.append((i, f"c{lab}"))
        df = spark.createDataFrame(rows, "item long, label string")
        got = fleiss_kappa(df, "item", "label").collect()[0]
        items: dict = {}
        for i, l in rows:
            items.setdefault(i, []).append(l)
        P, allc = [], Counter()
        for ls in items.values():
            c = Counter(ls)
            r = len(ls)
            P.append(sum(v * (v - 1) for v in c.values()) / (r * (r - 1)))
            allc.update(c)
        nr = sum(allc.values())
        pe = sum((v / nr) ** 2 for v in allc.values())
        pbar = float(np.mean(P))
        assert got["kappa"] == pytest.approx((pbar - pe) / (1 - pe), abs=1e-6)
        assert got["n_items"] == 400 and got["n_ratings"] == 1600

    def test_single_rating_items_skipped(self, spark):
        from temporalscope_spark.metrics.classification import fleiss_kappa

        rows = [(1, "a"), (1, "a"), (2, "b")]  # item 2 has one rating
        df = spark.createDataFrame(rows, "item long, label string")
        got = fleiss_kappa(df, "item", "label").collect()[0]
        assert got["n_items_skipped"] == 1 and got["n_items"] == 1

    def test_perfect_agreement(self, spark):
        from temporalscope_spark.metrics.classification import fleiss_kappa

        rows = [(i, "x" if i % 2 else "y") for i in range(50) for _ in range(3)]
        df = spark.createDataFrame(rows, "item long, label string")
        got = fleiss_kappa(df, "item", "label").collect()[0]
        assert got["kappa"] == pytest.approx(1.0)


class TestCronbachAlpha:
    def test_parity_and_consistency(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import cronbach_alpha

        rng = np.random.RandomState(1)
        lat = rng.randn(600)
        X = np.column_stack([lat + rng.randn(600) * 0.5 for _ in range(4)])
        df = spark.createDataFrame(
            [tuple(float(v) for v in X[i]) for i in range(600)],
            "a double, b double, c double, d double",
        )
        got = cronbach_alpha(df, ["a", "b", "c", "d"]).collect()[0]
        iv = X.var(axis=0, ddof=1).sum()
        tv = X.sum(axis=1).var(ddof=1)
        assert got["alpha"] == pytest.approx(4 / 3 * (1 - iv / tv), abs=1e-6)
        assert got["alpha"] > 0.85   # shared latent factor

    def test_independent_columns_low_alpha(self, spark):
        import numpy as np

        from temporalscope_spark.metrics.classification import cronbach_alpha

        rng = np.random.RandomState(2)
        X = rng.randn(600, 3)
        df = spark.createDataFrame(
            [tuple(float(v) for v in X[i]) for i in range(600)],
            "a double, b double, c double",
        )
        got = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
        assert abs(got["alpha"]) < 0.25

    def test_bad_args(self, spark):
        from temporalscope_spark.metrics.classification import cronbach_alpha

        df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
        with pytest.raises(DataFrameValidationError):
            cronbach_alpha(df, ["a"])
        with pytest.raises(DataFrameValidationError):
            cronbach_alpha(df, ["a", "nope"])
