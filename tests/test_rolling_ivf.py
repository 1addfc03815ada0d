"""Rolling time-range/row features, EWMA, and IVF ANN.

Rolling aggregates are checked against brute-force pandas recomputation
(per-row masked windows — the unambiguous definition) plus the leakage
property the north star asserts: the feature at time t is invariant to any
edit of rows with time >= t. EWMA is checked against pandas ``ewm(halflife,
adjust=True)``. IVF is checked for determinism, self-assignment, and recall
vs the exact brute-force ranking (nprobe = all cells ⇒ identical result).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.rolling import (
    ewma,
    ewma_segmented,
    rolling_features,
    rolling_row_features,
)
from temporalscope_spark.operators.similarity import (
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    with_ivf_cell,
)


@pytest.fixture(scope="module")
def ts_df(spark):
    """5 users x 40 rows, irregular integer-second timestamps, no duplicate
    (user, t) pairs (temporal-ordering gate holds)."""
    rows = []
    for u in range(5):
        t = 0
        for i in range(40):
            t += 1 + ((u * 7919 + i * 104729) % 13)  # irregular gaps 1..13
            val = float(((u + 1) * 31 + i * 17) % 101) / 10.0
            rows.append((u, t, val))
    return spark.createDataFrame(rows, ["user_id", "t", "value"])


def _brute_rolling(pdf: pd.DataFrame, w: int, agg: str, include_current: bool):
    out = []
    for _, r in pdf.iterrows():
        lo, hi = r["t"] - w, r["t"]
        m = (pdf["user_id"] == r["user_id"]) & (pdf["t"] >= lo)
        m &= (pdf["t"] <= hi) if include_current else (pdf["t"] < hi)
        vals = pdf.loc[m, "value"]
        if agg == "count":
            out.append(float(len(vals)))
        elif agg == "sum":
            out.append(float(vals.sum()) if len(vals) else None)
        elif agg == "avg":
            out.append(float(vals.mean()) if len(vals) else None)
    return out


class TestRollingFeatures:
    def test_matches_bruteforce(self, ts_df):
        got = (
            rolling_features(
                ts_df, ["value"], [20], time_col="t", id_col="user_id",
                aggs=("count", "sum", "avg"),
            )
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        for agg in ("count", "sum", "avg"):
            want = _brute_rolling(pdf, 20, agg, include_current=False)
            col = got[f"value_{agg}_20s"].astype(float)
            for g, w_ in zip(col, want):
                if w_ is None:
                    assert math.isnan(g) or g == 0.0  # count()=0, sum/avg NULL
                else:
                    assert abs(g - w_) < 1e-9

    def test_include_current(self, ts_df):
        got = (
            rolling_features(
                ts_df, ["value"], [20], time_col="t", id_col="user_id",
                aggs=("sum",), include_current=True,
            )
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        want = _brute_rolling(pdf, 20, "sum", include_current=True)
        np.testing.assert_allclose(got["value_sum_20s"].astype(float), want, atol=1e-9)

    def test_zero_leakage(self, spark, ts_df):
        """Editing every row with t >= cutoff leaves features at t < cutoff
        byte-identical — the strict point-in-time contract."""
        cutoff = 150
        base = rolling_features(
            ts_df, ["value"], [50], time_col="t", id_col="user_id"
        )
        perturbed_in = ts_df.withColumn(
            "value", F.when(F.col("t") >= cutoff, F.col("value") * 1000 + 7).otherwise(F.col("value"))
        )
        pert = rolling_features(
            perturbed_in, ["value"], [50], time_col="t", id_col="user_id"
        )
        a = base.filter(F.col("t") < cutoff).toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        b = pert.filter(F.col("t") < cutoff).toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_single_exchange_many_features(self, ts_df):
        """12 feature columns (2 windows x 2 cols x 3 aggs) must plan exactly
        ONE exchange — all share the window partitioning."""
        df2 = ts_df.withColumn("value2", F.col("value") * 2)
        out = rolling_features(
            df2, ["value", "value2"], [20, 60], time_col="t", id_col="user_id",
            aggs=("count", "sum", "avg"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1

    def test_error_contracts(self, ts_df):
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            rolling_features(ts_df, [], [10], time_col="t")
        with pytest.raises(DataFrameValidationError, match="Unsupported aggs"):
            rolling_features(ts_df, ["value"], [10], time_col="t", aggs=("median",))
        with pytest.raises(DataFrameValidationError, match="does not exist"):
            rolling_features(ts_df, ["value"], [10], time_col="nope")


class TestRollingRowFeatures:
    def test_matches_pandas_rolling(self, ts_df):
        got = (
            rolling_row_features(
                ts_df, ["value"], [3], time_col="t", id_col="user_id", aggs=("avg", "sum")
            )
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        want = (
            pdf.groupby("user_id")["value"]
            .apply(lambda s: s.rolling(3, min_periods=1).mean().shift(1))
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(
            got["value_avg_last3"].astype(float), want.astype(float), atol=1e-9
        )

    def test_lookback_validation(self, ts_df):
        with pytest.raises(DataFrameValidationError, match=">= 1"):
            rolling_row_features(ts_df, ["value"], [0], time_col="t")


class TestEwma:
    def test_matches_pandas_ewm(self, ts_df):
        hl = 5.0
        got = (
            ewma(ts_df, "value", halflife_rows=hl, time_col="t", id_col="user_id")
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        want = (
            pdf.groupby("user_id")["value"]
            .apply(lambda s: s.ewm(halflife=hl, adjust=True).mean())
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(got["value_ewma"].astype(float), want, rtol=1e-9)

    def test_strict_past_variant(self, ts_df):
        got = (
            ewma(
                ts_df, "value", halflife_rows=5.0, time_col="t", id_col="user_id",
                include_current=False,
            )
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        want = (
            pdf.groupby("user_id")["value"]
            .apply(lambda s: s.ewm(halflife=5.0, adjust=True).mean().shift(1))
            .reset_index(drop=True)
        )
        first = got.groupby("user_id").head(1)["value_ewma"]
        assert first.isna().all()  # no past -> NULL
        mask = ~want.isna()
        np.testing.assert_allclose(
            got["value_ewma"].astype(float)[mask], want[mask], rtol=1e-9
        )


    def test_large_halflife_delegates_to_segmented(self, spark):
        """halflife 10⁴ needs a ~400k-row rel_tol frame — over the 100k
        buffer cap, so ewma must route through the segmented path (exact
        unbounded history, chunk-bounded buffers) instead of silently
        truncating. Values still match pandas ewm; no helper columns leak."""
        import pandas as pd

        n = 5000
        pdf = pd.DataFrame(
            {
                "user_id": [i % 2 for i in range(n)],
                "t": pd.to_datetime(1_700_000_000 + np.arange(n), unit="s"),
                "value": np.random.RandomState(3).randn(n),
            }
        )
        df = spark.createDataFrame(pdf)
        got = (
            ewma(df, "value", halflife_rows=10_000.0, time_col="t", id_col="user_id")
            .toPandas()
            .sort_values(["user_id", "t"])
            .reset_index(drop=True)
        )
        assert "_ewma_rchunk" not in got.columns
        want = (
            pdf.sort_values(["user_id", "t"])
            .groupby("user_id")["value"]
            .apply(lambda s: s.ewm(halflife=10_000.0, adjust=True).mean())
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(got["value_ewma"].astype(float), want, rtol=1e-9)


class TestEwmaSegmented:
    def test_rebase_scan_matches_fold(self, ts_df):
        """The O(L) rebased running-sum scan equals the sequential fold to
        double rounding, on a shared chunking, both leakage modes."""
        for inc in (True, False):
            a = ewma_segmented(
                ts_df, "value", 5.0, time_col="t", id_col="user_id",
                chunk_seconds=600, include_current=inc, scan="fold",
            ).toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
            b = ewma_segmented(
                ts_df, "value", 5.0, time_col="t", id_col="user_id",
                chunk_seconds=600, include_current=inc, scan="rebase",
            ).toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
            mask = ~a["value_ewma"].isna()
            np.testing.assert_allclose(
                a["value_ewma"][mask].astype(float),
                b["value_ewma"][mask].astype(float), rtol=1e-9,
            )
            assert a["value_ewma"].isna().equals(b["value_ewma"].isna())

    @pytest.mark.parametrize("include_current", [True, False])
    def test_null_semantics_agree_across_scans(self, spark, include_current):
        """ADVICE r3 (medium): on NULL-containing data the rebase scan used
        to treat a NULL as value=0 (decayed AND weighted) while fold skipped
        it — so ewma()'s silent auto-delegation at halflife ≳ 2.5k changed
        answers. All three lanes must agree: skip the NULL entirely (no
        contribution, no decay step) = pandas ewm(adjust=True,
        ignore_na=True), including across chunk boundaries and for
        chunks that start or end with NULL runs."""
        rng = np.random.RandomState(11)
        rows = []
        for u in range(3):
            for i in range(60):
                v = None if rng.rand() < 0.3 else float(rng.randn())
                rows.append((u, float(i), v))
        # force boundary cases: chunk (chunk_seconds=16) starting/ending NULL
        rows += [(9, float(i), None) for i in range(20)]  # all-NULL entity
        pdf = pd.DataFrame(rows, columns=["user_id", "t", "value"])
        df = spark.createDataFrame(pdf)

        kw = dict(time_col="t", id_col="user_id", include_current=include_current)
        plain = ewma(df, "value", 5.0, **kw).toPandas()
        fold = ewma_segmented(
            df, "value", 5.0, chunk_seconds=16, scan="fold", **kw
        ).toPandas()
        reb = ewma_segmented(
            df, "value", 5.0, chunk_seconds=16, scan="rebase", **kw
        ).toPandas()

        key = ["user_id", "t"]
        plain = plain.sort_values(key).reset_index(drop=True)
        fold = fold.sort_values(key).reset_index(drop=True)
        reb = reb.sort_values(key).reset_index(drop=True)

        want = (
            pdf.sort_values(key)
            .groupby("user_id")["value"]
            .apply(
                lambda s: s.astype(float)
                .ewm(halflife=5.0, adjust=True, ignore_na=True)
                .mean()
                .shift(0 if include_current else 1)
            )
            .reset_index(drop=True)
        )
        for name, got in [("plain", plain), ("fold", fold), ("rebase", reb)]:
            g = got["value_ewma"].astype(float)
            assert g.isna().equals(want.isna()), f"{name}: NULL mask differs"
            m = ~want.isna()
            np.testing.assert_allclose(
                g[m], want[m], rtol=1e-9, err_msg=f"{name} lane"
            )

    def test_rebase_guard_raises_on_oversized_chunk(self, ts_df):
        """Past 600·halflife rows per chunk the rebased exponent would
        overflow — the row-level guard must raise, not return garbage."""
        from pyspark.errors.exceptions.captured import SparkRuntimeException

        with pytest.raises(SparkRuntimeException, match="rebase"):
            ewma_segmented(
                ts_df, "value", 0.05, time_col="t", id_col="user_id",
                chunk_seconds=10**9, scan="rebase",
            ).collect()

    def test_invalid_scan_raises(self, ts_df):
        with pytest.raises(Exception, match="scan"):
            ewma_segmented(ts_df, "value", 5.0, time_col="t", chunk_seconds=60, scan="x")

    @pytest.mark.parametrize("include_current", [True, False])
    def test_matches_frame_path(self, ts_df, include_current):
        """Segmented scan == the frame path (to its rel_tol truncation),
        across chunk boundaries, both leakage modes."""
        a = ewma(
            ts_df, "value", 5.0, time_col="t", id_col="user_id",
            include_current=include_current,
        ).toPandas().set_index(["user_id", "t"])["value_ewma"]
        b = ewma_segmented(
            ts_df, "value", 5.0, time_col="t", id_col="user_id",
            chunk_seconds=7, include_current=include_current,
        ).toPandas().set_index(["user_id", "t"])["value_ewma"]
        b = b.reindex(a.index)
        assert (a.isna() == b.isna()).all()
        m = ~a.isna()
        np.testing.assert_allclose(b[m].astype(float), a[m].astype(float), rtol=1e-9)

    @pytest.mark.slow
    def test_large_halflife_monster_entity(self, spark):
        """VERDICT r1 #6: halflife 10^4 on a single hot entity — the frame
        path would buffer min(100k, 40·hl) doubles per row; the segmented
        path's buffer is the chunk (1024 rows here) and the result is exact
        vs pandas ewm over the UNBOUNDED history."""
        n = 150_000
        df = spark.range(n).select(
            F.lit("hot").alias("doc_id"),
            F.col("id").cast("double").alias("t"),
            (F.sin(F.col("id").cast("double")) * 100).alias("value"),
        )
        out = ewma_segmented(
            df, "value", 1e4, time_col="t", id_col="doc_id", chunk_seconds=1024
        )
        got = (
            out.select("t", "value_ewma").toPandas().sort_values("t")["value_ewma"]
            .to_numpy()
        )
        ref = (
            pd.Series(np.sin(np.arange(n)) * 100)
            .ewm(halflife=1e4, adjust=True)
            .mean()
            .to_numpy()
        )
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    def test_carry_join_is_merge_not_broadcast(self, ts_df):
        out = ewma_segmented(ts_df, "value", 5.0, time_col="t", id_col="user_id",
                             chunk_seconds=7)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan

    def test_rejects_bad_args(self, ts_df):
        with pytest.raises(DataFrameValidationError, match="halflife"):
            ewma_segmented(ts_df, "value", 0.0, time_col="t", chunk_seconds=7)
        with pytest.raises(DataFrameValidationError, match="chunk_col or chunk_seconds"):
            ewma_segmented(ts_df, "value", 5.0, time_col="t")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestIVF:
    def test_centroids_deterministic(self, emb):
        c1 = ivf_centroids(emb, num_centroids=8, seed=7, refine_iters=1)
        c2 = ivf_centroids(emb, num_centroids=8, seed=7, refine_iters=1)
        assert c1 == c2
        assert len(c1) == 8 and len(c1[0]) == len(emb.select("embedding").first()[0])

    def test_cell_assignment_is_argmax(self, emb):
        cents = ivf_centroids(emb, num_centroids=4, seed=7, refine_iters=0)
        got = with_ivf_cell(emb, cents).toPandas()
        embs = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
        c = [np.array(x) for x in cents]
        for _, r in got.iterrows():
            v = embs[r["vec_id"]]
            scores = [v @ ci / (np.linalg.norm(ci) or 1.0) for ci in c]
            assert int(r["ivf_cell"]) == int(np.argmax(scores))

    def test_full_probe_equals_exact(self, emb):
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
        cents = ivf_centroids(emb, num_centroids=4, seed=7)
        exact = [r.vec_id for r in cosine_topk(emb, qvec, k=5).collect()]
        full = [
            r.vec_id
            for r in ivf_topk(emb, qvec, cents, k=5, nprobe=len(cents)).collect()
        ]
        assert exact == full

    def test_partial_probe_recall(self, emb):
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
        cents = ivf_centroids(emb, num_centroids=8, seed=7)
        exact = set(r.vec_id for r in cosine_topk(emb, qvec, k=5).collect())
        approx = set(
            r.vec_id for r in ivf_topk(emb, qvec, cents, k=5, nprobe=3).collect()
        )
        assert len(exact & approx) >= 3  # recall >= 0.6 with 3/8 cells probed


class TestExpandingFeatures:
    def test_matches_bruteforce(self, ts_df):
        from temporalscope_spark.operators.rolling import expanding_features

        got = (
            expanding_features(ts_df, ["value"], time_col="t", id_col="user_id",
                               aggs=("count", "avg"))
            .toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        want_cnt = pdf.groupby("user_id").cumcount()  # strictly-past count
        want_avg = (
            pdf.groupby("user_id")["value"]
            .apply(lambda s: s.expanding().mean().shift(1))
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(got["value_count_expanding"], want_cnt)
        mask = ~want_avg.isna()
        np.testing.assert_allclose(
            got["value_avg_expanding"].astype(float)[mask], want_avg[mask], atol=1e-9
        )


class TestTargetEncoding:
    def test_strictly_past_mean_per_category(self, spark):
        from temporalscope_spark.operators.rolling import target_encode_expanding

        rows = [
            ("a", 1, 10.0), ("b", 2, 100.0), ("a", 3, 20.0),
            ("a", 4, 30.0), ("b", 5, 200.0),
        ]
        df = spark.createDataFrame(rows, "cat string, t long, y double")
        got = {r["t"]: r["cat_te"] for r in
               target_encode_expanding(df, "cat", "y", time_col="t").collect()}
        assert got[1] is None and got[2] is None          # no history
        assert got[3] == 10.0                              # mean of past a
        assert abs(got[4] - 15.0) < 1e-9                   # (10+20)/2
        assert got[5] == 100.0

    def test_smoothing_shrinks_to_prior(self, spark):
        from temporalscope_spark.operators.rolling import target_encode_expanding

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 10.0)], "cat string, t long, y double"
        )
        got = {r["t"]: r["cat_te"] for r in
               target_encode_expanding(df, "cat", "y", time_col="t",
                                       prior=0.0, smoothing=1.0).collect()}
        assert got[1] == 0.0                     # pure prior, no history
        assert abs(got[2] - 5.0) < 1e-9          # (10 + 1*0)/(1+1)

    def test_own_target_never_leaks(self, spark):
        """Perturbing a row's own target must not change its encoding."""
        from temporalscope_spark.operators.rolling import target_encode_expanding

        base = spark.createDataFrame(
            [("a", i, float(i)) for i in range(20)], "cat string, t long, y double"
        )
        pert = base.withColumn(
            "y", F.when(F.col("t") == 10, F.lit(1e9)).otherwise(F.col("y"))
        )
        a = target_encode_expanding(base, "cat", "y", time_col="t").filter("t = 10").first()["cat_te"]
        b = target_encode_expanding(pert, "cat", "y", time_col="t").filter("t = 10").first()["cat_te"]
        assert a == b

    def test_smoothing_requires_prior(self, spark):
        from temporalscope_spark.operators.rolling import target_encode_expanding

        df = spark.createDataFrame([("a", 1, 1.0)], "cat string, t long, y double")
        with pytest.raises(DataFrameValidationError, match="requires an explicit prior"):
            target_encode_expanding(df, "cat", "y", time_col="t", smoothing=1.0)


class TestDuplicateTimestampLeakage:
    def test_expanding_excludes_same_instant_rows(self, spark):
        """Rows sharing a timestamp must not see each other (review finding:
        a ROWS frame leaked one tied row into the other's 'past')."""
        from temporalscope_spark.operators.rolling import expanding_features

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("a", 2, 99.0), ("a", 3, 30.0)],
            "uid string, t long, value double",
        )
        out = expanding_features(df, ["value"], time_col="t", id_col="uid",
                                 aggs=("count", "sum"))
        by_val = {r["value"]: r for r in out.collect()}
        # both t=2 rows see ONLY the t=1 row — not each other
        assert by_val[20.0]["value_count_expanding"] == 1
        assert by_val[99.0]["value_count_expanding"] == 1
        assert by_val[20.0]["value_sum_expanding"] == 10.0
        assert by_val[99.0]["value_sum_expanding"] == 10.0
        assert by_val[30.0]["value_count_expanding"] == 3

    def test_target_encoding_excludes_same_instant_rows(self, spark):
        from temporalscope_spark.operators.rolling import target_encode_expanding

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 0.0), ("a", 2, 100.0)],
            "cat string, t long, y double",
        )
        out = {r["y"]: r["cat_te"] for r in
               target_encode_expanding(df, "cat", "y", time_col="t").collect()}
        assert out[0.0] == 10.0 and out[100.0] == 10.0  # tied rows blind to each other

    def test_ewma_rejects_nonpositive_halflife(self, ts_df):
        with pytest.raises(DataFrameValidationError, match="halflife_rows"):
            ewma(ts_df, "value", halflife_rows=0, time_col="t", id_col="user_id")
        with pytest.raises(DataFrameValidationError, match="halflife_rows"):
            ewma(ts_df, "value", halflife_rows=-5, time_col="t", id_col="user_id")


class TestNormalizeFeatures:
    def test_zscore_matches_pandas_expanding(self, ts_df):
        from temporalscope_spark.operators.rolling import normalize_features

        got = (
            normalize_features(ts_df, ["value"], time_col="t", id_col="user_id")
            .toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        )
        pdf = ts_df.toPandas().sort_values(["user_id", "t"]).reset_index(drop=True)
        def exp_z(s):
            return (s - s.expanding().mean().shift(1)) / s.expanding().std(ddof=1).shift(1)
        want = pdf.groupby("user_id")["value"].apply(exp_z).reset_index(drop=True)
        m = ~want.isna()
        np.testing.assert_allclose(
            got["value_norm"].astype(float)[m], want[m], rtol=1e-9
        )
        # first two rows per user have no valid std -> NULL
        firsts = got.groupby("user_id").head(2)["value_norm"]
        assert firsts.isna().all()

    def test_minmax_bounds_and_leakage(self, spark, ts_df):
        from temporalscope_spark.operators.rolling import normalize_features

        out = normalize_features(
            ts_df, ["value"], time_col="t", id_col="user_id", method="minmax"
        )
        pdf = out.toPandas()
        # minmax vs PAST window can exceed [0,1] when current value is a new
        # extreme — that's the point (no future knowledge); but past-only
        # stats mean editing future rows cannot change earlier outputs
        cutoff = 150
        pert = ts_df.withColumn(
            "value",
            F.when(F.col("t") >= cutoff, F.col("value") * 977 + 13).otherwise(F.col("value")),
        )
        a = (
            normalize_features(ts_df, ["value"], time_col="t", id_col="user_id", method="minmax")
            .filter(F.col("t") < cutoff).toPandas()
            .sort_values(["user_id", "t"]).reset_index(drop=True)
        )
        b = (
            normalize_features(pert, ["value"], time_col="t", id_col="user_id", method="minmax")
            .filter(F.col("t") < cutoff).toPandas()
            .sort_values(["user_id", "t"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert pdf["value_norm"].notna().sum() > 0

    def test_error_contracts(self, ts_df):
        from temporalscope_spark.operators.rolling import normalize_features

        with pytest.raises(DataFrameValidationError, match="non-empty"):
            normalize_features(ts_df, [], time_col="t")
        with pytest.raises(DataFrameValidationError, match="method"):
            normalize_features(ts_df, ["value"], time_col="t", method="robust")


class TestRollingCorr:
    def _df(self, spark):
        rows = []
        for u in range(3):
            t = 0
            for i in range(30):
                t += 1 + ((u * 997 + i * 7919) % 9)
                x = float(((u + 1) * 13 + i * 29) % 83) / 7.0
                y = 2.0 * x + float((i * 37) % 11) - 5.0  # correlated + noise
                rows.append((u, t, x, y))
        return spark.createDataFrame(rows, ["user_id", "t", "x", "y"])

    def test_brute_force_parity(self, spark):
        from temporalscope_spark.operators.rolling import rolling_corr

        df = self._df(spark)
        w = 40
        out = rolling_corr(df, "x", "y", [w], time_col="t", id_col="user_id")
        pdf = df.toPandas()
        got = {(r["user_id"], r["t"]): r for r in out.collect()}
        for _, r in pdf.iterrows():
            m = (
                (pdf["user_id"] == r["user_id"])
                & (pdf["t"] >= r["t"] - w)
                & (pdf["t"] < r["t"])
            )
            xs, ys = pdf.loc[m, "x"], pdf.loc[m, "y"]
            k = (r["user_id"], r["t"])
            assert got[k]["x_y_n_40s"] == len(xs)
            if len(xs) >= 2:
                import numpy as np

                cov = float(np.cov(xs, ys, ddof=1)[0, 1])
                assert got[k]["x_y_cov_40s"] == pytest.approx(cov, abs=2e-6)
                sx, sy = xs.std(ddof=1), ys.std(ddof=1)
                if sx > 0 and sy > 0:
                    corr = float(np.corrcoef(xs, ys)[0, 1])
                    assert got[k]["x_y_corr_40s"] == pytest.approx(corr, abs=2e-6)
            else:
                assert got[k]["x_y_cov_40s"] is None
                assert got[k]["x_y_corr_40s"] is None

    def test_perfect_linear_and_zero_variance(self, spark):
        from temporalscope_spark.operators.rolling import rolling_corr

        rows = [(1, t, float(t), 3.0 * t + 1.0, 5.0) for t in range(1, 8)]
        df = spark.createDataFrame(rows, ["uid", "t", "x", "y", "c"])
        out = rolling_corr(df, "x", "y", [100], time_col="t", id_col="uid")
        last = [r for r in out.collect() if r["t"] == 7][0]
        assert last["x_y_corr_100s"] == pytest.approx(1.0)
        # constant column -> zero variance -> corr null, cov 0
        out2 = rolling_corr(df, "x", "c", [100], time_col="t", id_col="uid")
        last2 = [r for r in out2.collect() if r["t"] == 7][0]
        assert last2["x_c_corr_100s"] is None
        assert last2["x_c_cov_100s"] == pytest.approx(0.0)

    def test_pairwise_null_gating(self, spark):
        from temporalscope_spark.operators.rolling import rolling_corr

        rows = [
            (1, 1, 1.0, 2.0),
            (1, 2, None, 9.0),   # y alone must not count
            (1, 3, 2.0, 4.0),
            (1, 4, 3.0, None),   # x alone must not count
            (1, 5, 0.0, 0.0),
        ]
        df = spark.createDataFrame(rows, "uid int, t int, x double, y double")
        out = rolling_corr(df, "x", "y", [100], time_col="t", id_col="uid")
        at5 = [r for r in out.collect() if r["t"] == 5][0]
        assert at5["x_y_n_100s"] == 2  # only rows t=1 and t=3

    def test_single_exchange_plan(self, spark):
        from temporalscope_spark.operators.rolling import rolling_corr

        df = self._df(spark)
        out = rolling_corr(df, "x", "y", [10, 40], time_col="t", id_col="user_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1


class TestCentroidDistanceFeatures:
    def test_cosine_matches_numpy(self, spark):
        import numpy as np

        from temporalscope_spark.operators.similarity import (
            centroid_distance_features,
        )

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(20, 4))
        cents = rng.normal(size=(3, 4)).tolist()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id int, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cdist_1"], r["cdist_2"], r["cdist_3"])
            for r in centroid_distance_features(df, cents).collect()
        }
        for i, v in enumerate(vecs):
            for j, c in enumerate(np.array(cents)):
                want = round(
                    float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))), 6
                )
                assert got[i][j] == pytest.approx(want, abs=1e-9)

    def test_euclidean_and_zero_norm(self, spark):
        import numpy as np

        from temporalscope_spark.operators.similarity import (
            centroid_distance_features,
        )

        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [3.0, 4.0])],
            "vec_id int, embedding array<double>",
        )
        cents = [[0.0, 0.0], [3.0, 0.0]]
        rows = {
            r["vec_id"]: r
            for r in centroid_distance_features(
                df, cents, metric="euclidean"
            ).collect()
        }
        assert rows[1]["cdist_1"] == 5.0
        assert rows[1]["cdist_2"] == 4.0
        cos = {
            r["vec_id"]: r
            for r in centroid_distance_features(df, cents).collect()
        }
        assert cos[0]["cdist_1"] is None  # zero-norm vector: no direction

    def test_expression_only(self, spark):
        from temporalscope_spark.operators.similarity import (
            centroid_distance_features,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id int, embedding array<double>"
        )
        plan = (
            centroid_distance_features(df, [[1.0, 0.0]])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan
