"""Flagship pipeline tests: leakage properties, token-array equality
(multi-target mode), and resumable end-to-end execution."""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
from temporalscope_spark.operators.shift import shift_target
from temporalscope_spark.pipelines.feature_pass import build_features, run_pipeline, time_buckets


@pytest.fixture(scope="module")
def seqs(spark):
    return generate_tokenized_sequences(spark, num_rows=2000, num_docs=20).cache()


class TestLeakage:
    """North star: zero temporal leakage — features at time t must be
    invariant to any perturbation of strictly-future rows."""

    def test_lag_features_invariant_to_future_perturbation(self, spark, seqs):
        cutoff = seqs.agg(F.expr("percentile(unix_micros(cast(event_time as timestamp)), 0.5)")).first()[0]
        tcur = F.unix_micros(F.col("event_time").cast("timestamp"))

        base = build_features(seqs, n_lags=2).filter(tcur < cutoff)
        perturbed_input = seqs.withColumn(
            "n_tok",
            F.when(tcur >= cutoff, F.lit(99999)).otherwise(F.col("n_tok")),
        )
        pert = build_features(perturbed_input, n_lags=2).filter(tcur < cutoff)

        cols = ["doc_id", "seq_idx", "n_tok_lag_1", "n_tok_lag_2"]
        a = base.select(cols).toPandas().sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
        b = pert.select(cols).toPandas().sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
        # lag FEATURES see only the past → identical despite future corruption
        assert a.equals(b)

    def test_target_is_strictly_future(self, spark, seqs):
        feats = build_features(seqs, n_lags=1)
        pdf = feats.select("doc_id", "seq_idx", "n_tok", "target").toPandas()
        orig = seqs.toPandas().set_index(["doc_id", "seq_idx"])["n_tok"]
        for _, r in pdf.sample(50, random_state=0).iterrows():
            assert r["target"] == orig.loc[(r["doc_id"], r["seq_idx"] + 1)]

    def test_last_row_per_doc_dropped(self, spark, seqs):
        feats = build_features(seqs, n_lags=1)
        n_docs = seqs.select("doc_id").distinct().count()
        assert feats.count() == seqs.count() - n_docs


class TestMultiTargetTokens:
    """multi_target mode: the target is the token ARRAY itself (seq2seq).
    Per-row invariant: token-array equality (BASELINE.json input_hint)."""

    def test_array_lead_shift_token_equality(self, spark, seqs):
        out = shift_target(
            seqs, time_col="event_time", target_col="tokens", n_lags=1, id_col="doc_id"
        )
        pdf = out.select("doc_id", "seq_idx", "tokens_shift_1").toPandas()
        orig = seqs.toPandas().set_index(["doc_id", "seq_idx"])["tokens"]
        for _, r in pdf.sample(50, random_state=0).iterrows():
            expect = orig.loc[(r["doc_id"], r["seq_idx"] + 1)]
            assert list(r["tokens_shift_1"]) == list(expect)  # exact token equality

    def test_tokens_column_passthrough_unchanged(self, spark, seqs):
        feats = build_features(seqs, n_lags=1, pad_to=64)
        pdf = feats.select("doc_id", "seq_idx", "tokens").toPandas()
        orig = seqs.toPandas().set_index(["doc_id", "seq_idx"])["tokens"]
        for _, r in pdf.sample(50, random_state=1).iterrows():
            o = list(orig.loc[(r["doc_id"], r["seq_idx"])])
            got = list(r["tokens"])
            assert got[: len(o)] == o and len(got) == 64


class TestPipelineEndToEnd:
    def test_run_and_resume(self, spark, seqs, tmp_path):
        inp = str(tmp_path / "input")
        seqs.write.parquet(inp)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        stats = run_pipeline(spark, inp, out, ckpt, num_buckets=4, n_lags=1)
        assert stats["processed"] >= 1 and stats["skipped"] == 0

        result = spark.read.parquet(out)
        assert result.count() > 0
        assert {"target", "split", "n_tok_lag_1"} <= set(result.columns)

        # resume: nothing recomputed
        stats2 = run_pipeline(spark, inp, out, ckpt, num_buckets=4, n_lags=1)
        assert stats2["processed"] == 0
        assert stats2["skipped"] == stats["processed"]

    def test_time_buckets_cover_everything(self, spark, seqs):
        buckets = time_buckets(seqs, "event_time", 4)
        assert buckets[0][1] is None and buckets[-1][2] is None
        tcol = F.unix_micros(F.col("event_time").cast("timestamp"))
        total = 0
        for _, lo, hi in buckets:
            part = seqs
            if lo is not None:
                part = part.filter(tcol >= F.lit(lo))
            if hi is not None:
                part = part.filter(tcol < F.lit(hi))
            total += part.count()
        assert total == seqs.count()
