"""Streaming batch/stream parity + demo loader tests."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.datasets.loader import DatasetLoader, load_macrodata
from temporalscope_spark.operators.sessionize import sessionize_builtin
from temporalscope_spark.streaming.sessions import (
    replay_static_as_stream,
    stream_session_bounds,
    stream_windowed_stats,
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        t = base
        for i in range(20):
            gap = dt.timedelta(minutes=90 if i % 7 == 6 else 5)
            t = t + gap
            rows.append((f"u{u}", t, float(i)))
    df = spark.createDataFrame(rows, ["uid", "ts", "v"])
    d = str(tmp_path_factory.mktemp("stream") / "events")
    df.write.parquet(d)
    return d, df


def test_stream_session_bounds_matches_batch(spark, event_dir):
    d, df = event_dir
    schema = df.schema
    streamed = replay_static_as_stream(
        spark, d, schema,
        lambda s: stream_session_bounds(s, "ts", "uid", 3600.0, watermark="0 seconds"),
        "sess_out",
    ).toPandas()
    batch = sessionize_builtin(
        df.withColumn("ts", F.col("ts").cast("timestamp")), "ts", "uid", 3600.0
    ).toPandas()
    a = streamed.sort_values(["uid", "session_start"]).reset_index(drop=True)
    b = batch.sort_values(["uid", "session_start"]).reset_index(drop=True)
    assert a[["uid", "n_events"]].equals(b[["uid", "n_events"]])
    assert len(a) == len(b)


def test_stream_windowed_stats(spark, event_dir):
    d, df = event_dir
    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_windowed_stats(s, "ts", "uid", "v", window="1 hour", watermark="0 seconds"),
        "win_out",
    ).toPandas()
    assert (streamed["n_events"] > 0).all()
    # batch equivalent via F.window
    batch = (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("uid", F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    assert streamed["n_events"].sum() == batch["n_events"].sum() == 60


class TestLoader:
    def test_macrodata_shape(self, spark):
        df = load_macrodata(spark)
        assert df.count() == 203
        assert df.columns[0] == "ds" and "realgdp" in df.columns
        assert len(df.columns) == 13
        # quarterly timestamps
        first_two = [r["ds"] for r in df.orderBy("ds").limit(2).collect()]
        assert (first_two[1].month - first_two[0].month) % 12 == 3

    def test_loader_api(self, spark):
        df = DatasetLoader("macrodata").load_data(spark)
        assert df.count() == 203

    def test_invalid_dataset(self):
        with pytest.raises(ValueError, match="not supported"):
            DatasetLoader("nope")

    def test_deterministic(self, spark):
        a = load_macrodata(spark).toPandas()
        b = load_macrodata(spark).toPandas()
        assert a.equals(b)


def test_stream_stateful_lag_matches_batch(spark, event_dir):
    """applyInPandasWithState lag == batch Window lag after full replay."""
    from temporalscope_spark.streaming.sessions import stream_stateful_lag

    d, df = event_dir
    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_stateful_lag(s, "ts", "uid", "v"),
        "lag_out", output_mode="append",
    ).toPandas()

    from pyspark.sql.window import Window

    w = Window.partitionBy("uid").orderBy("ts")
    batch = (
        df.withColumn("v_lag_1", F.lag("v", 1).over(w).cast("double"))
        .withColumn("cum_count", F.row_number().over(w).cast("long"))
        .select("uid", "ts", "v", "v_lag_1", "cum_count")
        .toPandas()
    )
    a = streamed.sort_values(["uid", "ts"]).reset_index(drop=True)
    b = batch.sort_values(["uid", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert a["cum_count"].tolist() == b["cum_count"].tolist()
    pa, pb = a["v_lag_1"].fillna(-1).tolist(), b["v_lag_1"].fillna(-1).tolist()
    assert pa == pb


def test_stream_stateful_ewma_matches_batch(spark, event_dir):
    """Batch/stream parity: the stateful streaming EWMA must equal the batch
    fold (operators.rolling.ewma, include_current=True) to float precision."""
    from temporalscope_spark.operators.rolling import ewma
    from temporalscope_spark.streaming.sessions import stream_stateful_ewma

    d, df = event_dir
    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_stateful_ewma(s, "ts", "uid", "v", halflife_rows=3.0),
        "ewma_out", output_mode="append",
    ).toPandas().sort_values(["uid", "ts"]).reset_index(drop=True)

    batch = (
        ewma(df, "v", halflife_rows=3.0, time_col="ts", id_col="uid",
             include_current=True)
        .toPandas().sort_values(["uid", "ts"]).reset_index(drop=True)
    )
    import numpy as np

    np.testing.assert_allclose(
        streamed["v_ewma"].to_numpy(), batch["v_ewma"].to_numpy(), rtol=1e-9
    )


def test_stream_ewma_state_survives_restart(spark, tmp_path):
    """State recovery: run the stateful EWMA over batch 1 with a checkpoint
    dir, stop, append batch 2, restart with the SAME checkpoint — the carry
    (num, den) must resume, producing exactly the single-run EWMA."""
    import datetime as dt

    from temporalscope_spark.operators.rolling import ewma
    from temporalscope_spark.streaming.sessions import stream_stateful_ewma

    base = dt.datetime(2024, 1, 1)
    rows1 = [("u0", base + dt.timedelta(minutes=i), float(i)) for i in range(10)]
    rows2 = [("u0", base + dt.timedelta(minutes=10 + i), float(10 + i)) for i in range(10)]
    schema = "uid string, ts timestamp, v double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        # file sink (memory sink does not support checkpoint recovery)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", 1).parquet(src)
        out = stream_stateful_ewma(stream, "ts", "uid", "v", halflife_rows=3.0)
        q = (
            out.writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    first = run_once()
    assert len(first) == 10
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    both = run_once()  # same checkpoint: only NEW rows processed, resumed state
    assert len(both) == 20

    import numpy as np

    got = both.sort_values("ts").reset_index(drop=True)["v_ewma"].to_numpy()
    batch = (
        ewma(
            spark.createDataFrame(rows1 + rows2, schema), "v",
            halflife_rows=3.0, time_col="ts", id_col="uid",
        ).toPandas().sort_values("ts").reset_index(drop=True)["v_ewma"].to_numpy()
    )
    np.testing.assert_allclose(got, batch, rtol=1e-9)


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Streaming first-seen dedup over a replayed corpus keeps exactly one
    row per normalized fingerprint (same distinct set as batch dedup)."""
    import pandas as pd

    from temporalscope_spark.operators.dedup import dedup_exact
    from temporalscope_spark.streaming.sessions import (
        replay_static_as_stream,
        stream_dedup_exact,
    )

    rows = [
        (1, "2023-01-01 00:00:00", "the quick brown fox"),
        (2, "2023-01-01 00:01:00", "The  QUICK brown fox "),  # normalized dup of 1
        (3, "2023-01-01 00:02:00", "something else entirely"),
        (4, "2023-01-01 00:03:00", "the quick brown fox"),    # exact dup of 1
        (5, "2023-01-01 00:04:00", "a third unique document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ts", "text"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d)

    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_dedup_exact(s, "text", "ts", watermark="0 seconds"),
        "dedup_out", output_mode="append",
    ).toPandas()
    batch = dedup_exact(df, "text", "doc_id").toPandas()

    assert len(streamed) == len(batch) == 3
    assert set(streamed["fingerprint"]) == set(batch["fingerprint"])
    # exactly one surviving row per fingerprint
    assert not pd.Series(streamed["fingerprint"]).duplicated().any()


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    """The corpus quality gate is a stateless narrow map, so it composes
    with Structured Streaming unchanged — same rows survive, same signal
    columns, in a readStream -> quality_filter -> sink pipeline."""
    from temporalscope_spark.operators.text import quality_filter
    from temporalscope_spark.streaming.sessions import replay_static_as_stream

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the hills"),
        (2, "a a a a a a a a a a a a"),  # repetition-gated
        (3, "1 2 3 4 5 6 7 8 9 10 11 12"),  # digit-ratio-gated
        (4, "this is another perfectly reasonable english sentence with many tokens"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path / "docs")
    df.write.parquet(d)

    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: quality_filter(s, "text", min_quality=0.6),
        "qf_out",
        output_mode="append",  # stateless narrow map — no aggregation state
    ).toPandas()
    batch = quality_filter(df, "text", min_quality=0.6).toPandas()
    assert sorted(streamed["doc_id"]) == sorted(batch["doc_id"])
    a = streamed.sort_values("doc_id").reset_index(drop=True)
    b = batch.sort_values("doc_id").reset_index(drop=True)
    assert a["quality_score"].tolist() == b["quality_score"].tolist()
    assert a["dup_word_ratio"].tolist() == b["dup_word_ratio"].tolist()


class TestStreamNearDup:
    """Streaming near-dup vs the persisted index (VERDICT r3 #8): the
    stream-static band join + expression verify must find EXACTLY the
    cross (arriving x indexed) pairs that batch minhash_lsh_pairs finds
    over the union corpus, at the same Jaccard values."""

    PARAMS = dict(num_hashes=16, bands=8, shingle_n=6, threshold=0.3)

    def _corpora(self, spark):
        import tests.test_incremental_dedup as fx

        v0 = spark.createDataFrame(fx.V0, "doc_id long, text string")
        batch = spark.createDataFrame(fx.BATCH, "doc_id long, text string")
        return v0, batch

    def test_band_expressions_match_exploded_lane(self, spark):
        """with_minhash_bands (stateless array lane) == the exploded
        groupBy signature + band hashing, both hash lanes."""
        from temporalscope_spark.operators.dedup import (
            _shingle_table,
            _signatures_from_shingles,
            with_minhash_bands,
        )
        from temporalscope_spark.operators.incremental_dedup import _band_rows

        v0, _ = self._corpora(spark)
        for hf in ("xxhash64", "md5"):
            batch_bands = {
                (r["_id"], r["_band"], r["_bh"])
                for r in _band_rows(
                    _signatures_from_shingles(
                        _shingle_table(v0, "doc_id", "text", 6, None), 16, hf
                    ),
                    16,
                    8,
                ).collect()
            }
            arr = with_minhash_bands(
                v0, "text", num_hashes=16, bands=8, shingle_n=6, hash_fn=hf
            )
            stream_bands = {
                (r["doc_id"], r["b"]["band"], r["b"]["bh"])
                for r in arr.select(
                    "doc_id", F.explode("_bands").alias("b")
                ).collect()
            }
            assert stream_bands == batch_bands, f"hash_fn={hf}"

    @pytest.mark.slow
    def test_stream_matches_batch_cross_pairs(self, spark, tmp_path):
        from temporalscope_spark.operators.dedup import minhash_lsh_pairs
        from temporalscope_spark.operators.incremental_dedup import dedup_index_rows
        from temporalscope_spark.streaming.sessions import stream_near_dup

        v0, batch = self._corpora(spark)
        index = dedup_index_rows(v0, **self.PARAMS)
        index_pdf = index.toPandas()
        corpus_pdf = v0.toPandas()

        src = str(tmp_path / "arrivals")
        batch.write.parquet(src)

        def build(stream):
            idx = spark.createDataFrame(index_pdf)
            corpus = spark.createDataFrame(corpus_pdf)
            return stream_near_dup(stream, idx, corpus, **self.PARAMS)

        got = replay_static_as_stream(
            spark, src, batch.schema, build, "near_dup_out", output_mode="append"
        ).toPandas()

        full = minhash_lsh_pairs(
            v0.unionByName(batch), "doc_id", "text", **self.PARAMS
        ).toPandas()
        batch_ids = {r[0] for r in batch.select("doc_id").collect()}
        want = {
            (max(a, b), min(a, b)): round(j, 9)
            for a, b, j in zip(full["id_a"], full["id_b"], full["jaccard"])
            if (a in batch_ids) != (b in batch_ids)  # cross pairs only
        }
        got_pairs = {
            (i, m): round(j, 9)
            for i, m, j in zip(got["doc_id"], got["matched_id"], got["jaccard"])
        }
        assert got_pairs == want
        assert len(got_pairs) > 0  # non-vacuous: planted dups cross the split
        # component labels come from the index
        comp = {r["_id"]: r["component"] for r in index.collect()}
        for _, row in got.iterrows():
            assert row["component"] == comp[row["matched_id"]]


def test_stream_gopher_flags_match_batch(spark, tmp_path):
    """The Gopher rule battery is stateless per-row folds, so it composes
    with Structured Streaming unchanged — identical metrics, flags, and
    keep decisions in a readStream -> gopher_quality_flags -> sink
    pipeline."""
    from temporalscope_spark.operators.gopher import gopher_quality_flags
    from temporalscope_spark.streaming.sessions import replay_static_as_stream

    rows = [
        (1, ("the cat and the dog have long walks of great length that "
             "wear them out and make the evenings quiet with rest and "
             "a good life of play and sleep that suits them rather well "
             "the pair also have games of chess that keep them busy")),
        (2, " ".join(["ha"] * 30)),  # repetition-gated
        (3, ""),                       # word-count-gated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path / "docs")
    df.write.parquet(d)

    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: gopher_quality_flags(s, "text"),
        "gopher_out",
        output_mode="append",  # stateless narrow map — no aggregation state
    ).toPandas()
    batch = gopher_quality_flags(df, "text").toPandas()
    a = streamed.sort_values("doc_id").reset_index(drop=True)
    b = batch.sort_values("doc_id").reset_index(drop=True)
    for col in ("gopher_word_count", "gopher_stop_word_hits",
                "top_2gram_char_frac", "dup_5gram_char_frac", "gopher_keep"):
        assert a[col].tolist() == b[col].tolist()


def test_stream_feature_transforms_match_batch(spark, tmp_path):
    """The fitted tabular feature transforms are stateless expressions once
    the model is a literal (scalers, one-hot, hash cross, imputation,
    calendar) — they must compose with readStream UNCHANGED and produce the
    batch pipeline's exact rows. Fit on the static history (train), apply
    to the stream (serve): the train->serve discipline in streaming form."""
    import datetime as dt

    from temporalscope_spark.operators.encoding import (
        fit_top_categories,
        hash_cross,
        one_hot_top_k,
    )
    from temporalscope_spark.operators.impute import fit_impute, impute
    from temporalscope_spark.operators.scaling import fit_scaler, scale_features
    from temporalscope_spark.operators.tsfeatures import calendar_features
    from temporalscope_spark.streaming.sessions import replay_static_as_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(hours=i),
            ["a", "b", "c", "d"][i % 4],
            float(i) if i % 5 else None,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "eid int, ts timestamp, cat string, x double")
    d = str(tmp_path / "feat_events")
    df.write.parquet(d)

    scaler = fit_scaler(df, ["x"])
    filler = fit_impute(df, ["x"])
    cats = fit_top_categories(df, "cat", 2)

    def transform(s):
        out = impute(s, ["x"], model=filler)
        out = scale_features(out, ["x_filled"], model=scaler | {"x_filled": scaler["x"]})
        out = one_hot_top_k(out, "cat", categories=cats)
        out = hash_cross(out, ["cat", "eid"], n_buckets=32)
        return calendar_features(out, "ts")

    streamed = (
        replay_static_as_stream(spark, d, df.schema, transform, "feat_out", "append")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    batch = transform(df).toPandas().sort_values("eid").reset_index(drop=True)
    assert list(streamed.columns) == list(batch.columns)
    assert streamed.equals(batch)


def test_stream_psi_drift_matches_batch(spark, event_dir, tmp_path):
    """Streaming windowed PSI == the same psi_aggs expressions grouped by
    F.window on the static table — the drift monitor's parity contract."""
    from temporalscope_spark.operators.drift import fit_psi_reference, psi_aggs
    from temporalscope_spark.streaming.sessions import stream_psi_drift

    d, df = event_dir
    ref = fit_psi_reference(df, "v", bins=4)
    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_psi_drift(
            s, ref, "ts", window_duration="1 hour", watermark="0 seconds"
        ),
        "psi_out",
    ).toPandas()
    aggs, finals = psi_aggs(ref)
    batch = (
        df.groupBy(F.window("ts", "1 hour").alias("_w"))
        .agg(*aggs)
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *finals,
        )
        .toPandas()
    )
    a = streamed.sort_values("window_start").reset_index(drop=True)
    b = batch.sort_values("window_start").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 1
    assert a["n"].equals(b["n"])
    assert (a["psi"].fillna(-1) - b["psi"].fillna(-1)).abs().max() < 1e-9


def test_stream_transition_pairs_matches_batch(spark, tmp_path_factory):
    """Stateful streaming transition pairs == batch transition_matrix
    counts after full replay (the streaming twin of basket.py)."""
    from temporalscope_spark.operators.basket import transition_matrix
    from temporalscope_spark.streaming.sessions import stream_transition_pairs

    base = dt.datetime(2024, 3, 1)
    types = ["view", "click", "buy"]
    rows = []
    for u in range(4):
        t = base
        for i in range(15):
            t = t + dt.timedelta(minutes=3 + (u + i) % 5)
            rows.append((f"u{u}", t, types[(u * 2 + i * i) % 3]))
    df = spark.createDataFrame(rows, ["uid", "ts", "ty"])
    d = str(tmp_path_factory.mktemp("stream_tp") / "events")
    df.write.parquet(d)

    streamed = replay_static_as_stream(
        spark, d, df.schema,
        lambda s: stream_transition_pairs(s, "ts", "uid", "ty"),
        "tp_out", output_mode="append",
    ).toPandas()

    got = (
        streamed.groupby(["from_type", "to_type"]).size().sort_index().to_dict()
    )
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in transition_matrix(df, "ts", "uid", "ty").collect()
    }
    assert got == batch
    # first event of each entity emits nothing
    assert len(streamed) == len(rows) - 4
