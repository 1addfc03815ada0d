"""End-to-end tour of the engine on a synthetic tokenized-sequence table.

Covers the full north-rule pipeline:
  generate → validate (TemporalFrame) → layout → sliding-window partition →
  leakage-safe shift (plain + skew-proof chunked) → sessionize → as-of join →
  pad → dataset validation → resumable bucket writes with lineage.

Run: python examples/quickstart.py  (local[8], ~1 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("quickstart", master="local[8]", shuffle_partitions=8)

    # 1. the canonical table: (doc_id, event_time, tokens, n_tok, source)
    from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences

    tok = generate_tokenized_sequences(spark, num_rows=20_000, num_docs=200)
    print("input:", tok.count(), "rows")

    # 2. validated temporal frame + entity-clustered physical layout
    from temporalscope_spark.frame import TemporalFrame

    tf = TemporalFrame(
        tok, time_col="event_time", target_col="n_tok", id_col="doc_id",
        exempt_cols=("tokens", "source", "seq_idx"), sort=False,
        enforce_temporal_uniqueness=True,
    ).ensure_layout(num_partitions=8)

    # 3. sliding-window partitioner: fit bounds, label buckets + splits
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    labeled = part.with_bucket_labels()
    labeled.groupBy("bucket", "split").count().orderBy("bucket", "split").show()

    # 4. leakage-safe target shift — plain and skew-proof chunked (identical)
    from temporalscope_spark.operators.shift import shift_target, shift_target_chunked

    plain = shift_target(tf.df, "event_time", "n_tok", n_lags=1, id_col="doc_id",
                         check_empty=False)
    chunked = shift_target_chunked(tf.df, "event_time", "n_tok", n_lags=1,
                                   id_col="doc_id", chunk_seconds=7 * 24 * 3600)
    assert plain.count() == chunked.count()
    print("shifted rows:", plain.count())

    # 5. sessionize + padding
    from temporalscope_spark.operators.padding import pad_token_arrays
    from temporalscope_spark.operators.sessionize import session_bounds

    sessions = session_bounds(tf.df, "event_time", "doc_id", gap=3600.0)
    print("sessions:", sessions.count())
    padded = pad_token_arrays(tf.df, target_len=64)
    assert padded.select(F.min(F.size("tokens"))).first()[0] == 64

    # 5b. rolling point-in-time features + EWMA (strictly-past, one exchange)
    from temporalscope_spark.operators.rolling import ewma, rolling_features

    feats = rolling_features(
        tf.df, ["n_tok"], [3600, 86400], time_col="event_time", id_col="doc_id",
        aggs=("count", "avg"),
    )
    feats = ewma(feats, "n_tok", halflife_rows=8.0, time_col="event_time",
                 id_col="doc_id")
    print("rolling feature columns:", [c for c in feats.columns if "_" in c][-5:])

    # 5c. purged time-series CV with embargo (leakage-safe folds)
    from temporalscope_spark.operators.cv import purged_fold_summary

    purged_fold_summary(tf.df, "event_time", n_folds=4,
                        embargo_seconds=3600.0).show()

    # 6. dataset-quality validation (one fused stats job)
    from temporalscope_spark.datasets.validator import DatasetValidator

    v = DatasetValidator(time_col="event_time", target_col="n_tok",
                         enable_warnings=False)
    results = v.fit_transform(tf.df.select("event_time", "n_tok", "seq_idx"))
    v.print_report(results)

    # 7. the resumable flagship pass: per-bucket writes + lineage manifests
    from temporalscope_spark.pipelines.feature_pass import run_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "tok")
        tok.write.parquet(inp)
        stats = run_pipeline(
            spark, inp, os.path.join(tmp, "out"), os.path.join(tmp, "ckpt"),
            num_buckets=4,
        )
        print("pipeline:", stats)
        # a second run is a pure resume: nothing recomputed
        stats2 = run_pipeline(
            spark, inp, os.path.join(tmp, "out"), os.path.join(tmp, "ckpt"),
            num_buckets=4,
        )
        assert stats2 == {"processed": 0, "skipped": 4}
        print("resume:", stats2)


if __name__ == "__main__":
    main()
