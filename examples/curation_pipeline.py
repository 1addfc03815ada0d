"""End-to-end LLM training-data curation tour on a synthetic corpus.

The other half of the engine (quickstart.py covers the temporal feature
pass): corpus statistics → quality gate → exact + near dedup → cluster
survivors → decontamination → token-budget mixing → sequence packing →
incremental snapshot processing → closed-form model + exact-SHAP MASV.

Run: python examples/curation_pipeline.py  (local[8], ~2 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("curation", master="local[8]", shuffle_partitions=8)

    from temporalscope_spark.datasets.synthetic import generate_documents

    docs = generate_documents(spark, num_docs=20_000).cache()
    print(f"corpus: {docs.count()} docs")

    # 1. corpus statistics — what are we looking at?
    from temporalscope_spark.operators.corpus_stats import (
        heavy_hitters,
        token_quantiles,
        tokenizer_fertility,
    )

    print("top words:")
    heavy_hitters(docs, "text", k=5).show()
    print("token quantiles (global):")
    token_quantiles(docs, "text", group_col=None).show()
    print("tokenizer fertility (global):")
    tokenizer_fertility(docs, "text", group_col=None).show()

    from temporalscope_spark.operators.corpus_stats import skew_profile

    print("heaviest dedup-key candidates (skew pre-flight):")
    skew_profile(docs.withColumn("_k", F.col("doc_id") % 1000), "_k", k=3).show()

    # 2. quality gate: C4/Gopher-style fused filter (one narrow map)
    from temporalscope_spark.operators.text import quality_filter

    kept = quality_filter(docs, "text", min_quality=0.4)
    print(f"after quality gate: {kept.count()} docs")

    # 3. exact dedup + near-dup clustering -> one survivor per CLUSTER
    from temporalscope_spark.operators.dedup import (
        dedup_cluster_survivors,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=12, threshold=0.5, max_shingle_df=100
    )
    survivors = dedup_cluster_survivors(docs, pairs, "doc_id")
    canonical = survivors.filter(F.col("doc_id") == F.col("canonical_id"))
    print(f"after near-dup clustering: {canonical.count()} canonical docs")

    # 4. decontamination against a fake eval set (word-token 8-grams)
    from temporalscope_spark.operators.contamination import decontaminate

    def with_word_tokens(df):
        return df.withColumn(
            "tokens",
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "),
        )

    eval_set = with_word_tokens(docs.limit(50)).select("doc_id", "tokens")
    clean = decontaminate(
        with_word_tokens(canonical), eval_set, n=8,
        id_col="doc_id", tokens_col="tokens",
    )
    print(f"after decontamination: {clean.count()} docs")

    # 5. token-budget corpus mixing + sequence packing
    from temporalscope_spark.operators.sampling import sample_to_token_budget
    from temporalscope_spark.operators.text import with_token_count

    counted = with_token_count(clean, "text")
    counted = counted.withColumn(
        "source", F.element_at(F.array(F.lit("web"), F.lit("books")), (F.col("doc_id") % 2 + 1).cast("int"))
    )
    mixed = sample_to_token_budget(
        counted, budgets={"web": 50_000, "books": 50_000},
        strata_col="source", token_col="n_tokens", key_col="doc_id",
    )
    print(f"token-budget sample: {mixed.count()} docs")

    # 6. incremental snapshot processing: only the landed batch recomputes
    from temporalscope_spark.datasets.snapshots import SnapshotTable
    from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
    from temporalscope_spark.pipelines.feature_pass import incremental_features

    with tempfile.TemporaryDirectory() as tmp:
        table = SnapshotTable(os.path.join(tmp, "tok"))
        tok = generate_tokenized_sequences(spark, num_rows=5_000, num_docs=50)
        v1 = table.write(tok)
        batch = generate_tokenized_sequences(spark, num_rows=500, num_docs=50, random_seed=7)
        v2 = table.write(batch)
        delta = incremental_features(spark, table, v1, v2, pad_to=16)
        print(
            f"incremental pass v{v1}->v{v2}: {delta.count()} feature rows "
            f"recomputed for {delta.select('doc_id').distinct().count()} touched entities"
        )

    # 7. closed-form model + exact linear-SHAP MASV over the feature frame
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.metrics.masv import calculate_masv
    from temporalscope_spark.modeling import fit_linear, linear_shap_importance
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
    from temporalscope_spark.operators.shift import lag_features

    tok = generate_tokenized_sequences(spark, num_rows=20_000, num_docs=200)
    feats = lag_features(
        tok, "event_time", ["n_tok"], [1, 2], id_col="doc_id", drop_incomplete=True
    )
    model = fit_linear(feats, ["n_tok_lag_1", "n_tok_lag_2"], "n_tok")
    print(f"OLS in one aggregation: coefs={model.coefs}, R2={model.train_r2:.3f}")
    tf = TemporalFrame(
        feats, time_col="event_time", target_col="n_tok", id_col="doc_id",
        exempt_cols=("source", "tokens", "seq_idx"), sort=False,
        enforce_temporal_uniqueness=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=3, train_pct=0.7)
    part.setup()
    part.fit()
    masv = calculate_masv(
        part, ["n_tok_lag_1", "n_tok_lag_2"],
        importance_fn=linear_shap_importance(model),
    )
    print(f"exact-SHAP MASV per phase: {masv}")

    spark.stop()
    print("curation tour complete")


if __name__ == "__main__":
    main()
