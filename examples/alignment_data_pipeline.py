"""Alignment-data pipeline: from raw scored responses to a calibrated,
deduplicated, diversity-checked DPO training set — entirely as Spark jobs.

Covers the post-training half of a data pipeline, the way the
pretraining half is covered by ``pretrain_data_pipeline.py``:

  PII redaction (regex families) → reward-outlier gate (grouped MAD) →
  cross-source reward calibration (per-group rank-to-uniform) → DPO
  chosen/rejected pair construction (margin-gated) → Bradley–Terry
  consistency fit on the resulting comparison log → weighted sampling of
  pairs to budget (Efraimidis–Spirakis, margin-weighted) → eval-integrity
  contamination rate → corpus diversity checks (distinct-n, MAUVE-style
  embedding drift) → MMR-diverse eval-prompt selection.

Every step is the oracle-checked operator surface (`redact_pii`,
`mad_outliers_grouped`, `quantile_normalize`, `dpo_pairs`,
`bradley_terry`, `weighted_sample`, `contamination_rate`,
`distinct_ngrams`, `embedding_drift`, `mmr_rerank` driver queries); this
script is the narrative composition.

Run: python examples/alignment_data_pipeline.py  (local[8], ~1 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("alignment-data", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    # 1. safety preprocessing: scrub shape-based PII from the text that
    # will become prompts/responses
    from temporalscope_spark.operators.pii import pii_scan, redact_pii

    hits = pii_scan(docs, "text", "doc_id").agg(F.sum("n_pii").alias("total"))
    print("PII hits before redaction:", hits.collect()[0]["total"])
    clean = redact_pii(docs, "text", "doc_id")
    print("redacted docs:", clean.filter(F.col("n_redacted") > 0).count())

    # 2. reward hygiene: each user's events are scored candidate
    # responses; drop robust outliers per event type before pairing
    from temporalscope_spark.operators.binning import mad_outliers_grouped

    gated = mad_outliers_grouped(events, "value", "event_type")
    n_out = gated.filter(F.col("value_outlier")).count()
    print(f"reward outliers gated: {n_out}")
    kept = gated.filter(~F.col("value_outlier"))

    # 3. cross-source calibration: raw rewards from different event types
    # live on different scales — rank-normalize within each type
    from temporalscope_spark.operators.scaling import quantile_normalize

    cal = quantile_normalize(kept, "value", "event_type")

    # 4. DPO pairs: best vs worst calibrated response per prompt (=user),
    # gated on a minimum calibrated margin
    from temporalscope_spark.operators.preference import dpo_pairs

    pairs = dpo_pairs(cal, "user_id", "event_id", "value_qn", min_margin=0.2)
    n_pairs = pairs.count()
    print(f"DPO pairs above margin: {n_pairs}")
    pairs.orderBy(F.col("margin").desc()).show(5)

    # 5. consistency check: a Bradley-Terry fit over the chosen/rejected
    # log should produce a sane strength ordering (MM rounds, bounded)
    from temporalscope_spark.modeling.bt import fit_bradley_terry

    bt = fit_bradley_terry(
        pairs.select(
            F.col("chosen").alias("winner"), F.col("rejected").alias("loser")
        ),
        num_rounds=3,
    )
    print("Bradley-Terry strengths (top 5):")
    bt.orderBy(F.col("strength").desc()).show(5)

    # 6. budget: margin-weighted sampling without replacement — bigger
    # margins are likelier, selection deterministic and engine-invariant
    from temporalscope_spark.operators.sampling import weighted_sample

    budget = weighted_sample(pairs, "margin", k=min(50, n_pairs), key_col="prompt")
    print("sampled pairs:", budget.count())

    # 7. eval integrity: how much of the held-out slice's content already
    # appears in training (graded, not just any-hit)
    from temporalscope_spark.operators.contamination import contamination_rate

    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ").alias(
            "tokens"
        ),
    )
    train_t = toks.filter(F.col("doc_id") % 7 != 0)
    eval_t = toks.filter(F.col("doc_id") % 7 == 0)
    rate = contamination_rate(train_t, eval_t, n=3)
    rate.agg(
        F.round(F.avg("rate"), 4).alias("mean_rate"),
        F.sum((F.col("rate") > 0.5).cast("int")).alias("heavily_contaminated"),
    ).show()

    # 8. diversity: distinct-n per source + embedding drift between two
    # halves of the embedding corpus (a MAUVE-style quantized JS check)
    from temporalscope_spark.operators.corpus_stats import distinct_ngram_ratio
    from temporalscope_spark.operators.drift import embedding_drift
    from temporalscope_spark.operators.similarity import ivf_centroids, mmr_rerank

    distinct_ngram_ratio(docs, n=2, group_col="source").show()
    cents = ivf_centroids(emb, num_centroids=8, seed=42, refine_iters=0)
    drift = embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        cents,
    )
    print("embedding JS drift (bits):", drift.collect()[0]["js_total"])

    # 9. diverse eval-prompt selection: MMR over each query's top hits so
    # the eval set isn't k near-duplicates of the same prompt
    from temporalscope_spark.operators.similarity import cosine_similarity

    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    cand = (
        emb.filter(F.col("vec_id") >= 10)
        .select(
            F.lit(0).alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            "embedding",
            F.round(cosine_similarity(F.col("embedding"), qlit), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(15)
    )
    mmr_rerank(cand, k=5, lam=0.7).orderBy("rank").show()

    print("alignment-data pipeline complete.")
    spark.stop()


if __name__ == "__main__":
    main()
