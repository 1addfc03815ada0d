"""End-to-end pretraining-data pipeline: the round-4 operator family.

Composes the LLM-data ops added on top of the curation tour
(curation_pipeline.py): exact-substring span dedup → unigram-LM
perplexity bucketing (CCNet) → Stupid Backoff scoring → DSIR selection
toward a target slice → temperature-scaled source mixing → deterministic
shard assignment for the dataloader. Every stage is the Spark-first form
of a published pipeline component (Lee et al. 2022; CCNet; Brants et al.
2007; Xie et al. 2023; mT5).

Run: python examples/pretrain_data_pipeline.py  (local[8], ~2 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("pretrain-pipeline", master="local[8]", shuffle_partitions=8)

    from temporalscope_spark.datasets.synthetic import generate_documents

    n_docs = 20_000
    docs = (
        generate_documents(spark, num_docs=n_docs)
        .withColumn(
            "source", F.concat(F.lit("src"), F.pmod("doc_id", F.lit(8)).cast("string"))
        )
        .cache()
    )
    print(f"raw corpus: {docs.count()} docs")

    # 1. exact-substring dedup: measure, then edit (Lee et al. 2022).
    from temporalscope_spark.operators.dedup import dup_span_stats, remove_dup_spans

    stats = dup_span_stats(docs, "text", "doc_id", n=8)
    dup_docs = stats.filter(F.col("dup_span_ratio") > 0).count()
    print(f"docs containing corpus-duplicated 8-gram spans: {dup_docs}")
    assert dup_docs > 0, "synthetic dup chains should plant duplicated spans"

    cleaned = remove_dup_spans(docs, "text", "doc_id", n=8).cache()
    removed = cleaned.agg(F.sum("n_removed")).collect()[0][0]
    print(f"words removed as duplicated spans: {removed}")
    assert removed > 0
    # localCheckpoint at stage boundaries: each downstream stage joins
    # back against its own input (DSIR, sharding), and without truncation
    # the compounded self-derived plan tree grows exponentially — the
    # final write OOMed the driver just RENDERING its explain string
    corpus = (
        cleaned.filter(F.col("n_kept") > 0)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", F.col("cleaned_text").alias("text"), "source")
        .localCheckpoint()
    )
    print(f"after span dedup: {corpus.count()} non-empty docs")

    # 2. CCNet perplexity bucketing over a corpus-estimated unigram LM;
    #    keep head+middle (drop the worst tercile).
    from temporalscope_spark.operators.lm import (
        bigram_counts,
        ppl_buckets,
        score_stupid_backoff,
        unigram_counts,
    )

    lm = unigram_counts(corpus, "text", vocab_size=20_000).cache()
    buckets = ppl_buckets(corpus, lm, "text", "doc_id").cache()
    buckets.groupBy("bucket").count().orderBy("bucket").show()
    kept_ids = buckets.filter(F.col("bucket").isin("head", "middle")).select("doc_id")
    gated = corpus.join(kept_ids, "doc_id").localCheckpoint()
    n_gated = gated.count()
    print(f"after perplexity gate (head+middle): {n_gated} docs")
    assert 0 < n_gated < n_docs

    # 3. TRAINED quality gate (replaces a heuristic-only threshold): one
    #    IRLS round learns a logistic gate over (quality_score,
    #    dup_word_ratio) against the heuristic gate's own label, then docs
    #    pass on predicted probability — the pattern that generalizes to a
    #    human-labeled quality set at production scale.
    from temporalscope_spark.modeling.logistic import irls_step
    from temporalscope_spark.operators.text import (
        with_quality_score,
        with_repetition_features,
    )

    qs = with_quality_score(gated, "text").select("doc_id", "quality_score")
    rep = with_repetition_features(gated, "text").select(
        "doc_id", F.round("dup_word_ratio", 6).alias("dup_word_ratio")
    )
    feats = (
        qs.join(rep, "doc_id")
        .select(
            "doc_id",
            F.col("quality_score").alias("x1"),
            F.col("dup_word_ratio").alias("x2"),
            ((F.col("quality_score") >= 0.6) & (F.col("dup_word_ratio") <= 0.5))
            .cast("double")
            .alias("yb"),
        )
        .localCheckpoint()
    )
    ic, beta, _, ll = irls_step(feats, ["x1", "x2"], "yb", {"x1": 0.0, "x2": 0.0}, 0.0)
    print(f"trained gate: intercept={ic:.3f} beta={beta} ll={ll:.1f}")
    logit = F.lit(ic) + F.lit(beta["x1"]) * F.col("x1") + F.lit(beta["x2"]) * F.col("x2")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    clf_kept = feats.filter(prob >= 0.5).select("doc_id")
    n_clf = clf_kept.count()
    print(f"classifier gate keeps {n_clf} of {n_gated}")
    assert 0 < n_clf <= n_gated
    gated = gated.join(clf_kept, "doc_id").localCheckpoint()
    n_gated = n_clf

    # 4. Stupid Backoff bigram scoring (Brants et al. 2007) — the sharper
    #    fluency signal; show the extremes.
    big = bigram_counts(gated, "text", top_k=50_000).cache()
    sb = score_stupid_backoff(gated, lm, big, "text", "doc_id")
    print("most/least fluent under the bigram model:")
    sb.orderBy("ppl").limit(3).show()
    sb.orderBy(F.col("ppl").desc()).limit(3).show()

    # 5. DSIR: select the half of the gated corpus that best matches the
    #    trusted target slice (source='src0' stands in for Wikipedia) —
    #    on the SCALE lane (exact=False): approx-quantile-bounded
    #    candidates + bucketed rank, no single-partition window.
    from temporalscope_spark.operators.dsir import dsir_select

    target = gated.filter(F.col("source") == "src0")
    k = n_gated // 2
    picked = dsir_select(
        gated, target, k=k, n_buckets=4096, exact=False
    ).localCheckpoint()
    n_sel = picked.filter("selected").count()
    print(f"DSIR selected {n_sel} of {n_gated} (k={k})")
    assert n_sel == min(k, n_gated)
    selected = gated.join(
        picked.filter("selected").select("doc_id"), "doc_id"
    ).localCheckpoint()

    # 6. temperature mixing: flatten the source distribution (alpha=0.5)
    #    to a 60% row budget.
    from temporalscope_spark.operators.sampling import assign_shards, temperature_sample

    budget = int(n_sel * 0.6)
    mixed = temperature_sample(
        selected, budget_rows=budget, strata_col="source", alpha=0.5, portable=True
    ).localCheckpoint()
    print("kept per source (temperature-mixed):")
    mixed.groupBy("source", "keep_frac").count().orderBy("source").show()

    # 7. deterministic dataloader shards: (shard, pos) addresses, then a
    #    partitioned parquet layout a trainer can stream.
    shards = assign_shards(mixed, n_shards=16, seed=7)
    final = mixed.join(shards, "doc_id").join(
        selected.select("doc_id", "text"), "doc_id"
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        final.write.partitionBy("shard").mode("overwrite").parquet(out)
        back = spark.read.parquet(out)
        n_final = back.count()
        n_shards_written = back.select("shard").distinct().count()
        print(f"wrote {n_final} docs across {n_shards_written} shards")
        assert n_final == mixed.count()
        assert n_shards_written == 16
        # per-shard positions are contiguous 1..|shard|
        bad = (
            back.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"))
            .filter(F.col("n") != F.col("mx"))
            .count()
        )
        assert bad == 0, "positions must be contiguous per shard"

    # 8. next-token training examples: whitespace-tokenize the surviving
    #    docs (stand-in for the BPE apply lane) and slide a ctx-8 window —
    #    the map-only transform a dataloader would otherwise do per batch,
    #    done once here so the shards store (context, target) pairs directly.
    from temporalscope_spark.operators.packing import training_windows

    tokenized = final.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("tokens")
    )
    examples = training_windows(tokenized, ctx_len=8, stride=4, id_col="doc_id")
    n_examples = examples.count()
    assert examples.filter(F.size("context") != 8).count() == 0
    print(f"built {n_examples} ctx-8 next-token examples from {n_final} docs")

    # 9. denoising / infilling variants of the same shards: T5 span
    #    corruption and fill-in-the-middle, both deterministic (hash-seeded
    #    — a retried task rebuilds the identical example).
    from temporalscope_spark.operators.corruption import fim_split, span_corruption

    t5 = span_corruption(tokenized, rate=0.15, mean_span=3, seed=13)
    n_t5 = t5.filter(F.col("n_spans") > 0).count()
    fim = fim_split(tokenized, fraction=0.5, seed=13)
    n_fim = fim.filter("is_fim").count()
    # mask invariant: corrupted input + target spans carry every token once
    bad_len = t5.filter(
        F.size("input_tokens") + F.size("target_tokens")
        != F.col("n_tok") + 2 * F.col("n_spans") + 1
    ).filter(F.col("n_spans") > 0).count()
    assert bad_len == 0, "span-corruption token accounting must balance"
    print(f"denoising variants: {n_t5} T5 span-corrupted, {n_fim} FIM docs")

    print("pretraining-data pipeline complete: "
          f"{n_docs} raw -> {n_gated} gated -> {n_sel} DSIR -> {n_final} mixed+sharded "
          f"-> {n_examples} training windows (+ T5/FIM variants)")


if __name__ == "__main__":
    main()
