"""End-to-end corpus curation: quality gate → near-dup cluster survivors →
benchmark decontamination, as ONE composable pipeline.

This is the "switch your training-data pipeline to this engine" endpoint:
each stage is an existing operator with its own exact oracle
(``quality_filter``, ``ngram_jaccard_pairs`` + ``dedup_cluster_survivors``,
``decontaminate``), and the composition itself is pinned by the
``curate_corpus`` driver query's full-pipeline DuckDB oracle — the funnel's
intermediate sets are never materialized, so Catalyst fuses the quality
gate's narrow projection+filter into the shingle scan and the whole
pipeline runs as: one gated scan → pair join tree → one broadcast anti
join.

Plan shape at 100 TB:

* the quality gate is expression-only (no shuffle) and PRUNES the corpus
  before anything expensive — the pair join never sees dropped docs;
* near-dup clustering shuffles only the gated survivors' shingles (with
  the stop-shingle df cap bounding the hottest keys);
* the eval set's n-gram table is broadcast (benchmark-sized by
  assumption), so decontamination adds zero corpus-side shuffle;
* the output keeps (id, n_tokens) — the columns token-budget mixing and
  packing need next — not the text, so nothing fat crosses the last stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.operators.contamination import decontaminate
from temporalscope_spark.operators.dedup import (
    dedup_cluster_survivors,
    ngram_jaccard_pairs,
)
from temporalscope_spark.operators.text import quality_filter

__all__ = ["curate_corpus"]


def _word_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace word tokens of the normalized text (the same
    normalization every text operator uses)."""
    return df.withColumn(
        "_wtok",
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
            " ",
        ),
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.6,
    max_dup_word_ratio: float = 0.5,
    max_trigram_dup_ratio: float = 0.9,
    shingle_n: int = 12,
    jaccard_threshold: float = 0.2,
    max_shingle_df: int | None = 100,
    decontam_n: int = 8,
) -> DataFrame:
    """Curate ``docs`` for training: (1) C4/Gopher-style quality gate,
    (2) near-dup clustering over the survivors keeping one canonical doc
    per cluster, (3) drop docs sharing any word ``decontam_n``-gram with
    ``eval_docs``. Returns (id, n_tokens) per surviving doc — the shape
    token-budget mixing consumes.

    Stage order matters and is deliberate: the cheap expression-only gate
    runs first so the O(pairs) stage sees the smallest corpus; clustering
    runs before decontamination so a cluster whose canonical doc is
    contaminated is NOT silently resurrected through a kept duplicate
    (the canonical doc and its near-dups share grams, so dropping the
    canonical almost always drops the content — and the contract is
    defined on the canonical set)."""
    gated = quality_filter(
        docs,
        text_col,
        min_quality=min_quality,
        max_dup_word_ratio=max_dup_word_ratio,
        max_trigram_dup_ratio=max_trigram_dup_ratio,
    ).select(*docs.columns)

    pairs = ngram_jaccard_pairs(
        gated,
        id_col,
        text_col,
        n=shingle_n,
        threshold=jaccard_threshold,
        max_shingle_df=max_shingle_df,
    )
    labeled = dedup_cluster_survivors(gated, pairs, id_col)
    canonical = labeled.filter(F.col(id_col) == F.col("canonical_id")).select(
        *docs.columns
    )

    clean = decontaminate(
        _word_tokens(canonical, text_col),
        _word_tokens(eval_docs, text_col),
        n=decontam_n,
        id_col=id_col,
        tokens_col="_wtok",
        key="string",
    )
    return clean.select(id_col, F.size("_wtok").alias("n_tokens"))
