"""Tokenizer lab: train and compare all three subword tokenizer
families the engine ships — BPE (Sennrich et al. 2016), unigram LM
(Kudo 2018) and WordPiece (Schuster & Nakajima 2012 / BERT) — on the
same corpus, entirely as Spark jobs.

Covers:
  corpus word vocab → BPE merge learning + apply → unigram EM + Viterbi
  apply → WordPiece likelihood merges + greedy longest-match apply →
  per-tokenizer compression / token counts → fertility comparison →
  Zipf frequency-spectrum fit of the raw corpus.

Every step is the oracle-checked operator surface (`bpe_*`,
`unigram_*`, `wordpiece_*`, `zipf_fit` driver queries); this script is
the narrative composition.

Run: python examples/tokenizer_lab.py  (local[8], ~1 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("tokenizer-lab", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    print(f"corpus: {n_docs} documents from {SF_DIR}")

    # 0. the raw frequency spectrum: is this natural-looking text?
    from temporalscope_spark.operators.corpus_stats import zipf_fit

    zipf_fit(docs, "text").show()

    # 1. BPE: frequency-argmax merges, islands+parity rewrite
    from temporalscope_spark.operators.bpe import (
        apply_bpe,
        bpe_compression_stats,
        learn_bpe_merges,
    )

    bpe_merges = learn_bpe_merges(docs, "text", num_merges=8)
    print("BPE merges (freq argmax):")
    bpe_merges.orderBy("rank").show(8, truncate=False)
    bpe_compression_stats(docs, "text", merges=bpe_merges).show()
    bpe_tok = apply_bpe(docs, bpe_merges, "text", "doc_id")

    # 2. unigram LM: EM over the word lattice, Viterbi decode
    from temporalscope_spark.operators.unigram import apply_unigram, train_unigram

    pieces = train_unigram(docs, "text", num_rounds=2)
    print("unigram pieces (top expected counts):")
    pieces.orderBy(F.col("e_cnt").desc()).show(8, truncate=False)
    uni_tok = apply_unigram(docs, pieces, "text", "doc_id")

    # 3. WordPiece: likelihood-scored merges, greedy longest-match apply
    from temporalscope_spark.operators.wordpiece import (
        apply_wordpiece,
        learn_wordpiece,
        wordpiece_pieces,
    )

    wp_merges = learn_wordpiece(docs, "text", num_merges=8)
    print("WordPiece merges (freq/(sf_l*sf_r) argmax):")
    wp_merges.orderBy("rank").show(8, truncate=False)
    wp_vocab = wordpiece_pieces(docs, "text", merges=wp_merges)
    wp_tok = apply_wordpiece(docs, wp_vocab, "text", "doc_id", max_chars=12)

    # 4. side-by-side fertility: tokens per whitespace word
    ws = docs.select(
        "doc_id",
        F.size(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            )
        ).alias("n_words"),
    )
    rows = []
    for name, tok in (("bpe", bpe_tok), ("unigram", uni_tok), ("wordpiece", wp_tok)):
        agg = (
            tok.join(ws, "doc_id")
            .agg(
                F.sum("n_tok").alias("tokens"),
                F.sum("n_words").alias("words"),
            )
            .collect()[0]
        )
        rows.append((name, int(agg["tokens"]), int(agg["words"]),
                     round(agg["tokens"] / agg["words"], 4)))
    cmp_df = spark.createDataFrame(
        rows, "tokenizer string, tokens long, words long, fertility double"
    )
    print("fertility comparison (lower = coarser segmentation):")
    cmp_df.orderBy("tokenizer").show()

    # 5. sample decode parity check: every tokenizer must cover the corpus
    for name, tok in (("bpe", bpe_tok), ("unigram", uni_tok), ("wordpiece", wp_tok)):
        missing = tok.filter((F.col("n_tok") == 0)).count()
        empties = docs.filter(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")) == ""
        ).count()
        assert missing == empties, (name, missing, empties)
        assert tok.count() == n_docs, name
    print("coverage check passed: all three tokenizers cover every document")

    spark.stop()


if __name__ == "__main__":
    main()
