"""Lexical retrieval scoring: BM25 over the normalized word stream.

The retrieval half of a RAG corpus pipeline (:func:`text.chunk_documents`
makes the passages; this ranks them). Everything is relational and
engine-replicable:

  * corpus statistics (N, avg doc length) and per-term document frequencies
    fold in ONE aggregation — a handful of scalars to the driver;
  * scoring joins the exploded (doc, word) count table against the tiny
    broadcast term table — per-(doc, term) work only for MATCHING terms
    (a non-matching term contributes exactly 0 to BM25), so the plan is
    a map-side-combinable word count + one broadcast join + one per-doc
    sum: no full-corpus scoring pass, no UDFs;
  * ordering is on the ROUNDED score (6 dp) with a doc-id tie-break, so
    the top-k boundary is reproducible bit-for-bit across engines (two
    engines may disagree in the last ulp of a float sum; they cannot
    disagree after rounding that both sides apply).

BM25 (Robertson/Sparck Jones, the +0.5 smoothed variant):

    idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score(d, q) = Σ_{t ∈ q}  idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 against ``query_terms``.

    Returns (id, score) for the k best MATCHING documents (docs sharing no
    query term score exactly 0 and are excluded — they are unranked ties),
    ordered by (round(score, 6) desc, id). One stats aggregation, one word
    count shuffle, one broadcast join, one per-doc sum, one top-k.
    """
    if not query_terms:
        raise DataFrameValidationError("query_terms must be non-empty")
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    terms = sorted(set(query_terms))

    base = df.select(F.col(id_col).alias("_id"), _norm_words(text_col).alias("_w"))
    # doc length counts every word; blank docs have dl 0 (split('')=[''] guard)
    base = base.withColumn(
        "_dl",
        F.when(F.array_join(F.col("_w"), "") == "", F.lit(0)).otherwise(
            F.size(F.col("_w"))
        ).cast("double"),
    )

    # ONE aggregation: N, avgdl, df_t for every query term
    stat_aggs = [F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")]
    for i, t in enumerate(terms):
        stat_aggs.append(
            F.sum(F.array_contains(F.col("_w"), t).cast("int")).alias(f"_df{i}")
        )
    st = base.agg(*stat_aggs).first()
    n_docs = float(st["_n"])
    avgdl = float(st["_avgdl"] or 0.0) or 1.0
    idf = {
        t: math.log((n_docs - float(st[f"_df{i}"]) + 0.5) / (float(st[f"_df{i}"]) + 0.5) + 1.0)
        for i, t in enumerate(terms)
    }

    spark = df.sparkSession
    term_tbl = spark.createDataFrame(
        [(t, idf[t]) for t in terms], "word string, _idf double"
    )
    counts = (
        base.select("_id", "_dl", F.explode("_w").alias("word"))
        .groupBy("_id", "_dl", "word")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .join(F.broadcast(term_tbl), "word")
    )
    contrib = F.col("_idf") * (
        F.col("_tf") * (k1 + 1.0)
    ) / (F.col("_tf") + F.lit(k1) * (1.0 - b + b * F.col("_dl") / F.lit(avgdl)))
    scored = counts.groupBy("_id").agg(F.round(F.sum(contrib), 6).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("_id"))
        .limit(k)
        .select(F.col("_id").alias(id_col), "score")
    )
