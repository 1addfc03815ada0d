"""Unigram language-model scoring — the perplexity-style quality signal.

CCNet/RedPajama-class pipelines rank documents by language-model
perplexity and keep the head of the distribution. The distributed-friendly
first rung of that ladder is a unigram LM estimated from the corpus itself
(or a trusted reference corpus): two map-side-combinable aggregations and
one broadcast join — no trained model artifact, no Python in the hot path.

Determinism contract (oracle-exact): the per-document log-prob sum is a
LEFT-TO-RIGHT fold over the document's distinct words in SORTED word order
(``array_sort`` + ``F.aggregate``). A plain ``sum()`` over doubles is
order-nondeterministic across partitions/engines; the sorted fold makes the
float result reproducible bit-for-bit(-ish) in any engine that folds
left-to-right (DuckDB ``list_reduce`` replays it), so the driver oracle can
compare at 1e-6 without flakiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words


def unigram_counts(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
) -> DataFrame:
    """(word, n) unigram table over the normalized corpus.

    One explode + hash aggregate with map-side partial combine (hot words
    compress to one partial row per task). ``vocab_size`` keeps the top-V
    by (n desc, word) — the bounded-vocabulary lane that stays broadcastable
    at any corpus size (V·~30 bytes; 10⁵ words ≈ 3 MB); everything outside
    the kept vocabulary scores as OOV downstream.
    """
    words = df.select(F.explode(_norm_words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if vocab_size is not None:
        if vocab_size <= 0:
            raise DataFrameValidationError("vocab_size must be > 0")
        counts = counts.orderBy(F.col("n").desc(), "word").limit(vocab_size)
    return counts


def score_unigram(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram cross-entropy (nats/word) and perplexity.

    ``xent = -(1/L) · Σ_w tf_w · ln(c_w / T)`` with ``T = Σ n`` over the
    supplied LM table and OOV words floored at count 1 (so ln stays finite;
    with a truncated vocabulary every dropped word scores as a singleton).
    ``ppl = exp(xent)``; empty documents report (0, 0.0, 1.0) rather than
    being dropped.

    Plan shape: per-(doc, word) tf partial aggregate → broadcast LEFT join
    against the (bounded) LM table → per-doc sorted-fold rollup → one-row
    total broadcast-crossed in. The only wide exchanges are keyed on word
    and doc id; nothing is corpus × vocab.

    Output: (id, n_words, xent_nats, ppl), floats rounded to 6.
    """
    total = lm.agg(F.sum("n").cast("double").alias("_T"))
    words = df.select(
        F.col(id_col), F.explode(_norm_words(text_col)).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("_tf"))
    joined = tf.join(F.broadcast(lm), "word", "left").select(
        id_col,
        "word",
        "_tf",
        F.coalesce(F.col("n"), F.lit(1)).cast("double").alias("_c"),
    )
    per = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("word", "_tf", "_c"))).alias("_arr"),
        F.sum("_tf").cast("long").alias("_L"),
    )
    scored = per.join(F.broadcast(total)).select(
        id_col,
        "_L",
        (
            -F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, s: acc
                + s["_tf"].cast("double") * F.log(s["_c"] / F.col("_T")),
            )
            / F.col("_L").cast("double")
        ).alias("_xent"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("_L", F.lit(0)).cast("long").alias("n_words"),
            F.round(F.coalesce("_xent", F.lit(0.0)), 6).alias("xent_nats"),
            F.round(F.exp(F.coalesce("_xent", F.lit(0.0))), 6).alias("ppl"),
        )
    )
