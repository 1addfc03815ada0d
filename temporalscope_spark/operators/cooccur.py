"""Windowed word co-occurrence counts and (positive) pointwise mutual
information — the distributional-semantics table (Church & Hanks 1990;
the PPMI matrix of Levy & Goldberg 2014 that word2vec implicitly
factorizes). In an LLM-data pipeline the PPMI table is the cheap
corpus-level signal for collocation mining, tokenizer-merge candidates
and topic drift.

Definitions (documented because conventions vary):

* a co-occurrence is an UNORDERED pair of words at distance ≤ ``window``
  within a document's normalized word stream, canonicalized as
  ``(least, greatest)``;
* ``D = 2·Σ c`` is the total word-slot mass (each pair is two
  word-context observations — Levy & Goldberg's ``|D|``);
* marginals ``m(w)`` are row sums of the pair table (a ``(w, w)`` pair
  contributes twice);
* ``pmi = ln(c · D / (m1 · m2))``; ``ppmi = max(pmi, 0)``. For distinct
  words this is exactly the Levy–Goldberg PMI; self-pairs differ from
  their convention by ``ln 2`` (we count the unordered pair once).

Plan shape (100 TB-safe): pair generation is IN-ROW — a nested
``transform`` over ``sequence`` builds every (i, i+d≤window) pair inside
the row, so the corpus never self-joins; one explode feeds two broadcast
LEFT SEMI joins against the bounded top-V vocabulary, then ONE
map-side-combinable count. Marginals, totals and PMI all derive from the
counted pair table, which is bounded by observed-vocab² (practically far
smaller) — the same "everything derives from one bounded table"
discipline as ``score_kneser_ney``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from temporalscope_spark.core.caching import hold
from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode


def cooccurrence_pmi(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """PMI/PPMI over windowed co-occurrences restricted to ``vocab``
    (a ``(word, n)`` table, e.g. ``unigram_counts(df, vocab_size=V)`` —
    bounded, so both semi-joins broadcast at any corpus size).

    Output: ``(w1, w2, n_pairs, pmi, ppmi)`` for canonical pairs with
    count ≥ ``min_count``; floats rounded to 6.
    """
    if window < 1:
        raise DataFrameValidationError("window must be >= 1")
    if min_count < 1:
        raise DataFrameValidationError("min_count must be >= 1")

    base = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).filter(F.element_at("_w", 1) != "")
    L = F.size("_w")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.least(i + F.lit(window), L)),
                lambda j: F.struct(
                    F.least(
                        F.element_at("_w", i), F.element_at("_w", j)
                    ).alias("w1"),
                    F.greatest(
                        F.element_at("_w", i), F.element_at("_w", j)
                    ).alias("w2"),
                ),
            ),
        )
    )
    exploded = (
        base.filter(L >= 2)
        .select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    v = vocab.select("word")
    filtered = exploded.join(
        F.broadcast(v.withColumnRenamed("word", "w1")), "w1", "left_semi"
    ).join(F.broadcast(v.withColumnRenamed("word", "w2")), "w2", "left_semi")
    # the counted pair table is the branch point (marginals ×2, total,
    # output join all read it); bounded by observed-vocab pairs
    counts = (
        filtered.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    marg = (
        counts.select(F.col("w1").alias("w"), "c")
        .unionAll(counts.select(F.col("w2").alias("w"), "c"))
        .groupBy("w")
        .agg(F.sum("c").alias("m"))
    )
    total = counts.agg((F.sum("c") * 2).alias("D"))

    pmi = F.log(
        F.col("c") * F.col("D") / (F.col("m1") * F.col("m2"))
    )
    out = (
        counts.filter(F.col("c") >= float(min_count))
        .join(F.broadcast(marg.select(F.col("w").alias("w1"), F.col("m").alias("m1"))), "w1")
        .join(F.broadcast(marg.select(F.col("w").alias("w2"), F.col("m").alias("m2"))), "w2")
        .join(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("n_pairs"),
            (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"),
            (F.round(F.greatest(pmi, F.lit(0.0)), 6) + F.lit(0.0)).alias("ppmi"),
        )
    )
    return hold(out, counts)
