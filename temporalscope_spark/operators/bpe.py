"""Distributed BPE merge learning (Sennrich et al. 2016, re-expressed
relationally).

BPE training is vocab-level: the corpus collapses ONCE into a bounded
(word, count) table, and every merge round is one aggregation over that
table — the property that makes byte-pair encoding trainable at any
corpus size (Sennrich's reference implementation iterates a Python dict;
the shuffle-native form is a weighted pair count + total-order argmax +
a windowed merge rewrite).

Greedy left-to-right pair merging is the only sequential-looking step,
and it has a closed form: matches of the winning pair (a, b) can only
overlap when ``a == b``, and within each maximal run of consecutive
match positions exactly the 1st, 3rd, 5th… merge. So ``merged(i)`` =
match(i) AND (i − run_start) is even — islands + parity, pure window
functions, identical in Spark and DuckDB. No fold, no UDF, no driver
loop over words.

Determinism contract: everything is integer counts and string
comparisons — pair frequencies are exact sums, the per-round winner is
the total order (freq DESC, left, right), and the merge rewrite is
set-determined. The oracle replays rounds as unrolled CTE blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc, syms): corpus word frequencies with initial character
    symbols — the bounded table every BPE round runs over."""
    words = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).select(F.explode("_w").alias("word")).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("wc")).select(
        "word",
        "wc",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("syms"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, freq): adjacent-symbol pair frequencies weighted by
    word count — one explode + one map-side-combinable aggregate."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("l"),
            F.element_at("syms", i + 1).alias("r"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select("wc", F.explode(pairs).alias("_p"))
        .groupBy(F.col("_p.l").alias("lhs"), F.col("_p.r").alias("rhs"))
        .agg(F.sum("wc").alias("freq"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every word's symbol array with (a, b) -> ab merged, greedy
    left-to-right, via the islands+parity closed form."""
    sym = vocab.select(
        "word", "wc", F.posexplode("syms").alias("_i0", "_s")
    ).withColumn("_i", F.col("_i0") + 1)
    w = Window.partitionBy("word").orderBy("_i")
    sym = sym.withColumn(
        "_m",
        (F.col("_s") == a) & (F.lead("_s", 1).over(w) == b),
    )
    # islands of consecutive match positions: grp = i - rank-among-matches;
    # within an island the 1st, 3rd, … merge (parity of i - run_start)
    wm = Window.partitionBy("word", "_m").orderBy("_i")
    sym = sym.withColumn(
        "_grp", F.when(F.col("_m"), F.col("_i") - F.row_number().over(wm))
    )
    wg = Window.partitionBy("word", "_grp")
    sym = sym.withColumn(
        "_merged",
        F.col("_m")
        & (((F.col("_i") - F.min("_i").over(wg)) % 2) == 0),
    )
    sym = sym.withColumn("_drop", F.coalesce(F.lag("_merged", 1).over(w), F.lit(False)))
    # the merged token must concat the TRUE next symbol — computed before
    # the _drop filter, or the lead() window skips the dropped row
    sym = sym.withColumn(
        "_ns",
        F.when(F.col("_merged"), F.concat("_s", F.lead("_s", 1).over(w))).otherwise(
            F.col("_s")
        ),
    )
    rebuilt = (
        sym.filter(~F.col("_drop"))
        .select("word", "wc", "_i", "_ns")
        .groupBy("word", "wc")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_ns"))),
                lambda s: s["_ns"],
            ).alias("syms")
        )
    )
    return rebuilt


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from the corpus.

    Driver loop of ``num_merges`` rounds (the IRLS precedent: a handful of
    aggregation rounds, each a full distributed job): weighted pair count
    → 1-row argmax collect (total order: freq DESC, lhs, rhs) → merge
    rewrite → localCheckpoint (bounded vocab table; truncating lineage
    each round keeps round R's plan O(1), not O(R)). Stops early when no
    pair remains.

    Output: (rank, lhs, rhs, freq) — all ints/strings, exact in any
    engine (lhs/rhs rather than left/right so the SQL oracle needs no
    keyword quoting).
    """
    if num_merges <= 0:
        raise DataFrameValidationError("num_merges must be > 0")
    spark = df.sparkSession
    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, freq = best[0]["lhs"], best[0]["rhs"], int(best[0]["freq"])
        merges.append((r + 1, a, b, freq))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, freq long"
    )


def bpe_compression_stats(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> DataFrame:
    """Apply the learned merges and measure what they bought: corpus
    token counts before (character symbols) and after ``num_merges`` BPE
    rounds — the train→apply→measure loop a tokenizer-design pass runs.

    Same driver loop as :func:`learn_bpe_merges` (the merge table and the
    rewritten vocab fall out of the same rounds); the final aggregate is
    one map-side-combinable pass over the bounded vocab table.

    Output (1 row): (vocab_words, tokens_before, tokens_after,
    compression) — compression = before/after, rounded to 6.
    """
    if num_merges <= 0:
        raise DataFrameValidationError("num_merges must be > 0")
    vocab = word_vocab(df, text_col).localCheckpoint()
    for _ in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        vocab = _apply_merge(vocab, best[0]["lhs"], best[0]["rhs"]).localCheckpoint()
    return vocab.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_words"),
        F.sum(F.col("wc") * F.length("word")).cast("long").alias("tokens_before"),
        F.sum(F.col("wc") * F.size("syms")).cast("long").alias("tokens_after"),
        F.round(
            F.sum(F.col("wc") * F.length("word")).cast("double")
            / F.sum(F.col("wc") * F.size("syms")).cast("double"),
            6,
        ).alias("compression"),
    )
