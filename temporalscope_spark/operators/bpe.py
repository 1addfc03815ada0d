"""Distributed BPE merge learning (Sennrich et al. 2016, re-expressed
relationally).

BPE training is vocab-level: the corpus collapses ONCE into a bounded
(word, count) table, and every merge round is one aggregation over that
table — the property that makes byte-pair encoding trainable at any
corpus size (Sennrich's reference implementation iterates a Python dict;
the shuffle-native form is a weighted pair count + total-order argmax +
a windowed merge rewrite).

Greedy left-to-right pair merging is the only sequential-looking step,
and it is ROW-LOCAL: each word's symbol array folds left-to-right,
merging (a, b) wherever the pair stands on original symbols (within a
run of consecutive matches exactly the 1st, 3rd, 5th… merge — the
islands+parity invariant, now carried by a "last element was just
merged" flag in the fold accumulator instead of window functions, so a
merge round is one narrow projection with ZERO exchanges). No UDF, no
driver loop over words.

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

# re-checkpoint cadence for stacked merge-fold projections (plan-depth cap)
_CHECKPOINT_EVERY = 16


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


def _apply_merge(
    vocab: DataFrame, a: str, b: str, strip_prefix: str | None = None
) -> DataFrame:
    """Rewrite every word's symbol array with (a, b) -> ab merged, greedy
    left-to-right, as ONE row-local fold over ``syms`` — zero exchanges.

    (The original implementation was an islands+parity rewrite via
    posexplode + three windows + a collect_list regroup: four exchanges
    of the vocab table PER ROUND. The fold carries (output array, "last
    element was just merged") and reproduces the same greedy semantics:
    a merged token never serves as the left side of another merge in the
    same round, even when it is textually equal to ``a``.)

    ``strip_prefix`` (a regex anchored by the caller, e.g. ``'^##'``)
    is removed from the RIGHT symbol before concatenation — the
    WordPiece continuation-marker rule; BPE passes None."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(False).alias("lm"),
    )

    def step(acc, s):
        mergeable = (
            ~acc["lm"]
            & (F.size(acc["arr"]) > 0)
            & (F.element_at(acc["arr"], -1) == F.lit(a))
            & (s == F.lit(b))
        )
        rhs = (
            F.regexp_replace(s, strip_prefix, "")
            if strip_prefix is not None
            else s
        )
        merged_arr = F.concat(
            F.slice(acc["arr"], 1, F.size(acc["arr"]) - 1),
            F.array(F.concat(F.element_at(acc["arr"], -1), rhs)),
        )
        return F.struct(
            F.when(mergeable, merged_arr)
            .otherwise(F.concat(acc["arr"], F.array(s)))
            .alias("arr"),
            mergeable.alias("lm"),
        )

    new_syms = F.aggregate(F.col("syms"), acc0, step, lambda acc: acc["arr"])
    return vocab.select("word", "wc", new_syms.alias("syms"))


def _learn_rounds(
    vocab: DataFrame, num_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The shared merge-round driver loop (the IRLS precedent: a handful
    of aggregation rounds, each a full distributed job): weighted pair
    count → 1-row argmax collect (total order: freq DESC, lhs, rhs) →
    merge rewrite (a row-local fold — lazy, no job of its own). The
    caller passes a checkpointed base vocab; rounds stack narrow fold
    projections on top of it, re-checkpointing every
    ``_CHECKPOINT_EVERY`` rounds so a production-size merge count never
    grows an unbounded plan while an 8-merge run pays ZERO per-round
    materializations. Stops early when no pair remains. Returns (merge
    list, final rewritten vocab) — train, apply-to-vocab, and measure
    all come out of ONE pass."""
    merges: list[tuple[int, str, str, int]] = []
    handles: list[DataFrame] = []
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
        # lazy persist: the NEXT round's argmax materializes this round's
        # fold from the previous round's cached blocks — one fold per
        # round, no checkpoint job, no stacked-fold recompute
        vocab = _apply_merge(vocab, a, b).persist()
        handles.append(vocab)
    for h in handles:
        h.unpersist()
    # a caller's later action on the returned vocab recomputes the fold
    # stack ONCE from the checkpointed base — narrow, bounded, leak-free
    return merges, vocab


def _ordered_merges(merges) -> list[tuple[str, str]]:
    """(lhs, rhs) pairs in rank order from a merge table — a DataFrame
    with (rank, lhs, rhs) columns or an already-ordered list of pairs.
    Merge tables are vocabulary-sized (10⁴–10⁵ rows at production
    tokenizer sizes), so the collect is bounded."""
    if isinstance(merges, DataFrame):
        return [
            (r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()
        ]
    return [(a, b) for a, b in merges]


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from the corpus
    (driver loop shared with :func:`bpe_compression_stats` and
    :func:`apply_bpe` via ``_learn_rounds``).

    Output: (rank, lhs, rhs, freq) — all ints/strings, exact in any
    engine (lhs/rhs rather than left/right so the SQL oracle needs no
    keyword quoting).
    """
    if num_merges <= 0:
        raise DataFrameValidationError("num_merges must be > 0")
    spark = df.sparkSession
    if vocab is None:
        vocab = word_vocab(df, text_col).localCheckpoint()
    merges, _ = _learn_rounds(vocab, num_merges)
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, freq long"
    )


def bpe_compression_stats(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    merges: DataFrame | list | None = None,
) -> DataFrame:
    """Apply BPE merges and measure what they bought: corpus token counts
    before (character symbols) and after the merge rounds — the
    train→apply→measure loop a tokenizer-design pass runs.

    With ``merges=None`` the merges are learned here (the shared
    ``_learn_rounds`` loop). Passing a pre-learned merge table (the
    output of :func:`learn_bpe_merges`) skips the per-round pair
    counting and argmax entirely — a train+measure pipeline runs the
    rounds ONCE, not twice. The final aggregate is one map-side-
    combinable pass over the bounded vocab table.

    Output (1 row): (vocab_words, tokens_before, tokens_after,
    compression) — compression = before/after, rounded to 6.
    """
    vocab = word_vocab(df, text_col).localCheckpoint()
    if merges is not None:
        for i, (a, b) in enumerate(_ordered_merges(merges)):
            vocab = _apply_merge(vocab, a, b)
            if (i + 1) % _CHECKPOINT_EVERY == 0:
                vocab = vocab.localCheckpoint()
    else:
        if num_merges <= 0:
            raise DataFrameValidationError("num_merges must be > 0")
        _, vocab = _learn_rounds(vocab, num_merges)
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


def apply_bpe(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Tokenize DOCUMENTS with a learned merge table — the apply side of
    the BPE loop, closing the circle to the engine's canonical
    pre-tokenized payload (``tokens`` arrays).

    BPE tokenization is word-closed: a word's token sequence depends only
    on the word, never on its neighbors. So the corpus never sees the
    merge loop — the DISTINCT-WORD table does (bounded, vocabulary-
    sized): each merge is one islands+parity rewrite over it, in rank
    order, with localCheckpoint lineage truncation per round (the same
    closed form as training, ``_apply_merge``). The corpus itself is
    touched exactly twice: one positional word explode, one join against
    the finished word→tokens mapping (vocabulary-sized — Catalyst
    broadcasts it when it fits; at 10⁸+ distinct words it degrades to a
    plain shuffle join on ``word``, never corpus × vocab), then a per-doc
    ordered reassembly. No per-row Python anywhere; a production-size
    merge table (~32k rounds) would swap the per-merge relational rewrite
    for one vectorized pandas UDF pass over the SAME bounded distinct-word
    table — the corpus-side plan (explode, join, reassemble) is already
    the 100 TB shape.

    Output: (id, tokens array<string>, n_tok int); docs whose text
    normalizes to empty get an empty array and n_tok 0.
    """
    mlist = _ordered_merges(merges)
    # word -> token-sequence mapping: merge rounds over distinct words only
    # (``vocab``: share one checkpointed word_vocab across a train+apply
    # pipeline instead of re-exploding the corpus per stage)
    if vocab is None:
        vocab = word_vocab(df, text_col).localCheckpoint()
    for i, (a, b) in enumerate(mlist):
        vocab = _apply_merge(vocab, a, b)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    mapping = vocab.select("word", "syms")

    pos = (
        _parallelize_before_explode(
            df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
        )
        .select(F.col(id_col), F.posexplode("_w").alias("_i", "word"))
        .filter(F.col("word") != "")
    )
    per = (
        pos.join(mapping, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
            F.size(F.coalesce("tokens", F.array().cast("array<string>")))
            .cast("int")
            .alias("n_tok"),
        )
    )
