"""Multinomial Naive Bayes over word counts — the fastText-niche baseline.

Corpus-curation stacks keep a cheap bag-of-words classifier around for
language identification and domain/quality routing (CCNet ships a fastText
lang-id model; the GPT-3 appendix-A quality filter is a linear classifier
over hashed word features). Multinomial NB (McCallum & Nigam 1998, "A
comparison of event models for Naive Bayes text classification") is the
member of that family whose TRAINING is literally one Spark aggregation —
class-conditional word counts — which makes it the right first rung here:
no gradient loop, no driver iteration, exact in integer counts.

Distributed shape (nothing corpus-sized ever moves except one word
explode):

* ``nb_fit``: one explode + ONE map-side-combinable hash aggregate to the
  (label, word) count table, restricted to a BOUNDED top-V corpus
  vocabulary (the :func:`~temporalscope_spark.operators.lm.unigram_counts`
  lane — V·C rows stay broadcastable at any corpus size). Class priors are
  a C-row aggregate. Add-α smoothing turns the counts into
  ``ln((n_cw + α) / (T_c + α·V))`` per (label, word) — computed over the
  label×vocab CROSS of the two bounded tables so every vocab word has a
  log-probability in every class (n_cw = 0 rows included).
* ``nb_score``: per-doc (word, tf) partial aggregate → broadcast INNER
  join against the conditional table (out-of-vocabulary words drop, the
  fixed-vocab multinomial convention) → per-(doc, label) LEFT-TO-RIGHT
  fold over the doc's SORTED in-vocab words (``array_sort`` +
  ``F.aggregate`` — the order-deterministic sum the whole LM family uses,
  replayable by DuckDB ``list_reduce``) → add the broadcast log-prior →
  argmax by (rounded-6 score, label) via one ``max(struct)`` per doc.
  Docs with zero in-vocab words still classify (prior-only): the score
  spine is documents × the C-row prior table with the word fold
  LEFT-joined and coalesced to 0.

Determinism contract: the per-(doc, label) joint log-score rounds to 6
BEFORE the argmax struct, so the predicted label is structurally identical
across engines; ties break to the LARGER label (max-struct order), pinned
in tests and replayed by the oracle's ``max_by``-equivalent struct max.

At 100 TB: the corpus is touched by exactly two narrow passes (fit
explode+agg, score explode+agg); everything joined back is ≤ V·C rows and
broadcast. No window wider than a per-doc collect of its DISTINCT in-vocab
words (bounded by V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode


def nb_fit(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    vocab_size: int = 1000,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB; returns ``(priors, cond)``.

    ``priors``: (label, n_docs, log_prior) — C rows,
    ``log_prior = ln(n_docs / N)``.
    ``cond``: (label, word, n, log_cond) — C·V rows,
    ``log_cond = ln((n + alpha) / (T_c + alpha·V))`` where ``T_c`` sums the
    class's counts over the kept vocabulary and V is the kept-vocab size.

    The vocabulary is the top-``vocab_size`` corpus words by
    (count desc, word asc) — class-blind, so one global aggregate bounds
    both tables. Caller should ``cache()`` the returned ``cond`` when it
    feeds both a broadcast and further derivations.
    """
    if vocab_size <= 0:
        raise DataFrameValidationError("vocab_size must be > 0")
    if alpha <= 0:
        raise DataFrameValidationError("alpha must be > 0")
    if label_col not in df.columns or text_col not in df.columns:
        raise DataFrameValidationError(
            f"columns {label_col!r}/{text_col!r} must exist"
        )
    a = float(alpha)

    words = _parallelize_before_explode(
        df.select(F.col(label_col).alias("label"), _norm_words(text_col).alias("_w"))
    ).select("label", F.explode("_w").alias("word")).filter(F.col("word") != "")

    # ONE corpus aggregate; the global vocab and the per-class counts both
    # derive from it (label-keyed counts roll up to word totals for free).
    # Persist the branch point — it feeds the vocab top-V AND the smoothing
    # cross (release via caching.hold on the cond table).
    from pyspark import StorageLevel

    lw = (
        words.groupBy("label", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab = (
        lw.groupBy("word")
        .agg(F.sum("n").alias("_tot"))
        .orderBy(F.col("_tot").desc(), "word")
        .limit(vocab_size)
        .select("word")
    )
    labels = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_total = labels.select(F.sum("n_docs").alias("_N"))
    priors = (
        labels.join(F.broadcast(n_total))
        .select(
            "label",
            "n_docs",
            F.log(F.col("n_docs").cast("double") / F.col("_N").cast("double")).alias(
                "log_prior"
            ),
        )
    )

    # label × vocab cross of two BOUNDED tables (C and V rows), zero-count
    # rows kept so smoothing covers every (label, word) cell.
    full = (
        labels.select("label")
        .crossJoin(F.broadcast(vocab))
        .join(lw, ["label", "word"], "left")
        .select("label", "word", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tc = full.groupBy("label").agg(
        F.sum("n").alias("_T"), F.count(F.lit(1)).alias("_V")
    )
    cond = full.join(F.broadcast(tc), "label").select(
        "label",
        "word",
        "n",
        F.log(
            (F.col("n").cast("double") + F.lit(a))
            / (F.col("_T").cast("double") + F.lit(a) * F.col("_V").cast("double"))
        ).alias("log_cond"),
    )
    from temporalscope_spark.core.caching import hold

    return priors, hold(cond, lw)


def nb_score(
    df: DataFrame,
    priors: DataFrame,
    cond: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document under the fitted model; returns one row per doc:
    (id, n_words, pred, score) where ``pred`` is the argmax label and
    ``score`` its joint log-probability (rounded 6). ``n_words`` counts the
    IN-VOCABULARY token occurrences that contributed (OOV drops).

    Tie rule: equal rounded scores resolve to the LARGER label (max-struct
    order) — deterministic and oracle-replayable.
    """
    base = _parallelize_before_explode(
        df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
    )
    tf = (
        base.select(id_col, F.explode("_w").alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # broadcast INNER join: OOV words drop here (fixed-vocab convention)
    per = (
        tf.join(F.broadcast(cond), "word")
        .groupBy(id_col, "label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("word", "_tf", "log_cond"))
            ).alias("_arr"),
            F.sum("_tf").cast("long").alias("_L"),
        )
        .select(
            id_col,
            "label",
            "_L",
            F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, s: acc + s["_tf"].cast("double") * s["log_cond"],
            ).alias("_wsum"),
        )
    )
    # prior-only spine keeps zero-in-vocab docs classified
    spine = df.select(id_col).crossJoin(F.broadcast(priors))
    scored = (
        spine.join(per, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            F.coalesce("_L", F.lit(0)).cast("long").alias("_L"),
            F.round(
                F.col("log_prior") + F.coalesce("_wsum", F.lit(0.0)), 6
            ).alias("_score"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("_score"), F.col("label"), F.col("_L"))).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b._L").alias("n_words"),
        F.col("_b.label").alias("pred"),
        F.col("_b._score").alias("score"),
    )


def nb_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    alpha: float = 1.0,
) -> DataFrame:
    """Self-train convenience: fit on ``df`` and score ``df`` (the lang-id
    smoke loop). Returns (id, n_words, pred, score, label, correct)."""
    priors, cond = nb_fit(df, text_col, label_col, vocab_size, alpha)
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import held_handles, hold

    # cond feeds the broadcast scoring join; persist so the fit lineage
    # (corpus explode + agg) runs once under the broadcast re-evaluation
    cond = cond.persist(StorageLevel.MEMORY_AND_DISK)
    out = nb_score(df, priors, cond, text_col, id_col)
    truth = df.select(id_col, F.col(label_col).alias("label"))
    res = out.join(truth, id_col).select(
        id_col,
        "n_words",
        "pred",
        "score",
        "label",
        (F.col("pred") == F.col("label")).alias("correct"),
    )
    return hold(res, cond, *held_handles(cond))
