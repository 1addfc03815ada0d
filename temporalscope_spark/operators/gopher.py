"""Gopher corpus-quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446,
Appendix A1.1) — the named document-filter battery used by Gopher/MassiveText
and re-used (with the same thresholds) by RefinedWeb and DataTrove.

Two operator families:

* :func:`gopher_repetition_features` — the n-gram repetition metrics the
  paper filters on: the character fraction covered by the MOST COMMON word
  n-gram (n = 2, 3, 4) and the character fraction covered by DUPLICATED
  word n-grams (n = 5..10).
* :func:`gopher_quality_flags` — every rule as a named boolean column plus
  the conjunction ``gopher_keep``, so a pipeline can gate on the full
  battery or audit which rule killed a document.

Scale design: ALL pure per-row JVM expressions (split / slice / array_sort
/ aggregate folds — the HOF folds evaluate as JVM interpreted expressions,
everything else fuses into whole-stage codegen), zero Python, zero shuffle,
and no explode: a 100 TB corpus sees exactly one narrow projection. The n-gram
multiplicity counting reuses the sorted-adjacency run-length fold proven in
``with_repetition_features`` (equal grams are adjacent after ``array_sort``,
so one linear fold yields both the max multiplicity and the
duplicated-occurrence character mass) — O(W log W) per row in the word
count W, safe for book-length documents.

Semantics pinned for the oracle (documented deviations from the paper's
prose, both standard in public reimplementations):

* "characters in the most common n-gram" = ``count(top gram) × len(top
  gram)`` with the space-joined gram's length, overlaps ignored; ties on
  count break to the lexicographically LARGEST gram (deterministic in any
  engine via struct/tuple max — ties only affect the reported gram, not
  the count, and the fraction uses only count × len of the winner).
* "characters in duplicated n-grams" = ``Σ count(g) × len(g)`` over grams
  with ``count(g) ≥ 2`` — occurrence-weighted, an upper bound on the
  paper's non-overlapping character coverage; capped at 1.0.
* The character denominator is the length of the whitespace-normalized
  lowercase text (the same normalization every other text operator uses).

Integer-derived ratios keep every metric bit-identical across engines, so
the DuckDB oracle replays them exactly (window ``lead`` builds the same
grams the in-row ``slice`` does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

# Appendix A1.1 thresholds, verbatim.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOP_WORD_HITS = 2
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
# {n: max fraction of chars in the most common n-gram}
GOPHER_TOP_NGRAM_MAX_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
# {n: max fraction of chars in duplicated n-grams}
GOPHER_DUP_NGRAM_MAX_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _norm_words(text: Column) -> tuple[Column, Column]:
    """(normalized text, word array) — the shared normalization: lowercase,
    whitespace runs collapsed, trimmed."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return norm, F.split(norm, " ")


def _gram_fold(words: Column, n: int) -> Column:
    """Per-row struct(top_cnt, top_gram, dup_chars) for word ``n``-grams.

    Grams are built in-row (``slice`` + ``concat_ws`` over a ``sequence`` —
    no explode, no shuffle), sorted so equal grams are adjacent, then one
    linear fold tracks the running multiplicity, the best (count, gram)
    struct, and the occurrence-weighted character mass of grams seen ≥ 2
    times: on a run's 2nd occurrence add 2·len (retroactively counting the
    1st), on later occurrences add len — totalling count·len per
    duplicated gram.
    """
    n_words = F.size(words)
    grams = F.when(n_words < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_words - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    sorted_grams = F.array_sort(grams)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.struct(
            F.lit(0).cast("long").alias("cnt"), F.lit("").alias("gram")
        ).alias("best"),
        F.lit(0).cast("long").alias("dup_chars"),
    )
    # NULL prev on the first element: `g == NULL` is NULL, when() falls to
    # otherwise — the first run starts at 1 without a sentinel value.
    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        cand = F.struct(run.alias("cnt"), g.alias("gram"))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], cand).alias("best"),
            (
                acc["dup_chars"]
                + F.when(run == 2, F.lit(2) * F.length(g))
                .when(run > 2, F.length(g))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("dup_chars"),
        )

    return F.aggregate(
        sorted_grams,
        acc0,
        step,
        lambda acc: F.struct(
            acc["best"]["cnt"].alias("top_cnt"),
            acc["best"]["gram"].alias("top_gram"),
            acc["dup_chars"].alias("dup_chars"),
        ),
    )


def _frac(num: Column, den: Column) -> Column:
    return F.when(den == 0, F.lit(0.0)).otherwise(
        F.least(num.cast("double") / den.cast("double"), F.lit(1.0))
    )


def gopher_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher repetition metrics as columns: ``top_{n}gram_char_frac`` for
    each n in ``top_ns`` and ``dup_{n}gram_char_frac`` for each n in
    ``dup_ns`` (semantics pinned in the module docstring).

    One narrow whole-stage-codegen projection — the word array and each
    fold are projected to real columns first (no CSE across HOF lambda
    boundaries; the ``with_repetition_features`` lesson).
    """
    if text_col not in df.columns:
        raise DataFrameValidationError(f"text column {text_col!r} not found")
    bad = [n for n in (*top_ns, *dup_ns) if n < 2]
    if bad:
        raise DataFrameValidationError(f"n-gram sizes must be >= 2, got {bad}")
    norm, words = _norm_words(F.col(text_col))
    base = df.withColumn("_gq_norm", norm)
    base = base.withColumn("_gq_words", F.split(F.col("_gq_norm"), " "))
    n_chars = F.length(F.col("_gq_norm")).cast("long")
    fold_cols = {}
    for n in sorted({*top_ns, *dup_ns}):
        c = f"_gq_fold{n}"
        base = base.withColumn(c, _gram_fold(F.col("_gq_words"), n))
        fold_cols[n] = c
    for n in top_ns:
        f_ = F.col(fold_cols[n])
        # count × len of the winning gram; a gram occurring once covers
        # just itself, matching the paper's "most common n-gram" fraction
        base = base.withColumn(
            f"top_{n}gram_char_frac",
            _frac(f_["top_cnt"] * F.length(f_["top_gram"]), n_chars),
        )
    for n in dup_ns:
        f_ = F.col(fold_cols[n])
        base = base.withColumn(
            f"dup_{n}gram_char_frac", _frac(f_["dup_chars"], n_chars)
        )
    return base.drop("_gq_norm", "_gq_words", *fold_cols.values())


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_word_ratio: float = GOPHER_MAX_SYMBOL_WORD_RATIO,
    min_alpha_word_ratio: float = GOPHER_MIN_ALPHA_WORD_RATIO,
    min_stop_word_hits: int = GOPHER_MIN_STOP_WORD_HITS,
    with_repetition: bool = True,
) -> DataFrame:
    """The full Gopher rule battery as named boolean columns + metrics:

    * ``gopher_word_count_ok``  — word count in [min_words, max_words]
    * ``gopher_word_len_ok``    — mean word length in [3, 10]
    * ``gopher_symbol_ok``      — (# of ``#`` + ``...`` occurrences) /
      words ≤ 0.1
    * ``gopher_alpha_ok``       — ≥ 80% of words contain a letter
    * ``gopher_stop_ok``        — ≥ 2 hits among the paper's 8 stop words
      (whole-word: space-padded substring counts on the padded text)
    * per-n ``gopher_top{n}_ok`` / ``gopher_dup{n}_ok`` repetition rules
      (``with_repetition=True``)
    * ``gopher_keep``           — the conjunction

    Metric columns (``gopher_word_count``, ``gopher_mean_word_len``,
    ``gopher_symbol_word_ratio``, ``gopher_alpha_word_ratio``,
    ``gopher_stop_word_hits``) ride along for auditability. Single narrow
    projection, no shuffle.
    """
    if text_col not in df.columns:
        raise DataFrameValidationError(f"text column {text_col!r} not found")
    if min_words < 0 or max_words < min_words:
        raise DataFrameValidationError(
            f"invalid word-count bounds [{min_words}, {max_words}]"
        )
    out = (
        gopher_repetition_features(df, text_col) if with_repetition else df
    )
    norm, _ = _norm_words(F.col(text_col))
    out = out.withColumn("_gf_norm", norm)
    out = out.withColumn("_gf_words", F.split(F.col("_gf_norm"), " "))
    normc, words = F.col("_gf_norm"), F.col("_gf_words")
    n_words = (
        F.when(F.length(normc) == 0, F.lit(0)).otherwise(F.size(words))
    ).cast("long")
    nz_words = F.greatest(n_words, F.lit(1))
    # mean word length over non-space chars (int/int double)
    n_spaces = (
        F.length(normc)
        - F.length(F.replace(normc, F.lit(" "), F.lit("")))
    ).cast("long")
    mean_word_len = (F.length(normc) - n_spaces).cast("double") / nz_words.cast(
        "double"
    )
    # symbol hits: '#' chars + non-overlapping '...' runs (length arithmetic)
    n_hash = (
        F.length(normc) - F.length(F.replace(normc, F.lit("#"), F.lit("")))
    ).cast("long")
    n_ellipsis = (
        (
            F.length(normc)
            - F.length(F.replace(normc, F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("long")
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / nz_words.cast("double")
    # words containing at least one ASCII letter
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    alpha_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_alpha_words.cast("double") / n_words.cast("double")
    )
    padded = F.concat(F.lit(" "), normc, F.lit(" "))
    stop_hits = sum(
        (
            (
                F.length(padded)
                - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))
            )
            / F.lit(len(w) + 2)
        ).cast("long")
        for w in GOPHER_STOP_WORDS
    )
    out = (
        out.withColumn("gopher_word_count", n_words)
        .withColumn("gopher_mean_word_len", F.round(mean_word_len, 6))
        .withColumn("gopher_symbol_word_ratio", F.round(symbol_ratio, 6))
        .withColumn("gopher_alpha_word_ratio", F.round(alpha_ratio, 6))
        .withColumn("gopher_stop_word_hits", stop_hits.cast("long"))
        .withColumn(
            "gopher_word_count_ok",
            (n_words >= min_words) & (n_words <= max_words),
        )
        .withColumn(
            "gopher_word_len_ok",
            (F.round(mean_word_len, 6) >= min_mean_word_len)
            & (F.round(mean_word_len, 6) <= max_mean_word_len),
        )
        .withColumn(
            "gopher_symbol_ok",
            F.round(symbol_ratio, 6) <= max_symbol_word_ratio,
        )
        .withColumn(
            "gopher_alpha_ok",
            F.round(alpha_ratio, 6) >= min_alpha_word_ratio,
        )
        .withColumn(
            "gopher_stop_ok", stop_hits.cast("long") >= min_stop_word_hits
        )
        .drop("_gf_norm", "_gf_words")
    )
    keep = (
        F.col("gopher_word_count_ok")
        & F.col("gopher_word_len_ok")
        & F.col("gopher_symbol_ok")
        & F.col("gopher_alpha_ok")
        & F.col("gopher_stop_ok")
    )
    if with_repetition:
        for n, thr in GOPHER_TOP_NGRAM_MAX_FRAC.items():
            out = out.withColumn(
                f"gopher_top{n}_ok",
                F.round(F.col(f"top_{n}gram_char_frac"), 6) <= thr,
            )
            keep = keep & F.col(f"gopher_top{n}_ok")
        for n, thr in GOPHER_DUP_NGRAM_MAX_FRAC.items():
            out = out.withColumn(
                f"gopher_dup{n}_ok",
                F.round(F.col(f"dup_{n}gram_char_frac"), 6) <= thr,
            )
            keep = keep & F.col(f"gopher_dup{n}_ok")
    return out.withColumn("gopher_keep", keep)
