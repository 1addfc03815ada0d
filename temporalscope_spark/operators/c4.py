"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer",
arXiv:1910.10683, §2.2) — the named line+page filter battery used to
build C4 from Common Crawl, complementing the document-level Gopher
battery (:mod:`temporalscope_spark.operators.gopher`) with C4's
LINE-level retention semantics.

The paper's rules, as implemented here:

* retain only lines that end in a terminal punctuation mark
  (``. ! ? "``);
* retain only lines with at least ``min_line_words`` words (paper: 3);
* drop lines containing any of ``line_drop_terms`` (the paper drops
  lines with the word "javascript" and boilerplate like
  "terms of use" / "privacy policy" / "cookie policy");
* drop any page containing a term from ``page_drop_terms`` (the paper's
  "List of Dirty, Naughty, Obscene or Otherwise Bad Words" — supplied by
  the caller as data, never hard-coded here);
* drop any page containing "lorem ipsum";
* drop any page containing a curly brace (code);
* drop any page with fewer than ``min_sentences`` sentences (paper: 5)
  after line cleaning — sentence count = terminal-punctuation count of
  the retained lines.

The paper's remaining step — three-sentence span dedup across pages —
is the engine's :func:`~temporalscope_spark.operators.dedup.
remove_dup_spans` / :func:`~temporalscope_spark.operators.dedup.
dedup_lines` family and is intentionally not duplicated here.

Scale design: every rule is a pure per-row JVM expression over the
line-split array (``filter`` / ``exists`` / ``aggregate`` HOFs + one
normalized word array for the page-level term checks) — zero Python,
zero shuffle, no explode; a 100 TB corpus sees exactly one narrow
projection, embarrassingly parallel like the Gopher battery. Word-level
term matching uses ``arrays_overlap`` against a literal array (bounded
term lists are plan literals; a genuinely large blocklist would become a
broadcast anti-join on the exploded word table instead — the
decontamination shape in ``contamination.py``).

Determinism: all rules are integer/string logic, replayed exactly by the
DuckDB oracle (``list_filter`` / ``list_has_any`` mirrors).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5


def _words_of(line: Column) -> Column:
    """Whitespace words of a line (lowercased, collapsed) — the package's
    shared normalization applied line-locally."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(line), r"\s+", " ")), " "
    )


def _line_kept(
    line: Column, min_line_words: int, line_drop_terms: tuple[str, ...]
) -> Column:
    words = _words_of(line)
    ends_terminal = F.substring(F.trim(line), -1, 1).isin(
        *C4_TERMINAL_PUNCT
    )
    long_enough = (
        F.size(F.filter(words, lambda w: w != "")) >= min_line_words
    )
    has_drop = (
        F.arrays_overlap(
            F.transform(words, lambda w: F.regexp_replace(w, r"[.!?\"]+$", "")),
            F.array(*[F.lit(t) for t in line_drop_terms]),
        )
        if line_drop_terms
        else F.lit(False)
    )
    return ends_terminal & long_enough & ~has_drop


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
    line_drop_terms: tuple[str, ...] = (),
    page_drop_terms: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the C4 battery: per-page retained text plus every rule as a
    named column (the ``gopher_quality_flags`` audit contract).

    Output columns: ``id_col``, ``n_lines``, ``n_kept_lines``,
    ``n_sentences`` (terminal-punctuation marks in the retained lines),
    ``clean_text`` (retained lines re-joined on ``sep``), and the page
    flags ``flag_bad_term`` / ``flag_lorem_ipsum`` / ``flag_brace`` /
    ``flag_too_few_sentences`` plus their conjunction ``c4_keep`` (True =
    page survives).
    """
    if not sep:
        raise DataFrameValidationError("sep must be a non-empty string")
    if min_line_words < 1:
        raise DataFrameValidationError("min_line_words must be >= 1")
    if min_sentences < 0:
        raise DataFrameValidationError("min_sentences must be >= 0")
    for t in tuple(line_drop_terms) + tuple(page_drop_terms):
        if not t or t != t.lower():
            raise DataFrameValidationError(
                "drop terms must be non-empty and lowercase"
            )

    text = F.col(text_col)
    lines = F.split(text, re.escape(sep), -1)
    kept = F.filter(
        lines, lambda l: _line_kept(l, min_line_words, line_drop_terms)
    )
    # page-level word set over the ORIGINAL text (the paper checks the
    # raw page), punctuation-stripped at word ends for term matching
    page_words = F.transform(
        _words_of(F.regexp_replace(text, re.escape(sep), " ")),
        lambda w: F.regexp_replace(w, r"[.!?\"]+$", ""),
    )
    flag_bad = (
        F.arrays_overlap(
            page_words, F.array(*[F.lit(t) for t in page_drop_terms])
        )
        if page_drop_terms
        else F.lit(False)
    )
    flag_lorem = F.lower(text).contains("lorem ipsum")
    flag_brace = text.contains("{") | text.contains("}")
    n_sent = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, l: acc
        + F.size(F.split(l, r"[.!?]", -1))
        - 1,
    )
    out = df.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        n_sent.cast("int").alias("n_sentences"),
        F.array_join(kept, sep).alias("clean_text"),
        flag_bad.alias("flag_bad_term"),
        flag_lorem.alias("flag_lorem_ipsum"),
        flag_brace.alias("flag_brace"),
        (n_sent < min_sentences).alias("flag_too_few_sentences"),
    )
    return out.withColumn(
        "c4_keep",
        ~F.col("flag_bad_term")
        & ~F.col("flag_lorem_ipsum")
        & ~F.col("flag_brace")
        & ~F.col("flag_too_few_sentences"),
    )
