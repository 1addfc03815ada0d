"""Token-level n-gram extraction and train/eval decontamination.

The standard benchmark-decontamination pass for training corpora: a training
sequence is contaminated if it shares any token n-gram with the evaluation
set. Pure relational plan — explode distinct n-grams on both sides, equi-join
on the n-gram key, anti-join the contaminated ids back out:

    train ─ ngrams ─┐
                    ├─ equi-join on key → contaminated ids → LEFT ANTI join
    eval  ─ ngrams ─┘

Scale shape: the eval side is normally tiny (benchmarks), so its distinct
n-gram set broadcasts and the whole pass is one scan over the training
corpus + one broadcast hash join — no shuffle of the training side. Keys are
``xxhash64`` of the n-gram by default (8 bytes through the join); pass
``key='string'`` for a cross-engine-replayable key (the DuckDB oracle path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _ngram_arrays(tokens: Column, n: int, element_type: str = "int") -> Column:
    """Array of token n-grams (each an array<element_type> slice); empty if
    shorter than n (the otherwise-branch type must match the slice type)."""
    count = F.size(tokens) - F.lit(n - 1)
    return F.when(count > 0, F.transform(F.sequence(F.lit(1), count), lambda i: F.slice(tokens, i, n))).otherwise(
        F.array().cast(f"array<array<{element_type}>>")
    )


def token_ngrams(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    key: str = "hash",
    distinct: bool = True,
) -> DataFrame:
    """Exploded per-row token n-grams: (id, ngram_key).

    ``key='hash'``: ``xxhash64`` over the n-gram ARRAY value directly (8-byte
    join key, no serialization ambiguity); ``key='string'``: tokens joined
    with the unit-separator control char ``\\x1f`` (engine-portable —
    DuckDB: ``array_to_string(g, chr(31))``). A comma delimiter would alias
    distinct word-token grams (``['a,b','c']`` == ``['a','b,c']``) into
    false-positive contamination hits; ``\\x1f`` cannot appear in
    whitespace-split tokens. ``distinct=True`` dedupes (id, ngram) pairs —
    what containment joins want (multiplicity is irrelevant to
    contamination).
    """
    if n < 1:
        raise DataFrameValidationError("n must be >= 1")
    if key not in ("hash", "string"):
        raise DataFrameValidationError("key must be 'hash' or 'string'")
    # int arrays are normalized to a single numeric type so train/eval gram
    # strings agree even when one side is int and the other long; STRING
    # arrays (word tokens) pass through untouched — word-level
    # decontamination is first-class, not a cast error
    from pyspark.sql.types import ArrayType, StringType  # noqa: PLC0415

    et = df.schema[tokens_col].dataType
    is_str = isinstance(et, ArrayType) and isinstance(et.elementType, StringType)
    toks = F.col(tokens_col) if is_str else F.col(tokens_col).cast("array<int>")
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_ngram_arrays(toks, n, "string" if is_str else "int")).alias("_g"),
    )
    if key == "hash":
        # hash the array value itself — immune to any join-delimiter aliasing
        grams = grams.select("_id", F.xxhash64("_g").alias("ngram_key"))
    else:
        grams = grams.select(
            "_id", F.array_join("_g", "\x1f").alias("ngram_key")
        )
    return grams.distinct() if distinct else grams


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    key: str = "hash",
) -> DataFrame:
    """Distinct train ids sharing at least one token n-gram with eval.

    The eval n-gram set is broadcast (benchmark-sized by assumption) so the
    training corpus is scanned once with no shuffle on its side.
    """
    tg = token_ngrams(train, n, id_col, tokens_col, key)
    eg = token_ngrams(eval_df, n, id_col, tokens_col, key).select("ngram_key").distinct()
    return (
        tg.join(F.broadcast(eg), "ngram_key")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    key: str = "hash",
) -> DataFrame:
    """Training rows whose id shares NO token n-gram with the eval set
    (LEFT ANTI join against :func:`contaminated_ids`)."""
    bad = contaminated_ids(train, eval_df, n, id_col, tokens_col, key)
    return train.join(bad, id_col, "left_anti")
