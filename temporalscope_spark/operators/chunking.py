"""Document chunking and intra-document structural dedup.

The segmentation layer between raw documents and sequence construction:
RAG and long-context training both consume fixed-size overlapping chunks,
and boilerplate-heavy pages repeat whole paragraphs inside one document
(nav blocks, cookie banners) that per-corpus line dedup
(``operators/dedup.dedup_lines``) only removes when they repeat ACROSS
documents.

Both operators are pure row-local array expressions — zero shuffle, fully
whole-stage-codegen'd, so at 100 TB they run at scan speed with no
exchange anywhere in the plan. Beyond the reference's scope (numeric-only
tables); complements ``operators/text.py`` signals and the
``training_windows`` sequence builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def chunk_words(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into fixed-size overlapping word chunks.

    Chunks start at word offsets ``0, stride, 2*stride, ...`` with
    ``stride = size - overlap``; the LAST start is the first offset
    whose chunk reaches the document end, so every word is covered,
    the final chunk may be shorter than ``size``, and no chunk is pure
    overlap: ``n_chunks = 1 + ceil(max(0, n - size) / stride)`` (an
    empty/whitespace document yields one empty chunk, keeping the doc
    represented downstream).

    Plan shape: words split + ``posexplode`` over a per-row offset
    sequence — map-only, NO shuffle; chunk counts are derived per row,
    never aggregated. At 100 TB this is scan-speed segmentation; the
    output is ~``n/stride`` times the input rows, so follow with the
    engine's snapshot writer rather than a driver collect.

    Output: ``id_col``, ``chunk_id`` (0-based), ``n_chunks``,
    ``chunk_text``, ``n_words`` (+ any ``keep_cols`` passed through).
    """
    if size < 1:
        raise DataFrameValidationError("size must be >= 1")
    if not 0 <= overlap < size:
        raise DataFrameValidationError("overlap must be in [0, size)")
    stride = size - overlap
    w = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    base = df.select(
        id_col,
        *keep_cols,
        F.when(
            (F.size(w) == 1) & (F.element_at(w, 1) == ""),
            F.array().cast("array<string>"),
        )
        .otherwise(w)
        .alias("_w"),
    )
    n = F.size("_w")
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - size, F.lit(0)).cast("double") / F.lit(float(stride))
        ).cast("int")
    ).alias("_nc")
    expl = base.select(id_col, *keep_cols, "_w", n_chunks).select(
        id_col,
        *keep_cols,
        "_w",
        F.col("_nc").alias("n_chunks"),
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
            "chunk_id", "_start"
        ),
    )
    piece = F.slice("_w", F.col("_start") * stride + 1, size)
    return expl.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("int").alias("n_words"),
        *keep_cols,
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Remove repeated paragraphs WITHIN each document, keeping each
    paragraph's first occurrence (in order): the in-document half of
    CCNet-style boilerplate removal — nav blocks and banners repeated
    inside one page never reach the corpus-level line table.

    Pure array expression per row: paragraphs are kept where their
    1-based ``array_position`` (first index) equals their own position
    — no explode, no shuffle, no state. Exactly order-preserving
    first-occurrence semantics, whatever the partitioning.

    Output: ``id_col``, ``n_paras`` (before), ``n_kept``, ``text``
    (deduped, ``sep``-rejoined).
    """
    paras = F.split(F.col(text_col), F.lit(sep), -1)
    base = df.select(id_col, paras.alias("_p"))
    kept = F.filter(
        "_p", lambda x, i: F.array_position(F.col("_p"), x) == i + F.lit(1)
    )
    return base.select(
        id_col,
        F.size("_p").cast("int").alias("n_paras"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, sep).alias("text"),
    )
