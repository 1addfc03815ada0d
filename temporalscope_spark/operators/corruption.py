"""Denoising / infilling training-example builders — T5 span corruption
and fill-in-the-middle, deterministic and engine-replayable.

Two standard LLM-pretraining objectives need a DATA-side transform (the
model never sees the original ordering):

* **Span corruption** (Raffel et al. 2020, "Exploring the Limits of
  Transfer Learning with a Unified Text-to-Text Transformer" §3.1.4, the
  T5/UL2 denoising objective): replace ~``rate`` of the tokens with
  sentinel markers in spans of mean length ``mean_span``; the target is
  the deleted spans, each introduced by its sentinel.
* **Fill-in-the-middle** (Bavarian et al. 2022, "Efficient Training of
  Language Models to Fill in the Middle"): split the document at two
  random points into (prefix, middle, suffix) and emit PSM order —
  ``<PRE> prefix <SUF> suffix <MID> middle`` — so an autoregressive model
  learns infilling for free.

Both papers draw spans from an RNG; a 100 TB pipeline cannot (a retry or
a different partitioning would corrupt differently, breaking resume and
cross-engine verification). Here every random draw is a HASH of
``(id, seed, draw index)`` — the same determinism contract as
:func:`~temporalscope_spark.operators.sampling.deterministic_sample`:
same row, same seed → same example, on any partitioning, any engine.

Distributed shape: both operators are pure per-row expressions (one
``transform`` over the token positions, ``flatten``, ``slice`` — no
explode, no shuffle, no Python); a 100 TB corpus sees exactly one narrow
map stage that pipelines into the source partitioning.

Span placement (exact, per position — no spans array to carry): document
of ``L`` tokens gets ``n = max(1, round(L·rate / mean_span))`` spans
(``0`` if ``L < mean_span``); segment ``i`` (0-based) covers 1-based
positions ``floor(i·L/n)+1 .. floor((i+1)·L/n)``; the span inside it has
``len_i = min(mean_span, seg_len)`` and offset ``floor(u_i ·
(seg_len − len_i + 1))`` with ``u_i = md5(id#seed#i)`` as U[0,1). A
position ``p`` recovers its segment as ``i = ceil(p·n/L) − 1`` —
integer-exact — so the in-span / span-head tests are position-local
expressions and the DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _u01(key: Column, seed: int, draw: Column | int) -> Column:
    """Deterministic, portable U[0,1): first 8 md5 hex chars of
    ``key#seed#draw`` as u32 / 2^32 (the `_uniform01` md5 lane)."""
    d = draw if isinstance(draw, Column) else F.lit(draw)
    h = F.md5(
        F.concat(
            key.cast("string"), F.lit(f"#{seed}#"), d.cast("string")
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long").cast(
        "double"
    ) / F.lit(float(2**32))


def span_corruption(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rate: float = 0.15,
    mean_span: int = 3,
    seed: int = 42,
    sentinel: str = "<extra_id_{i}>",
) -> DataFrame:
    """T5 span-corruption examples: one row per document with
    ``(id, n_tok, n_spans, input_tokens, target_tokens)``; inputs carry a
    sentinel where each deleted span was, targets carry each sentinel
    followed by its deleted tokens plus a final closing sentinel.

    Documents shorter than ``mean_span`` tokens pass through uncorrupted
    (``n_spans = 0``, empty target). Sentinels are string tokens
    (``sentinel.format(i=...)``); token values are cast to string.
    Deterministic: spans depend only on ``(id, seed)``.
    """
    if not 0.0 < rate <= 1.0:
        raise DataFrameValidationError("rate must be in (0, 1]")
    if mean_span < 1:
        raise DataFrameValidationError("mean_span must be >= 1")
    toks = F.col(tokens_col)
    key = F.col(id_col)
    L = F.size(toks)
    n = F.when(L < mean_span, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.floor(L * F.lit(float(rate)) / F.lit(mean_span) + F.lit(0.5)),
        )
    ).cast("int")

    def seg_lo(i: Column) -> Column:  # 1-based first position of segment i
        return (F.floor(i.cast("long") * L / n) + 1).cast("int")

    def seg_hi(i: Column) -> Column:  # 1-based last position of segment i
        return F.floor((i.cast("long") + 1) * L / n).cast("int")

    def span_of(i: Column) -> Column:
        """struct(start, len) of segment i's span, 1-based."""
        lo, hi = seg_lo(i), seg_hi(i)
        seg_len = hi - lo + 1
        ln = F.least(F.lit(mean_span), seg_len)
        off = F.floor(_u01(key, seed, i) * (seg_len - ln + 1).cast("double"))
        return F.struct(
            (lo + off).cast("int").alias("start"), ln.cast("int").alias("len")
        )

    def sentinel_tok(i: Column) -> Column:
        pre, post = sentinel.split("{i}")
        return F.concat(F.lit(pre), i.cast("string"), F.lit(post))

    # position p belongs to segment ceil(p*n/L) - 1 (integer-exact)
    def seg_of(p: Column) -> Column:
        return (F.ceil(p.cast("long") * n / L) - 1).cast("int")

    def per_position(p: Column) -> Column:
        """struct(head bool, inside bool, tok string) for position p."""
        i = seg_of(p)
        sp = span_of(i)
        inside = (p >= sp["start"]) & (p < sp["start"] + sp["len"])
        head = p == sp["start"]
        return F.struct(
            head.alias("head"),
            inside.alias("inside"),
            i.alias("i"),
            F.element_at(toks, p).cast("string").alias("tok"),
        )

    pos = F.transform(F.sequence(F.lit(1), L), lambda p: per_position(p))
    input_arr = F.flatten(
        F.transform(
            pos,
            lambda s: F.when(s["head"], F.array(sentinel_tok(s["i"])))
            .when(s["inside"], F.array().cast("array<string>"))
            .otherwise(F.array(s["tok"])),
        )
    )
    target_arr = F.concat(
        F.flatten(
            F.transform(
                pos,
                lambda s: F.when(
                    s["head"], F.array(sentinel_tok(s["i"]), s["tok"])
                )
                .when(s["inside"], F.array(s["tok"]))
                .otherwise(F.array().cast("array<string>")),
            )
        ),
        F.array(sentinel_tok(n.cast("int"))),
    )
    no_spans = n == 0
    return df.select(
        F.col(id_col),
        L.cast("int").alias("n_tok"),
        n.alias("n_spans"),
        F.when(
            no_spans,
            F.transform(toks, lambda t: t.cast("string")),
        )
        .otherwise(input_arr)
        .alias("input_tokens"),
        F.when(no_spans, F.array().cast("array<string>"))
        .otherwise(target_arr)
        .alias("target_tokens"),
    )


def fim_split(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    fraction: float = 0.5,
    seed: int = 42,
    min_len: int = 3,
    spm: bool = False,
) -> DataFrame:
    """Fill-in-the-middle examples: one row per document with
    ``(id, n_tok, is_fim, prefix, middle, suffix, fim_tokens)``.

    A ``fraction`` of documents (chosen by the deterministic hash
    ``u0 = md5(id#seed#0)``, the FIM-rate knob of Bavarian et al. 2022)
    are split at two hash cut points into prefix/middle/suffix and
    re-assembled in PSM order ``<PRE> prefix <SUF> suffix <MID> middle``
    (``spm=True`` emits SPM: ``<PRE> <SUF> suffix <MID> middle`` … i.e.
    suffix first); the rest — and documents shorter than ``min_len`` —
    pass through as plain autoregressive rows (``is_fim = false``,
    ``fim_tokens = tokens``, empty middle/suffix).

    Cut points: ``lo = floor(min(u1,u2)·(L+1))``, ``hi =
    floor(max(u1,u2)·(L+1))`` (0..L, token-boundary cuts), with
    ``u1 = md5(id#seed#1)``, ``u2 = md5(id#seed#2)``.
    """
    if not 0.0 <= fraction <= 1.0:
        raise DataFrameValidationError("fraction must be in [0, 1]")
    if min_len < 1:
        raise DataFrameValidationError("min_len must be >= 1")
    toks = F.col(tokens_col)
    key = F.col(id_col)
    L = F.size(toks)
    u0 = _u01(key, seed, 0)
    u1 = _u01(key, seed, 1)
    u2 = _u01(key, seed, 2)
    lo = F.least(
        F.floor(F.least(u1, u2) * (L + 1).cast("double")).cast("int"), L
    )
    hi = F.least(
        F.floor(F.greatest(u1, u2) * (L + 1).cast("double")).cast("int"), L
    )
    is_fim = (u0 < F.lit(float(fraction))) & (L >= min_len)
    as_str = F.transform(toks, lambda t: t.cast("string"))
    prefix = F.slice(as_str, 1, lo)
    middle = F.when(hi > lo, F.slice(as_str, lo + 1, hi - lo)).otherwise(
        F.array().cast("array<string>")
    )
    suffix = F.when(L > hi, F.slice(as_str, hi + 1, L - hi)).otherwise(
        F.array().cast("array<string>")
    )
    if spm:
        assembled = F.concat(
            F.array(F.lit("<PRE>"), F.lit("<SUF>")),
            suffix,
            F.array(F.lit("<MID>")),
            middle,
            prefix,
        )
    else:
        assembled = F.concat(
            F.array(F.lit("<PRE>")),
            prefix,
            F.array(F.lit("<SUF>")),
            suffix,
            F.array(F.lit("<MID>")),
            middle,
        )
    empty = F.array().cast("array<string>")
    return df.select(
        F.col(id_col),
        L.cast("int").alias("n_tok"),
        is_fim.alias("is_fim"),
        F.when(is_fim, prefix).otherwise(as_str).alias("prefix"),
        F.when(is_fim, middle).otherwise(empty).alias("middle"),
        F.when(is_fim, suffix).otherwise(empty).alias("suffix"),
        F.when(is_fim, assembled).otherwise(as_str).alias("fim_tokens"),
    )
