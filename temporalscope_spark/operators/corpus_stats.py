"""Corpus-level statistics for training-data pipelines: heavy hitters,
exact/approximate quantiles, histograms, tokenizer fertility.

The reporting layer a 100 TB curation run needs next to the filters: what
are the dominant tokens, how are document lengths distributed, how fine
does the tokenizer split each source. All operators are single-aggregation
shapes (map-side combinable, one shuffle on the group key) with exact
DuckDB-replicable semantics; where the exact form cannot scale (exact
quantiles buffer per group), the approximate scale path is a flag away and
the trade-off is documented rather than silent.

Beyond the reference's scope (its tables are numeric-only); extends
``operators/text.py``'s per-document signals to corpus level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.text import bpe_token_count, token_count


def _norm_words(text_col: str):
    """Whitespace-collapsed lowercase word array (shared with the oracles).
    Projected to a real column by callers BEFORE any explode/lambda — the
    no-CSE-across-HOF-boundaries pitfall."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Top-k most frequent words across the corpus: (word, n) ordered by
    (n desc, word asc) — deterministic tie-break.

    Plan shape at scale: explode → hash aggregate with MAP-SIDE partial
    combine (the heavy hitters are exactly the keys partial aggregation
    compresses best — a word appearing 10⁹ times contributes one partial
    row per task, not 10⁹ shuffle rows) → global top-k via
    TakeOrderedAndProject (per-partition heap + driver merge of k rows, no
    full sort). Empty strings (blank docs) are dropped.
    """
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    words = df.select(F.explode(_norm_words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts.orderBy(F.col("n").desc(), F.col("word")).limit(k)


def token_quantiles(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles of the whitespace token count — the corpus
    sizing profile (sequence-length planning, packing bin sizing).

    ``approx=False`` (default): EXACT linearly-interpolated quantiles
    (Spark ``percentile`` == DuckDB ``quantile_cont``, both the type-7
    definition) — one aggregation, but the executor buffers each group's
    values: fine to ~10⁸ rows per group, NOT the 100 TB path.
    ``approx=True``: ``percentile_approx`` (streaming t-digest-style
    sketch, constant memory, map-side combinable) — the scale path; rank
    error bounded by 1/accuracy, so it has no exact cross-engine oracle
    (tested by bounds instead).
    """
    n_tok = token_count(F.col(text_col))
    fn = F.percentile_approx if approx else F.percentile
    aggs = [
        F.round(fn(n_tok, F.lit(float(p))).cast("double"), 6).alias(
            f"p{int(round(p * 100))}"
        )
        for p in probs
    ]
    aggs.append(F.count(F.lit(1)).alias("n_docs"))
    if group_col is None:
        return df.agg(*aggs)
    return df.groupBy(group_col).agg(*aggs)


def length_histogram(
    df: DataFrame,
    length_col: str = "n_chars",
    bin_width: int = 100,
) -> DataFrame:
    """Fixed-width histogram of a length column: (bin_start, n) with
    ``bin_start = floor(len / width) * width``.

    One hash aggregate on a derived integer key — fully map-side
    combinable, output rows = number of occupied bins (tiny). The
    building block for length-based curation cut decisions.
    """
    if bin_width <= 0:
        raise DataFrameValidationError("bin_width must be > 0")
    bin_start = (F.floor(F.col(length_col) / bin_width) * bin_width).cast("long")
    return (
        df.groupBy(bin_start.alias("bin_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_start")
    )


def skew_profile(
    df: DataFrame,
    key_cols: tuple[str, ...] | str,
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter key diagnosis for shuffle/window planning: the top-k
    heaviest grouping keys with row counts and corpus fraction.

    This is the pre-flight check for every ``groupBy``/``Window.partitionBy``
    at scale — a key holding >1% of a 100 TB table means a straggler task
    (the engine's chunk-salted shift and banded pair ops exist exactly for
    what this surfaces). One map-side-combinable count aggregate + a k-row
    TakeOrderedAndProject + a broadcast one-row total; only k rows reach
    the driver. Output: key cols + (n, fraction) ordered by (n desc, keys).
    """
    if isinstance(key_cols, str):
        key_cols = (key_cols,)
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    top = counts.orderBy(F.col("n").desc(), *key_cols).limit(k)
    return top.join(F.broadcast(total)).select(
        *key_cols,
        "n",
        F.round(F.col("n").cast("double") / F.col("_total").cast("double"), 6).alias(
            "fraction"
        ),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
) -> DataFrame:
    """Per-group tokenizer fertility: BPE-style tokens per whitespace word
    (how much finer the subword tokenizer splits each source — code and
    punctuation-heavy sources run 1.5-3x). Ratio of two LONG sums, so the
    double is bit-identical in any engine. One fused aggregation.

    Output: (group, ws_tokens, bpe_tokens, fertility).
    """
    ws = token_count(F.col(text_col))
    bpe = bpe_token_count(F.col(text_col))
    aggs = [
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_tokens"),
    ]
    base = df.groupBy(group_col) if group_col is not None else df.groupBy()
    out = base.agg(*aggs)
    return out.withColumn(
        "fertility",
        F.round(
            F.try_divide(
                F.col("bpe_tokens").cast("double"), F.col("ws_tokens").cast("double")
            ),
            6,
        ),
    )


def _cms_bucket(word, j: int, width: int, seed: int):
    """Row ``j``'s counter index for ``word``: first 8 hex chars of
    md5(word + '#seed#j') mod width — engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % width``)."""
    h = F.md5(F.concat(word, F.lit(f"#{seed}#{j}")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def countmin_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: int = 5,
) -> DataFrame:
    """Count-min sketch of corpus word frequencies (Cormode & Muthukrishnan
    2005): ``depth`` hash rows × ``width`` counters.

    Output: (``j`` hash-row index, ``bucket``, ``c`` count) — at most
    ``depth * width`` rows REGARDLESS of corpus or vocabulary size, the
    bounded-state summary that makes frequency estimation broadcastable at
    any scale (a 100-TB corpus with a 10^9-word vocabulary still sketches
    to ``d*w`` longs).

    Plan shape: explode words → per-word ``depth`` (j, bucket) pairs
    (expression array, no UDF) → ONE hash aggregation with map-side
    partial combine (each task emits at most ``d*w`` partial rows, so the
    shuffle is sketch-sized, not corpus-sized).
    """
    if depth < 1:
        raise DataFrameValidationError("depth must be >= 1")
    if width < 2:
        raise DataFrameValidationError("width must be >= 2")
    words = df.select(F.explode(_norm_words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    pairs = words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("word"), j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb")
    )
    return (
        pairs.select(F.col("_jb.j").alias("j"), F.col("_jb.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    word_col: str = "word",
    depth: int = 4,
    width: int = 1024,
    seed: int = 5,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each probe
    word, ``est = min over j of counter[j][bucket_j(word)]`` (``depth``,
    ``width``, ``seed`` must match the sketch build).

    Guarantees: ``est >= true count`` always (collisions only ADD);
    ``est <= true + eps * N`` with probability 1 - delta at
    ``width = ceil(e / eps)``, ``depth = ceil(ln 1/delta)``.

    Plan shape: probes × depth position rows joined against the BROADCAST
    sketch (≤ d*w rows by construction) → per-word ``min`` — the probe
    side never shuffles wide, and the sketch side is a fixed-size
    broadcast however big the corpus was.
    """
    if depth < 1:
        raise DataFrameValidationError("depth must be >= 1")
    if width < 2:
        raise DataFrameValidationError("width must be >= 2")
    pr = probes.select(F.col(word_col).alias("word")).distinct()
    pos = pr.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("word"), j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb"),
    ).select("word", F.col("_jb.j").alias("j"), F.col("_jb.bucket").alias("bucket"))
    joined = pos.join(F.broadcast(sketch), ["j", "bucket"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    return joined.groupBy("word").agg(F.min("c").alias("est"))
