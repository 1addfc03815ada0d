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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.dedup import _parallelize_before_explode
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


def _grp_elements(
    df: DataFrame, text_col: str, group_col: str, ngram: int
) -> DataFrame:
    """(grp, word) element stream for set-cardinality sketches: the
    group's normalized words, or (``ngram > 1``) its word n-gram
    shingles joined with ``\\x1f``. Shared by the KMV and HLL lanes so
    both sketch families summarize the SAME ground set."""
    base = _parallelize_before_explode(
        df.select(F.col(group_col).alias("grp"), _norm_words(text_col).alias("_w"))
    )
    if ngram == 1:
        return base.select("grp", F.explode("_w").alias("word")).filter(
            F.col("word") != ""
        )
    # guard: Spark's sequence(1, 0) descends to [1, 0] — short arrays
    # must yield an EMPTY shingle list, not a reversed one
    sh = F.when(
        F.size("_w") >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (ngram - 1)),
            lambda i: F.concat_ws("\x1f", F.slice("_w", i, ngram)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("grp", F.explode(sh).alias("word"))


def _kmv_hash(col, seed: int):
    """Deterministic 32-bit hash in [0, 2^32) — the package's portable
    md5-first-8-hex lane (DuckDB: CAST('0x' || substr(md5(...), 1, 8) AS
    BIGINT)), so sketches replay exactly in any engine."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 8), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 64,
    seed: int = 7,
    ngram: int = 1,
) -> DataFrame:
    """KMV / bottom-k distinct sketch per group (Bar-Yossef et al. 2002;
    Beyer et al. 2007): the ``k`` smallest distinct 32-bit hash values of
    the group's words (``ngram > 1``: its word n-gram shingles, joined
    with ``\\x1f``) — a bounded, MERGEABLE summary of set cardinality
    (union = bottom-k of the concatenated sketches, no rescan).

    Plan shape: word explode → ONE distinct on (group, hash) (map-side
    combinable — the only corpus-sized exchange) → per-group rank with
    ``rn <= k`` (Spark rewrites the filtered window to WindowGroupLimit:
    each partition keeps k rows per group before the exchange) → one
    bounded per-group array aggregate. Groups are data-parallel; no
    global window anywhere.

    Output: (group, ks array<long> ascending, n_hashes int) — ``ks`` has
    at most k entries; ``n_hashes < k`` means the group's full distinct
    hash set is in hand (estimates become exact).
    """
    if k < 2:
        raise DataFrameValidationError("k must be >= 2")
    if ngram < 1:
        raise DataFrameValidationError("ngram must be >= 1")
    elems = _grp_elements(df, text_col, group_col, ngram)
    hashes = elems.select("grp", _kmv_hash(F.col("word"), seed).alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return topk.groupBy("grp").agg(
        F.array_sort(F.collect_list("h")).alias("ks"),
        F.count(F.lit(1)).cast("int").alias("n_hashes"),
    ).withColumnRenamed("grp", group_col)


def kmv_distinct(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 64,
    seed: int = 7,
    ngram: int = 1,
) -> DataFrame:
    """Per-group distinct-word estimates from the KMV sketch: exact when
    the group yielded fewer than ``k`` distinct hashes, else the
    unbiased bottom-k estimator ``(k-1) / U_(k)`` with
    ``U_(k) = (h_k + 1) / 2^32`` (the +1 maps the integer hash onto
    (0, 1], guarding h = 0).

    Output: (group, n_hashes, est_distinct) — est rounded to 6.
    """
    sk = kmv_sketch(df, text_col, group_col, k, seed, ngram)
    return kmv_estimates(sk, group_col, k)


def kmv_estimates(
    sketch: DataFrame,
    group_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Cardinality estimates from a KMV sketch table (the shared output
    lane of :func:`kmv_distinct` and :func:`kmv_merge`): exact below k,
    ``(k-1)/U_(k)`` above. Output: (group, n_hashes, est_distinct)."""
    hk = F.element_at("ks", k).cast("double")
    return sketch.select(
        group_col,
        "n_hashes",
        (
            F.round(
                F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
                .otherwise(F.lit(float(k - 1)) * F.lit(2.0**32) / (hk + F.lit(1.0))),
                6,
            )
            + F.lit(0.0)
        ).alias("est_distinct"),
    )


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    group_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Merge two KMV sketch tables group-by-group WITHOUT rescanning
    either corpus — the incremental-index lane of the sketch family
    (the dedup-index pattern applied to cardinality): the merged
    bottom-k of a group is exactly the bottom-k of the concatenated
    hash sets, because each side's sketch already retains its k
    smallest. Groups present on only one side pass through.

    Plan shape: ONE full-outer join on the group key of two bounded
    sketch tables, then pure in-row array expressions — the corpora
    never move. Output: the sketch schema (group, ks, n_hashes), so
    estimates come from :func:`kmv_estimates` and further merges
    compose associatively.
    """
    if k < 2:
        raise DataFrameValidationError("k must be >= 2")
    empty = F.array().cast("array<long>")
    left = a.select(
        F.col(group_col).alias("_g"), F.col("ks").alias("_ka")
    )
    right = b.select(
        F.col(group_col).alias("_g"), F.col("ks").alias("_kb")
    )
    j = left.join(right, "_g", "full_outer")
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(F.coalesce("_ka", empty), F.coalesce("_kb", empty))
            )
        ),
        1,
        k,
    )
    return j.select(
        F.col("_g").alias(group_col),
        merged.alias("ks"),
        F.size(merged).cast("int").alias("n_hashes"),
    )


def kmv_source_overlap(
    sketch: DataFrame,
    group_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Pairwise source-overlap matrix from per-group KMV sketches:
    union cardinality and Jaccard estimates for every unordered group
    pair, WITHOUT rescanning the corpus — the dataset-curation question
    ("how much does source A overlap source B?") answered from bounded
    state.

    Estimators (Beyer et al. 2007): merged bottom-k = the k smallest of
    the two sketches' union; union_est from the merged k-th value (exact
    when the merged set has < k hashes); jaccard_est = |{merged bottom-k}
    ∩ A ∩ B| / |merged bottom-k| — the standard bottom-k resemblance
    estimator.

    Plan shape: the sketch table has one bounded row per group, so the
    pair join is a broadcast self-join of G rows and every estimator is
    an in-row array expression; the corpus is never touched.

    Output: (group_a, group_b, union_est, jaccard_est) for a < b.
    """
    a = sketch.select(
        F.col(group_col).alias("group_a"), F.col("ks").alias("_ka")
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"), F.col("ks").alias("_kb")
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("_ka", "_kb"))), 1, k
    )
    pairs = pairs.withColumn("_m", merged)
    mk = F.element_at("_m", k).cast("double")
    union_est = F.when(
        F.size("_m") < k, F.size("_m").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(2.0**32) / (mk + F.lit(1.0)))
    inter = F.size(F.array_intersect("_m", F.array_intersect("_ka", "_kb")))
    return pairs.select(
        "group_a",
        "group_b",
        (F.round(union_est, 6) + F.lit(0.0)).alias("union_est"),
        (
            F.round(inter.cast("double") / F.size("_m").cast("double"), 6)
            + F.lit(0.0)
        ).alias("jaccard_est"),
    )


def zipf_fit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ``ln(freq)`` on ``ln(rank)`` over the word-frequency table (Zipf
    1949; natural text slopes near -1; a far-off slope is a corpus-
    quality smell — boilerplate, templated spam, or synthetic text).

    Plan shape: one map-side-combinable word count, ranks from the
    quantile-bucket two-phase global row number (freq DESC, word —
    NO single-partition window however large the vocabulary), then ONE
    aggregation of the five OLS sufficient sums. The closed form runs
    on the driver side of that single 1-row result.

    Output (1 row): (n_vocab, slope, intercept, r2) — rounded to 6;
    slope/intercept/r2 are 0.0 for degenerate (<2-word) vocabularies.
    """
    from temporalscope_spark.plans.rownum import with_global_row_number

    words = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).select(F.explode("_w").alias("word")).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    ranked = with_global_row_number(
        vocab.withColumn("_negf", -F.col("n")), ["_negf", "word"],
        rn_col="_rank", materialize_input=True,
    )
    pts = ranked.select(
        F.log(F.col("_rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("double").alias("_c"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
    )
    xvar = F.col("_c") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    yvar = F.col("_c") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = F.col("_c") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(xvar > 0, cov / xvar).otherwise(F.lit(0.0))
    return agg.select(
        F.col("_c").cast("long").alias("n_vocab"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (
            F.round(
                F.when(
                    xvar > 0, (F.col("_sy") - slope * F.col("_sx")) / F.col("_c")
                ).otherwise(F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("intercept"),
        (
            F.round(
                F.when((xvar > 0) & (yvar > 0), cov * cov / (xvar * yvar)).otherwise(
                    F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


def distinct_ngram_ratio(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Distinct-n diversity (Li et al. 2016, "A Diversity-Promoting
    Objective Function for Neural Conversation Models"): per group, the
    ratio of DISTINCT word n-grams to total n-gram occurrences — the
    standard corpus-diversity report (a synthetic/templated source shows
    a collapsed ratio long before eyeballing does; near-1 means almost
    every n-gram appears once).

    One positional-gram explode (pre-repartitioned — the dedup-pipeline
    lesson) into one aggregation: total count is map-side combinable;
    the distinct count shuffles once on (group, gram). Output:
    (group, n_grams, n_distinct, ratio) with ratio rounded 6.
    """
    from temporalscope_spark.operators.dedup import _parallelize_before_explode

    if n < 1:
        raise DataFrameValidationError("distinct_ngram_ratio: n must be >= 1")
    if text_col not in df.columns or group_col not in df.columns:
        raise DataFrameValidationError(
            f"distinct_ngram_ratio: need columns {text_col!r}, {group_col!r}"
        )
    words = df.select(
        F.col(group_col).alias("_g"), _norm_words(text_col).alias("_w")
    )
    cnt = F.size("_w") - F.lit(n - 1)
    grams = _parallelize_before_explode(words).select(
        "_g",
        F.explode(
            F.when(
                cnt > 0,
                F.transform(
                    F.sequence(F.lit(1), cnt),
                    lambda i: F.array_join(F.slice("_w", i, n), "\x1f"),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_gram"),
    )
    out = grams.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("_gram").alias("n_distinct"),
    )
    return out.select(
        F.col("_g").alias(group_col),
        "n_grams",
        "n_distinct",
        (
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_grams"), 6
            )
            + F.lit(0.0)
        ).alias("ratio"),
    )


# --------------------------------------------------------------------------
# HyperLogLog distinct sketch (Flajolet, Fusy, Gandouet & Meunier 2007)
# --------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    """The standard bias-correction constant from the HLL paper."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    p: int = 10,
    seed: int = 7,
    ngram: int = 1,
) -> DataFrame:
    """HyperLogLog register table per group (Flajolet et al. 2007): for
    each of ``m = 2^p`` buckets, the maximum leading-zero rank ``rho``
    of the bucket's hashed elements. The deterministic md5 lane (shared
    with the KMV sketch via :func:`_kmv_hash`) makes the SKETCH itself
    engine-replayable: bucket ``j`` is the hash's top ``p`` bits
    (``h >> (32-p)``), and ``rho`` comes from the EXACT integer identity
    ``floor(log2(w)) = length(bin(w)) - 1`` on the low ``32-p`` bits —
    string length of the binary rendering, no float log anywhere.

    Plan shape: element explode → ONE map-side-combinable max aggregate
    on (group, bucket). Output (group, j, m_j) holds only NONEMPTY
    registers — at most ``m`` rows per group however large the corpus,
    and mergeable across shards / batches by ``max`` (:func:`hll_merge`).
    """
    if not 4 <= p <= 18:
        raise DataFrameValidationError("p must be in [4, 18]")
    if ngram < 1:
        raise DataFrameValidationError("ngram must be >= 1")
    elems = _grp_elements(df, text_col, group_col, ngram)
    rem_bits = 32 - p
    h = _kmv_hash(F.col("word"), seed)
    hashed = elems.select(
        "grp",
        F.shiftright(h, rem_bits).cast("int").alias("j"),
        h.bitwiseAND(F.lit((1 << rem_bits) - 1)).alias("_w32"),
    )
    rho = F.when(F.col("_w32") == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin("_w32"))
    )
    return (
        hashed.select("grp", "j", rho.cast("int").alias("_rho"))
        .groupBy("grp", "j")
        .agg(F.max("_rho").alias("m_j"))
        .withColumnRenamed("grp", group_col)
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str = "source") -> DataFrame:
    """Merge two HLL register tables: union + per-(group, bucket) max.
    Exactly the sketch of the concatenated corpora — max is associative
    and commutative, so shard/batch order never matters and the merge
    cost is register-table-sized (bounded), never corpus-sized."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "j")
        .agg(F.max("m_j").alias("m_j"))
    )


def hll_estimates(
    registers: DataFrame, group_col: str = "source", p: int = 10
) -> DataFrame:
    """Cardinality estimates from an HLL register table, with the
    paper's small-range (linear counting when ``E <= 2.5m`` and empty
    registers exist) and large-range (32-bit hash-collision) corrections.

    Determinism note: the harmonic sum ``sum(2^-M_j)`` adds dyadic
    rationals spanning at most ``(32-p+1) + p = 33`` bits — under the 53
    bits of an IEEE double, so the sum is EXACT in any aggregation
    order; no sorted fold is needed. The ``ln`` corrections are single
    IEEE ops on exact inputs, replayed identically by the oracle.

    Output: (group, nonempty, est_distinct rounded to 6).
    """
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = registers.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("_s"),
    )
    zeros = F.lit(float(m)) - F.col("nonempty").cast("double")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros)
    two32 = float(1 << 32)
    est = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(
        group_col,
        "nonempty",
        (F.round(est, 6) + F.lit(0.0)).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    p: int = 10,
    seed: int = 7,
    ngram: int = 1,
) -> DataFrame:
    """Per-group distinct-element estimate via HyperLogLog: sketch +
    estimate in one call. Complements :func:`kmv_distinct` (bottom-k):
    HLL state is ``m`` small integers per group (vs ``k`` hashes) and
    merges by max, which is what a 1000-executor union-of-shards wants;
    KMV additionally supports intersection/Jaccard estimates."""
    return hll_estimates(hll_sketch(df, text_col, group_col, p, seed, ngram), group_col, p)


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    word_col: str = "word",
) -> DataFrame:
    """Per-group vocabulary coverage against a learned vocab table: the
    OOV-rate report that pairs with the tokenizer families (a vocab
    trained on one source mix degrades on another — this quantifies
    where, before fertility blows up downstream).

    Token-level (``oov_rate``: OOV occurrences / all occurrences) and
    type-level (``type_oov_rate``: distinct OOV words / distinct words)
    in ONE fused aggregation. The vocab side is vocabulary-sized by
    construction — BROADCAST left join, so the corpus scan never
    shuffles on anything but the group key.

    Output: (group, n_tokens, n_oov, oov_rate, n_types, n_oov_types,
    type_oov_rate), rates rounded to 6.
    """
    marker = vocab.select(
        F.col(word_col).alias("word"), F.lit(1).alias("_in_vocab")
    ).distinct()
    words = _grp_elements(df, text_col, group_col, ngram=1)
    hit = words.join(F.broadcast(marker), "word", "left")
    oov = F.col("_in_vocab").isNull()
    agg = hit.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(oov, 1).otherwise(0)).alias("n_oov"),
        F.countDistinct("word").alias("n_types"),
        F.countDistinct(F.when(oov, F.col("word"))).alias("n_oov_types"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_oov",
        (
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 6)
            + F.lit(0.0)
        ).alias("oov_rate"),
        "n_types",
        "n_oov_types",
        (
            F.round(
                F.col("n_oov_types").cast("double") / F.col("n_types").cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("type_oov_rate"),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Gini coefficient of a non-negative size column per group — the
    standard corpus-concentration diagnostic ("what share of the corpus
    do the biggest domains own?"; 0 = perfectly even, →1 = one key owns
    everything). Uses the exact ties-aware rank identity over the
    DISTINCT-value table: with ascending distinct values v (count c,
    cumulative count R including the block), the sorted-rank sum of the
    block is ``v·(c·R_prev + c(c+1)/2)``, so

        G = 2·Σ_blocks v·ranksum / (n·Σx) − (n+1)/n .

    Plan shape: ONE ``groupBy(group, value)`` count (map-side
    combinable) → the running count over the distinct-value table — a
    group-partitioned cumulative window when grouped, the quantile-bucket
    two-phase global cumsum (``plans.rownum.with_global_cumsum``) when
    ungrouped — → ONE ``groupBy(group)`` fold. No single-partition window
    at any size in either lane. NULLs and negative values are excluded; a
    group with total 0 reports NULL gini.

    Output: ``(group?, n, total, gini)`` with gini rounded to 6, ordered
    by group.
    """
    if value_col not in df.columns:
        raise DataFrameValidationError(
            f"gini_concentration: missing column {value_col!r}"
        )
    if group_col is not None and group_col not in df.columns:
        raise DataFrameValidationError(
            f"gini_concentration: missing column {group_col!r}"
        )
    v = F.col(value_col).cast("double")
    gcols = [F.col(group_col).alias("group")] if group_col else []
    gnames = ["group"] if group_col else []

    counts = (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*gcols, v.alias("_v"))
        .groupBy(*gnames, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if gnames:
        w = Window.partitionBy(*gnames).orderBy("_v")
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked = counts.select(
            *gnames,
            "_v",
            "_c",
            (F.sum("_c").over(cum) - F.col("_c")).alias("_rprev"),
        )
    else:
        # ungrouped: the distinct-value table can itself be data-sized for
        # continuous columns, so the running count goes through the
        # quantile-bucket two-phase global cumsum (the ecdf_feature lane)
        # instead of an empty-partition window
        from temporalscope_spark.plans.rownum import with_global_cumsum

        ranked = with_global_cumsum(
            counts, ["_v"], ["_c"], materialize_input=True
        ).select(
            "_v", "_c", (F.col("_c_cum") - F.col("_c")).alias("_rprev")
        )
    c = F.col("_c").cast("double")
    ranksum = c * F.col("_rprev").cast("double") + c * (c + F.lit(1.0)) / F.lit(
        2.0
    )
    agg = ranked.groupBy(*gnames).agg(
        F.sum("_c").alias("n"),
        F.sum(F.col("_v") * F.col("_c")).alias("total"),
        F.sum(F.col("_v") * ranksum).alias("_rs"),
    )
    n = F.col("n").cast("double")
    out = agg.select(
        *gnames,
        "n",
        F.round(F.col("total"), 6).alias("total"),
        F.round(
            F.when(
                F.col("total") > 0,
                F.lit(2.0) * F.col("_rs") / (n * F.col("total"))
                - (n + F.lit(1.0)) / n,
            ),
            6,
        ).alias("gini"),
    )
    return out.orderBy(*gnames) if gnames else out


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881; Benford 1938) — the classic anomaly screen for machine-
    generated or tampered numeric columns. For each digit d ∈ 1..9:
    observed share, Benford expectation ``log10(1 + 1/d)``, and the
    chi-square contribution ``N·(share − exp)²/exp`` (sum the column for
    the 8-df test statistic).

    The first significant digit of ``|x| > 0`` is
    ``floor(|x| / 10^floor(log10|x|))`` — expression-only, exact for the
    double range. One map-side-combinable 9-key aggregation; zero/NULL
    values are excluded.

    Output: ``(digit, n, share, expected, chi_term)`` rounded to 6,
    ordered by digit; digits that never occur still appear (n = 0) via
    the literal digit spine so the chi-square is complete.
    """
    if value_col not in df.columns:
        raise DataFrameValidationError(
            f"benford_digits: missing column {value_col!r}"
        )
    v = F.abs(F.col(value_col).cast("double"))
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    counts = (
        df.filter(v.isNotNull() & (v > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    joined = spine.join(F.broadcast(counts), "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # 9-row table: bounded by construction
    tot = F.sum("n").over(wall).cast("double")
    share = F.col("n").cast("double") / tot
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    out = joined.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("expected"),
        F.round(tot * (share - expected) * (share - expected) / expected, 6)
        .alias("chi_term"),
    )
    return out.orderBy("digit")


def capture_recapture(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
) -> DataFrame:
    """Chapman capture–recapture estimate (Chapman 1951; the
    bias-corrected Lincoln–Petersen index) of TOTAL population size from
    two overlapping samples — "how many distinct documents does the full
    crawl hold" from two crawl snapshots, "how many users" from two
    tracking windows:

        N̂ = (n_a+1)(n_b+1)/(m+1) − 1,
        Var[N̂] = (n_a+1)(n_b+1)(n_a−m)(n_b−m) / ((m+1)²(m+2))

    where m = |A ∩ B| (distinct keys). Output: one row ``(n_a, n_b,
    n_both, n_hat, se)`` rounded 6 (assumes closed population and
    independent samples — the classic caveats).

    Plan shape: two distinct-count aggregations + ONE semi-join
    distinct count — the overlap never materializes beyond its count.
    Zero overlap leaves the estimator defined (Chapman's +1 smoothing —
    that is why it beats Lincoln–Petersen at web scale sparsity).
    """
    for side, df in (("a", a), ("b", b)):
        if key_col not in df.columns:
            raise DataFrameValidationError(
                f"capture_recapture: side {side} missing column {key_col!r}"
            )
    ka = a.select(F.col(key_col).alias("_k")).filter(F.col("_k").isNotNull()).distinct()
    kb = b.select(F.col(key_col).alias("_k")).filter(F.col("_k").isNotNull()).distinct()
    n_a = ka.count()
    n_b = kb.count()
    m = ka.join(kb, "_k", "left_semi").count()
    nhat = (n_a + 1.0) * (n_b + 1.0) / (m + 1.0) - 1.0
    var = (
        (n_a + 1.0) * (n_b + 1.0) * (n_a - m) * (n_b - m)
        / ((m + 1.0) ** 2 * (m + 2.0))
    )
    spark = a.sparkSession
    import math  # noqa: PLC0415

    return spark.createDataFrame(
        [(n_a, n_b, m, round(nhat, 6), round(math.sqrt(max(var, 0.0)), 6))],
        "n_a long, n_b long, n_both long, n_hat double, se double",
    )


def chao1_richness(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Chao1 species-richness estimate (Chao 1984) of the TRUE
    vocabulary size from an observed sample — "how many distinct words
    does the full corpus hold, given this shard":

        Ŝ = S_obs + f₁²/(2·f₂)      (f₂ > 0)
        Ŝ = S_obs + f₁(f₁−1)/2      (f₂ = 0, the bias-corrected form)

    with f₁/f₂ the singleton/doubleton counts — the same
    count-of-counts table :func:`lm.good_turing_counts` builds, folded
    to one number. The classic sample-coverage companion
    ``coverage = 1 − f₁/n_tokens`` (Good 1953) is included: how much of
    the corpus's probability mass the observed vocabulary captures.

    Output: one row ``(s_obs, f1, f2, n_tokens, s_chao1, coverage)``
    rounded 6. Plan: ONE word-count aggregation → ONE count-of-counts
    aggregation (bounded by distinct count values) → 1-row fold.
    """
    if text_col not in df.columns:
        raise DataFrameValidationError(f"chao1_richness: missing column {text_col!r}")
    words = df.select(F.explode(_norm_words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    coc = wc.groupBy("c").agg(F.count(F.lit(1)).alias("nc"))
    fold = coc.agg(
        F.sum("nc").alias("_s"),
        F.sum(F.when(F.col("c") == 1, F.col("nc")).otherwise(F.lit(0))).alias("_f1"),
        F.sum(F.when(F.col("c") == 2, F.col("nc")).otherwise(F.lit(0))).alias("_f2"),
        F.sum(F.col("c") * F.col("nc")).alias("_nt"),
    )
    f1 = F.col("_f1").cast("double")
    f2 = F.col("_f2").cast("double")
    chao = F.when(
        F.col("_f2") > 0, F.col("_s") + f1 * f1 / (2.0 * f2)
    ).otherwise(F.col("_s") + f1 * (f1 - 1.0) / 2.0)
    return fold.select(
        F.col("_s").cast("long").alias("s_obs"),
        F.col("_f1").cast("long").alias("f1"),
        F.col("_f2").cast("long").alias("f2"),
        F.col("_nt").cast("long").alias("n_tokens"),
        F.round(chao, 6).alias("s_chao1"),
        F.round(1.0 - f1 / F.col("_nt").cast("double"), 6).alias("coverage"),
    )
