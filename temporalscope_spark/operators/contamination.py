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


def _bloom_pos(gram: Column, j: int, m: int, seed: int) -> Column:
    """Deterministic bloom bit position for hash function ``j``: first 8 hex
    chars of md5(gram + '#seed#j') mod m — bit-reproducible in any SQL
    engine (DuckDB: ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % m``)."""
    h = F.md5(F.concat(gram, F.lit(f"#{seed}#{j}")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(m))


def bloom_bits(
    eval_df: DataFrame,
    n: int,
    k: int = 3,
    m: int = 1 << 20,
    seed: int = 7,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """The SET-BIT table of a bloom filter over the eval set's token
    n-grams: distinct ``pos`` values (``k`` md5-derived positions per gram,
    modulo ``m`` bits).

    This is the bloom filter expressed relationally: membership of a probe
    gram = ALL ``k`` of its positions appear in this table. Row count is
    bounded by ``min(k * |eval grams|, m)`` — at most ``m`` rows no matter
    how large the benchmark suite grows, which is the bloom compression
    argument: the broadcast side saturates at ``m`` longs (8 MB at the
    default 2^20) instead of growing with the eval corpus, at the price of
    a controlled false-positive rate ~ (1 - e^(-kn/m))^k (over-removal
    only — never under-removal, the safe direction for decontamination).
    """
    if k < 1:
        raise DataFrameValidationError("k must be >= 1")
    if m < 2:
        raise DataFrameValidationError("m must be >= 2")
    eg = token_ngrams(eval_df, n, id_col, tokens_col, key="string").select("ngram_key").distinct()
    g = F.col("ngram_key")
    return (
        eg.select(F.explode(F.array(*[_bloom_pos(g, j, m, seed) for j in range(k)])).alias("pos"))
        .distinct()
    )


def bloom_contaminated_ids(
    train: DataFrame,
    bits: DataFrame,
    n: int,
    k: int = 3,
    m: int = 1 << 20,
    seed: int = 7,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Train ids whose SOME token n-gram tests positive against the bloom
    bit table (a superset of :func:`contaminated_ids` — bloom false
    positives over-remove, never under-remove).

    Plan shape at scale: the corpus side is ONE scan — each of the ``k``
    position tests is a chained **broadcast LEFT-SEMI join** against the
    bounded ``bits`` table (map-side, no shuffle of the training grams); a
    gram survives all ``k`` semi-joins iff every bit is set. Only the
    surviving (contaminated) ids hit the final small ``distinct``. The
    training corpus is never exchanged.
    """
    if k < 1:
        raise DataFrameValidationError("k must be >= 1")
    # distinct=False: existence is all the semi-join chain needs, and the
    # (id, gram) dedup would shuffle the training corpus — duplicate grams
    # only mean duplicate map-side probes, removed by the final tiny distinct
    tg = token_ngrams(train, n, id_col, tokens_col, key="string", distinct=False)
    bad = tg
    for j in range(k):
        pc = f"_p{j}"
        bad = bad.withColumn(pc, _bloom_pos(F.col("ngram_key"), j, m, seed)).join(
            F.broadcast(bits.withColumnRenamed("pos", pc)), pc, "left_semi"
        )
    return bad.select(F.col("_id").alias(id_col)).distinct()


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    n: int,
    k: int = 3,
    m: int = 1 << 20,
    seed: int = 7,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Bloom-filter decontamination: training rows with NO bloom-positive
    token n-gram vs the eval set (LEFT ANTI against
    :func:`bloom_contaminated_ids`).

    The 100-TB lane of :func:`decontaminate`: the exact lane broadcasts the
    eval set's full distinct-gram table (fine for benchmark-sized eval
    sets; unbounded if the "eval" side is itself a corpus), while this lane
    broadcasts at most ``m`` bit positions regardless of eval size and
    keeps the training side shuffle-free. Removal is a SUPERSET of the
    exact lane's (false positives drop extra rows at rate ~(1-e^(-kn/m))^k;
    tune ``m`` up for large eval sets).

    The bit table is persisted here because the ``k`` chained semi-joins
    each broadcast it (without the persist the eval gram pipeline would be
    rebuilt ``k`` times); the handle is bounded (≤ ``m`` longs) and freed
    with the session or ``spark.catalog.clearCache()``. To manage the
    lifecycle yourself — or to reuse one bit table across many batches, the
    decontamination twin of the incremental-dedup index — build it once
    with :func:`bloom_bits` and call :func:`bloom_contaminated_ids`.
    """
    from pyspark import StorageLevel  # noqa: PLC0415

    bits = bloom_bits(eval_df, n, k, m, seed, id_col, tokens_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bad = bloom_contaminated_ids(train, bits, n, k, m, seed, id_col, tokens_col)
    return train.join(bad, id_col, "left_anti")


def contamination_rate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    key: str = "hash",
) -> DataFrame:
    """Per-EVAL-document n-gram overlap against the training corpus — the
    graded memorization-risk report behind the binary
    :func:`contaminated_ids` gate (the convention of GPT-3's appendix-C /
    PaLM's contamination analyses: % of an eval example's n-grams also
    found in training data, not just any-hit).

    Output: (id, n_grams, n_hit, rate) per eval doc with at least one
    n-gram — ``rate = n_hit / n_grams`` over the doc's DISTINCT grams,
    rounded 6. Docs shorter than ``n`` tokens have no grams and are
    omitted (no denominator exists).

    Plan shape at 100 TB: the eval gram set is benchmark-sized by
    assumption — it broadcasts; the training corpus is scanned ONCE,
    filtered down to only the grams the eval set mentions (a tiny
    semi-join result), and distinct-ed. The corpus never shuffles on
    anything else, and the per-doc counting happens entirely on the
    bounded eval side.
    """
    eg = token_ngrams(eval_df, n, id_col, tokens_col, key)
    tg = token_ngrams(train, n, id_col, tokens_col, key).select("ngram_key")
    hit = (
        tg.join(F.broadcast(eg.select("ngram_key").distinct()), "ngram_key")
        .select("ngram_key")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        eg.join(F.broadcast(hit), "ngram_key", "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_hit",
        (
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 6) + F.lit(0.0)
        ).alias("rate"),
    )


def neardup_contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 12,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """FUZZY decontamination: training docs that are NEAR-duplicates of
    an evaluation doc (MinHash/LSH candidates, exact-Jaccard verified) —
    the paraphrase-robust complement to the exact n-gram overlap gate
    (light rewording defeats 13-gram matching; it barely moves a
    char-shingle Jaccard).

    Plan shape at 100 TB: the EVAL side is benchmark-sized — its band
    index AND shingle table broadcast; the training corpus is shingled
    once (one persisted explode), signed in one aggregate, banded
    map-only, and probed against the broadcast index. The train side
    never self-joins and never shuffles on anything but its own id.
    Verification computes exact Jaccard only on candidates.

    Output: one row per contaminated train doc — (``id_col``,
    ``eval_id_col`` of the BEST match, ``jaccard``), best = max
    (jaccard, eval_id) struct (partition-invariant, no window).
    ``hash_fn='md5'`` is the engine-replayable oracle lane.
    """
    from temporalscope_spark.operators.dedup import (
        _shingle_table,
        _signatures_from_shingles,
        band_structs,
    )

    if not 0.0 < threshold <= 1.0:
        raise DataFrameValidationError("threshold must be in (0, 1]")
    if num_hashes % bands != 0:
        raise DataFrameValidationError("bands must divide num_hashes")
    sh_t = _shingle_table(train, id_col, text_col, shingle_n, None, persist=True)
    sh_e = _shingle_table(
        eval_df, eval_id_col, text_col, shingle_n, None, persist=True
    )
    sig_t = _signatures_from_shingles(sh_t, num_hashes, hash_fn)
    sig_e = _signatures_from_shingles(sh_e, num_hashes, hash_fn)
    bb = F.explode(F.array(*band_structs(num_hashes, bands))).alias("bb")
    bt = sig_t.select("_id", bb).select(
        F.col("_id").alias("_tid"),
        F.col("bb.band").alias("_band"),
        F.col("bb.bh").alias("_bh"),
    )
    be = sig_e.select("_id", bb).select(
        F.col("_id").alias("_eid"),
        F.col("bb.band").alias("_band"),
        F.col("bb.bh").alias("_bh"),
    )
    cand = (
        bt.join(F.broadcast(be), ["_band", "_bh"])
        .select("_tid", "_eid")
        .distinct()
    )
    counts_t = sh_t.groupBy("_id").agg(F.count(F.lit(1)).alias("_na"))
    counts_e = sh_e.groupBy("_id").agg(F.count(F.lit(1)).alias("_nb"))
    a = sh_t.select(F.col("_id").alias("_tid"), "_shk")
    b = sh_e.select(F.col("_id").alias("_eid"), "_shk")
    inter = (
        cand.join(a, "_tid")
        .join(F.broadcast(b), ["_eid", "_shk"])
        .groupBy("_tid", "_eid")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    jac = (
        inter.join(counts_t.select(F.col("_id").alias("_tid"), "_na"), "_tid")
        .join(F.broadcast(counts_e.select(F.col("_id").alias("_eid"), "_nb")), "_eid")
        .withColumn(
            "_j",
            F.col("_i").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_i")).cast("double"),
        )
        .filter(F.col("_j") >= threshold)
    )
    best = jac.groupBy("_tid").agg(
        F.max(F.struct(F.col("_j").alias("j"), F.col("_eid").alias("e"))).alias("_m")
    )
    return best.select(
        F.col("_tid").alias(id_col),
        F.col("_m.e").alias(eval_id_col),
        (F.round(F.col("_m.j"), 6) + F.lit(0.0)).alias("jaccard"),
    )


def decontaminate_neardup(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Training corpus minus near-duplicates of the eval set: LEFT ANTI
    against :func:`neardup_contaminated_ids` (a small id set — broadcast
    anti, the train side streams through unshuffled)."""
    bad = neardup_contaminated_ids(
        train, eval_df, id_col=id_col, text_col=text_col, **kwargs
    ).select(id_col)
    return train.join(F.broadcast(bad), id_col, "left_anti")
