"""TF-IDF document vectors and sparse cosine similarity — the lexical
vector space (sklearn ``TfidfVectorizer`` semantics) kept in the LONG
(doc, word, weight) relational form that actually scales: no per-doc
dense arrays, every step a counted aggregation or an equi-join, and
document-pair similarity generated ONLY through shared words (the
inverted-index trick — never an all-pairs product).

Weighting follows sklearn's defaults exactly so the numbers are
recognizable: raw term count, smooth idf ``ln((1+N)/(1+df)) + 1``, then
per-doc L2 normalization. Weights round to 6 decimals (the engine's
replayable-model contract; the DuckDB oracles replay the same formula
term-for-term).

Scale notes: term frequencies and document frequencies are map-side
combinable aggregations; the idf join is word-keyed (vocabulary-sized
build side); the norm join is id-keyed. ``tfidf_cosine_pairs`` prunes
words above ``max_df_frac`` BEFORE the self-join — a word appearing in
f·N docs contributes (f·N)² candidate pairs, so the df cap is the
load-bearing guard (MinHash/SimHash in ``operators/dedup.py`` are the
sub-quadratic alternatives when even capped joins are too hot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words


def tfidf_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float = 1.0,
    l2_normalize: bool = True,
) -> DataFrame:
    """Long-form TF-IDF: one row per (id, word) with ``tf`` (raw count)
    and ``tfidf`` (smooth-idf weighted, optionally L2-normalized,
    rounded 6).

    ``min_df``/``max_df_frac`` drop too-rare / too-common words (df
    counted over all N docs, bounds inclusive-min / strict-max like
    sklearn's int/float split). Blank docs contribute nothing and docs
    whose words are all filtered simply have no rows — the sparse
    contract; N still counts every input doc.
    """
    if min_df < 1:
        raise DataFrameValidationError("tfidf_table: min_df must be >= 1")
    if not (0.0 < max_df_frac <= 1.0):
        raise DataFrameValidationError("tfidf_table: max_df_frac must be in (0, 1]")
    if id_col not in df.columns or text_col not in df.columns:
        raise DataFrameValidationError(
            f"tfidf_table: missing column {id_col!r} or {text_col!r}"
        )
    n_docs = df.count()
    words = (
        df.select(F.col(id_col).alias("id"), _norm_words(text_col).alias("_w"))
        .select("id", F.explode("_w").alias("word"))
        .filter(F.col("word") != "")
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    termdf = tf.groupBy("word").agg(F.count(F.lit(1)).alias("_df"))
    termdf = termdf.filter(F.col("_df") >= min_df)
    if max_df_frac < 1.0:
        termdf = termdf.filter(F.col("_df") <= float(max_df_frac) * n_docs)
    idf = termdf.select(
        "word",
        (
            F.log((F.lit(1.0 + n_docs)) / (F.col("_df").cast("double") + 1.0))
            + 1.0
        ).alias("_idf"),
    )
    weighted = tf.join(idf, "word").select(
        "id", "word", "tf", (F.col("tf").cast("double") * F.col("_idf")).alias("_w")
    )
    if not l2_normalize:
        return weighted.select(
            F.col("id").alias(id_col), "word", "tf", F.round("_w", 6).alias("tfidf")
        )
    norms = weighted.groupBy("id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_n")
    )
    return (
        weighted.join(norms, "id")
        .select(
            F.col("id").alias(id_col),
            "word",
            "tf",
            F.round(F.col("_w") / F.col("_n"), 6).alias("tfidf"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float = 0.5,
    min_sim: float = 0.1,
) -> DataFrame:
    """Document pairs (id_a < id_b, cosine) with cosine ≥ ``min_sim``,
    generated via the inverted index: the L2-normalized TF-IDF table
    self-joins ON WORD (pairs exist only where vocabulary overlaps),
    per-pair dot products sum in one grouped aggregation — cosine equals
    the dot product because the vectors are unit-norm.

    The ``max_df_frac`` cap (default: drop words in > half the corpus)
    bounds each word's pair fan-out; similarity is computed over the
    SURVIVING vocabulary, which is what you want for near-dup detection
    anyway (ubiquitous words carry no signal). Cosines round to 6.
    """
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    if not (0.0 <= min_sim <= 1.0):
        raise DataFrameValidationError("tfidf_cosine_pairs: min_sim must be in [0, 1]")
    # the vector table feeds BOTH sides of the word self-join: persist it
    # or the whole explode→tf→df→idf→norm pipeline evaluates twice
    # (release with core.caching.release after the terminal action)
    vec = tfidf_table(df, text_col, id_col, min_df, max_df_frac, l2_normalize=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = vec.select(
        F.col("word"), F.col(id_col).alias("id_a"), F.col("tfidf").alias("_wa")
    )
    b = vec.select(
        F.col("word"), F.col(id_col).alias("id_b"), F.col("tfidf").alias("_wb")
    )
    return hold(
        a.join(b, "word")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("_wa") * F.col("_wb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= float(min_sim)),
        vec,
    )


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    signed: bool = True,
    l2_normalize: bool = False,
    seed: int = 7,
) -> DataFrame:
    """Feature hashing ("the hashing trick", Weinberger et al. 2009):
    project each document's bag of words into a FIXED ``n_buckets``-dim
    space without any vocabulary table — bucket = md5(word)%D, sign from
    an independent md5 bit, value = Σ sign·tf per (doc, bucket). Output
    stays in the long sparse form (id, bucket:int, value:double); rows
    whose signed sum cancels to exactly 0 are dropped (the sparse
    contract — they carry no information and integer sums make the test
    exact).

    Why this scales where TF-IDF needs care: there is NO df/idf pass and
    NO vocabulary join — one explode, one map-side-combinable aggregation
    on (id, bucket), done. The output dimensionality is a constant chosen
    up front, so downstream learners (``modeling/linear.py``,
    ``modeling/logistic.py``) get a fixed schema regardless of corpus
    drift — the property that makes the trick the standard featurizer for
    streaming/incremental training at web scale. Signed hashing keeps the
    collision noise zero-mean (the paper's unbiasedness argument).

    md5 (not xxhash64) so any SQL engine replays bit-identically:
    bucket = CAST('0x'||substr(md5(word||'#fh<seed>'),1,8) AS BIGINT) % D,
    sign   = +1 if CAST('0x'||substr(md5(word||'#fs<seed>'),1,2) AS
    BIGINT) % 2 = 0 else -1.

    Reference parity: the reference has no featurizer (categoricals must
    be pre-encoded upstream, temporal_data_loader.py:104-111); this is
    the engine-side encoder that produces those numeric columns.
    """
    if n_buckets < 1:
        raise DataFrameValidationError("hashed_features: n_buckets must be >= 1")
    if id_col not in df.columns or text_col not in df.columns:
        raise DataFrameValidationError(
            f"hashed_features: missing column {id_col!r} or {text_col!r}"
        )
    words = (
        df.select(F.col(id_col).alias("id"), _norm_words(text_col).alias("_w"))
        .select("id", F.explode("_w").alias("word"))
        .filter(F.col("word") != "")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col("word"), F.lit(f"#fh{seed}"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(int(n_buckets)),
    ).cast("int")
    if signed:
        sign = F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("word"), F.lit(f"#fs{seed}"))), 1, 2
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    else:
        sign = F.lit(1.0)
    vec = (
        words.select("id", bucket.alias("bucket"), sign.alias("_s"))
        .groupBy("id", "bucket")
        .agg(F.sum("_s").alias("_v"))
        .filter(F.col("_v") != 0.0)
    )
    if not l2_normalize:
        return vec.select(
            F.col("id").alias(id_col), "bucket", F.col("_v").alias("value")
        )
    norms = vec.groupBy("id").agg(F.sqrt(F.sum(F.col("_v") * F.col("_v"))).alias("_n"))
    return vec.join(norms, "id").select(
        F.col("id").alias(id_col),
        "bucket",
        F.round(F.col("_v") / F.col("_n"), 6).alias("value"),
    )
