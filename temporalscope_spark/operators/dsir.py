"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents whose hashed n-gram feature distribution
looks like a small trusted TARGET corpus (the Wikipedia/books slot in the
paper): estimate bucketed feature distributions for target and raw,
score every raw doc by the summed log importance ratio of its features,
keep the top of the ranking. The entire method is counts + joins — a
natural two-aggregation Spark pipeline with no model artifact.

Engine-portability contract: feature buckets come from the first 8 hex
chars of ``md5(gram)`` (the same portable map entity_split uses —
xxhash64 has no DuckDB twin), per-doc sums are sorted-bucket left folds,
and selection ranks the ROUNDED score (round 6) with doc-id tie-break so
the top-k boundary is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import SPAN_SEP, _parallelize_before_explode


def _gram_stream(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """One row per unigram + adjacent-bigram of the normalized text
    (bigrams joined with the unit separator so tuples never alias),
    column ``_g``, alongside ``keep`` columns. The word array is
    projected to a real column FIRST — the no-CSE-across-HOF-boundaries
    pitfall (corpus_stats._norm_words)."""
    w = F.col("_w")
    bis = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                SPAN_SEP, F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.when(
        F.element_at(w, 1) == "", F.array().cast("array<string>")
    ).otherwise(F.concat(w, bis))
    return _parallelize_before_explode(
        df.select(*keep, _norm_words(text_col).alias("_w"))
    ).select(*keep, F.explode(grams).alias("_g"))


def _bucket(gram, n_buckets: int):
    """Portable uniform bucket: first 8 md5 hex chars as a 32-bit int,
    mod n_buckets. DuckDB replay:
    ``CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % B``."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, bucket, tf): per-doc hashed unigram+bigram bucket counts.

    Expression-only gram construction → one explode → one hash aggregate
    (map-side combinable; the bucket space is bounded, so partials are
    tiny). This is DSIR's feature extractor and is reused for both the
    distribution estimates and the per-doc scoring pass.
    """
    if n_buckets <= 0:
        raise DataFrameValidationError("n_buckets must be > 0")
    g = _gram_stream(df, text_col, id_col)
    return g.groupBy(id_col, _bucket(F.col("_g"), n_buckets).alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """Score every raw doc by its DSIR log importance ratio and flag the
    top-``k``.

    ``lambda_b = ln((ct_b + s)/(Tt + sB)) - ln((cr_b + s)/(Tr + sB))``
    (add-``s`` smoothed bucket log-ratios, target over raw);
    ``logratio(doc) = Σ_b tf_b · lambda_b`` as a sorted-bucket fold.

    Plan shape: two bounded bucket-count aggregations (B rows each — the
    λ table is ≤ n_buckets rows, always broadcastable) → broadcast join
    onto the per-doc features → per-doc fold → one global rank to flag
    the top-k. Zero-feature docs (empty text) carry no evidence: they
    sort last and are never selected — otherwise their 0.0 score would
    out-rank every real doc, since DSIR sums are typically negative.
    The rank sorts (rounded score, doc id) — at 100 TB you
    would replace the exact rank with an approx-quantile threshold on the
    score (one extra aggregation) and keep everything else; the exact
    rank is the oracle lane.

    Output: (id, n_feats, logratio, selected).
    """
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    if smoothing <= 0.0:
        raise DataFrameValidationError("smoothing must be > 0")
    s = float(smoothing)
    b = float(n_buckets)

    from pyspark import StorageLevel

    # the feature table branches: it feeds the raw distribution estimate
    # AND the per-doc scoring join — persist so the gram explode + md5
    # bucketing runs once (the _shingle_table pattern, dedup.py)
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cr = feats.groupBy("bucket").agg(F.sum("tf").alias("_cr"))
    ct = (
        _gram_stream(target, text_col)
        .groupBy(_bucket(F.col("_g"), n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    tr = cr.agg(F.sum("_cr").cast("double").alias("_Tr"))
    tt = ct.agg(F.coalesce(F.sum("_ct"), F.lit(0)).cast("double").alias("_Tt"))
    lam = (
        cr.join(ct, "bucket", "left")
        .join(F.broadcast(tr))
        .join(F.broadcast(tt))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("_ct", F.lit(0)).cast("double") + F.lit(s))
                    / (F.col("_Tt") + F.lit(s * b))
                )
                - F.log(
                    (F.col("_cr").cast("double") + F.lit(s))
                    / (F.col("_Tr") + F.lit(s * b))
                )
            ).alias("_lam"),
        )
    )
    per = (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("bucket", "tf", "_lam"))).alias(
                "_arr"
            ),
            F.sum("tf").cast("long").alias("_n"),
        )
        .select(
            id_col,
            "_n",
            F.round(
                F.aggregate(
                    "_arr",
                    F.lit(0.0),
                    lambda acc, x: acc + x["tf"].cast("double") * x["_lam"],
                ),
                6,
            ).alias("_lr"),
        )
    )
    ranked = (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("_lr", F.lit(0.0)).alias("logratio"),
        )
        .withColumn(
            "selected",
            (F.col("n_feats") > 0)
            & (
                F.row_number().over(
                    Window.orderBy(
                        (F.col("n_feats") > 0).desc(),
                        F.col("logratio").desc(),
                        F.col(id_col),
                    )
                )
                <= k
            ),
        )
    )
    return ranked
