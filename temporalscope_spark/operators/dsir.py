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

from temporalscope_spark.core.caching import hold
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
    exact: bool = True,
    relative_error: float = 0.005,
) -> DataFrame:
    """Score every raw doc by its DSIR log importance ratio and flag the
    top-``k``.

    ``lambda_b = ln((ct_b + s)/(Tt + sB)) - ln((cr_b + s)/(Tr + sB))``
    (add-``s`` smoothed bucket log-ratios, target over raw);
    ``logratio(doc) = Σ_b tf_b · lambda_b`` as a sorted-bucket fold.

    Plan shape: two bounded bucket-count aggregations (B rows each — the
    λ table is ≤ n_buckets rows, always broadcastable) → broadcast join
    onto the per-doc features → per-doc fold → top-k flagging. Zero-
    feature docs (empty text) carry no evidence: they sort last and are
    never selected — otherwise their 0.0 score would out-rank every real
    doc, since DSIR sums are typically negative. Selection sorts
    (rounded score desc, doc id asc) in both lanes:

    * ``exact=True`` (oracle lane): one global ``row_number`` rank — a
      single-partition window, fine to ~10⁸ rows, NOT the 100 TB path.
    * ``exact=False`` (scale lane): approx-quantile threshold first — an
      ``approxQuantile`` probe (rel. error ``relative_error``) bounds a
      candidate set of ~``k + 2·err·N`` rows, verified by an exact count
      (``|{score ≥ t}| ≥ k  ⟺  t ≤ k-th score``, so candidates provably
      contain the true top-k regardless of the sketch's error; the probe
      widens and finally falls back to all positives if the count comes
      up short). The exact rank then runs only on the candidates via the
      quantile-bucket two-phase row numbering (``plans/rownum.py``) — no
      single-partition window anywhere, and the SELECTION IS IDENTICAL
      to the exact lane (same total order, candidate set ⊇ top-k), so
      both lanes share one oracle and the output stays
      partition-invariant.

    Caching: the scale lane persists the scored table for its bounded
    count/quantile probes; the returned plan also reads it (and the
    per-doc feature table in both lanes) — release with
    :func:`temporalscope_spark.core.caching.release` after the terminal
    action.

    Output: (id, n_feats, logratio, selected).
    """
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    if smoothing <= 0.0:
        raise DataFrameValidationError("smoothing must be > 0")
    if not (0.0 < relative_error < 0.5):
        raise DataFrameValidationError("relative_error must be in (0, 0.5)")
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
    scored = (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("_lr", F.lit(0.0)).alias("logratio"),
        )
    )
    if exact:
        return hold(
            scored.withColumn(
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
            ),
            feats,
        )

    # ---- scale lane: threshold-bounded candidates + bucketed exact rank
    from temporalscope_spark.plans.rownum import with_global_row_number

    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    pos = scored.filter(F.col("n_feats") > 0)
    n_pos = pos.count()
    # scored is materialized; the feature table's blocks are no longer
    # needed by any downstream plan node — release them here (ADVICE r4)
    feats.unpersist()
    if n_pos <= k:
        return hold(
            scored.withColumn("selected", F.col("n_feats") > 0), scored
        )
    err = float(relative_error)
    cand = None
    margin = err
    for _ in range(4):
        p = max(0.0, 1.0 - float(k) / float(n_pos) - margin)
        t0 = pos.stat.approxQuantile("logratio", [p], err)[0]
        c = pos.filter(F.col("logratio") >= F.lit(float(t0)))
        # exact count check: |{score >= t0}| >= k  <=>  t0 <= k-th score,
        # so a passing candidate set provably contains the true top-k
        if c.count() >= k:
            cand = c
            break
        margin *= 4.0
    if cand is None:
        cand = pos
    # no materialize_input: ``cand`` filters the already-persisted scored
    # table, so the three passes re-read cache — a checkpoint only adds
    # a copy job (measured +0.4s at sf0.1)
    ranked = with_global_row_number(
        cand.withColumn("_negl", -F.col("logratio")),
        ["_negl", id_col],
        "_rn",
    )
    sel = ranked.filter(F.col("_rn") <= k).select(id_col, F.lit(True).alias("_sel"))
    out = scored.join(sel, id_col, "left").select(
        id_col,
        "n_feats",
        "logratio",
        F.coalesce("_sel", F.lit(False)).alias("selected"),
    )
    return hold(out, scored)
