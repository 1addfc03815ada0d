"""Retrieval-ranking evaluation (nDCG@k, MRR@k, AP@k) and
reciprocal-rank fusion (Cormack et al. 2009).

The engine produces ranked lists (BM25 single- and multi-query, cosine
top-k, inverted-index TF-IDF pairs); closing the retrieval story needs
the standard evaluation battery over a (query, doc, graded-rel) qrels
table, plus the rank-fusion combinator that merges heterogeneous
rankers without score calibration.

Plan shapes (all 100 TB-safe):

* every window is partitioned BY QUERY — runs are top-k-bounded ranked
  lists per query, so no partition is ever data-sized and there is no
  global window anywhere;
* metric sums (DCG, AP numerator, RRF) fold over rank-ordered collected
  lists (≤ k elements by construction) — the package's sorted-fold
  idiom, making float accumulation order-deterministic and hence
  exactly replayable by the DuckDB oracle;
* the qrels side aggregates once per query (ideal-DCG ranks, relevant
  counts) and joins back on the query key.

Definitions (TREC conventions):

* ``rank`` = 1-based position by (score DESC, doc ASC) — deterministic
  tie-break;
* ``DCG@k = Σ_{rank≤k} (2^rel − 1) / log2(rank + 1)``; ``IDCG@k`` is
  the same over the query's judged rels sorted descending;
  ``nDCG = DCG/IDCG`` (0 when the query has no positive judgment);
* ``MRR@k`` = 1/rank of the first retrieved doc with rel > 0, 0 if
  none in the top k;
* ``AP@k = (Σ_{rank≤k, rel>0} precision@rank) / min(R, k)`` with R =
  the query's total positive-judgment count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _sorted_fold(col: str) -> F.Column:
    """Order-deterministic double sum: fold a collected (ord, term)
    struct list in ord order (the sorted-fold idiom from lm.py)."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("_ord"), F.col(col).alias("_t")))),
        F.lit(0.0),
        lambda acc, x: acc + x["_t"],
    )


def ranking_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query nDCG@k, MRR@k and AP@k of a run table against graded
    qrels.

    ``runs``: (query, doc, score) ranked candidates (any order — ranks
    are derived here). ``qrels``: (query, doc, rel ≥ 0 int); unjudged
    retrieved docs count rel = 0. Queries present in ``runs`` are
    returned; a query with no positive judgment scores 0 on all three.

    Output: (query, ndcg, mrr, ap) — rounded to 6.
    """
    if k < 1:
        raise DataFrameValidationError("k must be >= 1")
    for c, df_, name in (
        (query_col, runs, "runs"),
        (doc_col, runs, "runs"),
        (score_col, runs, "runs"),
        (query_col, qrels, "qrels"),
        (doc_col, qrels, "qrels"),
        (rel_col, qrels, "qrels"),
    ):
        if c not in df_.columns:
            raise DataFrameValidationError(f"missing column {c!r} in {name}")

    r = runs.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(score_col).cast("double").alias("s"),
    )
    qr = qrels.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rel_col).cast("double").alias("rel"),
    )
    w = Window.partitionBy("q").orderBy(F.col("s").desc(), F.col("d"))
    ranked = (
        r.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(qr, ["q", "d"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0.0)))
    )
    wc = Window.partitionBy("q").orderBy("rank")
    ranked = ranked.withColumn(
        "_cumrel", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(wc)
    )
    gain = (F.pow(F.lit(2.0), "rel") - 1.0) / F.log2(F.col("rank") + 1.0)
    prec = F.when(
        F.col("rel") > 0, F.col("_cumrel").cast("double") / F.col("rank")
    ).otherwise(F.lit(0.0))
    per_run = (
        ranked.withColumn("_ord", F.col("rank"))
        .withColumn("_gain", gain)
        .withColumn("_prec", prec)
        .groupBy("q")
        .agg(
            _sorted_fold("_gain").alias("_dcg"),
            _sorted_fold("_prec").alias("_apnum"),
            F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_frank"),
        )
    )
    wi = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("d"))
    ideal = (
        qr.withColumn("_ord", F.row_number().over(wi))
        .filter((F.col("_ord") <= k) & (F.col("rel") > 0))
        .withColumn(
            "_g", (F.pow(F.lit(2.0), "rel") - 1.0) / F.log2(F.col("_ord") + 1.0)
        )
        .groupBy("q")
        .agg(_sorted_fold("_g").alias("_idcg"))
    )
    npos = qr.filter(F.col("rel") > 0).groupBy("q").agg(
        F.count(F.lit(1)).alias("_npos")
    )
    out = (
        per_run.join(ideal, "q", "left")
        .join(npos, "q", "left")
        .select(
            F.col("q").alias(query_col),
            (
                F.round(
                    F.when(
                        F.coalesce("_idcg", F.lit(0.0)) > 0,
                        F.col("_dcg") / F.col("_idcg"),
                    ).otherwise(F.lit(0.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("ndcg"),
            (
                F.round(
                    F.coalesce(F.lit(1.0) / F.col("_frank"), F.lit(0.0)), 6
                )
                + F.lit(0.0)
            ).alias("mrr"),
            (
                F.round(
                    F.when(
                        F.coalesce("_npos", F.lit(0)) > 0,
                        F.col("_apnum")
                        / F.least(F.col("_npos"), F.lit(k)).cast("double"),
                    ).otherwise(F.lit(0.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("ap"),
        )
    )
    return out


def rrf_fuse(
    runs: dict[str, DataFrame],
    query_col: str = "query",
    doc_col: str = "doc_id",
    score_col: str = "score",
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of named runs:
    ``rrf(d) = Σ_runs 1 / (c + rank_run(d))`` (Cormack et al. 2009,
    c = 60), then the top k per query by (rrf DESC, doc) — the
    calibration-free way to merge lexical + dense rankers.

    Plan shape: each run ranks inside its own per-query window, the
    union groups on (query, doc) — ONE shuffle of rank rows (top-k-
    bounded per query per run) — and the fold over the ≤|runs| per-doc
    contributions is run-name-ordered, so the float sum is
    deterministic. The final top-k is again a per-query window
    (WindowGroupLimit).

    Output: (query, doc, rrf, rank).
    """
    if not runs:
        raise DataFrameValidationError("runs must be a non-empty dict")
    if c < 1 or k < 1:
        raise DataFrameValidationError("c and k must be >= 1")
    parts = []
    for name, df_ in runs.items():
        for col in (query_col, doc_col, score_col):
            if col not in df_.columns:
                raise DataFrameValidationError(
                    f"missing column {col!r} in run {name!r}"
                )
        w = Window.partitionBy("q").orderBy(F.col("s").desc(), F.col("d"))
        parts.append(
            df_.select(
                F.col(query_col).alias("q"),
                F.col(doc_col).alias("d"),
                F.col(score_col).cast("double").alias("s"),
            )
            .withColumn("rank", F.row_number().over(w))
            .select("q", "d", F.lit(name).alias("_ord"), "rank")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.withColumn("_c", F.lit(1.0) / (F.lit(float(c)) + F.col("rank")))
        .groupBy("q", "d")
        .agg(_sorted_fold("_c").alias("_rrf"))
    )
    wk = Window.partitionBy("q").orderBy(F.col("_rrf").desc(), F.col("d"))
    return (
        fused.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q").alias(query_col),
            F.col("d").alias(doc_col),
            (F.round("_rrf", 6) + F.lit(0.0)).alias("rrf"),
            "rank",
        )
    )


def rank_biased_overlap(
    runs_a: DataFrame,
    runs_b: DataFrame,
    query_col: str = "query",
    doc_col: str = "doc_id",
    score_col: str = "score",
    p: float = 0.9,
    k: int = 10,
) -> DataFrame:
    """Rank-biased overlap of two ranked lists per query (Webber,
    Moffat & Zobel 2010): the top-weighted, qrel-free similarity
    ``RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_{1..d} ∩ B_{1..d}| / d``
    — how much two rankers agree, emphasising early ranks (p≈0.9 puts
    ~86% of the weight in the top 10). This is the truncated base form
    (no extrapolation residual), in [0, 1 − p^k·…]; identical prefixes
    of length ≥ k score the maximal truncated value.

    Plan shape: rank both runs inside per-query windows, inner-join on
    (query, doc) to get each shared doc's entry depth
    ``max(rank_a, rank_b)`` (a doc enters the prefix intersection
    exactly at that depth), then ONE per-query fold over the k depths
    accumulates ``p^{d-1}·X_d/d`` with the overlap counts recovered from
    the sorted entry-depth list — all bounded by k per query, windows
    partitioned BY QUERY only.

    Output: (query, rbo) — rounded to 6.
    """
    if not (0.0 < p < 1.0):
        raise DataFrameValidationError("p must be in (0, 1)")
    if k < 1:
        raise DataFrameValidationError("k must be >= 1")

    def _ranked(df_: DataFrame, rank_name: str) -> DataFrame:
        for c in (query_col, doc_col, score_col):
            if c not in df_.columns:
                raise DataFrameValidationError(f"missing column {c!r}")
        w = Window.partitionBy("q").orderBy(F.col("s").desc(), F.col("d"))
        return (
            df_.select(
                F.col(query_col).alias("q"),
                F.col(doc_col).alias("d"),
                F.col(score_col).cast("double").alias("s"),
            )
            .withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= k)
            .select("q", "d", rank_name)
        )

    a = _ranked(runs_a, "ra")
    b = _ranked(runs_b, "rb")
    # entry depth of each shared doc; queries present in A keep a row
    # even with zero overlap (rbo 0)
    entries = a.join(b, ["q", "d"]).select(
        "q", F.greatest("ra", "rb").alias("e")
    )
    depths = F.sequence(F.lit(1), F.lit(k))
    per = (
        a.select("q")
        .distinct()
        .join(
            entries.groupBy("q").agg(
                F.array_sort(F.collect_list("e")).alias("_es")
            ),
            "q",
            "left",
        )
        .withColumn(
            "_es", F.coalesce("_es", F.array().cast("array<int>"))
        )
    )
    # X_d = number of entry depths <= d; fold over d = 1..k
    rbo = F.aggregate(
        depths,
        F.lit(0.0),
        lambda acc, d: acc
        + F.pow(F.lit(float(p)), d.cast("double") - 1.0)
        * F.size(F.filter("_es", lambda e: e <= d)).cast("double")
        / d.cast("double"),
    ) * F.lit(1.0 - p)
    return per.select(
        F.col("q").alias(query_col),
        (F.round(rbo, 6) + F.lit(0.0)).alias("rbo"),
    )
