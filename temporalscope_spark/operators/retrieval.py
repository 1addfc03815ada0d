"""Lexical retrieval scoring: BM25 over the normalized word stream.

The retrieval half of a RAG corpus pipeline (:func:`text.chunk_documents`
makes the passages; this ranks them). Everything is relational and
engine-replicable:

  * corpus statistics (N, avg doc length) and per-term document frequencies
    fold in ONE aggregation — a handful of scalars to the driver;
  * scoring joins the exploded (doc, word) count table against the tiny
    broadcast term table — per-(doc, term) work only for MATCHING terms
    (a non-matching term contributes exactly 0 to BM25), so the plan is
    a map-side-combinable word count + one broadcast join + one per-doc
    sum: no full-corpus scoring pass, no UDFs;
  * ordering is on the ROUNDED score (6 dp) with a doc-id tie-break, so
    the top-k boundary is reproducible bit-for-bit across engines (two
    engines may disagree in the last ulp of a float sum; they cannot
    disagree after rounding that both sides apply).

BM25 (Robertson/Sparck Jones, the +0.5 smoothed variant):

    idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score(d, q) = Σ_{t ∈ q}  idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 against ``query_terms``.

    Returns (id, score) for the k best MATCHING documents (docs sharing no
    query term score exactly 0 and are excluded — they are unranked ties),
    ordered by (round(score, 6) desc, id). One stats aggregation, one word
    count shuffle, one broadcast join, one per-doc sum, one top-k.
    """
    if not query_terms:
        raise DataFrameValidationError("query_terms must be non-empty")
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    terms = sorted(set(query_terms))

    base = df.select(F.col(id_col).alias("_id"), _norm_words(text_col).alias("_w"))
    # doc length counts every word; blank docs have dl 0 (split('')=[''] guard)
    base = base.withColumn(
        "_dl",
        F.when(F.array_join(F.col("_w"), "") == "", F.lit(0)).otherwise(
            F.size(F.col("_w"))
        ).cast("double"),
    )

    # ONE aggregation: N, avgdl, df_t for every query term
    stat_aggs = [F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")]
    for i, t in enumerate(terms):
        stat_aggs.append(
            F.sum(F.array_contains(F.col("_w"), t).cast("int")).alias(f"_df{i}")
        )
    st = base.agg(*stat_aggs).first()
    n_docs = float(st["_n"])
    avgdl = float(st["_avgdl"] or 0.0) or 1.0
    idf = {
        t: math.log((n_docs - float(st[f"_df{i}"]) + 0.5) / (float(st[f"_df{i}"]) + 0.5) + 1.0)
        for i, t in enumerate(terms)
    }

    spark = df.sparkSession
    term_tbl = spark.createDataFrame(
        [(t, idf[t]) for t in terms], "word string, _idf double"
    )
    counts = (
        base.select("_id", "_dl", F.explode("_w").alias("word"))
        .groupBy("_id", "_dl", "word")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .join(F.broadcast(term_tbl), "word")
    )
    contrib = F.col("_idf") * (
        F.col("_tf") * (k1 + 1.0)
    ) / (F.col("_tf") + F.lit(k1) * (1.0 - b + b * F.col("_dl") / F.lit(avgdl)))
    scored = counts.groupBy("_id").agg(F.round(F.sum(contrib), 6).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("_id"))
        .limit(k)
        .select(F.col("_id").alias(id_col), "score")
    )


# --------------------------------------------------- persisted postings
def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materialize the relational BM25 index for a corpus — the amortized
    artifact a repeated-query (RAG retrieval) workload persists once so the
    per-query marginal cost is a broadcast join over matched postings, not
    a corpus scan (VERDICT r3 #3).

    Returns three tables (persist all three; parquet or a SnapshotTable):

      * ``postings`` (word, id, tf, dl) — term frequencies with the doc
        length DENORMALIZED onto each row, so scoring needs no join back
        to a per-doc table;
      * ``stats`` — ONE row (n_docs, avgdl) over all docs (blank docs
        count toward both, matching :func:`bm25_topk`);
      * ``termdf`` (word, df) — per-term document frequency.

    Empty-string words (the ``split('') == ['']`` artifact of blank docs)
    are excluded from postings/termdf — no query term is '' so scores are
    unaffected; dl still counts them via the same guard bm25_topk uses.
    """
    base = df.select(F.col(id_col).alias("id"), _norm_words(text_col).alias("_w"))
    base = base.withColumn(
        "dl",
        F.when(F.array_join(F.col("_w"), "") == "", F.lit(0)).otherwise(
            F.size(F.col("_w"))
        ).cast("double"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    postings = (
        base.select("id", "dl", F.explode("_w").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("word", "id", "tf", "dl")
    )
    # (word, id) is unique in postings, so df is a plain count
    termdf = postings.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return postings, stats, termdf


def bm25_topk_multi(
    postings: DataFrame,
    stats: DataFrame,
    termdf: DataFrame,
    queries: DataFrame,
    query_id_col: str = "query_id",
    term_col: str = "word",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score MANY queries in one pass over the persisted postings index.

    ``queries`` is (query_id, word) rows — benchmark/query-log sized, so it
    broadcasts. Plan: the (query, term) pairs join the termdf table for
    idf (broadcast — one map-side pass over the vocabulary), the matched
    (query, term, idf) set broadcasts into ONE scan of the postings table,
    per-(query, doc) contributions sum, and a per-query window top-k
    (WindowGroupLimit) keeps k rows per query. The corpus text is never
    touched; per-query marginal cost is the matched-postings join, shared
    across the whole batch.

    Scores are identical to per-query :func:`bm25_topk` calls (same
    formula, same rounded ordering) — pinned by tests.
    """
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    st = stats.first()
    n_docs = float(st["n_docs"])
    avgdl = float(st["avgdl"] or 0.0) or 1.0

    qterms = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(term_col).alias("word")
    ).distinct()
    qidf = termdf.join(F.broadcast(qterms), "word").select(
        "_qid",
        "word",
        (
            F.log(
                (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
        ).alias("_idf"),
    )
    matched = postings.join(F.broadcast(qidf), "word")
    contrib = F.col("_idf") * (
        F.col("tf") * (k1 + 1.0)
    ) / (F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    scored = matched.groupBy("_qid", "id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy("_qid").orderBy(F.col("score").desc(), F.col("id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "score",
        )
    )


# ----------------------------------------------- persisted postings index
class PostingsIndex:
    """Persisted BM25 postings artifact with incremental append — the
    dedup-index lifecycle applied to retrieval (VERDICT r4 #7).

    Three append-only SnapshotTables under ``path``:

      * ``postings/`` (word, id, tf, dl) — one commit per ingested batch;
      * ``termdf/``   (word, df)         — PER-BATCH partial document
        frequencies; the read-time view aggregates them (vocabulary-sized
        rows per batch — never a postings rescan);
      * ``stats/``    (n_docs, sum_dl)   — one partial row per batch.

    Appending a batch is batch-sized work: one :func:`build_postings`
    pass over the NEW docs only; the corpus-resident postings never move
    or re-shuffle. Batches must contain only NEW doc ids (retrieval
    corpora are add-only here; updates/deletes are a compaction concern,
    as in the reference Iceberg model) — under that contract per-batch
    df partials sum to exactly the full-corpus df, so an index built
    v0+increments scores bit-identically to one built in one shot
    (pinned by tests and the ``bm25_incremental`` driver oracle).

    Commits are tagged with ``batch_id`` meta when supplied, making
    replayed appends idempotent (the ``DedupIndex`` contract): commit
    order is postings → termdf → stats, each skipped if its table
    already carries the batch tag.
    """

    _BKEY = "postings_batch_id"

    def __init__(self, path: str):
        import os

        from temporalscope_spark.datasets.snapshots import SnapshotTable

        self.path = path
        self.postings = SnapshotTable(os.path.join(path, "postings"))
        self.termdf = SnapshotTable(os.path.join(path, "termdf"))
        self.stats = SnapshotTable(os.path.join(path, "stats"))

    @classmethod
    def create(
        cls,
        path: str,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "PostingsIndex":
        idx = cls(path)
        if idx.postings.current_version() is not None:
            raise DataFrameValidationError(
                f"postings index already exists at {path}"
            )
        idx.append_batch(docs, text_col=text_col, id_col=id_col, batch_id=None)
        return idx

    def append_batch(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        batch_id=None,
    ) -> None:
        """Ingest one batch of NEW docs: batch-sized postings build, three
        appends. With ``batch_id`` set, a replayed call completes partial
        progress instead of double-committing."""
        meta = {self._BKEY: batch_id} if batch_id is not None else None
        if (
            batch_id is not None
            and self.stats.version_with_meta(self._BKEY, batch_id) is not None
        ):
            return  # fully committed (stats is the LAST commit in order)
        postings, stats, termdf = build_postings(docs, text_col, id_col)
        partial = stats.select(
            F.col("n_docs").cast("long"),
            (F.col("n_docs") * F.coalesce(F.col("avgdl"), F.lit(0.0))).alias(
                "sum_dl"
            ),
        )
        if not (
            batch_id is not None
            and self.postings.version_with_meta(self._BKEY, batch_id) is not None
        ):
            self.postings.write(postings, mode="append", meta=meta)
        if not (
            batch_id is not None
            and self.termdf.version_with_meta(self._BKEY, batch_id) is not None
        ):
            self.termdf.write(termdf, mode="append", meta=meta)
        self.stats.write(partial, mode="append", meta=meta)

    def read(self, spark) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(postings, stats, termdf) exactly as :func:`bm25_topk_multi`
        consumes them — partials folded: df summed per word, avgdl =
        Σ sum_dl / Σ n_docs."""
        postings = self.postings.read(spark)
        termdf = self.termdf.read(spark).groupBy("word").agg(
            F.sum("df").alias("df")
        )
        stats = self.stats.read(spark).agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (F.sum("sum_dl") / F.sum("n_docs").cast("double")).alias("avgdl"),
        )
        return postings, stats, termdf


def query_likelihood_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    mu: float = 2000.0,
) -> DataFrame:
    """Top-k documents by the Dirichlet-smoothed query-likelihood language
    model (Zhai & Lafferty, SIGIR 2001) — the LM-retrieval counterpart to
    :func:`bm25_topk`:

        log p(q|d) = SUM_w  qtf_w * ln( (tf_wd + mu*p(w|C)) / (dl_d + mu) )

    with the collection model ``p(w|C) = cf_w / |C|`` (collection term
    frequency over total tokens). Query terms with multiplicity count via
    qtf; terms absent from the ENTIRE collection have p(w|C) = 0 and an
    undefined log — they are dropped from the query (the standard
    convention; documented, not silent: an all-OOV query raises).

    Ranking restricts to documents matching >= 1 surviving query term (a
    no-match document's score is the doc-length-only floor — unranked
    ties, exactly the bm25_topk exclusion convention). The FULL
    log-likelihood is returned, matched terms via the posting rows and
    unmatched terms via the per-doc smoothing floor, so scores are true
    log-probabilities and the oracle replays them exactly.

    Plan: ONE collection aggregation (|C| plus cf_w for each query term —
    a handful of scalars to the driver), one word-count shuffle over
    matching docs, one broadcast term join, one per-doc sum. Scores round
    to 6; order (score desc, id).
    """
    if not query_terms:
        raise DataFrameValidationError("query_terms must be non-empty")
    if k <= 0:
        raise DataFrameValidationError("k must be > 0")
    if mu <= 0:
        raise DataFrameValidationError("mu must be > 0")

    qtf: dict[str, int] = {}
    for t in query_terms:
        qtf[t] = qtf.get(t, 0) + 1
    terms = sorted(qtf)

    base = df.select(F.col(id_col).alias("_id"), _norm_words(text_col).alias("_w"))
    base = base.withColumn(
        "_dl",
        F.when(F.array_join(F.col("_w"), "") == "", F.lit(0)).otherwise(
            F.size(F.col("_w"))
        ).cast("double"),
    )

    # ONE aggregation: |C| and the collection frequency of each query term
    # (per-row tf via size(filter(words)) — no explode for the stats pass)
    def _eq(term):
        # single-arg lambda factory: a 2-param lambda would make pyspark
        # bind the ARRAY INDEX to the second parameter
        return lambda x: x == F.lit(term)

    cf_aggs = [F.sum("_dl").alias("_ctot")]
    for i, t in enumerate(terms):
        cf_aggs.append(
            F.sum(F.size(F.filter(F.col("_w"), _eq(t)))).alias(f"_cf{i}")
        )
    st = base.agg(*cf_aggs).first()
    c_total = float(st["_ctot"] or 0.0)
    if c_total <= 0:
        raise DataFrameValidationError(
            "query_likelihood_topk: empty collection"
        )
    pc = {
        t: float(st[f"_cf{i}"] or 0) / c_total
        for i, t in enumerate(terms)
        if float(st[f"_cf{i}"] or 0) > 0
    }
    if not pc:
        raise DataFrameValidationError(
            "query_likelihood_topk: every query term is out of collection"
        )
    q_len = float(sum(qtf[t] for t in pc))  # surviving query length

    spark = df.sparkSession
    term_tbl = spark.createDataFrame(
        [(t, float(qtf[t]), pc[t]) for t in sorted(pc)],
        "word string, _qtf double, _pc double",
    )
    counts = (
        base.select("_id", "_dl", F.explode("_w").alias("word"))
        .groupBy("_id", "_dl", "word")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .join(F.broadcast(term_tbl), "word")
    )
    # matched term:   qtf * ln(tf + mu*pc)   (denominator folded below)
    # every term:     - qtf * ln(dl + mu)    -> -q_len * ln(dl + mu)
    # unmatched term: qtf * ln(mu*pc)        -> added via the constant
    #                 SUM_w qtf*ln(mu*pc_w) minus the matched terms' own
    #                 floor, i.e. matched contribution is
    #                 qtf * ln( (tf + mu*pc) / (mu*pc) )
    const = sum(qtf[t] * math.log(mu * pc[t]) for t in sorted(pc))
    lift = F.col("_qtf") * F.log(
        (F.col("_tf").cast("double") + F.lit(mu) * F.col("_pc"))
        / (F.lit(mu) * F.col("_pc"))
    )
    scored = counts.groupBy("_id", "_dl").agg(F.sum(lift).alias("_lift"))
    score = (
        F.col("_lift")
        + F.lit(const)
        - F.lit(q_len) * F.log(F.col("_dl") + F.lit(mu))
    )
    return (
        scored.select(
            F.col("_id").alias(id_col), F.round(score, 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
