"""Unigram language-model scoring — the perplexity-style quality signal.

CCNet/RedPajama-class pipelines rank documents by language-model
perplexity and keep the head of the distribution. The distributed-friendly
first rung of that ladder is a unigram LM estimated from the corpus itself
(or a trusted reference corpus): two map-side-combinable aggregations and
one broadcast join — no trained model artifact, no Python in the hot path.

Determinism contract (oracle-exact): the per-document log-prob sum is a
LEFT-TO-RIGHT fold over the document's distinct words in SORTED word order
(``array_sort`` + ``F.aggregate``). A plain ``sum()`` over doubles is
order-nondeterministic across partitions/engines; the sorted fold makes the
float result reproducible bit-for-bit(-ish) in any engine that folds
left-to-right (DuckDB ``list_reduce`` replays it), so the driver oracle can
compare at 1e-6 without flakiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode


def unigram_counts(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
) -> DataFrame:
    """(word, n) unigram table over the normalized corpus.

    One explode + hash aggregate with map-side partial combine (hot words
    compress to one partial row per task). ``vocab_size`` keeps the top-V
    by (n desc, word) — the bounded-vocabulary lane that stays broadcastable
    at any corpus size (V·~30 bytes; 10⁵ words ≈ 3 MB); everything outside
    the kept vocabulary scores as OOV downstream.
    """
    words = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).select(F.explode("_w").alias("word")).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if vocab_size is not None:
        if vocab_size <= 0:
            raise DataFrameValidationError("vocab_size must be > 0")
        counts = counts.orderBy(F.col("n").desc(), "word").limit(vocab_size)
    return counts


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(w1, w2, n) adjacent-bigram table over the normalized corpus.

    Expression-only pair construction (``transform`` over ``sequence`` —
    no self-join of the word stream) followed by one map-side-combinable
    hash aggregate. ``top_k`` keeps the most frequent bigrams by
    (n desc, w1, w2) — the bounded table that stays broadcastable at any
    corpus size; everything outside it backs off to unigrams downstream,
    which is exactly Stupid Backoff's contract.
    """
    base = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).filter(F.element_at("_w", 1) != "")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_w") - 1),
        lambda i: F.struct(
            F.element_at("_w", i).alias("w1"),
            F.element_at("_w", i + 1).alias("w2"),
        ),
    )
    counts = (
        base.filter(F.size("_w") >= 2)
        .select(F.explode(pairs).alias("_p"))
        .groupBy(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is not None:
        if top_k <= 0:
            raise DataFrameValidationError("top_k must be > 0")
        counts = counts.orderBy(F.col("n").desc(), "w1", "w2").limit(top_k)
    return counts


def score_stupid_backoff(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document Stupid Backoff bigram score (Brants et al. 2007,
    "Large Language Models in Machine Translation" — the original
    MapReduce-distributed LM, built for exactly this count-table shape).

    Position scores: the first word scores ``ln(c(w1)/T)``; position t>=2
    scores ``ln(c(w_{t-1} w_t) / c(w_{t-1}))`` when the bigram is in the
    supplied table, else backs off to ``ln(alpha · c(w_t)/T)``. Unseen
    unigrams floor at count 1; the seen-bigram denominator floors at the
    bigram count (``c(w1 w2) ≤ c(w1)`` holds whenever the unigram table
    covers the bigram table's left words — the floor keeps a truncated
    unigram table from yielding positive "log-probabilities").
    ``xent = -(Σ scores)/L``; ``ppl = exp(xent)``. (Backoff scores are
    not normalized probabilities — that is Stupid Backoff's published
    trade: no discounting pass, so the whole model is two count tables.)

    Plan shape: per-doc positional pairs with a ``''`` sentinel first-row
    (``''`` cannot survive word normalization, so it cannot collide with a
    real word) → per-(doc, w1, w2) tf partial aggregate → broadcast LEFT
    joins against the bigram table and the unigram table (once on w1 for
    the denominator, once on w2 for backoff) → per-doc sorted-(w1, w2)
    fold, replayable by DuckDB ``list_reduce`` for the oracle. Wide
    exchanges are keyed on (doc, pair) only.

    Output: (id, n_words, xent_nats, ppl), floats rounded to 6.
    """
    if not (0.0 < alpha <= 1.0):
        raise DataFrameValidationError("alpha must be in (0, 1]")
    total = unigrams.agg(F.sum("n").cast("double").alias("_T"))
    base = _parallelize_before_explode(
        df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_w")),
        lambda i: F.struct(
            F.when(i == 1, F.lit("")).otherwise(F.element_at("_w", i - 1)).alias(
                "w1"
            ),
            F.element_at("_w", i).alias("w2"),
        ),
    )
    pos = (
        base.filter(F.element_at("_w", 1) != "")
        .select(id_col, F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    tf = pos.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_tf"))
    un1 = unigrams.select(F.col("word").alias("w1"), F.col("n").alias("_c1"))
    un2 = unigrams.select(F.col("word").alias("w2"), F.col("n").alias("_c2"))
    big = bigrams.select("w1", "w2", F.col("n").alias("_n12"))
    joined = (
        tf.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(un1), "w1", "left")
        .join(F.broadcast(un2), "w2", "left")
        .join(F.broadcast(total))
        .select(
            id_col,
            "w1",
            "w2",
            "_tf",
            F.when(F.col("w1") == "", F.log(F.coalesce("_c2", F.lit(1)).cast("double") / F.col("_T")))
            .when(
                F.col("_n12").isNotNull(),
                # denominator floored at the bigram count: c(w1 w2) <= c(w1)
                # whenever the unigram table covers the bigram table's left
                # words, but a truncated/mismatched unigram table must not
                # produce ln(n12/1) > 0 "probabilities" (ppl < 1)
                F.log(
                    F.col("_n12").cast("double")
                    / F.greatest(
                        F.coalesce("_c1", F.lit(1)), F.col("_n12")
                    ).cast("double")
                ),
            )
            .otherwise(
                F.log(
                    F.lit(float(alpha))
                    * F.coalesce("_c2", F.lit(1)).cast("double")
                    / F.col("_T")
                )
            )
            .alias("_s"),
        )
    )
    per = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("w1", "w2", "_tf", "_s"))).alias(
            "_arr"
        ),
        F.sum("_tf").cast("long").alias("_L"),
    )
    scored = per.select(
        id_col,
        "_L",
        (
            -F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, s: acc + s["_tf"].cast("double") * s["_s"],
            )
            / F.col("_L").cast("double")
        ).alias("_xent"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("_L", F.lit(0)).cast("long").alias("n_words"),
            F.round(F.coalesce("_xent", F.lit(0.0)), 6).alias("xent_nats"),
            F.round(F.exp(F.coalesce("_xent", F.lit(0.0))), 6).alias("ppl"),
        )
    )


def score_kneser_ney(
    df: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document interpolated Kneser–Ney bigram score (Kneser & Ney
    1995; the interpolated form and the 0.75 default follow Chen & Goodman
    1998's empirical study — the strongest classical n-gram smoother, the
    step up from Stupid Backoff when a real probability is wanted).

    The whole model derives from the ONE supplied bigram table (so a
    truncated top-K table stays internally consistent):

    * left marginal   ``c1(w1) = Σ_w2 c(w1 w2)``, ``nl(w1) = N1+(w1,·)``
    * continuation    ``r(w2) = N1+(·,w2)``, ``B = total bigram types``
    * ``Pcont(w2) = max(r(w2), 1) / B``   (unseen continuations floor at 1
      so ln stays finite — the same OOV convention as score_unigram)
    * seen context:   ``P(w2|w1) = max(c12 - d, 0)/c1
      + d · nl(w1)/c1 · Pcont(w2)``  (c12 = 0 when the pair is absent —
      the interpolation term carries it, never a zero probability)
    * unseen context (OOV / truncated-away w1) and the first position:
      ``P = Pcont(w2)``.

    ``xent = -(Σ tf · ln P)/L``; ``ppl = exp(xent)``. Everything is
    rational in integer counts, so DuckDB replays it exactly; the per-doc
    fold is sorted by (w1, w2) like the other LM scorers.

    Plan shape: identical to :func:`score_stupid_backoff` — positional
    pairs with the ``''`` sentinel first row, per-(doc, pair) tf partial
    aggregate, then broadcast LEFT joins against the three BOUNDED derived
    tables (left-marginal, continuation, 1-row type total). Cache the
    bigram table you pass in: it feeds three derivations plus the pair
    join, and each broadcast re-evaluates an uncached lineage.

    Output: (id, n_words, xent_nats, ppl), floats rounded to 6.
    """
    if not (0.0 < discount < 1.0):
        raise DataFrameValidationError("discount must be in (0, 1)")
    d = float(discount)
    left = bigrams.groupBy("w1").agg(
        F.sum("n").cast("double").alias("_c1"),
        F.count(F.lit(1)).cast("double").alias("_nl"),
    )
    cont = bigrams.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("_r"))
    types = bigrams.agg(F.count(F.lit(1)).cast("double").alias("_B"))

    base = _parallelize_before_explode(
        df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_w")),
        lambda i: F.struct(
            F.when(i == 1, F.lit("")).otherwise(F.element_at("_w", i - 1)).alias(
                "w1"
            ),
            F.element_at("_w", i).alias("w2"),
        ),
    )
    pos = (
        base.filter(F.element_at("_w", 1) != "")
        .select(id_col, F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    tf = pos.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_tf"))
    big = bigrams.select("w1", "w2", F.col("n").cast("double").alias("_n12"))
    pcont = F.greatest(F.coalesce("_r", F.lit(0.0)), F.lit(1.0)) / F.col("_B")
    joined = (
        tf.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(left), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .join(F.broadcast(types))
        .select(
            id_col,
            "w1",
            "w2",
            "_tf",
            F.when(
                (F.col("w1") != "") & F.col("_c1").isNotNull(),
                F.log(
                    F.greatest(
                        F.coalesce("_n12", F.lit(0.0)) - F.lit(d), F.lit(0.0)
                    )
                    / F.col("_c1")
                    + F.lit(d) * F.col("_nl") / F.col("_c1") * pcont
                ),
            )
            .otherwise(F.log(pcont))
            .alias("_s"),
        )
    )
    per = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("w1", "w2", "_tf", "_s"))).alias(
            "_arr"
        ),
        F.sum("_tf").cast("long").alias("_L"),
    )
    scored = per.select(
        id_col,
        "_L",
        (
            -F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, s: acc + s["_tf"].cast("double") * s["_s"],
            )
            / F.col("_L").cast("double")
        ).alias("_xent"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("_L", F.lit(0)).cast("long").alias("n_words"),
            F.round(F.coalesce("_xent", F.lit(0.0)), 6).alias("xent_nats"),
            F.round(F.exp(F.coalesce("_xent", F.lit(0.0))), 6).alias("ppl"),
        )
    )


def score_unigram(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram cross-entropy (nats/word) and perplexity.

    ``xent = -(1/L) · Σ_w tf_w · ln(c_w / T)`` with ``T = Σ n`` over the
    supplied LM table and OOV words floored at count 1 (so ln stays finite;
    with a truncated vocabulary every dropped word scores as a singleton).
    ``ppl = exp(xent)``; empty documents report (0, 0.0, 1.0) rather than
    being dropped.

    Plan shape: per-(doc, word) tf partial aggregate → broadcast LEFT join
    against the (bounded) LM table → per-doc sorted-fold rollup → one-row
    total broadcast-crossed in. The only wide exchanges are keyed on word
    and doc id; nothing is corpus × vocab.

    Output: (id, n_words, xent_nats, ppl), floats rounded to 6.
    """
    total = lm.agg(F.sum("n").cast("double").alias("_T"))
    words = _parallelize_before_explode(
        df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
    ).select(id_col, F.explode("_w").alias("word")).filter(F.col("word") != "")
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("_tf"))
    joined = tf.join(F.broadcast(lm), "word", "left").select(
        id_col,
        "word",
        "_tf",
        F.coalesce(F.col("n"), F.lit(1)).cast("double").alias("_c"),
    )
    per = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("word", "_tf", "_c"))).alias("_arr"),
        F.sum("_tf").cast("long").alias("_L"),
    )
    scored = per.join(F.broadcast(total)).select(
        id_col,
        "_L",
        (
            -F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, s: acc
                + s["_tf"].cast("double") * F.log(s["_c"] / F.col("_T")),
            )
            / F.col("_L").cast("double")
        ).alias("_xent"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("_L", F.lit(0)).cast("long").alias("n_words"),
            F.round(F.coalesce("_xent", F.lit(0.0)), 6).alias("xent_nats"),
            F.round(F.exp(F.coalesce("_xent", F.lit(0.0))), 6).alias("ppl"),
        )
    )


def ppl_buckets(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cuts: tuple[float, float] = (0.333333, 0.666667),
    approx: bool = False,
) -> DataFrame:
    """CCNet-style perplexity bucketing: label every document ``head`` /
    ``middle`` / ``tail`` by which side of the corpus perplexity quantile
    cuts it falls on (CCNet keeps the head — the low-perplexity third —
    as the highest-quality slice and typically drops the tail).

    ``approx=False`` (oracle lane): cut points are EXACT ``percentile``
    values of the rounded ppl over non-empty documents (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the same type-7
    equivalence token_quantiles relies on) — the executor buffers the
    value list, fine to ~10⁸ docs, NOT the 100 TB path.
    ``approx=True`` (scale lane): ``percentile_approx`` — a streaming
    constant-memory, map-side-combinable sketch whose rank error is
    bounded by 1/accuracy (accuracy 10⁴ → ≤0.01% rank error), so labels
    can differ from the exact lane only for documents within that sliver
    of the cut points (tested by bound, not by oracle).

    Plan shape: one scoring pass (persisted — it feeds the quantile
    aggregate AND the labeling projection; release the cache with
    :func:`temporalscope_spark.core.caching.release` after the terminal
    action), a 1-row cut-point aggregate broadcast-crossed in, one narrow
    label map. Output: (id, n_words, ppl, bucket).
    """
    if not (0.0 < cuts[0] < cuts[1] < 1.0):
        raise DataFrameValidationError("cuts must satisfy 0 < c1 < c2 < 1")
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    scored = score_unigram(df, lm, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pfn = F.percentile_approx if approx else F.percentile
    q = scored.filter(F.col("n_words") > 0).agg(
        pfn("ppl", F.lit(float(cuts[0]))).alias("_c1"),
        pfn("ppl", F.lit(float(cuts[1]))).alias("_c2"),
    )
    out = scored.join(F.broadcast(q)).select(
        id_col,
        "n_words",
        "ppl",
        F.when(F.col("n_words") == 0, F.lit("empty"))
        .when(F.col("ppl") <= F.col("_c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return hold(out, scored)


def doc_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the word distribution:
    ``H = −Σ_w (tf/L)·ln(tf/L)`` in nats — the classic repetitiveness /
    diversity signal (low entropy = templated or repetitive text; high
    entropy relative to length = natural prose). Complements the Gopher
    repetition ratios with an information-theoretic scalar.

    Plan shape: one positional word explode, one (doc, word) count
    aggregation, one per-doc word-ordered fold (the sorted-fold idiom —
    float accumulation is engine-deterministic). Empty docs score 0.

    Output: (id, n_words, entropy) — entropy rounded to 6.
    """
    words = _parallelize_before_explode(
        df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
    ).select(F.col(id_col), F.explode("_w").alias("word")).filter(
        F.col("word") != ""
    )
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("_tf"))
    per = (
        tf.withColumn("_ord", F.col("word"))
        .groupBy(id_col)
        .agg(
            F.sum("_tf").alias("_L"),
            F.array_sort(
                F.collect_list(F.struct("_ord", F.col("_tf").alias("_t")))
            ).alias("_terms"),
        )
    )
    # L is an exact integer sum, so the double is engine-identical; the
    # fold order is pinned by the word-sorted term list
    ent = F.aggregate(
        "_terms",
        F.lit(0.0),
        lambda acc, x: acc
        - (x["_t"].cast("double") / F.col("_L").cast("double"))
        * F.log(x["_t"].cast("double") / F.col("_L").cast("double")),
    )
    out = per.select(
        F.col(id_col),
        F.col("_L").cast("long").alias("n_words"),
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
    )
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def source_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-group KL divergence from the corpus word distribution,
    ``KL(P_group ‖ P_corpus) = Σ_w P_g(w)·ln(P_g(w)/P_c(w))`` over the
    bounded top-V corpus vocabulary — the source-drift diagnostic a
    mixture-curation pass reads before setting mixing weights (a source
    far from the corpus in KL is either a distinct domain or junk).

    Both distributions restrict to the SAME top-V vocabulary (corpus
    frequency order), so ``P_c(w) > 0`` everywhere and zero-count group
    terms contribute 0 — no smoothing needed. Plan shape: the corpus
    vocab aggregation (bounded, broadcast), one (group, word) count
    aggregation, one broadcast join, one per-group word-ordered fold.

    Output: (group, n_tokens, kl) — n_tokens = the group's in-vocab
    token count; kl rounded to 6.
    """
    if vocab_size <= 0:
        raise DataFrameValidationError("vocab_size must be > 0")
    vocab = unigram_counts(df, text_col, vocab_size=vocab_size)
    vt = vocab.agg(F.sum("n").alias("_T"))
    pc = vocab.crossJoin(F.broadcast(vt)).select(
        "word",
        (F.col("n").cast("double") / F.col("_T").cast("double")).alias("_pc"),
    )
    words = _parallelize_before_explode(
        df.select(F.col(group_col).alias("_g"), _norm_words(text_col).alias("_w"))
    ).select("_g", F.explode("_w").alias("word")).filter(F.col("word") != "")
    gtf = (
        words.join(F.broadcast(pc), "word")
        .groupBy("_g", "word")
        .agg(F.count(F.lit(1)).alias("_tf"), F.first("_pc").alias("_pc"))
    )
    per = gtf.groupBy("_g").agg(
        F.sum("_tf").alias("_L"),
        F.array_sort(
            F.collect_list(F.struct(F.col("word").alias("_ord"), "_tf", "_pc"))
        ).alias("_terms"),
    )
    kl = F.aggregate(
        "_terms",
        F.lit(0.0),
        lambda acc, x: acc
        + (x["_tf"].cast("double") / F.col("_L").cast("double"))
        * F.log(
            (x["_tf"].cast("double") / F.col("_L").cast("double")) / x["_pc"]
        ),
    )
    return per.select(
        F.col("_g").alias(group_col),
        F.col("_L").cast("long").alias("n_tokens"),
        (F.round(kl, 6) + F.lit(0.0)).alias("kl"),
    )


def good_turing_counts(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Good–Turing frequency re-estimation over the corpus unigram counts
    (Good 1953; the Gale & Sampson 1995 "simple" presentation): for each
    observed count r, with N_r = the number of DISTINCT words seen exactly
    r times and N = total tokens,

        r*      = (r + 1) * N_{r+1} / N_r      (NULL where N_{r+1} = 0)
        p_gt    = r* / N                        (per-word smoothed prob.)
        mass    = N_r * r  / N                  (raw probability mass at r)
        gt_mass = N_r * r* / N                  (smoothed mass at r)

    plus the leading r = 0 row carrying the unseen-event mass
    ``p0 = N_1 / N`` in ``gt_mass`` (the whole point of the estimator —
    how much probability the corpus owes to words it has never seen).

    Plan shape: the corpus collapses to the (word, n) unigram table (one
    map-side-combinable shuffle), then to the count-of-counts table —
    AT MOST as many rows as distinct count values (tiny: Zipfian corpora
    put it in the hundreds) — and r* is a self-join of that bounded table
    on r+1. Nothing after the unigram aggregation touches corpus-sized
    data. Output ordered by r, floats rounded to 6.
    """
    uni = unigram_counts(df, text_col)
    # bounded count-of-counts table + the 1-row total
    cc = uni.groupBy(F.col("n").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    tot = uni.agg(F.sum("n").alias("_N"))
    nxt = cc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_r1"))
    joined = (
        cc.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_rstar",
            (F.col("r") + 1).cast("double")
            * F.col("_n_r1").cast("double")
            / F.col("n_r").cast("double"),
        )
    )
    n_tot = F.col("_N").cast("double")
    body = joined.select(
        F.col("r").cast("long").alias("r"),
        F.col("n_r").cast("long").alias("n_r"),
        F.round("_rstar", 6).alias("r_star"),
        F.round(F.col("_rstar") / n_tot, 6).alias("p_gt"),
        F.round(F.col("n_r") * F.col("r").cast("double") / n_tot, 6).alias(
            "mass"
        ),
        F.round(F.col("n_r") * F.col("_rstar") / n_tot, 6).alias("gt_mass"),
    )
    # r = 0: unseen mass N_1 / N (n_r undefined -> NULL; mass 0 by definition)
    n1 = cc.filter(F.col("r") == 1).select(F.col("n_r").alias("_n1"))
    zero = (
        tot.join(F.broadcast(n1), F.lit(True), "left")
        .select(
            F.lit(0).cast("long").alias("r"),
            F.lit(None).cast("long").alias("n_r"),
            F.lit(None).cast("double").alias("r_star"),
            F.lit(None).cast("double").alias("p_gt"),
            F.lit(0.0).alias("mass"),
            F.round(
                F.coalesce(F.col("_n1"), F.lit(0)).cast("double")
                / F.col("_N").cast("double"),
                6,
            ).alias("gt_mass"),
        )
    )
    return zero.unionByName(body).orderBy("r")
