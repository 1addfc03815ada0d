"""Distribution-drift diagnostics between two temporal slices of a corpus.

Training-data pipelines re-ingest sources continuously; before a new slice
is mixed in, the standard pre-flight is a drift check of its feature
distributions against the reference slice the model/filters were tuned on
(population stability index for binned shift magnitude, two-sample
Kolmogorov–Smirnov for a binning-free supremum test). Both are classical
statistics (PSI: credit-scoring monitoring practice, see e.g. Yurdakul 2018
"Statistical properties of the population stability index"; KS: standard
two-sample test) — the engineering content here is the distributed plan:

* PSI is two aggregations (exact-percentile edges over the reference slice,
  then one fused per-bin count pass) — nothing wider than ``bins`` rows
  ever leaves the executors.
* KS needs a GLOBAL cumulative over the pooled distinct values; a naive
  ``Window.orderBy(v)`` collapses to one task, so the plan reuses the
  quantile-bucket two-phase cumulative (:func:`plans.rownum.with_global_cumsum`)
  — per-bucket parallel scans plus a driver prefix-sum of one partial per
  bucket. No single-partition window at any input size.

Determinism contract: PSI bin edges are quantized to 1e-6 BEFORE the bin
comparison (Spark ``percentile`` and DuckDB ``quantile_cont`` agree
structurally, but an unrounded edge that exactly equals a data value could
flip that value's bin on the last ulp); shares and terms are rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_EPS = 1e-6


def _split_flag(df: DataFrame, time_col: str, split) -> F.Column:
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    return F.col(time_col) < F.lit(split).cast(dt)


def psi_drift(
    df: DataFrame,
    value_col: str,
    time_col: str,
    split,
    bins: int = 10,
    approx: bool = False,
) -> DataFrame:
    """Population stability index of ``value_col`` across a time split.

    Rows with ``time_col < split`` form the REFERENCE slice; the rest are
    CURRENT. Bin edges are the reference slice's ``i/bins`` percentiles
    (interior edges only, so the outer bins are open-ended and every value
    lands somewhere); each slice's bin shares are floored at 1e-6 and the
    per-bin term is ``(p - q) * ln(p / q)``. ``PSI = Σ terms`` — the usual
    reading: <0.1 stable, 0.1–0.25 moderate shift, >0.25 action.

    ``approx=False`` (oracle lane): EXACT ``percentile`` edges (executor
    buffers the reference value list — fine to ~10⁸ rows, not the 100 TB
    path). ``approx=True`` (scale lane): ``percentile_approx`` sketch edges
    — constant memory, map-side-combinable; bin boundaries may move within
    the sketch's rank-error sliver, PSI is designed to be robust to exactly
    that.

    Plan shape: one edge aggregate over the reference slice (1 row to the
    driver -> edges as plan literals), then ONE fused conditional-count
    aggregate over the full table keyed by bin, left-joined onto a
    ``sequence``-generated bin spine so empty bins report zero, crossed with
    the 1-row totals. Duplicate edges (heavy ties) skip a bin index; the
    skipped bin is 0/0 on both sides and its term is exactly 0.

    Output: one row per bin —
    ``(bin, lo, hi, n_ref, n_cur, ref_share, cur_share, psi_term, psi_total)``
    with ``lo``/``hi`` the quantized edges (null on the open ends).
    """
    if bins < 2:
        raise DataFrameValidationError("bins must be >= 2")
    if value_col not in df.columns or time_col not in df.columns:
        raise DataFrameValidationError(
            f"psi_drift: missing column {value_col!r} or {time_col!r}"
        )
    is_ref = _split_flag(df, time_col, split)
    pfn = F.percentile_approx if approx else F.percentile
    probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    edge_row = (
        df.filter(is_ref & F.col(value_col).isNotNull())
        .agg(pfn(value_col, probs).alias("_e"))
        .collect()[0]["_e"]
    )
    if edge_row is None:
        raise DataFrameValidationError(
            "psi_drift: reference slice (time_col < split) has no non-null values"
        )
    edges = [round(float(e), 6) for e in edge_row]

    earr = F.array(*[F.lit(e) for e in edges])
    v = F.col(value_col).cast("double")
    bin_ix = F.aggregate(
        earr, F.lit(1), lambda acc, e: acc + (v > e).cast("int")
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(bin_ix.alias("bin"), is_ref.alias("_ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.col("_ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("_ref")).cast("long")).alias("n_cur"),
        )
    )
    spine = (
        df.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(bins))).alias("bin"))
    )
    lo_map = F.create_map(
        *[F.lit(x) for i, e in enumerate(edges) for x in (i + 2, e)]
    )
    hi_map = F.create_map(
        *[F.lit(x) for i, e in enumerate(edges) for x in (i + 1, e)]
    )
    filled = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.element_at(lo_map, F.col("bin")).alias("lo"),
            F.element_at(hi_map, F.col("bin")).alias("hi"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = filled.agg(
        F.sum("n_ref").cast("double").alias("_tr"),
        F.sum("n_cur").cast("double").alias("_tc"),
    )
    p = F.greatest(F.col("n_ref") / F.col("_tr"), F.lit(_EPS))
    q = F.greatest(F.col("n_cur") / F.col("_tc"), F.lit(_EPS))
    termed = filled.join(F.broadcast(totals)).select(
        "bin",
        "lo",
        "hi",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("ref_share"),
        F.round(q, 6).alias("cur_share"),
        ((p - q) * F.log(p / q)).alias("_term"),
    )
    total = termed.agg(F.sum("_term").alias("_psi"))
    return termed.join(F.broadcast(total)).select(
        "bin",
        "lo",
        "hi",
        "n_ref",
        "n_cur",
        "ref_share",
        "cur_share",
        F.round("_term", 6).alias("psi_term"),
        F.round("_psi", 6).alias("psi_total"),
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    time_col: str,
    split,
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic across a time split.

    ``D = sup_v |F_ref(v) - F_cur(v)|`` evaluated at every pooled distinct
    value (where the supremum of two step ECDFs is attained; ties are
    handled exactly because both ECDFs jump at the shared value).

    Plan shape: one groupBy collapses the corpus to
    ``(value, n_ref, n_cur)`` distinct rows; the global running counts come
    from the quantile-bucket two-phase cumulative
    (:func:`plans.rownum.with_global_cumsum` — per-bucket parallel window
    scans + a driver prefix-sum over one partial row per bucket), then one
    max-aggregate. No single-partition window for any input size; the
    driver holds ``2 × num_buckets`` longs.

    Output: one row ``(ks_stat, n_ref, n_cur)`` (ks rounded to 6).
    """
    if value_col not in df.columns or time_col not in df.columns:
        raise DataFrameValidationError(
            f"ks_drift: missing column {value_col!r} or {time_col!r}"
        )
    from temporalscope_spark.plans.rownum import with_global_cumsum

    is_ref = _split_flag(df, time_col, split)
    per_value = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("double").alias("v"), is_ref.alias("_ref"))
        .groupBy("v")
        .agg(
            F.sum(F.col("_ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("_ref")).cast("long")).alias("n_cur"),
        )
    )
    per_value = per_value.persist()
    try:
        totals = per_value.agg(
            F.sum("n_ref").cast("double").alias("_tr"),
            F.sum("n_cur").cast("double").alias("_tc"),
        )
        cum = with_global_cumsum(
            per_value, ["v"], ["n_ref", "n_cur"], num_buckets=num_buckets
        )
        out = (
            cum.join(F.broadcast(totals))
            .agg(
                F.round(
                    F.max(
                        F.abs(
                            F.col("n_ref_cum").cast("double") / F.col("_tr")
                            - F.col("n_cur_cum").cast("double") / F.col("_tc")
                        )
                    ),
                    6,
                ).alias("ks_stat"),
                F.max("_tr").cast("long").alias("n_ref"),
                F.max("_tc").cast("long").alias("n_cur"),
            )
        )
        from temporalscope_spark.core.caching import hold

        return hold(out, per_value)
    except Exception:
        per_value.unpersist()
        raise


def fit_psi_reference(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    approx: bool = False,
) -> dict:
    """Fit a PSI reference on a TRAIN frame: quantized bin edges + the
    reference bin shares, returned as a plain dict (the package's
    fit/transform model convention — ``fit_scaler``-style) so scoring can
    run batch OR streaming with the model as plan literals.

    Edges are the ``i/bins`` interior percentiles (``approx=True`` =
    ``percentile_approx``, the 100 TB lane), rounded to 6 like
    :func:`psi_drift`; reference shares are floored at 1e-6 so a later
    score never divides by zero (the same convention as the per-bin
    terms in :func:`psi_drift`).

    Two bounded actions: one 1-row edge aggregate, one 1-row
    ``bins``-conditional-count aggregate. Model:
    ``{"value_col", "bins", "edges", "ref_shares", "n_ref"}``.
    """
    if bins < 2:
        raise DataFrameValidationError("bins must be >= 2")
    if value_col not in df.columns:
        raise DataFrameValidationError(
            f"fit_psi_reference: missing column {value_col!r}"
        )
    nn = df.filter(F.col(value_col).isNotNull())
    pfn = F.percentile_approx if approx else F.percentile
    probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    edge_row = nn.agg(pfn(value_col, probs).alias("_e")).collect()[0]["_e"]
    if edge_row is None:
        raise DataFrameValidationError(
            "fit_psi_reference: no non-null values to fit on"
        )
    edges = [round(float(e), 6) for e in edge_row]

    bin_ix = _bin_expr(value_col, edges)
    counts_row = nn.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        *[
            F.sum((bin_ix == b).cast("long")).cast("double").alias(f"_b{b}")
            for b in range(1, bins + 1)
        ],
    ).collect()[0]
    n_ref = float(counts_row["_n"])
    shares = [
        max(float(counts_row[f"_b{b}"]) / n_ref, _EPS)
        for b in range(1, bins + 1)
    ]
    return {
        "value_col": value_col,
        "bins": bins,
        "edges": edges,
        "ref_shares": shares,
        "n_ref": int(n_ref),
    }


def _bin_expr(value_col: str, edges: list) -> F.Column:
    """1-based bin index of ``value_col`` against literal edges — the
    same fold as :func:`psi_drift` (count of edges strictly below)."""
    v = F.col(value_col).cast("double")
    earr = F.array(*[F.lit(float(e)) for e in edges])
    return F.aggregate(earr, F.lit(1), lambda acc, e: acc + (v > e).cast("int"))


def psi_aggs(ref: dict) -> tuple[list, list]:
    """(aggregate expressions, final select expressions) for scoring a
    slice against a fitted PSI reference — shared by the batch
    :func:`psi_score` and the streaming windowed lane
    (:func:`~temporalscope_spark.streaming.sessions.stream_psi_drift`),
    which is what pins their parity."""
    bins = ref["bins"]
    bin_ix = _bin_expr(ref["value_col"], ref["edges"])
    aggs = [
        F.count(F.when(F.col(ref["value_col"]).isNotNull(), 1)).alias("_n"),
        *[
            F.sum(
                F.when(
                    F.col(ref["value_col"]).isNotNull() & (bin_ix == b), 1
                ).otherwise(0)
            ).alias(f"_b{b}")
            for b in range(1, bins + 1)
        ],
    ]
    n = F.col("_n").cast("double")
    terms = []
    for b in range(1, bins + 1):
        p = F.lit(float(ref["ref_shares"][b - 1]))
        q = F.greatest(F.col(f"_b{b}").cast("double") / n, F.lit(_EPS))
        terms.append((p - q) * F.log(p / q))
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    finals = [
        F.col("_n").cast("long").alias("n"),
        (F.round(F.when(n > 0, psi), 6) + F.lit(0.0)).alias("psi"),
    ]
    return aggs, finals


def psi_score(
    df: DataFrame,
    ref: dict,
    group_cols: list | None = None,
) -> DataFrame:
    """PSI of each group (or the whole frame) against a reference fitted
    with :func:`fit_psi_reference` — the serving half of the drift
    monitor (``psi_drift`` fits and scores in one shot over a time
    split; this scores ANY batch against a FROZEN train-time reference,
    the production shape).

    Expression-only binning against literal edges + ONE map-side-
    combinable aggregation carrying ``bins`` conditional counts and the
    closed-form PSI — no spine join, no second pass, and therefore
    legal inside a Structured Streaming windowed aggregation (the
    streaming lane wraps these exact expressions).

    Output: ``(group_cols..., n, psi)`` — ``n`` counts the non-null
    values scored; ``psi`` is NULL for a group with n = 0.
    """
    if ref["value_col"] not in df.columns:
        raise DataFrameValidationError(
            f"psi_score: missing column {ref['value_col']!r}"
        )
    missing = [c for c in (group_cols or []) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"psi_score: missing columns {missing}")
    aggs, finals = psi_aggs(ref)
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = grouped.agg(*aggs)
    return out.select(*(group_cols or []), *finals)


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    smoothing: float = 0.5,
) -> DataFrame:
    """Two-sample embedding-distribution divergence over a shared coarse
    quantization — the MAUVE idea (Pillutla et al. 2021: compare two text
    distributions through cluster-histogram divergences in embedding
    space) reduced to its scalable core: assign BOTH corpora to the same
    k-means cells (:func:`operators.similarity.with_ivf_cell` — centroids
    as plan literals, expression-only), build the two C-bin histograms in
    one aggregation each, and report per-cell shares plus the
    Jensen–Shannon divergence (log2, bits — 0 = identical, 1 = disjoint).

    Laplace ``smoothing`` keeps empty cells finite (the PSI convention);
    shares use (count + s) / (n + s·C). Everything after the two
    map-only assignment scans runs on the bounded C-row cell table; the
    JS total is a sorted fold over cells so the sum replays bit-identically
    cross-engine.

    Output: one row per cell (cell, n_ref, n_cur, share_ref, share_cur,
    js_term) + the `js_total` repeated per row (rounded 6) — the same
    wide-report convention as `psi_drift`.
    """
    from temporalscope_spark.operators.similarity import with_ivf_cell

    if not centroids:
        raise DataFrameValidationError("embedding_drift: empty centroid list")
    if smoothing <= 0:
        raise DataFrameValidationError("embedding_drift: smoothing must be > 0")
    c_n = len(centroids)
    cells = (
        ref.sparkSession.range(c_n).select(F.col("id").cast("int").alias("cell"))
    )

    def hist(df: DataFrame, name: str) -> DataFrame:
        a = with_ivf_cell(df, centroids, vec_col=vec_col, out_col="cell")
        return a.groupBy("cell").agg(F.count(F.lit(1)).alias(name))

    h = (
        cells.join(hist(ref, "n_ref"), "cell", "left")
        .join(hist(cur, "n_cur"), "cell", "left")
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    tot = h.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    s = F.lit(float(smoothing))
    h = h.crossJoin(F.broadcast(tot))
    p = (F.col("n_ref").cast("double") + s) / (
        F.col("_tr").cast("double") + s * F.lit(float(c_n))
    )
    q = (F.col("n_cur").cast("double") + s) / (
        F.col("_tc").cast("double") + s * F.lit(float(c_n))
    )
    m = (p + q) / F.lit(2.0)
    js_term = (
        p * F.log2(p / m) / F.lit(2.0) + q * F.log2(q / m) / F.lit(2.0)
    )
    h = h.withColumn("_p", p).withColumn("_q", q).withColumn("_t", js_term)
    # sorted fold over the bounded C-row table: engine-exact total
    total = h.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("_t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_t"],
        ).alias("_js")
    )
    return (
        h.crossJoin(F.broadcast(total))
        .select(
            "cell",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            (F.round("_p", 6) + F.lit(0.0)).alias("share_ref"),
            (F.round("_q", 6) + F.lit(0.0)).alias("share_cur"),
            (F.round("_t", 6) + F.lit(0.0)).alias("js_term"),
            (F.round("_js", 6) + F.lit(0.0)).alias("js_total"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    time_col: str,
    value_col: str,
    id_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity CUSUM mean-shift locator (Page 1954; Taylor's
    cumulative-sum changepoint chart): with x̄ the series mean,

        C_t = Σ_{s ≤ t} (x_s − x̄)

    the estimated change point is the timestamp of ``max_t |C_t|`` and
    the shift magnitude indicator is ``S_range = max C − min C``,
    reported alongside the Brownian-bridge-scaled statistic
    ``S_range / (σ·√n)`` (the same normalization the KS family uses;
    values ≫ 1 indicate a real level shift, σ = sample std).

    Plan shape: the mean and the running sum are TWO frames of ONE
    entity-keyed window (single exchange + sort, exchange-free on the
    bucketed layout); the per-entity reduction — including the
    argmax-by-(rounded |C|, earliest time) — is ONE map-side-combinable
    ``groupBy(entity)`` max-struct fold. |C| is rounded to 6 BEFORE the
    argmax so cross-engine last-ulp differences become deterministic
    earliest-time ties. NULL values are excluded; entities with < 2
    points report NULL stat.

    Output: ``(id, n_obs, change_t, cusum_abs_max, s_range, stat)``
    floats rounded to 6, ordered by id.
    """
    from pyspark.sql.window import Window

    from temporalscope_spark.core.convert import epoch_seconds

    for c in [time_col, value_col, id_col] + (
        [tiebreak_col] if tiebreak_col else []
    ):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"cusum_changepoint: missing column {c!r}"
            )

    t = epoch_seconds(F.col(time_col), df.schema[time_col].dataType)
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & t.isNotNull()).select(
        F.col(id_col).alias("_id"),
        t.alias("_t"),
        x.alias("_x"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    order = ["_t"] + (["_tb"] if tiebreak_col else [])
    w = Window.partitionBy("_id").orderBy(*order)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # C_t = cum_sum − cum_count · (total/n): the mean is spelled as an
    # explicit sum/count division so the oracle replays the same operand
    # order (built-in avg folds are engine-internal)
    mu = F.sum("_x").over(full) / F.count("_x").over(full).cast("double")
    cs = base.select(
        "_id",
        "_t",
        "_x",
        (F.sum("_x").over(cum) - F.count("_x").over(cum).cast("double") * mu)
        .alias("_c"),
    )
    # argmax by (rounded |C| desc, earliest t): max of a (|C|, -t) struct
    a6 = F.round(F.abs(F.col("_c")), 6)
    agg = cs.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max(F.struct(a6.alias("a"), (-F.col("_t")).alias("mt"))).alias("_am"),
        F.max("_c").alias("_cmax"),
        F.min("_c").alias("_cmin"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    n = F.col("n_obs").cast("double")
    var = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / (n - F.lit(1.0))
    sd = F.sqrt(var)
    srange = F.col("_cmax") - F.col("_cmin")
    out = agg.select(
        F.col("_id").alias("id"),
        "n_obs",
        (-F.col("_am.mt")).alias("change_t"),
        F.col("_am.a").alias("cusum_abs_max"),
        F.round(srange, 6).alias("s_range"),
        F.round(
            F.when((n > 1) & (var > 0), srange / (sd * F.sqrt(n))), 6
        ).alias("stat"),
    )
    return out.orderBy("id")


def vocab_kl(
    df: DataFrame,
    text_col: str,
    source_col: str,
    source_a: str,
    source_b: str,
    vocab_k: int = 1000,
    alpha: float = 0.5,
) -> DataFrame:
    """Vocabulary-distribution divergence between two sub-corpora — the
    text twin of :func:`psi_drift` (CCNet/DSIR-style domain-shift
    diagnostics measure exactly this): add-α-smoothed unigram
    distributions over a shared bounded vocabulary, reporting KL(a‖b),
    KL(b‖a) and the symmetric Jensen–Shannon divergence (nats).

    The vocabulary is the top-``vocab_k`` words of the two sides
    COMBINED (count desc, word asc — deterministic), so both
    distributions live on the same support; each side's distribution is
    ``p_w = (c_w + α) / (N_side + α·V)`` with ``N_side`` the side's
    total count over the vocabulary (probabilities sum to 1 on the
    support by construction, and α > 0 keeps every log finite).

    Plan shape (100 TB-safe): ONE word-count aggregation with per-side
    conditional sums (map-side combinable), the top-k vocab via
    TakeOrderedAndProject (never a full sort), side totals as ONE 1-row
    aggregate over the bounded vocab table, divergences as ONE bounded
    fold. Output: one row ``(n_a, n_b, vocab_size, kl_ab, kl_ba, js)``
    rounded to 6.
    """
    if vocab_k < 1:
        raise DataFrameValidationError("vocab_kl: vocab_k must be >= 1")
    if alpha <= 0:
        raise DataFrameValidationError("vocab_kl: alpha must be > 0")
    for c in (text_col, source_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"vocab_kl: missing column {c!r}")

    from temporalscope_spark.operators.corpus_stats import _norm_words

    side = F.col(source_col)
    words = (
        df.filter(side.isin([source_a, source_b]))
        .select(
            (side == source_a).cast("int").alias("_isa"),
            F.explode(_norm_words(text_col)).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    counts = words.groupBy("word").agg(
        F.sum("_isa").alias("ca"),
        F.sum(F.lit(1) - F.col("_isa")).alias("cb"),
        F.count(F.lit(1)).alias("n"),
    )
    vocab = counts.orderBy(F.col("n").desc(), F.col("word")).limit(vocab_k)

    from pyspark import StorageLevel

    vocab = vocab.persist(StorageLevel.MEMORY_AND_DISK)
    tot = vocab.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    na, nb, v = float(tot["na"]), float(tot["nb"]), int(tot["v"])
    al = float(alpha)
    da = F.lit(na + al * v)
    db = F.lit(nb + al * v)
    pa = (F.col("ca").cast("double") + F.lit(al)) / da
    pb = (F.col("cb").cast("double") + F.lit(al)) / db
    pm = (pa + pb) / F.lit(2.0)
    out = vocab.agg(
        F.sum(pa * F.log(pa / pb)).alias("_klab"),
        F.sum(pb * F.log(pb / pa)).alias("_klba"),
        (
            F.lit(0.5) * F.sum(pa * F.log(pa / pm))
            + F.lit(0.5) * F.sum(pb * F.log(pb / pm))
        ).alias("_js"),
    )
    return out.select(
        F.lit(int(na)).cast("long").alias("n_a"),
        F.lit(int(nb)).cast("long").alias("n_b"),
        F.lit(v).cast("int").alias("vocab_size"),
        F.round(F.col("_klab"), 6).alias("kl_ab"),
        F.round(F.col("_klba"), 6).alias("kl_ba"),
        F.round(F.col("_js"), 6).alias("js"),
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between two groups'
    value distributions — the drift metric that, unlike KS (sup gap) or
    PSI/KL (binned ratios), weights HOW FAR mass moved:

        W₁ = ∫ |F_a(x) − F_b(x)| dx
           = Σ_{consecutive distinct values} |cdf_a − cdf_b| · Δx

    (scipy ``wasserstein_distance`` parity). Output: one row
    ``(n_a, n_b, w1)`` rounded 6.

    Plan shape (100 TB-safe): the corpus collapses to ONE
    map-side-combinable ``groupBy(value)`` count table; the joint CDF is
    the quantile-bucket two-phase prefix sum of ``plans/rownum.py`` over
    that table (NO single-partition window — same machinery as
    :func:`operators.experiment.mann_whitney_u`); Δx to the next
    distinct value is a ``lead`` over the same bucketed grid — computed
    as (next − current) via the global row-number spine, here folded in
    a single final aggregation keyed on nothing but bounded by the
    distinct-value table. NULL metrics are excluded; a missing group
    raises.
    """
    for c in (value_col, group_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"wasserstein_1d: missing column {c!r}")
    g = F.col(group_col).cast("string")
    y = F.col(value_col).cast("double")
    both = df.filter(y.isNotNull() & g.isin([str(group_a), str(group_b)])).select(
        y.alias("_y"), (g == F.lit(str(group_a))).cast("long").alias("_ia")
    )
    counts = both.groupBy("_y").agg(
        F.sum("_ia").alias("_na"),
        F.sum(F.lit(1) - F.col("_ia")).alias("_nb"),
    )

    from temporalscope_spark.plans.rownum import with_global_cumsum

    from temporalscope_spark.plans.rownum import with_global_row_number

    ranked = with_global_cumsum(
        counts, ["_y"], ["_na", "_nb"], materialize_input=True
    )
    # Δx to the NEXT distinct value via the two-phase global row number
    # + successor EQUI-join (the suffix.py rank-adjacent pattern) — no
    # partition-free lead window, so the distinct-value grid never
    # funnels through one task even when values are continuous.
    numbered = with_global_row_number(
        ranked, ["_y"], "_rn", materialize_input=True
    )
    tot = numbered.agg(
        F.max("_na_cum").alias("_nat"), F.max("_nb_cum").alias("_nbt")
    ).first()
    na_t, nb_t = int(tot["_nat"] or 0), int(tot["_nbt"] or 0)
    if na_t == 0 or nb_t == 0:
        raise DataFrameValidationError(
            f"wasserstein_1d: group {group_a!r} or {group_b!r} has no "
            "non-null rows"
        )
    nxt = numbered.select(
        (F.col("_rn") - 1).alias("_rn"), F.col("_y").alias("_ynext")
    )
    fa = F.col("_na_cum").cast("double") / float(na_t)
    fb = F.col("_nb_cum").cast("double") / float(nb_t)
    seg = numbered.join(nxt, "_rn").select(
        (F.abs(fa - fb) * (F.col("_ynext") - F.col("_y"))).alias("_w")
    )
    out = seg.agg(F.sum("_w").alias("_w1"))
    return out.select(
        F.lit(na_t).cast("long").alias("n_a"),
        F.lit(nb_t).cast("long").alias("n_b"),
        F.round("_w1", 6).alias("w1"),
    )
