"""Deterministic sampling and per-group top-k for corpus curation.

Spark's ``df.sample``/``sampleBy`` draw from a partition-dependent RNG
stream — rerunning on a repartitioned table samples DIFFERENT rows, which
breaks resumable pipelines and cross-engine verification. These operators
derive membership from a content hash instead: pure map, partition-
invariant, replayable in any engine (md5 variant).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


# above this many strata the literal-map lookup gives way to a broadcast
# join: a create_map with thousands of entries is one giant expression and
# lands in the same JVM 64 KB-per-method codegen territory the chained-when
# argmax hit in lang_id (operators/text.py) — the join plan compiles no
# matter how many strata there are
_MAP_LITERAL_MAX = 64


def _with_rate(df: DataFrame, strata_col: str, rates: Mapping, default):
    """Add a per-stratum double column ``_rate`` (``default`` — a float or
    None — for strata absent from ``rates``).

    Below ``_MAP_LITERAL_MAX`` strata: one literal ``create_map`` +
    ``element_at`` lookup — each rate appears ONCE in the plan (never the
    chained ``when`` tree whose duplicated branches blow the JVM's 64 KB
    codegen method limit). Above it: a broadcast hash join against the
    C-row rate table — still no shuffle of ``df``, and whole-stage codegen
    compiles at any C.
    """
    dflt = F.lit(None).cast("double") if default is None else F.lit(float(default))
    key = F.col(strata_col).cast("string")
    if len(rates) == 0:
        return df.withColumn("_rate", dflt)
    if len(rates) <= _MAP_LITERAL_MAX:
        m = F.create_map(
            *[
                F.lit(x)
                for s, v in sorted(rates.items(), key=lambda kv: str(kv[0]))
                for x in (str(s), float(v))
            ]
        )
        return df.withColumn("_rate", F.coalesce(F.element_at(m, key), dflt))
    spark = df.sparkSession
    tbl = spark.createDataFrame(
        [(str(s), float(v)) for s, v in rates.items()],
        "_rate_key string, _rate_v double",
    )
    return (
        df.withColumn("_rate_key", key)
        .join(F.broadcast(tbl), "_rate_key", "left")
        .withColumn("_rate", F.coalesce("_rate_v", dflt))
        .drop("_rate_key", "_rate_v")
    )


def _uniform01(key_col: str, seed: int, portable: bool):
    """Deterministic U[0,1) from a row key. ``portable=True`` = md5 (bit-
    reproducible in any SQL engine); else xxhash64 (faster, JVM)."""
    if portable:
        h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long").cast("double") / F.lit(
            float(2**32)
        )
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    return F.pmod(h, F.lit(2**52)).cast("double") / F.lit(float(2**52))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Keep rows whose hash-uniform < fraction. Same input row → same
    decision, regardless of partitioning, session, or engine."""
    if not 0.0 <= fraction <= 1.0:
        raise DataFrameValidationError("fraction must be between 0.0 and 1.0")
    return df.filter(_uniform01(key_col, seed, portable) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling (the corpus-mixing primitive:
    'keep 100% of books, 10% of web'). Unlisted strata get
    ``default_fraction``. One narrow map (literal-map lookup, or a
    broadcast rate join above ``_MAP_LITERAL_MAX`` strata) — no shuffle
    of the corpus, no RNG state."""
    for k, v in fractions.items():
        if not 0.0 <= float(v) <= 1.0:
            raise DataFrameValidationError(f"fraction for stratum '{k}' must be in [0, 1]")
    return (
        _with_rate(df, strata_col, fractions, default_fraction)
        .filter(_uniform01(key_col, seed, portable) < F.col("_rate"))
        .drop("_rate")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """k best rows per group by ``order_col`` (e.g. top-k docs by quality per
    source) — ``row_number`` over a per-group window + filter.

    Deterministic when ``tie_break`` (a unique column) is given. Spark plans
    this as a partial top-k inside each shuffle partition when k is small
    (WindowGroupLimit pushes the limit below the exchange) — no full
    per-group sort materialization.
    """
    if k < 1:
        raise DataFrameValidationError("k must be >= 1")
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: Mapping[str, float],
    strata_col: str = "source",
    token_col: str = "n_tok",
    key_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Corpus mixing to TOKEN budgets: downsample each source so its
    expected token count hits ``budgets[source]`` (sources under budget are
    kept whole — fraction is capped at 1).

    ONE tiny aggregate (per-source token totals — C rows to the driver),
    fraction = min(1, budget / total) per source, then the deterministic
    hash filter from :func:`stratified_sample` — no shuffle of the corpus,
    partition-invariant, replayable in any engine with ``portable=True``.
    This is the standard "mix 300B web + 50B code + all of books" recipe
    expressed as one narrow map.
    """
    for k, v in budgets.items():
        if float(v) < 0:
            raise DataFrameValidationError(f"budget for stratum '{k}' must be >= 0")
    totals = {
        r[strata_col]: float(r["_t"])
        for r in df.groupBy(strata_col).agg(F.sum(token_col).alias("_t")).collect()
    }
    fractions = {
        k: min(1.0, float(v) / totals[k]) if totals.get(k) else 0.0
        for k, v in budgets.items()
    }
    return stratified_sample(
        df, strata_col, fractions, key_col=key_col, seed=seed,
        default_fraction=default_fraction, portable=portable,
    )


def temperature_sample(
    df: DataFrame,
    budget_rows: int,
    strata_col: str = "source",
    alpha: float = 0.3,
    key_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Temperature-scaled corpus mixing (the mT5/XLM-R recipe): sample
    sources with probability proportional to ``share^alpha`` so low-
    resource sources are up-weighted relative to their natural share
    (``alpha=1`` reproduces natural proportions; ``alpha→0`` approaches
    uniform-over-sources).

    Per-source keep rate: ``rate_s = min(1, budget_rows · q_s / n_s)``
    with ``q_s = (n_s/N)^alpha / Σ_g (n_g/N)^alpha`` — over-budget
    sources are kept whole, exactly like :func:`sample_to_token_budget`
    (this package never up-samples; duplication is a separate, explicit
    op). Membership is the deterministic hash filter, so the sample is
    partition-invariant and engine-replayable with ``portable=True``.

    ONE tiny aggregate (per-source row counts — C rows to the driver, the
    same bounded-collect contract as :func:`sample_to_token_budget`); the
    ``Σ n_g^alpha`` normalizer folds over SOURCE-SORTED counts so the
    float is reproduced identically by any engine replaying the same
    sequence (N^alpha cancels in q_s, so only ``n^alpha`` terms appear);
    the C rates then ship as a literal-map lookup (or a broadcast rate
    join above ``_MAP_LITERAL_MAX`` sources) — the corpus itself sees one
    narrow filter+map and never shuffles. Output: the kept rows'
    (key, stratum) plus the per-source ``keep_frac`` (rounded to 6).
    """
    if budget_rows <= 0:
        raise DataFrameValidationError("budget_rows must be > 0")
    if not 0.0 < alpha <= 1.0:
        raise DataFrameValidationError("alpha must be in (0, 1]")
    counts = sorted(
        df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n")).collect(),
        key=lambda r: r[strata_col],
    )
    zn = 0.0
    for r in counts:  # left fold over sorted sources — engine-replayable
        zn += float(r["_n"]) ** alpha
    rates = {
        r[strata_col]: min(
            1.0,
            float(budget_rows) * (float(r["_n"]) ** alpha / zn) / float(r["_n"]),
        )
        for r in counts
    }
    return (
        _with_rate(df.select(key_col, strata_col), strata_col, rates, None)
        .filter(_uniform01(key_col, seed, portable) < F.col("_rate"))
        .select(key_col, strata_col, F.round("_rate", 6).alias("keep_frac"))
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training dataloaders:
    every row gets a (shard, pos) address that is a pure function of
    (key, seed) and the corpus membership — re-running on the same corpus
    yields the same order, any engine replays it, and changing ``seed``
    reshuffles.

    ``shard`` = first 8 md5 hex chars of ``key#seed`` as u32, mod
    n_shards; ``pos`` = rank of the NEXT 8 hex chars (independent bits)
    within the shard, key tie-break. The window partitions by shard, so
    each shard sorts independently — at cluster scale this is
    ``repartition(shard) + sortWithinPartitions``, no global sort, no
    single-partition window.

    Output: (key, shard, pos); pos is contiguous 1..|shard|.
    """
    if n_shards <= 0:
        raise DataFrameValidationError("n_shards must be > 0")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))
    u = lambda a: F.conv(F.substring(h, a, 8), 16, 10).cast("long")  # noqa: E731
    return (
        df.select(
            key_col,
            (u(1) % F.lit(n_shards)).cast("int").alias("shard"),
            u(9).alias("_ok"),
        )
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("shard").orderBy("_ok", key_col)
            ),
        )
        .drop("_ok")
    )


def negative_samples(
    positives: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Deterministic negative sampling for ranking / embedding /
    sampled-softmax training: for every positive (user, item) pair, draw
    ``k`` pseudo-random candidates from the item universe and drop the
    ones that are actually positives for that user — word2vec's negative
    sampling (uniform lane) at corpus scale, replayable run-to-run.

    ``items`` is the candidate table (one row per distinct ``item_col``
    value). Candidates come from an md5 hash of
    ``(user, item, slot, seed)`` mod |items| against a GLOBAL item index
    built with the quantile-bucket two-phase row number
    (``plans/rownum.with_global_row_number`` — no single-partition
    window; the index orders by the item id, so it is a pure function of
    the item set). Accidental hits on a true positive are dropped by an
    anti-join, so a pair yields ≤ k negatives (the standard
    collision-drop convention — re-draw loops don't exist relationally
    and the loss is ~|positives per user| / |items| per slot).

    Plan shape: one narrow ``k``-slot explode over the positives, one
    equi-join on the item index (broadcast when the item table is small,
    AQE decides), one anti-join on (user, candidate). Positives×k rows,
    no per-row Python.

    Output: ``(user_col, item_col, slot, neg_<item_col>)``.
    """
    from temporalscope_spark.plans.rownum import with_global_row_number

    if k < 1:
        raise DataFrameValidationError("negative_samples: k must be >= 1")
    for c, d in ((user_col, positives), (item_col, positives), (item_col, items)):
        if c not in d.columns:
            raise DataFrameValidationError(
                f"negative_samples: missing column {c!r}"
            )
    n_items = items.select(item_col).distinct().count()
    if n_items < 2:
        raise DataFrameValidationError(
            "negative_samples: need >= 2 distinct items"
        )
    # the index orders by an md5-derived numeric key (+ the id as tie
    # suffix), so it works for ANY item id type and stays a pure function
    # of the item set — with_global_row_number needs a numeric primary
    ordk = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    idx = (
        with_global_row_number(
            items.select(item_col).distinct().withColumn("_ord", ordk),
            ["_ord", item_col],
            rn_col="_ni",
            materialize_input=True,
        )
        .select((F.col("_ni") - 1).alias("_slot_ix"), F.col(item_col).alias("_neg"))
    )
    slots = positives.select(user_col, item_col).withColumn(
        "slot", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col(user_col).cast("string"),
                    F.col(item_col).cast("string"),
                    F.col("slot").cast("string"),
                    F.lit(str(seed)),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = slots.withColumn("_slot_ix", h % n_items)
    joined = cand.join(idx, "_slot_ix").drop("_slot_ix")
    truth = positives.select(
        F.col(user_col).alias("_tu"), F.col(item_col).alias("_ti")
    ).distinct()
    out = joined.join(
        truth,
        (joined[user_col] == truth["_tu"]) & (joined["_neg"] == truth["_ti"]),
        "left_anti",
    )
    return out.select(user_col, item_col, "slot", F.col("_neg").alias(f"neg_{item_col}"))


def upsample_repeat(
    df: DataFrame,
    strata_col: str,
    factors: Mapping[str, float],
    key_col: str,
    seed: int = 42,
    default_factor: float = 1.0,
    portable: bool = False,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional UPSAMPLING by stratum — the r > 1 half of
    corpus mixing that :func:`temperature_sample` (keep-rate <= 1) cannot
    express: low-resource sources in an mT5-style temperature mix need
    repeat factors, not keep rates.

    Each row is emitted ``floor(r)`` times, plus one more copy iff its
    deterministic hash-uniform < ``frac(r)`` — so a stratum with factor
    2.5 averages exactly 2.5 copies per row, and the SAME rows get the
    extra epoch on every run, engine, and partitioning (md5 membership
    when ``portable=True``). The copy index lands in ``epoch_col``
    (1-based); downstream shuffles should key on (row key, epoch) so
    repeats don't co-locate. Factor 0 drops the stratum.

    Plan shape at scale: one narrow map over the corpus (literal
    ``create_map`` rate lookup below the codegen bound, broadcast rate
    join above it — see ``_with_rate``) + ``explode(sequence(1, n))``:
    NO shuffle, row inflation exactly the requested factor.
    """
    for k, v in factors.items():
        if float(v) < 0.0:
            raise DataFrameValidationError(f"factor for stratum '{k}' must be >= 0")
    if float(default_factor) < 0.0:
        raise DataFrameValidationError("default_factor must be >= 0")
    base = _with_rate(df, strata_col, factors, float(default_factor))
    n_copies = (
        F.floor("_rate").cast("int")
        + F.when(
            _uniform01(key_col, seed, portable) < (F.col("_rate") - F.floor("_rate")),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return (
        base.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_rate", "_n_copies")
    )


def weight_diagnostics(
    df: DataFrame,
    weight_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kish effective sample size of an importance-weight column:
    ``ESS = (Σw)² / Σw²`` (Kish 1965) — the health check for any
    weighted corpus (DSIR selection scores, temperature-mix rates,
    per-epoch repeat factors). ESS ≪ n means a handful of documents
    dominate the weighted objective.

    ONE map-side-combinable aggregation (optionally per group); with
    integer weights the two sums are exact LONG arithmetic, so the
    derived doubles are bit-identical in any engine.

    Output: (group?, n, sum_w, ess, ess_ratio) — ess = (Σw)²/Σw²
    rounded to 6, ess_ratio = ess/n; weight-less (all-zero) groups
    return ess 0.
    """
    if weight_col not in df.columns:
        raise DataFrameValidationError(f"missing column {weight_col!r}")
    w = F.col(weight_col).cast("double")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("_sw"),
        F.sum(w * w).alias("_sww"),
    ]
    base = df.groupBy(group_col) if group_col is not None else df.groupBy()
    out = base.agg(*aggs)
    ess = F.when(
        F.col("_sww") > 0, F.col("_sw") * F.col("_sw") / F.col("_sww")
    ).otherwise(F.lit(0.0))
    cols = ([group_col] if group_col is not None else []) + [
        "n",
        (F.round("_sw", 6) + F.lit(0.0)).alias("sum_w"),
        (F.round(ess, 6) + F.lit(0.0)).alias("ess"),
        (F.round(ess / F.col("n"), 6) + F.lit(0.0)).alias("ess_ratio"),
    ]
    return out.select(*cols)


def unimax_allocation(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    budget_tokens: float = 1_000_000.0,
    max_epochs: float = 2.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): spread a token budget as UNIFORMLY as possible
    across sources, subject to no source being repeated more than
    ``max_epochs`` times — the principled successor to temperature
    mixing (:func:`temperature_sample`) that removes the α knob.

    Waterfilling closed form (no iteration): with per-source capacities
    ``cap_i = n_i · max_epochs`` sorted ascending and prefix sums
    ``P_j``, a source is saturated iff even a uniform waterline at its
    own capacity fits the budget (``P_{j-1} + cap_j·(C−j+1) ≤ B``);
    with ``k`` saturated sources the waterline is
    ``w = (B − P_k)/(C − k)`` and ``alloc_i = min(cap_i, w)``.

    Plan shape: ONE map-side-combinable token-count aggregation is the
    only corpus-sized job; everything after runs on the bounded C-row
    source table (its ordered windows are bounded by construction —
    documented, never data-sized). Applying the allocation composes
    with existing operators: rates ≤ 1 via `deterministic_sample`,
    epochs > 1 via `upsample_repeat`.

    Output: (group, n_tokens, cap, alloc, epochs) — alloc/epochs
    rounded to 6; epochs = alloc/n_tokens.
    """
    from temporalscope_spark.operators.corpus_stats import _norm_words
    from temporalscope_spark.operators.dedup import _parallelize_before_explode

    if budget_tokens <= 0:
        raise DataFrameValidationError("budget_tokens must be > 0")
    if max_epochs <= 0:
        raise DataFrameValidationError("max_epochs must be > 0")
    words = _parallelize_before_explode(
        df.select(F.col(group_col).alias("_g"), _norm_words(text_col).alias("_w"))
    ).select("_g", F.explode("_w").alias("word")).filter(F.col("word") != "")
    counts = words.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.withColumn(
        "_cap", F.col("_n").cast("double") * F.lit(float(max_epochs))
    )
    w_ord = Window.orderBy("_cap", "_g")
    c_tot = Window.partitionBy()
    ranked = (
        counts.withColumn("_j", F.row_number().over(w_ord))
        .withColumn(
            "_P",
            F.sum("_cap").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn("_C", F.count(F.lit(1)).over(c_tot))
    )
    B = F.lit(float(budget_tokens))
    ranked = ranked.withColumn(
        "_sat",
        (F.coalesce("_P", F.lit(0.0)) + F.col("_cap") * (F.col("_C") - F.col("_j") + 1))
        <= B,
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("_sat"), 1).otherwise(0)).alias("_k"),
        F.sum(F.when(F.col("_sat"), F.col("_cap")).otherwise(F.lit(0.0))).alias(
            "_Pk"
        ),
        F.count(F.lit(1)).alias("_Call"),
    )
    waterline = F.when(
        F.col("_k") < F.col("_Call"),
        (B - F.col("_Pk")) / (F.col("_Call") - F.col("_k")),
    ).otherwise(F.lit(float("inf")))
    alloc = F.least(F.col("_cap"), F.col("_w"))
    return (
        ranked.crossJoin(F.broadcast(agg.select(waterline.alias("_w"))))
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").cast("long").alias("n_tokens"),
            (F.round("_cap", 6) + F.lit(0.0)).alias("cap"),
            (F.round(alloc, 6) + F.lit(0.0)).alias("alloc"),
            (
                F.round(alloc / F.col("_n").cast("double"), 6) + F.lit(0.0)
            ).alias("epochs"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    strata_col: str | None = None,
    seed: int = 42,
    portable: bool = False,
    wkey_col: str = "wkey",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets the key ``u^(1/w)`` for a hash-uniform
    ``u`` and weight ``w``; the ``k`` largest keys are exactly a
    w-proportional sample without replacement. The hash lane replaces
    RNG state, so the SAME rows are drawn on every run, engine, and
    partitioning (md5 when ``portable=True``) — replayable corpus
    subsampling where plain ``deterministic_sample`` cannot honor a
    quality/length weight.

    Rows with NULL or non-positive weight are excluded (they carry no
    sampling mass). Plan shape: one narrow map computes the key, then
    per-stratum ``row_number <= k`` compiles to WindowGroupLimit
    (per-partition top-k before the per-stratum merge); without strata
    the global sort+limit executes as TakeOrderedAndProject (per-
    partition top-k, k-row driver merge — never a full sort). The
    selection is ranked on the RAW key (ties broken by the row key);
    the emitted ``wkey_col`` is rounded to 6 for replay comparison.
    """
    if k < 1:
        raise DataFrameValidationError("weighted_sample: k must be >= 1")
    for c in (weight_col, key_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"weighted_sample: missing column {c!r}")
    if strata_col is not None and strata_col not in df.columns:
        raise DataFrameValidationError(
            f"weighted_sample: missing column {strata_col!r}"
        )
    w = F.col(weight_col).cast("double")
    key = F.pow(_uniform01(key_col, seed, portable), F.lit(1.0) / w)
    base = df.filter(w > 0).withColumn("_wk", key)
    if strata_col is None:
        out = base.orderBy(F.col("_wk").desc(), F.col(key_col)).limit(k)
    else:
        rn = F.row_number().over(
            Window.partitionBy(strata_col).orderBy(F.col("_wk").desc(), F.col(key_col))
        )
        out = base.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")
    return out.withColumn(wkey_col, F.round("_wk", 6) + F.lit(0.0)).drop("_wk")


def doremi_round(
    df: DataFrame,
    domain_col: str,
    loss_col: str,
    ref_loss_col: str,
    weights: Mapping[str, float] | None = None,
    eta: float = 1.0,
    smoothing: float = 0.0,
) -> DataFrame:
    """One DoReMi domain-weight update (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    given per-example proxy- and reference-model losses, re-weight each
    domain by its clipped excess loss

        ``λ_i = avg_i(max(loss − ref_loss, 0))``
        ``w'_i ∝ w_i · exp(η · λ_i)``  (normalized over domains)
        ``α_i = (1 − s) · w'_i + s / C``  (uniform smoothing)

    — domains where the proxy still trails the reference get more
    weight. The output α feeds directly into :func:`temperature_sample`
    / :func:`upsample_repeat` as the next mixture. ``weights`` carries
    the incoming w (uniform ``1/C`` when None; missing domains also
    default to uniform).

    Plan shape: ONE map-side-combinable aggregation over the corpus
    (per-domain sum/count of the clipped excess) — the corpus never
    shuffles on anything else; the exp/normalize/smooth algebra runs on
    the bounded C-row domain table (its total via a broadcast-crossed
    1-row aggregate, never a driver collect).

    Output: (domain, n_examples, excess_loss, weight_in, weight_out,
    mix_alpha) — floats rounded to 6.
    """
    for c in (domain_col, loss_col, ref_loss_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"doremi_round: missing column {c!r}")
    if eta <= 0:
        raise DataFrameValidationError("doremi_round: eta must be > 0")
    if not 0.0 <= smoothing <= 1.0:
        raise DataFrameValidationError("doremi_round: smoothing must be in [0, 1]")
    excess = F.greatest(
        F.col(loss_col).cast("double") - F.col(ref_loss_col).cast("double"),
        F.lit(0.0),
    )
    per_dom = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_examples"),
        F.avg(excess).alias("_lam"),
    )
    if weights is None:
        w_in = F.lit(None).cast("double")
    else:
        per_dom = _with_rate(per_dom, "domain", weights, None)
        w_in = F.col("_rate")
    tot_c = per_dom.agg(F.count(F.lit(1)).alias("_Cn"))
    per_dom = per_dom.crossJoin(F.broadcast(tot_c))
    w0 = F.coalesce(w_in, F.lit(1.0) / F.col("_Cn").cast("double"))
    per_dom = per_dom.withColumn(
        "_raw", w0 * F.exp(F.lit(float(eta)) * F.col("_lam"))
    ).withColumn("_w0", w0)
    tot = per_dom.agg(F.sum("_raw").alias("_Z"))
    s = F.lit(float(smoothing))
    per_dom = per_dom.crossJoin(F.broadcast(tot))
    w_out = F.col("_raw") / F.col("_Z")
    alpha = (F.lit(1.0) - s) * w_out + s / F.col("_Cn").cast("double")
    return per_dom.select(
        "domain",
        F.col("n_examples").cast("long").alias("n_examples"),
        (F.round("_lam", 6) + F.lit(0.0)).alias("excess_loss"),
        (F.round(F.col("_w0"), 6) + F.lit(0.0)).alias("weight_in"),
        (F.round(w_out, 6) + F.lit(0.0)).alias("weight_out"),
        (F.round(alpha, 6) + F.lit(0.0)).alias("mix_alpha"),
    )
