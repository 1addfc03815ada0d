"""Deduplication operators — exact and near-dup — for corpus pipelines.

Scale notes (the whole point):
  * exact dedup = hash-groupBy on a normalized fingerprint — one shuffle on
    the 32-char key, map-side combine, no text comparison;
  * n-gram Jaccard = shingle-explode + equi-join on shingle — the join key is
    rare by construction (long char shingles), so the pair blow-up is bounded;
    a ``max_shingle_df`` guard drops ubiquitous shingles (the classic
    stop-shingle fix for skew);
  * MinHash+LSH = signatures via ONE groupBy (k min-aggregates in a single
    pass), banding via a second small shuffle on (band_id, band_hash);
    candidate verification only touches candidate pairs, never n²;
  * SimHash = 64 bit-sum aggregates in one pass; near-dup = hamming ≤ r via
    band-exact match on 4×16-bit chunks (r<4 ⇒ at least one chunk equal);
  * embedding near-dup delegates to similarity.cosine_self_join.

Hash choice: ``hash_fn='xxhash64'`` (JVM, fast) for production;
``'md5'`` uses lexicographic MIN over md5 hex strings — bit-identical in any
SQL engine, which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.text import with_fingerprint


# ------------------------------------------------------------------ exact
def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on the normalized fingerprint; keeps min/max id per group.

    Returns (fingerprint, doc_id) — the survivor set. Join back to ``df`` on
    id to materialize surviving rows.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    fp = with_fingerprint(df, text_col)
    return fp.groupBy("fingerprint").agg(agg.alias(id_col))


# semanticHash(analyzed plan) -> partition count. The df.rdd probe forces a
# full physical-planning + RDD-DAG conversion (no job, but repeated per
# operator call it is pure waste — a multi-op dedup pipeline over one corpus
# used to re-plan the same scan 3-5x). Analysis is already cached by Spark,
# so the semanticHash key is nearly free; the RDD conversion runs once per
# distinct input plan.
_PARTN_CACHE: dict[tuple, int] = {}
_PARTN_PROBES: int = 0  # test hook: actual RDD conversions performed


def _input_partitions(df: DataFrame) -> int:
    global _PARTN_PROBES
    try:
        # semanticHash alone is STALE-PRONE: HadoopFsRelation canonicalizes
        # by root path + schema, not file list, so a directory rewritten
        # mid-session (compaction, overwrite) would keep serving the old
        # count — and silently skip the anti-straggler repartition. Folding
        # the scan's file list into the key (metadata-only; the file index
        # is already materialized by analysis) invalidates on any layout
        # change. Non-file plans hash an empty list, falling back to plain
        # semanticHash behavior.
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            hash(tuple(df.inputFiles())),
        )
    except Exception:  # pragma: no cover - connect/alt backends: probe directly
        key = None
    if key is not None and key in _PARTN_CACHE:
        return _PARTN_CACHE[key]
    _PARTN_PROBES += 1
    n = df.rdd.getNumPartitions()
    if key is not None:
        if len(_PARTN_CACHE) > 1024:
            _PARTN_CACHE.clear()
        _PARTN_CACHE[key] = n
    return n


def _parallelize_before_explode(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism BEFORE an explode when
    the input has fewer partitions than cores.

    The shingle explode inflates rows ~25x and its output partitioning
    mirrors the input's — a coarsely-partitioned (or single-file) input
    serializes the whole expansion onto a handful of tasks (measured: the
    ENTIRE minhash pipeline ran as 1-task stages on a one-file corpus).
    Shuffling the narrow PRE-explode rows is ~25x cheaper than anything
    downstream, and at 100 TB this still holds: a 128 MB scan split
    explodes to ~3 GB of shingle rows, so finer pre-explode splits are the
    right trade at every scale. No-op when the input is already at least
    as parallel as the cluster. The partition-count probe is memoized per
    analyzed plan (:func:`_input_partitions`) so repeated pair ops over
    the same corpus don't re-run the RDD conversion."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if _input_partitions(df) < target:
        return df.repartition(target)
    return df


# ------------------------------------------------------------ shingling
def normalize_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase normalization (shared with the oracle)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def char_shingles(text: Column, n: int, normalized: bool = False) -> Column:
    """Distinct character n-grams of the normalized text, as an array.

    ``transform(sequence(...))`` keeps it expression-only; callers explode.

    PITFALL (measured 5x): expressions referenced inside a higher-order-
    function lambda are re-evaluated PER ELEMENT — Catalyst does no common-
    subexpression elimination across the lambda boundary, so an inline
    ``regexp_replace`` normalization runs len(text) times per row. Callers
    must project the normalization into a real column first and pass
    ``normalized=True`` (``_shingle_table`` does); the inline path is kept
    only for ad-hoc literals."""
    norm = text if normalized else normalize_text(text)
    count = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count), lambda i: F.substring(norm, i, n)
    )
    return F.array_distinct(
        F.when(count <= 0, F.array(norm)).otherwise(grams)
    )


def _shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
    persist: bool = False,
) -> DataFrame:
    """(_id, _sh string, _shk long) exploded shingle table.

    ``_shk = xxhash64(_sh)`` is the 8-byte join/groupBy key — joins on the
    raw n-char string shuffle 3x the bytes and compare slower for identical
    results (a 64-bit collision inside one doc's ~10^2-shingle set is
    ~10^-15). ``persist=True`` caches the table: the pair operators branch
    over it 3-5 times (freq gate, both join sides, per-doc counts), and
    without a persist Spark re-runs the explode + per-doc substring
    generation for every branch — measured 3x wall-clock on the sf0.1
    corpus."""
    normed = df.select(
        F.col(id_col).alias("_id"), normalize_text(F.col(text_col)).alias("_norm")
    )
    normed = _parallelize_before_explode(normed)
    sh = normed.select(
        "_id",
        F.explode(char_shingles(F.col("_norm"), n, normalized=True)).alias("_sh"),
    ).withColumn("_shk", F.xxhash64("_sh"))
    if max_shingle_df:
        # Anti-join against the OVER-cap set, which is tiny by construction
        # (stop-shingles are the rare high-df tail), not an inner join against
        # the near-total keep set — the keep-side join shuffled the full
        # shingle table; the broadcast anti is one map-side pass, no shuffle.
        freq = sh.groupBy("_shk").agg(F.count(F.lit(1)).alias("_df"))
        drop = freq.filter(F.col("_df") > max_shingle_df).select("_shk")
        sh = sh.join(F.broadcast(drop), "_shk", "left_anti")
        # ... but the downstream pair self-join NEEDS hash(_shk) partitioning,
        # which the old shuffle-join provided as a side effect. A map-side
        # anti alone leaves scan partitioning in the persisted table and BOTH
        # self-join branches re-shuffle it (measured 2x on ngram_jaccard).
        # One explicit repartition — of the kept rows only, after the gate —
        # restores it; cached branches then join exchange-free.
        sh = sh.repartition("_shk")
    if persist:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    return sh


# ------------------------------------------------------ n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 12,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    |A∩B| from the shingle equi-join, |A|+|B| from per-doc shingle counts;
    J = inter / (na + nb - inter). Columns: id_a, id_b, jaccard.
    """
    sh = _shingle_table(df, id_col, text_col, n, max_shingle_df, persist=True)
    counts = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))

    a = sh.select(F.col("_id").alias("id_a"), "_shk")
    b = sh.select(F.col("_id").alias("id_b"), "_shk")
    inter = (
        a.join(b, "_shk")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(counts.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(counts.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# --------------------------------------------------------- MinHash LSH
def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature — k min-aggregates in ONE pass over the
    exploded shingle table. Columns: _id, mh_0..mh_{k-1}."""
    sh = _shingle_table(df, id_col, text_col, shingle_n, None)
    return _signatures_from_shingles(sh, num_hashes, hash_fn)


def _signatures_from_shingles(sh: DataFrame, num_hashes: int, hash_fn: str) -> DataFrame:
    aggs = []
    for s in range(num_hashes):
        if hash_fn == "md5":
            h = F.md5(F.concat(F.col("_sh"), F.lit(f"#{s}")))
        else:
            h = F.xxhash64(F.col("_sh"), F.lit(s)).cast("string")
        aggs.append(F.min(h).alias(f"mh_{s}"))
    return sh.groupBy("_id").agg(*aggs)


def band_structs(num_hashes: int, bands: int, mh=None) -> list:
    """THE banding formula — md5 over the '|'-joined signature rows of each
    band, as ``struct<band:int, bh:string>`` expressions.

    This is the single definition all three banding sites share
    (:func:`minhash_lsh_pairs` buckets, :func:`with_minhash_bands`
    streaming lane, ``incremental_dedup._band_rows`` index rows). The
    whole incremental/streaming design depends on these bucketing
    BIT-IDENTICALLY: a persisted index hashed with a drifted copy of the
    formula would silently never match new batches. ``mh`` maps a
    signature index to its Column (default: the exploded-lane ``mh_{i}``
    naming)."""
    if mh is None:
        mh = lambda i: F.col(f"mh_{i}")  # noqa: E731
    rows_per_band = num_hashes // bands
    out = []
    for b in range(bands):
        chunk = [mh(b * rows_per_band + r) for r in range(rows_per_band)]
        out.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *chunk)).alias("bh"))
        )
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 12,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH near-dup pipeline: signature → band buckets → candidate pairs →
    exact Jaccard verification on candidates only.

    Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold. With k=16,
    b=4 (r=4 rows/band) the S-curve crosses ~0.5 — tune k/b per corpus.

    ``shingles``: a precomputed (ideally persisted) ``_shingle_table(df)``
    output; callers that also need the shingle table elsewhere (e.g. the
    incremental-dedup index builder) pass it in so the explode runs once
    per pipeline, not once per operator.
    """
    # ONE persisted shingle table feeds signatures AND verification — the
    # explode/substring generation runs once, not once per plan branch
    sh = shingles if shingles is not None else _shingle_table(
        df, id_col, text_col, shingle_n, None, persist=True
    )
    sig = _signatures_from_shingles(sh, num_hashes, hash_fn)

    buckets = sig.select(
        "_id", F.explode(F.array(*band_structs(num_hashes, bands))).alias("bb")
    ).select("_id", F.col("bb.band").alias("_band"), F.col("bb.bh").alias("_bh"))

    l = buckets.select(F.col("_id").alias("id_a"), "_band", "_bh")
    r = buckets.select(F.col("_id").alias("id_b"), "_band", "_bh")
    cand = (
        l.join(r, ["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # verify candidates with exact Jaccard (join back to shingle sets)
    counts = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_id").alias("id_a"), "_shk")
    b2 = sh.select(F.col("_id").alias("id_b"), "_shk")
    inter = (
        cand.join(a, "id_a")
        .join(b2, ["id_b", "_shk"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.join(counts.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(counts.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def with_minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 12,
    hash_fn: str = "xxhash64",
    shingle_col: str = "_shg",
    band_col: str = "_bands",
) -> DataFrame:
    """STATELESS per-row MinHash banding: appends ``shingle_col`` (the
    distinct shingle array) and ``band_col`` (array<struct<band, bh>>) as
    pure expressions — no explode/groupBy, so it composes with Structured
    Streaming in append mode (the streaming near-dup lane).

    EXACT parity with the exploded batch lane: ``array_min`` over the
    per-shingle hash strings equals ``groupBy(_id).agg(min(...))`` over the
    exploded shingle table (both are lexicographic string mins over the
    same distinct set), and the band hash is the same '|'-joined md5 as
    :func:`minhash_lsh_pairs` / ``incremental_dedup._band_rows`` — pinned
    by tests. (Batch pair ops keep the exploded path: one explode feeding
    k min-aggregates measured faster there because the shingle array is
    computed once, not once per signature column — here the array IS a
    real column, so the same holds.)
    """
    out = df.withColumn("__mh_norm", normalize_text(F.col(text_col))).withColumn(
        shingle_col, char_shingles(F.col("__mh_norm"), shingle_n, normalized=True)
    )
    # NB: transform() inspects lambda ARITY — a 2-arg lambda receives
    # (element, index), so `lambda x, s=s:` closures silently bind the
    # element index as the seed. Close over the seed with a factory.
    def _seed_hash(s: int):
        if hash_fn == "md5":
            return lambda x: F.md5(F.concat(x, F.lit(f"#{s}")))
        return lambda x: F.xxhash64(x, F.lit(s)).cast("string")

    sig_cols = []
    for s in range(num_hashes):
        sig_cols.append(
            F.array_min(F.transform(F.col(shingle_col), _seed_hash(s))).alias(
                f"__mh_{s}"
            )
        )
    out = out.select("*", *sig_cols)
    out = out.withColumn(
        band_col,
        F.array(*band_structs(num_hashes, bands, mh=lambda i: F.col(f"__mh_{i}"))),
    )
    return out.drop("__mh_norm", *[f"__mh_{s}" for s in range(num_hashes)])


# ------------------------------------------------------------- SimHash
def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc: explode shingles, hash each, then for every bit
    position sum ±1 and take the sign — ``bits`` sum-aggregates fused into
    one groupBy pass. Returns (_id, simhash:long).

    ``hash_fn='xxhash64'`` (default): 64-bit JVM hash, production path.
    ``hash_fn='md5'``: 60-bit hash from the first 15 hex chars of md5 —
    bit-identical in any SQL engine (DuckDB: ``CAST('0x'||substr(md5(sh),
    1,15) AS BIGINT)``), which is what the exact oracle replays; forces
    ``bits=60``."""
    if hash_fn == "md5":
        bits = 60
    sh = _shingle_table(df, id_col, text_col, shingle_n, None)
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.col("_sh")), 1, 15), 16, 10).cast("long")
    else:
        h = F.col("_shk")  # already xxhash64(_sh)
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = sh.groupBy("_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # top bit = long sign bit
        sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0))
    return sums.select("_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming: candidates share
    at least one of four signature chunks (equi-joins, no n² compare). By the
    pigeonhole principle the candidate set is COMPLETE for max_hamming < 4 —
    every qualifying pair shares a chunk — so the output is exactly the
    brute-force hamming ball; for 4..7 it is a documented approximation
    (recall < 1 possible)."""
    sig = simhash(df, id_col, text_col, shingle_n, hash_fn=hash_fn)
    cbits = (60 if hash_fn == "md5" else 64) // 4
    mask = (1 << cbits) - 1
    chunks = sig.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * cbits)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("_id", "simhash", F.col("ch.chunk").alias("_c"), F.col("ch.cv").alias("_cv"))
    l = chunks.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), "_c", "_cv")
    r = chunks.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), "_c", "_cv")
    cand = (
        l.join(r, ["_c", "_cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ---------------------------------------------------- dedup clustering
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Cluster near-dup PAIRS into components: (node, component) where
    component = min node id reachable through the pair graph.

    This is the step a real dedup pipeline needs after pair generation —
    "keep one doc per duplicate CLUSTER", not per pair (pairs (a,b),(b,c)
    must collapse to one survivor, not two).

    Distributed min-label propagation: every node starts labeled with
    itself; each round every node takes the min of its own label and its
    neighbors' labels (one join + one groupBy per round, all map-side-
    combinable). Each round is a
    neighbor-min step plus a POINTER JUMP (follow the label's own label —
    path compression), so a diameter-D component converges in O(log D)
    rounds; near-dup components are overwhelmingly tiny cliques/chains,
    closing in 2-3 rounds. Raises instead of silently returning partial
    labels if max_iters is ever exceeded (that would under-deduplicate).

    SMALL-GRAPH FAST PATH: with at most ``driver_threshold`` edges the edge
    list is pulled to the driver through Arrow (``toPandas`` → primitive
    columns, ~16 MB for 1M long-id edges; string ids cost their bytes —
    NOT PySpark ``Row`` objects, which would be hundreds of MB of Python
    heap at 1M rows) and solved with a driver-side union-find — identical
    min-label output, zero iterative rounds, none of the per-round job
    overhead that dominates below ~4M edges. The pair pipeline is persisted
    before the probe, so when the graph EXCEEDS the threshold the
    distributed path reuses the already-computed pairs instead of
    re-running pair generation. The edge set of a NEAR-DUP graph is small
    relative to the corpus by construction (pair generation is
    thresholded), so this path serves most real runs; pass
    ``driver_threshold=0`` to force the distributed path. Each round's
    label table is
    ``localCheckpoint``-ed: iterative self-joins grow the LOGICAL PLAN
    exponentially across rounds and OOM the driver during planning by ~12
    iterations — truncating lineage per round is the standard fix for
    iterative DataFrame algorithms (at cluster scale use a reliable
    ``checkpoint`` dir so executor loss stays recoverable). The driver sees
    only the per-round convergence count.
    """
    from pyspark import StorageLevel

    # persist hygiene: never persist (and later evict) a DataFrame the
    # CALLER already cached, and release our own persists on every exit
    # path — including exceptions — via the try/finally below.
    pairs_persisted = False
    edges = None
    try:
        if driver_threshold:
            # one capped Arrow collect decides AND feeds the fast path; the
            # persist means an over-threshold probe hands its (already
            # computed) pair partitions to the distributed path instead of
            # re-running the pair pipeline
            if not pairs.is_cached:
                pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
                pairs_persisted = True
            # count first, collect from cache second: a limit().toPandas()
            # probe would run Spark's ESCALATING collect-limit (jobs over
            # 1, 4, 16, ... partitions, each re-analyzing the deep pair-
            # pipeline plan) — one count materializes the persisted pairs
            # in a single pass and the under-threshold collect then reads
            # pure cache; the over-threshold case loses nothing because
            # the distributed path consumes every cached partition anyway
            n_edges = pairs.count()
            if n_edges <= driver_threshold:
                head = pairs.select(id_a, id_b).toPandas()
                schema = pairs.select(
                    F.col(id_a).alias("node"), F.col(id_a).alias("component")
                ).schema
                sample = list(
                    zip(head.iloc[:, 0].tolist(), head.iloc[:, 1].tolist())
                )
                return _connected_components_driver(
                    pairs.sparkSession, sample, schema
                )

        edges = (
            pairs.select(F.col(id_a).alias("_s"), F.col(id_b).alias("_d"))
            .unionByName(
                pairs.select(F.col(id_b).alias("_s"), F.col(id_a).alias("_d"))
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return _cc_distributed(edges, max_iters)
    finally:
        if edges is not None:
            edges.unpersist()
        if pairs_persisted:
            pairs.unpersist()


def _cc_distributed(edges: DataFrame, max_iters: int) -> DataFrame:
    """The distributed pointer-jump loop over a persisted symmetric edge
    table; each round's label table is localCheckpoint-ed (eager), so the
    returned labels do not depend on ``edges`` staying cached."""
    labels = (
        edges.select(F.col("_s").alias("_n"))
        .distinct()
        .withColumn("_lbl", F.col("_n"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        # (a) neighbor-min: each node takes the min of its neighbors' labels
        nbr_min = (
            edges.join(labels, edges["_d"] == labels["_n"])
            .groupBy("_s")
            .agg(F.min("_lbl").alias("_nbr"))
        )
        stepped = labels.join(nbr_min, labels["_n"] == nbr_min["_s"], "left").select(
            "_n",
            F.col("_lbl").alias("_old"),
            F.least(F.col("_lbl"), F.coalesce(F.col("_nbr"), F.col("_lbl"))).alias("_mid"),
        )
        # (b) pointer jump (path compression): follow the label's own label —
        # halves the remaining path length every round, so a diameter-D
        # chain converges in O(log D) rounds instead of D
        ptr = stepped.select(F.col("_n").alias("_m"), F.col("_mid").alias("_plbl"))
        new_labels = (
            stepped.join(ptr, stepped["_mid"] == ptr["_m"], "left")
            .select(
                "_n",
                F.least(F.col("_mid"), F.coalesce(F.col("_plbl"), F.col("_mid"))).alias("_lbl"),
                "_old",
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_lbl") < F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "the pair graph has a component with diameter > max_iters "
            "(silently returning partial labels would under-deduplicate); "
            "raise max_iters or switch to star-contraction for such graphs"
        )
    return labels.select(F.col("_n").alias("node"), F.col("_lbl").alias("component"))


def _connected_components_driver(spark, rows, schema) -> DataFrame:
    """Driver-side union-find over a collected (bounded) edge list.

    Same output contract as the distributed path: (node, component) with
    component = MIN node id reachable through the pair graph. Union by
    min-root + path compression — O(E·α(N))."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the MIN id as the root so the label IS the min node id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {x for r in rows for x in (r[0], r[1])}
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(out, schema)


def dedup_cluster_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min",
    score_col: str | None = None,
) -> DataFrame:
    """Survivor set after clustering: every doc keeps its component's
    canonical representative; docs in no pair survive as themselves.
    ``keep='min'``/``'max'`` picks by id; ``keep='score'`` picks the
    component member with the HIGHEST ``score_col`` (id-desc tie-break)
    — "keep the best-quality duplicate, not the first-crawled one", the
    policy production dedup actually wants (a canonical page beats a
    mirror even when the mirror has the smaller id). The score pick is
    one ``max(struct(score, id))`` aggregate over the component table —
    partition-invariant, no window. LEFT join against the (small
    relative to the corpus) component table — broadcast when it fits,
    else sort-merge via AQE."""
    if keep not in ("min", "max", "score"):
        raise DataFrameValidationError("keep must be 'min', 'max' or 'score'")
    comp = connected_components(pairs, "id_a", "id_b")
    if keep == "min":
        # the component label IS the min node id — no extra aggregate
        lbl = comp.select(F.col("node").alias(id_col), F.col("component").alias("_rep"))
    elif keep == "max":
        rep = comp.groupBy("component").agg(F.max("node").alias("_rep"))
        lbl = comp.join(rep, "component").select(F.col("node").alias(id_col), "_rep")
    else:
        if score_col is None or score_col not in df.columns:
            raise DataFrameValidationError(
                "dedup_cluster_survivors: keep='score' needs a score_col "
                f"present in df (got {score_col!r})"
            )
        scored = comp.join(
            df.select(F.col(id_col).alias("node"), F.col(score_col).alias("_sc")),
            "node",
        )
        rep = scored.groupBy("component").agg(
            F.max(F.struct(F.col("_sc"), F.col("node"))).alias("_b")
        ).select("component", F.col("_b.node").alias("_rep"))
        lbl = comp.join(rep, "component").select(F.col("node").alias(id_col), "_rep")
    return df.join(lbl, id_col, "left").withColumn(
        "canonical_id", F.coalesce(F.col("_rep"), F.col(id_col))
    ).drop("_rep")


# ----------------------------------------------- duplicate token spans
#: Unit separator — joins n-gram words into one key; cannot appear inside a
#: whitespace-split token, so distinct gram tuples never alias (the comma-
#: aliasing bug class fixed in contamination.py).
SPAN_SEP = "\x1f"


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_total: int = 2,
) -> DataFrame:
    """Per-document duplicate token-span statistics — the distributed
    approximation of exact-substring training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a word
    n-gram that occurs ``>= min_total`` times corpus-wide (within OR across
    documents) marks a duplicated span.

    Lee et al. build a suffix array — inherently sequential and
    memory-resident. The shuffle-native equivalent is fixed-n gram
    counting: any duplicated substring of >= n words contributes >= 1
    duplicated n-gram, so the per-doc duplicated-gram fraction is the
    span-level dup signal (this is the shape production corpus pipelines
    use, e.g. bloom-filter paragraph dedup).

    Plan shape: positional word n-grams (expression-only transform; grams
    hashed to 8-byte xxhash64 keys — stats are count-based, so any
    injective-modulo-collision key gives identical output and the oracle
    can group the raw gram strings instead) → corpus totals via one
    map-side-combinable aggregate → filter to the DUPLICATED gram set
    (the rare tail — 2-5% of grams in a real corpus) → join the gram
    stream against that SMALL set only → per-doc rollup. The per-doc
    denominator ``n_grams`` is a pure expression on the word array
    (``max(len-n+1, 0)``) — no join at all. Joining the full gram stream
    against the full totals table (the naive shape) shuffled 2× the gram
    volume and measured 0.47 scaling efficiency at 2→8 cores; the
    dup-set join restores the dedup-family shape (small build side).
    Docs shorter than n words have zero grams and report (0, 0, 0.0) via
    the final left join — never silently dropped.

    Output: (id, n_grams, n_dup_grams, dup_span_ratio) — ratio is an
    int/int double, bit-identical in any engine.
    """
    if n < 1:
        raise DataFrameValidationError("n must be >= 1")
    if min_total < 2:
        raise DataFrameValidationError("min_total must be >= 2 (1 would flag every gram)")
    base = _parallelize_before_explode(
        df.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
        )
    )
    cnt = F.size("_w") - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.xxhash64(F.array_join(F.slice(F.col("_w"), i, n), SPAN_SEP)),
    )
    # sequence(1, cnt) counts DOWN when cnt < 1 (Spark's default step is -1
    # for start > stop) — guard short docs to an empty gram array explicitly
    g = base.select(
        id_col,
        F.explode(
            F.when(cnt >= 1, grams).otherwise(F.array().cast("array<bigint>"))
        ).alias("_gh"),
    )
    from pyspark import StorageLevel

    # the gram stream branches (corpus totals + the dup-set join) —
    # persist so the explode + hashing runs once
    g = g.persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        g.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_tot"))
        .filter(F.col("_tot") >= min_total)
        .select("_gh")
    )
    nd = g.join(dup, "_gh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_dup")
    )
    from temporalscope_spark.core.caching import hold

    return hold(
        base.select(id_col, F.greatest(cnt, F.lit(0)).cast("long").alias("n_grams"))
        .join(nd, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("_n_dup", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.when(F.col("n_grams") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("_n_dup", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            )
            .alias("dup_span_ratio"),
        ),
        g,
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_total: int = 2,
) -> DataFrame:
    """Exact-substring span REMOVAL — the transform half of Lee et al. 2022
    training-data dedup: strip every word position covered by an n-gram
    that occurs ``>= min_total`` times corpus-wide, and re-emit the
    surviving text. ``dup_span_stats`` measures; this one edits.

    Semantics (the distributed relaxation, deliberately symmetric): ALL
    occurrences of a duplicated n-gram are removed, including the "first"
    one — keep-one-occurrence needs a global document order and a
    sequential sweep, which is exactly what a shuffle-native pipeline must
    not depend on. Removing both sides is what bloom-filter span dedup
    ships in practice, and is deterministic under any partitioning.

    Plan shape: positional grams (expression-only; xxhash64 keys) → one
    map-side-combinable corpus count → the duplicated-gram set joins back
    on the gram hash → covered positions explode (each gram covers i..
    i+n-1) → distinct (doc, pos) → broadcast-free LEFT ANTI against the
    positional words → per-doc ordered rebuild via sorted struct
    collect_list. Shuffles are keyed on gram hash and doc id only; no
    all-pairs stage. Docs with no duplicated span pass through verbatim
    (modulo whitespace normalization — this operator re-emits normalized
    text, like every rewrite lane in this package).

    Output: (id, cleaned_text, n_kept, n_removed).
    """
    if n < 1:
        raise DataFrameValidationError("n must be >= 1")
    if min_total < 2:
        raise DataFrameValidationError("min_total must be >= 2 (1 would remove every gram)")
    norm = normalize_text(F.col(text_col))
    base = _parallelize_before_explode(
        df.select(
            F.col(id_col),
            F.when(F.length(norm) == 0, F.array().cast("array<string>"))
            .otherwise(F.split(norm, " "))
            .alias("_w"),
        )
    )
    cnt = F.size("_w") - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.struct(
            i.alias("_i"),
            F.xxhash64(F.array_join(F.slice(F.col("_w"), i, n), SPAN_SEP)).alias(
                "_gh"
            ),
        ),
    )
    from pyspark import StorageLevel

    # the positional gram stream branches (duplicated-gram set + covered-
    # position join) — persist so the explode runs once
    g = (
        base.select(
            id_col,
            F.explode(
                F.when(cnt >= 1, grams).otherwise(
                    F.array().cast("array<struct<_i:int,_gh:bigint>>")
                )
            ).alias("_g"),
        )
        .select(id_col, F.col("_g._i").alias("_i"), F.col("_g._gh").alias("_gh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = (
        g.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_tot"))
        .filter(F.col("_tot") >= min_total)
        .select("_gh")
    )
    covered = (
        g.join(dup, "_gh")
        .select(
            id_col,
            F.explode(F.sequence("_i", F.col("_i") + F.lit(n - 1))).alias("_p"),
        )
        .distinct()
    )
    words = base.select(
        id_col, F.posexplode("_w").alias("_p0", "_word")
    ).withColumn("_p", F.col("_p0") + 1)
    kept = words.join(covered, [id_col, "_p"], "left_anti")
    reb = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_word"))),
                lambda s: s["_word"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("_k"),
    )
    from temporalscope_spark.core.caching import hold

    return hold(
        base.select(id_col, F.size("_w").alias("_orig"))
        .join(reb, id_col, "left")
        .select(
            id_col,
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            F.coalesce("_k", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_orig") - F.coalesce("_k", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        ),
        g,
    )


# ------------------------------------------------------ line-level dedup
def _line_table(
    df: DataFrame, text_col: str, id_col: str, sep: str
) -> DataFrame:
    """(id, _p, _line, _key): every line of every document with its
    1-based position and md5 key — the shared input of the one-shot and
    incremental line-dedup lanes."""
    import re as _re

    base = _parallelize_before_explode(
        df.select(
            F.col(id_col),
            F.split(F.col(text_col), _re.escape(sep)).alias("_ls"),
        )
    )
    return base.select(
        id_col, F.posexplode("_ls").alias("_p0", "_line")
    ).select(
        id_col,
        (F.col("_p0") + 1).alias("_p"),
        "_line",
        F.md5(F.col("_line")).alias("_key"),
    )


def _reassemble_lines(
    lines_with_keep: DataFrame, id_col: str, sep: str
) -> DataFrame:
    """Per-doc ordered rebuild of the kept lines (bounded by document
    length): (id, cleaned_text, n_lines, n_kept)."""
    return lines_with_keep.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_p", "_line"))
                    )
                ),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("cleaned_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Line/paragraph-level corpus dedup — the CCNet pass (Wenzek et al.
    2020 §3.1): hash every LINE of every document, count occurrences
    corpus-wide, and drop lines that appear ``>= min_count`` times. With
    ``keep_first=True`` (CCNet's shard behavior) the globally first
    occurrence — minimum ``(doc id, position)`` — survives; with False all
    duplicated occurrences are stripped (the symmetric convention
    ``remove_dup_spans`` uses for n-gram spans). This is the boilerplate
    killer for web corpora: navigation bars, cookie banners and license
    footers repeat verbatim across millions of pages and dominate naive
    token counts.

    The reference engine has no corpus operators; this extends its
    single-table design (``/root/reference/src/temporalscope/core/
    temporal_data_loader.py``) to the documents table the way the rest of
    the dedup family does.

    Plan shape (all equi-keyed, never all-pairs): split → posexplode (one
    narrow map over the corpus) → ONE map-side-combinable groupBy on the
    md5 line key emitting ``(count, min struct(doc, pos))`` → the
    DUPLICATED-key subset (tiny relative to the line table, the
    dup_span_stats lesson) joins back on the key → per-doc ordered rebuild
    via sorted struct collect_list (bounded by document length). Unlike a
    global "first occurrence" SORT, the min-struct aggregation needs no
    ordering guarantee — it is partition-invariant by construction. At 100
    TB the md5 key can be swapped for ``xxhash64`` (shorter shuffle rows,
    no cross-engine oracle requirement in production).

    Empty text splits to one empty line, which dedups like any other line
    (identical in DuckDB ``string_split``). Output:
    ``(id, cleaned_text, n_lines, n_kept)`` — ``cleaned_text`` re-joins the
    surviving lines with ``sep`` in original order.
    """
    if min_count < 2:
        raise DataFrameValidationError(
            "min_count must be >= 2 (1 would drop every line)"
        )
    if not sep:
        raise DataFrameValidationError("sep must be a non-empty string")
    lines = _line_table(df, text_col, id_col, sep)
    # duplicated-key table: (key, first doc, first pos) — only keys at or
    # above min_count survive the filter, so the join build side is the
    # duplicate set, not the full line table
    dup = (
        lines.groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col).alias("_d"), F.col("_p").alias("_q"))).alias(
                "_first"
            ),
        )
        .filter(F.col("_c") >= min_count)
        .select("_key", "_first")
    )
    keep = F.col("_first").isNull()
    if keep_first:
        keep = keep | (
            (F.col("_first._d") == F.col(id_col)) & (F.col("_first._q") == F.col("_p"))
        )
    joined = lines.join(dup, "_key", "left").withColumn("_keep", keep)
    return _reassemble_lines(joined, id_col, sep)


def line_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Build the corpus LINE INDEX for incremental line dedup:
    ``(_key, _c, _first)`` — per md5 line key, its corpus occurrence count
    and the minimum ``(doc, pos)`` occurrence. One map-side-combinable
    aggregation; the index is line-scale but never needs the corpus text
    again. Persist it (or land it as an append-only snapshot table) and
    feed :func:`dedup_lines_incremental` / :func:`merge_line_index`.
    """
    return (
        _line_table(df, text_col, id_col, sep)
        .groupBy("_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.min(F.struct(F.col(id_col).alias("_d"), F.col("_p").alias("_q"))).alias(
                "_first"
            ),
        )
    )


def merge_line_index(index: DataFrame, batch_index: DataFrame) -> DataFrame:
    """Fold a batch's :func:`line_index` into the corpus index: counts add,
    first-occurrence structs take the min. A full outer union+groupBy on
    the key — batch-index-sized new rows, one shuffle keyed on the line
    key. Associative and commutative, so batches may land in any order."""
    return (
        index.unionByName(batch_index)
        .groupBy("_key")
        .agg(
            F.sum("_c").cast("long").alias("_c"),
            F.min("_first").alias("_first"),
        )
    )


def dedup_lines_incremental(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Incremental CCNet line dedup: dedup a NEW batch of documents against
    a persisted corpus :func:`line_index` WITHOUT rescanning the corpus —
    the shard reality of web-crawl curation (each new crawl dedups against
    all previous crawls). Exactly equivalent to running
    :func:`dedup_lines` over corpus ∪ batch and keeping the batch rows
    (pinned by test and by the driver oracle): combined counts are
    ``batch + index``, the survivor is the global minimum ``(doc, pos)``
    across both sides.

    Plan shape: the batch's line table aggregates once (batch-sized); the
    corpus index joins on the line key AFTER a LEFT SEMI against the
    batch's key set — so the corpus-scale index contributes only the keys
    this batch actually touches, and the corpus text never moves. Output
    matches :func:`dedup_lines` (batch docs only). Note a batch line whose
    key is already in the index is a duplicate even at batch count 1 —
    its first occurrence lives in the corpus, so with ``keep_first`` it
    survives only if the index's first is somehow larger (never, for
    id-ordered crawls) — exactly the one-shot semantics.
    """
    if min_count < 2:
        raise DataFrameValidationError(
            "min_count must be >= 2 (1 would drop every line)"
        )
    if not sep:
        raise DataFrameValidationError("sep must be a non-empty string")
    from pyspark import StorageLevel

    lines = _line_table(batch, text_col, id_col, sep).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        batch_idx = lines.groupBy("_key").agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.min(F.struct(F.col(id_col).alias("_d"), F.col("_p").alias("_q"))).alias(
                "_first"
            ),
        )
        touched = index.join(
            lines.select("_key").distinct(), "_key", "left_semi"
        )
        dup = (
            merge_line_index(touched, batch_idx)
            .filter(F.col("_c") >= min_count)
            .select("_key", "_first")
        )
        keep = F.col("_first").isNull()
        if keep_first:
            keep = keep | (
                (F.col("_first._d") == F.col(id_col))
                & (F.col("_first._q") == F.col("_p"))
            )
        joined = lines.join(dup, "_key", "left").withColumn("_keep", keep)
        out = _reassemble_lines(joined, id_col, sep)
        # materialize before releasing the shared line table
        return out.localCheckpoint()
    finally:
        lines.unpersist()


class LineDedupIndex:
    """Persisted line-dedup index — the snapshot-table lifecycle applied to
    CCNet line dedup (the ``DedupIndex``/``PostingsIndex`` pattern): the
    index lives as APPEND-ONLY per-batch :func:`line_index` partials in a
    :class:`~temporalscope_spark.datasets.snapshots.SnapshotTable`, folded
    at read (counts sum, first-occurrence structs min — associative, so
    fold order is irrelevant). Each arriving batch dedups against the
    index state BEFORE it (corpus + all earlier batches) and lands its own
    partial; corpus text is never rescanned and the index never rewrites.

    Streaming: :meth:`stream_sink` is a ``foreachBatch`` sink running
    :meth:`ingest_stream_batch` per micro-batch — idempotent under
    Structured Streaming's replay-on-failure contract via the batch-id
    manifest meta (a replayed commit is detected and skipped, so counts
    are never double-added).

    Online semantics (same as ``incremental_dedup``): a batch's survivors
    are final when emitted — a line first seen in batch k does not
    retroactively dedup batch k-1. This equals the one-shot
    :func:`dedup_lines` over everything landed so far, restricted to the
    newest batch (pinned by test).
    """

    _BKEY = "stream_batch_id"

    def __init__(
        self,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        sep: str = "\n",
        min_count: int = 2,
        keep_first: bool = True,
    ):
        import os as _os

        from temporalscope_spark.datasets.snapshots import SnapshotTable

        self.partials = SnapshotTable(_os.path.join(path, "line_partials"))
        self.text_col = text_col
        self.id_col = id_col
        self.sep = sep
        self.min_count = min_count
        self.keep_first = keep_first

    def build(self, corpus: DataFrame) -> int:
        """Land the v0 corpus partial; returns the snapshot version."""
        return self.partials.write(
            line_index(corpus, self.text_col, self.id_col, self.sep),
            mode="overwrite",
        )

    def index(self, spark) -> DataFrame:
        """Fold all landed partials into the current (key, count, first)
        index — ONE groupBy over the appended rows, the postings-index
        fold-at-read shape."""
        rows = self.partials.read(spark)
        return rows.groupBy("_key").agg(
            F.sum("_c").cast("long").alias("_c"),
            F.min("_first").alias("_first"),
        )

    def dedup_batch(self, batch: DataFrame) -> DataFrame:
        """Dedup a batch against the CURRENT index (does not land it)."""
        return dedup_lines_incremental(
            batch,
            self.index(batch.sparkSession),
            self.text_col,
            self.id_col,
            self.sep,
            self.min_count,
            self.keep_first,
        )

    def ingest_stream_batch(
        self, batch_df: DataFrame, batch_id: int, out_table=None
    ) -> DataFrame | None:
        """One idempotent micro-batch step: dedup against the pre-batch
        index, optionally land the cleaned output, then land this batch's
        partial. A replayed ``batch_id`` is a no-op (both commits carry it
        in manifest meta and are checked independently, so a crash BETWEEN
        the two commits replays only the missing one)."""
        if self.partials.version_with_meta(self._BKEY, batch_id) is not None:
            return None
        cleaned = self.dedup_batch(batch_df)
        if out_table is not None and (
            out_table.version_with_meta(self._BKEY, batch_id) is None
        ):
            out_table.write(cleaned, mode="append", meta={self._BKEY: batch_id})
        self.partials.write(
            line_index(batch_df, self.text_col, self.id_col, self.sep),
            mode="append",
            meta={self._BKEY: batch_id},
        )
        return cleaned

    def stream_sink(self, out_table=None):
        """``stream.writeStream.foreachBatch(idx.stream_sink(out)).start()``"""

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest_stream_batch(batch_df, batch_id, out_table)

        return sink


# ------------------------------------------------- winnowing fingerprints
def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every char k-gram of the
    normalized text, slide a ``window``-wide window over the hash sequence,
    keep each window's minimum. GUARANTEE: any substring match of length
    >= k + window - 1 between two docs produces at least one shared
    fingerprint — the local fingerprinting primitive for fuzzy/partial-copy
    detection (where whole-doc MinHash dilutes).

    Output: (id, fingerprint) distinct — join on fingerprint to find
    partial-overlap candidates; density is ~2/(window+1) of the k-gram
    count. Expression-only (no Python); the k-gram hash array is projected
    to a REAL column before the window pass — referencing it inside the
    window lambda would re-evaluate the whole array per window (no CSE
    across HOF lambda boundaries, the measured-5x pitfall).

    ``hash_fn='md5'``: 60-bit md5 lane, bit-identical in any SQL engine
    (the DuckDB oracle replays it); ``'xxhash64'`` for production.
    """
    if hash_fn == "md5":
        def hfn(s):
            return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    else:
        hfn = F.xxhash64
    normed = _parallelize_before_explode(
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
    )
    n_grams = F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: hfn(F.substring(F.col("_norm"), i, k))
    )
    hashed = normed.select(id_col, hs.alias("_hs"))
    n_win = F.greatest(F.size("_hs") - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
    )
    return hashed.select(
        id_col, F.explode(F.array_distinct(mins)).alias("fingerprint")
    )
