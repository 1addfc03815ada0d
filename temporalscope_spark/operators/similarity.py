"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates from bucket equi-joins, then exact
re-rank). Dot products run as ``F.aggregate(F.zip_with(...))`` — JVM
higher-order functions, no Python. The hyperplanes are hash-derived
(deterministic, seeded), so signatures are reproducible anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: ANSI mode (Spark 4 default) makes /0 throw — a zero-norm
    # vector should yield NULL similarity, not kill the job
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    One narrow map + a k-row total order: Spark's sort+limit executes as
    per-partition top-k then a driver merge (TakeOrderedAndProject) — no full
    global sort.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_self_join_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
    method: str = "gemm",
    num_blocks: int = 16,
    num_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup.

    Methods:

    - ``gemm`` (default, EXACT): triangular block decomposition — hash ids
      into ``num_blocks`` blocks, enumerate the nb(nb+1)/2 block pairs as a
      tiny literal table, route each vector to every block pair it
      participates in (equi-join on block id, n·nb shuffle rows — linear),
      then one BLAS matrix-multiply per block pair inside a cogrouped
      Arrow ``applyInPandas``. Exact same output as the brute path, no
      CartesianProduct node, and pair evaluation runs at GEMM speed
      instead of per-pair Catalyst expression trees (~100x). Exact
      all-pairs is inherently O(n²) work; this makes the constant small
      and the plan shuffle-linear. At corpus scale, compose with LSH/label
      blocking first (``method='lsh'`` or ``block_col``).
    - ``lsh`` (approximate, scale path): SRP-bucket blocking with
      multi-probe — the left side is replicated to every bucket within
      ``probe_hamming`` bit flips of its own, the right side stays at its
      own bucket, candidates equi-join on bucket, and survivors are
      exact-cosine verified. Output is always a SUBSET of the exact pair
      set (verification is exact); recall is P[hamming(sig_a, sig_b) <=
      probe_hamming], high for near-duplicate thresholds. One shuffle on
      the bucket key — never all-pairs.
    - ``brute``: n²/2 within ``block_col`` blocks (or full cross when
      ``block_col`` is None) with JVM expression dot products. Small sets /
      oracle duty only.

    Vectors are L2-NORMALIZED map-side before any join (n norm
    computations), so per-pair work is a single dot product."""
    if method not in {"gemm", "lsh", "brute"}:
        # an unrecognized method must NEVER fall through to the brute
        # crossJoin path — that is the O(n²) scale-killer
        raise ValueError("method must be 'gemm', 'lsh' or 'brute'")
    if method == "gemm":
        return _gemm_pairs(df, vec_col, id_col, threshold, num_blocks, block_col)
    if method == "lsh":
        bucketed = with_lsh_bucket(df, vec_col, num_planes, seed, dim=dim, out_col="_lshb")
        probes = _probe_offsets(num_planes, probe_hamming)
        left = bucketed.select(
            F.col(id_col), F.col(vec_col),
            F.explode(F.array(*[F.col("_lshb").bitwiseXOR(F.lit(m)) for m in probes])).alias("_blk"),
        )
        right = bucketed.withColumnRenamed("_lshb", "_blk")
        # exact verify inside buckets via the same GEMM kernel; composite
        # block key = lsh bucket (hamming-probed), pairs deduped by id order
        return _gemm_pairs_joined(left, right, vec_col, id_col, threshold)
    norm = _norm(F.col(vec_col))
    unit = F.transform(F.col(vec_col), lambda x: F.try_divide(x.cast("double"), norm))
    base = df.withColumn("_vn", unit)
    cols = [F.col(id_col).alias("id_a"), F.col("_vn").alias("_va")] + (
        [F.col(block_col).alias("_blk")] if block_col else []
    )
    cols_b = [F.col(id_col).alias("id_b"), F.col("_vn").alias("_vb")] + (
        [F.col(block_col).alias("_blk")] if block_col else []
    )
    a, b = base.select(*cols), base.select(*cols_b)
    joined = a.join(b, ["_blk"] if block_col else None) if block_col else a.crossJoin(b)
    out = (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return out


def _probe_offsets(num_planes: int, probe_hamming: int) -> list[int]:
    """XOR masks reaching every bucket within ``probe_hamming`` bit flips."""
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(num_planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return masks


def _pair_gemm_fn(threshold: float):
    import numpy as np  # noqa: PLC0415 — executor-side import
    import pandas as pd  # noqa: PLC0415

    def fn(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        if len(left) == 0 or len(right) == 0:
            return empty
        ids_l = left["_id"].to_numpy()
        ids_r = right["_id"].to_numpy()
        A = np.stack(left["_vec"].to_numpy()).astype(np.float64)
        B = np.stack(right["_vec"].to_numpy()).astype(np.float64)
        na = np.linalg.norm(A, axis=1, keepdims=True)
        nb_ = np.linalg.norm(B, axis=1, keepdims=True)
        na[na == 0.0] = np.inf  # zero-norm vectors never qualify (cos -> 0)
        nb_[nb_ == 0.0] = np.inf
        S = (A / na) @ (B / nb_).T
        ia, ib = np.nonzero(S >= threshold)
        if len(ia) == 0:
            return empty
        id_a, id_b = ids_l[ia], ids_r[ib]
        keep = id_a != id_b  # drop self-pairs
        lo = np.minimum(id_a[keep], id_b[keep])  # cross-block pairs appear in
        hi = np.maximum(id_a[keep], id_b[keep])  # one orientation only — keep
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": S[ia[keep], ib[keep]]})
        # diagonal blocks see both orientations of the (now-normalized) pair
        return out.drop_duplicates(["id_a", "id_b"])

    return fn


def _gemm_pairs_joined(
    left: DataFrame, right: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Cogroup ``left``/``right`` on their ``_blk`` column and GEMM each
    block; the kernel normalizes each pair to (min_id, max_id) and dedups
    within a block, and a final distinct-on-key aggregation removes
    duplicates across probed blocks."""
    # fresh aliases on both branches — shared lineage with identical
    # exprIds breaks cogroup column binding (see _gemm_pairs)
    lsel = left.select(
        F.col("_blk").alias("_blk"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    rsel = right.select(
        F.col("_blk").alias("_blk"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    out = lsel.groupBy("_blk").cogroup(rsel.groupBy("_blk")).applyInPandas(
        _pair_gemm_fn(threshold), "id_a long, id_b long, cosine double"
    )
    # multi-probe can emit a pair once per shared probed bucket
    return out.groupBy("id_a", "id_b").agg(F.first("cosine").alias("cosine"))


def _gemm_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_blocks: int,
    block_col: str | None,
) -> DataFrame:
    nb = max(1, num_blocks)
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int")
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), blk.alias("_b"))
    if block_col is not None:
        base = df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), blk.alias("_b"),
            F.col(block_col).alias("_ublk"),
        )
    # route each vector to every block pair where it plays left / right via
    # a literal pair-id lookup table indexed by block — pure projection +
    # explode, no join; the only exchange is the cogroup shuffle on pair_id
    left_ids = F.array(*[
        F.array(*[F.lit(i * nb + j) for j in range(i, nb)]) for i in range(nb)
    ])
    right_ids = F.array(*[
        F.array(*[F.lit(k * nb + i) for k in range(0, i + 1)]) for i in range(nb)
    ])
    key = ["pair_id"] + (["_ublk"] if block_col is not None else [])
    extra = ["_ublk"] if block_col is not None else []
    lhs = base.select(
        F.explode(F.element_at(left_ids, F.col("_b") + 1)).alias("pair_id"),
        *extra, "_id", "_vec",
    )
    # fresh aliases on the right branch: both sides share the same `base`
    # lineage, and identical attribute exprIds break the cogroup's column
    # binding (the right pdf arrives with only the grouping key)
    rhs = base.select(
        F.explode(F.element_at(right_ids, F.col("_b") + 1)).alias("pair_id"),
        *[F.col(c).alias(c) for c in extra],
        F.col("_id").alias("_id"), F.col("_vec").alias("_vec"),
    )
    out = lhs.groupBy(*key).cogroup(rhs.groupBy(*key)).applyInPandas(
        _pair_gemm_fn(threshold), "id_a long, id_b long, cosine double"
    )
    # each unordered pair is seen exactly once: (block_x, block_y) maps to
    # the single (bi<=bj) pair_id; same-block pairs dedup via id_a < id_b
    return out.select("id_a", "id_b", "cosine")


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from integer hashing
    (splitmix64-style scramble) — no RNG state, reproducible everywhere."""
    vals = []
    for j in range(dim):
        x = (plane_idx * 1_000_003 + j * 97 + seed) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        vals.append((x / 2**64) * 2.0 - 1.0)
    return vals


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id: sign bit per plane → int.

    Cosine-similar vectors collide with prob 1 - θ/π per bit. 8 planes → 256
    buckets; at corpus scale repartition by bucket and search within.
    """
    if dim is None:
        # eager one-row job at plan-build time; pass dim to avoid it. An
        # empty input gets a placeholder dim — output is empty either way
        row = df.select(vec_col).first()
        dim = len(row[0]) if row is not None and row[0] is not None else 1
    bucket = F.lit(0)
    for p in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("int")
        bucket = bucket + bit * F.lit(1 << p)
    return df.withColumn(out_col, bucket)


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket ± buckets within
    ``probe_hamming`` bit flips, exact re-rank inside the probed set.

    At 1e12 scale the bucketed table is pre-materialized (partitioned by
    bucket → partition pruning turns this into a handful-of-buckets scan).
    """
    dim = len(query_vec)
    sig = 0
    for p in range(num_planes):
        plane = _hyperplane(dim, p, seed)
        if sum(q * v for q, v in zip(query_vec, plane)) > 0:
            sig |= 1 << p
    probes = {sig}
    if probe_hamming >= 1:
        probes |= {sig ^ (1 << i) for i in range(num_planes)}
    if probe_hamming >= 2:
        for i in range(num_planes):
            for j in range(i + 1, num_planes):
                probes.add(sig ^ (1 << i) ^ (1 << j))

    bucketed = with_lsh_bucket(df, vec_col, num_planes, seed, dim)
    cand = bucketed.filter(F.col("lsh_bucket").isin(sorted(probes)))
    return cosine_topk(cand, query_vec, vec_col, id_col, k)


def ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    seed: int = 42,
    refine_iters: int = 1,
    seed_hash: str = "xxhash64",
) -> list[list[float]]:
    """IVF coarse quantizer: deterministic seed sample + distributed Lloyd
    refinement.

    Seeds = the ``num_centroids`` rows with smallest ``xxhash64(id, seed)``
    (reproducible, one TakeOrdered job — no RNG state); ``seed_hash='md5'``
    orders by ``md5(id || '#seed')`` instead — bit-identical in any SQL
    engine, which is what the driver's DuckDB oracle replays. Each refinement
    iteration assigns every vector to its nearest centroid JVM-side and
    recomputes centroids as per-dimension means via posexplode + groupBy —
    a single shuffle keyed on (cell, dim), fully distributed; only the
    C×dim centroid table ever reaches the driver.
    """
    if seed_hash == "md5":
        order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    else:
        order = F.xxhash64(F.col(id_col), F.lit(seed))
    rows = (
        df.select(vec_col)
        .orderBy(order)
        .limit(num_centroids)
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in rows]

    for _ in range(max(0, refine_iters)):
        assigned = with_ivf_cell(df, cents, vec_col=vec_col, out_col="__cell")
        means = (
            assigned.select("__cell", F.posexplode(F.col(vec_col)).alias("__dim", "__v"))
            .groupBy("__cell", "__dim")
            .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
            .groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m"))).alias("__dm"))
            .select("__cell", F.transform("__dm", lambda s: s["__m"]).alias("__c"))
            .collect()
        )
        new = {r["__cell"]: [float(x) for x in r["__c"]] for r in means}
        # empty cells keep their previous centroid
        cents = [new.get(i, c) for i, c in enumerate(cents)]
    return cents


def with_ivf_cell(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine, expression-only.

    Score against centroid c is dot(v,c)/||c|| (the vector's own norm is
    common across cells, so argmax is unchanged). The argmax runs as
    ``array_max`` over an array of (score, idx) structs — struct comparison
    is field-ordered, so the max struct carries the winning cell id. All JVM
    expressions; the C×dim centroid table is inlined as literals (broadcast
    to every task with the plan — no join, no Python).
    """
    scored = []
    for i, c in enumerate(centroids):
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        lit = F.array(*[F.lit(float(x)) for x in c])
        scored.append(
            F.struct(
                (_dot(F.col(vec_col), lit) / F.lit(norm)).alias("score"),
                F.lit(i).alias("idx"),
            )
        )
    best = F.array_max(F.array(*scored))
    return df.withColumn(out_col, best["idx"])


def centroid_distance_features(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    metric: str = "cosine",
    prefix: str = "cdist",
) -> DataFrame:
    """Append one similarity/distance column per centroid
    (``{prefix}_1..C``, rounded 6) — embeddings become C dense model
    features ("how close is this doc to each corpus mode"), the standard
    cluster-distance featurization after k-means.

    ``cosine`` emits similarity dot(v,c)/(|v||c|); ``euclidean`` emits
    the L2 distance. Expression-only, centroids inlined as plan literals
    (the ``with_ivf_cell`` shape) — no join, no UDF, folds into the
    scan. Zero-norm vectors get NULL cosine (no direction exists).
    """
    from temporalscope_spark.exceptions import DataFrameValidationError

    if not centroids:
        raise DataFrameValidationError(
            "centroid_distance_features: empty centroid list"
        )
    if metric not in ("cosine", "euclidean"):
        raise DataFrameValidationError(
            f"centroid_distance_features: unknown metric {metric!r}"
        )
    v = F.col(vec_col).cast("array<double>")
    vnorm = F.sqrt(_dot(v, v))
    out = df
    for i, c in enumerate(centroids, start=1):
        lit = F.array(*[F.lit(float(x)) for x in c])
        if metric == "cosine":
            cnorm = math.sqrt(sum(x * x for x in c)) or 1.0
            expr = F.when(
                vnorm > 0, F.round(_dot(v, lit) / (vnorm * F.lit(cnorm)), 6)
            )
        else:
            diff = F.zip_with(v, lit, lambda a, b: (a - b) * (a - b))
            expr = F.round(
                F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)), 6
            )
        out = out.withColumn(f"{prefix}_{i}", expr)
    return out


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: scan only the ``nprobe`` cells whose centroids
    are nearest the query, exact cosine re-rank inside them.

    The scale path: materialize ``with_ivf_cell`` output partitioned BY the
    cell column (Iceberg/parquet partition field) — the ``isin`` probe
    filter then partition-prunes to nprobe/C of the corpus before any
    compute (verify via ``PushedFilters`` in the scan node).
    """
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def score(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(q * x for q, x in zip(query_vec, c)) / (qn * cn)

    order = sorted(range(len(centroids)), key=lambda i: (-score(centroids[i]), i))
    probes = order[: max(1, nprobe)]
    cells = with_ivf_cell(df, centroids, vec_col=vec_col, out_col="__cell")
    cand = cells.filter(F.col("__cell").isin(probes)).drop("__cell")
    return cosine_topk(cand, query_vec, vec_col, id_col, k)


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
    seed_hash: str = "xxhash64",
    refine_iters: int = 0,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication of an embedded
    corpus — cluster with the IVF coarse quantizer, find near-identical
    pairs WITHIN each cluster only, and keep one representative per
    duplicate group.

    The clustering is what makes the method scale: the quadratic pair
    search is bounded per cell (SemDeDup's own design), so the join is a
    cell-keyed equi-join, never a global CartesianProduct; the exact GEMM
    pair op remains the opt-in global lane. Keep rule (the paper's): the
    member with the LOWEST cosine to its cluster centroid survives —
    farthest from the centroid preserves the most diversity. The rule
    ranks the ROUNDED centroid cosine (4 dp, the embedding_near_pairs
    precision) with id tie-break, so the survivor choice is engine-stable.

    Singletons (no near-identical neighbor) always keep. Same
    float-boundary fragility class as ivf_topk (cell argmax / threshold
    compare at the last ulp), documented there.

    Output: (id, cell, cent_cosine, keep).
    """
    from pyspark import StorageLevel

    from temporalscope_spark.exceptions import DataFrameValidationError
    from temporalscope_spark.operators.dedup import connected_components

    if not 0.0 < threshold <= 1.0:
        raise DataFrameValidationError("threshold must be in (0, 1]")
    cents = centroids or ivf_centroids(
        df, vec_col, id_col, num_centroids, seed, refine_iters, seed_hash
    )
    a = with_ivf_cell(df, cents, vec_col=vec_col, out_col="cell")
    cos_to = []
    for c in cents:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        lit = F.array(*[F.lit(float(x)) for x in c])
        cos_to.append(_dot(F.col(vec_col), lit) / (F.lit(n) * _norm(F.col(vec_col))))
    # assignment branches 4 ways (both pair sides, members, final) —
    # persist the narrow (id, cell, cent_cosine, vec) table
    a = a.select(
        id_col,
        "cell",
        F.round(F.element_at(F.array(*cos_to), F.col("cell") + 1), 4).alias(
            "cent_cosine"
        ),
        vec_col,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # within-cell pair search, hot-key-split (guide §2.5 salting): a join
    # keyed on `cell` alone caps parallelism at num_centroids tasks and
    # concentrates each cell's quadratic pair work (per-pair cosine folds)
    # on one task. Split every cell K ways on a deterministic hash of the
    # RIGHT id (replicating the left side K ways — cells are the hot keys
    # by construction), so the same pair set spreads over K x cells
    # tasks; per-pair arithmetic is untouched.
    _K = 8
    rblk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(_K)).cast("int")
    # hoist each vector's norm out of the pair filter: the per-pair
    # cosine is then ONE interpreted dot fold instead of three
    # (dot + both norms), with bit-identical arithmetic — the norms are
    # the same sqrt expressions, just evaluated once per VECTOR and
    # multiplied in the same order as before
    left = a.select(
        F.col(id_col).alias("id_a"),
        "cell",
        F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_nna"),
    ).withColumn("_blk", F.explode(F.sequence(F.lit(0), F.lit(_K - 1))))
    right = a.select(
        F.col(id_col).alias("id_b"),
        "cell",
        F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nnb"),
        rblk.alias("_blk"),
    )
    pairs = (
        left.join(right, ["cell", "_blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.try_divide(
                _dot(F.col("_va"), F.col("_vb")),
                F.col("_nna") * F.col("_nnb"),
            )
            >= F.lit(float(threshold))
        )
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    members = a.join(comp, a[id_col] == comp["node"]).select(
        id_col, "cent_cosine", "component"
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("component").orderBy(
            F.col("cent_cosine").asc(), F.col(id_col).asc()
        )
    )
    keepers = members.select(id_col, (rn == 1).alias("_kd"))
    from temporalscope_spark.core.caching import hold

    return hold(
        a.select(id_col, "cell", "cent_cosine")
        .join(keepers, id_col, "left")
        .select(
            id_col,
            "cell",
            "cent_cosine",
            F.coalesce("_kd", F.lit(True)).alias("keep"),
        ),
        a,
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    id_col: str = "vec_id",
    query_col: str | None = None,
) -> DataFrame:
    """Recall of an approximate top-k result against the exact top-k —
    the standard ANN quality gate (recall@k = |exact ∩ approx| /
    |exact|), computed relationally so a million-query eval never
    collects to the driver.

    With ``query_col`` the recall is per query (inner-join on
    (query, id), counts grouped by query); without it the two inputs
    are single ranked lists and ONE 1-row aggregate comes back.

    Output: (query?, n_exact, n_overlap, recall) — recall rounded to 6
    (an exact ratio of two integers, engine-identical).
    """
    from temporalscope_spark.exceptions import DataFrameValidationError

    for c in ((query_col,) if query_col else ()) + (id_col,):
        for df_, name in ((exact, "exact"), (approx, "approx")):
            if c not in df_.columns:
                raise DataFrameValidationError(
                    f"missing column {c!r} in {name}"
                )
    keys = ([query_col] if query_col else []) + [id_col]
    e = exact.select(*keys)
    hit = e.join(approx.select(*keys), keys, "left_semi")
    if query_col is None:
        ne = e.agg(F.count(F.lit(1)).alias("n_exact"))
        nh = hit.agg(F.count(F.lit(1)).alias("n_overlap"))
        return ne.crossJoin(nh).select(
            "n_exact",
            "n_overlap",
            (
                F.round(
                    F.col("n_overlap").cast("double")
                    / F.col("n_exact").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    ne = e.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_exact"))
    nh = hit.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_overlap"))
    return ne.join(nh, query_col, "left").select(
        query_col,
        "n_exact",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        (
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.col("n_exact").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("recall"),
    )


def prototype_prune(
    df: DataFrame,
    centroids: list[list[float]],
    keep_frac: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = True,
) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws: beating power law scaling via data pruning"): assign
    each vector to its nearest k-means centroid, score it by cosine to
    that centroid (its "prototypicality"), and KEEP only the hardest
    ``keep_frac`` of each cell — the most prototypical (easiest)
    examples are the ones large-data training can afford to drop.

    Cell assignment replays :func:`with_ivf_cell`'s argmax struct
    (centroids as plan literals, expression-only; the winning struct also
    carries the score, so prototypicality is one extra division — no
    second pass over the centroid list). The per-cell rank runs on the
    ROUNDED-6 prototypicality with id tie-break, so the kept set is a
    pure function of (vectors, centroids) — same float-boundary
    fragility class as ``ivf_topk`` (cell argmax ties at the last ulp).

    ``exact=True`` (oracle lane): per-cell ``row_number <= ceil(frac·n)``
    — compiles to WindowGroupLimit; each cell's rows pass through one
    window partition, fine while cells stay ~corpus/C sized and C scales
    with the corpus (the paper's regime — C grows with n). ``exact=False``
    (100 TB lane): per-cell ``percentile_approx`` threshold on the score,
    keep ``proto <= thr`` — constant memory, no window at all; the kept
    fraction moves within the sketch's rank error at the boundary.

    Zero-norm vectors carry no direction — they get NULL prototypicality
    and are always kept (nothing can rank them).

    Output: the kept rows as (id, ivf_cell, proto_cos).
    """
    from temporalscope_spark.exceptions import DataFrameValidationError

    if not centroids:
        raise DataFrameValidationError("prototype_prune: empty centroid list")
    if not 0.0 < keep_frac <= 1.0:
        raise DataFrameValidationError("prototype_prune: keep_frac must be in (0, 1]")
    if id_col not in df.columns or vec_col not in df.columns:
        raise DataFrameValidationError(
            f"prototype_prune: need columns {id_col!r}, {vec_col!r}"
        )
    # one argmax struct serves both the cell id and the prototypicality:
    # with_ivf_cell scores dot(v,c)/|c| (argmax-equivalent to cosine since
    # |v| is common across cells), so cosine-to-own-centroid is just the
    # winning score divided by |v| — no per-centroid when-chain (the 64 KB
    # codegen class), C only appears once in the plan
    v = F.col(vec_col).cast("array<double>")
    structs = []
    for i, c in enumerate(centroids):
        cnorm = math.sqrt(sum(x * x for x in c)) or 1.0
        lit = F.array(*[F.lit(float(x)) for x in c])
        structs.append(
            F.struct(
                (_dot(v, lit) / F.lit(cnorm)).alias("score"),
                F.lit(i).alias("idx"),
            )
        )
    best = F.array_max(F.array(*structs))
    proto = F.round(F.try_divide(best["score"], _norm(v)), 6) + F.lit(0.0)
    scored = df.select(
        F.col(id_col), best["idx"].alias("ivf_cell"), proto.alias("proto_cos")
    )
    ranked_cols = [id_col, "ivf_cell", "proto_cos"]
    if exact:
        from pyspark.sql.window import Window

        w = Window.partitionBy("ivf_cell").orderBy(
            F.col("proto_cos").asc_nulls_first(), F.col(id_col)
        )
        wc = Window.partitionBy("ivf_cell")
        keep = (
            scored.withColumn("_rn", F.row_number().over(w))
            .withColumn("_nc", F.count(F.lit(1)).over(wc))
            .filter(
                F.col("proto_cos").isNull()
                | (F.col("_rn") <= F.ceil(F.col("_nc") * F.lit(float(keep_frac))))
            )
        )
        return keep.select(*ranked_cols)
    thr = scored.filter(F.col("proto_cos").isNotNull()).groupBy("ivf_cell").agg(
        F.percentile_approx("proto_cos", F.lit(float(keep_frac))).alias("_thr")
    )
    return (
        scored.join(F.broadcast(thr), "ivf_cell", "left")
        .filter(F.col("proto_cos").isNull() | (F.col("proto_cos") <= F.col("_thr")))
        .select(*ranked_cols)
    )


def margin_mining(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    knn_k: int = 4,
    margin_threshold: float = 1.05,
    candidate_threshold: float = 0.2,
    method: str = "gemm",
    **pair_kwargs,
) -> DataFrame:
    """Margin-based nearest-neighbor pair mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings" — the CCMatrix/LASER bitext-mining criterion): score each
    candidate pair by its cosine RELATIVE to both endpoints' neighborhood
    densities,

        ``margin(a, b) = cos(a, b) / (½·(avgTopK(a) + avgTopK(b)))``

    — a pair is interesting when it is closer than each side's *typical*
    nearest neighbors, which kills the hub vectors that plain
    cosine-threshold mining drowns in.

    Candidates come from :func:`cosine_self_join_pairs`
    (``method='gemm'`` = exact triangular block-GEMM; ``'lsh'`` = SRP
    multi-probe blocking, the corpus-scale path), and each side's top-k
    average is computed over that same candidate set — exactly the
    approximation the paper makes by reading kNN from a FAISS index.
    ``candidate_threshold`` must sit low enough that true top-k
    neighbors are candidates (it bounds the mined margin from below by
    roughly ``threshold / avgTopK``).

    Plan shape: one pair generation (bucketed — never all-pairs under
    ``'lsh'``), one per-id WindowGroupLimit top-k + bounded avg over the
    symmetrized pair list, then two equi-joins of the pair table against
    the n-row kNN-average table. No window ever spans more than one id's
    candidate list.

    Output: (id_a, id_b, cosine, margin) rounded to 4 (the pair-query
    convention — GEMM's BLAS summation order differs from expression
    folds at ~1e-15), filtered to ``margin >= margin_threshold``.
    """
    from temporalscope_spark.exceptions import DataFrameValidationError
    from pyspark.sql.window import Window

    if knn_k < 1:
        raise DataFrameValidationError("margin_mining: knn_k must be >= 1")
    if margin_threshold < 0:
        raise DataFrameValidationError("margin_mining: margin_threshold must be >= 0")
    pairs = cosine_self_join_pairs(
        df, vec_col, id_col, threshold=candidate_threshold, method=method,
        **pair_kwargs,
    )
    sym = pairs.select(
        F.col("id_a").alias("_id"), F.col("id_b").alias("_other"), F.col("cosine")
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("_id"), F.col("id_a").alias("_other"), F.col("cosine")
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("cosine").desc(), F.col("_other"))
    knn = (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= knn_k)
        .groupBy("_id")
        .agg(F.avg("cosine").alias("_knn"))
    )
    ka = knn.select(F.col("_id").alias("id_a"), F.col("_knn").alias("_ka"))
    kb = knn.select(F.col("_id").alias("id_b"), F.col("_knn").alias("_kb"))
    margin = F.col("cosine") / (F.lit(0.5) * (F.col("_ka") + F.col("_kb")))
    return (
        pairs.join(ka, "id_a")
        .join(kb, "id_b")
        .filter(margin >= F.lit(float(margin_threshold)))
        .select(
            "id_a",
            "id_b",
            (F.round("cosine", 4) + F.lit(0.0)).alias("cosine"),
            (F.round(margin, 4) + F.lit(0.0)).alias("margin"),
        )
    )


def mmr_rerank(
    df: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    score_col: str = "score",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from each query's candidate list, greedily select ``k`` documents
    maximizing ``λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)`` — relevance
    traded against redundancy with what is already picked, the standard
    diversity pass over a retriever's top-N (and the candidate-selection
    rule RAG pipelines use verbatim).

    Input is the CANDIDATE table (query, doc, vector, relevance score) —
    bounded per query by the upstream retriever's N. Selection is
    inherently sequential in k, so the operator unrolls k rounds, each
    ALL-QUERIES-AT-ONCE: one equi-join of candidates against the selected
    set (≤ r rows per query), a per-(query, doc) max, and a per-query
    argmax via ``min(struct(−score, id))`` — partition-invariant, no
    window over more than one query's candidates, no driver collect
    (per-round ``localCheckpoint`` on the Q·r-row selected table truncates
    the growing lineage, the BPE-loop convention). Scores are rounded to
    6 before each argmax so the greedy trajectory replays identically in
    any engine (same float-boundary fragility class as ``ivf_topk``).

    Output: (query, doc, rank 1..k, mmr_score). Queries with fewer than
    k candidates simply exhaust early.
    """
    from temporalscope_spark.exceptions import DataFrameValidationError

    for c in (query_col, id_col, vec_col, score_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"mmr_rerank: missing column {c!r}")
    if k < 1:
        raise DataFrameValidationError("mmr_rerank: k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise DataFrameValidationError("mmr_rerank: lam must be in [0, 1]")
    cand = df.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(vec_col).cast("array<double>").alias("_e"),
        (F.round(F.col(score_col).cast("double"), 6) + F.lit(0.0)).alias("_rel"),
    ).persist()
    lam_l, mu_l = F.lit(float(lam)), F.lit(1.0 - float(lam))
    selected = None
    for r in range(1, k + 1):
        if selected is None:
            scored = cand.withColumn("_ms", F.lit(0.0))
        else:
            remaining = cand.join(
                selected.select("_q", "_d"), ["_q", "_d"], "left_anti"
            )
            sel_v = selected.select("_q", F.col("_e").alias("_se"))
            scored = (
                remaining.join(sel_v, "_q")
                .withColumn("_s", cosine_similarity(F.col("_e"), F.col("_se")))
                .groupBy("_q", "_d")
                .agg(
                    F.max("_s").alias("_ms"),
                    F.first("_rel").alias("_rel"),
                    F.first("_e").alias("_e"),
                )
            )
        scored = scored.withColumn(
            "_score",
            F.round(lam_l * F.col("_rel") - mu_l * F.col("_ms"), 6) + F.lit(0.0),
        )
        pick = (
            scored.groupBy("_q")
            .agg(
                F.min(
                    F.struct((-F.col("_score")).alias("n"), F.col("_d").alias("d"))
                ).alias("_p")
            )
            .select("_q", F.col("_p.d").alias("_d"))
        )
        pick_full = pick.join(scored, ["_q", "_d"]).select(
            "_q", "_d", "_e", F.lit(r).alias("_rank"), F.col("_score")
        )
        selected = (
            pick_full if selected is None else selected.unionByName(pick_full)
        ).localCheckpoint()
    cand.unpersist()
    return selected.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(id_col),
        F.col("_rank").cast("int").alias("rank"),
        F.col("_score").alias("mmr_score"),
    )


def knn_label_agreement(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    method: str = "gemm",
    num_blocks: int = 16,
    rank_decimals: int | None = None,
) -> DataFrame:
    """Label-noise screen via k-NN label consistency (the confident-
    learning / deep-k-NN heuristic, e.g. Bahri et al. 2020): for every
    vector, the fraction of its k cosine-nearest neighbors that share
    its label. Rows with agreement ≈ 0 in a dense neighborhood are
    mislabeled-data candidates; a per-label mean flags systematically
    noisy classes before the labels feed a quality classifier.

    Pipeline: exact all-pairs cosine via the triangular block-GEMM lane
    (no CartesianProduct node), symmetrized, then a per-id top-k window
    (WindowGroupLimit pushes the rank filter below the sort) and two
    label equi-joins. Exact by construction at this lane; at 100 TB
    swap the pair source for the SRP/IVF candidate generators in this
    module — the agreement stage is unchanged.

    ``rank_decimals`` ranks neighbors by the ROUNDED cosine (ties then
    break on neighbor id): near-equal similarities collapse to exact
    ties with a deterministic order, which makes the ranking robust to
    last-ulp float-summation differences across engines/hardware — the
    cross-replay lane; ``None`` ranks on the raw double.

    Output: ``(id, label, n_neighbors, n_agree, agreement)``;
    ``n_neighbors`` < k only when the corpus has fewer than k+1 rows.
    """
    from pyspark.sql.window import Window

    from temporalscope_spark.exceptions import DataFrameValidationError

    if k < 1:
        raise DataFrameValidationError("knn_label_agreement: k must be >= 1")
    missing = [c for c in (vec_col, id_col, label_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"knn_label_agreement: missing columns {missing}"
        )
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    # the pair table feeds both directions of the symmetrized union —
    # persist it or the block-GEMM runs twice (hold/release contract)
    pairs = cosine_self_join_pairs(
        df,
        vec_col=vec_col,
        id_col=id_col,
        threshold=-1.0,
        method=method,
        num_blocks=num_blocks,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb"), "cosine"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("nb"), "cosine"
        )
    )
    rank_key = (
        F.col("cosine")
        if rank_decimals is None
        else F.round(F.col("cosine"), rank_decimals)
    )
    w = Window.partitionBy("id").orderBy(rank_key.desc(), F.col("nb"))
    top = sym.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    own = df.select(F.col(id_col).alias("id"), F.col(label_col).alias("label"))
    nbl = df.select(F.col(id_col).alias("nb"), F.col(label_col).alias("_nbl"))
    joined = top.join(own, "id").join(nbl, "nb")
    out = (
        joined.groupBy("id", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.sum(
                F.when(F.col("_nbl") == F.col("label"), 1).otherwise(0)
            ).cast("long").alias("n_agree"),
        )
        .select(
            "id",
            "label",
            "n_neighbors",
            "n_agree",
            (
                F.round(
                    F.col("n_agree").cast("double")
                    / F.greatest(F.col("n_neighbors"), F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("agreement"),
        )
    )
    return hold(out, pairs)
