"""Link-graph operators for corpus curation.

Web-scale training-data pipelines weight and filter pages by link-graph
quality signals — CommonCrawl itself publishes host-level harmonic
centrality / PageRank ranks, and curation stacks in the CCNet/RefinedWeb
lineage consume them as quality priors. The reference engine
(``/root/reference/src/temporalscope/``) has no graph operators; this
module extends its single-table design with the one graph primitive such a
pipeline needs, built the way ``operators.dedup.connected_components``
builds min-label propagation: a fixed number of join+aggregate rounds with
per-round ``localCheckpoint`` lineage truncation.

Scale notes:
  * every round is ONE equi-join (edges × ranks on the source key) plus ONE
    map-side-combinable groupBy(dst) sum — no all-pairs stage, no global
    sort, no driver-side collection of data-sized results;
  * the dangling-mass term is a 1-row aggregate broadcast-crossed into the
    update expression (the ``ppl_buckets`` cut-point shape), NOT a driver
    collect, so the loop submits no extra actions beyond the eager
    ``localCheckpoint`` per round;
  * iterative DataFrame self-reference grows the logical plan exponentially
    — ``localCheckpoint`` per round truncates lineage (at cluster scale use
    a reliable ``checkpoint`` dir so executor loss stays recoverable);
  * edges and the out-degree table are persisted once and reused by every
    round; both are released before returning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    rank_col: str = "rank",
) -> DataFrame:
    """PageRank (Page et al. 1999) over an edge list by synchronous power
    iteration: ``iters`` rounds of

        r[v] = (1 - d) / N  +  d * ( sum_{u -> v} r[u] / outdeg(u)
                                      + dangling_mass / N )

    where ``dangling_mass`` is the total rank sitting on nodes with no
    out-edges (redistributed uniformly — the standard stochastic-matrix
    fix) and N is the node count. Parallel edges are honored as
    multi-edges: a source with the same target twice sends it twice the
    share, and its out-degree counts both. Self-loops are legal.

    Fixed iteration count (not an epsilon test) keeps the result exactly
    reproducible in any engine — the DuckDB oracle replays the same rounds
    as unrolled CTEs. Returns ``(id, rank)`` with full-precision doubles;
    ranks sum to 1 up to float error.
    """
    if not (0.0 < damping < 1.0):
        raise DataFrameValidationError("damping must be in (0, 1)")
    if iters < 1:
        raise DataFrameValidationError("iters must be >= 1")
    for c in (src, dst):
        if c not in edges.columns:
            raise DataFrameValidationError(f"edge column '{c}' not in DataFrame")

    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # (src, dst, outdeg) resolved once; every round joins ranks against it
    ew = e.join(deg, "_s").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = nodes.count()
        base = F.lit((1.0 - damping) / n)
        ranks = nodes.select(
            "id", F.lit(1.0 / n).alias(rank_col)
        ).localCheckpoint()
        for _ in range(iters):
            # 1-row dangling-mass aggregate, broadcast-crossed in (never a
            # driver collect): nodes absent from the out-degree table
            dm = (
                ranks.join(deg, ranks["id"] == deg["_s"], "left_anti")
                .agg(F.coalesce(F.sum(rank_col), F.lit(0.0)).alias("_dm"))
            )
            contrib = (
                ew.join(ranks, ew["_s"] == ranks["id"])
                .groupBy("_d")
                .agg(F.sum(F.col(rank_col) / F.col("_deg")).alias("_in"))
            )
            ranks = (
                nodes.join(contrib, nodes["id"] == contrib["_d"], "left")
                .join(F.broadcast(dm))
                .select(
                    "id",
                    (
                        base
                        + F.lit(damping)
                        * (
                            F.coalesce("_in", F.lit(0.0))
                            + F.col("_dm") / F.lit(float(n))
                        )
                    ).alias(rank_col),
                )
                .localCheckpoint()
            )
        return ranks
    finally:
        ew.unpersist()
        nodes.unpersist()


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) by synchronous power
    iteration: per round

        a[v] = Σ_{u → v} h[u]     then L1-normalize,
        h[u] = Σ_{u → v} a[v]     then L1-normalize,

    quantized to 1e-12 per half-round — the fixed-round + sorted-fold +
    quantization contract (the Bradley-Terry precedent) that makes the
    DuckDB oracle an exact unrolled-CTE replay. Multi-edges contribute
    once per copy; self-loops are legal.

    Scale shape mirrors :func:`pagerank`: each half-round is ONE
    edges × scores equi-join plus ONE per-node fold aggregation (terms
    ordered by the opposite endpoint, so float accumulation is
    deterministic), the L1 total is a 1-row broadcast-crossed
    aggregate, and ``localCheckpoint`` truncates lineage per round.

    Returns ``(id, hub, authority)`` full-precision; each column sums
    to 1 up to float error.
    """
    if iters < 1:
        raise DataFrameValidationError("iters must be >= 1")
    for c in (src, dst):
        if c not in edges.columns:
            raise DataFrameValidationError(f"edge column '{c}' not in DataFrame")

    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _fold(ord_col: str, term_col: str):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ord_col), F.col(term_col).alias("_t"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["_t"],
        )

    def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
        tot = df.select(F.col("id").alias("_o"), F.col(col).alias("_t")).agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_o", "_t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_t"],
            ).alias("_tot")
        )
        return df.crossJoin(F.broadcast(tot)).select(
            "id", F.round(F.col(col) / F.col("_tot"), 12).alias(col)
        )

    try:
        n = nodes.count()
        if n < 1:
            raise DataFrameValidationError("edge list is empty")
        hubs = nodes.select("id", F.lit(1.0 / n).alias("h")).localCheckpoint()
        auths = nodes.select("id", F.lit(1.0 / n).alias("a")).localCheckpoint()
        for _ in range(iters):
            a_new = (
                e.join(hubs, e["_s"] == hubs["id"])
                .groupBy("_d")
                .agg(_fold("_s", "h").alias("a"))
            )
            auths = _l1_normalize(
                nodes.join(a_new, nodes["id"] == a_new["_d"], "left")
                .select("id", F.coalesce("a", F.lit(0.0)).alias("a")),
                "a",
            ).localCheckpoint()
            h_new = (
                e.join(auths, e["_d"] == auths["id"])
                .groupBy("_s")
                .agg(_fold("_d", "a").alias("h"))
            )
            hubs = _l1_normalize(
                nodes.join(h_new, nodes["id"] == h_new["_s"], "left")
                .select("id", F.coalesce("h", F.lit(0.0)).alias("h")),
                "h",
            ).localCheckpoint()
        return (
            hubs.join(auths, "id")
            .select("id", F.col("h").alias("hub"), F.col("a").alias("authority"))
        )
    finally:
        e.unpersist()
        nodes.unpersist()


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    label_col: str = "label",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, "Near linear
    time algorithm to detect community structures in large-scale
    networks"): every node starts as its own community; each round it
    adopts the most frequent label among its IN-neighbors (the
    undirected variant passes both edge orientations), ties broken by
    the SMALLEST label — nodes with no in-edges keep their label. The
    community detector of web-curation stacks (host clustering, mirror
    farms) where connected components over-merge.

    Deterministic by construction: the fixed round count plus the
    (count DESC, label ASC) argmax — realized as one
    ``max(struct(count, -label))`` aggregate — make the result a pure
    function of the edge set, so the DuckDB oracle replays the same
    rounds as unrolled CTEs. Each round is ONE equi-join (edges ×
    labels on the source key) + ONE map-side-combinable
    groupBy(dst, label) count + one argmax aggregate; per-round
    ``localCheckpoint`` truncates the growing lineage (the pagerank
    convention). Returns ``(id, label)`` — label = min community member
    under the dynamics, NOT necessarily the component min.
    """
    if iters < 1:
        raise DataFrameValidationError("label_propagation: iters must be >= 1")
    for c in (src, dst):
        if c not in edges.columns:
            raise DataFrameValidationError(f"label_propagation: missing column {c!r}")
    e = edges.select(
        F.col(src).cast("long").alias("_s"), F.col(dst).cast("long").alias("_d")
    ).persist()
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .persist()
    )
    labels = nodes.withColumn(label_col, F.col("id")).localCheckpoint()
    for _ in range(iters):
        votes = (
            e.join(labels.select(F.col("id").alias("_s"), F.col(label_col)), "_s")
            .groupBy(F.col("_d").alias("id"), F.col(label_col))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        best = (
            votes.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("_c"), (-F.col(label_col)).alias("_nl"))
                ).alias("_b")
            )
            .select("id", (-F.col("_b._nl")).alias("_new"))
        )
        labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("_new"), F.col(label_col)).alias(label_col),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return labels


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph induced by ``edges`` (direction, duplicate
    edges and self-loops are dropped) — the local-density signal that
    separates organic link neighborhoods from link farms (which show
    near-zero closure) in web-graph curation.

    Degree-ordered edge iterator (Cohen 2009, the MapReduce triangle
    algorithm; Suri & Vassilvitskii 2011): orient every edge from its
    lower-(degree, id) endpoint to the higher one, build wedges by
    self-joining oriented edges on the pivot, and close each wedge
    against the oriented edge list. Every triangle is generated from
    exactly one pivot (its minimum-order vertex), so the count is
    exact; wedge fan-out is bounded by the ORDERED out-degree, giving
    the classic O(m^{3/2}) work bound — no node ever enumerates its
    full neighborhood squared, which is what makes this survive
    power-law degree skew at web scale.

    Output: ``(id, degree, triangles, clustering_coeff)`` for every
    node with at least one edge; ``clustering_coeff = 2·T / (d·(d−1))``
    (0.0 for degree-1 nodes).
    """
    from pyspark import StorageLevel

    from temporalscope_spark.core.caching import hold

    for c in (src_col, dst_col):
        if c not in edges.columns:
            raise DataFrameValidationError(f"triangle_counts: missing {c!r}")
    a, b = F.col(src_col), F.col(dst_col)
    # und/deg/oriented are each consumed by 2-3 downstream branches —
    # persist at the branch points or the dedup+degree stages re-run per
    # branch (measured: 91 Exchange nodes unpersisted vs 8 persisted)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # orient by (degree, id): lower order -> higher order
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv"))
    ranked = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(lower_first, F.col("_dv")).otherwise(F.col("_du")).alias("_dhi"),
        F.when(lower_first, F.col("_du")).otherwise(F.col("_dv")).alias("_dlo"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("x"),
        F.col("_dhi").alias("_dx"),
    )
    e2 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("y"),
        F.col("_dhi").alias("_dy"),
    )
    # wedge (p, x, y) with x before y in the SAME total order
    wedges = e1.join(e2, "p").filter(
        (F.col("_dx") < F.col("_dy"))
        | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y")))
    )
    closer = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tris = wedges.join(closer, ["x", "y"]).select("p", "x", "y")
    per_node = (
        tris.select(F.col("p").alias("id"))
        .unionAll(tris.select(F.col("x").alias("id")))
        .unionAll(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    out = deg.join(per_node, "id", "left").select(
        "id",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        (
            F.round(
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0)).cast("double")
                / F.greatest(
                    (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                    F.lit(1.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("clustering_coeff"),
    )
    return hold(out, und, deg, oriented)


def kcore(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 10,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    distributed formulation of Montresor et al. 2013): repeatedly delete
    every node whose degree in the SURVIVING undirected simple graph is
    below ``k`` until no node qualifies (or ``max_rounds`` is reached —
    the bounded-round convention shared with :func:`pagerank` /
    :func:`label_propagation` that keeps the result a pure function of
    the input for the cross-engine oracle). The k-core is the standard
    link-spam / isolated-cluster screen in web-graph curation: pages
    outside a small core are weakly embedded, link farms form dense
    cores with anomalous k.

    Each round is ONE map-side-combinable degree aggregation over the
    surviving edge list plus two LEFT SEMI joins filtering the edge list
    to surviving endpoints — no all-pairs stage, no global sort, no
    driver-side data. Per-round ``localCheckpoint`` truncates the
    growing lineage. Direction, duplicate edges and self-loops are
    dropped up front (the :func:`triangle_counts` normalization).

    Output: ``(id, degree)`` for every node in the k-core, degree =
    its degree within the core. Empty output = the graph has no k-core
    within ``max_rounds`` of peeling.
    """
    from pyspark import StorageLevel

    if k < 1:
        raise DataFrameValidationError("kcore: k must be >= 1")
    if max_rounds < 1:
        raise DataFrameValidationError("kcore: max_rounds must be >= 1")
    for c in (src_col, dst_col):
        if c not in edges.columns:
            raise DataFrameValidationError(f"kcore: missing column {c!r}")
    a, b = F.col(src_col).cast("long"), F.col(dst_col).cast("long")
    live = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = None
    for _ in range(max_rounds):
        deg = (
            live.select(F.col("u").alias("id"))
            .unionAll(live.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        keep = deg.filter(F.col("degree") >= k).select("id")
        n_live = deg.count()
        n_keep = keep.count()
        if n_keep == n_live:
            # fixed point: every surviving node already has core degree
            break
        live = (
            live.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .localCheckpoint()
        )
        deg.unpersist()
        deg = None
        if n_keep == 0:
            break
    if deg is None:
        return (
            live.select(F.col("u").alias("id"))
            .unionAll(live.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .filter(F.col("degree") >= k)
        )
    # fixation break: deg is persisted (it fed the loop's two counts);
    # hand the handle to the caller per the hold/release cache contract
    from temporalscope_spark.core.caching import hold

    return hold(deg.filter(F.col("degree") >= k), deg)
