"""Product quantization (PQ) for embedding compression + ADC search
(Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search").

At 100 TB an ``array<float>`` embedding column dominates storage and
shuffle width: a 64-dim float vector is 256 bytes; its PQ code at
m=8 subspaces × 256 centroids is 8 bytes — a 32× compression that
still supports approximate nearest-neighbor scoring WITHOUT decoding,
via asymmetric distance computation (ADC): the query precomputes an
``m × ksub`` lookup table of subspace distances, and each row's
approximate distance is the sum of ``m`` table lookups.

Spark-first shape:

* **Training** mirrors :func:`similarity.ivf_centroids`: the ``ksub``
  seed rows are the smallest ``hash(id, seed)`` rows (``md5`` lane for
  the SQL-replayable oracle), each sliced into the ``m`` subvectors;
  optional Lloyd refinement runs ALL subspaces in one aggregation per
  round — the corpus is exploded to (sub, code, dim, value) and
  averaged, one shuffle keyed on (sub, code, dim). Only the
  ``m × ksub × dsub`` floats of the codebook reach the driver.
* **Encoding** is expression-only: per subspace, the argmin over
  ``ksub`` squared-L2 distances is ``array_min`` over (dist, code)
  structs, every distance a row-local fold over the vector slice. The
  codebook enters the plan as literals — no join, no UDF, narrow plan.
* **Search (ADC)** is expression-only: the LUT is ``m`` literal arrays
  indexed by the stored codes; top-k orders by (adc, id) — swap in the
  threshold lane of ``plans/rownum.py`` at extreme k.

Oracle fragility note (same class as the SRP/IVF replays): an argmin
that is TIED at the last ulp between two centroids can differ across
engines' float summation orders; distances on real-valued embeddings
tie only measure-zero, and the driver compares at 1e-6.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def _check_mk(dim: int, m: int, ksub: int) -> int:
    if m < 1 or dim % m != 0:
        raise DataFrameValidationError(
            f"pq: m must divide the embedding dim (dim={dim}, m={m})"
        )
    if ksub < 2:
        raise DataFrameValidationError("pq: ksub must be >= 2")
    return dim // m


def _sub_l2(vec: Column, off: int, cent: list[float]) -> Column:
    """Squared L2 between vec[off : off+len(cent)] and a literal
    sub-centroid — a row-local left-to-right fold (deterministic sum
    order)."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    sub = F.slice(vec, off + 1, len(cent))
    return F.aggregate(
        F.zip_with(sub, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    m: int = 4,
    ksub: int = 8,
    seed: int = 42,
    refine_iters: int = 0,
    seed_hash: str = "xxhash64",
) -> list[list[list[float]]]:
    """Train the ``m`` subspace codebooks: ``ksub`` deterministic seed
    rows (smallest ``hash(id, seed)`` — ``md5`` lane is SQL-replayable)
    sliced per subspace, plus ``refine_iters`` rounds of distributed
    Lloyd over ALL subspaces at once. Returns
    ``codebooks[sub][code] = sub-centroid`` (``m × ksub × dim/m``)."""
    dsub = _check_mk(dim, m, ksub)
    if seed_hash == "md5":
        order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    else:
        order = F.xxhash64(F.col(id_col), F.lit(seed))
    rows = df.select(vec_col).orderBy(order).limit(ksub).collect()
    if len(rows) < ksub:
        raise DataFrameValidationError(
            f"pq: need at least ksub={ksub} rows, got {len(rows)}"
        )
    books = [
        [[float(x) for x in r[0][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]

    for _ in range(max(0, refine_iters)):
        coded = pq_encode(df, books, vec_col=vec_col, id_col=id_col)
        joined = df.select(id_col, vec_col).join(coded, id_col)
        # one exploded aggregation updates every (sub, code, dim) mean
        exploded = joined.select(
            F.posexplode(F.col(vec_col)).alias("_d", "_v"),
            F.col("codes").alias("_codes"),
        ).select(
            (F.col("_d") / dsub).cast("int").alias("_sub"),
            (F.col("_d") % dsub).alias("_sd"),
            F.col("_v").cast("double").alias("_v"),
            F.element_at(F.col("_codes"), (F.col("_d") / dsub).cast("int") + 1).alias(
                "_code"
            ),
        )
        means = (
            exploded.groupBy("_sub", "_code", "_sd")
            .agg(F.avg("_v").alias("_m"))
            .groupBy("_sub", "_code")
            .agg(F.array_sort(F.collect_list(F.struct("_sd", "_m"))).alias("_dm"))
            .select(
                "_sub", "_code", F.transform("_dm", lambda s: s["_m"]).alias("_c")
            )
            .collect()
        )
        new = {(r["_sub"], r["_code"]): [float(x) for x in r["_c"]] for r in means}
        books = [
            [new.get((j, c), books[j][c]) for c in range(ksub)] for j in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "codes",
) -> DataFrame:
    """``(id, codes array<int>)`` — per subspace, the argmin code over
    the literal codebook; expression-only, no join, narrow plan."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _sub_l2(F.col(vec_col), j * dsub, codebooks[j][c]).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        subs.append(F.array_min(cands)["c"])
    return df.select(F.col(id_col), F.array(*subs).cast("array<int>").alias(out_col))


def pq_topk(
    coded: DataFrame,
    qvec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k: squared-L2 LUT of the query against every
    sub-centroid (m × ksub literals), approximate distance = sum of
    ``m`` array lookups, ascending top-k with (adc, id) tiebreak.
    Output ``(id, adc)``."""
    if k < 1:
        raise DataFrameValidationError("pq_topk: k must be >= 1")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(qvec) != m * dsub:
        raise DataFrameValidationError(
            f"pq_topk: query dim {len(qvec)} != m*dsub {m * dsub}"
        )
    adc = F.lit(0.0)
    for j in range(m):
        qs = [float(x) for x in qvec[j * dsub : (j + 1) * dsub]]
        lut = F.array(
            *[
                # plain left-to-right sum (not fsum): the oracle's
                # list_sum folds in the same order, keeping the LUT
                # literals bit-comparable across engines
                F.lit(float(sum((a - b) * (a - b) for a, b in zip(qs, cent))))
                for cent in codebooks[j]
            ]
        )
        adc = adc + F.element_at(lut, F.element_at(F.col(codes_col), j + 1) + 1)
    return (
        coded.select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col).asc())
        .limit(k)
    )


# -- IVF-PQ composite (coarse cells + PQ on residuals) ---------------------

def _l2_argmin(vec: Column, cents: list[list[float]]) -> Column:
    """(cell, centroid-array) struct for the nearest centroid by squared
    L2 — array_min over (dist, idx) structs, ties to the smaller idx."""
    cands = []
    for i, c in enumerate(cents):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(
                vec, lit,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cands.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*cands))["i"]


def ivfpq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    num_cells: int = 8,
    m: int = 4,
    ksub: int = 8,
    seed: int = 42,
    seed_hash: str = "xxhash64",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVF-PQ composite (Jégou et al. 2011 §IV: IVFADC): a
    coarse quantizer of ``num_cells`` md5/xxhash-seeded centroids plus
    PQ codebooks trained on RESIDUALS (vector minus its cell centroid —
    residuals are near zero-mean, so the same code budget quantizes
    them far better than raw vectors). Seeds for both quantizers are
    deterministic smallest-hash rows (``seed`` for cells, ``seed+1``
    for the residual codebooks); the md5 lane replays in any SQL
    engine. Returns ``(cells, codebooks)``."""
    dsub = _check_mk(dim, m, ksub)
    if num_cells < 1:
        raise DataFrameValidationError("ivfpq: num_cells must be >= 1")

    def _order(s: int):
        if seed_hash == "md5":
            return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{s}")))
        return F.xxhash64(F.col(id_col), F.lit(s))

    cell_rows = df.select(vec_col).orderBy(_order(seed)).limit(num_cells).collect()
    if len(cell_rows) < num_cells:
        raise DataFrameValidationError(
            f"ivfpq: need at least num_cells={num_cells} rows"
        )
    cells = [[float(x) for x in r[0]] for r in cell_rows]

    pq_rows = df.select(vec_col).orderBy(_order(seed + 1)).limit(ksub).collect()
    if len(pq_rows) < ksub:
        raise DataFrameValidationError(f"ivfpq: need at least ksub={ksub} rows")
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in pq_rows:
        v = [float(x) for x in r[0]]
        # assign in the driver with the same (dist, idx) tie rule as the
        # engine expression: plain left-to-right float sums
        best = min(
            range(num_cells),
            key=lambda i: (sum((a - b) * (a - b) for a, b in zip(v, cells[i])), i),
        )
        resid = [a - b for a, b in zip(v, cells[best])]
        for j in range(m):
            books[j].append(resid[j * dsub : (j + 1) * dsub])
    return cells, books


def ivfpq_encode(
    df: DataFrame,
    cells: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, cell, codes)`` — nearest-cell assignment, residual, and
    per-subspace argmin over the residual codebooks, all expression-only
    (cells and codebooks enter the plan as literals; no join, no UDF)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cell = _l2_argmin(F.col(vec_col), cells)
    cent_lits = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cells]
    )
    base = df.select(
        F.col(id_col),
        cell.alias("cell"),
        F.zip_with(
            F.col(vec_col),
            F.element_at(cent_lits, cell + 1),
            lambda a, b: a.cast("double") - b,
        ).alias("_resid"),
    )
    subs = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _sub_l2(F.col("_resid"), j * dsub, codebooks[j][c]).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        subs.append(F.array_min(cands)["c"])
    return base.select(
        id_col, "cell", F.array(*subs).cast("array<int>").alias("codes")
    )


def ivfpq_topk(
    coded: DataFrame,
    qvec: list[float],
    cells: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC search: probe the ``nprobe`` cells nearest the query, and
    inside each probed cell score rows by the CELL-SPECIFIC ADC lookup
    table of the query residual ``q - cell_centroid`` against the
    residual codebooks. The cell filter prunes the scan (partition the
    code table by ``cell`` at scale and this is partition pruning); the
    per-cell LUTs are ``nprobe × m × ksub`` plan literals. Output
    ``(id, cell, adc)`` with the (adc, id) deterministic cut."""
    if k < 1:
        raise DataFrameValidationError("ivfpq_topk: k must be >= 1")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(qvec) != m * dsub:
        raise DataFrameValidationError(
            f"ivfpq_topk: query dim {len(qvec)} != m*dsub {m * dsub}"
        )
    if not 1 <= nprobe <= len(cells):
        raise DataFrameValidationError("ivfpq_topk: nprobe out of range")
    qd = [float(x) for x in qvec]
    order = sorted(
        range(len(cells)),
        key=lambda i: (sum((a - b) * (a - b) for a, b in zip(qd, cells[i])), i),
    )
    probed = order[:nprobe]

    adc = F.lit(None).cast("double")
    expr = None
    for cell_i in probed:
        qr = [a - b for a, b in zip(qd, cells[cell_i])]
        cell_sum = F.lit(0.0)
        for j in range(m):
            qs = qr[j * dsub : (j + 1) * dsub]
            lut = F.array(
                *[
                    F.lit(float(sum((a - b) * (a - b) for a, b in zip(qs, cent))))
                    for cent in codebooks[j]
                ]
            )
            cell_sum = cell_sum + F.element_at(
                lut, F.element_at(F.col("codes"), j + 1) + 1
            )
        cond = F.col("cell") == cell_i
        expr = F.when(cond, cell_sum) if expr is None else expr.when(cond, cell_sum)
    adc = expr.otherwise(F.lit(None))
    return (
        coded.filter(F.col("cell").isin([int(c) for c in probed]))
        .select(F.col(id_col), F.col("cell"), adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col).asc())
        .limit(k)
    )
