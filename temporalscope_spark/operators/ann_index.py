"""Persisted IVF ANN index with batch-sized incremental ingestion — the
embedding twin of :class:`~temporalscope_spark.operators.incremental_dedup.
DedupIndex`.

The index is a :class:`~temporalscope_spark.datasets.snapshots.SnapshotTable`
of (id, vector, ivf_cell) rows plus a params manifest pinning the coarse
quantizer (the centroid floats themselves — an embedding assigned under
different centroids would land in the wrong cell and silently drop out of
probe results, so the manifest makes config drift impossible).

Scale shape:

* ``create`` runs the distributed Lloyd quantizer once over the seed
  corpus; the C×dim centroid table is the ONLY thing that ever reaches the
  driver.
* ``add_batch`` assigns arriving vectors to the FROZEN centroids with
  expression-only argmax (centroids inlined as plan literals — no join,
  no Python) and appends — batch-sized cost, the corpus never moves. This
  is standard IVF practice (FAISS's add-after-train contract): the coarse
  quantizer is trained once and new vectors are quantized under it;
  retrain when drift accumulates (``create`` a new index version).
* rows are range-clustered by cell before every write, so each parquet
  file covers a narrow cell range and the probe's ``isin`` filter prunes
  non-probed files via row-group stats (``PushedFilters`` in the scan) —
  at 100 TB make ``ivf_cell`` a real partition field and pruning becomes
  metadata-only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalscope_spark.operators.similarity import (
    cosine_topk,
    ivf_centroids,
    with_ivf_cell,
)

__all__ = ["AnnIndex"]


class AnnIndex:
    """Persisted IVF index over an embedding column."""

    def __init__(self, path: str):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        self.path = path
        self.rows = SnapshotTable(os.path.join(path, "rows"))
        self._params_path = os.path.join(path, "params.json")

    def params(self) -> dict:
        with open(self._params_path) as fh:
            return json.load(fh)

    def centroids(self) -> list[list[float]]:
        return self.params()["centroids"]

    # -------------------------------------------------------------- build
    @classmethod
    def create(
        cls,
        path: str,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        num_centroids: int = 16,
        seed: int = 42,
        refine_iters: int = 1,
        seed_hash: str = "xxhash64",
    ) -> "AnnIndex":
        """Train the coarse quantizer on ``df`` and index its vectors."""
        idx = cls(path)
        if idx.rows.current_version() is not None:
            raise ValueError(f"ann index already exists at {path}")
        cents = ivf_centroids(
            df, vec_col, id_col, num_centroids, seed, refine_iters, seed_hash
        )
        os.makedirs(path, exist_ok=True)
        tmp = f"{idx._params_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "centroids": cents,
                    "vec_col": vec_col,
                    "id_col": id_col,
                    "num_centroids": num_centroids,
                    "seed": seed,
                    "refine_iters": refine_iters,
                    "seed_hash": seed_hash,
                },
                fh,
            )
        os.replace(tmp, idx._params_path)
        idx.add_batch(df)
        return idx

    def add_batch(self, batch_df: DataFrame, meta: dict | None = None) -> int:
        """Assign ``batch_df`` under the frozen quantizer and append —
        batch-sized cost. ``meta`` (e.g. a stream batch id) lands in the
        commit manifest; pair with
        ``rows.version_with_meta('stream_batch_id', i)`` for idempotent
        ``foreachBatch`` ingestion, exactly as ``DedupIndex`` does."""
        p = self.params()
        assigned = with_ivf_cell(
            batch_df, p["centroids"], vec_col=p["vec_col"], out_col="ivf_cell"
        )
        # range-cluster by cell so each file covers a narrow cell range and
        # the probe filter prunes files via parquet stats
        assigned = assigned.repartitionByRange(
            max(1, p["num_centroids"] // 2), "ivf_cell"
        )
        return self.rows.write(assigned, mode="append", meta=meta)

    # -------------------------------------------------------------- query
    def topk(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Approximate top-k: scan only the ``nprobe`` nearest cells (file-
        pruned), exact cosine re-rank inside them. Identical cell ranking
        to :func:`~temporalscope_spark.operators.similarity.ivf_topk`."""
        import math

        p = self.params()
        qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

        def score(c: list[float]) -> float:
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            return sum(q * x for q, x in zip(query_vec, c)) / (qn * cn)

        cents = p["centroids"]
        order = sorted(range(len(cents)), key=lambda i: (-score(cents[i]), i))
        probes = order[: max(1, nprobe)]
        cand = self.rows.read(spark).filter(F.col("ivf_cell").isin(probes))
        return cosine_topk(
            cand.drop("ivf_cell"), query_vec, p["vec_col"], p["id_col"], k
        )
