"""Incremental dedup against a persisted fingerprint/minhash-band index.

The capstone of the incremental pipeline (VERDICT r3 #1): when a batch lands
(``SnapshotTable.read_increment``), dedup the NEW docs against the existing
corpus WITHOUT re-fingerprinting the corpus. The persisted index holds, per
already-indexed doc, its exact-dedup fingerprint, its LSH band hashes, and
its near-dup component label:

    (_id, component, fingerprint, _band, _bh)   — one row per (doc, band)

Incremental pass over a batch B against corpus index I:

1. shingle/fingerprint/sign B only (batch-sized);
2. exact lane: B.fingerprint ⋈ I.fingerprint (broadcast the BATCH side —
   the index is corpus-sized and must never move);
3. candidate lane: B band rows ⋈ I band rows on (_band, _bh) + a B×B
   band self-join — the EXACT same candidate criterion the full-corpus
   :func:`~temporalscope_spark.operators.dedup.minhash_lsh_pairs` uses, so
   incremental and full-corpus runs see identical candidate sets by
   construction;
4. verify candidates with exact Jaccard. Batch shingles are in hand; the
   matched corpus docs' shingles are re-derived from ``corpus_docs``
   restricted by a broadcast semi-join on the candidate ids (candidates are
   batch-sized — at 100 TB this is a filter-only scan that an id-clustered
   or bloom-indexed layout prunes to candidate files, never a
   re-fingerprinting of the corpus);
5. connected components over the BATCH-SIZED merge graph whose corpus
   endpoints are replaced by their persisted component labels — merging
   two old components through a batch doc yields a relabel, exactly what
   full-corpus clustering would have produced.

EQUIVALENCE (the property the tests pin): because the candidate criterion,
verification, and min-label clustering are identical, (full-corpus dedup of
C0 ∪ B) == (index built from C0) + (incremental dedup of B) — including
transitive merges where a batch doc bridges two pre-existing components.

No reference parity: TemporalScope is a batch library with no incremental
story; this extends the engine's snapshot/increment contract
(``datasets/snapshots.py``) to the dedup family.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.dedup import (
    _shingle_table,
    _signatures_from_shingles,
    band_structs,
    connected_components,
    minhash_lsh_pairs,
)
from temporalscope_spark.operators.text import with_fingerprint


# --------------------------------------------------------------- building
def _band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, _band, _bh) from a signature table — the ONE shared band
    hashing formula (:func:`~temporalscope_spark.operators.dedup.
    band_structs`), so index rows and full-corpus runs bucket
    identically."""
    return sig.select(
        "_id", F.explode(F.array(*band_structs(num_hashes, bands))).alias("bb")
    ).select("_id", F.col("bb.band").alias("_band"), F.col("bb.bh").alias("_bh"))


def cluster_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 12,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Full-corpus near-dup clustering: LSH pairs → connected components →
    (id, component) for EVERY doc (singletons label themselves). This is
    the reference computation the incremental path must reproduce, and the
    v0 builder for :func:`dedup_index_rows`. ``shingles`` optionally shares
    a precomputed (persisted) shingle table with the index builder."""
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, threshold=threshold, hash_fn=hash_fn,
        shingles=shingles,
    )
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias(id_col), F.col("component").alias("_c")
    )
    return docs.select(id_col).join(comp, id_col, "left").select(
        id_col, F.coalesce(F.col("_c"), F.col(id_col)).alias("component")
    )


def dedup_index_rows(
    docs: DataFrame,
    components: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 12,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Index rows for ``docs``: (_id, component, fingerprint, _band, _bh),
    one row per (doc, band). ``components`` is a prior (id, component)
    labeling (e.g. from :func:`cluster_corpus`, or the output of a previous
    incremental pass); without one it is computed here. ``shingles``
    optionally shares a precomputed (persisted) shingle table with
    :func:`cluster_corpus` so the corpus is shingled once, not twice."""
    if components is None:
        components = cluster_corpus(
            docs, id_col, text_col, num_hashes, bands, shingle_n, threshold,
            hash_fn, shingles=shingles,
        )
    sh = shingles if shingles is not None else _shingle_table(
        docs, id_col, text_col, shingle_n, None, persist=True
    )
    sig = _signatures_from_shingles(sh, num_hashes, hash_fn)
    bandr = _band_rows(sig, num_hashes, bands)
    fp = with_fingerprint(docs, text_col).select(
        F.col(id_col).alias("_id"), "fingerprint"
    )
    comp = components.select(
        F.col(id_col).alias("_id"), F.col("component")
    )
    out = bandr.join(fp, "_id").join(comp, "_id").select(
        "_id", "component", "fingerprint", "_band", "_bh"
    )
    return out


# ------------------------------------------------------------ incremental
@dataclass
class IncrementalDedupResult:
    """Outputs of one incremental pass.

    ``batch_components``: (id, component, is_exact_dup) for every batch doc
    — component is the post-merge min label; a doc survives dedup iff
    ``component == id``.
    ``relabels``: (old_component, component) for pre-existing components a
    batch doc merged into a smaller label — apply to stored labels to stay
    consistent with what full-corpus clustering would produce.
    ``index_rows``: the batch's index rows (already carrying post-merge
    labels), ready to append to the persisted index.

    The pass persists batch-sized intermediates (shingles, band rows,
    exact hits) that its outputs read from; call :meth:`unpersist` once
    the outputs are consumed (``DedupIndex.dedup_batch`` releases the
    internals itself after committing) so a long-running ingest loop does
    not accumulate cache entries batch after batch."""

    batch_components: DataFrame
    relabels: DataFrame
    index_rows: DataFrame
    _cached: tuple = ()

    def unpersist(self) -> None:
        """Release every cache this pass created: the internal batch-sized
        intermediates plus any persisted output (unpersist on a
        never-persisted DataFrame is a no-op)."""
        for df in (*self._cached, self.batch_components, self.relabels,
                   self.index_rows):
            df.unpersist()


def incremental_dedup(
    index: DataFrame,
    batch: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 12,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> IncrementalDedupResult:
    """Dedup ``batch`` against the persisted ``index`` at batch-sized cost.

    ``corpus_docs`` supplies the TEXT of already-indexed docs for
    verify-on-candidates only (restricted by a broadcast semi-join on the
    candidate ids); the corpus is never re-fingerprinted. See the module
    docstring for the plan shape and the equivalence property.
    """
    from pyspark import StorageLevel

    for c in ("_id", "component", "fingerprint", "_band", "_bh"):
        if c not in index.columns:
            raise DataFrameValidationError(f"index is missing column '{c}'")

    # 1. batch-side artifacts (all batch-sized); the shingle table feeds
    # signatures AND both verification lanes — persist once
    bsh = _shingle_table(batch, id_col, text_col, shingle_n, None).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bsig = _signatures_from_shingles(bsh, num_hashes, hash_fn)
    bband = _band_rows(bsig, num_hashes, bands).persist(StorageLevel.MEMORY_AND_DISK)
    bfp = with_fingerprint(batch, text_col).select(
        F.col(id_col).alias("_id"), "fingerprint"
    )

    # 2. exact lane: identical normalized text ⇒ same component, no verify
    # needed. Broadcast the batch side — the index never moves.
    exact_hits = (
        index.select("fingerprint", F.col("component").alias("_cc"))
        .join(F.broadcast(bfp), "fingerprint")
        .select(F.col("_id").alias("_bid"), "_cc")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # 3. candidate lane — batch×corpus via the persisted band table
    # (broadcast batch bands), batch×batch via self-join
    cand_bc = (
        index.select("_band", "_bh", F.col("_id").alias("_cid"), "component")
        .join(F.broadcast(bband.select(F.col("_id").alias("_bid"), "_band", "_bh")),
              ["_band", "_bh"])
        .select("_bid", "_cid", "component")
        .distinct()
    )
    lb = bband.select(F.col("_id").alias("id_a"), "_band", "_bh")
    rb = bband.select(F.col("_id").alias("id_b"), "_band", "_bh")
    cand_bb = (
        lb.join(rb, ["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # 4. exact-Jaccard verification. Corpus candidate shingles come from a
    # broadcast semi-join-restricted scan of corpus_docs (batch-sized id
    # set); batch shingles are already in hand.
    cand_ids = cand_bc.select(F.col("_cid").alias(id_col)).distinct()
    cdocs = corpus_docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    csh = _shingle_table(cdocs, id_col, text_col, shingle_n, None)

    bcounts = bsh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    ccounts = csh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))

    inter_bc = (
        cand_bc.select("_bid", "_cid")
        .join(bsh.select(F.col("_id").alias("_bid"), "_shk"), "_bid")
        .join(csh.select(F.col("_id").alias("_cid"), "_shk"), ["_cid", "_shk"])
        .groupBy("_bid", "_cid")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    ver_bc = (
        inter_bc.join(bcounts.select(F.col("_id").alias("_bid"), F.col("_n").alias("_na")), "_bid")
        .join(ccounts.select(F.col("_id").alias("_cid"), F.col("_n").alias("_nb")), "_cid")
        .filter(
            F.col("_i").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_i")).cast("double")
            >= threshold
        )
        .join(cand_bc, ["_bid", "_cid"])
        .select("_bid", F.col("component").alias("_cc"))
    )

    inter_bb = (
        cand_bb.join(bsh.select(F.col("_id").alias("id_a"), "_shk"), "id_a")
        .join(bsh.select(F.col("_id").alias("id_b"), "_shk"), ["id_b", "_shk"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    ver_bb = (
        inter_bb.join(bcounts.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(bcounts.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .filter(
            F.col("_i").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_i")).cast("double")
            >= threshold
        )
        .select("id_a", "id_b")
    )

    # 5. merge graph: corpus endpoints collapse to their component labels.
    # Exact hits are included explicitly (identical docs always verify at
    # jaccard 1 through the band lane too, but the explicit edge keeps the
    # exact lane correct even with threshold > 1-epsilon configs).
    edges = (
        ver_bc.select(F.col("_bid").alias("id_a"), F.col("_cc").alias("id_b"))
        .unionByName(
            exact_hits.select(F.col("_bid").alias("id_a"), F.col("_cc").alias("id_b"))
        )
        .unionByName(ver_bb)
        .distinct()
    )
    cc = connected_components(edges, "id_a", "id_b")

    # 6. outputs
    batch_ids = batch.select(F.col(id_col)).distinct()
    batch_components = (
        batch_ids.join(
            cc.select(F.col("node").alias(id_col), F.col("component")), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .join(
            exact_hits.select(F.col("_bid").alias(id_col)).distinct()
            .withColumn("is_exact_dup", F.lit(True)),
            id_col,
            "left",
        )
        .fillna(False, ["is_exact_dup"])
    )

    old_components = index.select(F.col("component").alias("node")).distinct()
    relabels = (
        cc.join(old_components, "node")
        .filter(F.col("component") != F.col("node"))
        .select(
            F.col("node").alias("old_component"), F.col("component")
        )
    )

    index_rows = dedup_index_rows(
        batch,
        components=batch_components.select(id_col, "component"),
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
        hash_fn=hash_fn,
        # the batch's shingle table is already in hand (and persisted) —
        # without this the index rows re-shingle the batch and cache a
        # duplicate table
        shingles=bsh,
    )
    return IncrementalDedupResult(
        batch_components, relabels, index_rows, _cached=(bsh, bband, exact_hits)
    )


# ------------------------------------------------------------- persistence
class DedupIndex:
    """Persisted dedup index: a SnapshotTable of index rows + an
    append-only relabel log + a params manifest pinning the hashing
    configuration (a batch indexed with different shingle/band params would
    silently never match — the manifest makes that impossible).

    ``rows/`` grows by append only (each batch commits its own rows);
    component merges never rewrite old rows — they land in ``relabels/``
    and are folded in at read time (:meth:`components`). Merges are rare
    (a relabel needs a batch doc bridging two pre-existing clusters), so
    the relabel log stays tiny and is resolved driver-side with the same
    union-find the dedup fast path uses.
    """

    _PARAMS = ("num_hashes", "bands", "shingle_n", "threshold", "hash_fn",
               "id_col", "text_col")

    def __init__(self, path: str):
        from temporalscope_spark.datasets.snapshots import SnapshotTable

        self.path = path
        self.rows = SnapshotTable(os.path.join(path, "rows"))
        self.relabels = SnapshotTable(os.path.join(path, "relabels"))
        self._params_path = os.path.join(path, "params.json")

    # ------------------------------------------------------------- params
    def _save_params(self, params: dict) -> None:
        tmp = f"{self._params_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(params, fh, indent=1)
        os.replace(tmp, self._params_path)

    def params(self) -> dict:
        with open(self._params_path) as fh:
            return json.load(fh)

    # -------------------------------------------------------------- build
    @classmethod
    def create(
        cls,
        path: str,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 12,
        threshold: float = 0.5,
        hash_fn: str = "xxhash64",
    ) -> "DedupIndex":
        """Build v0: cluster ``docs`` in full, persist their index rows."""
        idx = cls(path)
        if idx.rows.current_version() is not None:
            raise ValueError(f"dedup index already exists at {path}")
        idx._save_params(
            {
                "num_hashes": num_hashes, "bands": bands, "shingle_n": shingle_n,
                "threshold": threshold, "hash_fn": hash_fn,
                "id_col": id_col, "text_col": text_col,
            }
        )
        from pyspark import StorageLevel

        # ONE shingle table feeds both the clustering pass and the index
        # rows (shingling is the dominant cost of the v0 build — sharing
        # halves it); labels persist because the index plan branches over
        # them (band rows join + fingerprint join).
        sh = _shingle_table(docs, id_col, text_col, shingle_n, None).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        labels = None
        try:
            labels = cluster_corpus(
                docs, id_col, text_col, num_hashes, bands, shingle_n,
                threshold, hash_fn, shingles=sh,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            rows = dedup_index_rows(
                docs, labels, id_col, text_col, num_hashes, bands, shingle_n,
                threshold, hash_fn, shingles=sh,
            )
            idx.rows.write(rows, mode="append")
        finally:
            sh.unpersist()
            if labels is not None:
                labels.unpersist()
        return idx

    # ------------------------------------------------------------- dedup
    def dedup_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        corpus_docs: DataFrame,
        commit: bool = True,
    ) -> IncrementalDedupResult:
        """Incrementally dedup ``batch`` against the index; with
        ``commit=True`` append the batch's index rows and any relabels
        (batch-sized commits — the corpus-sized rows table is only read).

        With ``commit=False`` nothing is written and the result's caches
        stay live — call ``result.unpersist()`` when done. With
        ``commit=True`` the internal caches are released after the writes;
        the (persisted, batch-sized) ``batch_components``/``relabels``
        outputs stay cached for the caller, who still owns the final
        ``result.unpersist()``."""
        from pyspark import StorageLevel

        p = self.params()
        index = self.rows.read(spark)
        # FOLD THE RELABEL LOG INTO THE INDEX before matching: rows/ is
        # append-only, so rows written before a merge still carry the
        # pre-merge component label. Matching against a stale label would
        # hand a batch doc a component full-corpus clustering no longer
        # produces (and could even break the "survives iff component == id"
        # rule when the stale label exceeds the doc's own id). The log is
        # merge-bounded tiny, so this is one broadcast join on the scan.
        mapping = self._relabel_map(spark)
        if mapping:
            mdf = spark.createDataFrame(
                list(mapping.items()), ["component", "_new"]
            )
            index = (
                index.join(F.broadcast(mdf), "component", "left")
                .withColumn(
                    "component", F.coalesce(F.col("_new"), F.col("component"))
                )
                .drop("_new")
            )
        result = incremental_dedup(
            index,
            batch,
            corpus_docs,
            id_col=p["id_col"], text_col=p["text_col"],
            num_hashes=p["num_hashes"], bands=p["bands"],
            shingle_n=p["shingle_n"], threshold=p["threshold"],
            hash_fn=p["hash_fn"],
        )
        if commit:
            # persist the two batch-sized outputs the commits branch over:
            # index_rows reads batch_components (components join), and the
            # relabel emptiness probe + write would otherwise evaluate the
            # corpus-sized distinct underneath relabels twice
            result.batch_components = result.batch_components.persist(
                StorageLevel.MEMORY_AND_DISK
            )
            result.relabels = result.relabels.persist(StorageLevel.MEMORY_AND_DISK)
            self.rows.write(result.index_rows, mode="append")
            if result.relabels.limit(1).count() > 0:
                self.relabels.write(result.relabels, mode="append")
            # release the pass's internal caches; keep the persisted
            # outputs for the caller (result.unpersist() drops those too)
            for df in result._cached:
                df.unpersist()
            result._cached = ()
        return result

    # --------------------------------------------------------- streaming
    _BKEY = "stream_batch_id"

    def ingest_stream_batch(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int,
        corpus_table,
    ) -> None:
        """One idempotent micro-batch ingest step: dedup ``batch_df``
        against the index, append the raw docs to ``corpus_table`` and the
        batch's index rows to the index — each commit tagged with
        ``batch_id`` in its manifest meta, so a REPLAYED micro-batch
        (Structured Streaming re-runs the last batch after any failure)
        detects its own partial progress and completes it instead of
        double-committing.

        Commit order and the crash matrix (every arrow is a possible
        failure point; replay is safe at each):

          relabels(meta) → corpus append(meta) → index rows(meta = DONE)

        * crash before anything: replay recomputes from scratch;
        * crash after relabels: replay skips the relabels write (meta
          probe) and — because :meth:`dedup_batch` folds the relabel log
          before matching — computes the same post-merge labels;
        * crash after the corpus append: replay reads the corpus at that
          commit's PARENT version (time travel), so the batch never
          matches its own half-landed copy;
        * after the index-rows commit the batch is done — replay returns
          immediately.
        """
        from pyspark import StorageLevel

        if self.rows.version_with_meta(self._BKEY, batch_id) is not None:
            return  # fully committed — replay after a post-commit failure

        # corpus as of BEFORE this batch, even if a prior attempt already
        # appended it
        cv = corpus_table.version_with_meta(self._BKEY, batch_id)
        if cv is not None:
            parent_version = corpus_table._load(cv)["parent"]
            corpus_prev = (
                corpus_table.read(spark, version=parent_version)
                if parent_version is not None
                else batch_df.limit(0)
            )
        elif corpus_table.current_version() is not None:
            corpus_prev = corpus_table.read(spark)
        else:
            corpus_prev = batch_df.limit(0)

        result = self.dedup_batch(spark, batch_df, corpus_prev, commit=False)
        try:
            result.batch_components = result.batch_components.persist(
                StorageLevel.MEMORY_AND_DISK
            )
            result.relabels = result.relabels.persist(
                StorageLevel.MEMORY_AND_DISK
            )
            if (
                self.relabels.version_with_meta(self._BKEY, batch_id) is None
                and result.relabels.limit(1).count() > 0
            ):
                self.relabels.write(
                    result.relabels, mode="append", meta={self._BKEY: batch_id}
                )
            if cv is None:
                corpus_table.write(
                    batch_df, mode="append", meta={self._BKEY: batch_id}
                )
            self.rows.write(
                result.index_rows, mode="append", meta={self._BKEY: batch_id}
            )
        finally:
            result.unpersist()

    def stream_sink(self, corpus_table):
        """A ``foreachBatch`` sink maintaining corpus table + index:

            stream.writeStream.foreachBatch(idx.stream_sink(corpus)).start()

        Each micro-batch runs :meth:`ingest_stream_batch` — batch-sized
        work, idempotent under Structured Streaming's replay-on-failure
        contract (see there for the crash matrix)."""

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest_stream_batch(
                batch_df.sparkSession, batch_df, batch_id, corpus_table
            )

        return sink

    # -------------------------------------------------------------- reads
    def _relabel_map(self, spark: SparkSession) -> dict:
        """Driver-resolved transitive relabel map (old → final label).
        The log only grows when a batch doc bridges two pre-existing
        components — bounded by the number of merges ever performed, i.e.
        tiny; resolved with union-find so chains across batches collapse."""
        if self.relabels.current_version() is None:
            return {}
        pdf = self.relabels.read(spark).toPandas()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for old, new in zip(pdf["old_component"].tolist(), pdf["component"].tolist()):
            ra, rb = find(old), find(new)
            if ra == rb:
                continue
            # labels are homogeneous ids (min-label invariant: keep the
            # smaller root so the final label is the true min)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        return {k: find(k) for k in list(parent)}

    def components(self, spark: SparkSession) -> DataFrame:
        """(id, component) for every indexed doc, relabel log applied —
        exactly what full-corpus clustering over all indexed docs yields."""
        p = self.params()
        comp = self.rows.read(spark).select(
            F.col("_id").alias(p["id_col"]), "component"
        ).distinct()
        return self._apply_relabels(spark, comp)

    def band_index(self, spark: SparkSession) -> DataFrame:
        """(_band, _bh, _id, component) — the LSH band rows with the
        relabel log folded in, i.e. the labels full-corpus clustering
        would assign TODAY. This is the read surface a streaming matcher
        (``streaming.sessions.stream_near_dup``) must join against:
        stored rows are append-only and keep their at-write labels, so a
        matcher reading ``self.rows`` raw would emit PRE-merge components
        for any cluster a later batch bridged."""
        raw = self.rows.read(spark).select("_band", "_bh", "_id", "component")
        return self._apply_relabels(spark, raw)

    def _apply_relabels(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        """Fold the (tiny, driver-resolved) relabel log into ``df``'s
        ``component`` column via a broadcast map join."""
        mapping = self._relabel_map(spark)
        if not mapping:
            return df
        mdf = spark.createDataFrame(list(mapping.items()), ["component", "_new"])
        others = [c for c in df.columns if c != "component"]
        return df.join(F.broadcast(mdf), "component", "left").select(
            *others,
            F.coalesce(F.col("_new"), F.col("component")).alias("component"),
        )
