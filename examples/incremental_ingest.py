"""The incremental-ingest story, end to end, on a synthetic corpus.

A corpus that GROWS: new document batches land as snapshot commits, and
every derived artifact updates at BATCH-sized cost —

  1. corpus lands in a SnapshotTable (atomic manifest commits);
  2. DedupIndex.create clusters v0 once and persists fingerprint +
     minhash-band rows per doc;
  3. a new batch lands; read_increment plans exactly the landed rows
     (metadata-only diff) and dedup_batch near-dups them against the
     index WITHOUT re-fingerprinting the corpus;
  4. the same maintenance runs as a STREAM: readStream -> foreachBatch
     (idempotent under replay via commit meta);
  5. an AnnIndex does the embedding-side twin: train the IVF quantizer
     once, add new vectors under the frozen centroids, probe with
     file-pruned scans;
  6. curate_corpus composes gate + dedup + decontamination into the
     training-set funnel.

Run: python examples/incremental_ingest.py  (local[8], ~2 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("ingest", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="ingest_demo_")

    from temporalscope_spark.datasets.snapshots import SnapshotTable
    from temporalscope_spark.datasets.synthetic import generate_documents
    from temporalscope_spark.operators.incremental_dedup import DedupIndex

    docs = generate_documents(spark, num_docs=3_000).cache()
    v0 = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # 1-2. corpus v0 lands; index it once
    corpus = SnapshotTable(os.path.join(work, "corpus"))
    v_base = corpus.write(v0, mode="append")
    params = dict(num_hashes=16, bands=4, shingle_n=12, threshold=0.3)
    idx = DedupIndex.create(os.path.join(work, "dedup_idx"), v0, **params)
    print(f"v0 indexed: {idx.rows.read(spark).select('_id').distinct().count()} docs")

    # 3. a batch lands; incremental dedup at batch-sized cost
    corpus.write(batch, mode="append")
    landed = corpus.read_increment(spark, from_version=v_base)
    res = idx.dedup_batch(spark, landed, corpus.read(spark, version=v_base))
    n_dups = res.batch_components.filter(
        F.col("component") != F.col("doc_id")
    ).count()
    print(f"batch of {landed.count()}: {n_dups} near/exact dups vs the corpus")
    res.unpersist()

    # 4. the same maintenance as a stream (replay-safe via commit meta)
    stream_dir = os.path.join(work, "arrivals")
    extra = generate_documents(spark, num_docs=400).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    extra.coalesce(2).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema(extra.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(idx.stream_sink(corpus))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print(f"after streaming ingest: corpus={corpus.read(spark).count()} docs, "
          f"index version v{idx.rows.current_version()}")

    # 5. the embedding twin: frozen-quantizer ANN index (deterministic
    # synthetic vectors: hash-derived floats per (id, dim))
    from temporalscope_spark.operators.ann_index import AnnIndex

    emb = (
        spark.range(2_000)
        .select(F.col("id").alias("vec_id"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda d: (
                    (F.xxhash64(F.col("vec_id"), d) % 1000).cast("double") / 500.0
                ),
            ),
        )
        .cache()
    )
    ev0 = emb.filter(F.col("vec_id") % 5 != 0)
    ebatch = emb.filter(F.col("vec_id") % 5 == 0)
    ann = AnnIndex.create(
        os.path.join(work, "ann_idx"), ev0, num_centroids=8, seed=7
    )
    ann.add_batch(ebatch, meta={"stream_batch_id": 0})
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    print("ANN top-3 (frozen quantizer, file-pruned probe):")
    ann.topk(spark, qvec, k=3, nprobe=3).show()

    # 6. the curation funnel over the grown corpus
    from temporalscope_spark.pipelines.curation import curate_corpus

    all_docs = corpus.read(spark)
    ev_docs = all_docs.filter(F.col("doc_id") % 13 == 0)
    train = all_docs.filter(F.col("doc_id") % 13 != 0)
    curated = curate_corpus(train, ev_docs, decontam_n=4)
    print(f"curation funnel: {train.count()} -> {curated.count()} training docs")

    spark.stop()
    print("incremental ingest tour complete")


if __name__ == "__main__":
    main()
