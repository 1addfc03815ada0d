"""Corpus governance: classify → audit → upsert → purge → expire.

The lifecycle a production training-corpus table actually lives through,
composed from the round-5 operator families:

  1. route documents by language with a self-trained multinomial Naive
     Bayes classifier (the fastText-niche bag-of-words baseline);
  2. audit the corpus for exact repeated substrings with the distributed
     suffix array (the Lee et al. 2022 ExactSubstr lane — char-granular,
     no n-gram grid);
  3. land the corpus as a versioned snapshot table, MERGE a corrected
     re-crawl batch (file-granular copy-on-write — untouched files carry
     by reference);
  4. purge an opt-out list with the right-to-be-forgotten pass and PROVE
     the purged keys are gone;
  5. expire historical snapshots so the purged bytes are physically
     deleted — forget + expire = true erasure;
  6. wrap a naive per-entity forecast in split-conformal intervals as the
     honest error bar on a learned signal.

Run: python examples/governance_pipeline.py  (local[8], ~2 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("governance-pipeline", master="local[8]", shuffle_partitions=8)

    from temporalscope_spark.datasets.synthetic import generate_documents

    langs = F.array(*[F.lit(x) for x in ("de", "en", "es", "fr", "zh")])
    docs = (
        generate_documents(spark, num_docs=5_000)
        .withColumn(
            "lang",
            F.element_at(langs, (F.pmod(F.xxhash64("doc_id"), F.lit(5)) + 1).cast("int")),
        )
        .withColumn("n_chars", F.length("text"))
        .cache()
    )
    print(f"corpus: {docs.count()} docs")

    # 1. NB language routing (self-train on the lang column)
    from temporalscope_spark.core.caching import release
    from temporalscope_spark.modeling import nb_classify

    routed = nb_classify(docs, vocab_size=400)
    by_pred = routed.groupBy("pred").count().collect()
    print("NB routing:", {r["pred"]: r["count"] for r in by_pred})
    release(routed)

    # 2. exact repeated-substring audit on a slice (suffix array)
    from temporalscope_spark.operators.suffix import repeated_substrings

    audit = repeated_substrings(
        docs.filter(F.col("doc_id") % 10 == 0), min_len=12, top_k=5, cap=64
    ).collect()
    print("longest exact repeats:")
    for r in sorted(audit, key=lambda r: (-r["length"], r["substring"])):
        print(f"  len={r['length']} x{r['n_occurrences']}: {r['substring'][:60]!r}")

    # 3. snapshot lifecycle: land v0, MERGE a corrected batch
    from temporalscope_spark.datasets.snapshots import SnapshotTable

    tbl = SnapshotTable(tempfile.mkdtemp(prefix="gov_tbl_"))
    tbl.write(docs.repartition(8))
    fixed = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .withColumn("text", F.regexp_replace("text", r"\s+", " "))
        .withColumn("n_chars", F.length("text"))
    )
    v_merge = tbl.merge(spark, fixed, ["doc_id"], meta={"job": "recrawl-fix"})
    man = tbl._load(v_merge)
    print(
        f"merge v{v_merge}: rewrote {man['meta']['rewritten_files']} files, "
        f"added {man['meta']['added_files']}, table rows={tbl.read(spark).count()}"
    )

    # 4. right-to-be-forgotten purge + proof
    optout = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    n_opt = optout.count()
    v_purge = tbl.forget_keys(spark, optout, ["doc_id"], meta={"job": "optout"})
    remaining = tbl.read(spark).join(optout, "doc_id", "left_semi").count()
    print(f"purged {n_opt} opt-out docs at v{v_purge}; matches remaining: {remaining}")
    assert remaining == 0, "purged keys must be gone from the current snapshot"

    # 5. expire history: the purged bytes physically leave the disk
    old_files = set(tbl._load(1)["files"])
    rep = tbl.expire_snapshots(keep_last=1)
    gone = [f for f in old_files if not os.path.exists(f)]
    print(
        f"expired versions {rep['expired_versions']}; deleted "
        f"{rep['deleted_files']} orphaned files ({len(gone)} of v1's set)"
    )
    assert rep["deleted_files"] > 0
    assert tbl.read(spark).count() > 0  # current snapshot unharmed

    # 6. conformal error bars on a naive per-entity forecast
    from pyspark.sql.window import Window

    from temporalscope_spark.metrics.conformal import conformal_interval

    events = (
        spark.range(0, 20_000)
        .select(
            F.col("id").alias("event_id"),
            F.pmod("id", F.lit(50)).alias("user_id"),
            F.col("id").cast("double").alias("ts"),
            (
                F.sin(F.col("id").cast("double") / 37.0)
                + F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 5000.0
            ).alias("value"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    base = events.select(
        "event_id",
        "value",
        F.lag("value").over(w).alias("yhat"),
        (F.col("event_id") % 2 == 0).alias("is_calib"),
    ).filter(F.col("yhat").isNotNull())
    iv = conformal_interval(base, "value", "yhat", "is_calib", alpha=0.1,
                            id_col="event_id")
    cov = iv.agg(F.avg(F.col("covered").cast("double"))).collect()[0][0]
    q = iv.select("qhat").first()["qhat"]
    print(f"conformal alpha=0.1: qhat={q:.4f}, empirical coverage={cov:.3f}")
    assert cov >= 0.88, "split conformal must hit ~90% coverage on exchangeable data"

    print("governance pipeline complete.")


if __name__ == "__main__":
    main()
