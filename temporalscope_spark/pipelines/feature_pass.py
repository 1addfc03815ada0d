"""The flagship pipeline: sliding-window partition + leakage-safe target
shift over a tokenized-sequence table, resumable, spark-submit-ready.

North star (BASELINE.json): partition the Iceberg-style table of
(doc_id, event_time, tokens, n_tok, source) into explicit buckets, compute
per-entity lead targets and lag features inside
``Window.partitionBy(doc_id).orderBy(event_time)``, pad token arrays, write
per-bucket outputs with lineage manifests so a killed run resumes.

Plan shape (one heavy shuffle total):
  scan → [bucket label: time-range broadcast join, narrow] →
  shuffle on doc_id → ALL window exprs (lead target, k lag features,
  per-doc min/max for split labels) share ONE WindowExec sort →
  pad (narrow expressions) → per-bucket parquet writes.

Run: ``spark-submit --py-files temporalscope_spark.zip -m ...`` or
``python -m temporalscope_spark.pipelines.feature_pass --input ... --output ...``.
"""

from __future__ import annotations

import argparse
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.checkpoint import CheckpointStore, snapshot_fingerprint
from temporalscope_spark.operators.padding import pad_token_arrays


def build_features(
    df: DataFrame,
    id_col: str = "doc_id",
    time_col: str = "event_time",
    target_col: str = "n_tok",
    n_lags: int = 2,
    pad_to: int = 64,
    train_pct: float = 0.7,
) -> DataFrame:
    """Leakage-safe feature frame: lead-1 target, lag features, split label.

    Every expression below shares the SAME window spec → Catalyst plans ONE
    sort+window operator; the only shuffle is the hash exchange on id_col.
    Features at time t read strictly t-or-earlier rows (lags); the label is
    strictly-future (lead) and is never also a feature — zero leakage.
    """
    w = Window.partitionBy(id_col).orderBy(time_col)
    wd = Window.partitionBy(id_col)

    out = df.withColumn("target", F.lead(F.col(target_col), 1).over(w))
    for n in range(1, n_lags + 1):
        out = out.withColumn(f"{target_col}_lag_{n}", F.lag(F.col(target_col), n).over(w))

    # split labels from the FULL entity span (before the trailing-row drop),
    # same window partitioning → no extra shuffle
    tcur = F.unix_micros(F.col(time_col).cast("timestamp"))
    tmin = F.min(tcur).over(wd)
    tmax = F.max(tcur).over(wd)
    out = out.withColumn(
        "split",
        F.when(
            (tcur - tmin) <= (tmax - tmin) * train_pct, F.lit("train")
        ).otherwise(F.lit("test")),
    )
    out = out.filter(F.col("target").isNotNull())
    if "tokens" in df.columns:
        out = pad_token_arrays(out, target_len=pad_to)
    return out


def build_features_clustered(
    df: DataFrame,
    id_col: str = "doc_id",
    time_col: str = "event_time",
    target_col: str = "n_tok",
    chunk_col: str = "time_chunk",
    pad_to: int = 64,
    train_pct: float = 0.7,
) -> DataFrame:
    """Skew-proof flagship pass over a table stored clustered by
    ``(id_col, chunk_col)`` (``bucketBy(n, id, chunk).sortBy(id, chunk, t)``).

    Equal output to :func:`build_features` (n_lags=1), but every stage is
    bounded and balanced at 10^12 rows:

    * lead target + lag feature via ONE window over ``(id, chunk)`` — no
      exchange on the clustered layout, per-task state = one chunk, hot
      entities spread across all buckets by the chunk salt;
    * chunk-boundary repair from ONE per-chunk aggregate (first/last target
      per (id, chunk)) sort-merge-joined back on the clustering keys — the
      repair table grows with the corpus, so it is never broadcast;
    * train/test split labels from a per-entity min/max aggregate
      (map-side-combinable, skew-free) folded into the same repair join —
      never an unbounded window;
    * fixed-length token padding LAST (a narrow projection).
    """
    t = F.col(time_col)
    tgt = F.col(target_col)
    t_us = F.unix_micros(t.cast("timestamp"))

    # ONE narrow aggregate (tokens pruned from its scan) serves both shift
    # directions AND the per-entity span: per (id, chunk) first/last target
    # + chunk time bounds; spans fold from this tiny table, not the big one
    edges = df.groupBy(id_col, chunk_col).agg(
        F.min_by(target_col, time_col).alias("_first"),
        F.max_by(target_col, time_col).alias("_last"),
        F.min(t_us).alias("_c_tmin"),
        F.max(t_us).alias("_c_tmax"),
    )
    wb = Window.partitionBy(id_col).orderBy(chunk_col)
    wspan = Window.partitionBy(id_col)
    # boundary-repair values + entity span in ONE compact per-chunk table
    repair = edges.select(
        id_col,
        chunk_col,
        F.lead("_first", 1).over(wb).alias("_next_first"),
        F.lag("_last", 1).over(wb).alias("_prev_last"),
        F.min("_c_tmin").over(wspan).alias("_tmin"),
        F.max("_c_tmax").over(wspan).alias("_tmax"),
    )

    out = df.join(repair.hint("merge"), [id_col, chunk_col], "left")

    # n_lags=1 and a non-null target contract: lead/lag null ⟺ chunk edge,
    # so coalesce IS the boundary repair — no row_number/count frames needed
    w = Window.partitionBy(id_col, chunk_col).orderBy(time_col)
    out = (
        out.withColumn("target", F.coalesce(F.lead(tgt, 1).over(w), F.col("_next_first")))
        .withColumn(
            f"{target_col}_lag_1",
            F.coalesce(F.lag(tgt, 1).over(w), F.col("_prev_last")),
        )
        .filter(F.col("target").isNotNull())
    )
    out = out.withColumn(
        "split",
        F.when(
            (t_us - F.col("_tmin")) <= (F.col("_tmax") - F.col("_tmin")) * train_pct,
            F.lit("train"),
        ).otherwise(F.lit("test")),
    ).drop("_next_first", "_prev_last", "_tmin", "_tmax")
    if "tokens" in df.columns:
        out = pad_token_arrays(out, target_len=pad_to)
    return out


def time_buckets(df: DataFrame, time_col: str, num_buckets: int) -> list[tuple]:
    """Equi-probable time-range bucket bounds via ONE approx-quantile pass.

    Returns [(bucket_id, lo, hi)] half-open ranges covering the table; each
    bucket is processed/committed independently (resume granularity) and the
    range predicate prunes partitions on a time-partitioned store.
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    tnum = df.select(F.unix_micros(F.col(time_col).cast("timestamp")).alias("_t"))
    qs = tnum.stat.approxQuantile("_t", probs, 0.001) if probs else []
    edges = sorted(set(qs))
    lows = [None] + edges
    highs = edges + [None]
    return [(i, lo, hi) for i, (lo, hi) in enumerate(zip(lows, highs))]


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    num_buckets: int = 8,
    n_lags: int = 2,
    pad_to: int = 64,
) -> dict:
    """Resumable bucket-by-bucket execution with lineage manifests."""
    df = spark.read.parquet(input_path)
    snap = snapshot_fingerprint(input_path, str(df.schema))
    store = CheckpointStore(checkpoint_path, snapshot_id=snap)
    buckets = time_buckets(df, "event_time", num_buckets)
    done = store.completed_buckets()
    stats = {"processed": 0, "skipped": 0}
    tcol = F.unix_micros(F.col("event_time").cast("timestamp"))
    for bucket_id, lo, hi in buckets:
        if bucket_id in done:
            stats["skipped"] += 1
            continue
        t0 = time.monotonic()
        part = df
        if lo is not None:
            part = part.filter(tcol >= F.lit(lo))
        if hi is not None:
            part = part.filter(tcol < F.lit(hi))
        feats = build_features(part, n_lags=n_lags, pad_to=pad_to)
        out_dir = os.path.join(output_path, f"bucket={bucket_id}")
        feats.write.mode("overwrite").parquet(out_dir)
        n = spark.read.parquet(out_dir).count()
        store.record_bucket(
            bucket_id,
            bounds=(lo, hi),
            row_count=n,
            metrics={"duration_sec": round(time.monotonic() - t0, 3)},
        )
        stats["processed"] += 1
    return stats


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="sliding-window + target-shift feature pass")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-buckets", type=int, default=8)
    p.add_argument("--n-lags", type=int, default=2)
    p.add_argument("--pad-to", type=int, default=64)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from temporalscope_spark.session import get_spark

    # under spark-submit the CLI --master must rule; "inherit" skips
    # builder.master so the submitted conf is used. spark-submit's python
    # runner always exports PYSPARK_GATEWAY_PORT (the JVM is pre-launched).
    in_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = args.master or ("inherit" if in_submit else None)
    spark = get_spark("feature-pass", master=master)
    stats = run_pipeline(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        num_buckets=args.num_buckets,
        n_lags=args.n_lags,
        pad_to=args.pad_to,
    )
    print(stats)


if __name__ == "__main__":
    main()

def incremental_features(
    spark: SparkSession,
    table,
    from_version: int,
    to_version: int | None = None,
    id_col: str = "doc_id",
    n_lags: int = 2,
    pad_to: int = 64,
    broadcast_entities: bool = True,
) -> DataFrame:
    """Feature rows INVALIDATED by moving from snapshot ``from_version`` to
    ``to_version`` — the affected-entity incremental recompute.

    A naive "run the feature pass on just the new rows" is WRONG for
    window features: appending one event to an entity changes the lead
    target of its previous last row and feeds new lag values forward. The
    sound increment for per-entity windows is ENTITY-scoped: every feature
    row depends only on its own entity's rows, so

      1. ``read_increment`` plans exactly the landed files (metadata-only);
      2. the distinct touched-entity set comes from that small batch;
      3. the full target snapshot is SEMI-JOINED down to touched entities
         (broadcast by default — a landed batch's entity set is tiny next
         to the corpus; set ``broadcast_entities=False`` for backfills that
         touch most entities and let AQE pick the join) — on an
         id-partitioned layout this prunes, never scans, the untouched 99%;
      4. the standard feature pass recomputes those entities completely.

    Rows for untouched entities are bit-identical to the previous run by
    construction, so callers overwrite affected entities' outputs and keep
    the rest — 100 TB stays resident, only the delta is computed. Returns
    the recomputed feature frame (caller writes/merges it).
    """
    inc = table.read_increment(spark, from_version, to_version)
    touched = inc.select(id_col).distinct()
    if broadcast_entities:
        touched = F.broadcast(touched)
    full = table.read(spark, to_version)
    scoped = full.join(touched, id_col, "left_semi")
    return build_features(scoped, id_col=id_col, n_lags=n_lags, pad_to=pad_to)


def run_pipeline_on_snapshot(
    spark: SparkSession,
    table_path: str,
    output_path: str,
    checkpoint_path: str,
    version: int | None = None,
    num_buckets: int = 8,
    n_lags: int = 2,
    pad_to: int = 64,
) -> dict:
    """Resumable feature pass over a :class:`SnapshotTable` snapshot.

    The snapshot's content id keys the checkpoint store, which gives the
    exact Iceberg-consistency story the north rule describes: resuming
    against the SAME snapshot skips completed buckets; a NEW snapshot
    (append/overwrite since the last run) invalidates stale manifests and
    reprocesses — never a silent mix of two table versions.
    """
    from temporalscope_spark.datasets.snapshots import SnapshotTable

    table = SnapshotTable(table_path)
    version = version if version is not None else table.current_version()
    df = table.read(spark, version)
    store = CheckpointStore(checkpoint_path, snapshot_id=table.snapshot_id(version))
    buckets = time_buckets(df, "event_time", num_buckets)
    done = store.completed_buckets()
    stats = {"processed": 0, "skipped": 0, "snapshot_version": version}
    tcol = F.unix_micros(F.col("event_time").cast("timestamp"))
    for bucket_id, lo, hi in buckets:
        if bucket_id in done:
            stats["skipped"] += 1
            continue
        t0 = time.monotonic()
        part = df
        if lo is not None:
            part = part.filter(tcol >= F.lit(lo))
        if hi is not None:
            part = part.filter(tcol < F.lit(hi))
        feats = build_features(part, n_lags=n_lags, pad_to=pad_to)
        out_dir = os.path.join(output_path, f"bucket={bucket_id}")
        feats.write.mode("overwrite").parquet(out_dir)
        n = spark.read.parquet(out_dir).count()
        store.record_bucket(
            bucket_id,
            bounds=(lo, hi),
            row_count=n,
            metrics={"duration_sec": round(time.monotonic() - t0, 3)},
        )
        stats["processed"] += 1
    return stats
