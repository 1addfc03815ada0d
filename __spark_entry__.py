"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 run
over /root/testdata parquet; ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL. Column names/aliases match exactly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sp(df: DataFrame) -> DataFrame:
    """Parallelism floor before a compute-bound per-row stage
    (core/spread.py): no-op at scale, unlocks the idle cores when the
    input is a single small file."""
    from temporalscope_spark.core.spread import spread

    return spread(df)


# --------------------------------------------------------------------------
# flagship: sliding-window partition + target-shift feature pass (W3 + W1)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: bucket `events` into sliding windows, then run the
    leakage-safe target shift per user inside each bucket."""
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
    from temporalscope_spark.operators.shift import shift_target

    events = _t(spark, "/root/testdata/sf0.001", "events")
    tf = TemporalFrame(
        events,
        time_col="ts",
        target_col="value",
        id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"),
        sort=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    labeled = part.with_bucket_labels()
    shifted = shift_target(
        labeled, time_col="ts", target_col="value", n_lags=1, id_col="user_id",
        check_empty=False,
    )
    return shifted.select(
        "event_id", "user_id", "ts", "bucket", "split", "value",
        F.col("value_shift_1").alias("target"),
    )


# --------------------------------------------------------------------------
# per-operator queries + DuckDB oracles
# --------------------------------------------------------------------------

def q_target_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.shift import shift_target

    events = _t(spark, sf_dir, "events")
    out = shift_target(events, "ts", "value", n_lags=1, id_col="user_id")
    return out.select("event_id", "user_id", "value", F.col("value_shift_1").alias("value_shift_1"))


def q_target_shift_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof chunked shift must equal the plain per-entity LEAD — the
    oracle is intentionally the same SQL as target_shift."""
    from temporalscope_spark.operators.shift import shift_target_chunked

    events = _t(spark, sf_dir, "events")
    out = shift_target_chunked(
        events, "ts", "value", n_lags=1, id_col="user_id", chunk_seconds=6 * 3600
    )
    return out.select("event_id", "user_id", "value", "value_shift_1")


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    out = lag_features(events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True)
    return out.select("event_id", "user_id", "value_lag_1", "value_lag_2")


def q_multi_step_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seq2seq horizon: array of the next 3 target values per user-event."""
    from temporalscope_spark.operators.shift import multi_step_targets

    events = _t(spark, sf_dir, "events")
    out = multi_step_targets(events, "ts", "value", horizon=3, id_col="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.array_join(
            F.transform(
                F.col("value_next_3"),
                lambda x: F.floor(x * 1_000_000).cast("long").cast("string"),
            ),
            ",",
        ).alias("next_vals"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.sessionize import sessionize

    events = _t(spark, sf_dir, "events")
    out = sessionize(events, "ts", "user_id", gap=3600.0)
    return out.select("event_id", "user_id", F.col("session_id").cast("long").alias("session_id"))


def q_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.sessionize import session_bounds

    events = _t(spark, sf_dir, "events")
    out = session_bounds(events, "ts", "user_id", gap=3600.0)
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_window_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.plans.rownum import with_global_row_number

    events = _t(spark, sf_dir, "events")
    numbered = with_global_row_number(events, ["ts"], "_rn")
    return (
        numbered.withColumn("bucket", F.floor((F.col("_rn") - 1) / F.lit(1000)).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["last_price"],
    )
    return out.select("event_id", "user_id", "last_price")


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each event, the user's EARLIEST order on/after it."""
    from temporalscope_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_totalprice").alias("next_price"))
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["next_price"], direction="forward",
    )
    return out.select("event_id", "user_id", "next_price")


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.asof import forward_fill

    events = _t(spark, sf_dir, "events").withColumn(
        "value_ff",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    out = forward_fill(events, "ts", ["value_ff"], id_col="user_id")
    return out.select("event_id", "user_id", "value_ff")


def q_backward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.asof import backward_fill

    events = _t(spark, sf_dir, "events").withColumn(
        "value_bf",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    out = backward_fill(events, "ts", ["value_bf"], id_col="user_id")
    return out.select("event_id", "user_id", "value_bf")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 range/interval join: per order, count of its lineitems shipped in
    the 60-day window [o_orderdate, o_orderdate + 60d) — equality key
    (orderkey) makes it a hash join + residual range filter, never a nested
    loop. (TPC-H ships items 1-121 days after the order date, so this is
    match-dense at every sf — a 0-row result would hide oracle mismatches.)"""
    from temporalscope_spark.operators.asof import range_join

    intervals = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("d_lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("d_hi"),
    )
    pts = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_shipdate"
    )
    joined = range_join(pts, intervals, on="o_orderkey", point_col="l_shipdate",
                        lo_col="d_lo", hi_col="d_hi")
    return joined.groupBy(intervals["o_orderkey"].alias("o_orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shipped_60d")
    )


def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-check: F.session_window (Spark's native session aggregation)
    against the gap-based SQL formulation."""
    from temporalscope_spark.operators.sessionize import sessionize_builtin

    events = _t(spark, sf_dir, "events")
    out = sessionize_builtin(events, "ts", "user_id", gap_seconds=3600.0)
    return out.select(
        "user_id", "session_start", "session_end",
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_equidistant_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-entity distinct count of adjacent time deltas (µs) — the
    reference's equidistant-sampling gate (core_utils.py:1174-1207).
    Exact countDistinct here; at 10^12 rows use approx_count_distinct first
    and confirm exactly only on violators."""
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    deltas = events.withColumn("_delta", F.lead(t_us).over(w) - t_us)
    return deltas.groupBy("user_id").agg(
        F.count_distinct("_delta").cast("long").alias("n_deltas")
    )


def q_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9 conversion lanes: datetime → epoch µs/ms (double) and ns (long,
    overflow-safe LongType lane), plus the µs → timestamp round-trip."""
    from temporalscope_spark.core.convert import time_to_datetime, time_to_numeric

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("ts_us"),
        F.col("ts").alias("ts_ms"),
        F.col("ts").alias("ts_ns"),
        F.col("ts").alias("ts_rt"),
    )
    out = time_to_numeric(events, "ts_us", "us")
    out = time_to_numeric(out, "ts_ms", "ms")
    out = time_to_numeric(out, "ts_ns", "ns")
    out = time_to_numeric(out, "ts_rt", "us")
    out = time_to_datetime(out, "ts_rt", "us")
    return out.select("event_id", "ts_us", "ts_ms", "ts_ns", "ts_rt")


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+A6 fused: null count, mean, and distinct count for every feature
    column in ONE aggregation job (the reference loops one pass per column —
    functional.py:147-158, dataset_validator.py:378-394)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum((F.col(c).isNull() | F.isnan(c)).cast("long")).alias(f"nulls_{c}")
        )
        aggs.append(F.avg(c).alias(f"mean_{c}"))
        aggs.append(F.count_distinct(c).cast("long").alias(f"nd_{c}"))
    return li.agg(*aggs)


def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))


def q_pad_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 token-array padding (input_hint per-row token-array equality):
    derive a deterministic tokens array from the text, pad/truncate to 32
    with pad id 0 — pure JVM expressions, no shuffle, no Python."""
    from temporalscope_spark.operators.padding import pad_token_arrays

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr(
            "transform(split(trim(text), '\\\\s+'), x -> cast(length(x) as int))"
        ).alias("tokens"),
    )
    out = pad_token_arrays(toks, target_len=32, n_tok_col=None)
    return out.select(
        "doc_id",
        F.array_join(F.transform(F.col("tokens"), lambda x: x.cast("string")), ",").alias(
            "tokens_str"
        ),
        F.size("tokens").cast("long").alias("n_tok"),
    )


def q_multi_lead_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_target mode (list-valued target, core_utils.py:61-72): lead of an
    array column per source — the seq2seq next-sequence label."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    toks = F.expr("transform(split(trim(text), '\\\\s+'), x -> cast(length(x) as int))")
    w = Window.partitionBy("source").orderBy("doc_id")
    out = docs.select("doc_id", "source", F.lead(toks).over(w).alias("next_tokens"))
    return out.filter(F.col("next_tokens").isNotNull()).select(
        "doc_id",
        "source",
        F.array_join(
            F.transform(F.col("next_tokens"), lambda x: x.cast("string")), ","
        ).alias("next_tokens_str"),
    )


def q_mean_fill_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 global parity op: pad a small aggregate frame to 8 rows with
    per-column means (reference functional.py:90-198 contract)."""
    from temporalscope_spark.operators.padding import mean_fill_pad

    agg = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("avg_v"),
        )
        .select("n", "avg_v")
    )
    out = mean_fill_pad(agg, target_len=8, padding="post")
    return out.select("n", F.round("avg_v", 6).alias("avg_v"))


def q_pad_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 per-entity mean-fill: bring every user up to 70 rows with mean rows
    (expression-only distributed plan — no applyInPandas, no driver loop).
    Mean preservation is the reference's |t| < 1e-6 invariant."""
    from temporalscope_spark.operators.padding import pad_groups_mean_fill

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = pad_groups_mean_fill(ev, "user_id", target_len=70, numeric_cols=["value"])
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


def q_partitioner_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 end-to-end: sliding-window partitioner (num_partitions=4,
    train_pct=0.7) over events; per (bucket, split) row counts + time bounds.
    Replicates the commented reference spec's linear time-range split
    (sliding_window.py:384-395)."""
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

    events = _t(spark, sf_dir, "events")
    tf = TemporalFrame(
        events, time_col="ts", target_col="value", id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"), sort=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    labeled = part.with_bucket_labels()
    return labeled.groupBy("bucket", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ).withColumn("bucket", F.col("bucket").cast("long"))


def q_validation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.avg("value").alias("avg_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def q_dup_timestamp_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") > 1)
        .select("user_id", "ts", "n")
    )


# ------------------------------------------------------------------
# training-data pipeline operators (text / dedup / similarity / media)
# ------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.text import with_fingerprint, with_token_count

    docs = _t(spark, sf_dir, "documents")
    out = with_fingerprint(with_token_count(docs, "text"), "text")
    return out.select("doc_id", "n_tokens", "fingerprint")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.text import with_quality_features

    docs = _t(spark, sf_dir, "documents")
    out = with_quality_features(docs, "text")
    return out.select("doc_id", "n_chars_calc", "n_tokens", "digit_ratio", "punct_ratio", "stopword_hits")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.text import with_quality_score

    docs = _t(spark, sf_dir, "documents")
    return with_quality_score(docs, "text").select("doc_id", "quality_score")


def q_dataset_validator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6 DatasetValidator end-to-end: per-check pass/fail over lineitem's
    numeric features (one fused stats job; reference dataset_validator.py)."""
    from temporalscope_spark.datasets.validator import DatasetValidator

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_linenumber", "l_partkey", "l_suppkey",
    )
    v = DatasetValidator(
        time_col="l_shipdate", target_col="l_quantity", enable_warnings=False
    )
    res = v.fit_transform(li, target_col="l_quantity")
    rows = [(k, bool(r.passed)) for k, r in sorted(res.items())]
    return spark.createDataFrame(rows, "check string, passed boolean")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.text import with_lang_id

    docs = _t(spark, sf_dir, "documents")
    return with_lang_id(docs, "text").select("doc_id", "lang_pred")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.dedup import dedup_exact

    docs = _t(spark, sf_dir, "documents")
    return dedup_exact(docs, "text", "doc_id").select("fingerprint", "doc_id")


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.dedup import minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, "doc_id", "text", num_hashes=4, shingle_n=12, hash_fn="md5")
    return sig.select(F.col("_id").alias("doc_id"), "mh_0", "mh_1", "mh_2", "mh_3")


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2022, distributed form):
    per-doc fraction of word 8-grams that occur >= 2 times corpus-wide.
    Counts are hash-key-invariant, so Spark groups xxhash64(gram) while
    the oracle groups the raw gram string — identical stats (a 64-bit
    collision inside this corpus is ~1e-13)."""
    from temporalscope_spark.operators.dedup import dup_span_stats

    docs = _t(spark, sf_dir, "documents")
    return dup_span_stats(docs, "text", "doc_id", n=8, min_total=2)


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span removal (Lee et al. 2022 transform half): strip
    every word position covered by a corpus-duplicated 8-gram and re-emit
    the surviving normalized text. Non-vacuous at sf0.01: the synthetic
    dup chains are fully stripped, clean docs pass through verbatim."""
    from temporalscope_spark.operators.dedup import remove_dup_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_dup_spans(docs, "text", "doc_id", n=8, min_total=2)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # stop-shingle guard (doc-freq ≤ 100) bounds the pair blow-up from the
    # shared-vocabulary corpus — same guard replicated in the oracle
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=12, threshold=0.2, max_shingle_df=100)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Oracle = the exact shingle-Jaccard pair set: emitted pairs are a
    # subset BY CONSTRUCTION (candidates are exact-verified), and banding
    # recall is 1.0 on the driver datasets (verified at sf0.01 and sf0.1;
    # tests/test_text_dedup.py asserts containment on adversarial data).
    #
    # FRAGILITY NOTE (deliberate, data-dependent): full equality with the
    # exact set holds only because the fixture's pair Jaccards are bimodal —
    # planted near-dups sit near j≈1 (band collision ~certain) and organic
    # pairs sit below the 0.2 threshold. A borderline pair at j≈0.2 has
    # <1% band-collision probability with k=16/b=4, so REGENERATED data with
    # mid-Jaccard pairs would fail this row spuriously — that failure mode
    # means "re-tune k/b or switch this oracle to an algorithm replay", not
    # "the operator broke". The structural (data-independent) guarantees —
    # emitted ⊆ exact, banding semantics — are what the pytest containment
    # and planted-recall tests assert.
    from temporalscope_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.2)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup equivalence, end to end: index 90% of documents
    (doc_id % 10 != 0) as the existing corpus, then dedup the remaining 10%
    as an appended batch against the persisted-index SHAPE (fingerprint +
    band rows + component labels) — batch-sized work only. Output: the
    final (doc_id, canonical_id) for ALL docs (v0 labels with merge
    relabels applied ∪ batch labels).

    Oracle: FULL-corpus clustering (exact-Jaccard pairs >= 0.2 + recursive
    transitive closure) — the equivalence property itself is the check.
    Same FRAGILITY NOTE as minhash_lsh_pairs: equality relies on banding
    recall being 1.0 on this corpus (verified at sf0.01/sf0.1); the
    incremental==full-LSH equivalence is structural and pinned by
    tests/test_incremental_dedup.py on adversarial bridge/merge fixtures."""
    from pyspark import StorageLevel

    from temporalscope_spark.operators.dedup import _shingle_table
    from temporalscope_spark.operators.incremental_dedup import (
        cluster_corpus,
        dedup_index_rows,
        incremental_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    v0 = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    params = dict(num_hashes=16, bands=4, shingle_n=12, threshold=0.2)
    # ONE persisted shingle table feeds clustering AND index rows, and the
    # small label/index tables persist because the final plan branches over
    # them (index → incremental pass, labels → relabel join) — without
    # these the pairs pipeline re-evaluates per branch (measured 51.5s →
    # 21.6s cold / 9.4s warm at sf0.1).
    v0_sh = _shingle_table(v0, "doc_id", "text", 12, None).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    v0_labels = cluster_corpus(v0, shingles=v0_sh, **params).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    index = dedup_index_rows(
        v0, components=v0_labels, shingles=v0_sh, **params
    ).persist(StorageLevel.MEMORY_AND_DISK)
    res = incremental_dedup(index, batch, v0, **params)
    rl = res.relabels.selectExpr("old_component as component", "component as _new")
    v0_out = v0_labels.join(F.broadcast(rl), "component", "left").select(
        "doc_id", F.coalesce("_new", "component").alias("canonical_id")
    )
    b_out = res.batch_components.select(
        "doc_id", F.col("component").alias("canonical_id")
    )
    return v0_out.unionByName(b_out)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT oracle: md5-60bit signature is bit-identical in DuckDB, and the
    # 4-chunk pigeonhole candidate set is COMPLETE for hamming <= 3, so the
    # output equals the brute-force hamming ball by construction
    from temporalscope_spark.operators.dedup import simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=3, hash_fn="md5"
    ).select("id_a", "id_b", "hamming")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    top = cosine_topk(emb, qvec, k=10)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT all-pairs via triangular block-GEMM (no CartesianProduct node);
    # threshold 0.4 keeps the oracle set non-empty (59 pairs at sf0.01)
    from temporalscope_spark.operators.similarity import cosine_self_join_pairs

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_self_join_pairs(emb, threshold=0.4, method="gemm")
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_embedding_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Approximate scale path: SRP multi-probe blocking + exact verify. The
    # oracle replays the ALGORITHM (same deterministic hyperplanes inlined
    # as SQL literals, same hamming<=2 candidate rule, same exact-cosine
    # verify), so equality is structural UP TO float summation order:
    # an SRP sign bit is sign(dot(v, h)), and a vector lying within ~1 ulp
    # of a hyperplane can flip under DuckDB's list_dot_product summation
    # vs Spark's fold, changing the hamming<=2 candidate set (same
    # data-dependent fragility class as the minhash_lsh_pairs FRAGILITY
    # NOTE — a future spurious mismatch here is oracle fragility, not an
    # operator bug). Non-vacuous: threshold 0.4 yields a real pair set
    # (subset of the 59/920 exact pairs at sf0.01/sf0.1). dim=64
    # (TESTDATA.md) is passed so no eager plan-build job runs. Recall vs
    # the exact set is covered in tests/test_text_dedup.py (containment +
    # planted-cluster floor).
    from temporalscope_spark.operators.similarity import cosine_self_join_pairs

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_self_join_pairs(
        emb, threshold=0.4, method="lsh", probe_hamming=2, dim=64
    )
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT oracle: the SRP bucketing + hamming<=2 multi-probe + exact
    # re-rank pipeline is replayed in DuckDB SQL with the same deterministic
    # hyperplanes inlined as literals — the oracle checks the approximate
    # ALGORITHM's semantics, not just row counts
    from temporalscope_spark.operators.similarity import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    return ann_topk(emb, qvec, k=10, probe_hamming=2).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate: recall@10 of the SRP multi-probe and IVF lanes
    against the exact brute-force top-10, computed relationally
    (left-semi overlap counts — a million-query eval would never
    collect). The oracle composes the three existing exact pipeline
    replays as nested-WITH subqueries."""
    from temporalscope_spark.operators.similarity import topk_recall

    exact = q_cosine_topk(spark, sf_dir)
    srp = topk_recall(exact, q_ann_topk(spark, sf_dir)).select(
        F.lit("srp").alias("method"), "n_exact", "n_overlap", "recall"
    )
    ivf = topk_recall(exact, q_ivf_topk(spark, sf_dir)).select(
        F.lit("ivf").alias("method"), "n_exact", "n_overlap", "recall"
    )
    return srp.unionByName(ivf)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local fingerprints — md5-60bit lane, exact oracle."""
    from temporalscope_spark.operators.dedup import winnowing_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4, hash_fn="md5")


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style coarse token estimate (regex runs, engine-portable)."""
    from temporalscope_spark.operators.text import with_bpe_token_count

    docs = _t(spark, sf_dir, "documents")
    return with_bpe_token_count(docs, "text", "n_bpe_tokens").select(
        "doc_id", "n_bpe_tokens"
    )


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style composed corpus filter (quality score + repetition
    signals) — one fused projection + filter, no shuffle."""
    from temporalscope_spark.operators.text import quality_filter

    docs = _sp(_t(spark, sf_dir, "documents"))
    out = quality_filter(
        docs, "text", min_quality=0.6, max_dup_word_ratio=0.5,
        max_trigram_dup_ratio=0.9,
    )
    return out.select(
        "doc_id",
        F.round("quality_score", 6).alias("quality_score"),
        F.round("dup_word_ratio", 6).alias("dup_word_ratio"),
        F.round("trigram_dup_ratio", 6).alias("trigram_dup_ratio"),
    )


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation funnel (pipelines/curation.py): quality gate →
    near-dup cluster survivors → word-4-gram decontamination vs the eval
    slice (doc_id % 13 == 0), returning (doc_id, n_tokens) per surviving
    doc. Funnel at sf0.01: 461 train → 198 gated → 187 canonical → 179
    clean — every stage drops rows, so the composition is non-vacuous.
    Oracle: the full pipeline as one DuckDB CTE chain (the gate, the
    recursive-CTE transitive closure, and the gram containment are each
    the already-proven per-stage oracles, spliced)."""
    from temporalscope_spark.pipelines.curation import curate_corpus

    docs = _sp(_t(spark, sf_dir, "documents"))
    ev = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    return curate_corpus(train, ev, decontam_n=4)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: exact-Jaccard pairs -> connected components ->
    one canonical id per cluster for every doc (pairs (a,b),(b,c) collapse
    to ONE survivor). Oracle: recursive-CTE transitive closure in DuckDB."""
    from temporalscope_spark.operators.dedup import (
        dedup_cluster_survivors,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    # stop-shingle df cap: without it the equi-join on ubiquitous shingles
    # dominates (measured 32s vs 8s at sf0.1) — same guard as ngram_jaccard
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=12, threshold=0.2, max_shingle_df=100
    )
    out = dedup_cluster_survivors(docs, pairs, "doc_id")
    return out.select("doc_id", "canonical_id")


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (int/int ratios, exact)."""
    from temporalscope_spark.operators.text import with_repetition_features

    docs = _sp(_t(spark, sf_dir, "documents"))
    out = with_repetition_features(docs, "text")
    return out.select(
        "doc_id",
        F.round("dup_word_ratio", 6).alias("dup_word_ratio"),
        F.round("top_word_ratio", 6).alias("top_word_ratio"),
        F.round("trigram_dup_ratio", 6).alias("trigram_dup_ratio"),
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher rule battery (Rae et al. 2021 A1.1): word-count /
    mean-word-length / symbol / alpha-word / stop-word metrics plus the
    n-gram character-fraction repetition rules (top n-gram char fraction
    for n=2..4, duplicated n-gram char mass for n=5..10) and the
    conjunction gate. Expression-only per-row folds — no explode, no
    shuffle; the oracle rebuilds the same grams via UNNEST + list_slice
    and the same (count, gram) tie-break via ORDER BY cnt DESC, gram
    DESC."""
    from temporalscope_spark.operators.gopher import gopher_quality_flags

    docs = _sp(_t(spark, sf_dir, "documents"))
    out = gopher_quality_flags(docs, "text")
    sel = [
        F.col("doc_id"),
        F.col("gopher_word_count"),
        F.col("gopher_mean_word_len"),
        F.col("gopher_symbol_word_ratio"),
        F.col("gopher_alpha_word_ratio"),
        F.col("gopher_stop_word_hits"),
    ]
    for n in (2, 3, 4):
        sel.append(
            F.round(f"top_{n}gram_char_frac", 6).alias(f"top_{n}gram_char_frac")
        )
    for n in (5, 6, 7, 8, 9, 10):
        sel.append(
            F.round(f"dup_{n}gram_char_frac", 6).alias(f"dup_{n}gram_char_frac")
        )
    sel.append(F.col("gopher_keep"))
    return out.select(*sel)


def q_media_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from temporalscope_spark.operators.multimodal import attach_media, extract_media_features

    docs = _t(spark, sf_dir, "documents")
    media = attach_media(docs, "text", modality="image")
    feats = extract_media_features(media, id_cols=("doc_id",), n_features=4)
    return feats.select("doc_id", "n_bytes")


def _lang_score_sql(markers: list[str]) -> str:
    padded = "(' ' || lower(text) || ' ')"
    terms = [
        f"CAST((length({padded}) - length(replace({padded}, '{m}', ''))) / {len(m)} AS BIGINT)"
        for m in markers
    ]
    return " + ".join(terms)


def _lang_id_oracle() -> str:
    from temporalscope_spark.operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ", ".join(f"{_lang_score_sql(LANG_MARKERS[l])} AS s_{l}" for l in langs)
    # replicate the argmax-with-alphabetical-tie-break fold
    best = "'und'"
    best_score = "CAST(0 AS BIGINT)"
    for l in langs:
        best = f"CASE WHEN s_{l} > {best_score} THEN '{l}' ELSE {best} END"
        best_score = f"CASE WHEN s_{l} > {best_score} THEN s_{l} ELSE {best_score} END"
    return f"SELECT doc_id, {best} AS lang_pred FROM (SELECT doc_id, text, {scores} FROM documents)"


def _ann_topk_oracle() -> str:
    """Replay q_ann_topk in SQL: same deterministic SRP hyperplanes (inlined
    as literals), same bucket signature, same hamming<=2 probe set, same
    exact re-rank. Embedding dim is 64 at every SF (TESTDATA.md)."""
    from temporalscope_spark.operators.similarity import _hyperplane

    planes = ", ".join(
        f"({p}, [{', '.join(repr(v) for v in _hyperplane(64, p, 42))}])"
        for p in range(8)
    )
    return f"""
        WITH planes(p, pv) AS (VALUES {planes}),
        vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        sigs AS (
            SELECT v.vec_id,
                   CAST(SUM(CASE WHEN list_dot_product(v.e, pl.pv) > 0
                                 THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS sig
            FROM vecs v CROSS JOIN planes pl GROUP BY v.vec_id
        ),
        q AS (
            SELECT s.sig AS qsig, v.e AS qe
            FROM sigs s JOIN vecs v USING (vec_id) WHERE v.vec_id = 0
        )
        SELECT v.vec_id, round(list_cosine_similarity(v.e, q.qe), 4) AS cosine
        FROM vecs v JOIN sigs s USING (vec_id), q
        WHERE bit_count(xor(s.sig, q.qsig)) <= 2
        ORDER BY list_cosine_similarity(v.e, q.qe) DESC, v.vec_id
        LIMIT 10
    """


def _embedding_lsh_pairs_oracle() -> str:
    """Replay q_embedding_near_pairs_lsh in SQL: the Spark LSH path emits a
    pair (a<b) iff hamming(SRP_sig_a, SRP_sig_b) <= probe_hamming (the left
    side probes every bucket within 2 bit flips of its own; the right stays
    home) AND exact cosine >= threshold. Same deterministic hyperplanes
    (dim=64, 8 planes, seed 42) inlined as literals as in the ann_topk
    oracle."""
    from temporalscope_spark.operators.similarity import _hyperplane

    planes = ", ".join(
        f"({p}, [{', '.join(repr(v) for v in _hyperplane(64, p, 42))}])"
        for p in range(8)
    )
    return f"""
        WITH planes(p, pv) AS (VALUES {planes}),
        vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        sigs AS (
            SELECT v.vec_id,
                   CAST(SUM(CASE WHEN list_dot_product(v.e, pl.pv) > 0
                                 THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS sig
            FROM vecs v CROSS JOIN planes pl GROUP BY v.vec_id
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(va.e, vb.e), 4) AS cosine
        FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 2
          AND list_cosine_similarity(va.e, vb.e) >= 0.4
    """


def _ivf_sql(seed_where: str = "TRUE") -> str:
    """The IVF pipeline replay (md5-seeded coarse quantizer → nearest-cell
    assignment over ALL vectors → nprobe cells → exact re-rank).
    ``seed_where`` restricts the quantizer's TRAINING set only — the
    ann_index_topk oracle trains on the v0 slice while assigning the full
    corpus, exactly the frozen-quantizer add_batch contract."""
    return f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
        SELECT e AS c,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')) - 1 AS idx
        FROM (SELECT * FROM vecs WHERE {seed_where}) sv
        ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
        LIMIT 8
    ),
    cents AS (
        SELECT idx, c,
               CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN 1.0
                    ELSE sqrt(list_dot_product(c, c)) END AS cn
        FROM seeds
    ),
    assigned AS (
        SELECT v.vec_id, v.e, ct.idx,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.e, ct.c) / ct.cn DESC, ct.idx DESC
               ) AS rnk
        FROM vecs v CROSS JOIN cents ct
    ),
    cells AS (SELECT vec_id, e, idx FROM assigned WHERE rnk = 1),
    q AS (SELECT e AS qe FROM vecs WHERE vec_id = 0),
    probes AS (
        SELECT ct.idx,
               row_number() OVER (
                   ORDER BY list_dot_product(q.qe, ct.c) / ct.cn DESC, ct.idx ASC
               ) AS pr
        FROM cents ct, q
    )
    SELECT c.vec_id, round(list_cosine_similarity(c.e, q.qe), 4) AS cosine
    FROM cells c JOIN probes p ON c.idx = p.idx AND p.pr <= 4, q
    ORDER BY list_cosine_similarity(c.e, q.qe) DESC, c.vec_id
    LIMIT 10
"""


_IVF_TOPK_ORACLE = _ivf_sql()


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe trailing time-range aggregates (strictly-past 1h window)."""
    from temporalscope_spark.operators.rolling import rolling_features

    events = _t(spark, sf_dir, "events")
    out = rolling_features(
        events, ["value"], [3600], time_col="ts", id_col="user_id",
        aggs=("count", "sum", "avg"),
    )
    return out.select(
        "event_id", "user_id", "value_count_3600s",
        F.round("value_sum_3600s", 6).alias("value_sum_3600s"),
        F.round("value_avg_3600s", 6).alias("value_avg_3600s"),
    )


def q_rolling_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing row-count aggregates over the previous 3 rows per user."""
    from temporalscope_spark.operators.rolling import rolling_row_features

    events = _t(spark, sf_dir, "events")
    out = rolling_row_features(
        events, ["value"], [3], time_col="ts", id_col="user_id", aggs=("avg", "sum")
    )
    return out.select(
        "event_id", "user_id",
        F.round("value_avg_last3", 6).alias("value_avg_last3"),
        F.round("value_sum_last3", 6).alias("value_sum_last3"),
    )


# EWMA truncation horizon must be identical on both engine and oracle sides:
# a = 2^(-1/halflife); K = ceil(log(rel_tol)/log(a)) with rel_tol=1e-12, hl=5.
_EWMA_HL = 5.0
_EWMA_K = 200


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted EWMA per user (fold over the trailing frame, JVM-side)."""
    from temporalscope_spark.operators.rolling import ewma

    events = _t(spark, sf_dir, "events")
    out = ewma(events, "value", halflife_rows=_EWMA_HL, time_col="ts", id_col="user_id")
    return out.select("event_id", "user_id", F.round("value_ewma", 6).alias("value_ewma"))


def q_ewma_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented-scan EWMA (exact over unbounded history; per-task buffers
    bounded by the time chunk). Oracle = the full-history fold in DuckDB."""
    from temporalscope_spark.operators.rolling import ewma_segmented

    events = _t(spark, sf_dir, "events")
    out = ewma_segmented(
        events, "value", halflife_rows=_EWMA_HL, time_col="ts",
        id_col="user_id", chunk_seconds=86400,
    )
    return out.select("event_id", "user_id", F.round("value_ewma", 6).alias("value_ewma"))


def q_normalize_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe z-score + min-max normalization over strictly-past
    per-user history (RANGE frame on integer µs)."""
    from temporalscope_spark.operators.rolling import normalize_features

    events = _t(spark, sf_dir, "events")
    z = normalize_features(events, ["value"], time_col="ts", id_col="user_id")
    z = z.withColumnRenamed("value_norm", "value_z")
    m = normalize_features(z, ["value"], time_col="ts", id_col="user_id", method="minmax")
    return m.select(
        "event_id", "user_id",
        F.round("value_z", 6).alias("value_z"),
        F.round("value_norm", 6).alias("value_mm"),
    )


def q_purged_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged time-series CV: 5 equal-count folds over events, 30-min embargo
    after each test range; per-fold train/test row counts + test bounds."""
    from temporalscope_spark.operators.cv import purged_fold_summary

    events = _t(spark, sf_dir, "events")
    out = purged_fold_summary(events, "ts", n_folds=5, embargo_seconds=1800.0)
    return out.select(
        "fold", "train_rows", "test_rows",
        F.round("test_lo", 6).alias("test_lo"),
        F.round("test_hi", 6).alias("test_hi"),
    )


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid downsampling: per user, 6h buckets of value stats."""
    from temporalscope_spark.operators.resample import resample

    events = _t(spark, sf_dir, "events")
    out = resample(
        events, "ts", step_seconds=21600,
        value_aggs={"value": ("count", "avg", "min", "max", "first", "last")},
        id_col="user_id",
    )
    return out.select(
        "user_id", "bucket_start", "n_rows", "value_count",
        F.round("value_avg", 6).alias("value_avg"),
        "value_min", "value_max", "value_first", "value_last",
    )


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over a deterministically nulled value col."""
    from temporalscope_spark.operators.resample import interpolate_linear

    events = _t(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_id") % 7 == 3, F.lit(None)).otherwise(F.col("value"))
    )
    out = interpolate_linear(events, "ts", "v", id_col="user_id")
    return out.select("event_id", "user_id", F.round("v_interp", 6).alias("v_interp"))


def q_entity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc-level train/test assignment (md5-based, engine-
    portable); per (user, split) row counts."""
    from temporalscope_spark.operators.cv import entity_split

    events = _t(spark, sf_dir, "events")
    out = entity_split(events, "user_id", test_frac=0.3, seed=42)
    return out.groupBy("user_id", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )


def _synthetic_token_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + a deterministic cross-engine token array per row:
    sequence(e%100, e%100 + e%5) — lengths 1..5, exact integer content, so
    token-array EQUALITY is oracle-checkable without a tokens table."""
    events = _t(spark, sf_dir, "events")
    lo = F.col("event_id") % 100
    return events.select(
        "event_id", "user_id", "ts",
        F.sequence(lo, lo + F.col("event_id") % 5).alias("tokens"),
    )


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing per user (block = 32 tokens)."""
    from temporalscope_spark.operators.packing import pack_concat_chunks

    seqs = _synthetic_token_events(spark, sf_dir)
    out = pack_concat_chunks(
        seqs, block_tokens=32, id_col="user_id", order_col="ts"
    )
    return out.select(
        "user_id", "block_id",
        F.array_join("tokens", ",").alias("tokens"),
        F.col("n_filled").cast("long").alias("n_filled"),
    )


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT oracle: the greedy capacity-reset recurrence is replayed in
    # DuckDB with a recursive CTE walking each entity's sequences in order
    from temporalscope_spark.operators.packing import pack_greedy

    seqs = _synthetic_token_events(spark, sf_dir).withColumn(
        "tokens", F.transform("tokens", lambda x: x.cast("int"))
    )
    out = pack_greedy(seqs, bin_tokens=32, id_col="user_id", order_col="ts")
    return out.select(
        "user_id", "bin_id",
        F.array_join("tokens", ",").alias("tokens"),
        "n_seqs", "n_tok",
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training rows sharing any token
    3-gram with the eval slice (users with user_id % 7 == 0)."""
    from temporalscope_spark.operators.contamination import decontaminate

    seqs = _synthetic_token_events(spark, sf_dir)
    train = seqs.filter(F.col("user_id") % 7 != 0)
    ev = seqs.filter(F.col("user_id") % 7 == 0)
    clean = decontaminate(train, ev, n=3, id_col="event_id", key="string")
    return clean.select("event_id", "user_id")


def q_contamination_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded memorization risk: per eval doc, the fraction of its
    distinct token 3-grams found anywhere in training (the GPT-3
    appendix-C / PaLM analysis behind the binary decontamination gate).
    Same train/eval split and gram lane as `decontaminate`."""
    from temporalscope_spark.operators.contamination import contamination_rate

    seqs = _synthetic_token_events(spark, sf_dir)
    train = seqs.filter(F.col("user_id") % 7 != 0)
    ev = seqs.filter(F.col("user_id") % 7 == 0)
    return contamination_rate(train, ev, n=3, id_col="event_id", key="string")


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group rank-to-uniform calibration of event values within each
    event type (average ranks; two-phase cumsum — no per-group sort).
    After the exact integer counts the score is two IEEE divisions —
    bit-identical cross-engine."""
    from temporalscope_spark.operators.scaling import quantile_normalize

    events = _t(spark, sf_dir, "events")
    return quantile_normalize(events, "value", "event_type").select(
        "event_id", "event_type", "value", "value_qn"
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing primitive: keep 100% of purchases, 20% of clicks, drop
    the rest — deterministic md5 membership, partition-invariant."""
    from temporalscope_spark.operators.sampling import stratified_sample

    events = _t(spark, sf_dir, "events")
    out = stratified_sample(
        events, "event_type", {"purchase": 1.0, "click": 0.2},
        key_col="event_id", seed=3, portable=True,
    )
    return out.select("event_id", "user_id", "event_type")


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to token budgets: per-source totals -> capped fractions
    -> deterministic md5 membership (books budget exceeds its total, so the
    cap keeps that source whole)."""
    from temporalscope_spark.operators.sampling import sample_to_token_budget

    seqs = _synthetic_token_events(spark, sf_dir).select(
        "event_id", "user_id",
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("books")),
            (F.pmod(F.col("user_id"), F.lit(3)) + 1).cast("int"),
        ).alias("source"),
        F.size("tokens").cast("long").alias("n_tok"),
    )
    out = sample_to_token_budget(
        seqs, {"web": 3000.0, "code": 1000.0, "books": 1e12},
        strata_col="source", token_col="n_tok", key_col="event_id",
        seed=7, portable=True,
    )
    return out.select("event_id", "user_id", "source")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style passage splitting: 120-char chunks, 20-char overlap."""
    from temporalscope_spark.operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", chunk_chars=120, overlap=20)


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event type (deterministic tie-break)."""
    from temporalscope_spark.operators.sampling import top_k_per_group

    events = _t(spark, sf_dir, "events")
    out = top_k_per_group(events, ["event_type"], "value", k=3, tie_break="event_id")
    return out.select("event_type", "rank", "event_id", "value")


def q_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding (cumulative strictly-past) aggregates per user."""
    from temporalscope_spark.operators.rolling import expanding_features

    events = _t(spark, sf_dir, "events")
    out = expanding_features(
        events, ["value"], time_col="ts", id_col="user_id", aggs=("count", "avg")
    )
    return out.select(
        "event_id", "user_id", "value_count_expanding",
        F.round("value_avg_expanding", 6).alias("value_avg_expanding"),
    )


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal target encoding: event_type encoded as the mean
    of strictly-earlier values of the same type."""
    from temporalscope_spark.operators.rolling import target_encode_expanding

    events = _t(spark, sf_dir, "events")
    out = target_encode_expanding(events, "event_type", "value", time_col="ts")
    return out.select(
        "event_id", "event_type",
        F.round("event_type_te", 6).alias("event_type_te"),
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT oracle: the full IVF pipeline (md5-seeded coarse quantizer,
    # nearest-cell assignment, nprobe cell selection, exact re-rank) is
    # replayed step-by-step in DuckDB SQL. refine_iters=0 keeps the seeds
    # SQL-expressible; Lloyd refinement is covered by unit tests
    # (test_rolling_ivf.py: exact-at-full-probe, recall at partial probe)
    from temporalscope_spark.operators.similarity import ivf_centroids, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    cents = ivf_centroids(emb, num_centroids=8, seed=42, refine_iters=0, seed_hash="md5")
    return ivf_topk(emb, qvec, cents, k=10, nprobe=4).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED IVF index with incremental adds (operators/ann_index.py,
    the embedding twin of DedupIndex): train the coarse quantizer on the
    v0 slice (vec_id % 10 != 0), index it, add_batch the held-out slice
    under the FROZEN centroids (batch-sized, FAISS add-after-train
    contract), then probe. Oracle: the IVF replay with the quantizer
    trained on the v0 slice but assignment over the full corpus —
    structurally identical to create + add_batch. Same float-boundary
    fragility note as ivf_topk (cell argmax ties at the last ulp)."""
    import tempfile

    from temporalscope_spark.operators.ann_index import AnnIndex

    emb = _t(spark, sf_dir, "embeddings")
    v0 = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    idx = AnnIndex.create(
        tempfile.mkdtemp(prefix="annidx_"), v0,
        num_centroids=8, seed=42, refine_iters=0, seed_hash="md5",
    )
    idx.add_batch(batch)
    return idx.topk(spark, qvec, k=10, nprobe=4).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_linear_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS over leakage-safe lag features — the modeling layer's
    one-aggregation trainer (modeling/linear.py; reference analogue:
    temporal_model_trainer.py:18-115). EXACT oracle: DuckDB computes the
    identical sufficient statistics and solves the 3x3 normal equations via
    Cramer's rule — both engines derive the coefficients from the same sums,
    so round(6) equality is structural (well-conditioned Gram matrix)."""
    from temporalscope_spark.modeling import fit_linear
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    feats = lag_features(
        events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True
    )
    m = fit_linear(feats, ["value_lag_1", "value_lag_2"], "value")
    rows = [
        ("intercept", round(m.intercept, 6)),
        ("value_lag_1", round(m.coefs["value_lag_1"], 6)),
        ("value_lag_2", round(m.coefs["value_lag_2"], 6)),
    ]
    return spark.createDataFrame(rows, "feature string, coef double")


def q_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One IRLS round of the logistic trainer (modeling/logistic.py) at a
    fixed starting point: weighted sufficient statistics at beta0 feed the
    same Cramer 3x3 solve the linear oracle uses — both engines derive the
    round-1 coefficients AND the log-likelihood from the same sums, so
    round(6) equality is structural. The full fit is this step iterated
    (numpy-parity tested in tests/test_modeling.py); the binary target is
    the deterministic event_id parity."""
    from temporalscope_spark.modeling import irls_step
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    feats = lag_features(
        events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True
    ).withColumn("yb", (F.col("event_id") % 2).cast("double"))
    b0, b1, b2 = _IRLS_B0
    ic, beta, _, ll = irls_step(
        feats, ["value_lag_1", "value_lag_2"], "yb",
        {"value_lag_1": b1, "value_lag_2": b2}, b0,
    )
    rows = [
        ("intercept", round(ic, 6)),
        ("log_likelihood", round(ll, 6)),
        ("value_lag_1", round(beta["value_lag_1"], 6)),
        ("value_lag_2", round(beta["value_lag_2"], 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality gate (VERDICT r4 stretch #9): one IRLS round from
    beta=0 learns a logistic gate over (quality_score, dup_word_ratio)
    against the heuristic gate's own label, then every doc is scored
    sigma(x-dot-beta) and gated at rounded prob >= 0.5 — the classifier
    lane replacing the heuristic-only gate in the curation funnel.

    At beta=0 the round is exact in any engine (mu=0.5, w=0.25, z=4y-2 —
    no transcendental disagreement feeding the sums); the oracle replays
    the weighted sums + the same Cramer 3x3 solve irls_step is pinned by,
    then the scoring projection. Rounding prob to 6 BEFORE the gate
    comparison makes the boolean structurally engine-identical."""
    from temporalscope_spark.modeling.logistic import irls_step
    from temporalscope_spark.operators.text import (
        with_quality_score,
        with_repetition_features,
    )

    docs = _t(spark, sf_dir, "documents")
    qs = with_quality_score(docs, "text").select("doc_id", "quality_score")
    rep = with_repetition_features(docs, "text").select(
        "doc_id", F.round("dup_word_ratio", 6).alias("dup_word_ratio")
    )
    from pyspark import StorageLevel

    # the feature table feeds the sufficient-stats aggregate AND the final
    # scoring projection — persist the branch point (release via caching.hold)
    feats = (
        qs.join(rep, "doc_id")
        .select(
            "doc_id",
            F.col("quality_score").alias("x1"),
            F.col("dup_word_ratio").alias("x2"),
            (
                (F.col("quality_score") >= 0.6) & (F.col("dup_word_ratio") <= 0.5)
            )
            .cast("double")
            .alias("yb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ic, beta, _, _ = irls_step(
        feats, ["x1", "x2"], "yb", {"x1": 0.0, "x2": 0.0}, 0.0
    )
    logit = (
        F.lit(ic) + F.lit(beta["x1"]) * F.col("x1") + F.lit(beta["x2"]) * F.col("x2")
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    from temporalscope_spark.core.caching import hold

    return hold(
        feats.select(
            "doc_id", prob.alias("prob"), (prob >= 0.5).alias("gate")
        ),
        feats,
    )


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lang-id loop (modeling/naive_bayes.py —
    McCallum & Nigam 1998, the fastText-niche bag-of-words classifier of
    CCNet-class curation): self-train on (text, lang) with a top-300
    corpus vocabulary and add-1 smoothing, score every doc, argmax by
    (rounded-6 joint log-prob, label). Training is ONE corpus aggregation;
    everything joined back is the bounded C·V conditional table. The
    per-(doc, label) sum is the sorted-word left fold every LM scorer
    uses, so the oracle replays it with list_reduce."""
    from temporalscope_spark.modeling.naive_bayes import nb_classify

    docs = _t(spark, sf_dir, "documents")
    return nb_classify(docs, vocab_size=300, alpha=1.0)


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian split-conformal intervals (metrics/conformal.py — Vovk et
    al. 2005, Lei et al. 2018) around a per-user naive forecast: yhat =
    lag(value), even event_ids calibrate, odd ones are scored; per-
    event_type k-th-order-statistic residual quantile at alpha=0.2. The
    k-th order statistic is tie-invariant and ceil((n+1)·0.8) is the same
    IEEE double op in both engines, so the oracle replays exactly."""
    from temporalscope_spark.metrics.conformal import conformal_interval
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    base = events.select(
        "event_id",
        "event_type",
        "value",
        F.lag("value").over(w).alias("yhat"),
        (F.col("event_id") % 2 == 0).alias("is_calib"),
    ).filter(F.col("yhat").isNotNull())
    return conformal_interval(
        base, "value", "yhat", "is_calib",
        alpha=0.2, id_col="event_id", group_col="event_type",
    )


def q_merge_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write table maintenance on the snapshot lifecycle
    (datasets/snapshots.py:merge/forget_keys — Iceberg CoW MERGE + the
    right-to-be-forgotten purge): v0 = docs with doc_id % 3 != 0, MERGE an
    updated batch (doc_id % 2 == 0, n_chars bumped +1000), then FORGET the
    opt-out list doc_id % 7 == 0. Only files containing touched keys are
    rewritten (batch-sized key sets broadcast; the table never shuffles);
    the oracle replays the same anti/union/anti set algebra over the raw
    documents table — equivalence of the file-level lifecycle with the
    logical semantics IS the check."""
    import tempfile

    from temporalscope_spark.datasets.snapshots import SnapshotTable

    docs = _t(spark, sf_dir, "documents")
    tbl = SnapshotTable(tempfile.mkdtemp(prefix="mergetbl_"))
    tbl.write(docs.filter(F.col("doc_id") % 3 != 0).repartition(4))
    src = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    tbl.merge(spark, src, ["doc_id"])
    optout = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    v = tbl.forget_keys(spark, optout, ["doc_id"])
    return tbl.read(spark, v).select("doc_id", "text", "lang", "source", "n_chars")


def q_suffix_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed generalized suffix array (operators/suffix.py — Manber &
    Myers prefix doubling, the Flick & Aluru 2015 distributed recipe) over
    a fifth of the corpus, truncated at 64 chars: per character position,
    the DENSE lexicographic rank of its suffix. Every doubling round is an
    equi-join + two-phase global rank — no sort, no single-partition
    window; the oracle is one dense_rank window over the literal truncated
    suffix strings."""
    from temporalscope_spark.operators.suffix import suffix_ranks

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    out = suffix_ranks(docs, "text", "doc_id", cap=64)
    return out.select("doc_id", "pos", F.col("srank").cast("long").alias("srank"))


def q_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring mining (the Lee et al. 2022 ExactSubstr
    lane — char-granular, no fixed n-gram grid): top-20 longest substrings
    occurring 2+ times in a fifth of the corpus, with occurrence counts.
    Witnesses are rank-adjacent suffix pairs; their LCP comes from the
    stored doubling-round rank tables (Farach descent — zero character
    comparisons), occurrence counts from one bounded probe per winning
    length. The oracle replays adjacency and LCP over literal suffix
    strings."""
    from temporalscope_spark.operators.suffix import repeated_substrings

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return repeated_substrings(docs, "text", "doc_id", min_len=15, top_k=20, cap=64)


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption example builder (Raffel et al. 2020 §3.1.4,
    operators/corruption.py): ~15% of each document's words deleted in
    mean-3 spans chosen by a deterministic md5 hash of (doc, seed, span),
    inputs carrying sentinels, targets carrying the deleted spans. Pure
    per-row expressions — zero shuffle; the oracle replays the identical
    per-position segment/offset arithmetic."""
    from temporalscope_spark.operators.corruption import span_corruption

    docs = _sp(_t(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ).alias("tokens"),
    )
    out = span_corruption(words, rate=0.15, mean_span=3, seed=42)
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.array_join("input_tokens", " ").alias("input_tokens"),
        F.array_join("target_tokens", " ").alias("target_tokens"),
    )


def q_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle splits (Bavarian et al. 2022,
    operators/corruption.py): half the corpus (deterministic md5 gate)
    split at two hash cut points into prefix/middle/suffix and reassembled
    PSM — <PRE> prefix <SUF> suffix <MID> middle; the rest pass through
    autoregressive. Zero shuffle; the oracle replays the cut arithmetic."""
    from temporalscope_spark.operators.corruption import fim_split

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ).alias("tokens"),
    )
    out = fim_split(words, fraction=0.5, seed=42, min_len=3)
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "is_fim",
        F.array_join("fim_tokens", " ").alias("fim_tokens"),
        F.array_join("middle", " ").alias("middle"),
    )


def q_chat_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template assembly (operators/packing.py:chat_pack): events
    become turns (conv = user, role cycles system/user/assistant), each
    conversation packs to header+tokens with a parallel 0/1 loss mask that
    is 1 only on assistant TOKEN positions. One conversation-keyed shuffle;
    assembly is per-row transform/flatten expressions."""
    from temporalscope_spark.operators.packing import chat_pack

    seqs = _synthetic_token_events(spark, sf_dir)
    turns = seqs.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").alias("turn_id"),
        F.when(F.col("event_id") % 3 == 0, F.lit("system"))
        .when(F.col("event_id") % 3 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "tokens",
    )
    out = chat_pack(turns)
    return out.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.array_join("tokens", " ").alias("tokens"),
        F.array_join(
            F.transform("loss_mask", lambda x: x.cast("string")), ""
        ).alias("loss_mask"),
    )


def q_masv_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASV with an EXACT SHAP explainer: per-phase mean |coef_f·(x_f −
    mean_f)| of the globally-fitted linear model over each phase's train
    split (Linear SHAP is exact for linear models — masv.py upgraded from
    the magnitude proxy; reference spec: metrics/masv.py:26-98). The
    oracle replays the whole pipeline: lag features → OLS via Cramer →
    partitioner phase/split labeling (same rule as partitioner_splits) →
    per-(bucket, feature) mean absolute SHAP."""
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.metrics.masv import calculate_masv
    from temporalscope_spark.modeling import fit_linear, linear_shap_importance
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    feats = lag_features(
        events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True
    )
    model = fit_linear(feats, ["value_lag_1", "value_lag_2"], "value")
    tf = TemporalFrame(
        feats, time_col="ts", target_col="value", id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"), sort=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    masv = calculate_masv(
        part, ["value_lag_1", "value_lag_2"],
        importance_fn=linear_shap_importance(model),
    )
    rows = [
        (b, f, round(masv[f][b], 6))
        for f in sorted(masv)
        for b in range(len(masv[f]))
    ]
    return spark.createDataFrame(rows, "bucket long, feature string, masv double")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-100 words by frequency, deterministic
    (n desc, word) order. Map-side partial aggregation compresses the hot
    keys; global top-k is TakeOrderedAndProject, never a full sort."""
    from temporalscope_spark.operators.corpus_stats import heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", k=100)


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source EXACT token-count quantiles (Spark `percentile` ==
    DuckDB `quantile_cont`, both type-7 interpolation). The approx=True
    sketch is the 100 TB path (bounds-tested in pytest, no exact oracle
    by nature)."""
    from temporalscope_spark.operators.corpus_stats import token_quantiles

    docs = _t(spark, sf_dir, "documents")
    return token_quantiles(docs, "text", group_col="source")


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document char lengths (width 100)."""
    from temporalscope_spark.operators.corpus_stats import length_histogram

    docs = _t(spark, sf_dir, "documents")
    return length_histogram(docs, "n_chars", bin_width=100)


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter key diagnosis: top-20 heaviest user_id keys — the
    pre-flight check for groupBy/window partitioning at scale."""
    from temporalscope_spark.operators.corpus_stats import skew_profile

    events = _t(spark, sf_dir, "events")
    return skew_profile(events, "user_id", k=20)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-20 docs for the corpus's own top-3 heavy-hitter
    words (self-contained, data-independent query). Ordering is on the
    ROUNDED score + doc-id tie-break, so the top-k boundary is replayable
    bit-for-bit in the SQL oracle."""
    from temporalscope_spark.operators.corpus_stats import heavy_hitters
    from temporalscope_spark.operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    terms = [r["word"] for r in heavy_hitters(docs, "text", k=3).collect()]
    return bm25_topk(docs, terms, k=20)


def q_bm25_multi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 over the persisted postings index: three 2-term
    queries drawn from the corpus's own top-6 heavy-hitter words (ranks
    1-2 / 3-4 / 5-6 — self-contained, data-independent), scored in ONE
    pass over the postings table. Scores/ordering identical to per-query
    bm25_topk (rounded-score + doc-id tie-break, engine-replayable)."""
    from temporalscope_spark.operators.corpus_stats import heavy_hitters
    from temporalscope_spark.operators.retrieval import bm25_topk_multi, build_postings

    docs = _t(spark, sf_dir, "documents")
    hh = heavy_hitters(docs, "text", k=6).collect()
    words = [r["word"] for r in sorted(hh, key=lambda r: (-r["n"], r["word"]))]
    queries = spark.createDataFrame(
        [(i // 2, w) for i, w in enumerate(words)], "query_id int, word string"
    )
    postings, stats, termdf = build_postings(docs)
    return bm25_topk_multi(postings, stats, termdf, queries, k=10).select(
        "query_id", "doc_id", "score"
    )


def q_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted postings lifecycle: build the index over 90% of documents
    (doc_id % 10 != 0), append the remaining 10% as an incremental batch
    (batch-sized work — the corpus-resident postings never move), then
    run the SAME three heavy-hitter queries as bm25_multi_topk over the
    folded read view. Sharing bm25_multi_topk's oracle IS the equivalence
    check: v0+increment must score bit-identically to a one-shot build."""
    import tempfile

    from temporalscope_spark.operators.corpus_stats import heavy_hitters
    from temporalscope_spark.operators.retrieval import (
        PostingsIndex,
        bm25_topk_multi,
    )

    docs = _t(spark, sf_dir, "documents")
    hh = heavy_hitters(docs, "text", k=6).collect()
    words = [r["word"] for r in sorted(hh, key=lambda r: (-r["n"], r["word"]))]
    queries = spark.createDataFrame(
        [(i // 2, w) for i, w in enumerate(words)], "query_id int, word string"
    )
    idx = PostingsIndex.create(
        tempfile.mkdtemp(prefix="bm25idx_"), docs.filter(F.col("doc_id") % 10 != 0)
    )
    idx.append_batch(docs.filter(F.col("doc_id") % 10 == 0), batch_id=1)
    postings, stats, termdf = idx.read(spark)
    return bm25_topk_multi(postings, stats, termdf, queries, k=10).select(
        "query_id", "doc_id", "score"
    )


def q_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scrubbing: whole-word case-insensitive redaction of the
    corpus's own top-3 heavy-hitter words (self-contained, non-vacuous —
    every doc containing a hot word is rewritten). Token-level transform,
    no regex dialect in play; blocklist inlined as a plan literal."""
    from temporalscope_spark.operators.corpus_stats import heavy_hitters
    from temporalscope_spark.operators.text import redact_terms

    docs = _t(spark, sf_dir, "documents")
    terms = [r["word"] for r in heavy_hitters(docs, "text", k=3).collect()]
    return redact_terms(docs, terms, "text", "doc_id")


def _plant_pii(docs: DataFrame) -> DataFrame:
    """Deterministically append synthetic PII (email on doc_id%5, IPv4 on
    %7, phone on %3) — the synthetic corpus has none, so the scan would
    be vacuous otherwise; the SAME rewrite runs in the DuckDB oracle."""
    did = F.col("doc_id")
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" reach user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" dial 415-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-family PII hit counts (email/IPv4/phone) per doc over the
    deterministically-planted corpus — dialect-portable patterns (Java
    regex ∩ RE2), one narrow codegen'd projection, no shuffle."""
    from temporalscope_spark.operators.pii import pii_scan

    return pii_scan(_plant_pii(_t(spark, sf_dir, "documents")), "text", "doc_id")


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential family-token redaction ([EMAIL]/[IPV4]/[PHONE]) with
    counts taken on the progressively-redacted text — the output text and
    count are a pure function of the input string, engine-invariant."""
    from temporalscope_spark.operators.pii import redact_pii

    return redact_pii(_plant_pii(_t(spark, sf_dir, "documents")), "text", "doc_id")


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BPE-per-word fertility — ratio of two long sums, exact
    in any engine."""
    from temporalscope_spark.operators.corpus_stats import tokenizer_fertility

    docs = _t(spark, sf_dir, "documents")
    return tokenizer_fertility(docs, "text", group_col="source")


def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality signal: per-doc cross-entropy under a
    top-1000-word unigram LM estimated from the corpus itself. OOV words
    floor at count 1 (non-vacuous: the truncated vocab leaves real OOV
    mass at sf0.01). Float-exact across engines because the per-doc sum is
    a sorted-word left fold, replayed by DuckDB's list_reduce."""
    from temporalscope_spark.operators.lm import score_unigram, unigram_counts

    docs = _t(spark, sf_dir, "documents")
    # the LM table feeds both the broadcast scoring join and the total-mass
    # aggregate — cache() so the corpus scan+agg behind it runs once
    lm = unigram_counts(docs, "text", vocab_size=1000).cache()
    return score_unigram(docs, lm, "text", "doc_id")


def q_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 8 learned BPE merges and measure corpus compression —
    the train→apply→measure loop of a tokenizer-design pass. Oracle
    aggregates the unrolled-round CTE chain's final vocab (v8)."""
    from temporalscope_spark.operators.bpe import bpe_compression_stats

    docs = _t(spark, sf_dir, "documents")
    return bpe_compression_stats(docs, "text", num_merges=8)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): IVF-cell-bounded near-identical pair
    search + one survivor per duplicate group (lowest centroid cosine —
    the diversity-keeping rule). md5-seeded quantizer, refine_iters=0, so
    the oracle replays the full pipeline; components replay as a
    recursive-CTE min-label closure (the pack_greedy precedent). Same
    float-boundary fragility class as ivf_topk. t=0.4 drops 10 of 500
    vecs at sf0.01 — non-vacuous."""
    from temporalscope_spark.operators.similarity import ivf_centroids, semdedup

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(
        emb, num_centroids=8, seed=42, refine_iters=0, seed_hash="md5"
    )
    return semdedup(emb, threshold=0.4, centroids=cents)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (Sennrich et al. 2016): the first 8
    merges from the corpus's character-level word vocabulary. Pure
    int/string logic (weighted pair counts, total-order argmax, greedy
    left-to-right rewrite via the islands+parity closed form) — the
    oracle replays every round as unrolled CTE blocks."""
    from temporalscope_spark.operators.bpe import learn_bpe_merges

    docs = _t(spark, sf_dir, "documents")
    return learn_bpe_merges(docs, "text", num_merges=8)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply loop closed: tokenize the documents table with the 8
    learned merges (apply_bpe). The merge rounds run over the bounded
    DISTINCT-WORD table only; the corpus sees one positional explode +
    one mapping join + one ordered reassembly. Token arrays are
    serialized with a space join for the value hash (the
    multi_lead_tokens convention)."""
    from temporalscope_spark.operators.bpe import (
        apply_bpe,
        learn_bpe_merges,
        word_vocab,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = word_vocab(docs, "text").localCheckpoint()
    merges = learn_bpe_merges(docs, "text", num_merges=8, vocab=vocab)
    out = apply_bpe(docs, merges, "text", "doc_id", vocab=vocab)
    return out.select(
        "doc_id", F.array_join("tokens", " ").alias("tokens_str"), "n_tok"
    )


def q_unigram_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM seed inventory (Kudo 2018): frequent-substring
    candidates (top-24 by count×length plus all single characters) with
    integer-exact normalized probabilities, computed over the bounded
    distinct-word table only."""
    from temporalscope_spark.operators.bpe import word_vocab
    from temporalscope_spark.operators.unigram import piece_seed

    docs = _t(spark, sf_dir, "documents")
    vocab = word_vocab(docs, "text").select("word", "wc")
    return piece_seed(vocab).select(
        "piece", "cnt", (F.round("prob", 6) + F.lit(0.0)).alias("prob")
    )


def q_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two EM rounds of unigram-LM training: per-word forward/backward
    over the vocabulary-bounded segmentation lattice as in-row folds,
    expected piece counts via one explode + aggregation, M-step
    normalization by a broadcast-crossed 1-row total. The oracle unrolls
    the SAME two rounds as recursive-CTE blocks carrying the α/β arrays
    (probabilities quantized to 1e-12 per round in both engines)."""
    from temporalscope_spark.operators.unigram import train_unigram

    docs = _t(spark, sf_dir, "documents")
    pieces = train_unigram(docs, "text", num_rounds=2)
    return pieces.select(
        "piece",
        (F.round("e_cnt", 6) + F.lit(0.0)).alias("e_cnt"),
        (F.round("prob", 6) + F.lit(0.0)).alias("prob"),
    )


def q_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply loop for the unigram tokenizer: Viterbi decode of the
    2-round-EM model over the bounded distinct-word lattice (struct-min
    tie-break on (−score, start, piece)), then the apply_bpe corpus
    contract — one positional explode, one word→tokens mapping join, one
    ordered reassembly. Discrete cross-engine equality holds because the
    model is quantized per round (see operators/unigram.py)."""
    from temporalscope_spark.operators.unigram import (
        apply_unigram,
        train_unigram,
    )

    docs = _t(spark, sf_dir, "documents")
    pieces = train_unigram(docs, "text", num_rounds=2)
    out = apply_unigram(docs, pieces, "text", "doc_id")
    return out.select(
        "doc_id", F.array_join("tokens", " ").alias("tokens_str"), "n_tok"
    )


def q_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece merge learning (Schuster & Nakajima 2012): 8 rounds of
    likelihood-scored merges (freq/(sf_lhs*sf_rhs) argmax, total order
    score DESC, lhs, rhs) over the bounded ##-marked word vocab. The
    oracle unrolls the SAME rounds as CTE blocks — integer counts and
    one IEEE division each, exact in both engines."""
    from temporalscope_spark.operators.wordpiece import learn_wordpiece

    docs = _t(spark, sf_dir, "documents")
    return learn_wordpiece(docs, "text", num_merges=8)


def q_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply loop for WordPiece: 8 learned merges build the final
    piece vocabulary (alphabet + merge outputs), then BERT greedy
    longest-match-first tokenization (##-marked continuations, [UNK] on
    unmatchable or over-length words) runs as 12 fixed in-row rounds
    over the bounded distinct-word table; the corpus sees one positional
    explode + one word→tokens join (the apply_bpe contract)."""
    from temporalscope_spark.operators.wordpiece import (
        apply_wordpiece,
        learn_wordpiece,
        wordpiece_pieces,
        wp_word_vocab,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = wp_word_vocab(docs, "text").localCheckpoint()
    merges = learn_wordpiece(docs, "text", num_merges=8, vocab=vocab)
    pieces = wordpiece_pieces(docs, "text", merges=merges, vocab=vocab)
    out = apply_wordpiece(docs, pieces, "text", "doc_id", max_chars=12)
    return out.select(
        "doc_id", F.array_join("tokens", " ").alias("tokens_str"), "n_tok"
    )


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning battery (Raffel et al. 2020 §2.2): the documents table
    is given a line structure by breaking the normalized text into 5-word
    lines with md5-parity-synthesized terminal punctuation (parity 0 → no
    terminal mark, 3 → '?', else '.') — a deterministic rewrite both
    engines express identically, so the terminal-punctuation rule is
    non-vacuous. Then every C4 rule runs as a named flag: line retention
    (terminal punctuation, ≥3 words, no 'slow' line-term), page drops
    ('dup' page-term ≈ the bad-word list, lorem ipsum, braces, <5
    sentences)."""
    from temporalscope_spark.operators.c4 import c4_clean

    docs = _t(spark, sf_dir, "documents")
    fw = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ),
        lambda w: w != "",
    )
    docs = docs.select("doc_id", fw.alias("_fw"))
    nl = F.ceil(F.size("_fw") / F.lit(5.0)).cast("int")
    chunk = lambda k: F.concat_ws(" ", F.slice("_fw", k * 5 + 1, 5))  # noqa: E731
    parity = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast(  # noqa: E731
        "long"
    ) % 4
    lined = docs.select(
        "doc_id",
        F.when(F.size("_fw") == 0, F.lit("")).otherwise(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), nl - 1),
                    lambda k: F.concat(
                        chunk(k),
                        F.when(parity(chunk(k)) == 0, F.lit(""))
                        .when(parity(chunk(k)) == 3, F.lit("?"))
                        .otherwise(F.lit(".")),
                    ),
                ),
                "\n",
            )
        ).alias("text"),
    )
    return c4_clean(
        lined,
        "text",
        "doc_id",
        sep="\n",
        min_line_words=3,
        min_sentences=5,
        line_drop_terms=("slow",),
        page_drop_terms=("dup",),
    )


_C4_LINE_WORDS = (
    "list_filter(string_split(trim(regexp_replace(lower({l}), '\\s+', ' ', "
    "'g')), ' '), w -> w <> '')"
)


def _c4_oracle() -> str:
    lw = _C4_LINE_WORDS.format(l="l")
    return f"""
        WITH d0 AS (
            SELECT doc_id,
                   list_filter(string_split({_NORM}, ' '), w -> w <> '')
                       AS fw
            FROM documents
        ),
        lined AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(0,
                           CAST(ceil(len(fw) / 5.0) AS INT) - 1),
                       k -> array_to_string(fw[k * 5 + 1 : k * 5 + 5], ' ')
                   ) AS chunks
            FROM d0
        ),
        lines AS (
            SELECT doc_id,
                   list_transform(chunks, c -> c ||
                       CASE CAST('0x' || substr(md5(c), 1, 8) AS BIGINT) % 4
                            WHEN 0 THEN '' WHEN 3 THEN '?' ELSE '.' END
                   ) AS ls
            FROM lined
        ),
        t2 AS (
            SELECT doc_id, ls,
                   array_to_string(ls, chr(10)) AS text2
            FROM lines
        ),
        battery AS (
            SELECT doc_id, text2,
                   CAST(len(string_split(text2, chr(10))) AS INT)
                       AS n_lines,
                   list_filter(ls, l ->
                       right(trim(l), 1) IN ('.', '!', '?', '"')
                       AND len({lw}) >= 3
                       AND NOT list_has_any(
                           list_transform({lw},
                               w -> regexp_replace(w, '[.!?"]+$', '')),
                           ['slow'])
                   ) AS kept,
                   list_has_any(
                       list_transform(
                           {_C4_LINE_WORDS.format(l="replace(text2, chr(10), ' ')")},
                           w -> regexp_replace(w, '[.!?"]+$', '')),
                       ['dup']) AS flag_bad_term,
                   contains(lower(text2), 'lorem ipsum')
                       AS flag_lorem_ipsum,
                   (contains(text2, '{{') OR contains(text2, '}}'))
                       AS flag_brace
            FROM t2
        ),
        scored AS (
            SELECT doc_id, n_lines,
                   CAST(len(kept) AS INT) AS n_kept_lines,
                   CAST(coalesce(list_sum(list_transform(kept,
                       l -> len(string_split_regex(l, '[.!?]')) - 1)), 0)
                       AS INT) AS n_sentences,
                   coalesce(array_to_string(kept, chr(10)), '')
                       AS clean_text,
                   flag_bad_term, flag_lorem_ipsum, flag_brace
            FROM battery
        )
        SELECT doc_id, n_lines, n_kept_lines, n_sentences, clean_text,
               flag_bad_term, flag_lorem_ipsum, flag_brace,
               (n_sentences < 5) AS flag_too_few_sentences,
               (NOT flag_bad_term AND NOT flag_lorem_ipsum
                AND NOT flag_brace AND NOT (n_sentences < 5)) AS c4_keep
        FROM scored"""


def _unigram_prefix(max_len: int = 4, top_k: int = 24) -> str:
    """Shared oracle prefix: word vocab → substring counts → seed
    inventory p0 → lattice edge table (0-based half-open spans)."""
    return f"""
            v0 AS MATERIALIZED (
                SELECT word, CAST(count(*) AS BIGINT) AS wc,
                       CAST(length(word) AS INT) AS len
                FROM (SELECT unnest(string_split({_NORM}, ' ')) AS word
                      FROM documents)
                WHERE word <> '' GROUP BY word
            ),
            lens AS (
                SELECT CAST(unnest(generate_series(1, {max_len})) AS INT) AS l
            ),
            cnts AS (
                SELECT substr(word, CAST(i AS INT), l) AS piece,
                       sum(wc) AS cnt
                FROM v0 JOIN lens ON lens.l <= v0.len,
                     UNNEST(generate_series(1, v0.len - lens.l + 1)) AS t(i)
                GROUP BY 1
            ),
            scored AS (
                SELECT piece, cnt, cnt * length(piece) AS score FROM cnts
            ),
            topk AS (
                SELECT piece, cnt FROM scored
                ORDER BY score DESC, piece LIMIT {top_k}
            ),
            sel AS (
                SELECT DISTINCT piece, cnt FROM (
                    SELECT piece, cnt FROM topk
                    UNION ALL
                    SELECT piece, cnt FROM scored WHERE length(piece) = 1
                )
            ),
            p0 AS MATERIALIZED (
                SELECT piece, CAST(cnt AS BIGINT) AS cnt,
                       round(CAST(cnt AS DOUBLE)
                             / (SELECT sum(cnt) FROM sel), 12) AS prob
                FROM sel
            ),
            uedges AS MATERIALIZED (
                SELECT v0.word, v0.wc, v0.len,
                       CAST(i - 1 AS INT) AS i,
                       CAST(i - 1 + lens.l AS INT) AS j,
                       substr(word, CAST(i AS INT), lens.l) AS piece
                FROM v0 JOIN lens ON lens.l <= v0.len,
                     UNNEST(generate_series(1, v0.len - lens.l + 1)) AS t(i)
                WHERE substr(word, CAST(i AS INT), lens.l)
                      IN (SELECT piece FROM p0)
            )"""


def _unigram_em_round_ctes(r: int) -> str:
    """One unrolled EM round: probability-annotated lattice lists →
    forward (a{r}) and backward (b{r}) recursions carrying the α/β
    arrays → per-edge expected counts → renormalized p{r}."""
    return f"""
            lat{r} AS MATERIALIZED (
                SELECT e.word, any_value(e.wc) AS wc,
                       any_value(e.len) AS len,
                       list(struct_pack(j := e.j, i := e.i, p := p.prob,
                                        piece := e.piece)
                            ORDER BY e.j, e.i) AS edges
                FROM uedges e JOIN p{r - 1} p USING (piece) GROUP BY e.word
            ),
            a{r}(word, j, alphas) AS (
                SELECT word, 0, [CAST(1.0 AS DOUBLE)] FROM lat{r}
                UNION ALL
                SELECT a.word, a.j + 1,
                       list_append(a.alphas, coalesce(list_sum(
                           list_transform(
                               list_filter(l.edges, e -> e.j = a.j + 1),
                               e -> a.alphas[e.i + 1] * e.p)), 0.0))
                FROM a{r} a JOIN lat{r} l USING (word) WHERE a.j < l.len
            ),
            af{r} AS MATERIALIZED (
                SELECT a.word, a.alphas
                FROM a{r} a JOIN lat{r} l USING (word) WHERE a.j = l.len
            ),
            b{r}(word, j, betas) AS (
                SELECT word, len, [CAST(1.0 AS DOUBLE)] FROM lat{r}
                UNION ALL
                SELECT b.word, b.j - 1,
                       list_prepend(coalesce(list_sum(list_transform(
                           list_filter(l.edges, e -> e.i = b.j - 1),
                           e -> e.p * b.betas[e.j - b.j + 1])), 0.0),
                           b.betas)
                FROM b{r} b JOIN lat{r} l USING (word) WHERE b.j > 0
            ),
            bf{r} AS MATERIALIZED (
                SELECT word, betas FROM b{r} WHERE j = 0
            ),
            e{r} AS MATERIALIZED (
                SELECT u.piece,
                       sum(l.wc * af.alphas[u.i + 1] * u.p
                           * bf.betas[u.j + 1]
                           / af.alphas[l.len + 1]) AS e_cnt
                FROM (SELECT word, unnest(edges, recursive := true)
                      FROM lat{r}) u
                JOIN lat{r} l USING (word)
                JOIN af{r} af USING (word)
                JOIN bf{r} bf USING (word)
                GROUP BY 1
            ),
            p{r} AS MATERIALIZED (
                SELECT piece, e_cnt,
                       round(e_cnt / (SELECT sum(e_cnt) FROM e{r}), 12)
                           AS prob
                FROM e{r}
            )"""


def _unigram_seed_oracle() -> str:
    return (
        "WITH RECURSIVE "
        + _unigram_prefix()
        + """
            SELECT piece, cnt, round(prob, 6) + 0.0 AS prob FROM p0"""
    )


def _unigram_em_oracle(rounds: int = 2) -> str:
    body = ",".join(_unigram_em_round_ctes(r) for r in range(1, rounds + 1))
    return (
        "WITH RECURSIVE "
        + _unigram_prefix()
        + ","
        + body
        + f"""
            SELECT piece, round(e_cnt, 6) + 0.0 AS e_cnt,
                   round(prob, 6) + 0.0 AS prob
            FROM p{rounds}"""
    )


def _unigram_tokenize_oracle(rounds: int = 2) -> str:
    body = ",".join(_unigram_em_round_ctes(r) for r in range(1, rounds + 1))
    return (
        "WITH RECURSIVE "
        + _unigram_prefix()
        + ","
        + body
        + f""",
            latv AS MATERIALIZED (
                SELECT e.word, any_value(e.len) AS len,
                       list(struct_pack(j := e.j, i := e.i, p := p.prob,
                                        piece := e.piece)
                            ORDER BY e.j, e.i) AS edges
                FROM uedges e JOIN p{rounds} p USING (piece)
                GROUP BY e.word
            ),
            vit(word, j, best) AS (
                SELECT word, 0,
                       [struct_pack(ns := CAST(-1.0 AS DOUBLE),
                                    bi := CAST(-1 AS INT), piece := '')]
                FROM latv
                UNION ALL
                SELECT v.word, v.j + 1,
                       list_append(v.best, list_sort(list_transform(
                           list_filter(l.edges, e -> e.j = v.j + 1),
                           e -> struct_pack(
                               ns := v.best[e.i + 1].ns * e.p,
                               bi := e.i, piece := e.piece)))[1])
                FROM vit v JOIN latv l USING (word) WHERE v.j < l.len
            ),
            vf AS MATERIALIZED (
                SELECT v.word, v.best
                FROM vit v JOIN latv l USING (word) WHERE v.j = l.len
            ),
            urec(word, pos, toks) AS (
                SELECT word, len, CAST([] AS VARCHAR[]) FROM latv
                UNION ALL
                SELECT r.word, v.best[r.pos + 1].bi,
                       list_prepend(v.best[r.pos + 1].piece, r.toks)
                FROM urec r JOIN vf v USING (word) WHERE r.pos > 0
            ),
            uwt AS MATERIALIZED (
                SELECT word, toks FROM urec WHERE pos = 0
            ),
            udw AS (
                SELECT doc_id,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            upos AS (
                SELECT doc_id, CAST(i AS INT) AS i,
                       w[CAST(i AS INT)] AS word
                FROM udw, UNNEST(generate_series(1, len(w))) AS t(i)
                WHERE w[CAST(i AS INT)] <> ''
            ),
            uper AS (
                SELECT p.doc_id,
                       flatten(list(uwt.toks ORDER BY p.i)) AS toks
                FROM upos p JOIN uwt USING (word) GROUP BY 1
            )
            SELECT d.doc_id,
                   array_to_string(coalesce(uper.toks,
                                            CAST([] AS VARCHAR[])), ' ')
                       AS tokens_str,
                   CAST(coalesce(len(uper.toks), 0) AS INT) AS n_tok
            FROM documents d LEFT JOIN uper USING (doc_id)"""
    )


def _bpe_round_ctes(r: int) -> str:
    """One unrolled BPE round for the DuckDB oracle: pair counts over
    v{r-1} → 1-row argmax b{r} → islands+parity merge rewrite → v{r}."""
    p = f"""p{r} AS (
                SELECT syms[CAST(i AS INT)] AS lhs,
                       syms[CAST(i AS INT) + 1] AS rhs,
                       sum(wc) AS freq
                FROM v{r - 1}, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
                WHERE len(syms) >= 2 GROUP BY 1, 2
            ),
            b{r} AS MATERIALIZED (
                SELECT lhs, rhs, freq FROM p{r}
                ORDER BY freq DESC, lhs, rhs LIMIT 1
            ),
            s{r} AS (
                SELECT v.word, v.wc, CAST(i AS INT) AS i,
                       v.syms[CAST(i AS INT)] AS s,
                       v.syms[CAST(i AS INT) + 1] AS nxt
                FROM v{r - 1} v, UNNEST(generate_series(1, len(v.syms))) AS t(i)
            ),
            m{r} AS (
                SELECT s.*, (s.s = b.lhs AND s.nxt = b.rhs) AS m
                FROM s{r} s, b{r} b
            ),
            g{r} AS (
                SELECT *, CASE WHEN m THEN
                    i - row_number() OVER (PARTITION BY word, m ORDER BY i)
                END AS grp FROM m{r}
            ),
            mm{r} AS (
                SELECT *, m AND
                    ((i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0)
                    AS merged
                FROM g{r}
            ),
            d{r} AS (
                SELECT *,
                    coalesce(lag(merged) OVER (PARTITION BY word ORDER BY i),
                             false) AS drp,
                    CASE WHEN merged THEN s || nxt ELSE s END AS ns
                FROM mm{r}
            ),
            v{r} AS MATERIALIZED (
                SELECT word, wc, list(ns ORDER BY i) AS syms
                FROM d{r} WHERE NOT drp GROUP BY 1, 2
                UNION ALL
                -- early exhaustion: an empty argmax must PRESERVE the
                -- vocab (matching the Spark loop's break), not empty it
                SELECT word, wc, syms FROM v{r - 1}
                WHERE NOT EXISTS (SELECT 1 FROM b{r})
            )"""
    return p


def _wp_v0_cte() -> str:
    """WordPiece initial vocab: distinct normalized words with ##-marked
    continuation symbols."""
    return f"""v0 AS MATERIALIZED (
                SELECT word, count(*) AS wc,
                       list_transform(generate_series(1, length(word)),
                                      i -> CASE WHEN i = 1 THEN word[1]
                                           ELSE '##' || word[CAST(i AS INT)]
                                           END) AS syms
                FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            )"""


def _wp_round_ctes(r: int) -> str:
    """One unrolled WordPiece training round: symbol freqs + pair counts
    over v{r-1} → score argmax b{r} (score DESC, lhs, rhs) →
    islands+parity merge rewrite with the ^## strip rule → v{r}."""
    return f"""sc{r} AS (
                SELECT s AS sym, sum(wc) AS sf
                FROM v{r - 1}, UNNEST(syms) AS t(s) GROUP BY 1
            ),
            p{r} AS (
                SELECT syms[CAST(i AS INT)] AS lhs,
                       syms[CAST(i AS INT) + 1] AS rhs,
                       sum(wc) AS freq
                FROM v{r - 1}, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
                WHERE len(syms) >= 2 GROUP BY 1, 2
            ),
            b{r} AS MATERIALIZED (
                SELECT p.lhs, p.rhs, p.freq,
                       CAST(p.freq AS DOUBLE)
                           / (CAST(a.sf AS DOUBLE) * CAST(c.sf AS DOUBLE))
                           AS score
                FROM p{r} p
                JOIN sc{r} a ON a.sym = p.lhs
                JOIN sc{r} c ON c.sym = p.rhs
                ORDER BY score DESC, p.lhs, p.rhs LIMIT 1
            ),
            s{r} AS (
                SELECT v.word, v.wc, CAST(i AS INT) AS i,
                       v.syms[CAST(i AS INT)] AS s,
                       v.syms[CAST(i AS INT) + 1] AS nxt
                FROM v{r - 1} v, UNNEST(generate_series(1, len(v.syms))) AS t(i)
            ),
            m{r} AS (
                SELECT s.*, (s.s = b.lhs AND s.nxt = b.rhs) AS m
                FROM s{r} s, b{r} b
            ),
            g{r} AS (
                SELECT *, CASE WHEN m THEN
                    i - row_number() OVER (PARTITION BY word, m ORDER BY i)
                END AS grp FROM m{r}
            ),
            mm{r} AS (
                SELECT *, m AND
                    ((i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0)
                    AS merged
                FROM g{r}
            ),
            d{r} AS (
                SELECT *,
                    coalesce(lag(merged) OVER (PARTITION BY word ORDER BY i),
                             false) AS drp,
                    CASE WHEN merged
                         THEN s || regexp_replace(nxt, '^##', '')
                         ELSE s END AS ns
                FROM mm{r}
            ),
            v{r} AS MATERIALIZED (
                SELECT word, wc, list(ns ORDER BY i) AS syms
                FROM d{r} WHERE NOT drp GROUP BY 1, 2
                UNION ALL
                SELECT word, wc, syms FROM v{r - 1}
                WHERE NOT EXISTS (SELECT 1 FROM b{r})
            )"""


def _wp_apply_round_ctes(k: int) -> str:
    """One unrolled greedy longest-match round: candidate pieces
    prefixing substr(word, pos), longest wins, ##-marked when pos > 1;
    no candidate → [UNK]."""
    return f"""c{k} AS (
                SELECT a.*,
                       list_filter(CASE WHEN a.pos = 1 THEN pl.starts
                                        ELSE pl.conts END,
                                   p -> substr(a.word, a.pos, length(p)) = p)
                           AS cand
                FROM a{k - 1} a, plist pl
            ),
            e{k} AS (
                SELECT *, list_max(list_transform(cand, p -> length(p))) AS bl
                FROM c{k}
            ),
            a{k} AS MATERIALIZED (
                SELECT word,
                    CASE WHEN done THEN toks
                         WHEN bl IS NULL THEN ['[UNK]']
                         ELSE list_append(toks,
                             CASE WHEN pos = 1
                                  THEN list_filter(cand, p -> length(p) = bl)[1]
                                  ELSE '##' ||
                                       list_filter(cand, p -> length(p) = bl)[1]
                             END)
                    END AS toks,
                    CASE WHEN done OR bl IS NULL THEN pos
                         ELSE pos + CAST(bl AS INT) END AS pos,
                    CASE WHEN done OR bl IS NULL THEN true
                         ELSE pos + bl > length(word) END AS done
                FROM e{k}
            )"""


def _wordpiece_merges_oracle(rounds: int = 8) -> str:
    return f"""
        WITH {_wp_v0_cte()},
        {', '.join(_wp_round_ctes(r) for r in range(1, rounds + 1))}
        SELECT * FROM (
            {' UNION ALL '.join(f"SELECT {r} AS rank, lhs, rhs, CAST(freq AS BIGINT) AS freq, round(score, 6) AS score FROM b{r}" for r in range(1, rounds + 1))}
        )
    """


def _wordpiece_tokenize_oracle(rounds: int = 8, max_chars: int = 12) -> str:
    return f"""
        WITH {_wp_v0_cte()},
        {', '.join(_wp_round_ctes(r) for r in range(1, rounds + 1))},
        pc AS (
            SELECT DISTINCT s AS piece FROM v0, UNNEST(syms) AS t(s)
            UNION
            SELECT lhs || regexp_replace(rhs, '^##', '') FROM (
                {' UNION ALL '.join(f'SELECT lhs, rhs FROM b{r}' for r in range(1, rounds + 1))}
            )
        ),
        plist AS MATERIALIZED (
            SELECT list(piece ORDER BY piece)
                       FILTER (WHERE piece NOT LIKE '##%') AS starts,
                   list(substr(piece, 3) ORDER BY substr(piece, 3))
                       FILTER (WHERE piece LIKE '##%') AS conts
            FROM pc
        ),
        a0 AS (
            SELECT word,
                   CASE WHEN length(word) > {max_chars} THEN ['[UNK]']
                        ELSE CAST([] AS VARCHAR[]) END AS toks,
                   1 AS pos,
                   length(word) > {max_chars} AS done
            FROM (SELECT DISTINCT word FROM v0)
        ),
        {', '.join(_wp_apply_round_ctes(k) for k in range(1, max_chars + 1))},
        wdw AS (
            SELECT doc_id,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS w
            FROM documents
        ),
        wpos AS (
            SELECT doc_id, CAST(i AS INT) AS i, w[CAST(i AS INT)] AS word
            FROM wdw, UNNEST(generate_series(1, len(w))) AS t(i)
            WHERE w[CAST(i AS INT)] <> ''
        ),
        wper AS (
            SELECT p.doc_id,
                   flatten(list(a.toks ORDER BY p.i)) AS toks
            FROM wpos p JOIN a{max_chars} a USING (word) GROUP BY 1
        )
        SELECT d.doc_id,
               array_to_string(coalesce(wper.toks, CAST([] AS VARCHAR[])), ' ')
                   AS tokens_str,
               CAST(coalesce(len(wper.toks), 0) AS INT) AS n_tok
        FROM documents d LEFT JOIN wper USING (doc_id)
    """


def _bt_round_ctes(r: int) -> str:
    """One unrolled Bradley-Terry MM round: item-ordered fold of
    n_ij/(w_i+w_j) per item -> W_i/denom -> sum-normalize -> quantize
    1e-12."""
    return f"""t{r} AS (
                SELECT m.i,
                       list_reduce(list_prepend(0.0,
                           list(CAST(m.n AS DOUBLE) / (wi.w + wj.w)
                                ORDER BY m.j)),
                           (a, x) -> a + x) AS den
                FROM m
                JOIN w{r - 1} wi ON wi.item = m.i
                JOIN w{r - 1} wj ON wj.item = m.j
                GROUP BY m.i
            ),
            u{r} AS (
                SELECT t.i AS item, CAST(wn.wins AS DOUBLE) / t.den AS u
                FROM t{r} t JOIN wins wn ON wn.item = t.i
            ),
            s{r} AS (
                SELECT list_reduce(list_prepend(0.0, list(u ORDER BY item)),
                                   (a, x) -> a + x) AS tot
                FROM u{r}
            ),
            w{r} AS MATERIALIZED (
                SELECT item, round(u / s{r}.tot, 12) AS w FROM u{r}, s{r}
            )"""


def _bt_oracle(rounds: int, final: str) -> str:
    """Shared BT replay: the doc-length preference log -> bounded matrix
    + wins -> ``rounds`` unrolled MM rounds; ``final`` selects from
    w{rounds}."""
    return f"""
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split({_NORM}, ' ')) AS nw
            FROM documents
        ),
        pr AS (
            SELECT CASE WHEN x.nw > y.nw THEN x.source
                        WHEN y.nw > x.nw THEN y.source
                        ELSE least(x.source, y.source) END AS w,
                   CASE WHEN x.nw > y.nw THEN y.source
                        WHEN y.nw > x.nw THEN x.source
                        ELSE greatest(x.source, y.source) END AS l
            FROM d x JOIN d y ON y.doc_id = x.doc_id + 1
            WHERE x.source <> y.source
        ),
        und AS (
            SELECT least(w, l) AS a, greatest(w, l) AS b, count(*) AS n
            FROM pr GROUP BY 1, 2
        ),
        m AS (
            SELECT a AS i, b AS j, n FROM und
            UNION ALL SELECT b, a, n FROM und
        ),
        wins0 AS (SELECT w AS item, count(*) AS wins FROM pr GROUP BY 1),
        it AS (SELECT DISTINCT i AS item FROM m),
        wins AS (
            SELECT it.item, coalesce(w0_.wins, 0) AS wins
            FROM it LEFT JOIN wins0 w0_ USING (item)
        ),
        cnt AS (SELECT count(*) AS c FROM it),
        w0 AS MATERIALIZED (
            SELECT item, round(CAST(1 AS DOUBLE) / c, 12) AS w FROM it, cnt
        ),
        {', '.join(_bt_round_ctes(r) for r in range(1, rounds + 1))}
        {final}
    """


def _unigram_scored_ctes() -> str:
    """Shared DuckDB replay of the unigram LM scoring pass (top-1000 vocab,
    sorted-word fold): CTE chain ending in ``final`` with columns
    (doc_id, n_words, xent_nats, ppl). Used by the unigram_lm_score and
    ppl_buckets oracles."""
    return f"""w AS (
                SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
                FROM documents
            ),
            wf AS (SELECT doc_id, word FROM w WHERE word <> ''),
            lm AS (
                SELECT word, count(*) AS n FROM wf
                GROUP BY 1 ORDER BY n DESC, word LIMIT 1000
            ),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM lm),
            tf AS (
                SELECT doc_id, word, count(*) AS tf FROM wf GROUP BY 1, 2
            ),
            j AS (
                SELECT tf.doc_id, tf.word, tf.tf,
                       CAST(coalesce(lm.n, 1) AS DOUBLE) AS c
                FROM tf LEFT JOIN lm USING (word)
            ),
            arr AS (
                SELECT j.doc_id,
                       list(CAST(j.tf AS DOUBLE) * ln(j.c / tot.t)
                            ORDER BY j.word) AS terms,
                       sum(j.tf) AS L
                FROM j, tot GROUP BY 1
            ),
            scored AS (
                SELECT doc_id, L,
                       -list_reduce(list_prepend(0.0, terms),
                                    (acc, x) -> acc + x)
                           / CAST(L AS DOUBLE) AS xent
                FROM arr
            ),
            final AS (
                SELECT d.doc_id,
                       CAST(coalesce(s.L, 0) AS BIGINT) AS n_words,
                       round(coalesce(s.xent, 0.0), 6) AS xent_nats,
                       round(exp(coalesce(s.xent, 0.0)), 6) AS ppl
                FROM documents d LEFT JOIN scored s USING (doc_id)
            )"""


def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity terciles over the corpus-estimated
    unigram LM; exact percentile cuts (the 100 TB lane swaps in
    percentile_approx)."""
    from temporalscope_spark.operators.lm import ppl_buckets, unigram_counts

    docs = _t(spark, sf_dir, "documents")
    lm = unigram_counts(docs, "text", vocab_size=1000).cache()
    return ppl_buckets(docs, lm, "text", "doc_id")


def q_stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff bigram scoring (Brants et al. 2007 — the original
    MapReduce-distributed LM): full unigram table + top-500 bigram table
    (916 distinct bigrams at sf0.01, so ~45% of pair types genuinely back
    off). Sorted-(w1, w2) fold keeps the float sum engine-replayable."""
    from temporalscope_spark.operators.lm import (
        bigram_counts,
        score_stupid_backoff,
        unigram_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    # the unigram table feeds THREE broadcast joins (w1 denominator, w2
    # backoff, total) — without cache() each broadcast re-runs the full
    # corpus scan+agg; the table is vocab-sized, so caching is free
    uni = unigram_counts(docs, "text").cache()
    big = bigram_counts(docs, "text", top_k=500).cache()
    return score_stupid_backoff(docs, uni, big, "text", "doc_id", alpha=0.4)


def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1998's d=0.75) over the same top-500 bigram table as the
    Stupid Backoff query — the whole model (left marginals, continuation
    counts, type total) derives from that ONE bounded table, so the
    truncated LM stays internally consistent and the DuckDB replay is
    pure integer-count rational arithmetic."""
    from temporalscope_spark.operators.lm import bigram_counts, score_kneser_ney

    docs = _t(spark, sf_dir, "documents")
    # one bounded table feeds four derivations (pair join + three
    # aggregated marginals) — cache the TABLE so each broadcast doesn't
    # re-run the corpus scan (the r4 stupid-backoff lesson)
    big = bigram_counts(docs, "text", top_k=500).cache()
    return score_kneser_ney(docs, big, "text", "doc_id", discount=0.75)


def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence PPMI (Church & Hanks 1990 / Levy & Goldberg
    2014) over the top-500 vocabulary, window 2, min_count 2 — in-row pair
    generation (no corpus self-join), broadcast vocab semi-joins, one
    count; marginals/totals derive from the counted pair table."""
    from temporalscope_spark.operators.cooccur import cooccurrence_pmi
    from temporalscope_spark.operators.lm import unigram_counts

    docs = _t(spark, sf_dir, "documents")
    vocab = unigram_counts(docs, "text", vocab_size=500).cache()
    return cooccurrence_pmi(docs, vocab, "text", window=2, min_count=2)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): keep the 100 raw docs
    whose hashed unigram+bigram distribution best matches the trusted
    target slice (source='src1' stands in for the paper's Wikipedia
    target). md5 feature buckets + sorted-bucket folds + rounded-score
    ranking keep the whole pipeline engine-replayable."""
    from temporalscope_spark.operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src1")
    return dsir_select(docs, target, k=100, n_buckets=1024, smoothing=1.0)


def q_dsir_select_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scale lane (exact=False): approxQuantile bounds a candidate
    set whose exact count certifies it contains the true top-k, then the
    quantile-bucket two-phase rank (plans/rownum.py) replaces the global
    single-partition row_number window. The selection is provably
    IDENTICAL to the exact lane, so this query shares dsir_select's
    oracle — the strongest possible check that the scale path changes
    the plan, not the answer."""
    from temporalscope_spark.operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src1")
    return dsir_select(
        docs, target, k=100, n_buckets=1024, smoothing=1.0, exact=False
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/XLM-R temperature mixing over the 20 document sources:
    rate_s ∝ n_s^alpha / n_s at alpha=0.3, capped at 1, md5-portable
    membership. The n^alpha normalizer folds over source-sorted counts so
    the oracle replays the identical float sequence."""
    from temporalscope_spark.operators.sampling import temperature_sample

    docs = _t(spark, sf_dir, "documents")
    return temperature_sample(
        docs, budget_rows=300, strata_col="source", alpha=0.3, seed=42,
        portable=True,
    )


def q_assign_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training dataloaders:
    md5-derived (shard, pos) addresses, per-shard windows only (no global
    sort)."""
    from temporalscope_spark.operators.sampling import assign_shards

    docs = _t(spark, sf_dir, "documents")
    return assign_shards(docs.select("doc_id"), n_shards=8, seed=42)


def _cramer3_cte() -> str:
    """Cramer 3x3 solve of the (possibly weighted) normal equations from a
    CTE ``s`` with columns (n, s1, s2, s11, s12, s22, sy, s1y, s2y) —
    b0=intercept, b1, b2 + the first/second moment means."""
    return """beta AS (
            SELECT
                s1 / n AS m1, s2 / n AS m2,
                (  sy  * (s11*s22 - s12*s12)
                 - s1  * (s1y*s22 - s12*s2y)
                 + s2  * (s1y*s12 - s11*s2y)) /
                (  n   * (s11*s22 - s12*s12)
                 - s1  * (s1 *s22 - s12*s2 )
                 + s2  * (s1 *s12 - s11*s2 )) AS b0,
                (  n   * (s1y*s22 - s12*s2y)
                 - sy  * (s1 *s22 - s12*s2 )
                 + s2  * (s1 *s2y - s1y*s2 )) /
                (  n   * (s11*s22 - s12*s12)
                 - s1  * (s1 *s22 - s12*s2 )
                 + s2  * (s1 *s12 - s11*s2 )) AS b1,
                (  n   * (s11*s2y - s1y*s12)
                 - s1  * (s1 *s2y - s1y*s2 )
                 + sy  * (s1 *s12 - s11*s2 )) /
                (  n   * (s11*s22 - s12*s12)
                 - s1  * (s1 *s22 - s12*s2 )
                 + s2  * (s1 *s12 - s11*s2 )) AS b2
            FROM s
        )
    """


def _lag_ols_ctes() -> str:
    """Shared oracle CTEs: lag features over events, one sufficient-stats
    row, the Cramer 3x3 solve (b0=intercept, b1, b2) + feature means."""
    return f"""
        feats AS (
            SELECT event_id, ts, value AS y,
                   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS l1,
                   lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS l2
            FROM events
        ),
        d AS (SELECT * FROM feats WHERE l1 IS NOT NULL AND l2 IS NOT NULL),
        s AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(l1) AS s1, sum(l2) AS s2,
                   sum(l1*l1) AS s11, sum(l1*l2) AS s12, sum(l2*l2) AS s22,
                   sum(y) AS sy, sum(l1*y) AS s1y, sum(l2*y) AS s2y
            FROM d
        ),
        {_cramer3_cte()}"""


# one IRLS round at fixed beta0 — the weighted sums feed the SAME Cramer
# solve; beta0 is scaled to the events value range (|eta| <= ~1.1) so the
# weights stay well-conditioned in both engines
_IRLS_B0 = (0.01, 0.002, -0.002)


def _irls_step_ctes() -> str:
    b0, b1, b2 = _IRLS_B0
    return f"""
        feats AS (
            SELECT event_id, ts,
                   CAST(event_id % 2 AS DOUBLE) AS yb,
                   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS l1,
                   lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS l2
            FROM events
        ),
        d0 AS (SELECT * FROM feats WHERE l1 IS NOT NULL AND l2 IS NOT NULL),
        m AS (
            SELECT l1, l2, yb, {b0} + {b1}*l1 + ({b2})*l2 AS eta FROM d0
        ),
        mw AS (
            SELECT l1, l2, yb, eta,
                   least(greatest(1/(1+exp(-eta)), 1e-10), 1-1e-10) AS mu
            FROM m
        ),
        mz AS (
            SELECT l1, l2, yb, eta, mu*(1-mu) AS w,
                   eta + (yb-mu)/(mu*(1-mu)) AS z
            FROM mw
        ),
        s AS (
            SELECT sum(w) AS n,
                   sum(w*l1) AS s1, sum(w*l2) AS s2,
                   sum(w*l1*l1) AS s11, sum(w*l1*l2) AS s12, sum(w*l2*l2) AS s22,
                   sum(w*z) AS sy, sum(w*l1*z) AS s1y, sum(w*l2*z) AS s2y,
                   sum(yb*eta - CASE WHEN eta > 30 THEN eta
                                     ELSE ln(1+exp(eta)) END) AS ll
            FROM mz
        ),
        {_cramer3_cte()}"""


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# single source of truth for the PII patterns (Java regex ∩ RE2 — safe to
# interpolate into DuckDB single-quoted literals: no quotes in the patterns)
from temporalscope_spark.operators.pii import PII_PATTERNS as _PII_RE  # noqa: E402

# the same deterministic PII plant as _plant_pii(), in DuckDB SQL
_PII_PLANT = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 5 = 0
                   THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                   THEN ' dial 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           AS text
    FROM documents
"""


def _corr_matrix_oracle() -> str:
    """Generated from the same pair loop as the engine: per pair, six
    gated moments in one aggregation, the identical closed forms
    (sample cov n-1, corr gated on n>=2 and positive variances)."""
    cols = [
        ("value", "CAST(value AS DOUBLE)"),
        ("plen", "CAST(length(props) AS DOUBLE)"),
        ("uvar", "CAST(user_id % 100 AS DOUBLE)"),
    ]
    sels, rows = [], []
    for i, (ni, ei) in enumerate(cols):
        for nj, ej in cols[i:]:
            t = f"{ni}_{nj}"
            both = f"({ei} IS NOT NULL AND {ej} IS NOT NULL)"
            gx = f"CASE WHEN {both} THEN {ei} END"
            gy = f"CASE WHEN {both} THEN {ej} END"
            sels += [
                f"CAST(count({gx}) AS DOUBLE) AS n_{t}",
                f"sum({gx}) AS sx_{t}",
                f"sum({gy}) AS sy_{t}",
                f"sum(({gx}) * ({gy})) AS sxy_{t}",
                f"sum(({gx}) * ({gx})) AS sxx_{t}",
                f"sum(({gy}) * ({gy})) AS syy_{t}",
            ]
            cov_num = f"(sxy_{t} - sx_{t} * sy_{t} / n_{t})"
            varx = f"(sxx_{t} - sx_{t} * sx_{t} / n_{t})"
            vary = f"(syy_{t} - sy_{t} * sy_{t} / n_{t})"
            rows.append(
                f"SELECT '{ni}' AS f1, '{nj}' AS f2, "
                f"CAST(n_{t} AS BIGINT) AS n_pairs, "
                f"round(CASE WHEN n_{t} >= 2 THEN {cov_num} / (n_{t} - 1) "
                f"END, 6) + 0.0 AS cov, "
                f"round(CASE WHEN n_{t} >= 2 AND {varx} > 0 AND {vary} > 0 "
                f"THEN {cov_num} / sqrt({varx} * {vary}) END, 6) + 0.0 AS corr "
                f"FROM m"
            )
    return (
        "WITH m AS (SELECT "
        + ", ".join(sels)
        + " FROM events) "
        + " UNION ALL ".join(rows)
    )


def _numeric_relevance_oracle() -> str:
    """Generated from the same per-feature loop as the engine: six gated
    moments in one aggregation, closed-form r (gated on n>=2 and positive
    variances), t from the UNROUNDED r (gated on n>2 and |r|<1)."""
    label = "CAST(value AS DOUBLE)"
    cols = [
        ("plen", "CAST(length(props) AS DOUBLE)"),
        ("uvar", "CAST(user_id % 100 AS DOUBLE)"),
    ]
    sels, rs, rows = [], [], []
    for i, (name, e) in enumerate(cols):
        both = f"({e} IS NOT NULL AND {label} IS NOT NULL)"
        gx = f"CASE WHEN {both} THEN {e} END"
        gy = f"CASE WHEN {both} THEN {label} END"
        sels += [
            f"CAST(count({gx}) AS DOUBLE) AS n_{i}",
            f"sum({gx}) AS sx_{i}",
            f"sum({gy}) AS sy_{i}",
            f"sum(({gx}) * ({gy})) AS sxy_{i}",
            f"sum(({gx}) * ({gx})) AS sxx_{i}",
            f"sum(({gy}) * ({gy})) AS syy_{i}",
        ]
        cov_num = f"(sxy_{i} - sx_{i} * sy_{i} / n_{i})"
        varx = f"(sxx_{i} - sx_{i} * sx_{i} / n_{i})"
        vary = f"(syy_{i} - sy_{i} * sy_{i} / n_{i})"
        rs.append(
            f"CASE WHEN n_{i} >= 2 AND {varx} > 0 AND {vary} > 0 "
            f"THEN {cov_num} / sqrt({varx} * {vary}) END AS r_{i}"
        )
        rows.append(
            f"SELECT '{name}' AS feature, CAST(n_{i} AS BIGINT) AS n, "
            f"round(r_{i}, 6) + 0.0 AS pearson_r, "
            f"round(CASE WHEN r_{i} IS NOT NULL AND n_{i} > 2 "
            f"AND 1.0 - r_{i} * r_{i} > 0 "
            f"THEN r_{i} * sqrt((n_{i} - 2) / (1.0 - r_{i} * r_{i})) "
            f"END, 6) + 0.0 AS t_stat "
            f"FROM r"
        )
    return (
        "WITH m AS (SELECT "
        + ", ".join(sels)
        + " FROM events), r AS (SELECT m.*, "
        + ", ".join(rs)
        + " FROM m) "
        + " UNION ALL ".join(rows)
    )


def _spearman_oracle() -> str:
    """Generated from the same loops as the engine: per column, average
    ranks from the distinct-value cumulative (min-rank identity
    ``cum − c + (c+1)/2``), value-keyed joins back, then the identical
    gated Pearson moments over the rank columns."""
    cols = [
        ("value", "CAST(value AS DOUBLE)"),
        ("plen", "CAST(length(props) AS DOUBLE)"),
        ("uvar", "CAST(user_id % 100 AS DOUBLE)"),
    ]
    base = ", ".join(f"{e} AS x{i}" for i, (_, e) in enumerate(cols))
    ctes = [f"base AS (SELECT {base} FROM events)"]
    joins = []
    for i in range(len(cols)):
        ctes.append(
            f"v{i} AS (SELECT x{i} AS v, CAST(count(*) AS DOUBLE) AS c "
            f"FROM base WHERE x{i} IS NOT NULL GROUP BY 1)"
        )
        ctes.append(
            f"l{i} AS (SELECT v, sum(c) OVER (ORDER BY v) - c + (c + 1) / 2.0 "
            f"AS r FROM v{i})"
        )
        joins.append(f"LEFT JOIN l{i} ON base.x{i} = l{i}.v")
    ctes.append(
        "j AS (SELECT "
        + ", ".join(f"l{i}.r AS r{i}" for i in range(len(cols)))
        + " FROM base "
        + " ".join(joins)
        + ")"
    )
    sels, rows = [], []
    for i, (ni, _) in enumerate(cols):
        for jdx in range(i, len(cols)):
            nj = cols[jdx][0]
            t = f"{i}_{jdx}"
            both = f"(r{i} IS NOT NULL AND r{jdx} IS NOT NULL)"
            gx = f"CASE WHEN {both} THEN r{i} END"
            gy = f"CASE WHEN {both} THEN r{jdx} END"
            sels += [
                f"CAST(count({gx}) AS DOUBLE) AS n_{t}",
                f"sum({gx}) AS sx_{t}",
                f"sum({gy}) AS sy_{t}",
                f"sum(({gx}) * ({gy})) AS sxy_{t}",
                f"sum(({gx}) * ({gx})) AS sxx_{t}",
                f"sum(({gy}) * ({gy})) AS syy_{t}",
            ]
            cov_num = f"(sxy_{t} - sx_{t} * sy_{t} / n_{t})"
            varx = f"(sxx_{t} - sx_{t} * sx_{t} / n_{t})"
            vary = f"(syy_{t} - sy_{t} * sy_{t} / n_{t})"
            rows.append(
                f"SELECT '{ni}' AS f1, '{nj}' AS f2, "
                f"CAST(n_{t} AS BIGINT) AS n_pairs, "
                f"round(CASE WHEN n_{t} >= 2 AND {varx} > 0 AND {vary} > 0 "
                f"THEN {cov_num} / sqrt({varx} * {vary}) END, 6) + 0.0 AS rho "
                f"FROM m"
            )
    ctes.append("m AS (SELECT " + ", ".join(sels) + " FROM j)")
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(rows)


def _mrmr_oracle() -> str:
    """Three greedy mRMR rounds unrolled as CTEs over the SAME rounded
    moments the engine collects: `rel` = |rounded Pearson r| per feature,
    `sym` = symmetric |rounded corr| pairs; each round is an argmax
    (score DESC, feature ASC) over the not-yet-selected set."""
    label = "CAST(value AS DOUBLE)"
    cols = [
        ("plen", "CAST(length(props) AS DOUBLE)"),
        ("uvar", "CAST(user_id % 100 AS DOUBLE)"),
        ("hod", "CAST(hour(ts) AS DOUBLE)"),
        ("dow", "CAST(dayofweek(ts) + 1 AS DOUBLE)"),
    ]

    def moments(tag: str, ex: str, ey: str) -> tuple[list, str]:
        both = f"({ex} IS NOT NULL AND {ey} IS NOT NULL)"
        gx = f"CASE WHEN {both} THEN {ex} END"
        gy = f"CASE WHEN {both} THEN {ey} END"
        sels = [
            f"CAST(count({gx}) AS DOUBLE) AS n_{tag}",
            f"sum({gx}) AS sx_{tag}",
            f"sum({gy}) AS sy_{tag}",
            f"sum(({gx}) * ({gy})) AS sxy_{tag}",
            f"sum(({gx}) * ({gx})) AS sxx_{tag}",
            f"sum(({gy}) * ({gy})) AS syy_{tag}",
        ]
        cov = f"(sxy_{tag} - sx_{tag} * sy_{tag} / n_{tag})"
        vx = f"(sxx_{tag} - sx_{tag} * sx_{tag} / n_{tag})"
        vy = f"(syy_{tag} - sy_{tag} * sy_{tag} / n_{tag})"
        r = (
            f"round(CASE WHEN n_{tag} >= 2 AND {vx} > 0 AND {vy} > 0 "
            f"THEN {cov} / sqrt({vx} * {vy}) END, 6)"
        )
        return sels, r

    sels, rel_rows, pair_rows = [], [], []
    for i, (ni, ei) in enumerate(cols):
        s, r = moments(f"y{i}", ei, label)
        sels += s
        rel_rows.append(
            f"SELECT '{ni}' AS feature, abs({r}) AS rel FROM m "
            f"WHERE {r} IS NOT NULL"
        )
        for jdx in range(i + 1, len(cols)):
            nj, ej = cols[jdx]
            s, r = moments(f"p{i}_{jdx}", ei, ej)
            sels += s
            pair_rows.append(
                f"SELECT '{ni}' AS a, '{nj}' AS b, "
                f"coalesce(abs({r}), 0.0) AS c FROM m"
            )
    return f"""
        WITH m AS (SELECT {", ".join(sels)} FROM events),
        rel AS ({" UNION ALL ".join(rel_rows)}),
        half AS ({" UNION ALL ".join(pair_rows)}),
        sym AS (SELECT a, b, c FROM half
                UNION ALL SELECT b, a, c FROM half),
        s1 AS (SELECT feature AS f, rel, 0.0 AS red, rel AS score
               FROM rel ORDER BY rel DESC, feature LIMIT 1),
        c2 AS (SELECT r.feature, r.rel, coalesce(y.c, 0.0) AS red
               FROM rel r
               LEFT JOIN sym y ON y.a = r.feature AND y.b = (SELECT f FROM s1)
               WHERE r.feature != (SELECT f FROM s1)),
        s2 AS (SELECT feature AS f, rel, red, rel - red AS score
               FROM c2 ORDER BY (rel - red) DESC, feature LIMIT 1),
        c3 AS (SELECT r.feature, r.rel,
                      (coalesce(y1.c, 0.0) + coalesce(y2.c, 0.0)) / 2 AS red
               FROM rel r
               LEFT JOIN sym y1 ON y1.a = r.feature AND y1.b = (SELECT f FROM s1)
               LEFT JOIN sym y2 ON y2.a = r.feature AND y2.b = (SELECT f FROM s2)
               WHERE r.feature != (SELECT f FROM s1)
                 AND r.feature != (SELECT f FROM s2)),
        s3 AS (SELECT feature AS f, rel, red, rel - red AS score
               FROM c3 ORDER BY (rel - red) DESC, feature LIMIT 1)
        SELECT 1 AS rank, f AS feature, round(rel, 6) AS relevance,
               round(red, 6) AS redundancy, round(score, 6) AS score FROM s1
        UNION ALL
        SELECT 2, f, round(rel, 6), round(red, 6), round(score, 6) FROM s2
        UNION ALL
        SELECT 3, f, round(rel, 6), round(red, 6), round(score, 6) FROM s3
    """


def _gopher_oracle() -> str:
    """DuckDB replay of q_gopher_rules: grams via UNNEST(generate_series) +
    list_slice (the dup_span_stats idiom), top gram via ORDER BY cnt DESC,
    gram DESC (= Spark's struct-max tie-break), dup mass as
    count×len over grams with count ≥ 2; every ratio int/int rounded 6."""
    from temporalscope_spark.operators.gopher import (
        GOPHER_DUP_NGRAM_MAX_FRAC,
        GOPHER_STOP_WORDS,
        GOPHER_TOP_NGRAM_MAX_FRAC,
    )

    top_ns = sorted(GOPHER_TOP_NGRAM_MAX_FRAC)
    dup_ns = sorted(GOPHER_DUP_NGRAM_MAX_FRAC)
    padded = "(' ' || norm || ' ')"
    stop_terms = " + ".join(
        f"(length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2}"
        for w in GOPHER_STOP_WORDS
    )
    ctes = [
        f"n0 AS (SELECT doc_id, {_NORM} AS norm FROM documents)",
        "w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words FROM n0)",
        f"""m AS (
            SELECT doc_id,
                   CASE WHEN length(norm) = 0 THEN 0 ELSE len(words) END AS n_words,
                   length(norm) AS n_chars,
                   length(norm) - length(replace(norm, ' ', '')) AS n_spaces,
                   length(norm) - length(replace(norm, '#', '')) AS n_hash,
                   (length(norm) - length(replace(norm, '...', ''))) / 3 AS n_ell,
                   len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                   CAST({stop_terms} AS BIGINT) AS stop_hits
            FROM w
        )""",
    ]
    for n in sorted({*top_ns, *dup_ns}):
        ctes.append(
            f"""g{n} AS (
            SELECT doc_id, gram, count(*) AS cnt FROM (
                SELECT w.doc_id,
                       array_to_string(list_slice(w.words, CAST(i AS INT),
                                       CAST(i AS INT) + {n - 1}), ' ') AS gram
                FROM w, UNNEST(generate_series(1, len(w.words) - {n - 1})) AS t(i)
                WHERE len(w.words) >= {n}
            ) GROUP BY doc_id, gram
        )"""
        )
    for n in top_ns:
        ctes.append(
            f"""t{n} AS (
            SELECT doc_id, cnt * length(gram) AS chars FROM (
                SELECT doc_id, gram, cnt,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY cnt DESC, gram DESC) AS rn
                FROM g{n}
            ) WHERE rn = 1
        )"""
        )
    for n in dup_ns:
        ctes.append(
            f"""d{n} AS (
            SELECT doc_id,
                   sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS chars
            FROM g{n} GROUP BY doc_id
        )"""
        )
    frac = (
        "round(CASE WHEN m.n_chars = 0 THEN 0.0 "
        "ELSE least(CAST(coalesce({src}.chars, 0) AS DOUBLE) / m.n_chars, 1.0) "
        "END, 6)"
    )
    sel_cols = [
        "m.doc_id",
        "CAST(m.n_words AS BIGINT) AS gopher_word_count",
        "round((m.n_chars - m.n_spaces) / greatest(m.n_words, 1), 6)"
        " AS gopher_mean_word_len",
        "round((m.n_hash + m.n_ell) / greatest(m.n_words, 1), 6)"
        " AS gopher_symbol_word_ratio",
        "round(CASE WHEN m.n_words = 0 THEN 0.0"
        " ELSE CAST(m.n_alpha AS DOUBLE) / m.n_words END, 6)"
        " AS gopher_alpha_word_ratio",
        "m.stop_hits AS gopher_stop_word_hits",
    ]
    joins = []
    for n in top_ns:
        sel_cols.append(frac.format(src=f"t{n}") + f" AS top_{n}gram_char_frac")
        joins.append(f"LEFT JOIN t{n} ON t{n}.doc_id = m.doc_id")
    for n in dup_ns:
        sel_cols.append(frac.format(src=f"d{n}") + f" AS dup_{n}gram_char_frac")
        joins.append(f"LEFT JOIN d{n} ON d{n}.doc_id = m.doc_id")
    keep_conds = [
        "gopher_word_count >= 50",
        "gopher_word_count <= 100000",
        "gopher_mean_word_len >= 3.0",
        "gopher_mean_word_len <= 10.0",
        "gopher_symbol_word_ratio <= 0.1",
        "gopher_alpha_word_ratio >= 0.8",
        "gopher_stop_word_hits >= 2",
    ]
    for n, thr in sorted(GOPHER_TOP_NGRAM_MAX_FRAC.items()):
        keep_conds.append(f"top_{n}gram_char_frac <= {thr}")
    for n, thr in sorted(GOPHER_DUP_NGRAM_MAX_FRAC.items()):
        keep_conds.append(f"dup_{n}gram_char_frac <= {thr}")
    cte_block = ",\n        ".join(ctes)
    sel_block = ",\n                   ".join(sel_cols)
    join_block = " ".join(joins)
    keep_block = " AND ".join(keep_conds)
    return f"""
        WITH {cte_block},
        sel AS (
            SELECT {sel_block}
            FROM m {join_block}
        )
        SELECT *, ({keep_block}) AS gopher_keep FROM sel
    """


def q_acf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sample autocorrelation of `events.value` at lags 1-3
    (global-mean Box-Jenkins estimator): three lag() columns over ONE
    (ts, event_id)-ordered window, one grouped cross-moment aggregation,
    closed-form projection the oracle replays term-for-term."""
    from temporalscope_spark.operators.tsfeatures import acf_features

    events = _t(spark, sf_dir, "events")
    return acf_features(
        events, "value", 3, time_col="ts", id_col="user_id", tiebreak_col="event_id"
    )


def q_series_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user tsfresh-style battery over `events.value` (abs energy,
    mean abs/signed change, CID complexity, peak/direction-change counts,
    longest increasing streak): one entity window for lags+run ids, one
    (entity, run) window for streaks, ONE grouped fold — three exchanges,
    no joins."""
    from temporalscope_spark.operators.tsfeatures import series_features

    events = _t(spark, sf_dir, "events")
    return series_features(
        events, "value", time_col="ts", id_col="user_id", tiebreak_col="event_id"
    )


def q_serve_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time serve: for every click, attach the
    latest prior purchase amount (expiring after a 2-day TTL) and the
    latest prior signup value — two chained backward as-of joins, zero
    leakage by construction; feature tables pre-aggregated to unique
    (user, ts)."""
    from temporalscope_spark.operators.asof import serve_features

    ev = _t(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("amount"))
    )
    sig = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sval"))
    )
    out = serve_features(
        spine,
        [
            {"df": purch, "time_col": "ts", "prefix": "purch_",
             "ttl": 2 * 86400.0},
            {"df": sig, "time_col": "ts", "prefix": "sig_"},
        ],
        on="user_id",
        spine_time="ts",
    )
    return out.select("event_id", "purch_amount", "sig_sval")


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over TPC-H: positives = distinct
    (supplier, part) pairs from a lineitem slice, candidates = the part
    universe indexed by the md5-ordered two-phase row number, 2 draws per
    positive, accidental positives anti-joined away."""
    from temporalscope_spark.operators.sampling import negative_samples

    li = _t(spark, sf_dir, "lineitem")
    pos = (
        li.filter(F.col("l_orderkey") % 37 == 0)
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    items = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return negative_samples(pos, items, "l_suppkey", "l_partkey", k=2)


def q_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival/churn label: per event, seconds until the user's NEXT
    purchase (strictly forward, NULL = right-censored after the last
    one) — a reverse running min of the gated timestamp over one
    entity-keyed window, tie order pinned by event_id."""
    from temporalscope_spark.operators.shift import time_to_event

    events = _t(spark, sf_dir, "events")
    out = time_to_event(
        events,
        "ts",
        F.col("event_type") == "purchase",
        id_col="user_id",
        order_cols=["event_id"],
    )
    return out.select("event_id", "tte_seconds")


def q_dft_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user DFT magnitudes of `events.value` at the 3 lowest
    frequencies (numpy fft convention, positions over the (ts, event_id)-
    ordered non-null subsequence): one entity window for position+length,
    one grouped trigonometric fold."""
    from temporalscope_spark.operators.tsfeatures import dft_features

    events = _t(spark, sf_dir, "events")
    return dft_features(
        events, "value", 3, time_col="ts", id_col="user_id", tiebreak_col="event_id"
    )


def q_fourier_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-period sin/cos time encodings (2 harmonics) of `events.ts` —
    a pure narrow projection (plan-tested exchange-free) that folds into
    any scan already reading the time column."""
    from temporalscope_spark.operators.tsfeatures import fourier_time_features

    events = _t(spark, sf_dir, "events")
    out = fourier_time_features(events, "ts", period_seconds=86_400, harmonics=2)
    return out.select(
        "event_id",
        "ts_86400s_sin_1",
        "ts_86400s_cos_1",
        "ts_86400s_sin_2",
        "ts_86400s_cos_2",
    )


def q_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile discretization of `events.value`: one 1-row exact-percentile
    fit (edges become plan literals, `approx=True` is the sketch lane),
    then a pure narrow projection — the psi_drift binning as a standalone
    fit/transform feature op."""
    from temporalscope_spark.operators.binning import quantile_bin

    events = _t(spark, sf_dir, "events")
    return quantile_bin(events, "value", bins=10).select(
        "event_id", "value", "value_bin"
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize `events.value` at the [0.05, 0.95] quantiles — bounds
    from one aggregation, interior values pass through bit-exact."""
    from temporalscope_spark.operators.binning import winsorize

    events = _t(spark, sf_dir, "events")
    return winsorize(events, ["value"], lower=0.05, upper=0.95).select(
        "event_id", "value", "value_wins"
    )


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of `events.value`
    per user (daily period, hour-of-day phases): one time-RANGE window for
    the centered trend, one bounded (user, phase) mean broadcast back."""
    from temporalscope_spark.operators.tsfeatures import seasonal_decompose

    events = _t(spark, sf_dir, "events")
    out = seasonal_decompose(
        events, "value", 86_400, 3_600, time_col="ts", id_col="user_id"
    )
    return out.select("event_id", "phase", "trend", "seasonal", "resid")


def q_feature_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI / chi-square / Cramér's V of two binned features against
    `events.event_type`: one corpus melt+count to a bounded cell table
    (persisted branch point), marginals + expected grid + sorted folds all
    cell-table-sized."""
    from temporalscope_spark.operators.relevance import feature_relevance

    events = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") / 50).cast("int").alias("vbin"),
        (F.col("user_id") % 8).cast("int").alias("ubin"),
        "event_type",
    )
    return feature_relevance(events, ["vbin", "ubin"], "event_type")


def q_numeric_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r + t-statistic of two numeric features against
    `events.value` (the sklearn r_regression/f_regression screen): all
    p·6 gated moments from ONE aggregation, per-feature rows exploded
    from the 1-row result."""
    from temporalscope_spark.operators.relevance import numeric_relevance

    events = _t(spark, sf_dir, "events").select(
        "value",
        F.length("props").cast("double").alias("plen"),
        (F.col("user_id") % 100).cast("double").alias("uvar"),
    )
    return numeric_relevance(events, ["plen", "uvar"], "value")


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation matrix over three numeric columns:
    average ranks per column via the quantile-bucket two-phase cumsum (no
    single-partition window), value-keyed LUT joins back, then ONE
    gated-moment aggregation over the rank columns."""
    from temporalscope_spark.operators.relevance import spearman_matrix

    events = _t(spark, sf_dir, "events").select(
        "value",
        F.length("props").cast("double").alias("plen"),
        (F.col("user_id") % 100).cast("double").alias("uvar"),
    )
    return spearman_matrix(events, ["value", "plen", "uvar"])


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F (sklearn f_classif) of two numeric features across
    `events.event_type` classes: one corpus melt + one groupBy(feature,
    class) moment aggregation; every statistic folds from the bounded
    class-moment table, sorted by class."""
    from temporalscope_spark.operators.relevance import anova_f

    events = _t(spark, sf_dir, "events").select(
        "value",
        F.length("props").cast("double").alias("plen"),
        "event_type",
    )
    return anova_f(events, ["value", "plen"], "event_type")


def q_mrmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy mRMR selection of 3 of 4 numeric features against
    `events.value`: relevance + p×p redundancy each from ONE bounded
    aggregation, the greedy loop driver-side over those tables. Oracle =
    the three rounds unrolled as CTEs (argmax with the same name
    tie-break) over the identical rounded moments."""
    from temporalscope_spark.operators.relevance import select_features_mrmr

    events = _t(spark, sf_dir, "events").select(
        "value",
        F.length("props").cast("double").alias("plen"),
        (F.col("user_id") % 100).cast("double").alias("uvar"),
        F.hour("ts").cast("double").alias("hod"),
        F.dayofweek("ts").cast("double").alias("dow"),
    )
    return select_features_mrmr(
        events, ["plen", "uvar", "hod", "dow"], "value", k=3
    )


def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-complete Pearson cov/corr matrix over three numeric
    columns — all p(p+1)/2·6 gated moments from ONE aggregation (one
    corpus scan, 1-row result), long rows exploded from that row."""
    from temporalscope_spark.operators.relevance import correlation_matrix

    events = _t(spark, sf_dir, "events").select(
        "value",
        F.length("props").cast("double").alias("plen"),
        (F.col("user_id") % 100).cast("double").alias("uvar"),
    )
    return correlation_matrix(events, ["value", "plen", "uvar"])


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-past trailing covariance/correlation between `events.value`
    and the props payload length over a 1h range frame — five windowed sums
    sharing one window spec (one exchange), moments combined in a closed
    form the oracle replays verbatim from ITS windowed sums (built-in
    covar_samp/corr would disagree across engines on update order)."""
    from temporalscope_spark.operators.rolling import rolling_corr

    events = _t(spark, sf_dir, "events").withColumn(
        "plen", F.length("props").cast("double")
    )
    out = rolling_corr(
        events, "value", "plen", [3600], time_col="ts", id_col="user_id"
    )
    return out.select(
        "event_id",
        "user_id",
        "value_plen_n_3600s",
        "value_plen_cov_3600s",
        "value_plen_corr_3600s",
    )


def q_delta_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-past change features (diff / pct-change / per-second rate)
    per user over `events.value` — one fused window operator (single entity
    shuffle + sort), tie-broken on event_id so lag order is engine-stable."""
    from temporalscope_spark.operators.shift import delta_features

    events = _t(spark, sf_dir, "events")
    out = delta_features(
        events, "ts", ["value"], [1], id_col="user_id", order_cols=["event_id"]
    )
    return out.select(
        "event_id", "user_id", "value_diff_1", "value_pct_1", "value_rate_1"
    )


_DRIFT_SPLIT = "2024-01-16 00:00:00"


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of `events.value` across a mid-corpus time
    split: exact reference-slice percentile edges (quantized to 1e-6 before
    the bin comparison — engine-stable), one fused per-bin conditional-count
    pass, eps-floored shares. The oracle replays the identical edges via
    DuckDB quantile_cont (the established type-7 equivalence)."""
    from temporalscope_spark.operators.drift import psi_drift

    events = _t(spark, sf_dir, "events")
    return psi_drift(events, "value", "ts", _DRIFT_SPLIT, bins=10)


def _scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (score, label) pair over events for the metric
    queries: label = value > 35 (its median ≈ 34.6, so both classes are
    populated), score = a logistic transform of value plus md5-portable
    noise, quantized to the 0.01 grid so the tie handling is exercised."""
    ev = _t(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#7"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(float(2**32))
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 35.0) / 30.0))
    score = F.round(
        F.least(
            F.greatest(sig + (u - 0.5) * 0.4, F.lit(0.0)), F.lit(1.0)
        ),
        2,
    )
    return ev.select(
        score.alias("score"),
        (F.col("value") > 35.0).cast("int").alias("y"),
        "event_type",
    )


_SCORED_SQL = """
        scored AS (
            SELECT round(least(greatest(
                       1.0 / (1.0 + exp(-(CAST(value AS DOUBLE) - 35.0) / 30.0))
                       + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                              || '#7'), 1, 8)) AS BIGINT) / 4294967296.0
                          - 0.5) * 0.4,
                   0.0), 1.0), 2) AS score,
                   CAST(CAST(value AS DOUBLE) > 35.0 AS INT) AS y,
                   event_type
            FROM events
        )"""


def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the deterministic score vs its label: Mann-Whitney
    rank-sum over AVERAGE ranks from the two-phase global cumsum — no
    global sort, no score collection; ties (the 0.01 score grid) get the
    trapezoidal correction."""
    from temporalscope_spark.metrics.classification import auc_roc

    return auc_roc(_scored_events(spark, sf_dir), "score", "y")


def q_reliability_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration bins of the score: fixed-width probability bins, one
    map-side-combinable aggregation, per-bin mean score vs positive rate."""
    from temporalscope_spark.metrics.classification import reliability_curve

    return reliability_curve(_scored_events(spark, sf_dir), "score", "y")


def q_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gain table on exact score-percentile bands: one edge
    aggregate (driver literals), one conditional-count pass, cumulative
    capture over the bounded 10-row band table."""
    from temporalscope_spark.metrics.classification import lift_table

    return lift_table(_scored_events(spark, sf_dir), "score", "y")


def q_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type exact AUC of the deterministic score — the
    model-quality drift twin of psi_score: per-group average ranks from a
    group-partitioned window over the DISTINCT-score table, one grouped
    fold."""
    from temporalscope_spark.metrics.classification import auc_by_group

    return auc_by_group(
        _scored_events(spark, sf_dir), "score", "y", ["event_type"]
    )


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1/accuracy at the 0.1..0.9 threshold sweep over
    the deterministic score: all 9 operating points from ONE aggregation
    (36 conditional counts), rows exploded from the 1-row result."""
    from temporalscope_spark.metrics.classification import pr_curve

    return pr_curve(_scored_events(spark, sf_dir), "score", "y")


def q_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE/MAE/bias/R² of a deterministic noisy predictor of
    `events.value`, per event_type — one gated-moment aggregation per
    group, pairwise-complete."""
    from temporalscope_spark.metrics.classification import regression_metrics

    ev = _t(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#11"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(float(2**32))
    )
    pred = 0.8 * F.col("value") + (u - 0.5) * 20.0 + 5.0
    df = ev.select(pred.alias("pred"), F.col("value").alias("y"), "event_type")
    return regression_metrics(df, "pred", "y", ["event_type"])


def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration map fitted on the deterministic score's
    fixed-width bins: driver-side pool-adjacent-violators over the
    bounded bin table. Oracle = the minimax closed form
    fit(i) = max_{j<=i} min_{k>=i} avg(y over bins j..k) — PAV's exact
    solution, replayed as a B³ grid join (B = 10)."""
    from temporalscope_spark.metrics.classification import fit_isotonic_bins

    sc = _scored_events(spark, sf_dir)
    model = fit_isotonic_bins(sc, "score", "y", bins=10)
    return spark.createDataFrame(
        list(zip(model["bin_ids"], model["values"])), "bin INT, fitted DOUBLE"
    )


def q_psi_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→serve PSI: fit the reference (edges + floored shares) on the
    pre-split slice of `events.value`, then score the post-split slice
    PER event_type with the fitted model as plan literals — one
    expression-only aggregation per group, no spine join (the streaming
    drift monitor runs these exact expressions per window)."""
    from temporalscope_spark.operators.drift import fit_psi_reference, psi_score

    events = _t(spark, sf_dir, "events")
    ref = fit_psi_reference(
        events.filter(F.col("ts") < _DRIFT_SPLIT), "value", bins=5
    )
    cur = events.filter(
        (F.col("ts") >= _DRIFT_SPLIT) & F.col("value").isNotNull()
    )
    return psi_score(cur, ref, group_cols=["event_type"])


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic of `events.value`
    across the same time split: per-distinct-value ref/cur counts, global
    running counts via the quantile-bucket two-phase cumulative (no
    single-partition window), max |ECDF gap|."""
    from temporalscope_spark.operators.drift import ks_drift

    events = _t(spark, sf_dir, "events")
    return ks_drift(events, "value", "ts", _DRIFT_SPLIT)


def q_scale_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-scale `events.value`: ONE 1-row aggregation fits
    (mean, sample stddev) — rounded to 6 so the model replays across
    engines — then the transform is a pure narrow projection with the
    statistics as plan literals (plan-tested exchange-free)."""
    from temporalscope_spark.operators.scaling import scale_features

    events = _t(spark, sf_dir, "events")
    return scale_features(events, ["value"]).select(
        "event_id", "value", "value_scaled"
    )


def q_scale_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-scale `events.value` by (median, IQR) — exact `percentile`
    fit (the oracle lane; `approx=True` swaps the constant-memory
    `percentile_approx` sketch for the 100 TB path), literal transform."""
    from temporalscope_spark.operators.scaling import scale_features

    events = _t(spark, sf_dir, "events")
    return scale_features(events, ["value"], method="robust").select(
        "event_id", "value", "value_scaled"
    )


def q_count_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-encode `events.event_type`: map-side-combined C-row
    count table broadcast back onto the corpus — the fat side never
    shuffles (plan-tested BroadcastHashJoin)."""
    from temporalscope_spark.operators.encoding import count_encode

    events = _t(spark, sf_dir, "events")
    return count_encode(events, "event_type", normalize=True).select(
        "event_id", "event_type", "event_type_freq"
    )


def q_one_hot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 one-hot of `events.event_type` with an `_other` bucket:
    rank-ordered column NAMES (stable regardless of data values,
    tie-break count desc / value asc), expression-only transform."""
    from temporalscope_spark.operators.encoding import one_hot_top_k

    events = _t(spark, sf_dir, "events")
    return one_hot_top_k(events, "event_type", k=3).select(
        "event_id",
        "event_type",
        "event_type_oh_1",
        "event_type_oh_2",
        "event_type_oh_3",
        "event_type_oh_other",
    )


def q_rare_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse `documents.lang` levels seen < 70 times into `__other__`
    — the bounded KEEP set broadcasts into a left join, tail levels fall
    through to the sentinel (keeps every downstream contingency table /
    encoder vocabulary bounded)."""
    from temporalscope_spark.operators.encoding import rare_collapse

    docs = _t(spark, sf_dir, "documents")
    return rare_collapse(docs, "lang", min_count=70).select(
        "doc_id", "lang", "lang_rc"
    )


def q_hash_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed (user bucket × event_type) interaction feature, 256
    buckets — the hashing-trick cross as a pure md5 expression (portable
    bucket map shared with DSIR; exact DuckDB twin), no vocabulary
    materialized, no shuffle."""
    from temporalscope_spark.operators.encoding import hash_cross

    events = _t(spark, sf_dir, "events").withColumn(
        "ubkt", (F.col("user_id") % 50).cast("long")
    )
    return hash_cross(events, ["ubkt", "event_type"], n_buckets=256).select(
        "event_id", "ubkt", "event_type", "cross_ubkt_event_type"
    )


def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form TF-IDF over `documents` (min_df=1, no max_df cap,
    sklearn smooth-idf + per-doc L2 norm): term/doc frequencies are
    map-side-combined aggregations, idf joins word-keyed, norms join
    id-keyed — no dense per-doc vectors anywhere."""
    from temporalscope_spark.operators.vectorize import tfidf_table

    docs = _t(spark, sf_dir, "documents")
    return tfidf_table(docs, "text", "doc_id", min_df=1, max_df_frac=1.0)


def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine document pairs via the inverted index: unit-norm
    TF-IDF rows self-join ON WORD (pairs only where vocabulary overlaps
    — never an all-pairs product), per-pair dots in one grouped
    aggregation; the max_df cap (0.3) bounds each word's pair fan-out."""
    from temporalscope_spark.operators.vectorize import tfidf_cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, "text", "doc_id", min_df=1, max_df_frac=0.3, min_sim=0.3
    )


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA of (value, props-length): ONE aggregation of cross-moments
    (1-row result at any data size), driver 2×2 eigh with deterministic
    orientation (largest-|entry| positive) and 6-decimal model rounding,
    then an expression-only literal projection. The oracle replays the
    2×2 eigenproblem in closed form (v1 ∝ [cov, λ1 − var_x]) — the
    p-dimensional lane is numpy-parity-tested in tests/test_pca.py."""
    from temporalscope_spark.operators.pca import fit_pca, pca_project

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.length("props").cast("double").alias("plen"),
    )
    model = fit_pca(events, ["value", "plen"], k=2)
    return pca_project(events, ["value", "plen"], k=2, model=model).select(
        "event_id", "pc_1", "pc_2"
    )


def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete calendar encodings of `events.ts` (ISO day-of-week,
    month-end via last_day so leap-February works) — pure narrow
    projection, folds into any scan reading the time column."""
    from temporalscope_spark.operators.tsfeatures import calendar_features

    events = _t(spark, sf_dir, "events").select("event_id", "ts")
    return calendar_features(events, "ts")


def q_scale_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of `events.value`: ONE map-side-combined
    groupBy(user) stats table equi-joined back (entity-scale G — never a
    broadcast assumption; salting-friendly key). Groups under 2 rows or
    with zero variance yield NULL."""
    from temporalscope_spark.operators.scaling import scale_by_group

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return scale_by_group(events, ["value"], "user_id")


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iglewicz–Hoaglin modified z-score + outlier flag on
    `events.value`: two 1-row exact-percentile fits (median, then MAD —
    `approx=True` = the sketch lane), literal transform."""
    from temporalscope_spark.operators.scaling import mad_outliers

    events = _t(spark, sf_dir, "events").select("event_id", "value")
    return mad_outliers(events, "value", threshold=3.5)


def q_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding of `events.event_type`
    against `value` (5 md5-hash folds): one groupBy(cat, fold)
    aggregation (≤ C·F rows) + per-cat fold, broadcast joined back —
    a row never sees its own label (the non-temporal twin of
    target_encode_expanding)."""
    from temporalscope_spark.operators.encoding import target_encode_oof

    events = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return target_encode_oof(
        events, "event_type", "value", "event_id", n_folds=5, smoothing=20.0
    ).select("event_id", "event_type", "event_type_te_fold", "event_type_te")


def q_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimpleImputer twin over `events.value` with every 10th value
    NULLed (the table ships complete, so the query plants the holes the
    oracle replays): ONE aggregation fits the mean, transform appends
    the informative `_was_null` indicator + the filled column —
    expression-only."""
    from temporalscope_spark.operators.impute import impute

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 10 != 0, F.col("value")).alias("v"),
    )
    return impute(events, ["v"], strategy="mean")


def q_moment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profile (n, mean, variance, Fisher–Pearson
    skewness, excess kurtosis, min, max) of two columns from RAW power
    sums in ONE map-side-combinable aggregation — built-in skew/kurt
    implementations disagree across engines, closed forms replay
    term-for-term."""
    from temporalscope_spark.operators.scaling import moment_profile

    events = _t(spark, sf_dir, "events").select(
        "value", F.length("props").cast("double").alias("plen")
    )
    return moment_profile(events, ["value", "plen"])


def q_ecdf_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-to-uniform (cume_dist) transform of `events.value` WITHOUT a
    global sort: distinct-value counts → quantile-bucket two-phase
    running sum (plans/rownum, no single-partition window at any size) →
    value-keyed join back. The oracle may use a plain ordered window —
    the engine may not."""
    from temporalscope_spark.operators.scaling import ecdf_feature

    events = _t(spark, sf_dir, "events").select("event_id", "value")
    return ecdf_feature(events, "value")


def q_polynomial_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-2 dense expansion (squares + pairwise products) of two
    numeric columns — pure narrow projection; the hashing-trick cross
    (`hash_cross`) is the vocabulary-scale alternative."""
    from temporalscope_spark.operators.scaling import polynomial_features

    events = _t(spark, sf_dir, "events").select(
        "event_id", "value", F.length("props").cast("double").alias("plen")
    )
    return polynomial_features(events, ["value", "plen"])


def q_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-distance featurization: every embedding becomes 8 dense
    cosine-to-centroid features (md5-seeded quantizer, refine_iters=0 so
    the oracle replays the seeds in SQL; Lloyd is unit-tested) —
    centroids ship as plan literals, expression-only, no join/UDF."""
    from temporalscope_spark.operators.similarity import (
        centroid_distance_features,
        ivf_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(
        emb, num_centroids=8, seed=42, refine_iters=0, seed_hash="md5"
    )
    return centroid_distance_features(emb, cents).select(
        "vec_id", *[f"cdist_{i}" for i in range(1, 9)]
    )


def q_recency_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-past recency gaps on `events`: seconds since the user's
    previous event and since their previous event of the SAME type —
    two lag() windows sharing the entity shuffle key (exchange-free on
    the bucketed layout); first events NULL, never 0."""
    from temporalscope_spark.operators.tsfeatures import recency_features

    events = _t(spark, sf_dir, "events")
    return recency_features(
        events, "ts", "user_id", type_col="event_type", tiebreak_col="event_id"
    ).select("event_id", "user_id", "event_type", "since_any", "since_same_type")


def q_entity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime descriptor table (n_events, first/last ts,
    tenure, active days, value stats) — ONE map-side-combinable
    groupBy(user) aggregation; the entity feature table an as-of join
    serves back onto streams."""
    from temporalscope_spark.operators.tsfeatures import entity_profile

    events = _t(spark, sf_dir, "events")
    return entity_profile(events, "user_id", "ts", "value")


def q_trend_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend (slope/hour, start-level intercept, r²)
    from ONE aggregation of OLS sufficient statistics; per-entity
    time re-zeroing (epoch² would overflow double precision) via a
    window min sharing the entity shuffle key — one exchange total."""
    from temporalscope_spark.operators.tsfeatures import trend_features

    events = _t(spark, sf_dir, "events")
    return trend_features(events, "value", "ts", "user_id")


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value table of `event_type`
    against the binary target (value > 30) — the scorecard encoder's
    C-row summary from ONE map-side-combined aggregation."""
    from temporalscope_spark.operators.encoding import woe_iv_table

    events = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("value") > 30).cast("double").alias("y")
    )
    return woe_iv_table(events, "event_type", "y")


def q_training_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-token-prediction example builder: ctx=3/stride=1 windows over
    the deterministic token arrays (lengths 1..5, so only length-4/5
    sequences emit — 1 or 2 windows each). Zero-shuffle map-only plan."""
    from temporalscope_spark.operators.packing import training_windows

    seqs = _synthetic_token_events(spark, sf_dir)
    out = training_windows(
        seqs.select("event_id", "tokens"), ctx_len=3, stride=1, id_col="event_id"
    )
    return out.select(
        "event_id",
        F.col("win_id").cast("long").alias("win_id"),
        F.array_join("context", ",").alias("context"),
        F.col("target").cast("long").alias("target"),
    )


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (k=2 md5 bit positions mod m=4096):
    the bounded-broadcast scale lane of `decontaminate` — removal is a
    superset of exact (false positives only drop extra rows), and the
    oracle replays the identical bit arithmetic."""
    from temporalscope_spark.operators.contamination import decontaminate_bloom

    seqs = _synthetic_token_events(spark, sf_dir)
    train = seqs.filter(F.col("user_id") % 7 != 0)
    ev = seqs.filter(F.col("user_id") % 7 == 0)
    clean = decontaminate_bloom(train, ev, n=3, k=2, m=4096, seed=7, id_col="event_id")
    return clean.select("event_id", "user_id")


def q_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 3 x width 256) point estimates for the
    exact top-10 words: (word, exact, CMS estimate >= exact). The sketch
    is d*w rows whatever the corpus size — the bounded-state frequency
    summary."""
    from temporalscope_spark.operators.corpus_stats import (
        countmin_estimate,
        countmin_sketch,
        heavy_hitters,
    )

    docs = _t(spark, sf_dir, "documents")
    sk = countmin_sketch(docs, "text", depth=3, width=256, seed=5)
    top = heavy_hitters(docs, "text", k=10)
    est = countmin_estimate(sk, top.select("word"), depth=3, width=256, seed=5)
    return top.join(est, "word").select(
        "word",
        F.col("n").cast("long").alias("n_exact"),
        F.col("est").cast("long").alias("n_est"),
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct sketch (Beyer et al. 2007): per-source
    trigram-shingle cardinality estimates from the 32 smallest md5
    hashes — bounded, mergeable state whatever the corpus size; exact
    below k, (k-1)/U_(k) above."""
    from temporalscope_spark.operators.corpus_stats import kmv_distinct

    docs = _t(spark, sf_dir, "documents")
    return kmv_distinct(docs, "text", "source", k=32, seed=7, ngram=3)


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from per-source KMV sketches:
    union cardinality + bottom-k Jaccard for every source pair, computed
    entirely from the bounded sketch table (the corpus is scanned once
    to sketch, never again for the G^2/2 pair estimates)."""
    from temporalscope_spark.operators.corpus_stats import (
        kmv_sketch,
        kmv_source_overlap,
    )

    docs = _t(spark, sf_dir, "documents")
    sk = kmv_sketch(docs, "text", "source", k=32, seed=7, ngram=3)
    return kmv_source_overlap(sk, "source", k=32)


_RANK_QUERY_WORDS = [
    "table", "row", "join", "scan", "fast", "slow", "key", "value",
]


def _ranking_runs(spark: SparkSession, sf_dir: str):
    """(runs_lennorm, runs_rawtf, qrels) over documents for the fixed
    8-word query set: score = tf/doc_len (length-normalized) vs raw tf;
    graded relevance = min(tf, 3). The two scores rank differently, so
    the metrics are non-vacuous."""
    from temporalscope_spark.operators.corpus_stats import _norm_words

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", _norm_words("text").alias("_w"))
    n = base.select("doc_id", F.size("_w").alias("_nw"))
    tf = (
        base.select("doc_id", F.explode("_w").alias("word"))
        .filter(F.col("word").isin(_RANK_QUERY_WORDS))
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    runs1 = tf.join(n, "doc_id").select(
        F.col("word").alias("query"),
        "doc_id",
        (F.col("_tf").cast("double") / F.col("_nw").cast("double")).alias("score"),
    )
    runs2 = tf.select(
        F.col("word").alias("query"),
        "doc_id",
        F.col("_tf").cast("double").alias("score"),
    )
    qrels = tf.select(
        F.col("word").alias("query"),
        "doc_id",
        F.least(F.col("_tf"), F.lit(3)).alias("rel"),
    )
    return runs1, runs2, qrels


def q_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 / MRR@10 / AP@10 per query: length-normalized tf runs
    evaluated against capped-tf graded qrels (TREC conventions,
    rank-ordered sorted folds for engine-exact float sums)."""
    from temporalscope_spark.metrics.ranking import ranking_eval

    runs1, _, qrels = _ranking_runs(spark, sf_dir)
    return ranking_eval(runs1, qrels, k=10)


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (c=60) of the length-normalized and raw-tf
    runs, top-5 per query — the calibration-free ranker merge, fold
    ordered by run name for float determinism."""
    from temporalscope_spark.metrics.ranking import rrf_fuse

    runs1, runs2, _ = _ranking_runs(spark, sf_dir)
    return rrf_fuse(
        {"len_norm": runs1, "raw_tf": runs2}, c=60, k=5
    )


def _bt_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic preference log over sources: each consecutive doc
    pair (doc_id, doc_id+1) with differing sources is one comparison;
    the longer doc's source wins (ties -> lexicographically smaller
    source) — 'which source produces longer documents' as Bradley-Terry
    data."""
    docs = _t(spark, sf_dir, "documents")
    from temporalscope_spark.operators.corpus_stats import _norm_words

    d = docs.select("doc_id", "source", F.size(_norm_words("text")).alias("nw"))
    x, y = d.alias("x"), d.alias("y")
    j = x.join(y, F.col("y.doc_id") == F.col("x.doc_id") + 1).filter(
        F.col("x.source") != F.col("y.source")
    )
    return j.select(
        F.when(F.col("x.nw") > F.col("y.nw"), F.col("x.source"))
        .when(F.col("y.nw") > F.col("x.nw"), F.col("y.source"))
        .otherwise(F.least("x.source", "y.source"))
        .alias("winner"),
        F.when(F.col("x.nw") > F.col("y.nw"), F.col("y.source"))
        .when(F.col("y.nw") > F.col("x.nw"), F.col("x.source"))
        .otherwise(F.greatest("x.source", "y.source"))
        .alias("loser"),
    )


def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated base form,
    p=0.9, k=10) between the length-normalized and raw-tf rankings —
    the qrel-free top-weighted ranker-agreement metric; shared-doc
    entry depths fold over the k depths per query."""
    from temporalscope_spark.metrics.ranking import rank_biased_overlap

    runs1, runs2, _ = _ranking_runs(spark, sf_dir)
    return rank_biased_overlap(runs1, runs2, p=0.9, k=10)


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths via 5 MM rounds (Hunter 2004) over the
    source-preference log: the log collapses ONCE to the bounded
    comparison matrix + win totals; each round is two broadcast joins +
    item-ordered folds on bounded tables, quantized 1e-12 — the oracle
    unrolls the same rounds as CTEs."""
    from temporalscope_spark.modeling.bt import fit_bradley_terry

    return fit_bradley_terry(_bt_pairs(spark, sf_dir), num_rounds=5)


def q_bt_win_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted pairwise win probabilities w_i/(w_i+w_j) from the
    fitted strengths — the predict side of the preference model, a
    broadcast self-join of the bounded strength table."""
    from temporalscope_spark.modeling.bt import (
        bt_win_probability,
        fit_bradley_terry,
    )

    s = fit_bradley_terry(_bt_pairs(spark, sf_dir), num_rounds=5)
    return bt_win_probability(s)


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS of ln(freq) on ln(rank) over the word-frequency
    spectrum (corpus-quality smell test): ranks from the two-phase
    global row number (no single-partition window), one aggregation of
    the five OLS sums, closed form on the 1-row result."""
    from temporalscope_spark.operators.corpus_stats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), "text")


def q_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KMV lane (the dedup-index pattern applied to
    cardinality): the corpus sketch (doc_id % 5 != 0) is MERGED with a
    batch sketch (doc_id % 5 == 0) group-by-group without rescanning
    either side — the oracle is the ONE-SHOT sketch over the union, so
    a values-match is the equivalence proof."""
    from temporalscope_spark.operators.corpus_stats import (
        kmv_estimates,
        kmv_merge,
        kmv_sketch,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    merged = kmv_merge(
        kmv_sketch(corpus, "text", "source", k=32, seed=7, ngram=3),
        kmv_sketch(batch, "text", "source", k=32, seed=7, ngram=3),
        "source",
        k=32,
    )
    return kmv_estimates(merged, "source", k=32)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog per-source distinct-trigram estimates (Flajolet et
    al. 2007): m = 2^8 max-rank registers on the md5 lane, rho from the
    EXACT integer identity length(bin(w)) — the sketch and the estimate
    replay bit-for-bit in DuckDB (the only floats are 2^-M sums, exact
    under 53 bits, and two single-op ln corrections)."""
    from temporalscope_spark.operators.corpus_stats import hll_distinct

    docs = _t(spark, sf_dir, "documents")
    return hll_distinct(docs, "text", "source", p=8, seed=7, ngram=3)


def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental HLL lane: the corpus register table (doc_id % 5 != 0)
    is merged with a batch's registers (doc_id % 5 == 0) by a bounded
    per-(source, bucket) max — neither side is rescanned, and max's
    associativity makes merge-of-sketches ≡ sketch-of-union EXACTLY.
    Oracle = the one-shot sketch over the full corpus (equivalence
    proof, same pattern as kmv_incremental / incremental_dedup)."""
    from temporalscope_spark.operators.corpus_stats import (
        hll_estimates,
        hll_merge,
        hll_sketch,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    merged = hll_merge(
        hll_sketch(corpus, "text", "source", p=8, seed=7, ngram=3),
        hll_sketch(batch, "text", "source", p=8, seed=7, ngram=3),
        "source",
    )
    return hll_estimates(merged, "source", p=8)


def q_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping word chunks (size 16, overlap 4) — the
    RAG / long-context segmentation layer. Pure posexplode over a
    per-row offset sequence: zero exchange, scan-speed at 100 TB; the
    n_chunks formula guarantees full coverage with no pure-overlap
    tail chunk."""
    from temporalscope_spark.operators.chunking import chunk_words

    docs = _t(spark, sf_dir, "documents")
    return chunk_words(docs, "text", "doc_id", size=16, overlap=4)


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document paragraph dedup (first occurrence kept, order
    preserved) — the in-page half of CCNet boilerplate removal, as a
    pure array expression with no explode and no shuffle. The corpus
    has no newlines, so paragraphs are PLANTED deterministically
    (head-words || text || head-words, identically in the oracle): the
    repeated head paragraph must collapse."""
    from temporalscope_spark.operators.chunking import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    head = F.array_join(F.slice(F.split(norm, " "), 1, 6), " ")
    planted = docs.select(
        "doc_id",
        F.concat_ws("\n", head, norm, head).alias("text"),
    )
    return dedup_paragraphs(planted, "text", "doc_id")


def q_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU (Papineni et al. 2002) of each document against a
    PLANTED paraphrase (every 5th word dropped — the deterministic
    rewrite done identically in the oracle). Row-local clipped-match
    counting: no gram explode, no join; the only exchange is the final
    one-row LONG-sum aggregate, so the doubles replay exactly."""
    from temporalscope_spark.metrics.translation import bleu_corpus

    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = F.split(norm, " ")
    ref = F.array_join(
        F.filter(w, lambda x, i: (i + 1) % 5 != 0), " "
    )
    pairs = docs.select(
        "doc_id",
        F.col("text").alias("candidate"),
        ref.alias("reference"),
    )
    return bleu_corpus(pairs, "candidate", "reference", max_n=4, engine="arrow")


def q_chrf_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chrF (Popović 2015) over the same planted
    every-5th-word-drop pairs as bleu_corpus, both sides capped at 200
    normalized chars (the clipped char-gram count is O(L²) per row —
    the cap bounds the per-row cost identically in both engines; the
    operator itself is uncapped). Row-local counting, one LONG-sum
    aggregate; β=2, orders 1..6."""
    from temporalscope_spark.metrics.translation import chrf_corpus

    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = F.split(norm, " ")
    ref = F.array_join(F.filter(w, lambda x, i: (i + 1) % 5 != 0), " ")
    pairs = docs.select(
        F.substring(norm, 1, 200).alias("candidate"),
        F.substring(ref, 1, 200).alias("reference"),
    )
    return chrf_corpus(pairs, "candidate", "reference", max_n=6, beta=2.0, engine="arrow")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document (Kincaid
    et al. 1975): vowel-run syllable heuristic, sentence-run count
    floored at 1 — three exact integer counts, two single-expression
    doubles, zero exchange."""
    from temporalscope_spark.operators.text import with_readability

    docs = _t(spark, sf_dir, "documents")
    return with_readability(docs, "text").select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        "flesch_ease", "fk_grade",
    )


def q_neardup_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (MinHash/LSH) decontamination: train docs near-duplicate to
    a PLANTED eval set (every 13th doc, normalized text minus its last
    character — a paraphrase-ish rewrite that defeats exact 13-gram
    matching but keeps char-shingle Jaccard ≈ 0.9). The oracle replays
    the FULL algorithm — 16 min-md5 signatures, 8 two-row bands, the
    candidate join, exact-Jaccard verification — so equality is
    structural, with no banding-recall assumption."""
    from temporalscope_spark.operators.contamination import (
        neardup_contaminated_ids,
    )
    from temporalscope_spark.operators.dedup import normalize_text

    docs = _t(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    ev = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10000000).alias("eval_id"),
        F.substring(norm, 1, F.length(norm) - 1).alias("text"),
    )
    return neardup_contaminated_ids(
        docs, ev, id_col="doc_id", text_col="text", eval_id_col="eval_id",
        num_hashes=16, bands=8, shingle_n=12, threshold=0.5, hash_fn="md5",
    )


def q_rouge_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ROUGE-1/2 (Lin 2004, micro-averaged) over the same
    planted every-5th-word-drop pairs as bleu_corpus — recall,
    precision and F1 from pooled LONG counts; zero exchange before the
    one-row aggregate."""
    from temporalscope_spark.metrics.translation import rouge_n_corpus

    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = F.split(norm, " ")
    ref = F.array_join(F.filter(w, lambda x, i: (i + 1) % 5 != 0), " ")
    pairs = docs.select(
        F.col("text").alias("candidate"), ref.alias("reference")
    )
    return rouge_n_corpus(pairs, "candidate", "reference", ns=(1, 2), engine="arrow")


def q_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair ROUGE-L: word-level LCS as a row-local nested fold (the
    DP row carried through ``aggregate``) — zero exchange. Reference =
    the doc with adjacent word pairs SWAPPED (a planted rewrite with a
    non-trivial LCS ≈ n/2, done identically in the oracle); every 13th
    doc to bound the O(n·m²) per-row fold cost."""
    from temporalscope_spark.metrics.translation import rouge_l_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = F.split(norm, " ")
    # 0-based i: even takes its right neighbor (if any), odd its left
    swapped = F.transform(
        w,
        lambda x, i: F.when(
            (i % 2 == 0) & (i + 2 <= F.size(w)), F.element_at(w, i + 2)
        )
        .when(i % 2 == 1, F.element_at(w, i))
        .otherwise(x),
    )
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.col("text").alias("candidate"),
        F.array_join(swapped, " ").alias("reference"),
    )
    return rouge_l_pairs(pairs, "candidate", "reference", id_cols=("pair_id",), engine="arrow")


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rates (token- and type-level) against the corpus
    top-25 word vocab — the coverage report that pairs with tokenizer
    fertility. Vocab side broadcasts; one fused aggregation on the
    group key."""
    from temporalscope_spark.operators.corpus_stats import (
        heavy_hitters,
        vocab_coverage,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = heavy_hitters(docs, "text", k=25).select("word")
    return vocab_coverage(docs, vocab, "text", "source")


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon word entropy (nats) — the information-
    theoretic repetitiveness scalar; word-ordered sorted fold makes the
    float sum engine-exact."""
    from temporalscope_spark.operators.lm import doc_entropy

    return doc_entropy(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus word distribution over
    the bounded top-1000 vocabulary — the source-drift diagnostic read
    before setting mixture weights."""
    from temporalscope_spark.operators.lm import source_divergence

    return source_divergence(
        _t(spark, sf_dir, "documents"), "text", "source", vocab_size=1000
    )


def q_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax waterfilling allocation (Chung et al. 2023): a 40k-token
    budget spread as uniformly as possible across sources with at most
    1.5 epochs per source — the α-free mixture successor to temperature
    sampling. One corpus-sized count; the closed-form waterline runs on
    the bounded C-row source table."""
    from temporalscope_spark.operators.sampling import unimax_allocation

    return unimax_allocation(
        _t(spark, sf_dir, "documents"),
        "text",
        "source",
        budget_tokens=40_000.0,
        max_epochs=1.5,
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split exact-duplicate leakage check (Lee et al. 2022 §6):
    the corpus is given planted duplicates (every 7th doc re-appears
    under a shifted id — a deterministic rewrite both engines express
    identically, since sf0.01 documents are duplicate-free), split by
    the portable md5 entity rule, and every fingerprint group spanning
    ≥ 2 splits is reported."""
    from temporalscope_spark.operators.cv import entity_split, split_leakage_check

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    corpus = docs.unionByName(dup)
    d = entity_split(corpus, "doc_id", 0.3, seed=11)
    return split_leakage_check(d, "split", "text", "doc_id")


def q_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size per source for a word-count importance
    weight — the health check for any weighted corpus (ESS << n means a
    few documents dominate). Integer weights make the two sums exact
    LONG-in-DOUBLE arithmetic, bit-identical cross-engine."""
    from temporalscope_spark.operators.corpus_stats import _norm_words
    from temporalscope_spark.operators.sampling import weight_diagnostics

    docs = _t(spark, sf_dir, "documents")
    d = docs.withColumn("w", F.size(_norm_words("text")))
    return weight_diagnostics(d, "w", "source")


def q_upsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling (the r > 1 half of temperature
    mixing): purchases x2.5 (2 copies + md5-selected half get a third
    epoch), clicks x1, everything else dropped."""
    from temporalscope_spark.operators.sampling import upsample_repeat

    events = _t(spark, sf_dir, "events")
    out = upsample_repeat(
        events,
        "event_type",
        {"purchase": 2.5, "click": 1.0},
        key_col="event_id",
        seed=3,
        default_factor=0.0,
        portable=True,
    )
    return out.select(
        "event_id", "user_id", "event_type", F.col("epoch").cast("int").alias("epoch")
    )


def q_mad_outliers_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP MAD robust z-score gate (Iglewicz & Hoaglin 1993) on
    event values per event type — the grouped sibling of the global
    `scaling.mad_outliers` (each event type gets its own median/MAD, a
    broadcast-joined C-row fit table instead of two 1-row literals).
    Median and MAD are rounded to 6 before the score (fit-then-literal),
    so the +-*-/ arithmetic after them is IEEE-exact in any engine."""
    from temporalscope_spark.operators.binning import mad_outliers_grouped

    events = _t(spark, sf_dir, "events")
    return mad_outliers_grouped(events, "value", "event_type").select(
        "event_id", "event_type", "value", "value_rz", "value_outlier"
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement: top-20
    docs per source by u^(1/n_chars) with the md5-portable uniform —
    longer docs proportionally likelier, selection engine-invariant."""
    from temporalscope_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(
        docs, "n_chars", 20, "doc_id", strata_col="source", seed=11, portable=True
    ).select("doc_id", "source", "wkey")


def q_doremi_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi domain-weight update (Xie et al. 2023) over deterministic
    planted proxy/reference losses (integer-derived doubles — exact in
    any engine); domain = source, eta=0.5, 10% uniform smoothing."""
    from temporalscope_spark.operators.sampling import doremi_round

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ((F.col("doc_id") % 17).cast("double") / F.lit(10.0)).alias("loss"),
        ((F.col("doc_id") % 13).cast("double") / F.lit(10.0)).alias("ref"),
    )
    return doremi_round(docs, "source", "loss", "ref", eta=0.5, smoothing=0.1)


def q_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCMatrix-style margin mining (Artetxe & Schwenk 2019): candidate
    pairs from the exact triangular block-GEMM at cosine>=0.2, each side's
    kNN average (k=4) from the same candidate set, margin = cos / mean of
    the two neighborhood averages. Threshold 1.05 sits in a 6.6e-4 gap of
    the sf0.01 margin distribution (far above GEMM-vs-fold summation
    noise), keeping 212 of 6,940 candidates."""
    from temporalscope_spark.operators.similarity import margin_mining

    emb = _t(spark, sf_dir, "embeddings")
    return margin_mining(
        emb, knn_k=4, margin_threshold=1.05, candidate_threshold=0.2, method="gemm"
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (Carbonell & Goldstein 1998): queries = vecs
    0 and 1, candidates = each query's top-15 exact-cosine hits among
    vec_id >= 10 (rel rounded 6), k=5 at lambda=0.7. The oracle unrolls
    the same 5 greedy rounds as a CTE chain (the BPE-loop convention)."""
    from temporalscope_spark.operators.similarity import cosine_similarity, mmr_rerank
    from pyspark.sql.window import Window

    emb = _t(spark, sf_dir, "embeddings")
    qs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(0, 1)).collect()
    }
    branches = []
    for qid in sorted(qs):
        qlit = F.array(*[F.lit(x) for x in qs[qid]])
        branches.append(
            emb.filter(F.col("vec_id") >= 10).select(
                F.lit(qid).alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                F.col("embedding"),
                cosine_similarity(F.col("embedding"), qlit).alias("_cos"),
            )
        )
    cand = branches[0].unionByName(branches[1])
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("doc_id"))
    cand = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 15)
        .select(
            "query_id", "doc_id", "embedding",
            (F.round("_cos", 6) + F.lit(0.0)).alias("score"),
        )
    )
    return mmr_rerank(cand, k=5, lam=0.7)


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAUVE-style embedding drift (Pillutla et al. 2021 reduced to its
    quantized-histogram core): even vs odd vec_ids assigned to the shared
    md5-seeded 8-cell quantizer, per-cell shares + JS divergence (log2,
    Laplace 0.5). The JS total is a sorted fold over the bounded cell
    table — engine-exact."""
    from temporalscope_spark.operators.drift import embedding_drift
    from temporalscope_spark.operators.similarity import ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(
        emb, num_centroids=8, seed=42, refine_iters=0, seed_hash="md5"
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_drift(ref, cur, cents)


def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-2 diversity per source (Li et al. 2016): distinct word
    bigrams over total bigram occurrences — the generation-diversity /
    template-collapse report."""
    from temporalscope_spark.operators.corpus_stats import distinct_ngram_ratio

    docs = _t(spark, sf_dir, "documents")
    return distinct_ngram_ratio(docs, n=2, group_col="source")


def q_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering with keep-BEST-quality survivors (canonical =
    the component member with max (n_chars, id)) — the production dedup
    policy, vs `dedup_clusters`' keep-first. Same pair generation."""
    from temporalscope_spark.operators.dedup import (
        dedup_cluster_survivors,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=12, threshold=0.2, max_shingle_df=100
    )
    out = dedup_cluster_survivors(
        docs, pairs, "doc_id", keep="score", score_col="n_chars"
    )
    return out.select("doc_id", "canonical_id")


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (sortish batching) over the
    synthetic token sequences, reported as per-batch padding stats —
    the global order comes from the two-phase row number (no global
    sort), ties broken by event_id."""
    from temporalscope_spark.operators.packing import (
        batch_padding_stats,
        length_bucket_batches,
    )

    seqs = _synthetic_token_events(spark, sf_dir).select(
        "event_id", F.size("tokens").cast("long").alias("n_tok")
    )
    batched = length_bucket_batches(seqs, "n_tok", 64, id_col="event_id")
    return batch_padding_stats(batched, "n_tok")


def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction (Rafailov et al. 2023) treating
    each user's events as scored candidate responses: chosen/rejected =
    max/min of struct(reward, id) per prompt (partition-invariant tie
    rule), pairs kept only above a 0.05 reward margin."""
    from temporalscope_spark.operators.preference import dpo_pairs

    events = _t(spark, sf_dir, "events")
    return dpo_pairs(events, "user_id", "event_id", "value", min_margin=0.05)


def q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype pruning (Sorscher et al. 2022): md5-seeded IVF
    quantizer (the semdedup/ivf_topk quantizer, refine_iters=0), score =
    cosine to own centroid rounded 6, keep the hardest 70% of each cell
    (exact per-cell rank lane; same float-boundary fragility class as
    ivf_topk)."""
    from temporalscope_spark.operators.similarity import ivf_centroids, prototype_prune

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(
        emb, num_centroids=8, seed=42, refine_iters=0, seed_hash="md5"
    )
    return prototype_prune(emb, cents, keep_frac=0.7)


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet line-level dedup (Wenzek et al. 2020): the documents table is
    given a line structure by breaking each word pair onto its own line (a
    deterministic rewrite both engines express identically), then lines
    duplicated corpus-wide collapse to their first (doc, position)
    occurrence. The two-word-line corpus is heavily duplicated by
    construction (~30-word vocabulary), so the pass is non-vacuous."""
    from temporalscope_spark.operators.dedup import dedup_lines

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.regexp_replace(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
            r"(\S+ \S+) ",
            "$1\n",
        ).alias("text"),
    )
    return dedup_lines(lined, "text", "doc_id", sep="\n", min_count=2)


def q_dedup_lines_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-resident incremental line dedup: even doc_ids are the landed
    CORPUS (reduced to its line index — counts + first occurrences), odd
    doc_ids are the NEW batch deduped against that index without touching
    the corpus text. The oracle runs the ONE-SHOT pass over the full union
    and keeps the batch rows — the equivalence proof, the same shape the
    incremental_dedup capstone uses."""
    from temporalscope_spark.operators.dedup import (
        dedup_lines_incremental,
        line_index,
    )

    lined = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
            r"(\S+ \S+) ",
            "$1\n",
        ).alias("text"),
    )
    corpus = lined.filter(F.col("doc_id") % 2 == 0)
    batch = lined.filter(F.col("doc_id") % 2 == 1)
    idx = line_index(corpus, "text", "doc_id", "\n")
    return dedup_lines_incremental(batch, idx, "text", "doc_id", sep="\n", min_count=2)


def _doc_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic md5-derived link graph shared by the pagerank /
    hits / label-propagation queries: 3 out-links per doc, targets =
    md5(doc, k) mod N."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    k = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k")
    return docs.select(F.col("doc_id").alias("src"), k).select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f", F.col("src").cast("string"), F.col("k").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(n)
        ).alias("dst"),
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the shared md5 link graph — 4 rounds of in-neighbor
    majority vote with (count DESC, label ASC) ties; oracle unrolls the
    same rounds as CTEs."""
    from temporalscope_spark.operators.graph import label_propagation

    edges = _doc_link_edges(spark, sf_dir)
    out = label_propagation(edges, iters=4)
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("label"),
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the (source, lang)
    quasi-identifier pair at k=30 — one aggregation; non-vacuous at both
    SFs (79 violating groups at sf0.01, 6 at sf0.1)."""
    from temporalscope_spark.operators.pii import k_anonymity

    docs = _t(spark, sf_dir, "documents")
    return k_anonymity(docs, ["source", "lang"], k=30)


# planted typographic mess, shared verbatim with the oracle (explicit
# escapes — editors/heredocs silently mangle raw zero-width characters)
_DIRTY_PREFIX = "\u201cquoted\u201d\u00a0\u2014 "
_DIRTY_SUFFIX = "\u2026\u200bdone"


def q_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level unicode cleanup (smart quotes/dashes → ASCII,
    zero-width/control strip, ellipsis expansion, space folding) over
    documents with PLANTED typographic mess — the pre-tokenizer
    normalization pass. Expression-only; every regex stays in the
    Java∩RE2 dialect so the oracle runs the same pattern strings."""
    from temporalscope_spark.operators.text import normalize_unicode

    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit(_DIRTY_PREFIX),
        F.substring(F.col("text"), 1, 120),
        F.lit(_DIRTY_SUFFIX),
    )
    return normalize_unicode(
        docs.select("doc_id", dirty.alias("text")), "text"
    ).select("doc_id", "clean_text", "changed")


def _pq_books(spark: SparkSession, sf_dir: str):
    from temporalscope_spark.operators.pq import pq_codebooks

    emb = _t(spark, sf_dir, "embeddings")
    return emb, pq_codebooks(
        emb, dim=64, m=4, ksub=8, seed=42, refine_iters=0, seed_hash="md5"
    )


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011): md5-seeded
    codebooks (refine_iters=0 keeps the seeds SQL-expressible — Lloyd
    refinement is pinned by test_pq.py), expression-only per-subspace
    argmin. 64-dim float vectors compress to 4 bytes. The oracle
    re-derives the same seed rows and replays every squared-L2 argmin;
    same float-tie fragility class as the IVF/SRP replays."""
    from temporalscope_spark.operators.pq import pq_encode

    emb, books = _pq_books(spark, sf_dir)
    out = pq_encode(emb, books)
    return out.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda x: x.cast("string")), ","
        ).alias("codes"),
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 for vec_id 0's vector over the PQ codes: the m×ksub
    LUT enters the plan as literals, each row costs m array lookups —
    the decode-free scan that makes PQ the 100-TB ANN storage format.
    (adc, vec_id) tiebreak keeps the cut deterministic."""
    from temporalscope_spark.operators.pq import pq_encode, pq_topk

    emb, books = _pq_books(spark, sf_dir)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    coded = pq_encode(emb, books)
    out = pq_topk(coded, qvec, books, k=10)
    return out.select("vec_id", (F.round("adc", 6) + F.lit(0.0)).alias("adc"))


def q_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (the production RAG shape): BM25 lexical
    recall (top-20 over the postings math, stage 1) → embedding cosine
    re-rank against the query vector (stage 2, top-10). Candidate doc
    embeddings come from the deterministic doc_id % |vectors| mapping
    (the tables are independently sized); ordering is (rounded cosine
    DESC, doc_id) so the cut replays cross-engine. Stage 2 touches only
    the k candidates — re-ranking cost is query-sized, never
    corpus-sized."""
    from temporalscope_spark.operators.similarity import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    nv = emb.count()
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    bm = q_bm25_topk(spark, sf_dir)
    cand = bm.join(
        emb.select("vec_id", "embedding"),
        (F.col("doc_id") % F.lit(int(nv))) == F.col("vec_id"),
    )
    qlit = F.array(*[F.lit(x) for x in qvec])
    return (
        cand.select(
            "doc_id",
            "score",
            (F.round(cosine_similarity(F.col("embedding"), qlit), 6) + F.lit(0.0)).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id"))
        .limit(10)
    )


def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal,
    k=5, md5-seeded): the diversity-first data-pruning selection. Each
    round is one narrow map + a 1-row argmax on the ROUNDED min
    distance (ties → smaller id — engine-stable); the oracle unrolls
    the same rounds as CTEs."""
    from temporalscope_spark.operators.coreset import kcenter_select

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_select(emb, k=5, seed=42, seed_hash="md5")


def q_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen: fraction of each vector's 10 cosine-nearest
    neighbors sharing its label (deep-k-NN heuristic). Exact pairs via
    the triangular block-GEMM lane; neighbors ranked by ROUNDED cosine
    (rank_decimals=6) so the oracle's ranking is robust to last-ulp
    summation differences — the tie then breaks on neighbor id in both
    engines."""
    from temporalscope_spark.operators.similarity import knn_label_agreement

    emb = _t(spark, sf_dir, "embeddings")
    return knn_label_agreement(emb, k=10, rank_decimals=6).withColumnRenamed(
        "id", "vec_id"
    )


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + clustering coefficient over the shared
    md5 link graph — the local-closure signal that separates organic
    neighborhoods from link farms. Degree-ordered edge iterator
    (O(m^1.5) wedges); the oracle counts the same triangles by the
    canonical three-way join."""
    from temporalscope_spark.operators.graph import triangle_counts

    return triangle_counts(_doc_link_edges(spark, sf_dir))


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc type-token ratio, hapax ratio and Yule's K — vocabulary-
    richness screens for boilerplate/gibberish. Row-local array folds,
    zero exchange; exact integer counts with single-division doubles."""
    from temporalscope_spark.operators.text import lexical_diversity

    return lexical_diversity(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _ivfpq_parts(spark: SparkSession, sf_dir: str):
    from temporalscope_spark.operators.pq import ivfpq_train

    emb = _t(spark, sf_dir, "embeddings")
    cells, books = ivfpq_train(
        emb, dim=64, num_cells=8, m=4, ksub=8, seed=42, seed_hash="md5"
    )
    return emb, cells, books


def q_ivfpq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite codes (Jégou et al. 2011 §IV, IVFADC): md5-seeded
    coarse cells (seed 42) + residual PQ codebooks (seed 43), nearest-cell
    assignment, residual, per-subspace argmin — all expression-only. The
    oracle replays every stage (cells → assignment → residuals → seed
    codebooks → argmin) in SQL; same last-ulp argmin fragility class as
    the other vector replays."""
    from temporalscope_spark.operators.pq import ivfpq_encode

    emb, cells, books = _ivfpq_parts(spark, sf_dir)
    out = ivfpq_encode(emb, cells, books)
    return out.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.array_join(
            F.transform("codes", lambda x: x.cast("string")), ","
        ).alias("codes"),
    )


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search for vec_id 0: probe the 4 nearest cells, score rows
    by the cell-specific residual LUT (nprobe × m × ksub plan literals),
    (adc, vec_id) deterministic cut. At scale the code table is
    partitioned by cell, so the probe is partition pruning."""
    from temporalscope_spark.operators.pq import ivfpq_encode, ivfpq_topk

    emb, cells, books = _ivfpq_parts(spark, sf_dir)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    coded = ivfpq_encode(emb, cells, books)
    out = ivfpq_topk(coded, qvec, cells, books, k=10, nprobe=4)
    return out.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        (F.round("adc", 6) + F.lit(0.0)).alias("adc"),
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, value) at 8 bits
    per dimension — the multi-column layout key a 100-TB table is
    range-partitioned on so file min/max statistics prune on EITHER
    column (Delta OPTIMIZE ZORDER / Iceberg rewrite semantics).
    Expression-only bit interleave above one fused min/max aggregation;
    NULL value rows keep a NULL key (the nulls bucket). The oracle
    replays the same affine scaling and bit positions; every double op
    has identical operand order, so floor() replays bit-for-bit."""
    from temporalscope_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    return zorder_key(ev, ["user_id", "value"], bits=8).select(
        "event_id", "zkey"
    )


def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity join (ED-Join prefix filter + banded
    levenshtein verify) at d=2, q=3 over 40-char normalized doc
    prefixes, with PLANTED typo twins (every 7th doc gets a copy with
    one character substituted, id + 10M). Candidate generation is
    COMPLETE for the threshold (see operators/edjoin.py), so the
    output equals the brute-force join; the oracle replays the same
    (gram, occurrence) prefix pipeline — DuckDB's levenshtein and
    Spark's agree on the standard definition."""
    from temporalscope_spark.operators.edjoin import edit_distance_pairs
    from temporalscope_spark.operators.dedup import normalize_text

    docs = _t(spark, sf_dir, "documents")
    s = F.substring(normalize_text(F.col("text")), 1, 40)
    base = docs.select(F.col("doc_id").alias("id"), s.alias("text"))
    twins = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000000).alias("id"),
        F.concat(
            F.substring(s, 1, 6), F.lit("z"), F.substring(s, 8, 33)
        ).alias("text"),
    )
    return edit_distance_pairs(
        base.unionByName(twins), "id", "text", max_dist=2, q=3
    )


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) over the
    (source, lang, length-bucket) quasi tuple with a deterministic
    derived sensitive category (n_chars % 7 — a stand-in for the
    sensitive column a real metadata table would carry) at l=5. One
    aggregation with a partial-distinct count; non-vacuous at both SFs
    (216 violating classes at sf0.01, 32 at sf0.1)."""
    from temporalscope_spark.operators.pii import l_diversity

    docs = _t(spark, sf_dir, "documents").select(
        "source", "lang",
        (F.col("n_chars") / F.lit(200)).cast("long").alias("len_bucket"),
        (F.col("n_chars") % 7).cast("int").alias("sensitive"),
    )
    return l_diversity(docs, ["source", "lang", "len_bucket"], "sensitive", l=5)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over a deterministic md5-derived link graph on the
    documents table (3 out-links per doc, targets = md5(doc, k) mod N) —
    the link-graph quality prior a web-curation pipeline consumes
    (CommonCrawl publishes exactly this ranking). 5 synchronous power
    rounds; the oracle unrolls the same rounds as CTEs."""
    from temporalscope_spark.operators.graph import pagerank

    out = pagerank(_doc_link_edges(spark, sf_dir), iters=5)
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        (F.round("rank", 9) + F.lit(0.0)).alias("rank"),
    )


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the same md5 link
    graph as q_pagerank: 4 synchronous rounds of the a/h mutual update,
    L1-normalized and 1e-12-quantized per half-round with
    endpoint-ordered folds — the oracle unrolls identical rounds."""
    from temporalscope_spark.operators.graph import hits

    out = hits(_doc_link_edges(spark, sf_dir), iters=4)
    return out.select(
        F.col("id").alias("doc_id"),
        (F.round("hub", 6) + F.lit(0.0)).alias("hub"),
        (F.round("authority", 6) + F.lit(0.0)).alias("authority"),
    )


def _hits_round_ctes(i: int) -> str:
    """One unrolled HITS round: per-dst fold of hub scores -> L1
    normalize + quantize -> per-src fold of authority scores -> same."""
    return f"""ac{i} AS (
                SELECT e.dst AS id,
                       list_reduce(list_prepend(0.0, list(hh.h ORDER BY e.src)),
                                   (x, y) -> x + y) AS a
                FROM e JOIN h{i - 1} hh ON e.src = hh.id GROUP BY e.dst
            ),
            ar{i} AS (
                SELECT n.id, coalesce(ac.a, 0.0) AS a
                FROM nodes n LEFT JOIN ac{i} ac USING (id)
            ),
            at{i} AS (
                SELECT list_reduce(list_prepend(0.0, list(a ORDER BY id)),
                                   (x, y) -> x + y) AS tot
                FROM ar{i}
            ),
            a{i} AS MATERIALIZED (
                SELECT id, round(a / at{i}.tot, 12) AS a FROM ar{i}, at{i}
            ),
            hc{i} AS (
                SELECT e.src AS id,
                       list_reduce(list_prepend(0.0, list(aa.a ORDER BY e.dst)),
                                   (x, y) -> x + y) AS h
                FROM e JOIN a{i} aa ON e.dst = aa.id GROUP BY e.src
            ),
            hr{i} AS (
                SELECT n.id, coalesce(hc.h, 0.0) AS h
                FROM nodes n LEFT JOIN hc{i} hc USING (id)
            ),
            ht{i} AS (
                SELECT list_reduce(list_prepend(0.0, list(h ORDER BY id)),
                                   (x, y) -> x + y) AS tot
                FROM hr{i}
            ),
            h{i} AS MATERIALIZED (
                SELECT id, round(h / ht{i}.tot, 12) AS h FROM hr{i}, ht{i}
            )"""


def _hits_oracle(iters: int) -> str:
    return f"""
        WITH e AS (
            SELECT d.doc_id AS src,
                   CAST('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR) || chr(31)
                            || CAST(t.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % (SELECT count(*) FROM documents) AS dst
            FROM documents d, UNNEST([0, 1, 2]) AS t(k)
        ),
        nodes AS (
            SELECT src AS id FROM e UNION SELECT dst FROM e
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        h0 AS (SELECT id, 1.0 / nn.n AS h FROM nodes CROSS JOIN nn),
        {', '.join(_hits_round_ctes(i) for i in range(1, iters + 1))}
        SELECT h.id AS doc_id, round(h.h, 6) + 0.0 AS hub,
               round(a.a, 6) + 0.0 AS authority
        FROM h{iters} h JOIN a{iters} a USING (id)
    """


def _pagerank_oracle(iters: int, damping: float = 0.85) -> str:
    """Unrolled power-iteration CTE chain replaying q_pagerank: same
    md5-mod edges, same dangling-free update (every node has out-degree 3
    by construction, so the dangling term is identically zero here — the
    unit suite covers the dangling branch)."""
    rounds = []
    for i in range(iters):
        rounds.append(f"""
            r{i + 1} AS (
                SELECT n.src AS id,
                       (CAST(1 AS DOUBLE) - CAST({damping} AS DOUBLE)) / nn.n
                       + CAST({damping} AS DOUBLE) * coalesce(c.s, 0.0) AS r
                FROM (SELECT DISTINCT src FROM e) n
                CROSS JOIN nn
                LEFT JOIN (
                    SELECT e.dst AS id, sum(r{i}.r / 3.0) AS s
                    FROM e JOIN r{i} ON e.src = r{i}.id
                    GROUP BY e.dst
                ) c ON c.id = n.src
            )""")
    return f"""
        WITH e AS (
            SELECT d.doc_id AS src,
                   CAST('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR) || chr(31)
                            || CAST(t.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % (SELECT count(*) FROM documents) AS dst
            FROM documents d, UNNEST([0, 1, 2]) AS t(k)
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        r0 AS (
            SELECT DISTINCT src AS id, 1.0 / nn.n AS r FROM e CROSS JOIN nn
        ),{",".join(rounds)}
        SELECT id AS doc_id, round(r, 9) + 0.0 AS rank FROM r{iters}
    """


def _shingle_cte(n: int) -> str:
    return f"""
        shingles AS (
            SELECT DISTINCT doc_id,
                   substr(norm, CAST(i AS INT), {n}) AS sh
            FROM (SELECT doc_id, {_NORM} AS norm FROM documents),
                 UNNEST(generate_series(1, greatest(length(norm) - {n - 1}, 1))) AS t(i)
        )
    """



# --------------------------------------------------------------------------
# privacy trio completion: t-closeness (Li, Li & Venkatasubramanian 2007)
# --------------------------------------------------------------------------


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over a planted skew: buckets 0-2 of doc_id%20
    carry a 'leaky' sensitive value (global mass 0.15), so their TVD to
    the global lang distribution is ~0.85 while honest buckets sit near
    0.13 - at t=0.3 exactly the three planted buckets violate at any SF.
    Integer-exact EMD (see operators/pii.py:t_closeness)."""
    from temporalscope_spark.operators.pii import t_closeness

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = docs.select(
        (d % 20).alias("bucket"),
        F.when(d % 20 < 3, F.lit("leaky")).otherwise(F.col("lang")).alias("sens"),
    )
    return t_closeness(base, ["bucket"], "sens", t=0.3)


def q_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded confusion report + Brier over the deterministic
    (score, label) pair shared with auc_roc - ONE aggregation, all eight
    scalars from five exact integer sums (Brier via the 0.01-lattice
    integer numerator)."""
    from temporalscope_spark.metrics.classification import classification_report

    return classification_report(_scored_events(spark, sf_dir), "score", "y")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the shared md5 link graph by 4 bounded peel rounds
    (Seidman 1983): iterative degree-filter over the surviving
    undirected simple graph; oracle unrolls the same rounds."""
    from temporalscope_spark.operators.graph import kcore

    return kcore(_doc_link_edges(spark, sf_dir), k=3, max_rounds=4)


# --------------------------------------------------------------------------
# URL / domain curation family (C4 / RefinedWeb-style web-corpus keys)
# --------------------------------------------------------------------------

_URL_TRACK_TAIL = "&utm_source=feed&x=1&gclid=zz&UTM_campaign=c"


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy-URL synthesis over documents: branch coverage
    for scheme case, two-level country suffixes, default/explicit ports,
    empty paths, tracking params (incl. an UPPERCASE utm key) and
    fragments - the construction is replayed verbatim by the oracle."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    suffix = (
        F.when(d % 4 == 0, F.lit(".Example.CO.UK"))
        .when(d % 4 == 1, F.lit(".example.com"))
        .when(d % 4 == 2, F.lit(".news.example.COM.AU"))
        .otherwise(F.lit(".blog.example.org"))
    )
    port = (
        F.when(d % 3 == 0, F.lit(":443"))
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 5 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/"), F.col("lang"), F.lit("/page/"), d.cast("string"))
    )
    frag = F.when(d % 7 == 0, F.lit("#frag")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://WWW."), F.col("source"), suffix, port, path,
        F.lit("?id="), d.cast("string"), F.lit(_URL_TRACK_TAIL), frag,
    )
    return docs.select("doc_id", url.alias("url"))


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for URL-level dedup (C4/RefinedWeb): parse,
    lowercase scheme+host, strip default ports / fragments / tracking
    params (order-preserving), default empty paths, and attach the
    registered domain (bounded-PSL regex). Expression-only - one
    projection over the corpus."""
    from temporalscope_spark.operators.urls import (
        normalize_urls,
        parse_urls,
        registered_domain,
    )

    u = _messy_urls(spark, sf_dir)
    out = registered_domain(parse_urls(normalize_urls(u, "url"), "url"), "host")
    return out.select("doc_id", "url_norm", "host", "domain")


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (Gopher/RefinedWeb domain capping): keep
    40 docs per synthesized domain by deterministic md5 rank - ONE
    window partitioned by domain (WindowGroupLimit), no global sort."""
    from temporalscope_spark.operators.urls import domain_caps

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    dom = F.concat(
        F.col("source"),
        F.when(d % 3 == 0, F.lit(".co.uk"))
        .when(d % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org")),
    )
    base = docs.select("doc_id", dom.alias("domain"))
    out = domain_caps(base, "domain", cap=40, keep_rank=True)
    return out.select("doc_id", "domain", "cap_rank")


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus profile (count, share, size totals) - the table
    a curation run reads to pick its cap; ONE aggregation + 1-row total."""
    from temporalscope_spark.operators.urls import domain_stats

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    dom = F.concat(
        F.col("source"),
        F.when(d % 3 == 0, F.lit(".co.uk"))
        .when(d % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org")),
    )
    base = docs.select("doc_id", dom.alias("domain"), "n_chars")
    out = domain_stats(base, "domain", size_col="n_chars")
    return out.select("domain", "n_docs", "total_size", "share", "mean_size")


# planted mojibake sample (explicit escapes - editors mangle raw C1 bytes):
# e-acute words, smart-quoted span, em dash, apostrophe, ellipsis, nbsp -
# every entry class of MOJIBAKE_MAP fires at least once per row
_MOJI_SAMPLE = (
    "\u00c3\u00a9t\u00c3\u00a9 \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d "
    "\u00e2\u20ac\u201d don\u00e2\u20ac\u2122t\u00e2\u20ac\u00a6\u00c2\u00a0 "
)


def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (ftfy's UTF-8-as-cp1252 case) over documents with
    a PLANTED corrupted prefix - a fixed exact-string replace chain, no
    regex, one codegen projection; the oracle replays the same chain."""
    from temporalscope_spark.operators.text import fix_mojibake

    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(F.lit(_MOJI_SAMPLE), F.substring(F.col("text"), 1, 80))
    out = fix_mojibake(docs.select("doc_id", dirty.alias("text")), "text")
    return out.select("doc_id", "fixed_text", "changed")


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve over events: per user, duration = seconds
    from first event to first 'purchase' (event) or to last observed
    event (right-censored), in two odd/even-user cohorts - ONE corpus
    aggregation to the bounded distinct-duration table, then
    cohort-partitioned windows (no single-partition window)."""
    from temporalscope_spark.operators.survival import kaplan_meier

    out = kaplan_meier(
        _km_durations(spark, sf_dir), "dur", "ev", group_col="cohort"
    )
    return out.select(
        F.col("group").alias("cohort"),
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        "survival",
        "se",
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix over events: cohort = period of the
    user's first event on a fixed 86400s grid (engine-portable, no
    calendar-week convention), ONE entity-keyed window min + distinct +
    ONE groupBy; the denominator is a window over the bounded
    (cohort, age) table."""
    from temporalscope_spark.operators.lifecycle import cohort_retention

    events = _t(spark, sf_dir, "events")
    return cohort_retention(events, "ts", "user_id", period_seconds=86400)


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup->view->click->purchase funnel: per-user per-step
    sorted timestamp arrays from ONE entity aggregation, a narrow
    earliest-qualifying chain fold, and a 1-row summary exploded to step
    rows (the only ordered window runs over the 4-row step table)."""
    from temporalscope_spark.operators.lifecycle import funnel_conversion

    events = _t(spark, sf_dir, "events")
    return funnel_conversion(
        events, "ts", "user_id", "event_type",
        ["signup", "view", "click", "purchase"],
    )


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rules over documents (basket = doc, items = its
    distinct normalized words): Apriori item prune BEFORE the basket
    self-join, pair counts map-side-combinable, C-row item counts join
    back broadcast."""
    from temporalscope_spark.operators.basket import association_rules
    from temporalscope_spark.operators.corpus_stats import _norm_words

    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id"), F.explode(_norm_words("text")).alias("word")
    ).filter(F.col("word") != "")
    return association_rules(pairs, "doc_id", "word", min_support=0.4)


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's
    (ts, event_id)-ordered event stream: one entity-keyed lead window +
    ONE groupBy; row normalization over the bounded C-squared table."""
    from temporalscope_spark.operators.basket import transition_matrix

    events = _t(spark, sf_dir, "events")
    return transition_matrix(
        events, "ts", "user_id", "event_type", tiebreak_col="event_id"
    )


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM mean-shift locator over events.value: mean + running
    sum share ONE entity window; the argmax-by-(rounded |C|, earliest t)
    and the moment stats are ONE grouped fold."""
    from temporalscope_spark.operators.drift import cusum_changepoint

    events = _t(spark, sf_dir, "events")
    return cusum_changepoint(
        events, "ts", "value", "user_id", tiebreak_col="event_id"
    )


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of document sizes per source: distinct-value
    counts, the ties-aware sorted-rank identity over a source-partitioned
    cumulative window, one grouped fold."""
    from temporalscope_spark.operators.corpus_stats import gini_concentration

    docs = _t(spark, sf_dir, "documents")
    out = gini_concentration(docs, "n_chars", group_col="source")
    return out.select(
        F.col("group").alias("source"), "n", "total", "gini"
    )


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of events.value vs Benford's
    law with per-digit chi-square contributions: one 9-key aggregation +
    a literal digit spine (digits with zero hits still appear)."""
    from temporalscope_spark.operators.corpus_stats import benford_digits

    events = _t(spark, sf_dir, "events")
    return benford_digits(events, "value")


def q_attribution_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchases to view/click touches within a
    1-day lookback: deterministic per-(user, t) touch reduction, then the
    entity-keyed as-of union window (operators/asof.py) - no range
    explosion, unattributed conversions kept as NULL rows."""
    from temporalscope_spark.operators.attribution import attribution

    events = _t(spark, sf_dir, "events")
    return attribution(
        events, "ts", "user_id", "event_type",
        ["purchase"], ["view", "click"],
        tiebreak_col="event_id", window_seconds=86400.0, model="last",
    )


def q_attribution_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution (3-day window): the earliest touch in
    [t_conv - W, t_conv] is the FORWARD as-of match of the shifted time
    t_conv - W with tolerance W - same union-window machinery."""
    from temporalscope_spark.operators.attribution import attribution

    events = _t(spark, sf_dir, "events")
    return attribution(
        events, "ts", "user_id", "event_type",
        ["purchase"], ["view", "click"],
        tiebreak_col="event_id", window_seconds=259200.0, model="first",
    )


def q_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM block over events: ONE entity aggregation, ONE fused
    1-row exact-quantile edge fit (rounded-6 plan literals), expression-
    only quintile scoring with recency inverted."""
    from temporalscope_spark.operators.tsfeatures import rfm_features

    events = _t(spark, sf_dir, "events")
    return rfm_features(events, "ts", "user_id", "value", n_bins=5)


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant conversion summary vs control: users hash into 3
    deterministic variants (user_id % 3), metric = converted-ever flag;
    ONE variant-keyed moment aggregation, control folded back via a
    window over the bounded C-row table."""
    from temporalscope_spark.operators.experiment import ab_test

    events = _t(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("double")).alias(
            "converted"
        )
    )
    assigned = users.select(
        (F.col("user_id") % 3).cast("string").alias("variant"), "converted"
    )
    return ab_test(assigned, "variant", "converted", control="0")


def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: per-user pre-period (before epoch day
    19738 = 2024-01-16) value sum as the covariate, post-period sum as
    the metric; one 1-row moment fit (theta, xbar as plan literals) +
    expression-only adjustment."""
    from temporalscope_spark.operators.experiment import cuped_adjust

    events = _t(spark, sf_dir, "events")
    from temporalscope_spark.core.convert import epoch_seconds

    t = epoch_seconds(F.col("ts"), events.schema["ts"].dataType)
    p = F.floor(t / F.lit(86400.0)).cast("long")
    v = F.col("value").cast("double")
    users = events.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(p < 19738, v)), F.lit(0.0)).alias("x"),
        F.coalesce(F.sum(F.when(p >= 19738, v)), F.lit(0.0)).alias("y"),
    )
    return cuped_adjust(users, "y", "x", keep_cols=["user_id"])


def _km_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival-input construction: per user, seconds from first
    event to first purchase (event=1) or to last observed event
    (censored), in two odd/even-user cohorts."""
    from temporalscope_spark.core.convert import epoch_seconds

    events = _t(spark, sf_dir, "events")
    t = epoch_seconds(F.col("ts"), events.schema["ts"].dataType)
    per_user = (
        events.select("user_id", t.alias("_t"), "event_type")
        .groupBy("user_id")
        .agg(
            F.min("_t").alias("_t0"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("_t"))).alias(
                "_tp"
            ),
            F.max("_t").alias("_tl"),
        )
    )
    return per_user.select(
        (F.col("user_id") % 2).cast("string").alias("cohort"),
        F.when(F.col("_tp").isNotNull(), F.col("_tp") - F.col("_t0"))
        .otherwise(F.col("_tl") - F.col("_t0"))
        .alias("dur"),
        F.when(F.col("_tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard per cohort over the same
    duration/censor construction as kaplan_meier - identical bounded
    stepped-table plan, hazard-scale outputs."""
    from temporalscope_spark.operators.survival import nelson_aalen

    out = nelson_aalen(_km_durations(spark, sf_dir), "dur", "ev", group_col="cohort")
    return out.select(
        F.col("group").alias("cohort"), "t", "n_risk", "n_event", "hazard", "se"
    )


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two user cohorts: grid-at-risk via a
    strict backward as-of join against each cohort's cumulative-exit
    steps, per-time totals over the bounded grid, ONE k-row reduction."""
    from temporalscope_spark.operators.survival import logrank_test

    out = logrank_test(_km_durations(spark, sf_dir), "dur", "ev", "cohort")
    return out.select(
        F.col("group").alias("cohort"), "n_subjects", "observed",
        "expected", "chi2",
    )


def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user forecast battery (MAE/RMSE/MAPE/sMAPE/MASE) scoring a
    deterministic 2-lag-average forecast of events.value: one entity lag
    window for the naive scale, ONE grouped moment fold."""
    from pyspark.sql.window import Window

    from temporalscope_spark.metrics.forecast import forecast_eval

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast("double")
    fc = (F.lag(v, 1).over(w) + F.lag(v, 2).over(w)) / F.lit(2.0)
    scored = events.withColumn("fc", fc)
    return forecast_eval(
        scored, "value", "fc", "ts", "user_id", tiebreak_col="event_id"
    )


def q_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on events.value: treat = odd users,
    post = epoch day >= 19738 (2024-01-16); all four cells' moments from
    ONE map-side-combinable aggregation, no shuffle."""
    from temporalscope_spark.core.convert import epoch_seconds
    from temporalscope_spark.operators.experiment import did_estimate

    events = _t(spark, sf_dir, "events")
    t = epoch_seconds(F.col("ts"), events.schema["ts"].dataType)
    cells = events.select(
        (F.col("user_id") % 2).cast("int").alias("tr"),
        (F.floor(t / F.lit(86400.0)).cast("long") >= 19738)
        .cast("int")
        .alias("po"),
        F.col("value").alias("y"),
    )
    return did_estimate(cells, "y", "tr", "po")


def q_vocab_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-distribution divergence (KL both ways + JS) between two
    document sources over the combined top-200 vocabulary: one word-count
    aggregation with per-side conditional sums, top-k via
    TakeOrderedAndProject, bounded folds."""
    from temporalscope_spark.operators.drift import vocab_kl

    docs = _t(spark, sf_dir, "documents")
    return vocab_kl(
        docs, "text", "source", "src0", "src1", vocab_k=200, alpha=0.5
    )


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 user-journey paths: 4h-gap sessionization, first 4 event
    types per session in (ts, event_id) order joined with ' > ', counts
    via map-side combine, top-k via TakeOrderedAndProject."""
    from temporalscope_spark.operators.lifecycle import session_paths

    events = _t(spark, sf_dir, "events")
    return session_paths(
        events, "ts", "user_id", "event_type",
        gap_seconds=14400.0, max_steps=4, k=25, tiebreak_col="event_id",
    )


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user Theil–Sen slope (median of all pairwise slopes,
    value/hour): the entity-keyed pair equi-join is bounded by each
    user's own series length; the exact grouped percentile median is the
    oracle lane (percentile_approx the 100 TB swap)."""
    from temporalscope_spark.operators.trend import theil_sen

    events = _t(spark, sf_dir, "events")
    return theil_sen(events, "value", "ts", "user_id")


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test per user (S statistic,
    tie-corrected variance, continuity-corrected z) over the same
    entity-bounded strict-time pair set as theil_sen."""
    from temporalscope_spark.operators.trend import mann_kendall

    events = _t(spark, sf_dir, "events")
    return mann_kendall(events, "value", "ts", "user_id")


def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction over a deterministic per-
    event-type p-value family (md5-derived integers — engine-exact);
    the rank/envelope windows run over the bounded C-row family only."""
    from temporalscope_spark.operators.experiment import fdr_bh

    events = _t(spark, sf_dir, "events")
    tests = events.select(
        F.coalesce(F.col("event_type").cast("string"), F.lit("__null__")).alias(
            "test"
        )
    ).distinct()
    p = (
        F.conv(F.substring(F.md5(F.col("test")), 1, 15), 16, 10).cast("long")
        % 1000000
    ).cast("double") / F.lit(1000000.0)
    return fdr_bh(tests.select("test", p.alias("p")), "p", "test", alpha=0.5)


def q_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001): top-20 docs for the corpus's top-3 heavy-hitter words with
    qtf 2 on the top hitter; full log-probability scores, rounded-score
    + doc-id ordering so the top-k boundary replays."""
    from temporalscope_spark.operators.corpus_stats import heavy_hitters
    from temporalscope_spark.operators.retrieval import query_likelihood_topk

    docs = _t(spark, sf_dir, "documents")
    hh = [r["word"] for r in heavy_hitters(docs, "text", k=3).collect()]
    return query_likelihood_topk(docs, [hh[0]] + hh, k=20, mu=500.0)


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing count-of-counts re-estimation over the corpus unigram
    table: r* = (r+1)N_{r+1}/N_r per observed count, plus the r = 0
    unseen-mass row N_1/N; everything after the unigram aggregation is
    bounded by the number of distinct counts."""
    from temporalscope_spark.operators.lm import good_turing_counts

    docs = _t(spark, sf_dir, "documents")
    return good_turing_counts(docs, "text")


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type vs the user cohort
    (user_id % 4), with Cramér's V and mutual information: ONE corpus
    groupBy to the bounded contingency table, marginals as aggregations
    OF that table, one bounded fold."""
    from temporalscope_spark.operators.experiment import chi2_independence

    events = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).cast("string").alias("cohort")
    )
    return chi2_independence(events, "event_type", "cohort")


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson(1) bootstrap CI for the mean event value
    (Chamandy et al. 2012 — the web-scale bootstrap): md5 inverse-CDF
    weights per (event, replicate), map-side combine bounds the shuffle
    at B rows/task, replicate means round to 6 before the exact quantile
    CI so the oracle replays bit-for-bit."""
    from temporalscope_spark.operators.experiment import poisson_bootstrap

    events = _t(spark, sf_dir, "events")
    return poisson_bootstrap(
        events, "value", "event_id", n_boot=100, alpha=0.05, seed=42
    )


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) on event value, 'click' vs 'view':
    corpus → ONE groupBy(value) count table, joint ranking via the
    quantile-bucketed distributed prefix sum (plans/rownum.py — no
    single-partition window), statistic = one 1-row fold. Tie-corrected
    continuity-corrected z, scipy-parity."""
    from temporalscope_spark.operators.experiment import mann_whitney_u

    events = _t(spark, sf_dir, "events")
    return mann_whitney_u(events, "value", "event_type", "click", "view")


def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009) of documents into 64
    signed md5 buckets, L2-normalized: no vocabulary table, no idf pass —
    one explode + one map-side-combinable (doc, bucket) aggregation, so
    the featurizer's cost and output schema are corpus-size-independent
    (the property that lets downstream linear/logistic trainers run
    incrementally at 100 TB)."""
    from temporalscope_spark.operators.vectorize import hashed_features

    docs = _t(spark, sf_dir, "documents")
    return hashed_features(
        docs, "text", "doc_id", n_buckets=64, signed=True, l2_normalize=True
    )


def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate randomization test (Yeh 2000) on event value, 'click'
    vs 'view': deterministic md5 re-labeling per (row, replicate), one
    narrow explode map-side-combined to the bounded 2B-row table —
    shuffle O(B × tasks), never O(n × B). p uses the add-one estimator."""
    from temporalscope_spark.operators.experiment import permutation_test

    events = _t(spark, sf_dir, "events")
    return permutation_test(
        events, "value", "event_type", "click", "view", n_perm=100, id_col="event_id"
    )


def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized-mean-difference balance table (Austin 2009) between
    'click' and 'view' rows over two covariates: ONE fused moment
    aggregation for all covariates, rows unpivoted from the 1-row table."""
    from temporalscope_spark.operators.experiment import covariate_balance

    events = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        (F.col("user_id") % 97).cast("double").alias("uid_mod"),
    )
    return covariate_balance(events, "event_type", "click", "view", ["value", "uid_mod"])


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch chi-square (Fabijan et al. 2019) of the five
    event types against a uniform design: one bounded groupBy + k-row
    design join + fold."""
    from temporalscope_spark.operators.experiment import srm_check

    events = _t(spark, sf_dir, "events")
    shares = {t: 0.2 for t in ("click", "view", "purchase", "signup", "error")}
    return srm_check(events, "event_type", shares)


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast per user over event values (α=0.4,
    β=0.3, h=1..3): the sorted-fold idiom — one grouped aggregation,
    recursion folded JVM-side per entity, no UDF/window/global sort.
    DuckDB replays the recursion with a recursive CTE."""
    from temporalscope_spark.operators.trend import holt_forecast

    events = _t(spark, sf_dir, "events")
    return holt_forecast(
        events, "value", "ts", "user_id",
        alpha=0.4, beta=0.3, horizon=3, order_col="event_id",
    )


def q_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing lane of the same fold (β absent →
    scalar accumulator, flat h-step forecast)."""
    from temporalscope_spark.operators.trend import holt_forecast

    events = _t(spark, sf_dir, "events")
    return holt_forecast(
        events, "value", "ts", "user_id",
        alpha=0.3, horizon=2, order_col="event_id",
    )


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (event windows [ts, ts+⌊value⌋min)
    per user, even vs odd event ids): chunk decomposition + equi-join on
    (user, chunk) + keep-in-one-chunk dedup — a hash join, never a
    cartesian; the oracle is the quadratic within-user overlap join."""
    from temporalscope_spark.operators.asof import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    hi = F.col("ts") + F.expr(
        "make_interval(0, 0, 0, 0, 0, CAST(FLOOR(value) AS INT), 0)"
    )
    iv = ev.filter(F.col("value").isNotNull()).select(
        "event_id", "user_id", F.col("ts").alias("lo"), hi.alias("hi")
    )
    left = iv.filter(F.col("event_id") % 2 == 0).withColumnRenamed(
        "event_id", "lid"
    )
    right = iv.filter(F.col("event_id") % 2 == 1).withColumnRenamed(
        "event_id", "rid"
    )
    out = interval_overlap_join(
        left, right, "lo", "hi", on="user_id", chunk=4 * 3600.0
    )
    return out.select("user_id", "lid", "rid")


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive seasonal forecast per user (m=7, α=.3,
    β=.1, γ=.2, h=1..3): one grouped sorted-fold with (l, b, seasonal
    array) state; the oracle replays the recursion via a recursive CTE
    with LIST state."""
    from temporalscope_spark.operators.trend import holt_winters_forecast

    events = _t(spark, sf_dir, "events")
    return holt_winters_forecast(
        events, "value", "ts", "user_id", period=7,
        alpha=0.3, beta=0.1, gamma=0.2, horizon=3, order_col="event_id",
    )


def q_ipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hájek IPW + doubly-robust ATE over a deterministic synthetic
    observational design planted on events (propensity from user cohort,
    md5 assignment, +5 effect): ONE map-side-combinable aggregation —
    every estimator is a ratio of weighted sums."""
    from temporalscope_spark.operators.experiment import ipw_estimate

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#7"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    cohort = (F.col("user_id") % 10).cast("double")
    p = F.lit(0.2) + F.lit(0.6) * (cohort / F.lit(10.0))
    t = (u < p).cast("double")
    base = ev.select(
        (F.col("value") + F.lit(5.0) * t).alias("y"),
        t.alias("t"),
        p.alias("p"),
        (F.lit(5.0) + cohort).alias("m1"),
        cohort.alias("m0"),
    )
    return ipw_estimate(base, "y", "t", "p", "m1", "m0")


def q_poisson_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Fisher-scoring round of the Poisson count GLM
    (modeling/poisson.py) from β = 0, where the round is
    transcendental-free (μ=1, w=1, z=y−1): the weighted sums feed the
    same Cramer 3x3 solve the irls_step oracle is pinned by. Count
    target = event_id % 5; features = the lag pair."""
    from temporalscope_spark.modeling import poisson_step
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    feats = lag_features(
        events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True
    ).withColumn("yc", (F.col("event_id") % 5).cast("double"))
    ic, beta, _, ll = poisson_step(
        feats, ["value_lag_1", "value_lag_2"], "yc",
        {"value_lag_1": 0.0, "value_lag_2": 0.0}, 0.0,
    )
    rows = [
        ("intercept", round(ic, 6)),
        ("log_likelihood", round(ll, 6)),
        ("value_lag_1", round(beta["value_lag_1"], 6)),
        ("value_lag_2", round(beta["value_lag_2"], 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


def q_als_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS-WR round (Zhou et al. 2008) over (user, event_type, count)
    ratings, k=2 closed-form lane: deterministic md5 seed factors, per-
    entity Gram/rhs sufficient statistics (the shuffle carries 5 doubles
    per entity, never ratings), 2x2 Cramer solve as expressions. Output:
    the 5 item-factor rows."""
    from temporalscope_spark.modeling.als import als_round

    ev = _t(spark, sf_dir, "events")
    ratings = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("r")
    )
    _, items = als_round(ratings, "user_id", "event_type", "r", k=2, reg=0.1, seed=42)
    return items.select(
        F.col("event_type").alias("item"),
        F.element_at("factors", 1).alias("f0"),
        F.element_at("factors", 2).alias("f1"),
    )


def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid mSPRT p-value (Johari et al. 2017) for click vs view
    event values: ONE moment aggregation, closed-form mixture likelihood
    ratio — the peeking-proof companion to the fixed-horizon tests."""
    from temporalscope_spark.operators.experiment import msprt_test

    events = _t(spark, sf_dir, "events")
    return msprt_test(events, "value", "event_type", "click", "view", tau2=1.0)


def q_fs_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage of customers against a
    deterministically perturbed 10% re-extract (every 20th name
    corrupted): candidate pairs ONLY from the nation blocking equi-join
    (never n²), log-odds agreement weights as expressions; the query
    returns the 'link' band."""
    from temporalscope_spark.operators.linkage import fs_link

    cust = _t(spark, sf_dir, "customer")
    left = cust.select(
        F.col("c_custkey").alias("lid"), "c_nationkey", "c_name", "c_mktsegment"
    )
    right = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 20 == 0, F.concat(F.col("c_name"), F.lit("x"))
        ).otherwise(F.col("c_name")).alias("c_name"),
        "c_mktsegment",
    )
    out = fs_link(
        left, right, "c_nationkey",
        {"c_name": (0.95, 0.001), "c_mktsegment": (0.9, 0.2)},
        "lid", "rid", lower=3.0, upper=6.0,
    )
    return out.filter(F.col("decision") == "link").select(
        "lid", "rid", "weight", "n_agree", "n_known"
    )


def q_cox_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Newton step of Cox PH partial likelihood from β = 0 (where
    w = 1: the risk-set sums are transcendental-free counts/moments):
    duration = event value, event = id parity, two bounded covariates.
    Grid aggregation + distributed DESC-suffix cumsum + U/I fold + the
    2x2 solve; oracle replays grid, suffix windows, and Cramer 2x2."""
    from temporalscope_spark.operators.survival import cox_step

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("dur"),
        (F.col("event_id") % 2).cast("double").alias("evt"),
        ((F.col("user_id") % 10).cast("double") / 10.0).alias("x1"),
        ((F.col("event_id") % 7).cast("double") / 7.0).alias("x2"),
    )
    nb, nr, ne, ll = cox_step(base, "dur", "evt", ["x1", "x2"])
    rows = [
        ("x1", round(nb["x1"], 6)),
        ("x2", round(nb["x2"], 6)),
        ("n_rows", float(nr)),
        ("n_events", float(ne)),
        ("loglik", round(ll, 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


def q_fs_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM round (Winkler 1988) estimating Fellegi–Sunter m/u/p from
    the blocked customer candidate pairs themselves — posterior match
    weights as expressions, M-step ONE aggregation over the bounded
    pair table."""
    from temporalscope_spark.operators.linkage import fs_em_round

    cust = _t(spark, sf_dir, "customer")
    left = cust.select(
        F.col("c_custkey").alias("lid"), "c_nationkey", "c_name", "c_mktsegment"
    )
    right = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.col("c_nationkey").alias("rnat"),
        F.when(
            F.col("c_custkey") % 20 == 0, F.concat(F.col("c_name"), F.lit("x"))
        ).otherwise(F.col("c_name")).alias("rname"),
        F.col("c_mktsegment").alias("rseg"),
    )
    pairs = left.join(right, left["c_nationkey"] == right["rnat"]).select(
        (F.col("c_name") == F.col("rname")).alias("a_name"),
        (F.col("c_mktsegment") == F.col("rseg")).alias("a_seg"),
    )
    out = fs_em_round(
        pairs, ["a_name", "a_seg"],
        {"a_name": 0.8, "a_seg": 0.8},
        {"a_name": 0.1, "a_seg": 0.2},
        0.01,
    )
    rows = [
        ("m_name", round(out["m"]["a_name"], 6)),
        ("u_name", round(out["u"]["a_name"], 6)),
        ("m_seg", round(out["m"]["a_seg"], 6)),
        ("u_seg", round(out["u"]["a_seg"], 6)),
        ("p", round(out["p"], 6)),
        ("n_pairs", float(out["n_pairs"])),
        ("expected_matches", round(out["expected_matches"], 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data diff of customer vs a deterministic v2 (every 50th key
    dropped, every 7th balance bumped, every 97th re-added under a new
    key): each side pruned to key+columns, ONE full-outer join, ONE
    aggregation for every per-column count."""
    from temporalscope_spark.operators.diffing import table_diff

    cust = _t(spark, sf_dir, "customer")
    v2 = cust.filter(F.col("c_custkey") % 50 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    added = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 3000000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    right = v2.unionByName(added)
    left = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
    return table_diff(left, right, "c_custkey")


def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check lang → source over documents: ONE
    groupBy(lang) distinct-count, summary fold over the bounded group
    table."""
    from temporalscope_spark.operators.diffing import fd_violations

    docs = _t(spark, sf_dir, "documents")
    return fd_violations(docs, "lang", "source")


def q_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed radius join on deterministic event coordinates
    (150 km): candidates only from the 3x3-neighborhood cell equi-join
    (hash join, never cartesian — plan-tested in the suite); oracle is
    the quadratic haversine join."""
    from temporalscope_spark.operators.geo import proximity_join

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") % 1200).cast("double") / 10.0 - 60.0).alias("lat"),
        (((F.col("event_id") * 7 + F.col("user_id")) % 3400).cast("double")
         / 10.0 - 170.0).alias("lon"),
    )
    left = pts.filter(F.col("event_id") % 97 == 0).withColumnRenamed(
        "event_id", "lid"
    )
    right = pts.filter(F.col("event_id") % 13 == 1).withColumnRenamed(
        "event_id", "rid"
    )
    out = proximity_join(left, right, radius_km=150.0)
    return out.select("lid", "rid", "distance_km")


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP noisy event-type counts: deterministic md5 inverse-CDF
    Laplace noise on the bounded group table (one groupBy + pure
    expressions)."""
    from temporalscope_spark.operators.privacy import dp_counts

    events = _t(spark, sf_dir, "events")
    return dp_counts(events, "event_type", epsilon=1.0, seed=42)


def q_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP clipped mean of event value per type (lo=0, hi=500, ε=2,
    split between sum and count) — the standard bounded-mean release."""
    from temporalscope_spark.operators.privacy import dp_mean

    events = _t(spark, sf_dir, "events")
    return dp_mean(events, "value", "event_type", 0.0, 500.0, epsilon=2.0, seed=42)


def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 distance between click and purchase value
    distributions: groupBy(value) count table → two-phase prefix-sum
    CDFs → rank-adjacent successor join for Δx (no partition-free lead)
    → one fold."""
    from temporalscope_spark.operators.drift import wasserstein_1d

    events = _t(spark, sf_dir, "events")
    return wasserstein_1d(events, "value", "event_type", "click", "purchase")


def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier scores on (value, user cohort): ONE moment
    aggregation fits mean + covariance (rounded-6 plan literals, inverse
    solved driver-side — p² doubles), scoring a pure expression; the
    oracle refits with the same moments and the closed-form 2x2
    inverse."""
    from temporalscope_spark.operators.scaling import (
        fit_mahalanobis,
        mahalanobis_score,
    )

    events = _t(spark, sf_dir, "events")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_id",
        F.col("value").cast("double").alias("x1"),
        (F.col("user_id") % 100).cast("double").alias("x2"),
    )
    m = fit_mahalanobis(base, ["x1", "x2"])
    return mahalanobis_score(base, m, keep_cols=["event_id"])


def q_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-subclassification ATT/ATE on the same deterministic
    observational design as ipw_estimate: exact-quantile stratum edges
    as rounded plan literals, ONE groupBy(stratum) moment aggregation,
    bounded fold; one-sided strata dropped and counted."""
    from temporalscope_spark.operators.experiment import stratified_att

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#7"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    cohort = (F.col("user_id") % 10).cast("double")
    p = F.lit(0.2) + F.lit(0.6) * (cohort / F.lit(10.0))
    t = (u < p).cast("double")
    base = ev.select(
        (F.col("value") + F.lit(5.0) * t).alias("y"), t.alias("t"), p.alias("p")
    )
    return stratified_att(base, "y", "t", "p", n_strata=5)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each user's event-type state stream:
    entity-partitioned lag change detection + per-entity version ids +
    one groupBy + lead close-out — four narrow stages over ONE
    entity-keyed exchange."""
    from temporalscope_spark.operators.scd import scd2_history

    events = _t(spark, sf_dir, "events")
    return scd2_history(
        events, "user_id", "ts", ["event_type"], order_col="event_id"
    )


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Durbin–Watson serial-correlation screen on event values:
    one entity lag window + one grouped moment fold."""
    from temporalscope_spark.operators.tsfeatures import durbin_watson

    events = _t(spark, sf_dir, "events")
    return durbin_watson(events, "value", "ts", "user_id", "event_id")


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Ljung–Box portmanteau Q (lags 1..3) built on the
    acf_features cross-moment aggregation — rounded ACFs feed Q so the
    oracle replays exactly."""
    from temporalscope_spark.operators.tsfeatures import ljung_box

    events = _t(spark, sf_dir, "events")
    return ljung_box(events, "value", 3, "ts", "user_id", "event_id")


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user PACF (lags 1..3) by closed-form Durbin–Levinson on the
    rounded ACF — Box–Jenkins AR-order identification, no extra corpus
    pass."""
    from temporalscope_spark.operators.tsfeatures import pacf_features

    events = _t(spark, sf_dir, "events")
    return pacf_features(events, "value", 3, "ts", "user_id", "event_id")


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across all five event types: joint ranks via
    the distributed prefix sum, per-group rank sums over the bounded
    (value × group) table, tie-corrected."""
    from temporalscope_spark.operators.experiment import kruskal_wallis

    events = _t(spark, sf_dir, "events")
    return kruskal_wallis(events, "value", "event_type")


def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity F across event types:
    per-group exact medians as broadcast literals, one moment pass on
    absolute deviations, bounded fold."""
    from temporalscope_spark.operators.experiment import levene_test

    events = _t(spark, sf_dir, "events")
    return levene_test(events, "value", "event_type")


def q_yuen_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen trimmed-mean robust t (20% trim) on click vs view values:
    grouped exact-quantile bands as plan literals, one winsorized-moment
    pass per group, driver fold."""
    from temporalscope_spark.operators.experiment import yuen_test

    events = _t(spark, sf_dir, "events")
    return yuen_test(events, "value", "event_type", "click", "view", trim=0.2)


def q_eb_shrink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efron–Morris empirical-Bayes shrinkage of per-cohort mean event
    values (user_id % 37 cohorts): one grouped moment pass, bounded
    hyperparameter fold, expression scoring — the ranking-without-luck
    lane for millions of small groups."""
    from temporalscope_spark.operators.experiment import eb_shrink_means

    events = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 37).cast("string").alias("cohort"),
        F.col("value"),
    )
    return eb_shrink_means(events, "value", "cohort")


def q_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter per user (q=0.5, r=2.0, h=1..2): the
    state-space lane of the smoothing family, same sorted-fold plan as
    holt_forecast; recursive-CTE oracle."""
    from temporalscope_spark.operators.trend import kalman_local_level

    events = _t(spark, sf_dir, "events")
    return kalman_local_level(
        events, "value", "ts", "user_id",
        q_var=0.5, r_var=2.0, horizon=2, order_col="event_id",
    )


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman population estimate of distinct users from two
    deterministic event samples (id%3 vs id%2 windows): two distinct
    counts + one semi-join overlap count — the overlap never
    materializes beyond its count."""
    from temporalscope_spark.operators.corpus_stats import capture_recapture

    events = _t(spark, sf_dir, "events")
    a = events.filter(F.col("event_id") % 3 == 0)
    b = events.filter(F.col("event_id") % 2 == 0)
    return capture_recapture(a, b, "user_id")


def q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 true-vocabulary estimate + Good sample coverage over the
    documents table: word counts → count-of-counts → 1-row fold."""
    from temporalscope_spark.operators.corpus_stats import chao1_richness

    docs = _t(spark, sf_dir, "documents")
    return chao1_richness(docs, "text")


def q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson over-dispersion screen on per-user event counts: one
    grouped count + one moment fold."""
    from temporalscope_spark.operators.experiment import dispersion_test

    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    return dispersion_test(counts, "y")


def q_ratio_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method ratio metric (sum value / count events per user)
    across deterministic md5 variants: one variant-keyed moment pass,
    bounded control fold — the clustered-SE-correct CTR readout."""
    from temporalscope_spark.operators.experiment import ratio_metric_test

    events = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#rm"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    ).cast("double") / F.lit(1e9)
    tagged = per_user.withColumn(
        "variant", F.when(u < 0.5, F.lit("t")).otherwise(F.lit("c"))
    )
    return ratio_metric_test(tagged, "x", "y", "variant", "c")


def q_quantile_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One IRLS quantile-regression round (tau=0.5, pinball loss) on the
    lag features at a fixed non-zero start — the weights need only |r|
    and a branch, so the round is transcendental-free at ANY starting
    point; sums feed the shared Cramer 3x3."""
    from temporalscope_spark.modeling import quantile_step
    from temporalscope_spark.operators.shift import lag_features

    events = _t(spark, sf_dir, "events")
    feats = lag_features(
        events, "ts", ["value"], [1, 2], id_col="user_id", drop_incomplete=True
    )
    b0, b1, b2 = _IRLS_B0
    ic, beta, _, loss = quantile_step(
        feats, ["value_lag_1", "value_lag_2"], "value", 0.5,
        {"value_lag_1": b1, "value_lag_2": b2}, b0, delta=1e-3,
    )
    rows = [
        ("intercept", round(ic, 6)),
        ("pinball_loss", round(loss, 6)),
        ("value_lag_1", round(beta["value_lag_1"], 6)),
        ("value_lag_2", round(beta["value_lag_2"], 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time (τ = 1e6 s) per churn cohort —
    the KM-curve area, one group-partitioned lead + fold over the
    bounded curve table."""
    from temporalscope_spark.operators.survival import rmst

    out = rmst(
        _km_durations(spark, sf_dir), "dur", "ev", tau=1_000_000.0,
        group_col="cohort",
    )
    return out.select(
        F.col("group").alias("cohort"), "tau", "n", "n_events", "rmst"
    )


def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the event type and a deterministically
    perturbed second labeling (every 5th relabeled 'view'): one
    contingency aggregation + bounded marginal folds."""
    from temporalscope_spark.metrics.classification import cohen_kappa

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("ra"),
        F.when(F.col("event_id") % 5 == 0, F.lit("view"))
        .otherwise(F.col("event_type")).alias("rb"),
    )
    return cohen_kappa(ev, "ra", "rb")


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired χ² on a deterministic before/after flag pair
    (parity flipped on every 7th event): one aggregation of the
    discordant counts."""
    from temporalscope_spark.metrics.classification import mcnemar_test

    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 2).cast("double").alias("x"),
        F.when(
            F.col("event_id") % 7 == 0, 1.0 - (F.col("event_id") % 2)
        ).otherwise((F.col("event_id") % 2).cast("double")).alias("y"),
    )
    return mcnemar_test(ev, "x", "y")


def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier/Murphy decomposition + ECE/MCE of a deterministic synthetic
    probability (md5 score, label Bernoulli-by-second-hash at a warped
    rate): one binned moment aggregation + bounded fold."""
    from temporalscope_spark.metrics.classification import calibration_report

    ev = _t(spark, sf_dir, "events")

    def frac(tag):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("event_id").cast("string"), F.lit(tag))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000000000
        ).cast("double") / F.lit(1e9)

    p = frac("#cs")
    yprob = F.lit(0.1) + F.lit(0.8) * p
    base = ev.select(
        p.alias("p"), (frac("#cy") < yprob).cast("double").alias("y")
    )
    return calibration_report(base, "p", "y", n_bins=10)


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ over three deterministic md5-perturbed raters of the
    event type: (item, label) counts → per-item agreement → bounded
    folds."""
    from temporalscope_spark.metrics.classification import fleiss_kappa

    ev = _t(spark, sf_dir, "events")
    raters = []
    for tag in ("#r1", "#r2", "#r3"):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("event_id").cast("string"), F.lit(tag))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000000000
        ).cast("double") / F.lit(1e9)
        raters.append(
            ev.select(
                F.col("event_id").alias("item"),
                F.when(u < 0.75, F.col("event_type"))
                .otherwise(F.lit("view")).alias("label"),
            )
        )
    ratings = raters[0].unionByName(raters[1]).unionByName(raters[2])
    return fleiss_kappa(ratings, "item", "label")


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α of three deterministic parallel measures of the
    event value (value plus bounded md5 noise): one moment
    aggregation."""
    from temporalscope_spark.metrics.classification import cronbach_alpha

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def probe(tag):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("event_id").cast("string"), F.lit(tag))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000000000
        ).cast("double") / F.lit(1e9)
        return F.col("value") + F.lit(20.0) * (u - 0.5)

    base = ev.select(
        probe("#m1").alias("m1"), probe("#m2").alias("m2"),
        probe("#m3").alias("m3"),
    )
    return cronbach_alpha(base, ["m1", "m2", "m3"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fleiss_kappa": q_fleiss_kappa,
        "cronbach_alpha": q_cronbach_alpha,
        "calibration_report": q_calibration_report,
        "rmst": q_rmst,
        "cohen_kappa": q_cohen_kappa,
        "mcnemar": q_mcnemar,
        "quantile_step": q_quantile_step,
        "dispersion": q_dispersion,
        "ratio_metric": q_ratio_metric,
        "capture_recapture": q_capture_recapture,
        "chao1": q_chao1,
        "kalman": q_kalman,
        "yuen_test": q_yuen_test,
        "eb_shrink": q_eb_shrink,
        "kruskal_wallis": q_kruskal_wallis,
        "levene_test": q_levene_test,
        "pacf": q_pacf,
        "durbin_watson": q_durbin_watson,
        "ljung_box": q_ljung_box,
        "scd2_history": q_scd2_history,
        "stratified_att": q_stratified_att,
        "mahalanobis": q_mahalanobis,
        "wasserstein": q_wasserstein,
        "dp_counts": q_dp_counts,
        "dp_mean": q_dp_mean,
        "proximity_join": q_proximity_join,
        "table_diff": q_table_diff,
        "fd_violations": q_fd_violations,
        "fs_em_round": q_fs_em_round,
        "cox_step": q_cox_step,
        "msprt": q_msprt,
        "fs_link": q_fs_link,
        "als_round": q_als_round,
        "poisson_step": q_poisson_step,
        "ipw_estimate": q_ipw_estimate,
        "holt_winters": q_holt_winters,
        "interval_overlap": q_interval_overlap,
        "holt_forecast": q_holt_forecast,
        "ses_forecast": q_ses_forecast,
        "mann_whitney": q_mann_whitney,
        "hashed_features": q_hashed_features,
        "permutation_test": q_permutation_test,
        "covariate_balance": q_covariate_balance,
        "srm_check": q_srm_check,
        "chi2_independence": q_chi2_independence,
        "poisson_bootstrap": q_poisson_bootstrap,
        "theil_sen": q_theil_sen,
        "mann_kendall": q_mann_kendall,
        "fdr_bh": q_fdr_bh,
        "query_likelihood": q_query_likelihood,
        "good_turing": q_good_turing,
        "target_shift": q_target_shift,
        "target_shift_chunked": q_target_shift_chunked,
        "lag_features": q_lag_features,
        "multi_step_targets": q_multi_step_targets,
        "sessionize": q_sessionize,
        "session_bounds": q_session_bounds,
        "window_buckets": q_window_buckets,
        "asof_join": q_asof_join,
        "asof_join_forward": q_asof_join_forward,
        "forward_fill": q_forward_fill,
        "backward_fill": q_backward_fill,
        "range_join": q_range_join,
        "session_window_builtin": q_session_window_builtin,
        "equidistant_check": q_equidistant_check,
        "epoch_roundtrip": q_epoch_roundtrip,
        "column_profile": q_column_profile,
        "class_balance": q_class_balance,
        "pad_tokens": q_pad_tokens,
        "multi_lead_tokens": q_multi_lead_tokens,
        "mean_fill_pad": q_mean_fill_pad,
        "pad_groups": q_pad_groups,
        "partitioner_splits": q_partitioner_splits,
        "validation_stats": q_validation_stats,
        "dup_timestamp_check": q_dup_timestamp_check,
        "token_stats": q_token_stats,
        "quality": q_quality,
        "quality_score": q_quality_score,
        "dataset_validator": q_dataset_validator,
        "lang_id": q_lang_id,
        "repetition": q_repetition,
        "gopher_rules": q_gopher_rules,
        "dedup_clusters": q_dedup_clusters,
        "quality_gate": q_quality_gate,
        "curate_corpus": q_curate_corpus,
        "winnow_fingerprints": q_winnow_fingerprints,
        "bpe_token_count": q_bpe_token_count,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "ngram_jaccard": q_ngram_jaccard,
        "dup_span_stats": q_dup_span_stats,
        "remove_dup_spans": q_remove_dup_spans,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "incremental_dedup": q_incremental_dedup,
        "simhash_pairs": q_simhash_pairs,
        "cosine_topk": q_cosine_topk,
        "embedding_near_pairs": q_embedding_near_pairs,
        "embedding_near_pairs_lsh": q_embedding_near_pairs_lsh,
        "ann_topk": q_ann_topk,
        "media_bytes": q_media_bytes,
        "rolling_features": q_rolling_features,
        "rolling_row": q_rolling_row,
        "ewma": q_ewma,
        "ewma_segmented": q_ewma_segmented,
        "normalize_expanding": q_normalize_expanding,
        "ivf_topk": q_ivf_topk,
        "ann_index_topk": q_ann_index_topk,
        "linear_model": q_linear_model,
        "irls_step": q_irls_step,
        "quality_classifier": q_quality_classifier,
        "naive_bayes": q_naive_bayes,
        "conformal_interval": q_conformal_interval,
        "span_corruption": q_span_corruption,
        "fim_split": q_fim_split,
        "chat_pack": q_chat_pack,
        "merge_forget": q_merge_forget,
        "suffix_ranks": q_suffix_ranks,
        "repeated_substrings": q_repeated_substrings,
        "masv_linear": q_masv_linear,
        "heavy_hitters": q_heavy_hitters,
        "redact_terms": q_redact_terms,
        "pii_scan": q_pii_scan,
        "redact_pii": q_redact_pii,
        "skew_profile": q_skew_profile,
        "bm25_topk": q_bm25_topk,
        "bm25_multi_topk": q_bm25_multi_topk,
        "bm25_incremental": q_bm25_incremental,
        "token_quantiles": q_token_quantiles,
        "length_histogram": q_length_histogram,
        "tokenizer_fertility": q_tokenizer_fertility,
        "unigram_lm_score": q_unigram_lm_score,
        "ppl_buckets": q_ppl_buckets,
        "stupid_backoff_score": q_stupid_backoff_score,
        "kneser_ney_score": q_kneser_ney,
        "cooccurrence_pmi": q_cooccurrence_pmi,
        "bpe_merges": q_bpe_merges,
        "bpe_compression": q_bpe_compression,
        "bpe_tokenize": q_bpe_tokenize,
        "c4_rules": q_c4_rules,
        "unigram_seed": q_unigram_seed,
        "unigram_em": q_unigram_em,
        "unigram_tokenize": q_unigram_tokenize,
        "wordpiece_merges": q_wordpiece_merges,
        "wordpiece_tokenize": q_wordpiece_tokenize,
        "semdedup": q_semdedup,
        "dsir_select": q_dsir_select,
        "dsir_select_approx": q_dsir_select_approx,
        "temperature_sample": q_temperature_sample,
        "assign_shards": q_assign_shards,
        "purged_cv": q_purged_cv,
        "resample": q_resample,
        "interpolate": q_interpolate,
        "entity_split": q_entity_split,
        "pack_chunks": q_pack_chunks,
        "pack_greedy": q_pack_greedy,
        "training_windows": q_training_windows,
        "decontaminate": q_decontaminate,
        "decontaminate_bloom": q_decontaminate_bloom,
        "countmin_freq": q_countmin_freq,
        "kmv_distinct": q_kmv_distinct,
        "kmv_overlap": q_kmv_overlap,
        "ranking_eval": q_ranking_eval,
        "rrf_fusion": q_rrf_fusion,
        "bradley_terry": q_bradley_terry,
        "bt_win_prob": q_bt_win_prob,
        "hits_scores": q_hits_scores,
        "zipf_fit": q_zipf_fit,
        "split_leakage": q_split_leakage,
        "weight_ess": q_weight_ess,
        "kmv_incremental": q_kmv_incremental,
        "hll_distinct": q_hll_distinct,
        "hll_incremental": q_hll_incremental,
        "chunk_words": q_chunk_words,
        "dedup_paragraphs": q_dedup_paragraphs,
        "bleu_corpus": q_bleu_corpus,
        "chrf_corpus": q_chrf_corpus,
        "readability": q_readability,
        "neardup_decontam": q_neardup_decontam,
        "rouge_corpus": q_rouge_corpus,
        "rouge_l": q_rouge_l,
        "vocab_coverage": q_vocab_coverage,
        "doc_entropy": q_doc_entropy,
        "source_kl": q_source_kl,
        "ann_recall": q_ann_recall,
        "unimax": q_unimax,
        "rbo": q_rbo,
        "upsample_repeat": q_upsample_repeat,
        "mad_outliers_grouped": q_mad_outliers_grouped,
        "weighted_sample": q_weighted_sample,
        "doremi_round": q_doremi_round,
        "dpo_pairs": q_dpo_pairs,
        "prototype_prune": q_prototype_prune,
        "margin_mining": q_margin_mining,
        "mmr_rerank": q_mmr_rerank,
        "embedding_drift": q_embedding_drift,
        "distinct_ngrams": q_distinct_ngrams,
        "cluster_best": q_cluster_best,
        "length_batches": q_length_batches,
        "label_propagation": q_label_propagation,
        "k_anonymity": q_k_anonymity,
        "l_diversity": q_l_diversity,
        "edit_distance_pairs": q_edit_distance_pairs,
        "zorder_key": q_zorder_key,
        "pq_encode": q_pq_encode,
        "normalize_unicode": q_normalize_unicode,
        "ivfpq_encode": q_ivfpq_encode,
        "lexical_diversity": q_lexical_diversity,
        "triangle_counts": q_triangle_counts,
        "knn_label_agreement": q_knn_label_agreement,
        "kcenter_select": q_kcenter_select,
        "hybrid_rerank": q_hybrid_rerank,
        "ivfpq_topk": q_ivfpq_topk,
        "pq_topk": q_pq_topk,
        "contamination_rate": q_contamination_rate,
        "quantile_normalize": q_quantile_normalize,
        "dedup_lines": q_dedup_lines,
        "dedup_lines_incremental": q_dedup_lines_incremental,
        "pagerank": q_pagerank,
        "stratified_sample": q_stratified_sample,
        "token_budget_sample": q_token_budget_sample,
        "chunk_documents": q_chunk_documents,
        "topk_per_group": q_topk_per_group,
        "expanding": q_expanding,
        "target_encode": q_target_encode,
        "psi_drift": q_psi_drift,
        "psi_score": q_psi_score,
        "auc_roc": q_auc_roc,
        "reliability_curve": q_reliability_curve,
        "lift_table": q_lift_table,
        "isotonic_fit": q_isotonic_fit,
        "pr_curve": q_pr_curve,
        "auc_by_group": q_auc_by_group,
        "regression_metrics": q_regression_metrics,
        "ks_drift": q_ks_drift,
        "delta_features": q_delta_features,
        "rolling_corr": q_rolling_corr,
        "acf_features": q_acf_features,
        "series_features": q_series_features,
        "dft_features": q_dft_features,
        "time_to_event": q_time_to_event,
        "negative_samples": q_negative_samples,
        "serve_features": q_serve_features,
        "fourier_time": q_fourier_time,
        "feature_relevance": q_feature_relevance,
        "numeric_relevance": q_numeric_relevance,
        "anova_f": q_anova_f,
        "spearman_matrix": q_spearman,
        "mrmr_select": q_mrmr_select,
        "correlation_matrix": q_correlation_matrix,
        "quantile_bin": q_quantile_bin,
        "winsorize": q_winsorize,
        "seasonal_decompose": q_seasonal_decompose,
        "scale_zscore": q_scale_zscore,
        "scale_robust": q_scale_robust,
        "count_encode": q_count_encode,
        "one_hot_topk": q_one_hot_topk,
        "rare_collapse": q_rare_collapse,
        "hash_cross": q_hash_cross,
        "tfidf_vectors": q_tfidf_vectors,
        "tfidf_cosine": q_tfidf_cosine,
        "pca_project": q_pca_project,
        "calendar_features": q_calendar_features,
        "scale_by_group": q_scale_by_group,
        "mad_outliers": q_mad_outliers,
        "target_encode_oof": q_target_encode_oof,
        "impute_mean": q_impute_mean,
        "moment_profile": q_moment_profile,
        "ecdf_feature": q_ecdf_feature,
        "polynomial_features": q_polynomial_features,
        "centroid_distances": q_centroid_distances,
        "recency_features": q_recency_features,
        "entity_profile": q_entity_profile,
        "trend_features": q_trend_features,
        "woe_iv": q_woe_iv,
        "t_closeness": q_t_closeness,
        "classification_report": q_classification_report,
        "kcore": q_kcore,
        "url_normalize": q_url_normalize,
        "domain_caps": q_domain_caps,
        "domain_stats": q_domain_stats,
        "fix_mojibake": q_fix_mojibake,
        "kaplan_meier": q_kaplan_meier,
        "cohort_retention": q_cohort_retention,
        "funnel_conversion": q_funnel_conversion,
        "association_rules": q_association_rules,
        "transition_matrix": q_transition_matrix,
        "cusum_changepoint": q_cusum_changepoint,
        "gini_concentration": q_gini_concentration,
        "benford_digits": q_benford_digits,
        "attribution_last": q_attribution_last,
        "attribution_first": q_attribution_first,
        "rfm_features": q_rfm_features,
        "ab_test": q_ab_test,
        "cuped_adjust": q_cuped_adjust,
        "nelson_aalen": q_nelson_aalen,
        "logrank_test": q_logrank_test,
        "forecast_eval": q_forecast_eval,
        "did_estimate": q_did_estimate,
        "vocab_kl": q_vocab_kl,
        "session_paths": q_session_paths,
    }


def _lpa_oracle(iters: int) -> str:
    """Unrolled label-propagation CTE chain over the shared md5 link
    graph: per round, in-neighbor majority with (count DESC, label ASC)
    ties; nodes with no in-edges keep their label."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        v{i} AS (
            SELECT e.dst AS id, l.lab, count(*) AS c
            FROM e JOIN l{i - 1} l ON l.id = e.src
            GROUP BY e.dst, l.lab
        ),
        b{i} AS (
            SELECT id, lab AS newl FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
                FROM v{i}
            ) WHERE rn = 1
        ),
        l{i} AS (
            SELECT l.id, coalesce(b.newl, l.lab) AS lab
            FROM l{i - 1} l LEFT JOIN b{i} b USING (id)
        )""")
    return f"""
        WITH e AS (
            SELECT d.doc_id AS src,
                   CAST('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR) || chr(31)
                            || CAST(t.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % (SELECT count(*) FROM documents) AS dst
            FROM documents d, UNNEST([0, 1, 2]) AS t(k)
        ),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        l0 AS (SELECT id, id AS lab FROM nodes),{",".join(rounds)}
        SELECT id AS doc_id, lab AS label FROM l{iters}
    """


def _mmr_oracle(k: int, lam: float) -> str:
    """Unrolled greedy-MMR CTE chain replaying q_mmr_rerank: same
    candidate generation (top-15 exact cosine per query, rel rounded 6),
    same per-round argmax on the ROUNDED score with id tie-break, and the
    same IEEE mu = 1.0 - lam (the SQL subtraction reproduces Python's
    0.30000000000000004 bit-for-bit)."""
    mu = "(CAST(1.0 AS DOUBLE) - CAST({l} AS DOUBLE))".format(l=lam)
    rounds = ["""
        sc1 AS (
            SELECT qid, vec_id,
                   round(CAST({l} AS DOUBLE) * rel, 6) + 0.0 AS score
            FROM cand
        ),
        pk1 AS (
            SELECT qid, vec_id, score, 1 AS rnk FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM sc1
            ) WHERE rn = 1
        ),
        sel1 AS (SELECT * FROM pk1)""".format(l=lam)]
    for i in range(2, k + 1):
        rounds.append("""
        ms{i} AS (
            SELECT c.qid, c.vec_id,
                   max(list_cosine_similarity(c.e, cd.e)) AS ms
            FROM cand c
            JOIN sel{p} s ON s.qid = c.qid
            JOIN cand cd ON cd.qid = s.qid AND cd.vec_id = s.vec_id
            WHERE NOT EXISTS (
                SELECT 1 FROM sel{p} x
                WHERE x.qid = c.qid AND x.vec_id = c.vec_id
            )
            GROUP BY c.qid, c.vec_id
        ),
        sc{i} AS (
            SELECT m.qid, m.vec_id,
                   round(CAST({l} AS DOUBLE) * c.rel - {mu} * m.ms, 6) + 0.0
                       AS score
            FROM ms{i} m JOIN cand c
              ON c.qid = m.qid AND c.vec_id = m.vec_id
        ),
        pk{i} AS (
            SELECT qid, vec_id, score, {i} AS rnk FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM sc{i}
            ) WHERE rn = 1
        ),
        sel{i} AS (SELECT * FROM sel{p} UNION ALL SELECT * FROM pk{i})""".format(
            i=i, p=i - 1, l=lam, mu=mu))
    return """
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        qv AS (SELECT vec_id AS qid, e AS qe FROM vecs WHERE vec_id IN (0, 1)),
        c0 AS (
            SELECT qv.qid, v.vec_id, v.e,
                   list_cosine_similarity(v.e, qv.qe) AS rc,
                   row_number() OVER (
                       PARTITION BY qv.qid
                       ORDER BY list_cosine_similarity(v.e, qv.qe) DESC,
                                v.vec_id
                   ) AS rn
            FROM vecs v CROSS JOIN qv WHERE v.vec_id >= 10
        ),
        cand AS (
            SELECT qid, vec_id, e, round(rc, 6) + 0.0 AS rel
            FROM c0 WHERE rn <= 15
        ),{rounds}
        SELECT qid AS query_id, vec_id AS doc_id,
               CAST(rnk AS INT) AS rank, score AS mmr_score
        FROM sel{k}
    """.format(rounds=",".join(rounds), k=k)




def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled k-core peel over the shared md5 link graph: per round,
    degree over the surviving undirected simple edges, drop nodes below
    k, drop their edges; final selection = post-peel degree >= k."""
    parts = []
    for i in range(1, rounds + 1):
        parts.append(f"""
        d{i} AS (
            SELECT id, count(*) AS deg FROM (
                SELECT u AS id FROM e{i - 1}
                UNION ALL SELECT v FROM e{i - 1})
            GROUP BY id
        ),
        k{i} AS (SELECT id FROM d{i} WHERE deg >= {k}),
        e{i} AS (
            SELECT e.u, e.v FROM e{i - 1} e
            JOIN k{i} a ON a.id = e.u JOIN k{i} b ON b.id = e.v
        )""")
    return f"""
        WITH raw AS (
            SELECT d.doc_id AS src,
                   CAST('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR) || chr(31)
                            || CAST(t.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % (SELECT count(*) FROM documents) AS dst
            FROM documents d, UNNEST([0, 1, 2]) AS t(k)
        ),
        e0 AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ),{",".join(parts)},
        dfin AS (
            SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
                SELECT u AS id FROM e{rounds}
                UNION ALL SELECT v FROM e{rounds})
            GROUP BY id
        )
        SELECT id, degree FROM dfin WHERE degree >= {k}
    """


def _sqlstr(s: str) -> str:
    """Render a python string as a DuckDB string expression, spelling
    non-printable characters (the C1 control in the mojibake table) as
    chr(n) concatenations so no raw control byte enters the SQL text."""
    out, lit = [], []

    def flush():
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    for ch in s:
        if ch.isprintable() or ch in (" ",):
            lit.append(ch)
        else:
            flush()
            out.append(f"chr({ord(ch)})")
    flush()
    return "(" + " || ".join(out) + ")" if out else "''"


def _moji_oracle() -> str:
    """Replay the fix_mojibake replace chain: identical planted prefix,
    identical exact-string replaces in MOJIBAKE_MAP order."""
    from temporalscope_spark.operators.text import MOJIBAKE_MAP

    expr = "dirty"
    for bad, good in MOJIBAKE_MAP:
        expr = f"replace({expr}, {_sqlstr(bad)}, {_sqlstr(good)})"
    return f"""
        WITH d AS (
            SELECT doc_id,
                   {_sqlstr(_MOJI_SAMPLE)} || substr(text, 1, 80) AS dirty
            FROM documents
        )
        SELECT doc_id, {expr} AS fixed_text,
               CAST({expr} <> dirty AS BOOLEAN) AS changed
        FROM d
    """


def oracle_sql() -> dict[str, str]:
    session_expr = (
        "SUM(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 3600 "
        "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    sessionized = (
        "SELECT event_id, user_id, ts, "
        f"CAST({session_expr} AS BIGINT) AS session_id "
        "FROM (SELECT event_id, user_id, ts, "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events)"
    )
    sql = {
        "target_shift": """
            SELECT event_id, user_id, value, value_shift_1 FROM (
                SELECT event_id, user_id, value,
                       LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_shift_1
                FROM events
            ) WHERE value_shift_1 IS NOT NULL
        """,
        "target_shift_chunked": """
            SELECT event_id, user_id, value, value_shift_1 FROM (
                SELECT event_id, user_id, value,
                       LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_shift_1
                FROM events
            ) WHERE value_shift_1 IS NOT NULL
        """,
        "lag_features": """
            SELECT event_id, user_id, value_lag_1, value_lag_2 FROM (
                SELECT event_id, user_id,
                       LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag_1,
                       LAG(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag_2
                FROM events
            ) WHERE value_lag_1 IS NOT NULL AND value_lag_2 IS NOT NULL
        """,
        "multi_step_targets": """
            SELECT event_id, user_id,
                   array_to_string(
                       list_transform(nv, x -> CAST(CAST(floor(x * 1000000) AS BIGINT) AS VARCHAR)),
                       ',') AS next_vals
            FROM (
                SELECT event_id, user_id,
                       [LEAD(value, 1) OVER w, LEAD(value, 2) OVER w,
                        LEAD(value, 3) OVER w] AS nv
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            WHERE nv[1] IS NOT NULL AND nv[2] IS NOT NULL AND nv[3] IS NOT NULL
        """,
        "sessionize": f"SELECT event_id, user_id, session_id FROM ({sessionized})",
        "session_bounds": f"""
            SELECT user_id, session_id,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM ({sessionized})
            GROUP BY user_id, session_id
        """,
        "window_buckets": """
            SELECT CAST(FLOOR((rn - 1) / 1000) AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts
            FROM (SELECT ts, ROW_NUMBER() OVER (ORDER BY ts) AS rn FROM events)
            GROUP BY 1
        """,
        "asof_join": """
            WITH r AS (
                SELECT o_custkey AS user_id, o_orderdate,
                       MAX(o_totalprice) AS last_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, r.last_price
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
        """,
        "asof_join_forward": """
            WITH r AS (
                SELECT o_custkey AS user_id, o_orderdate,
                       MAX(o_totalprice) AS next_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, r.next_price
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts <= r.o_orderdate
        """,
        "forward_fill": """
            SELECT event_id, user_id,
                   LAST_VALUE(value_n IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value_ff
            FROM (SELECT event_id, user_id, ts,
                         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n
                  FROM events)
        """,
        "backward_fill": """
            SELECT event_id, user_id,
                   FIRST_VALUE(value_n IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS value_bf
            FROM (SELECT event_id, user_id, ts,
                         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n
                  FROM events)
        """,
        "range_join": """
            SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_shipped_60d
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
        """,
        "session_window_builtin": f"""
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 1 HOUR AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM ({sessionized})
            GROUP BY user_id, session_id
        """,
        "equidistant_check": """
            SELECT user_id, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_deltas
            FROM (SELECT user_id,
                         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                           - epoch_us(ts) AS d
                  FROM events)
            GROUP BY user_id
        """,
        "epoch_roundtrip": """
            SELECT event_id,
                   CAST(epoch_us(ts) AS DOUBLE) AS ts_us,
                   CAST(epoch_ms(ts) AS DOUBLE) AS ts_ms,
                   CAST(epoch_us(ts) * 1000 AS BIGINT) AS ts_ns,
                   make_timestamp(epoch_us(ts)) AS ts_rt
            FROM events
        """,
        "column_profile": """
            SELECT
              CAST(SUM(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_quantity,
              AVG(l_quantity) AS mean_l_quantity,
              CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS nd_l_quantity,
              CAST(SUM(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_extendedprice,
              AVG(l_extendedprice) AS mean_l_extendedprice,
              CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS nd_l_extendedprice,
              CAST(SUM(CASE WHEN l_discount IS NULL OR isnan(l_discount) THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_discount,
              AVG(l_discount) AS mean_l_discount,
              CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS nd_l_discount,
              CAST(SUM(CASE WHEN l_tax IS NULL OR isnan(l_tax) THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_tax,
              AVG(l_tax) AS mean_l_tax,
              CAST(COUNT(DISTINCT l_tax) AS BIGINT) AS nd_l_tax
            FROM lineitem
        """,
        "class_balance": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        """,
        "pad_tokens": r"""
            SELECT doc_id,
                   array_to_string(
                       list_transform(
                           (list_transform(string_split_regex(trim(text), '\s+'),
                                           x -> CAST(length(x) AS INT))
                            || [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0]
                           )[1:32],
                           x -> CAST(x AS VARCHAR)),
                       ',') AS tokens_str,
                   CAST(32 AS BIGINT) AS n_tok
            FROM documents
        """,
        "multi_lead_tokens": r"""
            SELECT doc_id, source,
                   array_to_string(list_transform(next_tokens, x -> CAST(x AS VARCHAR)), ',')
                       AS next_tokens_str
            FROM (
                SELECT doc_id, source,
                       LEAD(list_transform(string_split_regex(trim(text), '\s+'),
                                           x -> CAST(length(x) AS INT)))
                           OVER (PARTITION BY source ORDER BY doc_id) AS next_tokens
                FROM documents
            )
            WHERE next_tokens IS NOT NULL
        """,
        "mean_fill_pad": """
            WITH a AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(value) AS avg_v
                FROM events GROUP BY event_type
            ),
            m AS (SELECT AVG(n) AS n, AVG(avg_v) AS avg_v FROM a)
            SELECT n, round(avg_v, 6) AS avg_v FROM a
            UNION ALL
            SELECT m.n, round(m.avg_v, 6)
            FROM m, UNNEST(generate_series(1, 8 - (SELECT CAST(COUNT(*) AS INT) FROM a))) t(i)
        """,
        "pad_groups": """
            SELECT user_id,
                   CAST(greatest(cnt, 70) AS BIGINT) AS n_rows,
                   round(avg_v, 6) AS avg_value
            FROM (SELECT user_id, COUNT(*) AS cnt, AVG(value) AS avg_v
                  FROM events GROUP BY user_id)
        """,
        "partitioner_splits": """
            WITH nm AS (
                SELECT ts, ROW_NUMBER() OVER (ORDER BY ts) AS rn,
                       COUNT(*) OVER () AS total
                FROM events
            ),
            lab AS (
                SELECT ts, CAST((rn - 1) // (total // 4) AS INT) AS bucket
                FROM nm WHERE (rn - 1) // (total // 4) < 4
            ),
            bounds AS (
                SELECT bucket,
                       MIN(epoch(ts)) AS s, MAX(epoch(ts)) AS e
                FROM lab GROUP BY bucket
            ),
            labeled AS (
                SELECT l.ts, l.bucket,
                       CASE WHEN epoch(l.ts) >= b.s
                             AND epoch(l.ts) < b.s + (b.e - b.s) * 0.7 THEN 'train'
                            WHEN epoch(l.ts) >= b.s + (b.e - b.s) * 0.7
                             AND epoch(l.ts) < b.e THEN 'test'
                            ELSE NULL END AS split
                FROM lab l JOIN bounds b ON l.bucket = b.bucket
            )
            SELECT CAST(bucket AS BIGINT) AS bucket, split,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(ts) AS min_ts, MAX(ts) AS max_ts
            FROM labeled WHERE split IS NOT NULL
            GROUP BY bucket, split
        """,
        "validation_stats": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   AVG(value) AS avg_value,
                   MIN(ts) AS min_ts, MAX(ts) AS max_ts
            FROM events
        """,
        "dup_timestamp_check": """
            SELECT user_id, ts, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, ts HAVING COUNT(*) > 1
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                   md5({_NORM}) AS fingerprint
            FROM documents
        """,
        "quality": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS digit_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST((length(text) - length(replace(text, ' the ', ''))) / 5
                      + (length(text) - length(replace(text, ' and ', ''))) / 5
                      + (length(text) - length(replace(text, ' of ', ''))) / 4
                      + (length(text) - length(replace(text, ' to ', ''))) / 4
                      + (length(text) - length(replace(text, ' is ', ''))) / 4 AS BIGINT) AS stopword_hits
            FROM documents
        """,
        "quality_score": """
            WITH q AS (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
                       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                       CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS n_punct,
                       CAST((length(text) - length(replace(text, ' the ', ''))) / 5
                          + (length(text) - length(replace(text, ' and ', ''))) / 5
                          + (length(text) - length(replace(text, ' of ', ''))) / 4
                          + (length(text) - length(replace(text, ' to ', ''))) / 4
                          + (length(text) - length(replace(text, ' is ', ''))) / 4 AS BIGINT) AS n_stop
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens, n_digit, n_punct, n_stop,
                       greatest(n_chars, 1) AS nz,
                       CASE WHEN n_tokens = 0 THEN 0.0
                            ELSE CAST(n_chars - n_space AS DOUBLE) / n_tokens END AS mtl
                FROM q
            )
            SELECT doc_id, CAST(
                  (CASE WHEN n_tokens >= 10 THEN 1 ELSE 0 END)
                + (CASE WHEN mtl >= 2 AND mtl <= 12 THEN 1 ELSE 0 END)
                + (CASE WHEN CAST(n_digit AS DOUBLE) / nz < 0.2 THEN 1 ELSE 0 END)
                + (CASE WHEN CAST(n_punct AS DOUBLE) / nz < 0.2 THEN 1 ELSE 0 END)
                + (CASE WHEN n_stop > 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / 5.0 AS quality_score
            FROM c
        """,
        "dataset_validator": """
            WITH s AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       COUNT(DISTINCT l_extendedprice) AS u_ep,
                       COUNT(DISTINCT l_discount) AS u_d,
                       COUNT(DISTINCT l_tax) AS u_t,
                       COUNT(DISTINCT l_linenumber) AS u_ln,
                       COUNT(DISTINCT l_partkey) AS u_pk,
                       COUNT(DISTINCT l_suppkey) AS u_sk,
                       SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS nn_ep,
                       SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS nn_d,
                       SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS nn_t,
                       SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS nn_ln,
                       SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS nn_pk,
                       SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS nn_sk
                FROM lineitem
            )
            SELECT 'class_balance' AS check, TRUE AS passed FROM s
            UNION ALL SELECT 'feature_count', (6 >= 4 AND 6 <= 500) FROM s
            UNION ALL SELECT 'feature_ratio', (CAST(6 AS DOUBLE) / n <= 0.1) FROM s
            UNION ALL SELECT 'feature_variability',
                (u_ep >= 10 AND nn_ep = 0 AND u_d >= 10 AND nn_d = 0
                 AND u_t >= 10 AND nn_t = 0 AND u_ln >= 10 AND nn_ln = 0
                 AND u_pk >= 10 AND nn_pk = 0 AND u_sk >= 10 AND nn_sk = 0) FROM s
            UNION ALL SELECT 'sample_size', (n >= 3000 AND n <= 50000) FROM s
        """,
        "lang_id": _lang_id_oracle(),
        "winnow_fingerprints": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS norm FROM documents),
            h AS (
                SELECT doc_id,
                       list_transform(generate_series(1, greatest(length(norm) - 7, 1)),
                           i -> CAST(('0x' || substr(md5(substr(norm, CAST(i AS INT), 8)), 1, 15)) AS BIGINT)) AS hs
                FROM n
            ),
            m AS (
                SELECT doc_id,
                       list_distinct(list_transform(generate_series(1, greatest(len(hs) - 3, 1)),
                           j -> list_min(hs[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS fps
                FROM h
            )
            SELECT doc_id, unnest(fps) AS fingerprint FROM m
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        # pairs -> transitive closure -> min reachable id per node; docs in
        # no pair are their own canonical id
        "dedup_clusters": f"""
            WITH RECURSIVE {_shingle_cte(12)},
            kept AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 100),
            fsh AS (SELECT s.doc_id, s.sh FROM shingles s JOIN kept k ON s.sh = k.sh),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN counts ca ON ca.doc_id = id_a
                JOIN counts cb ON cb.doc_id = id_b
                WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            walk(id, r) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON e.s = w.r
            ),
            comp AS (SELECT id, MIN(r) AS rep FROM walk GROUP BY id)
            SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS canonical_id
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        """,
        "cluster_best": f"""
            WITH RECURSIVE {_shingle_cte(12)},
            kept AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 100),
            fsh AS (SELECT s.doc_id, s.sh FROM shingles s JOIN kept k ON s.sh = k.sh),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN counts ca ON ca.doc_id = id_a
                JOIN counts cb ON cb.doc_id = id_b
                WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            walk(id, r) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON e.s = w.r
            ),
            best AS (
                SELECT id, rep FROM (
                    SELECT w.id, d2.doc_id AS rep,
                           row_number() OVER (
                               PARTITION BY w.id
                               ORDER BY d2.n_chars DESC, d2.doc_id DESC
                           ) AS rn
                    FROM walk w JOIN documents d2 ON d2.doc_id = w.r
                ) WHERE rn = 1
            )
            SELECT d.doc_id, COALESCE(b.rep, d.doc_id) AS canonical_id
            FROM documents d LEFT JOIN best b ON b.id = d.doc_id
        """,
        # sortish batching: global (len, id) row number -> fixed-size cuts
        # -> per-batch padding stats (all-integer arithmetic except the
        # final waste division)
        "length_batches": """
            WITH seqs AS (
                SELECT event_id,
                       CAST(len(generate_series(event_id % 100,
                                event_id % 100 + event_id % 5)) AS BIGINT)
                           AS n_tok
                FROM events
            ),
            r AS (
                SELECT event_id, n_tok,
                       row_number() OVER (ORDER BY n_tok, event_id) AS rn
                FROM seqs
            ),
            -- // is integer division: CAST(x/64 AS BIGINT) would ROUND
            b AS (SELECT *, CAST((rn - 1) // 64 AS BIGINT) AS batch_id FROM r)
            SELECT batch_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(max(n_tok) AS BIGINT) AS max_len,
                   CAST(sum(n_tok) AS BIGINT) AS sum_len,
                   CASE WHEN max(n_tok) > 0
                        THEN round(1.0 - CAST(sum(n_tok) AS DOUBLE)
                                   / (CAST(count(*) AS DOUBLE)
                                      * CAST(max(n_tok) AS DOUBLE)), 6) + 0.0
                        ELSE 0.0 END AS pad_waste
            FROM b GROUP BY batch_id
        """,
        "repetition": f"""
            WITH n AS (
                SELECT doc_id, {_NORM} AS norm FROM documents
            ),
            w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words FROM n)
            SELECT doc_id,
                   round(CASE WHEN length(norm) = 0 THEN 0.0
                         ELSE 1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
                         END, 6) AS dup_word_ratio,
                   round(CASE WHEN length(norm) = 0 THEN 0.0
                         ELSE CAST(list_max(list_transform(list_distinct(words),
                                  w2 -> len(list_filter(words, x -> x = w2)))) AS DOUBLE)
                              / len(words)
                         END, 6) AS top_word_ratio,
                   round(CASE WHEN length(norm) <= 2 THEN 0.0
                         ELSE 1.0 - CAST(len(list_distinct(list_transform(
                                  generate_series(1, greatest(length(norm) - 2, 1)),
                                  i -> substr(norm, CAST(i AS INT), 3)))) AS DOUBLE)
                              / (length(norm) - 2)
                         END, 6) AS trigram_dup_ratio
            FROM w
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fingerprint, MIN(doc_id) AS doc_id
            FROM documents GROUP BY 1
        """,
        # raw gram strings where Spark groups xxhash64(gram) — count-based
        # stats are identical under any injective-modulo-collision key
        "dup_span_stats": f"""
            WITH d AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
            g AS (
                SELECT d.doc_id,
                       array_to_string(
                           list_slice(d.w, CAST(i AS INT), CAST(i AS INT) + 7),
                           chr(31)
                       ) AS gram
                FROM d, UNNEST(generate_series(1, len(d.w) - 7)) AS t(i)
            ),
            gd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            tot AS (SELECT gram, sum(c) AS tot FROM gd GROUP BY 1),
            per AS (
                SELECT gd.doc_id,
                       sum(gd.c) AS n_grams,
                       sum(CASE WHEN tot.tot >= 2 THEN gd.c ELSE 0 END) AS n_dup
                FROM gd JOIN tot USING (gram) GROUP BY 1
            )
            SELECT doc.doc_id,
                   CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
                        ELSE CAST(per.n_dup AS DOUBLE) / CAST(per.n_grams AS DOUBLE)
                   END AS dup_span_ratio
            FROM documents doc LEFT JOIN per USING (doc_id)
        """,
        # transform twin of dup_span_stats: every position covered by a
        # corpus-duplicated 8-gram is stripped; oracle groups raw gram
        # strings where Spark groups xxhash64(gram) (count-invariant)
        "remove_dup_spans": f"""
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            g AS (
                SELECT d.doc_id, CAST(i AS INT) AS i,
                       array_to_string(
                           list_slice(d.w, CAST(i AS INT), CAST(i AS INT) + 7),
                           chr(31)
                       ) AS gram
                FROM d, UNNEST(generate_series(1, len(d.w) - 7)) AS t(i)
            ),
            dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
            cov AS (
                SELECT DISTINCT g.doc_id, CAST(p AS INT) AS p
                FROM g JOIN dup USING (gram),
                     UNNEST(generate_series(g.i, g.i + 7)) AS c(p)
            ),
            wp AS (
                SELECT d.doc_id, CAST(p AS INT) AS p, d.w[CAST(p AS INT)] AS word
                FROM d, UNNEST(generate_series(1, len(d.w))) AS t(p)
            ),
            keep AS (SELECT wp.* FROM wp ANTI JOIN cov USING (doc_id, p)),
            reb AS (
                SELECT doc_id,
                       string_agg(word, ' ' ORDER BY p) AS cleaned_text,
                       count(*) AS k
                FROM keep GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(reb.cleaned_text, '') AS cleaned_text,
                   CAST(coalesce(reb.k, 0) AS BIGINT) AS n_kept,
                   CAST(len(d.w) - coalesce(reb.k, 0) AS BIGINT) AS n_removed
            FROM d LEFT JOIN reb USING (doc_id)
        """,
        "minhash_signatures": f"""
            WITH {_shingle_cte(12)}
            SELECT doc_id,
                   MIN(md5(sh || '#0')) AS mh_0,
                   MIN(md5(sh || '#1')) AS mh_1,
                   MIN(md5(sh || '#2')) AS mh_2,
                   MIN(md5(sh || '#3')) AS mh_3
            FROM shingles GROUP BY doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_shingle_cte(12)},
            kept AS (
                SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 100
            ),
            fsh AS (SELECT s.doc_id, s.sh FROM shingles s JOIN kept k ON s.sh = k.sh),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
        """,
        # exact shingle-Jaccard pair set: minhash_lsh_pairs output is a
        # subset by construction (exact verification); equality holds when
        # banding recall is 1.0 — verified at sf0.01 and sf0.1
        # the equivalence property IS the oracle: incremental (index v0 +
        # batch) must equal FULL-corpus exact-Jaccard clustering
        "incremental_dedup": f"""
            WITH RECURSIVE {_shingle_cte(12)},
            counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN counts ca ON ca.doc_id = id_a
                JOIN counts cb ON cb.doc_id = id_b
                WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            walk(id, r) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON e.s = w.r
            ),
            comp AS (SELECT id, MIN(r) AS rep FROM walk GROUP BY id)
            SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS canonical_id
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        """,
        "minhash_lsh_pairs": f"""
            WITH {_shingle_cte(12)},
            counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
        """,
        # brute-force md5-60bit simhash hamming ball; the Spark pigeonhole
        # candidate set is COMPLETE for hamming <= 3, so equality is by
        # construction, not data luck
        "simhash_pairs": f"""
            WITH shingles AS (
                SELECT DISTINCT doc_id, substr(norm, CAST(i AS INT), 8) AS sh
                FROM (SELECT doc_id, {_NORM} AS norm FROM documents),
                     UNNEST(generate_series(1, greatest(length(norm) - 7, 1))) AS t(i)
            ),
            hashed AS (
                SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
                FROM shingles
            ),
            bits AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM hashed, UNNEST(generate_series(0, 59)) AS t(b)
                GROUP BY doc_id, b
            ),
            sigs AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS sig
                FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
        """,
        "ann_topk": _ann_topk_oracle(),
        "ivf_topk": _IVF_TOPK_ORACLE,
        "ann_index_topk": _ivf_sql("vec_id % 10 <> 0"),
        "heavy_hitters": f"""
            WITH words AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
            )
            SELECT word, CAST(count(*) AS BIGINT) AS n
            FROM words WHERE word <> ''
            GROUP BY word
            ORDER BY n DESC, word
            LIMIT 100
        """,
        "redact_terms": f"""
            WITH words AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
            ),
            terms AS (
                SELECT word FROM words WHERE word <> ''
                GROUP BY word ORDER BY count(*) DESC, word LIMIT 3
            ),
            tl AS (SELECT list(word ORDER BY word) AS ts FROM terms),
            d AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS w
                FROM documents
            )
            SELECT d.doc_id,
                   array_to_string(
                       list_transform(d.w, x -> CASE
                           WHEN list_contains(tl.ts, lower(x)) THEN '[REDACTED]'
                           ELSE x END),
                       ' '
                   ) AS redacted_text,
                   CAST(len(list_filter(d.w, x -> list_contains(tl.ts, lower(x))))
                        AS BIGINT) AS n_redacted
            FROM d, tl
        """,
        # PII scan: same planted corpus, same dialect-portable patterns
        # (Java regex ∩ RE2), families counted independently on raw text
        "pii_scan": f"""
            WITH d AS ({_PII_PLANT})
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '{_PII_RE["email"]}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                       '{_PII_RE["ipv4"]}')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text,
                       '{_PII_RE["phone"]}')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text, '{_PII_RE["email"]}'))
                      + len(regexp_extract_all(text, '{_PII_RE["ipv4"]}'))
                      + len(regexp_extract_all(text, '{_PII_RE["phone"]}'))
                      AS BIGINT) AS n_pii
            FROM d
        """,
        # sequential redaction in sorted-family order; each step counts on
        # the text as redacted so far (no double counting)
        "redact_pii": f"""
            WITH d AS ({_PII_PLANT}),
            s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '{_PII_RE["email"]}')) AS c1,
                       regexp_replace(text, '{_PII_RE["email"]}', '[EMAIL]', 'g') AS t1
                FROM d
            ),
            s2 AS (
                SELECT doc_id, c1,
                       len(regexp_extract_all(t1, '{_PII_RE["ipv4"]}')) AS c2,
                       regexp_replace(t1, '{_PII_RE["ipv4"]}', '[IPV4]', 'g') AS t2
                FROM s1
            )
            SELECT doc_id,
                   regexp_replace(t2, '{_PII_RE["phone"]}', '[PHONE]', 'g')
                       AS redacted_text,
                   CAST(c1 + c2 + len(regexp_extract_all(t2,
                       '{_PII_RE["phone"]}')) AS BIGINT) AS n_redacted
            FROM s2
        """,
        # full relational replay: top-3 heavy-hitter terms -> one-pass corpus
        # stats -> per-term idf -> matching-(doc, term) tf -> per-doc BM25 sum,
        # ordered by the ROUNDED score (cross-engine-stable top-k boundary)
        "bm25_topk": f"""
            WITH w0 AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
            d AS (
                SELECT doc_id, w,
                       CAST(CASE WHEN array_to_string(w, '') = '' THEN 0
                            ELSE len(w) END AS DOUBLE) AS dl
                FROM w0
            ),
            terms AS (
                SELECT word FROM (SELECT unnest(w) AS word FROM w0)
                WHERE word <> ''
                GROUP BY word ORDER BY count(*) DESC, word LIMIT 3
            ),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
            dfs AS (
                SELECT t.word, CAST(count(*) AS DOUBLE) AS dft
                FROM terms t JOIN d ON list_contains(d.w, t.word)
                GROUP BY t.word
            ),
            idf AS (
                SELECT word, ln((s.n - dft + 0.5) / (dft + 0.5) + 1) AS idf
                FROM dfs, stats s
            ),
            exploded AS (SELECT doc_id, dl, unnest(w) AS word FROM d),
            tf AS (
                SELECT doc_id, dl, word, CAST(count(*) AS DOUBLE) AS tf
                FROM exploded JOIN terms USING (word)
                GROUP BY 1, 2, 3
            )
            SELECT tf.doc_id,
                   round(sum(i.idf * tf.tf * (1.2 + 1.0)
                             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))), 6) AS score
            FROM tf JOIN idf i USING (word), stats s
            GROUP BY tf.doc_id
            ORDER BY score DESC, tf.doc_id
            LIMIT 20
        """,
        "bm25_multi_topk": f"""
            WITH w0 AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
            d AS (
                SELECT doc_id, w,
                       CAST(CASE WHEN array_to_string(w, '') = '' THEN 0
                            ELSE len(w) END AS DOUBLE) AS dl
                FROM w0
            ),
            ranked AS (
                SELECT word,
                       row_number() OVER (ORDER BY count(*) DESC, word) AS rk
                FROM (SELECT unnest(w) AS word FROM w0)
                WHERE word <> ''
                GROUP BY word ORDER BY count(*) DESC, word LIMIT 6
            ),
            qterms AS (SELECT CAST((rk - 1) // 2 AS INT) AS query_id, word FROM ranked),
            terms AS (SELECT DISTINCT word FROM qterms),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
            dfs AS (
                SELECT t.word, CAST(count(*) AS DOUBLE) AS dft
                FROM terms t JOIN d ON list_contains(d.w, t.word)
                GROUP BY t.word
            ),
            idf AS (
                SELECT word, ln((s.n - dft + 0.5) / (dft + 0.5) + 1) AS idf
                FROM dfs, stats s
            ),
            exploded AS (SELECT doc_id, dl, unnest(w) AS word FROM d),
            tf AS (
                SELECT doc_id, dl, word, CAST(count(*) AS DOUBLE) AS tf
                FROM exploded JOIN terms USING (word)
                GROUP BY 1, 2, 3
            ),
            scoredq AS (
                SELECT q.query_id, tf.doc_id,
                       round(sum(i.idf * tf.tf * (1.2 + 1.0)
                                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))), 6) AS score
                FROM tf JOIN idf i USING (word) JOIN qterms q USING (word), stats s
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, doc_id, score FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, doc_id
                ) AS rn FROM scoredq
            ) WHERE rn <= 10
        """,
        "skew_profile": """
            WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
            t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM events)
            SELECT c.user_id, CAST(c.n AS BIGINT) AS n,
                   round(c.n / t.total, 6) AS fraction
            FROM c, t ORDER BY c.n DESC, c.user_id LIMIT 20
        """,
        # Spark `percentile` and DuckDB `quantile_cont` are both the type-7
        # (linear interpolation at p*(n-1)) definition — exact match
        "token_quantiles": """
            WITH toks AS (
                SELECT source,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tok
                FROM documents
            )
            SELECT source,
                   round(quantile_cont(n_tok, 0.5), 6) AS p50,
                   round(quantile_cont(n_tok, 0.9), 6) AS p90,
                   round(quantile_cont(n_tok, 0.99), 6) AS p99,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM toks GROUP BY source
        """,
        "length_histogram": """
            SELECT CAST((n_chars // 100) * 100 AS BIGINT) AS bin_start,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "tokenizer_fertility": r"""
            WITH t AS (
                SELECT source,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ws,
                       CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS bpe
                FROM documents
            )
            SELECT source,
                   CAST(sum(ws) AS BIGINT) AS ws_tokens,
                   CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
                   round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6) AS fertility
            FROM t GROUP BY source
        """,
        # sorted-word left fold replayed with list_reduce (0.0 prepended so
        # the addition sequence matches Spark's aggregate(initial=0.0)
        # exactly); vocab truncated top-1000 by (n DESC, word) — a total
        # order, so both engines keep the identical vocabulary
        "unigram_lm_score": f"""
            WITH {_unigram_scored_ctes()}
            SELECT doc_id, n_words, xent_nats, ppl FROM final
        """,
        # CCNet terciles on top of the same scored CTE chain: exact
        # quantile_cont == Spark percentile (the token_quantiles type-7
        # equivalence) over non-empty docs' ROUNDED ppl; empty docs get
        # their own label instead of polluting the head
        "ppl_buckets": f"""
            WITH {_unigram_scored_ctes()},
            cuts AS (
                SELECT quantile_cont(ppl, 0.333333) AS c1,
                       quantile_cont(ppl, 0.666667) AS c2
                FROM final WHERE n_words > 0
            )
            SELECT final.doc_id, final.n_words, final.ppl,
                   CASE WHEN final.n_words = 0 THEN 'empty'
                        WHEN final.ppl <= cuts.c1 THEN 'head'
                        WHEN final.ppl <= cuts.c2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM final, cuts
        """,
        # temperature-mixing replay: n^alpha normalizer as a source-sorted
        # left fold (matches the operator's driver-side fold sequence);
        # md5 membership identical to entity_split's portable map. pow()
        # is the one libm call — last-ulp divergence would need a doc's
        # u32/2^32 to sit within ~1e-16 of the rate (same accepted
        # fragility class as the minhash FRAGILITY NOTE)
        "temperature_sample": """
            WITH counts AS (
                SELECT source, count(*) AS n FROM documents GROUP BY 1
            ),
            zn AS (
                SELECT list_reduce(
                           list_prepend(0.0, list(pow(CAST(n AS DOUBLE), 0.3)
                                                  ORDER BY source)),
                           (acc, x) -> acc + x) AS z
                FROM counts
            ),
            rates AS (
                SELECT source,
                       least(1.0,
                             300.0 * (pow(CAST(n AS DOUBLE), 0.3) / zn.z)
                                 / CAST(n AS DOUBLE)) AS rate
                FROM counts, zn
            )
            SELECT d.doc_id, d.source, round(r.rate, 6) AS keep_frac
            FROM documents d JOIN rates r USING (source)
            WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#42'),
                                       1, 8)) AS BIGINT) / 4294967296.0
                  < r.rate
        """,
        "assign_shards": """
            WITH h AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || '#42') AS hx
                FROM documents
            )
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS INT)
                       AS shard,
                   CAST(row_number() OVER (
                        PARTITION BY CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8
                        ORDER BY CAST(('0x' || substr(hx, 9, 8)) AS BIGINT), doc_id
                    ) AS INT) AS pos
            FROM h
        """,
        # SemDeDup replay: the _ivf_sql quantizer CTEs (md5 seeds, argmax
        # tie -> larger idx matching array_max struct order), cell-bounded
        # pair self-join, recursive-CTE min-label closure for components,
        # survivor = lowest (rounded centroid cosine, vec_id)
        "semdedup": """
            WITH RECURSIVE
            vecs AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            seeds AS (
                SELECT e AS c,
                       row_number() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                       ) - 1 AS idx
                FROM vecs
                ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                LIMIT 8
            ),
            cents AS (
                SELECT idx, c,
                       CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN 1.0
                            ELSE sqrt(list_dot_product(c, c)) END AS cn
                FROM seeds
            ),
            assigned AS (
                SELECT v.vec_id, v.e, ct.idx, ct.c, ct.cn,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_dot_product(v.e, ct.c) / ct.cn DESC,
                                    ct.idx DESC
                       ) AS rnk
                FROM vecs v CROSS JOIN cents ct
            ),
            cells AS (
                SELECT vec_id, e, idx AS cell,
                       round(list_dot_product(e, c)
                             / (cn * sqrt(list_dot_product(e, e))), 4)
                           AS cent_cosine
                FROM assigned WHERE rnk = 1
            ),
            prs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM cells a JOIN cells b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.e, b.e) >= 0.4
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM prs
                UNION ALL SELECT id_b, id_a FROM prs
            ),
            reach(n, l) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.n
            ),
            comp AS (SELECT n AS node, min(l) AS component FROM reach GROUP BY 1),
            rk AS (
                SELECT c.vec_id,
                       row_number() OVER (
                           PARTITION BY cp.component
                           ORDER BY c.cent_cosine, c.vec_id
                       ) AS rn
                FROM cells c JOIN comp cp ON c.vec_id = cp.node
            )
            SELECT c.vec_id, CAST(c.cell AS INT) AS cell, c.cent_cosine,
                   coalesce(rk.rn = 1, true) AS keep
            FROM cells c LEFT JOIN rk ON c.vec_id = rk.vec_id
        """,
        # BPE replay: 8 unrolled rounds, each pair-count -> argmax ->
        # islands+parity merge rewrite — all integer/string logic, so
        # equality is exact; early exhaustion yields empty b{r} rows in
        # both engines
        "bpe_merges": f"""
            WITH v0 AS MATERIALIZED (
                SELECT word, count(*) AS wc,
                       list_transform(generate_series(1, length(word)),
                                      i -> word[CAST(i AS INT)]) AS syms
                FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            ),
            {', '.join(_bpe_round_ctes(r) for r in range(1, 9))}
            SELECT * FROM (
                {' UNION ALL '.join(f"SELECT {r} AS rank, lhs, rhs, CAST(freq AS BIGINT) AS freq FROM b{r}" for r in range(1, 9))}
            )
        """,
        # same unrolled rounds; the final vocab v8 aggregates to the
        # compression stats (the exhaustion fallback preserves the vocab,
        # so the aggregate is never over an emptied table)
        "bpe_compression": f"""
            WITH v0 AS MATERIALIZED (
                SELECT word, count(*) AS wc,
                       list_transform(generate_series(1, length(word)),
                                      i -> word[CAST(i AS INT)]) AS syms
                FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            ),
            {', '.join(_bpe_round_ctes(r) for r in range(1, 9))}
            SELECT CAST(count(*) AS BIGINT) AS vocab_words,
                   CAST(sum(wc * length(word)) AS BIGINT) AS tokens_before,
                   CAST(sum(wc * len(syms)) AS BIGINT) AS tokens_after,
                   round(CAST(sum(wc * length(word)) AS DOUBLE)
                         / CAST(sum(wc * len(syms)) AS DOUBLE), 6)
                       AS compression
            FROM v8
        """,
        # apply lane: the same 8 unrolled rounds produce the final word->
        # tokens mapping v8; documents then rejoin it positionally and
        # flatten in word order (word-closed BPE: neighbors never matter)
        "bpe_tokenize": f"""
            WITH v0 AS MATERIALIZED (
                SELECT word, count(*) AS wc,
                       list_transform(generate_series(1, length(word)),
                                      i -> word[CAST(i AS INT)]) AS syms
                FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            ),
            {', '.join(_bpe_round_ctes(r) for r in range(1, 9))},
            dw AS (
                SELECT doc_id,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, CAST(i AS INT) AS i, w[CAST(i AS INT)] AS word
                FROM dw, UNNEST(generate_series(1, len(w))) AS t(i)
                WHERE w[CAST(i AS INT)] <> ''
            ),
            per AS (
                SELECT p.doc_id,
                       flatten(list(v.syms ORDER BY p.i)) AS toks
                FROM pos p JOIN v8 v USING (word) GROUP BY 1
            )
            SELECT d.doc_id,
                   array_to_string(coalesce(per.toks,
                                            CAST([] AS VARCHAR[])), ' ')
                       AS tokens_str,
                   CAST(coalesce(len(per.toks), 0) AS INT) AS n_tok
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        # DSIR replay: md5-first-8-hex bucket map (the entity_split
        # portable hash), sorted-bucket fold with 0.0 prepended, rank on
        # the ROUNDED score with doc-id tie-break; zero-feature docs sort
        # last and are never selected
        "dsir_select": f"""
            WITH d AS (
                SELECT doc_id, source,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            gs AS (
                SELECT doc_id, source, unnest(w) AS g FROM d
                UNION ALL
                SELECT doc_id, source,
                       w[CAST(i AS INT)] || chr(31) || w[CAST(i AS INT) + 1]
                FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
            ),
            gb AS (
                SELECT doc_id, source,
                       CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 1024
                           AS bucket
                FROM gs
            ),
            feats AS (
                SELECT doc_id, bucket, count(*) AS tf FROM gb GROUP BY 1, 2
            ),
            cr AS (SELECT bucket, sum(tf) AS cr FROM feats GROUP BY 1),
            tr AS (SELECT CAST(sum(cr) AS DOUBLE) AS tr FROM cr),
            ct AS (
                SELECT bucket, count(*) AS ct FROM gb
                WHERE source = 'src1' GROUP BY 1
            ),
            tt AS (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) AS tt FROM ct),
            lam AS (
                SELECT cr.bucket,
                       ln((CAST(coalesce(ct.ct, 0) AS DOUBLE) + 1.0)
                          / (tt.tt + 1024.0))
                       - ln((CAST(cr.cr AS DOUBLE) + 1.0) / (tr.tr + 1024.0))
                           AS lam
                FROM cr LEFT JOIN ct USING (bucket), tr, tt
            ),
            per AS (
                SELECT f.doc_id,
                       list(CAST(f.tf AS DOUBLE) * lam.lam
                            ORDER BY f.bucket) AS terms,
                       sum(f.tf) AS n
                FROM feats f JOIN lam USING (bucket) GROUP BY 1
            ),
            scored AS (
                SELECT d.doc_id,
                       CAST(coalesce(per.n, 0) AS BIGINT) AS n_feats,
                       round(coalesce(
                           list_reduce(list_prepend(0.0, per.terms),
                                       (acc, x) -> acc + x), 0.0), 6)
                           AS logratio
                FROM d LEFT JOIN per USING (doc_id)
            )
            SELECT doc_id, n_feats, logratio,
                   (n_feats > 0) AND
                   (row_number() OVER (
                        ORDER BY (n_feats > 0) DESC, logratio DESC, doc_id
                    ) <= 100) AS selected
            FROM scored
        """,
        # Stupid Backoff replay: '' sentinel marks the first position (can
        # never be a real word post-normalization); per-doc fold sorted by
        # (w1, w2) with 0.0 prepended matches Spark's addition sequence
        "stupid_backoff_score": f"""
            WITH d AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            ),
            uni AS (
                SELECT word, count(*) AS n FROM (
                    SELECT unnest(w) AS word FROM d
                ) WHERE word <> '' GROUP BY 1
            ),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni),
            big AS (
                SELECT w1, w2, count(*) AS n FROM (
                    SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
                    FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
                    WHERE w[1] <> ''
                ) GROUP BY 1, 2
                ORDER BY n DESC, w1, w2 LIMIT 500
            ),
            pos AS (
                SELECT doc_id,
                       CASE WHEN i = 1 THEN '' ELSE w[CAST(i AS INT) - 1] END AS w1,
                       w[CAST(i AS INT)] AS w2
                FROM d, UNNEST(generate_series(1, len(w))) AS t(i)
                WHERE w[1] <> ''
            ),
            tf AS (
                SELECT doc_id, w1, w2, count(*) AS tf FROM pos GROUP BY 1, 2, 3
            ),
            j AS (
                SELECT tf.doc_id, tf.w1, tf.w2, tf.tf,
                       CASE
                           WHEN tf.w1 = '' THEN
                               ln(CAST(coalesce(u2.n, 1) AS DOUBLE) / tot.t)
                           WHEN big.n IS NOT NULL THEN
                               ln(CAST(big.n AS DOUBLE)
                                  / CAST(coalesce(u1.n, 1) AS DOUBLE))
                           ELSE
                               ln(0.4 * CAST(coalesce(u2.n, 1) AS DOUBLE) / tot.t)
                       END AS s
                FROM tf
                LEFT JOIN big ON tf.w1 = big.w1 AND tf.w2 = big.w2
                LEFT JOIN uni u1 ON tf.w1 = u1.word
                LEFT JOIN uni u2 ON tf.w2 = u2.word
                CROSS JOIN tot
            ),
            arr AS (
                SELECT doc_id,
                       list(CAST(tf AS DOUBLE) * s ORDER BY w1, w2) AS terms,
                       sum(tf) AS L
                FROM j GROUP BY 1
            ),
            scored AS (
                SELECT doc_id, L,
                       -list_reduce(list_prepend(0.0, terms),
                                    (acc, x) -> acc + x)
                           / CAST(L AS DOUBLE) AS xent
                FROM arr
            )
            SELECT doc.doc_id,
                   CAST(coalesce(s.L, 0) AS BIGINT) AS n_words,
                   round(coalesce(s.xent, 0.0), 6) AS xent_nats,
                   round(exp(coalesce(s.xent, 0.0)), 6) AS ppl
            FROM documents doc LEFT JOIN scored s USING (doc_id)
        """,
        # Kneser–Ney replay: the whole model (left marginal c1/nl,
        # continuation counts r, type total B) derives from the SAME
        # top-500 bigram table; expression order mirrors the Spark plan
        # term-for-term ((d*nl)/c1)*pcont so the float fold replays
        "kneser_ney_score": f"""
            WITH d AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            ),
            big AS (
                SELECT w1, w2, count(*) AS n FROM (
                    SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
                    FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
                    WHERE w[1] <> ''
                ) GROUP BY 1, 2
                ORDER BY n DESC, w1, w2 LIMIT 500
            ),
            lft AS (
                SELECT w1, CAST(sum(n) AS DOUBLE) AS c1,
                       CAST(count(*) AS DOUBLE) AS nl
                FROM big GROUP BY 1
            ),
            cont AS (
                SELECT w2, CAST(count(*) AS DOUBLE) AS r FROM big GROUP BY 1
            ),
            ty AS (SELECT CAST(count(*) AS DOUBLE) AS B FROM big),
            pos AS (
                SELECT doc_id,
                       CASE WHEN i = 1 THEN ''
                            ELSE w[CAST(i AS INT) - 1] END AS w1,
                       w[CAST(i AS INT)] AS w2
                FROM d, UNNEST(generate_series(1, len(w))) AS t(i)
                WHERE w[1] <> ''
            ),
            tf AS (
                SELECT doc_id, w1, w2, count(*) AS tf FROM pos GROUP BY 1, 2, 3
            ),
            j AS (
                SELECT tf.doc_id, tf.w1, tf.w2, tf.tf,
                       CASE WHEN tf.w1 <> '' AND lft.c1 IS NOT NULL THEN
                           ln(greatest(CAST(coalesce(big.n, 0) AS DOUBLE)
                                       - 0.75, 0.0) / lft.c1
                              + 0.75 * lft.nl / lft.c1
                                * (greatest(coalesce(cont.r, 0.0), 1.0)
                                   / ty.B))
                       ELSE
                           ln(greatest(coalesce(cont.r, 0.0), 1.0) / ty.B)
                       END AS s
                FROM tf
                LEFT JOIN big ON tf.w1 = big.w1 AND tf.w2 = big.w2
                LEFT JOIN lft ON tf.w1 = lft.w1
                LEFT JOIN cont ON tf.w2 = cont.w2
                CROSS JOIN ty
            ),
            arr AS (
                SELECT doc_id,
                       list(CAST(tf AS DOUBLE) * s ORDER BY w1, w2) AS terms,
                       sum(tf) AS L
                FROM j GROUP BY 1
            ),
            scored AS (
                SELECT doc_id, L,
                       -list_reduce(list_prepend(0.0, terms),
                                    (acc, x) -> acc + x)
                           / CAST(L AS DOUBLE) AS xent
                FROM arr
            )
            SELECT doc.doc_id,
                   CAST(coalesce(s.L, 0) AS BIGINT) AS n_words,
                   round(coalesce(s.xent, 0.0), 6) AS xent_nats,
                   round(exp(coalesce(s.xent, 0.0)), 6) AS ppl
            FROM documents doc LEFT JOIN scored s USING (doc_id)
        """,
        # co-occurrence PMI replay: same canonical unordered pairs at
        # distance <= 2, top-500 vocab gate, marginals as pair-table row
        # sums (self-pairs twice), D = 2·Σc, pmi = ln(c·D/(m1·m2))
        "cooccurrence_pmi": f"""
            WITH d AS (
                SELECT CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            voc AS (
                SELECT word FROM (
                    SELECT unnest(w) AS word FROM d
                ) GROUP BY 1
                ORDER BY count(*) DESC, word LIMIT 500
            ),
            pr AS (
                SELECT least(w[CAST(i AS INT)], w[CAST(i + dd AS INT)]) AS w1,
                       greatest(w[CAST(i AS INT)], w[CAST(i + dd AS INT)]) AS w2
                FROM d,
                     UNNEST(generate_series(1, len(w) - 1)) AS t(i),
                     UNNEST(generate_series(1, 2)) AS s(dd)
                WHERE CAST(i + dd AS INT) <= len(w)
            ),
            cnt AS (
                SELECT pr.w1, pr.w2, CAST(count(*) AS DOUBLE) AS c
                FROM pr
                JOIN voc v1 ON pr.w1 = v1.word
                JOIN voc v2 ON pr.w2 = v2.word
                GROUP BY 1, 2
            ),
            marg AS (
                SELECT w, sum(c) AS m FROM (
                    SELECT w1 AS w, c FROM cnt
                    UNION ALL
                    SELECT w2 AS w, c FROM cnt
                ) GROUP BY 1
            ),
            tot AS (SELECT sum(c) * 2 AS D FROM cnt)
            SELECT cnt.w1, cnt.w2, CAST(c AS BIGINT) AS n_pairs,
                   round(ln(c * tot.D / (m1.m * m2.m)), 6) + 0.0 AS pmi,
                   round(greatest(ln(c * tot.D / (m1.m * m2.m)), 0.0), 6)
                       + 0.0 AS ppmi
            FROM cnt
            JOIN marg m1 ON cnt.w1 = m1.w
            JOIN marg m2 ON cnt.w2 = m2.w
            CROSS JOIN tot
            WHERE c >= 2
        """,
        # exact replay of the one-aggregation OLS: identical sufficient
        # statistics, Cramer 3x3 solve (Spark side solves by LAPACK — both
        # are backward-stable on this well-conditioned Gram matrix, so the
        # round-6 coefficients agree structurally)
        "linear_model": f"""
            WITH {_lag_ols_ctes()}
            SELECT f.feature,
                   round(CASE f.feature WHEN 'intercept' THEN beta.b0
                                        WHEN 'value_lag_1' THEN beta.b1
                                        ELSE beta.b2 END, 6) AS coef
            FROM beta,
                 (VALUES ('intercept'), ('value_lag_1'), ('value_lag_2')) f(feature)
        """,
        "irls_step": f"""
            WITH {_irls_step_ctes()}
            SELECT t.term,
                   round(CASE t.term WHEN 'intercept' THEN beta.b0
                                     WHEN 'log_likelihood' THEN s.ll
                                     WHEN 'value_lag_1' THEN beta.b1
                                     ELSE beta.b2 END, 6) AS value
            FROM beta, s,
                 (VALUES ('intercept'), ('log_likelihood'),
                         ('value_lag_1'), ('value_lag_2')) t(term)
        """,
        # full-pipeline replay: lag features -> global OLS (Cramer) ->
        # partitioner bucket/split labeling (same row-count bucketing +
        # linear time-range split as the partitioner_splits oracle, over the
        # lag-complete subset) -> per-(bucket, feature) mean |SHAP|
        "masv_linear": f"""
            WITH {_lag_ols_ctes()},
            nm AS (
                SELECT ts, l1, l2, ROW_NUMBER() OVER (ORDER BY ts) AS rn,
                       COUNT(*) OVER () AS total
                FROM d
            ),
            lab AS (
                SELECT ts, l1, l2, CAST((rn - 1) // (total // 4) AS INT) AS bucket
                FROM nm WHERE (rn - 1) // (total // 4) < 4
            ),
            bounds AS (
                SELECT bucket, MIN(epoch(ts)) AS s, MAX(epoch(ts)) AS e
                FROM lab GROUP BY bucket
            ),
            train AS (
                SELECT l.bucket, l.l1, l.l2
                FROM lab l JOIN bounds b ON l.bucket = b.bucket
                WHERE epoch(l.ts) >= b.s
                  AND epoch(l.ts) < b.s + (b.e - b.s) * 0.7
            )
            SELECT CAST(t.bucket AS BIGINT) AS bucket, f.feature,
                   round(avg(CASE WHEN f.feature = 'value_lag_1'
                                  THEN abs(beta.b1 * (t.l1 - beta.m1))
                                  ELSE abs(beta.b2 * (t.l2 - beta.m2)) END), 6) AS masv
            FROM train t, beta,
                 (VALUES ('value_lag_1'), ('value_lag_2')) f(feature)
            GROUP BY t.bucket, f.feature
        """,
        # greedy capacity-reset recurrence via recursive CTE (one step per
        # sequence rank; max depth = max sequences per entity)
        "pack_greedy": """
            WITH RECURSIVE seqs AS (
                SELECT user_id, toks, CAST(len(toks) AS BIGINT) AS ln,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM (SELECT user_id, ts,
                             generate_series(event_id % 100,
                                             event_id % 100 + event_id % 5) AS toks
                      FROM events)
            ),
            walk AS (
                SELECT user_id, rn, ln, toks, CAST(0 AS BIGINT) AS bin_id, ln AS fill
                FROM seqs WHERE rn = 1
                UNION ALL
                SELECT s.user_id, s.rn, s.ln, s.toks,
                       CASE WHEN w.fill + s.ln > 32 THEN w.bin_id + 1 ELSE w.bin_id END,
                       CASE WHEN w.fill + s.ln > 32 THEN s.ln ELSE w.fill + s.ln END
                FROM walk w JOIN seqs s ON s.user_id = w.user_id AND s.rn = w.rn + 1
            )
            SELECT user_id, bin_id,
                   array_to_string(flatten(list(toks ORDER BY rn)), ',') AS tokens,
                   CAST(count(*) AS INT) AS n_seqs,
                   CAST(sum(ln) AS INT) AS n_tok
            FROM walk GROUP BY 1, 2
        """,
        "cosine_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                   ), 4) AS cosine
            FROM embeddings e
            ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                     ) DESC, e.vec_id
            LIMIT 10
        """,
        "embedding_near_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        # algorithm replay, not exact-set comparison: same deterministic SRP
        # hyperplanes, same "candidate iff hamming(sig_a, sig_b) <= 2"
        # multi-probe rule, same exact-cosine verify — equality with the
        # Spark LSH path is structural at any threshold (non-vacuous: the
        # pair set is non-empty at both SFs)
        "embedding_near_pairs_lsh": _embedding_lsh_pairs_oracle(),
        "media_bytes": """
            SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "rolling_features": """
            SELECT event_id, user_id,
                   CAST(count(value) OVER w AS BIGINT) AS value_count_3600s,
                   round(sum(value) OVER w, 6) AS value_sum_3600s,
                   round(avg(value) OVER w, 6) AS value_avg_3600s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
        """,
        "rolling_row": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w, 6) AS value_avg_last3,
                   round(sum(value) OVER w, 6) AS value_sum_last3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        """,
        # identical fold (oldest-first, (num,den) -> (num*a + x, den*a + 1))
        # over the identical 200-row truncated frame as the engine's ewma
        "normalize_expanding": """
            SELECT event_id, user_id,
                   round((value - avg(value) OVER w) / nullif(stddev_samp(value) OVER w, 0), 6) AS value_z,
                   round((value - min(value) OVER w)
                         / nullif(max(value) OVER w - min(value) OVER w, 0), 6) AS value_mm
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        """,
        # exact full-history fold (the segmented path has no frame
        # truncation — UNBOUNDED PRECEDING is the right oracle)
        "ewma_segmented": f"""
            SELECT event_id, user_id,
                   round(s.num / s.den, 6) AS value_ewma
            FROM (
                SELECT event_id, user_id,
                       list_reduce(
                           list_transform(
                               list(CAST(value AS DOUBLE)) OVER w,
                               x -> {{'num': x, 'den': CAST(1.0 AS DOUBLE)}}
                           ),
                           (a, b) -> {{'num': a.num * {2.0 ** (-1.0 / _EWMA_HL)!r} + b.num,
                                       'den': a.den * {2.0 ** (-1.0 / _EWMA_HL)!r} + b.den}}
                       ) AS s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
        """,
        "ewma": f"""
            SELECT event_id, user_id,
                   round(s.num / s.den, 6) AS value_ewma
            FROM (
                SELECT event_id, user_id,
                       list_reduce(
                           list_transform(
                               list(CAST(value AS DOUBLE)) OVER w,
                               x -> {{'num': x, 'den': CAST(1.0 AS DOUBLE)}}
                           ),
                           (a, b) -> {{'num': a.num * {2.0 ** (-1.0 / _EWMA_HL)!r} + b.num,
                                       'den': a.den * {2.0 ** (-1.0 / _EWMA_HL)!r} + b.den}}
                       ) AS s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN {_EWMA_K} PRECEDING AND CURRENT ROW)
            )
        """,
        # fold = ceil(rn*K/n)-1 is exactly the engine's NTILE-style edge
        # formula edges[f] = floor(f*n/K): rn in (f*n/K, (f+1)*n/K]
        "purged_cv": """
            WITH r AS (
                SELECT ts, ROW_NUMBER() OVER (ORDER BY ts) AS rn,
                       COUNT(*) OVER () AS n
                FROM events
            ),
            fb AS (
                SELECT CAST(ceil(rn * 5.0 / n) AS INT) - 1 AS fold,
                       min(ts) AS lo, max(ts) AS hi
                FROM r GROUP BY 1
            )
            SELECT fb.fold,
                   CAST(sum(CASE WHEN e.ts < fb.lo
                                   OR e.ts > fb.hi + INTERVAL 1800 SECOND
                            THEN 1 ELSE 0 END) AS BIGINT) AS train_rows,
                   CAST(sum(CASE WHEN e.ts >= fb.lo AND e.ts <= fb.hi
                            THEN 1 ELSE 0 END) AS BIGINT) AS test_rows,
                   round(epoch(min(fb.lo)), 6) AS test_lo,
                   round(epoch(min(fb.hi)), 6) AS test_hi
            FROM events e CROSS JOIN fb
            GROUP BY fb.fold
        """,
        "resample": """
            SELECT user_id,
                   floor(epoch(ts) / 21600) * 21600.0 AS bucket_start,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(value) AS BIGINT) AS value_count,
                   round(avg(value), 6) AS value_avg,
                   min(value) AS value_min,
                   max(value) AS value_max,
                   arg_min(value, ts) AS value_first,
                   arg_max(value, ts) AS value_last
            FROM events
            GROUP BY 1, 2
        """,
        "interpolate": """
            WITH base AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS v
                FROM events
            ),
            w AS (
                SELECT event_id, user_id, epoch(ts) AS t, v,
                       last_value(CASE WHEN v IS NOT NULL
                                       THEN {'t': epoch(ts), 'v': v} END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
                       first_value(CASE WHEN v IS NOT NULL
                                        THEN {'t': epoch(ts), 'v': v} END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n
                FROM base
            )
            SELECT event_id, user_id,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN p IS NOT NULL AND n IS NOT NULL
                              THEN p.v + (n.v - p.v) * (t - p.t) / (n.t - p.t)
                         END, 6) AS v_interp
            FROM w
        """,
        "entity_split": """
            SELECT user_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#42'), 1, 8))
                             AS BIGINT) / 4294967296.0 < 0.3
                        THEN 'test' ELSE 'train' END AS split,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events
            GROUP BY 1, 2
        """,
        "pack_chunks": """
            WITH seqs AS (
                SELECT user_id, ts,
                       generate_series(event_id % 100,
                                       event_id % 100 + event_id % 5) AS toks
                FROM events
            ),
            off AS (
                SELECT user_id, ts, toks,
                       COALESCE(SUM(len(toks)) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS off0
                FROM seqs
            ),
            tok AS (
                SELECT user_id,
                       unnest(toks) AS tk,
                       off0 + unnest(generate_series(1, len(toks))) - 1 AS gpos
                FROM off
            )
            SELECT user_id,
                   CAST(floor(gpos / 32) AS BIGINT) AS block_id,
                   array_to_string(list(tk ORDER BY gpos), ',') AS tokens,
                   CAST(count(*) AS BIGINT) AS n_filled
            FROM tok
            GROUP BY 1, 2
            HAVING count(*) = 32
        """,
        "decontaminate": """
            WITH seqs AS (
                SELECT event_id, user_id,
                       generate_series(event_id % 100,
                                       event_id % 100 + event_id % 5) AS toks
                FROM events
            ),
            tr AS (SELECT * FROM seqs WHERE user_id % 7 <> 0),
            ev AS (SELECT * FROM seqs WHERE user_id % 7 = 0),
            tg AS (
                SELECT DISTINCT event_id,
                       array_to_string(list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 2), ',') AS g
                FROM tr, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            ),
            eg AS (
                SELECT DISTINCT
                       array_to_string(list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 2), ',') AS g
                FROM ev, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            )
            SELECT event_id, user_id FROM tr
            WHERE event_id NOT IN (SELECT DISTINCT event_id FROM tg JOIN eg USING (g))
        """,
        # contamination rate: per-eval-doc distinct grams LEFT JOIN the
        # (train ∩ eval) gram set; counts are exact ints, rate = one IEEE
        # division rounded 6
        "contamination_rate": """
            WITH seqs AS (
                SELECT event_id, user_id,
                       generate_series(event_id % 100,
                                       event_id % 100 + event_id % 5) AS toks
                FROM events
            ),
            tr AS (SELECT * FROM seqs WHERE user_id % 7 <> 0),
            ev AS (SELECT * FROM seqs WHERE user_id % 7 = 0),
            eg AS (
                SELECT DISTINCT event_id,
                       array_to_string(list_slice(toks, CAST(i AS INT),
                                                  CAST(i AS INT) + 2), ',') AS g
                FROM ev, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            ),
            tg AS (
                SELECT DISTINCT
                       array_to_string(list_slice(toks, CAST(i AS INT),
                                                  CAST(i AS INT) + 2), ',') AS g
                FROM tr, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            ),
            hit AS (SELECT DISTINCT g FROM tg JOIN (SELECT DISTINCT g FROM eg) e2 USING (g))
            SELECT eg.event_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hit,
                   round(CAST(sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) + 0.0 AS rate
            FROM eg LEFT JOIN hit h USING (g)
            GROUP BY eg.event_id
        """,
        # per-group rank-to-uniform: avg rank from per-type cumulative
        # counts over the distinct-value table (NULLs pass through, don't
        # count toward n)
        "quantile_normalize": """
            WITH v AS (
                SELECT event_type, value, count(*) AS c
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, value
            ),
            r AS (
                SELECT event_type, value, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY value) AS cum,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM v
            )
            SELECT e.event_id, e.event_type, e.value,
                   round((CAST(r.cum AS DOUBLE) - CAST(r.c AS DOUBLE)
                          + (CAST(r.c AS DOUBLE) + 1.0) / 2.0 - 0.5)
                         / CAST(r.n AS DOUBLE), 6) + 0.0 AS value_qn
            FROM events e
            LEFT JOIN r ON r.event_type = e.event_type AND r.value = e.value
        """,
        "training_windows": """
            WITH seqs AS (
                SELECT event_id,
                       generate_series(event_id % 100,
                                       event_id % 100 + event_id % 5) AS toks
                FROM events
            ),
            w AS (
                SELECT event_id, toks,
                       unnest(generate_series(0, len(toks) - 4)) AS w
                FROM seqs WHERE len(toks) > 3
            )
            SELECT event_id,
                   CAST(w AS BIGINT) AS win_id,
                   array_to_string(list_slice(toks, CAST(w + 1 AS INT),
                                              CAST(w + 3 AS INT)), ',') AS context,
                   CAST(toks[CAST(w + 4 AS INT)] AS BIGINT) AS target
            FROM w
        """,
        "decontaminate_bloom": """
            WITH seqs AS (
                SELECT event_id, user_id,
                       generate_series(event_id % 100,
                                       event_id % 100 + event_id % 5) AS toks
                FROM events
            ),
            tr AS (SELECT * FROM seqs WHERE user_id % 7 <> 0),
            ev AS (SELECT * FROM seqs WHERE user_id % 7 = 0),
            eg AS (
                SELECT DISTINCT
                       array_to_string(list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 2),
                                       chr(31)) AS g
                FROM ev, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            ),
            bits AS (
                SELECT DISTINCT
                       CAST(('0x' || substr(md5(g || '#7#' || CAST(j AS VARCHAR)), 1, 8))
                            AS BIGINT) % 4096 AS pos
                FROM eg, UNNEST([0, 1]) AS jj(j)
            ),
            tg AS (
                SELECT event_id,
                       array_to_string(list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 2),
                                       chr(31)) AS g
                FROM tr, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
            ),
            bad AS (
                SELECT DISTINCT event_id FROM tg
                WHERE CAST(('0x' || substr(md5(g || '#7#0'), 1, 8)) AS BIGINT) % 4096
                          IN (SELECT pos FROM bits)
                  AND CAST(('0x' || substr(md5(g || '#7#1'), 1, 8)) AS BIGINT) % 4096
                          IN (SELECT pos FROM bits)
            )
            SELECT event_id, user_id FROM tr
            WHERE event_id NOT IN (SELECT event_id FROM bad)
        """,
        "countmin_freq": f"""
            WITH words AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
            ),
            wc AS (
                SELECT word, CAST(count(*) AS BIGINT) AS n
                FROM words WHERE word <> '' GROUP BY word
            ),
            top AS (SELECT * FROM wc ORDER BY n DESC, word LIMIT 10),
            sketch AS (
                SELECT j,
                       CAST(('0x' || substr(md5(word || '#5#' || CAST(j AS VARCHAR)), 1, 8))
                            AS BIGINT) % 256 AS bucket,
                       CAST(count(*) AS BIGINT) AS c
                FROM words, UNNEST([0, 1, 2]) AS jj(j)
                WHERE word <> ''
                GROUP BY 1, 2
            ),
            probes AS (
                SELECT t.word, t.n, jj.j,
                       CAST(('0x' || substr(md5(t.word || '#5#' || CAST(jj.j AS VARCHAR)), 1, 8))
                            AS BIGINT) % 256 AS bucket
                FROM top t, UNNEST([0, 1, 2]) AS jj(j)
            )
            SELECT p.word, p.n AS n_exact,
                   CAST(min(COALESCE(s.c, 0)) AS BIGINT) AS n_est
            FROM probes p LEFT JOIN sketch s USING (j, bucket)
            GROUP BY p.word, p.n
        """,
        # KMV replay: the md5-first-8-hex hash lane is engine-portable, so
        # both the bottom-32 hash sets and the (k-1)/U_(k) estimates are
        # bit-identical; trigram shingles join with chr(31)
        "kmv_distinct": f"""
            WITH d AS (
                SELECT source,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            g AS (
                SELECT source,
                       w[CAST(i AS INT)] || chr(31) || w[CAST(i AS INT) + 1]
                           || chr(31) || w[CAST(i AS INT) + 2] AS e
                FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            ),
            h AS (
                SELECT DISTINCT source,
                       CAST(('0x' || substr(md5(e || '#7'), 1, 8)) AS BIGINT) AS h
                FROM g
            ),
            r AS (
                SELECT source, h,
                       row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h
            ),
            s AS (
                SELECT source, CAST(count(*) AS INT) AS n_hashes,
                       max(CASE WHEN rn = 32 THEN h END) AS hk
                FROM r WHERE rn <= 32 GROUP BY 1
            )
            SELECT source, n_hashes,
                   round(CASE WHEN n_hashes < 32 THEN CAST(n_hashes AS DOUBLE)
                              ELSE CAST(31 AS DOUBLE) * 4294967296.0
                                   / (CAST(hk AS DOUBLE) + 1.0) END, 6)
                       AS est_distinct
            FROM s
        """,
        "kmv_overlap": f"""
            WITH d AS (
                SELECT source,
                       CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split({_NORM}, ' ') END AS w
                FROM documents
            ),
            g AS (
                SELECT source,
                       w[CAST(i AS INT)] || chr(31) || w[CAST(i AS INT) + 1]
                           || chr(31) || w[CAST(i AS INT) + 2] AS e
                FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            ),
            h AS (
                SELECT DISTINCT source,
                       CAST(('0x' || substr(md5(e || '#7'), 1, 8)) AS BIGINT) AS h
                FROM g
            ),
            r AS (
                SELECT source, h,
                       row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h
            ),
            sk AS (
                SELECT source, list(h ORDER BY h) AS ks
                FROM r WHERE rn <= 32 GROUP BY 1
            ),
            pr AS (
                SELECT a.source AS group_a, b.source AS group_b,
                       (list_sort(list_distinct(a.ks || b.ks)))[1:32] AS m,
                       len(list_intersect(a.ks, b.ks)) AS _ni,
                       list_intersect(a.ks, b.ks) AS ib
                FROM sk a JOIN sk b ON a.source < b.source
            )
            SELECT group_a, group_b,
                   round(CASE WHEN len(m) < 32 THEN CAST(len(m) AS DOUBLE)
                              ELSE CAST(31 AS DOUBLE) * 4294967296.0
                                   / (CAST(m[32] AS DOUBLE) + 1.0) END, 6)
                       AS union_est,
                   round(CAST(len(list_intersect(m, ib)) AS DOUBLE)
                         / CAST(len(m) AS DOUBLE), 6) AS jaccard_est
            FROM pr
        """,
        # ranking-metric replay: identical rank tie-breaks (score DESC,
        # doc), rank-ordered list_reduce folds for the DCG/AP sums, and
        # integer-ratio IEEE scores — bit-exact cross-engine
        "ranking_eval": f"""
            WITH d AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            ),
            n AS (SELECT doc_id, len(w) AS nw FROM d),
            t AS (SELECT doc_id, unnest(w) AS word FROM d),
            tf AS (
                SELECT word, doc_id, count(*) AS tf FROM t
                WHERE word IN ('table', 'row', 'join', 'scan', 'fast',
                               'slow', 'key', 'value')
                GROUP BY 1, 2
            ),
            runs AS (
                SELECT tf.word AS q, tf.doc_id AS dd,
                       CAST(tf.tf AS DOUBLE) / CAST(n.nw AS DOUBLE) AS s
                FROM tf JOIN n USING (doc_id)
            ),
            qrels AS (
                SELECT word AS q, doc_id AS dd, least(tf, 3) AS rel FROM tf
            ),
            rk0 AS (
                SELECT q, dd, row_number() OVER (
                    PARTITION BY q ORDER BY s DESC, dd) AS rank
                FROM runs
            ),
            rk AS (
                SELECT r.q, r.rank,
                       CAST(coalesce(qr.rel, 0) AS DOUBLE) AS rel
                FROM rk0 r LEFT JOIN qrels qr ON r.q = qr.q AND r.dd = qr.dd
                WHERE r.rank <= 10
            ),
            rc AS (
                SELECT *, sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY q ORDER BY rank) AS cum
                FROM rk
            ),
            met AS (
                SELECT q,
                       list_reduce(list_prepend(0.0,
                           list((power(2.0, rel) - 1.0) / log2(rank + 1.0)
                                ORDER BY rank)),
                           (a, x) -> a + x) AS dcg,
                       list_reduce(list_prepend(0.0,
                           list(CASE WHEN rel > 0
                                     THEN CAST(cum AS DOUBLE) / rank
                                     ELSE 0.0 END ORDER BY rank)),
                           (a, x) -> a + x) AS apnum,
                       min(CASE WHEN rel > 0 THEN rank END) AS frank
                FROM rc GROUP BY q
            ),
            ir AS (
                SELECT q, rel, row_number() OVER (
                    PARTITION BY q ORDER BY rel DESC, dd) AS irank
                FROM qrels
            ),
            ideal AS (
                SELECT q,
                       list_reduce(list_prepend(0.0,
                           list((power(2.0, CAST(rel AS DOUBLE)) - 1.0)
                                / log2(irank + 1.0) ORDER BY irank)),
                           (a, x) -> a + x) AS idcg
                FROM ir WHERE irank <= 10 AND rel > 0 GROUP BY q
            ),
            np AS (
                SELECT q, count(*) AS npos FROM qrels WHERE rel > 0 GROUP BY q
            )
            SELECT m.q AS query,
                   round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                              THEN m.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg,
                   round(coalesce(1.0 / m.frank, 0.0), 6) AS mrr,
                   round(CASE WHEN coalesce(np.npos, 0) > 0
                              THEN m.apnum
                                   / CAST(least(np.npos, 10) AS DOUBLE)
                              ELSE 0.0 END, 6) AS ap
            FROM met m LEFT JOIN ideal i USING (q) LEFT JOIN np USING (q)
        """,
        "rrf_fusion": f"""
            WITH d AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            ),
            n AS (SELECT doc_id, len(w) AS nw FROM d),
            t AS (SELECT doc_id, unnest(w) AS word FROM d),
            tf AS (
                SELECT word, doc_id, count(*) AS tf FROM t
                WHERE word IN ('table', 'row', 'join', 'scan', 'fast',
                               'slow', 'key', 'value')
                GROUP BY 1, 2
            ),
            u AS (
                SELECT word AS q, doc_id AS dd, 'len_norm' AS run,
                       row_number() OVER (
                           PARTITION BY word ORDER BY
                           CAST(tf AS DOUBLE) / CAST(n.nw AS DOUBLE) DESC,
                           doc_id) AS rank
                FROM tf JOIN n USING (doc_id)
                UNION ALL
                SELECT word, doc_id, 'raw_tf',
                       row_number() OVER (
                           PARTITION BY word
                           ORDER BY CAST(tf AS DOUBLE) DESC, doc_id)
                FROM tf
            ),
            fused AS (
                SELECT q, dd,
                       list_reduce(list_prepend(0.0,
                           list(1.0 / (60.0 + rank) ORDER BY run)),
                           (a, x) -> a + x) AS rrf
                FROM u GROUP BY q, dd
            ),
            rk AS (
                SELECT q, dd, rrf, row_number() OVER (
                    PARTITION BY q ORDER BY rrf DESC, dd) AS rank
                FROM fused
            )
            SELECT q AS query, dd AS doc_id, round(rrf, 6) AS rrf,
                   CAST(rank AS INT) AS rank
            FROM rk WHERE rank <= 5
        """,
        # entropy/KL replay: L is an exact integer sum, fold order pinned
        # by the word-sorted term list; 0-a-b == -(a+b) exactly in IEEE,
        # so the negated-sum form matches Spark's subtraction fold
        "doc_entropy": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
                FROM documents
            ),
            tf AS (
                SELECT doc_id, word, count(*) AS tf FROM w
                WHERE word <> '' GROUP BY 1, 2
            ),
            per AS (
                SELECT doc_id, sum(tf) AS L,
                       list(CAST(tf AS DOUBLE) ORDER BY word) AS terms
                FROM tf GROUP BY 1
            ),
            sc AS (
                SELECT doc_id, L,
                       -list_reduce(list_prepend(0.0,
                           list_transform(terms,
                               t -> (t / CAST(L AS DOUBLE))
                                    * ln(t / CAST(L AS DOUBLE)))),
                           (a, x) -> a + x) AS ent
                FROM per
            )
            SELECT d.doc_id, CAST(coalesce(s.L, 0) AS BIGINT) AS n_words,
                   round(coalesce(s.ent, 0.0), 6) + 0.0 AS entropy
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        "source_kl": f"""
            WITH w AS (
                SELECT source, unnest(string_split({_NORM}, ' ')) AS word
                FROM documents
            ),
            wf AS (SELECT source, word FROM w WHERE word <> ''),
            lm AS (
                SELECT word, count(*) AS n FROM wf
                GROUP BY 1 ORDER BY n DESC, word LIMIT 1000
            ),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM lm),
            pc AS (
                SELECT word, CAST(n AS DOUBLE) / tot.t AS pc
                FROM lm, tot
            ),
            gtf AS (
                SELECT wf.source, wf.word, count(*) AS tf,
                       any_value(pc.pc) AS pc
                FROM wf JOIN pc USING (word)
                GROUP BY 1, 2
            ),
            per AS (
                SELECT source, sum(tf) AS L,
                       list(struct_pack(t := CAST(tf AS DOUBLE), p := pc)
                            ORDER BY word) AS terms
                FROM gtf GROUP BY 1
            )
            SELECT source, CAST(L AS BIGINT) AS n_tokens,
                   round(list_reduce(list_prepend(0.0,
                       list_transform(terms,
                           s -> (s.t / CAST(L AS DOUBLE))
                                * ln((s.t / CAST(L AS DOUBLE)) / s.p))),
                       (a, x) -> a + x), 6) + 0.0 AS kl
            FROM per
        """,
        # UniMax replay: same (cap, source)-ordered prefix sums, same
        # saturation predicate and waterline — all doubles derived from
        # exact integer counts in the same order
        "unimax": f"""
            WITH w AS (
                SELECT source, unnest(string_split({_NORM}, ' ')) AS word
                FROM documents
            ),
            c AS (
                SELECT source, count(*) AS n FROM w
                WHERE word <> '' GROUP BY 1
            ),
            r AS (
                SELECT source, n, CAST(n AS DOUBLE) * CAST(1.5 AS DOUBLE) AS cap,
                       row_number() OVER (
                           ORDER BY CAST(n AS DOUBLE) * CAST(1.5 AS DOUBLE),
                                    source) AS j,
                       coalesce(sum(CAST(n AS DOUBLE) * CAST(1.5 AS DOUBLE))
                           OVER (ORDER BY
                                     CAST(n AS DOUBLE) * CAST(1.5 AS DOUBLE),
                                     source
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0.0) AS P,
                       count(*) OVER () AS C
                FROM c
            ),
            s AS (
                SELECT *, (P + cap * (C - j + 1)) <= CAST(40000 AS DOUBLE)
                          AS sat
                FROM r
            ),
            a AS (
                SELECT sum(CASE WHEN sat THEN 1 ELSE 0 END) AS k,
                       sum(CASE WHEN sat THEN cap ELSE 0.0 END) AS pk,
                       count(*) AS call
                FROM s
            ),
            wl AS (
                SELECT CASE WHEN k < call
                            THEN (CAST(40000 AS DOUBLE) - pk) / (call - k)
                            ELSE CAST('infinity' AS DOUBLE) END AS w
                FROM a
            )
            SELECT source, CAST(n AS BIGINT) AS n_tokens,
                   round(cap, 6) AS cap,
                   round(least(cap, wl.w), 6) AS alloc,
                   round(least(cap, wl.w) / CAST(n AS DOUBLE), 6) AS epochs
            FROM s, wl
        """,
        "split_leakage": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 7 = 0
            ),
            sp AS (
                SELECT md5({_NORM}) AS fingerprint,
                       CASE WHEN CAST(('0x' || substr(
                                md5(CAST(doc_id AS VARCHAR) || '#11'), 1, 8))
                                AS BIGINT) / 4294967296.0 < 0.3
                            THEN 'test' ELSE 'train' END AS split
                FROM corpus
            ),
            g AS (
                SELECT fingerprint, count(*) AS n_docs,
                       list_sort(list(DISTINCT split)) AS spl
                FROM sp GROUP BY 1
            )
            SELECT fingerprint, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(len(spl) AS INT) AS n_splits,
                   array_to_string(spl, ',') AS splits
            FROM g WHERE len(spl) >= 2
        """,
        "weight_ess": f"""
            WITH d AS (
                SELECT source,
                       CAST(len(string_split({_NORM}, ' ')) AS DOUBLE) AS w
                FROM documents
            ),
            a AS (
                SELECT source, count(*) AS n, sum(w) AS sw, sum(w * w) AS sww
                FROM d GROUP BY 1
            )
            SELECT source, CAST(n AS BIGINT) AS n, round(sw, 6) AS sum_w,
                   round(CASE WHEN sww > 0 THEN sw * sw / sww
                              ELSE 0.0 END, 6) AS ess,
                   round((CASE WHEN sww > 0 THEN sw * sw / sww
                               ELSE 0.0 END) / n, 6) AS ess_ratio
            FROM a
        """,
        # RBO replay: same ranked runs as rrf_fusion; a shared doc enters
        # the prefix intersection at depth max(ra, rb); the per-query fold
        # over d = 1..10 runs in ascending-depth order in both engines
        "rbo": f"""
            WITH d AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            ),
            n AS (SELECT doc_id, len(w) AS nw FROM d),
            t AS (SELECT doc_id, unnest(w) AS word FROM d),
            tf AS (
                SELECT word, doc_id, count(*) AS tf FROM t
                WHERE word IN ('table', 'row', 'join', 'scan', 'fast',
                               'slow', 'key', 'value')
                GROUP BY 1, 2
            ),
            ra AS (
                SELECT word AS q, doc_id AS dd,
                       row_number() OVER (
                           PARTITION BY word ORDER BY
                           CAST(tf AS DOUBLE) / CAST(n.nw AS DOUBLE) DESC,
                           doc_id) AS r
                FROM tf JOIN n USING (doc_id)
                QUALIFY r <= 10
            ),
            rb AS (
                SELECT word AS q, doc_id AS dd,
                       row_number() OVER (
                           PARTITION BY word
                           ORDER BY CAST(tf AS DOUBLE) DESC, doc_id) AS r
                FROM tf
                QUALIFY r <= 10
            ),
            ent AS (
                SELECT a.q, greatest(a.r, b.r) AS e
                FROM ra a JOIN rb b ON a.q = b.q AND a.dd = b.dd
            ),
            per AS (
                SELECT q, list(e ORDER BY e) AS es FROM ent GROUP BY q
            ),
            qs AS (SELECT DISTINCT q FROM ra)
            SELECT qs.q AS query,
                   round((CAST(1 AS DOUBLE) - CAST(0.9 AS DOUBLE)) *
                       list_reduce(list_prepend(0.0,
                           list_transform(generate_series(1, 10),
                               dd -> power(CAST(0.9 AS DOUBLE),
                                           CAST(dd AS DOUBLE) - 1.0)
                                     * CAST(len(list_filter(
                                           coalesce(per.es, CAST([] AS BIGINT[])),
                                           e -> e <= dd)) AS DOUBLE)
                                     / CAST(dd AS DOUBLE))),
                           (a, x) -> a + x), 6) + 0.0 AS rbo
            FROM qs LEFT JOIN per USING (q)
        """,
        "upsample_repeat": """
            WITH f AS (
                SELECT event_id, user_id, event_type,
                       CASE event_type WHEN 'purchase' THEN 2.5
                                       WHEN 'click' THEN 1.0 ELSE 0.0 END AS r,
                       CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#3'), 1, 8))
                            AS BIGINT) / 4294967296.0 AS u
                FROM events
            ),
            n AS (
                SELECT *, CAST(floor(r) AS INT)
                          + CASE WHEN u < r - floor(r) THEN 1 ELSE 0 END AS nc
                FROM f
            )
            SELECT event_id, user_id, event_type, CAST(e AS INT) AS epoch
            FROM n, UNNEST(generate_series(1, nc)) AS ee(e)
            WHERE nc > 0
        """,
        # margin mining: exact all-pairs candidates at cos>=0.2, per-id
        # top-4 average over the symmetrized pair list, margin filtered on
        # the RAW ratio (threshold sits in a 6.6e-4 distribution gap)
        "margin_mining": """
            WITH vecs AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(a.e, b.e) AS cos
                FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.e, b.e) >= CAST(0.2 AS DOUBLE)
            ),
            sym AS (
                SELECT id_a AS id, id_b AS other, cos FROM p
                UNION ALL
                SELECT id_b AS id, id_a AS other, cos FROM p
            ),
            r AS (
                SELECT id, cos, row_number() OVER (
                    PARTITION BY id ORDER BY cos DESC, other) AS rn
                FROM sym
            ),
            knn AS (SELECT id, avg(cos) AS m FROM r WHERE rn <= 4 GROUP BY id)
            SELECT p.id_a, p.id_b,
                   round(p.cos, 4) + 0.0 AS cosine,
                   round(p.cos / (0.5 * (ka.m + kb.m)), 4) + 0.0 AS margin
            FROM p
            JOIN knn ka ON ka.id = p.id_a
            JOIN knn kb ON kb.id = p.id_b
            WHERE p.cos / (0.5 * (ka.m + kb.m)) >= CAST(1.05 AS DOUBLE)
        """,
        # DPO pairs: chosen/rejected replayed as lexicographic-extreme
        # row_numbers over (reward, id); margin filtered RAW, rounded in
        # the projection (both sides strict > on IEEE-exact subtraction)
        "dpo_pairs": """
            WITH s AS (
                SELECT user_id AS prompt, event_id AS resp,
                       CAST(value AS DOUBLE) AS r
                FROM events WHERE value IS NOT NULL
            ),
            hi AS (
                SELECT prompt, r, resp, row_number() OVER (
                    PARTITION BY prompt ORDER BY r DESC, resp DESC) AS rn
                FROM s
            ),
            lo AS (
                SELECT prompt, r, resp, row_number() OVER (
                    PARTITION BY prompt ORDER BY r ASC, resp ASC) AS rn
                FROM s
            ),
            n AS (SELECT prompt, count(*) AS c FROM s GROUP BY prompt)
            SELECT h.prompt, h.resp AS chosen, l.resp AS rejected,
                   round(h.r, 6) + 0.0 AS reward_chosen,
                   round(l.r, 6) + 0.0 AS reward_rejected,
                   round(h.r - l.r, 6) + 0.0 AS margin
            FROM hi h
            JOIN lo l ON h.prompt = l.prompt AND l.rn = 1
            JOIN n ON n.prompt = h.prompt
            WHERE h.rn = 1 AND n.c >= 2
              AND h.r - l.r > CAST(0.05 AS DOUBLE)
        """,
        # prototype pruning: the _ivf_sql quantizer replay (md5 seeds,
        # dot/|c| argmax with idx-DESC tie), prototypicality = winning
        # score / |v| rounded 6, per-cell rank over the SAME window Spark
        # uses (nulls first, id tie-break, count includes null-proto rows)
        "prototype_prune": """
            WITH vecs AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            seeds AS (
                SELECT e AS c,
                       row_number() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                       ) - 1 AS idx
                FROM vecs
                ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                LIMIT 8
            ),
            cents AS (
                SELECT idx, c,
                       CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN 1.0
                            ELSE sqrt(list_dot_product(c, c)) END AS cn
                FROM seeds
            ),
            assigned AS (
                SELECT v.vec_id, v.e, ct.idx,
                       list_dot_product(v.e, ct.c) / ct.cn AS score,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_dot_product(v.e, ct.c) / ct.cn DESC,
                                    ct.idx DESC
                       ) AS rnk
                FROM vecs v CROSS JOIN cents ct
            ),
            scored AS (
                SELECT vec_id, idx AS ivf_cell,
                       CASE WHEN sqrt(list_dot_product(e, e)) = 0 THEN NULL
                            ELSE round(score / sqrt(list_dot_product(e, e)), 6)
                                 + 0.0 END AS proto_cos
                FROM assigned WHERE rnk = 1
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY ivf_cell
                           ORDER BY proto_cos ASC NULLS FIRST, vec_id
                       ) AS rn,
                       count(*) OVER (PARTITION BY ivf_cell) AS nc
                FROM scored
            )
            SELECT vec_id, ivf_cell, proto_cos
            FROM ranked
            WHERE proto_cos IS NULL
               OR rn <= ceil(nc * CAST(0.7 AS DOUBLE))
        """,
        # grouped MAD gate: per-type med and MAD rounded to 6 BEFORE the
        # score (fit-then-literal) so the remaining +-*-/ chain is
        # IEEE-exact in both engines; quantile_cont == Spark percentile
        "mad_outliers_grouped": """
            WITH med AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.5), 6) AS m
                FROM events GROUP BY event_type
            ),
            mad AS (
                SELECT e.event_type,
                       round(quantile_cont(abs(e.value - m.m), 0.5), 6) AS md,
                       min(m.m) AS m
                FROM events e JOIN med m USING (event_type)
                GROUP BY e.event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   CASE WHEN a.md > 0
                        THEN round(0.6745 * (e.value - a.m) / a.md, 6) + 0.0
                        END AS value_rz,
                   coalesce(
                       CASE WHEN a.md > 0
                            THEN abs(round(0.6745 * (e.value - a.m) / a.md, 6)
                                     + 0.0) > 3.5
                            END, FALSE) AS value_outlier
            FROM events e JOIN mad a USING (event_type)
        """,
        # Efraimidis-Spirakis: rank on the RAW pow key (ties by doc_id),
        # emit the rounded key; md5 uniform is bit-identical cross-engine
        "weighted_sample": """
            WITH k AS (
                SELECT doc_id, source,
                       pow(
                           CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR) || '#11'), 1, 8))
                               AS BIGINT) / 4294967296.0,
                           1.0 / CAST(n_chars AS DOUBLE)
                       ) AS wk
                FROM documents
                WHERE CAST(n_chars AS DOUBLE) > 0
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY wk DESC, doc_id
                ) AS rn
                FROM k
            )
            SELECT doc_id, source, round(wk, 6) + 0.0 AS wkey
            FROM r WHERE rn <= 20
        """,
        # DoReMi EG update on the bounded domain table; planted losses are
        # integer-derived doubles, excess clipped at 0 before the mean
        "doremi_round": """
            WITH dom AS (
                SELECT source AS domain,
                       CAST(count(*) AS BIGINT) AS n_examples,
                       avg(greatest(
                           CAST(doc_id % 17 AS DOUBLE) / 10.0
                           - CAST(doc_id % 13 AS DOUBLE) / 10.0, 0.0)) AS lam
                FROM documents GROUP BY source
            ),
            c AS (SELECT CAST(count(*) AS DOUBLE) AS cn FROM dom),
            raw AS (
                SELECT d.*, c.cn,
                       (1.0 / c.cn) * exp(CAST(0.5 AS DOUBLE) * d.lam) AS rw
                FROM dom d CROSS JOIN c
            ),
            z AS (SELECT sum(rw) AS zz FROM raw)
            SELECT domain, n_examples,
                   round(lam, 6) + 0.0 AS excess_loss,
                   round(1.0 / cn, 6) + 0.0 AS weight_in,
                   round(rw / z.zz, 6) + 0.0 AS weight_out,
                   round(CAST(0.9 AS DOUBLE) * rw / z.zz
                         + CAST(0.1 AS DOUBLE) / cn, 6) + 0.0 AS mix_alpha
            FROM raw CROSS JOIN z
        """,
        # line dedup: the window rank replays the operator's min-struct
        # survivor pick ((doc, pos)-lexicographic first occurrence); lines
        # grouped on their raw string where Spark groups md5(line)
        # (count-invariant)
        "dedup_lines": f"""
            WITH lined AS (
                SELECT doc_id,
                       regexp_replace({_NORM}, '(\\S+ \\S+) ',
                                      '\\1' || chr(10), 'g') AS text
                FROM documents
            ),
            d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
            l AS (
                SELECT d.doc_id, CAST(i AS INT) AS pos,
                       d.ls[CAST(i AS INT)] AS line
                FROM d, UNNEST(generate_series(1, len(d.ls))) AS t(i)
            ),
            m AS (
                SELECT doc_id, pos, line,
                       count(*) OVER (PARTITION BY line) AS c,
                       row_number() OVER (
                           PARTITION BY line ORDER BY doc_id, pos
                       ) AS rn
                FROM l
            )
            SELECT doc_id,
                   coalesce(string_agg(
                       CASE WHEN c < 2 OR rn = 1 THEN line END,
                       chr(10) ORDER BY pos), '') AS cleaned_text,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CASE WHEN c < 2 OR rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM m GROUP BY doc_id
        """,
        # equivalence oracle: the incremental pass must equal the one-shot
        # union pass restricted to the batch (odd) docs
        "dedup_lines_incremental": f"""
            WITH lined AS (
                SELECT doc_id,
                       regexp_replace({_NORM}, '(\\S+ \\S+) ',
                                      '\\1' || chr(10), 'g') AS text
                FROM documents
            ),
            d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
            l AS (
                SELECT d.doc_id, CAST(i AS INT) AS pos,
                       d.ls[CAST(i AS INT)] AS line
                FROM d, UNNEST(generate_series(1, len(d.ls))) AS t(i)
            ),
            m AS (
                SELECT doc_id, pos, line,
                       count(*) OVER (PARTITION BY line) AS c,
                       row_number() OVER (
                           PARTITION BY line ORDER BY doc_id, pos
                       ) AS rn
                FROM l
            )
            SELECT doc_id,
                   coalesce(string_agg(
                       CASE WHEN c < 2 OR rn = 1 THEN line END,
                       chr(10) ORDER BY pos), '') AS cleaned_text,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CASE WHEN c < 2 OR rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM m
            WHERE doc_id % 2 = 1
            GROUP BY doc_id
        """,
        "pagerank": _pagerank_oracle(5),
        "hits_scores": _hits_oracle(4),
        "zipf_fit": f"""
            WITH w AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
            ),
            v AS (
                SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1
            ),
            rk AS (
                SELECT n, row_number() OVER (ORDER BY n DESC, word) AS r FROM v
            ),
            p AS (
                SELECT ln(CAST(r AS DOUBLE)) AS x,
                       ln(CAST(n AS DOUBLE)) AS y
                FROM rk
            ),
            a AS (
                SELECT CAST(count(*) AS DOUBLE) AS c,
                       sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                       sum(x * x) AS sxx, sum(y * y) AS syy
                FROM p
            )
            SELECT CAST(c AS BIGINT) AS n_vocab,
                   round(CASE WHEN c * sxx - sx * sx > 0
                              THEN (c * sxy - sx * sy) / (c * sxx - sx * sx)
                              ELSE 0.0 END, 6) AS slope,
                   round(CASE WHEN c * sxx - sx * sx > 0
                              THEN (sy - ((c * sxy - sx * sy)
                                          / (c * sxx - sx * sx)) * sx) / c
                              ELSE 0.0 END, 6) AS intercept,
                   round(CASE WHEN c * sxx - sx * sx > 0
                              AND c * syy - sy * sy > 0
                              THEN (c * sxy - sx * sy) * (c * sxy - sx * sy)
                                   / ((c * sxx - sx * sx) * (c * syy - sy * sy))
                              ELSE 0.0 END, 6) AS r2
            FROM a
        """,
        "stratified_sample": """
            SELECT event_id, user_id, event_type FROM events
            WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#3'), 1, 8))
                       AS BIGINT) / 4294967296.0 <
                  CASE event_type WHEN 'purchase' THEN 1.0
                                  WHEN 'click' THEN 0.2 ELSE 0.0 END
        """,
        "token_budget_sample": """
            WITH seqs AS (
                SELECT event_id, user_id,
                       ['web','code','books'][CAST((user_id % 3) + 1 AS INT)] AS source,
                       CAST(event_id % 5 + 1 AS BIGINT) AS n_tok
                FROM events
            ),
            tot AS (SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS t FROM seqs GROUP BY source),
            fr AS (
                SELECT source,
                       least(1.0, CASE source WHEN 'web' THEN 3000.0
                                              WHEN 'code' THEN 1000.0
                                              WHEN 'books' THEN 1e12 END / t) AS f
                FROM tot
            )
            SELECT s.event_id, s.user_id, s.source
            FROM seqs s JOIN fr USING (source)
            WHERE CAST(('0x' || substr(md5(CAST(s.event_id AS VARCHAR) || '#7'), 1, 8))
                       AS BIGINT) / 4294967296.0 < fr.f
        """,
        "chunk_documents": """
            SELECT doc_id,
                   CAST(i AS INT) AS chunk_idx,
                   substr(text, CAST(i * 100 + 1 AS INT), 120) AS chunk_text,
                   CAST(length(substr(text, CAST(i * 100 + 1 AS INT), 120)) AS BIGINT) AS n_chunk_chars
            FROM documents,
                 UNNEST(generate_series(0,
                     CAST(ceil(greatest(length(text) - 120, 0) / 100.0) AS INT))) AS t(i)
        """,
        "topk_per_group": """
            SELECT event_type, rank, event_id, value FROM (
                SELECT event_type, event_id, value,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                               ORDER BY value DESC, event_id) AS INT) AS rank
                FROM events
            ) WHERE rank <= 3
        """,
        "expanding": """
            SELECT event_id, user_id,
                   CAST(count(value) OVER w AS BIGINT) AS value_count_expanding,
                   round(avg(value) OVER w, 6) AS value_avg_expanding
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        """,
        "target_encode": """
            SELECT event_id, event_type,
                   round(avg(value) OVER w, 6) AS event_type_te
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        """,
    }
    # composed C4-style gate: reuse the validated quality_score and
    # repetition oracles as subqueries (DuckDB allows WITH inside subqueries)
    sql["quality_gate"] = f"""
        SELECT qs.doc_id,
               round(qs.quality_score, 6) AS quality_score,
               round(rep.dup_word_ratio, 6) AS dup_word_ratio,
               round(rep.trigram_dup_ratio, 6) AS trigram_dup_ratio
        FROM ({sql['quality_score']}) qs
        JOIN ({sql['repetition']}) rep ON qs.doc_id = rep.doc_id
        WHERE qs.quality_score >= 0.6
          AND rep.dup_word_ratio <= 0.5
          AND rep.trigram_dup_ratio <= 0.9
    """
    # trained quality gate: one IRLS round from beta=0 (mu=0.5, w=0.25,
    # z=4y-2 — exact in both engines) over the validated quality_score /
    # repetition features, Cramer 3x3 solve, sigmoid scoring; prob rounds
    # to 6 BEFORE the >= 0.5 gate so the boolean is engine-identical
    sql["quality_classifier"] = f"""
        WITH qsq AS ({sql['quality_score']}),
        repq AS ({sql['repetition']}),
        f AS (
            SELECT q.doc_id, q.quality_score AS x1, r.dup_word_ratio AS x2,
                   CASE WHEN q.quality_score >= 0.6 AND r.dup_word_ratio <= 0.5
                        THEN 1.0 ELSE 0.0 END AS yb
            FROM qsq q JOIN repq r USING (doc_id)
        ),
        mz AS (SELECT doc_id, x1, x2, 0.25 AS w, 4*yb - 2 AS z FROM f),
        s AS (
            SELECT sum(w) AS n, sum(w*x1) AS s1, sum(w*x2) AS s2,
                   sum(w*x1*x1) AS s11, sum(w*x1*x2) AS s12,
                   sum(w*x2*x2) AS s22,
                   sum(w*z) AS sy, sum(w*x1*z) AS s1y, sum(w*x2*z) AS s2y
            FROM mz
        ),
        {_cramer3_cte()}
        SELECT f.doc_id,
               round(1/(1+exp(-(beta.b0 + beta.b1*f.x1 + beta.b2*f.x2))), 6)
                   AS prob,
               round(1/(1+exp(-(beta.b0 + beta.b1*f.x1 + beta.b2*f.x2))), 6)
                   >= 0.5 AS gate
        FROM f, beta
    """
    # multinomial Naive Bayes replay: one (label, word) count table, top-300
    # class-blind vocab (count desc, word asc), add-1 smoothing over the
    # label x vocab cross (zero-count cells included), per-(doc, label)
    # sorted-word list_reduce fold (the LM-family determinism contract),
    # prior-only spine for zero-in-vocab docs, argmax by rounded-6 score
    # with ties to the LARGER label (Spark max-struct order)
    sql["naive_bayes"] = f"""
        WITH w AS (
            SELECT doc_id, lang AS label,
                   unnest(string_split({_NORM}, ' ')) AS word
            FROM documents
        ),
        wf AS (SELECT * FROM w WHERE word <> ''),
        lw AS (SELECT label, word, count(*) AS n FROM wf GROUP BY 1, 2),
        vocab AS (
            SELECT word FROM (
                SELECT word, sum(n) AS t FROM lw GROUP BY 1
            ) ORDER BY t DESC, word LIMIT 300
        ),
        labels AS (SELECT lang AS label, count(*) AS n_docs
                   FROM documents GROUP BY 1),
        nt AS (SELECT sum(n_docs) AS nn FROM labels),
        priors AS (
            SELECT label, ln(CAST(n_docs AS DOUBLE) / nn) AS log_prior
            FROM labels, nt
        ),
        cells AS (
            SELECT l.label, v.word, coalesce(lw.n, 0) AS n
            FROM labels l CROSS JOIN vocab v
            LEFT JOIN lw ON lw.label = l.label AND lw.word = v.word
        ),
        tc AS (SELECT label, sum(n) AS tt, count(*) AS vv
               FROM cells GROUP BY 1),
        cond AS (
            SELECT c.label, c.word,
                   ln((c.n + 1.0) / (tc.tt + 1.0 * tc.vv)) AS log_cond
            FROM cells c JOIN tc USING (label)
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY 1, 2
        ),
        perarr AS (
            SELECT t.doc_id, c.label,
                   list(struct_pack(tf := t.tf, lc := c.log_cond)
                        ORDER BY t.word) AS arr,
                   sum(t.tf) AS lw_n
            FROM tf t JOIN cond c ON t.word = c.word
            GROUP BY 1, 2
        ),
        wsum AS (
            SELECT doc_id, label, lw_n,
                   list_reduce(
                       list_prepend(0.0,
                           list_transform(arr,
                               s -> CAST(s.tf AS DOUBLE) * s.lc)),
                       (acc, x) -> acc + x) AS ws
            FROM perarr
        ),
        spine AS (SELECT d.doc_id, p.label, p.log_prior
                  FROM documents d CROSS JOIN priors p),
        scored AS (
            SELECT s.doc_id, s.label,
                   CAST(coalesce(ws.lw_n, 0) AS BIGINT) AS lw_n,
                   round(s.log_prior + coalesce(ws.ws, 0.0), 6) AS score
            FROM spine s
            LEFT JOIN wsum ws ON s.doc_id = ws.doc_id AND s.label = ws.label
        ),
        best AS (
            SELECT doc_id, label AS pred, score, lw_n
            FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, label DESC) = 1
        )
        SELECT b.doc_id, b.lw_n AS n_words, b.pred, b.score,
               d.lang AS label, (b.pred = d.lang) AS correct
        FROM best b JOIN documents d USING (doc_id)
    """
    # Mondrian split-conformal replay: naive-forecast residuals on the even
    # (calibration) event_ids, per-event_type row_number rank, k =
    # ceil((n+1)*0.8) (the identical IEEE double multiply in both engines),
    # q = the k-th residual; covered compares ROUNDED residual vs ROUNDED q
    sql["conformal_interval"] = """
        WITH base AS (
            SELECT event_id, event_type, value,
                   lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS yhat,
                   (event_id % 2 = 0) AS is_calib
            FROM events
        ),
        f AS (SELECT * FROM base WHERE yhat IS NOT NULL),
        calib AS (SELECT event_type, abs(value - yhat) AS r FROM f
                  WHERE is_calib),
        stats AS (SELECT event_type, count(*) AS n FROM calib GROUP BY 1),
        want AS (
            SELECT event_type,
                   CASE WHEN ceil((n + 1) * 0.8) <= n
                        THEN CAST(ceil((n + 1) * 0.8) AS BIGINT) END AS k
            FROM stats
        ),
        ranked AS (
            SELECT event_type, r,
                   row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn
            FROM calib
        ),
        qtab AS (
            SELECT r.event_type, r.r AS q
            FROM ranked r JOIN want w
              ON r.event_type = w.event_type AND r.rn = w.k
        )
        SELECT f.event_id, f.event_type,
               f.value AS y, f.yhat,
               round(q.q, 6) AS qhat,
               round(f.yhat - q.q, 6) AS lo,
               round(f.yhat + q.q, 6) AS hi,
               round(abs(f.value - f.yhat), 6) <= round(q.q, 6) AS covered
        FROM f LEFT JOIN qtab q USING (event_type)
        WHERE NOT f.is_calib
    """
    # copy-on-write merge+forget replay: the file-granular snapshot
    # lifecycle must equal plain set algebra — base ANTI src UNION src,
    # then ANTI the opt-out list
    sql["merge_forget"] = """
        WITH base AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        src AS (
            SELECT doc_id, text, lang, source, n_chars + 1000 AS n_chars
            FROM documents WHERE doc_id % 2 = 0
        ),
        merged AS (
            SELECT * FROM base
            WHERE doc_id NOT IN (SELECT doc_id FROM src)
            UNION ALL
            SELECT * FROM src
        )
        SELECT doc_id, text, lang, source, n_chars
        FROM merged WHERE doc_id % 7 <> 0
    """
    # suffix-array replay: dense rank over the literal 64-char-truncated
    # suffix strings (DuckDB's default binary collation = codepoint order =
    # the engine's rank convention; a shorter suffix sorts before its
    # extensions in both)
    sql["suffix_ranks"] = f"""
        WITH d AS (
            SELECT doc_id, {_NORM} AS norm
            FROM documents WHERE doc_id % 5 = 0
        ),
        p AS (
            SELECT doc_id, CAST(i AS INT) AS pos,
                   substr(norm, CAST(i AS INT), 64) AS pre
            FROM d, unnest(generate_series(1, length(norm))) AS t(i)
            WHERE length(norm) >= 1
        )
        SELECT doc_id, pos,
               CAST(dense_rank() OVER (ORDER BY pre) AS BIGINT) AS srank
        FROM p
    """
    # repeated-substring replay: same adjacency as the engine (rank = the
    # truncated suffix string; within-run order by (doc_id, pos)), LCP by
    # direct prefix probe (monotone: prefix equality at k implies it at all
    # j<k, so count() = max matching k), honest length = the clamped cut's
    # length, occurrences = one probe per distinct winning length
    sql["repeated_substrings"] = f"""
        WITH d AS (
            SELECT doc_id, {_NORM} AS norm
            FROM documents WHERE doc_id % 5 = 0
        ),
        p AS (
            SELECT doc_id, CAST(i AS INT) AS pos,
                   substr(norm, CAST(i AS INT), 64) AS pre
            FROM d, unnest(generate_series(1, length(norm))) AS t(i)
            WHERE length(norm) >= 1
        ),
        r AS (
            SELECT doc_id, pos, pre,
                   row_number() OVER (ORDER BY pre, doc_id, pos) AS rn
            FROM p
        ),
        pairs AS (
            SELECT a.doc_id AS da, a.pos AS pa, a.pre AS sa, b.pre AS sb
            FROM r a JOIN r b ON b.rn = a.rn + 1
        ),
        lcps AS (
            SELECT da, pa,
                   CASE WHEN sa = sb THEN 64
                        ELSE CAST((
                            SELECT count(*)
                            FROM unnest(generate_series(1, 63)) AS t(k)
                            WHERE substr(sa, 1, CAST(k AS INT))
                                = substr(sb, 1, CAST(k AS INT))
                        ) AS INT)
                   END AS l
            FROM pairs
        ),
        cand AS (
            SELECT DISTINCT substr(d.norm, l2.pa, l2.l) AS substring,
                   CAST(length(substr(d.norm, l2.pa, l2.l)) AS INT) AS length
            FROM lcps l2 JOIN d ON d.doc_id = l2.da
            WHERE l2.l >= 15
        ),
        top AS (
            SELECT substring, length FROM cand
            WHERE length >= 15
            ORDER BY length DESC, substring LIMIT 20
        ),
        lens AS (SELECT DISTINCT length FROM top),
        probe AS (
            SELECT substr(d.norm, CAST(i AS INT), lens.length) AS substring,
                   lens.length
            FROM d, unnest(generate_series(1, length(norm))) AS t(i), lens
        )
        SELECT t.substring, t.length, count(*) AS n_occurrences
        FROM probe pr
        JOIN top t ON pr.substring = t.substring AND pr.length = t.length
        GROUP BY 1, 2
    """
    # END-TO-END curation funnel: quality gate (train slice) → near-dup
    # transitive closure over the GATED docs only (the shingle-df cap must
    # count document frequency within the clustered set, hence the custom
    # gdocs-based shingle CTE) → word-4-gram decontamination vs the eval
    # slice. Splices the per-stage oracles proven above; chr(31) is the
    # same \\x1f gram delimiter the engine uses (commas alias word grams).
    sql["curate_corpus"] = f"""
        WITH RECURSIVE
        gate AS (
            SELECT qs.doc_id
            FROM ({sql['quality_score']}) qs
            JOIN ({sql['repetition']}) rep ON qs.doc_id = rep.doc_id
            WHERE qs.quality_score >= 0.6
              AND rep.dup_word_ratio <= 0.5
              AND rep.trigram_dup_ratio <= 0.9
              AND qs.doc_id % 13 <> 0
        ),
        gdocs AS (
            SELECT d.doc_id, {_NORM} AS norm
            FROM documents d JOIN gate USING (doc_id)
        ),
        shingles AS (
            SELECT DISTINCT doc_id, substr(norm, CAST(i AS INT), 12) AS sh
            FROM gdocs,
                 UNNEST(generate_series(1, greatest(length(norm) - 11, 1))) AS t(i)
        ),
        kept AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 100),
        fsh AS (SELECT s.doc_id, s.sh FROM shingles s JOIN kept k ON s.sh = k.sh),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        walk(id, r) AS (
            SELECT DISTINCT s, s FROM edges
            UNION
            SELECT w.id, e.d FROM walk w JOIN edges e ON e.s = w.r
        ),
        comp AS (SELECT id, MIN(r) AS rep FROM walk GROUP BY id),
        canon AS (
            SELECT g.doc_id, string_split(g.norm, ' ') AS words
            FROM gdocs g LEFT JOIN comp c ON c.id = g.doc_id
            WHERE COALESCE(c.rep, g.doc_id) = g.doc_id
        ),
        ew AS (
            SELECT string_split({_NORM}, ' ') AS words
            FROM documents WHERE doc_id % 13 = 0
        ),
        tg AS (
            SELECT DISTINCT doc_id,
                   array_to_string(words[CAST(i AS INT):CAST(i + 3 AS INT)], chr(31)) AS g
            FROM canon, UNNEST(generate_series(1, len(words) - 3)) AS u(i)
        ),
        eg AS (
            SELECT DISTINCT
                   array_to_string(words[CAST(i AS INT):CAST(i + 3 AS INT)], chr(31)) AS g
            FROM ew, UNNEST(generate_series(1, len(words) - 3)) AS u(i)
        ),
        bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (g))
        SELECT c.doc_id, CAST(len(c.words) AS INT) AS n_tokens
        FROM canon c
        WHERE c.doc_id NOT IN (SELECT doc_id FROM bad)
    """
    # the DSIR scale lane is selection-identical to the exact lane by
    # construction (candidate set provably contains the top-k, same total
    # order) — sharing the oracle string IS the equivalence check
    sql["dsir_select_approx"] = sql["dsir_select"]
    sql["c4_rules"] = _c4_oracle()
    sql["unigram_seed"] = _unigram_seed_oracle()
    sql["unigram_em"] = _unigram_em_oracle(2)
    sql["unigram_tokenize"] = _unigram_tokenize_oracle(2)
    sql["wordpiece_merges"] = _wordpiece_merges_oracle(8)
    sql["wordpiece_tokenize"] = _wordpiece_tokenize_oracle(8, 12)
    # incremental KMV: the oracle IS the one-shot sketch over the union —
    # a values-match proves merge(sketch(corpus), sketch(batch)) ==
    # sketch(corpus ∪ batch) (the incremental-equivalence convention)
    sql["kmv_incremental"] = sql["kmv_distinct"]
    # HLL: same trigram element stream as kmv_distinct; bucket = top 8
    # bits of the 32-bit md5 hash, rho via the exact bin()-length
    # identity; alpha(m=256) = 0.7213/(1 + 1.079/256) inlined as the
    # repr of the Python double (both engines read the same literal)
    sql["hll_distinct"] = f"""
        WITH d AS (
            SELECT source,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS w
            FROM documents
        ),
        g AS (
            SELECT source,
                   w[CAST(i AS INT)] || chr(31) || w[CAST(i AS INT) + 1]
                       || chr(31) || w[CAST(i AS INT) + 2] AS e
            FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        ),
        h AS (
            SELECT DISTINCT source,
                   CAST(('0x' || substr(md5(e || '#7'), 1, 8)) AS BIGINT) AS h
            FROM g
        ),
        b AS (
            SELECT source, h >> 24 AS j, h & 16777215 AS w32 FROM h
        ),
        reg AS (
            SELECT source, j,
                   max(CASE WHEN w32 = 0 THEN 25
                            ELSE 25 - length(bin(w32)) END) AS m_j
            FROM b GROUP BY 1, 2
        ),
        s AS (
            SELECT source, CAST(count(*) AS INT) AS nonempty,
                   sum(power(CAST(2 AS DOUBLE), -m_j)) AS hsum,
                   CAST(256 AS DOUBLE) - count(*) AS zeros
            FROM reg GROUP BY 1
        ),
        r AS (
            SELECT source, nonempty, zeros,
                   CAST(0.7182725932495458 AS DOUBLE) * 65536.0 / (hsum + zeros) AS raw
            FROM s
        )
        SELECT source, nonempty,
               round(CASE WHEN raw <= 640.0 AND zeros > 0
                          THEN 256.0 * ln(256.0 / zeros)
                          WHEN raw > 4294967296.0 / 30.0
                          THEN -4294967296.0 * ln(1.0 - raw / 4294967296.0)
                          ELSE raw END, 6) + 0.0 AS est_distinct
        FROM r
    """
    sql["hll_incremental"] = sql["hll_distinct"]
    # chunking: same n_chunks formula (1 + ceil(max(0, n-16)/12)), DuckDB
    # list slice is INCLUSIVE [a:b] and clamps past the end like F.slice
    sql["chunk_words"] = f"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS w
            FROM documents
        ),
        c AS (
            SELECT doc_id, w,
                   1 + CAST(ceil(CAST(greatest(len(w) - 16, 0) AS DOUBLE)
                                 / 12.0) AS INT) AS nc
            FROM d
        ),
        e AS (
            SELECT doc_id, nc, CAST(i AS INT) AS chunk_id,
                   w[CAST(i AS INT) * 12 + 1 : CAST(i AS INT) * 12 + 16]
                       AS piece
            FROM c, UNNEST(generate_series(0, nc - 1)) AS t(i)
        )
        SELECT doc_id, chunk_id, nc AS n_chunks,
               array_to_string(piece, ' ') AS chunk_text,
               CAST(len(piece) AS INT) AS n_words
        FROM e
    """
    # corpus BLEU: per-n gram lists + clipped matches as pure list
    # lambdas (DuckDB list_filter's index is 1-BASED, Spark's is
    # 0-based — the %5 drop rule is written per engine accordingly)
    def _bleu_gram(src: str, n: int) -> str:
        if n == 1:
            return src
        return (
            f"CASE WHEN len({src}) >= {n} THEN list_transform("
            f"generate_series(1, len({src}) - {n - 1}), "
            f"i -> array_to_string({src}[CAST(i AS INT):CAST(i AS INT) + {n - 1}],"
            f" chr(31))) ELSE CAST([] AS VARCHAR[]) END"
        )

    def _bleu_match(cg: str, rg: str) -> str:
        return (
            f"coalesce(CAST(list_sum(list_transform(list_distinct({cg}), "
            f"g -> least(len(list_filter({cg}, x -> x = g)), "
            f"len(list_filter({rg}, x -> x = g))))) AS BIGINT), 0)"
        )

    _g_cols = ", ".join(
        f"{_bleu_gram('cw', n)} AS cg{n}, {_bleu_gram('rw', n)} AS rg{n}"
        for n in range(2, 5)
    )
    _s_cols = ", ".join(
        f"{_bleu_match('cw' if n == 1 else f'cg{n}', 'rw' if n == 1 else f'rg{n}')}"
        f" AS m{n}, greatest(len(cw) - {n - 1}, 0) AS t{n}"
        for n in range(1, 5)
    )
    _a_cols = ", ".join(
        f"CAST(sum(m{n}) AS BIGINT) AS m{n}, CAST(sum(t{n}) AS BIGINT) AS t{n}"
        for n in range(1, 5)
    )
    _p_cols = ", ".join(
        f"CAST(m{n} AS DOUBLE) / CAST(t{n} AS DOUBLE) AS p{n}"
        for n in range(1, 5)
    )
    _p_out = ", ".join(f"round(p{n}, 6) + 0.0 AS p_{n}" for n in range(1, 5))
    _zero = " OR ".join(f"p{n} <= 0" for n in range(1, 5))
    _lns = " + ".join(f"ln(p{n})" for n in range(1, 5))
    sql["bleu_corpus"] = f"""
        WITH d AS (
            SELECT CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS cw
            FROM documents
        ),
        p AS (
            SELECT cw, list_filter(cw, (x, i) -> i % 5 != 0) AS rw FROM d
        ),
        g AS (SELECT cw, rw, {_g_cols} FROM p),
        s AS (SELECT len(cw) AS cl, len(rw) AS rl, {_s_cols} FROM g),
        a AS (
            SELECT count(*) AS n_pairs,
                   CAST(sum(cl) AS BIGINT) AS cand_len,
                   CAST(sum(rl) AS BIGINT) AS ref_len, {_a_cols}
            FROM s
        ),
        pr AS (
            SELECT *, {_p_cols},
                   CASE WHEN cand_len >= ref_len THEN CAST(1 AS DOUBLE)
                        ELSE exp(CAST(1 AS DOUBLE)
                                 - CAST(ref_len AS DOUBLE)
                                 / CAST(cand_len AS DOUBLE)) END AS bp
            FROM a
        )
        SELECT n_pairs, cand_len, ref_len, {_p_out},
               round(bp, 6) + 0.0 AS bp,
               round(CASE WHEN {_zero} THEN CAST(0 AS DOUBLE)
                          ELSE bp * exp(({_lns}) / 4.0) END, 6) + 0.0 AS bleu
        FROM pr
    """
    def _chrf_gram(src: str, n: int) -> str:
        if n == 1:
            return (
                f"list_transform(generate_series(1, greatest(length({src}), 0)),"
                f" i -> substr({src}, CAST(i AS INT), 1))"
            )
        return (
            f"CASE WHEN length({src}) >= {n} THEN list_transform("
            f"generate_series(1, length({src}) - {n - 1}), "
            f"i -> substr({src}, CAST(i AS INT), {n})) "
            f"ELSE CAST([] AS VARCHAR[]) END"
        )

    _cf_g = ", ".join(
        f"{_chrf_gram('cs', n)} AS cg{n}, {_chrf_gram('rs', n)} AS rg{n}"
        for n in range(1, 7)
    )
    _cf_s = ", ".join(
        f"{_bleu_match(f'cg{n}', f'rg{n}')} AS m{n}, "
        f"greatest(length(cs) - {n - 1}, 0) AS tc{n}, "
        f"greatest(length(rs) - {n - 1}, 0) AS tr{n}"
        for n in range(1, 7)
    )
    _cf_a = ", ".join(
        f"CAST(sum(m{n}) AS BIGINT) AS m{n}, "
        f"CAST(sum(tc{n}) AS BIGINT) AS tc{n}, "
        f"CAST(sum(tr{n}) AS BIGINT) AS tr{n}"
        for n in range(1, 7)
    )
    _cf_psum = " + ".join(
        f"CASE WHEN tc{n} > 0 THEN CAST(m{n} AS DOUBLE) / CAST(tc{n} AS DOUBLE)"
        f" ELSE CAST(0 AS DOUBLE) END"
        for n in range(1, 7)
    )
    _cf_pcnt = " + ".join(
        f"CASE WHEN tc{n} > 0 THEN 1 ELSE 0 END" for n in range(1, 7)
    )
    _cf_rsum = " + ".join(
        f"CASE WHEN tr{n} > 0 THEN CAST(m{n} AS DOUBLE) / CAST(tr{n} AS DOUBLE)"
        f" ELSE CAST(0 AS DOUBLE) END"
        for n in range(1, 7)
    )
    _cf_rcnt = " + ".join(
        f"CASE WHEN tr{n} > 0 THEN 1 ELSE 0 END" for n in range(1, 7)
    )
    _cf_pr_out = ", ".join(
        f"round(CASE WHEN tc{n} > 0 THEN CAST(m{n} AS DOUBLE)"
        f" / CAST(tc{n} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END, 6) + 0.0 AS p_{n},"
        f" round(CASE WHEN tr{n} > 0 THEN CAST(m{n} AS DOUBLE)"
        f" / CAST(tr{n} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END, 6) + 0.0 AS r_{n}"
        for n in range(1, 7)
    )
    sql["chrf_corpus"] = f"""
        WITH d AS (
            SELECT CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS cw
            FROM documents
        ),
        p0 AS (
            SELECT substr(array_to_string(cw, ' '), 1, 200) AS cand,
                   substr(array_to_string(
                       list_filter(cw, (x, i) -> i % 5 != 0), ' '), 1, 200)
                       AS ref
            FROM d
        ),
        s0 AS (
            SELECT regexp_replace(cand, '\\s+', '', 'g') AS cs,
                   regexp_replace(ref, '\\s+', '', 'g') AS rs
            FROM p0
        ),
        g AS (SELECT cs, rs, {_cf_g} FROM s0),
        s AS (SELECT {_cf_s} FROM g),
        a AS (SELECT count(*) AS n_pairs, {_cf_a} FROM s),
        pr AS (
            SELECT *,
                   CASE WHEN ({_cf_pcnt}) > 0
                        THEN ({_cf_psum}) / CAST(({_cf_pcnt}) AS DOUBLE)
                        ELSE CAST(0 AS DOUBLE) END AS prec,
                   CASE WHEN ({_cf_rcnt}) > 0
                        THEN ({_cf_rsum}) / CAST(({_cf_rcnt}) AS DOUBLE)
                        ELSE CAST(0 AS DOUBLE) END AS rec
            FROM a
        )
        SELECT n_pairs, {_cf_pr_out},
               round(prec, 6) + 0.0 AS chrf_precision,
               round(rec, 6) + 0.0 AS chrf_recall,
               round(CASE WHEN prec + rec <= 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(5.0 AS DOUBLE) * prec * rec
                               / (CAST(4.0 AS DOUBLE) * prec + rec) END, 6)
                   + 0.0 AS chrf
        FROM pr
    """
    sql["readability"] = """
        WITH c AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS n_sentences,
                   len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS n_syllables
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               round(CAST(206.835 AS DOUBLE)
                     - CAST(1.015 AS DOUBLE)
                       * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                     - CAST(84.6 AS DOUBLE)
                       * (CAST(n_syllables AS DOUBLE)
                          / CAST(CASE WHEN n_words = 0 THEN 1
                                      ELSE n_words END AS DOUBLE)), 6) + 0.0
                   AS flesch_ease,
               round(CAST(0.39 AS DOUBLE)
                     * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                     + CAST(11.8 AS DOUBLE)
                       * (CAST(n_syllables AS DOUBLE)
                          / CAST(CASE WHEN n_words = 0 THEN 1
                                      ELSE n_words END AS DOUBLE))
                     - CAST(15.59 AS DOUBLE), 6) + 0.0 AS fk_grade
        FROM c
    """
    sql["neardup_decontam"] = f"""
        WITH base AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        tr AS (
            SELECT DISTINCT doc_id, substr(norm, CAST(i AS INT), 12) AS sh
            FROM base,
                 UNNEST(generate_series(1, greatest(length(norm) - 11, 1))) AS t(i)
        ),
        ev0 AS (
            SELECT doc_id + 10000000 AS eval_id,
                   trim(substr(norm, 1, length(norm) - 1)) AS norm
            FROM base WHERE doc_id % 13 = 0
        ),
        ev AS (
            SELECT DISTINCT eval_id, substr(norm, CAST(i AS INT), 12) AS sh
            FROM ev0,
                 UNNEST(generate_series(1, greatest(length(norm) - 11, 1))) AS t(i)
        ),
        sig_t AS (SELECT doc_id, min(md5(sh || '#0')) AS m0, min(md5(sh || '#1')) AS m1, min(md5(sh || '#2')) AS m2, min(md5(sh || '#3')) AS m3, min(md5(sh || '#4')) AS m4, min(md5(sh || '#5')) AS m5, min(md5(sh || '#6')) AS m6, min(md5(sh || '#7')) AS m7, min(md5(sh || '#8')) AS m8, min(md5(sh || '#9')) AS m9, min(md5(sh || '#10')) AS m10, min(md5(sh || '#11')) AS m11, min(md5(sh || '#12')) AS m12, min(md5(sh || '#13')) AS m13, min(md5(sh || '#14')) AS m14, min(md5(sh || '#15')) AS m15 FROM tr GROUP BY doc_id),
        sig_e AS (SELECT eval_id, min(md5(sh || '#0')) AS m0, min(md5(sh || '#1')) AS m1, min(md5(sh || '#2')) AS m2, min(md5(sh || '#3')) AS m3, min(md5(sh || '#4')) AS m4, min(md5(sh || '#5')) AS m5, min(md5(sh || '#6')) AS m6, min(md5(sh || '#7')) AS m7, min(md5(sh || '#8')) AS m8, min(md5(sh || '#9')) AS m9, min(md5(sh || '#10')) AS m10, min(md5(sh || '#11')) AS m11, min(md5(sh || '#12')) AS m12, min(md5(sh || '#13')) AS m13, min(md5(sh || '#14')) AS m14, min(md5(sh || '#15')) AS m15 FROM ev GROUP BY eval_id),
        bt AS (SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM sig_t UNION ALL SELECT doc_id, 1 AS band, md5(m2 || '|' || m3) AS bh FROM sig_t UNION ALL SELECT doc_id, 2 AS band, md5(m4 || '|' || m5) AS bh FROM sig_t UNION ALL SELECT doc_id, 3 AS band, md5(m6 || '|' || m7) AS bh FROM sig_t UNION ALL SELECT doc_id, 4 AS band, md5(m8 || '|' || m9) AS bh FROM sig_t UNION ALL SELECT doc_id, 5 AS band, md5(m10 || '|' || m11) AS bh FROM sig_t UNION ALL SELECT doc_id, 6 AS band, md5(m12 || '|' || m13) AS bh FROM sig_t UNION ALL SELECT doc_id, 7 AS band, md5(m14 || '|' || m15) AS bh FROM sig_t),
        be AS (SELECT eval_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM sig_e UNION ALL SELECT eval_id, 1 AS band, md5(m2 || '|' || m3) AS bh FROM sig_e UNION ALL SELECT eval_id, 2 AS band, md5(m4 || '|' || m5) AS bh FROM sig_e UNION ALL SELECT eval_id, 3 AS band, md5(m6 || '|' || m7) AS bh FROM sig_e UNION ALL SELECT eval_id, 4 AS band, md5(m8 || '|' || m9) AS bh FROM sig_e UNION ALL SELECT eval_id, 5 AS band, md5(m10 || '|' || m11) AS bh FROM sig_e UNION ALL SELECT eval_id, 6 AS band, md5(m12 || '|' || m13) AS bh FROM sig_e UNION ALL SELECT eval_id, 7 AS band, md5(m14 || '|' || m15) AS bh FROM sig_e),
        cand AS (
            SELECT DISTINCT bt.doc_id, be.eval_id
            FROM bt JOIN be ON bt.band = be.band AND bt.bh = be.bh
        ),
        na AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
        nb AS (SELECT eval_id, count(*) AS n FROM ev GROUP BY 1),
        inter AS (
            SELECT c.doc_id, c.eval_id, count(*) AS i
            FROM cand c
            JOIN tr ON tr.doc_id = c.doc_id
            JOIN ev ON ev.eval_id = c.eval_id AND ev.sh = tr.sh
            GROUP BY 1, 2
        ),
        jac AS (
            SELECT i.doc_id, i.eval_id,
                   CAST(i.i AS DOUBLE) / CAST(na.n + nb.n - i.i AS DOUBLE) AS j
            FROM inter i
            JOIN na ON na.doc_id = i.doc_id
            JOIN nb ON nb.eval_id = i.eval_id
            WHERE CAST(i.i AS DOUBLE) / CAST(na.n + nb.n - i.i AS DOUBLE) >= 0.5
        ),
        best AS (
            SELECT doc_id, eval_id, j,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY j DESC, eval_id DESC) AS rn
            FROM jac
        )
        SELECT doc_id, eval_id, round(j, 6) + 0.0 AS jaccard
        FROM best WHERE rn = 1
    """
    sql["rouge_corpus"] = f"""
        WITH d AS (
            SELECT CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS cw
            FROM documents
        ),
        p AS (
            SELECT cw, list_filter(cw, (x, i) -> i % 5 != 0) AS rw FROM d
        ),
        g AS (SELECT cw, rw, {_bleu_gram('cw', 2)} AS cg2,
                     {_bleu_gram('rw', 2)} AS rg2 FROM p),
        s AS (
            SELECT {_bleu_match('cw', 'rw')} AS m1,
                   len(cw) AS tc1, len(rw) AS tr1,
                   {_bleu_match('cg2', 'rg2')} AS m2,
                   greatest(len(cw) - 1, 0) AS tc2,
                   greatest(len(rw) - 1, 0) AS tr2
            FROM g
        ),
        a AS (
            SELECT count(*) AS n_pairs,
                   CAST(sum(m1) AS BIGINT) AS m1, CAST(sum(tc1) AS BIGINT) AS tc1,
                   CAST(sum(tr1) AS BIGINT) AS tr1,
                   CAST(sum(m2) AS BIGINT) AS m2, CAST(sum(tc2) AS BIGINT) AS tc2,
                   CAST(sum(tr2) AS BIGINT) AS tr2
            FROM s
        ),
        pr AS (
            SELECT n_pairs,
                   CAST(m1 AS DOUBLE) / CAST(tc1 AS DOUBLE) AS p1,
                   CAST(m1 AS DOUBLE) / CAST(tr1 AS DOUBLE) AS r1,
                   CAST(m2 AS DOUBLE) / CAST(tc2 AS DOUBLE) AS p2,
                   CAST(m2 AS DOUBLE) / CAST(tr2 AS DOUBLE) AS r2,
                   m1, m2
            FROM a
        )
        SELECT n_pairs,
               round(p1, 6) + 0.0 AS rouge1_p, round(r1, 6) + 0.0 AS rouge1_r,
               round(CASE WHEN m1 = 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(2 AS DOUBLE) * p1 * r1 / (p1 + r1) END, 6)
                   + 0.0 AS rouge1_f,
               round(p2, 6) + 0.0 AS rouge2_p, round(r2, 6) + 0.0 AS rouge2_r,
               round(CASE WHEN m2 = 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(2 AS DOUBLE) * p2 * r2 / (p2 + r2) END, 6)
                   + 0.0 AS rouge2_f
        FROM pr
    """
    sql["rouge_l"] = f"""
        WITH d AS (
            SELECT doc_id AS pair_id,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS cw
            FROM documents WHERE doc_id % 13 = 0
        ),
        p AS (
            SELECT pair_id, cw,
                   list_transform(cw, (x, i) -> CASE
                       WHEN i % 2 = 1 AND i + 1 <= len(cw) THEN cw[i + 1]
                       WHEN i % 2 = 0 THEN cw[i - 1]
                       ELSE x END) AS rw
            FROM d
        ),
        l AS (
            SELECT pair_id, CAST(len(cw) AS BIGINT) AS cand_len,
                   CAST(len(rw) AS BIGINT) AS ref_len,
                   CASE WHEN len(cw) = 0 OR len(rw) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(list_reduce(
                  list_prepend(
                      list_transform(generate_series(0, len(rw)), x -> 0),
                      list_transform(generate_series(1, len(cw)),
                                     i -> [CAST(i AS INT)])),
                  (prev, il) -> list_reduce(
                      list_prepend(CAST([0] AS INT[]),
                                   list_transform(generate_series(1, len(rw)),
                                                  j -> [CAST(j AS INT)])),
                      (row, jl) -> list_append(row,
                          CASE WHEN cw[il[1]] = rw[jl[1]]
                               THEN prev[jl[1]] + 1
                               ELSE greatest(row[-1], prev[jl[1] + 1]) END))
              )[-1] AS BIGINT) END AS lcs
            FROM p
        )
        SELECT pair_id, cand_len, ref_len, lcs,
               round(CASE WHEN lcs = 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(lcs AS DOUBLE)
                               / CAST(greatest(cand_len, 1) AS DOUBLE) END, 6)
                   + 0.0 AS rougeL_p,
               round(CASE WHEN lcs = 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(lcs AS DOUBLE)
                               / CAST(greatest(ref_len, 1) AS DOUBLE) END, 6)
                   + 0.0 AS rougeL_r,
               round(CASE WHEN lcs = 0 THEN CAST(0 AS DOUBLE)
                          ELSE CAST(2 AS DOUBLE)
                               * (CAST(lcs AS DOUBLE) / CAST(cand_len AS DOUBLE))
                               * (CAST(lcs AS DOUBLE) / CAST(ref_len AS DOUBLE))
                               / (CAST(lcs AS DOUBLE) / CAST(cand_len AS DOUBLE)
                                  + CAST(lcs AS DOUBLE) / CAST(ref_len AS DOUBLE))
                          END, 6) + 0.0 AS rougeL_f
        FROM l
    """
    sql["vocab_coverage"] = f"""
        WITH words AS (
            SELECT source, unnest(string_split({_NORM}, ' ')) AS word
            FROM documents
        ),
        w AS (SELECT source, word FROM words WHERE word <> ''),
        vocab AS (
            SELECT word FROM w GROUP BY word
            ORDER BY count(*) DESC, word LIMIT 25
        ),
        hit AS (
            SELECT w.source, w.word,
                   CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
            FROM w LEFT JOIN vocab v ON v.word = w.word
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               round(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                   + 0.0 AS oov_rate,
               CAST(count(DISTINCT word) AS BIGINT) AS n_types,
               CAST(count(DISTINCT CASE WHEN oov = 1 THEN word END) AS BIGINT)
                   AS n_oov_types,
               round(CAST(count(DISTINCT CASE WHEN oov = 1 THEN word END)
                          AS DOUBLE)
                     / CAST(count(DISTINCT word) AS DOUBLE), 6) + 0.0
                   AS type_oov_rate
        FROM hit GROUP BY source
    """
    sql["dedup_paragraphs"] = f"""
        WITH d AS (
            SELECT doc_id, {_NORM} AS norm,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS w
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   [array_to_string(w[1:6], ' '), norm,
                    array_to_string(w[1:6], ' ')] AS paras
            FROM d
        ),
        k AS (
            SELECT doc_id, paras,
                   list_filter(paras,
                               (x, i) -> list_position(paras, x) = i) AS kept
            FROM p
        )
        SELECT doc_id, CAST(len(paras) AS INT) AS n_paras,
               CAST(len(kept) AS INT) AS n_kept,
               array_to_string(kept, chr(10)) AS text
        FROM k
    """
    # ANN recall: the three exact pipeline replays compose as nested-WITH
    # subqueries; recall is an exact integer ratio
    sql["ann_recall"] = f"""
        WITH ex AS ({sql['cosine_topk']}),
        ap AS ({sql['ann_topk']}),
        iv AS ({sql['ivf_topk']}),
        u AS (
            SELECT 'srp' AS method,
                   (SELECT count(*) FROM ex) AS n_exact,
                   (SELECT count(*) FROM ex
                    WHERE vec_id IN (SELECT vec_id FROM ap)) AS n_overlap
            UNION ALL
            SELECT 'ivf',
                   (SELECT count(*) FROM ex),
                   (SELECT count(*) FROM ex
                    WHERE vec_id IN (SELECT vec_id FROM iv))
        )
        SELECT method, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_overlap AS BIGINT) AS n_overlap,
               round(CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
                   AS recall
        FROM u
    """
    sql["bradley_terry"] = _bt_oracle(
        5, "SELECT item, round(w, 6) AS strength FROM w5"
    )
    sql["bt_win_prob"] = _bt_oracle(
        5,
        """SELECT a.item AS item_a, b.item AS item_b,
                  round(a.w / (a.w + b.w), 6) AS p_win
           FROM (SELECT item, round(w, 6) AS w FROM w5) a
           JOIN (SELECT item, round(w, 6) AS w FROM w5) b
             ON a.item <> b.item
           WHERE (a.w + b.w) > 0""",
    )
    sql["gopher_rules"] = _gopher_oracle()
    sql["correlation_matrix"] = _corr_matrix_oracle()
    sql["numeric_relevance"] = _numeric_relevance_oracle()
    sql["spearman_matrix"] = _spearman_oracle()
    sql["mrmr_select"] = _mrmr_oracle()
    # anova_f: melt -> class-moment table -> totals + between/within SS;
    # the same gates and evaluation order as the engine fold
    sql["anova_f"] = """
        WITH src AS (
            SELECT CAST(value AS DOUBLE) AS v_value,
                   CAST(length(props) AS DOUBLE) AS v_plen,
                   CAST(event_type AS VARCHAR) AS y
            FROM events
        ),
        mel AS (
            SELECT 'value' AS feature, v_value AS x, y FROM src
            UNION ALL
            SELECT 'plen', v_plen, y FROM src
        ),
        g AS (
            SELECT feature, y, CAST(count(*) AS DOUBLE) AS ng,
                   sum(x) AS sg, sum(x * x) AS ssg
            FROM mel WHERE x IS NOT NULL AND y IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT feature, sum(ng) AS n, CAST(count(*) AS DOUBLE) AS k,
                   sum(sg) AS s_tot
            FROM g GROUP BY 1
        ),
        ss AS (
            SELECT g.feature,
                   sum(ng * (sg / ng - s_tot / n) * (sg / ng - s_tot / n))
                       AS ssb,
                   sum(ssg - sg * sg / ng) AS ssw
            FROM g JOIN tot USING (feature)
            GROUP BY 1
        )
        SELECT tot.feature,
               CAST(n AS BIGINT) AS n,
               CAST(k AS BIGINT) AS k_classes,
               round(CASE WHEN k >= 2 AND n > k AND ssw > 0
                          THEN (ssb / (k - 1)) / (ssw / (n - k)) END, 6)
                   + 0.0 AS f_stat,
               CAST(k - 1 AS BIGINT) AS df_between,
               CAST(n - k AS BIGINT) AS df_within
        FROM tot JOIN ss USING (feature)
    """
    # rolling corr: the oracle replays the ENGINE's closed form from its own
    # windowed sums (pairwise-complete gating, n-1 denominator) rather than
    # using covar_samp/corr builtins, whose incremental orders differ
    sql["rolling_corr"] = """
        WITH b AS (
            SELECT event_id, user_id, epoch_us(ts) AS t,
                   CASE WHEN value IS NOT NULL AND props IS NOT NULL
                        THEN value END AS xg,
                   CASE WHEN value IS NOT NULL AND props IS NOT NULL
                        THEN CAST(length(props) AS DOUBLE) END AS yg
            FROM events
        ),
        s AS (
            SELECT event_id, user_id,
                   CAST(count(xg) OVER w AS DOUBLE) AS n,
                   sum(xg) OVER w AS sx,
                   sum(yg) OVER w AS sy,
                   sum(xg * yg) OVER w AS sxy,
                   sum(xg * xg) OVER w AS sxx,
                   sum(yg * yg) OVER w AS syy
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY t
                         RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id,
               CAST(n AS BIGINT) AS value_plen_n_3600s,
               round(CASE WHEN n >= 2
                          THEN (sxy - sx * sy / n) / (n - 1) END, 6)
                   AS value_plen_cov_3600s,
               round(CASE WHEN n >= 2 AND (sxx - sx * sx / n) > 0
                               AND (syy - sy * sy / n) > 0
                          THEN (sxy - sx * sy / n)
                               / sqrt((sxx - sx * sx / n)
                                      * (syy - sy * sy / n)) END, 6)
                   AS value_plen_corr_3600s
        FROM s
    """
    # change features: identical lag order (ts, event_id); epoch() and the
    # engine's unix_micros/1e6 agree exactly (micros < 2^53)
    sql["delta_features"] = """
        WITH l AS (
            SELECT event_id, user_id, value,
                   lag(value, 1) OVER w AS lv,
                   epoch(ts) - epoch(lag(ts, 1) OVER w) AS dt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               round(value - lv, 6) AS value_diff_1,
               CASE WHEN lv <> 0 THEN round(value / lv - 1.0, 6) END
                   AS value_pct_1,
               CASE WHEN dt <> 0 THEN round((value - lv) / dt, 6) END
                   AS value_rate_1
        FROM l
    """
    # PSI: identical edge convention (ref-slice quantile_cont == Spark
    # percentile, both quantized to 1e-6 before the bin comparison)
    sql["psi_drift"] = f"""
        WITH ref AS (
            SELECT value FROM events
            WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}' AND value IS NOT NULL
        ),
        edges AS (
            SELECT list_transform(
                quantile_cont(value, {[i / 10 for i in range(1, 10)]}),
                e -> round(e, 6)) AS e
            FROM ref
        ),
        binned AS (
            SELECT 1 + len(list_filter(edges.e, x -> CAST(value AS DOUBLE) > x))
                       AS bin,
                   (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS is_ref
            FROM events, edges WHERE value IS NOT NULL
        ),
        counts AS (
            SELECT bin,
                   sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                   sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
            FROM binned GROUP BY 1
        ),
        spine AS (SELECT unnest(generate_series(1, 10)) AS bin),
        filled AS (
            SELECT s.bin,
                   CASE WHEN s.bin >= 2 THEN edges.e[s.bin - 1] END AS lo,
                   CASE WHEN s.bin <= 9 THEN edges.e[s.bin] END AS hi,
                   CAST(coalesce(c.n_ref, 0) AS BIGINT) AS n_ref,
                   CAST(coalesce(c.n_cur, 0) AS BIGINT) AS n_cur
            FROM spine s LEFT JOIN counts c USING (bin), edges
        ),
        tot AS (
            SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
                   CAST(sum(n_cur) AS DOUBLE) AS tc
            FROM filled
        ),
        termed AS (
            SELECT bin, lo, hi, n_ref, n_cur,
                   greatest(n_ref / tot.tr, 1e-6) AS p,
                   greatest(n_cur / tot.tc, 1e-6) AS q
            FROM filled, tot
        ),
        total AS (SELECT sum((p - q) * ln(p / q)) AS psi FROM termed)
        SELECT bin, lo, hi, n_ref, n_cur,
               round(p, 6) AS ref_share,
               round(q, 6) AS cur_share,
               round((p - q) * ln(p / q), 6) AS psi_term,
               round(total.psi, 6) AS psi_total
        FROM termed, total
    """
    # KS: cumulative ref/cur counts over pooled distinct values — the
    # single ordered window here is the ORACLE's luxury; the engine runs
    # the bucketed two-phase cumulative instead
    sql["ks_drift"] = f"""
        WITH pv AS (
            SELECT CAST(value AS DOUBLE) AS v,
                   sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                       THEN 1 ELSE 0 END) AS n_ref,
                   sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                       THEN 0 ELSE 1 END) AS n_cur
            FROM events WHERE value IS NOT NULL GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
                   CAST(sum(n_cur) AS DOUBLE) AS tc
            FROM pv
        ),
        cum AS (
            SELECT sum(n_ref) OVER (ORDER BY v) AS cr,
                   sum(n_cur) OVER (ORDER BY v) AS cc
            FROM pv
        )
        SELECT round(max(abs(CAST(cr AS DOUBLE) / tot.tr
                             - CAST(cc AS DOUBLE) / tot.tc)), 6) AS ks_stat,
               CAST(max(tot.tr) AS BIGINT) AS n_ref,
               CAST(max(tot.tc) AS BIGINT) AS n_cur
        FROM cum, tot
    """
    # the incremental postings build is score-identical to the one-shot
    # build by the add-only df-partials contract — shared oracle = check
    sql["bm25_incremental"] = sql["bm25_multi_topk"]
    # ACF replay: the expanded cross-moment closed form, term-for-term the
    # engine's projection (num = cxy - mean*(ca+cb) + m*mean*mean over the
    # full-series SSE); ordering (ts, event_id) matches the µs window key
    sql["acf_features"] = """
        WITH b AS (
            SELECT user_id, CAST(value AS DOUBLE) AS x,
                   lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
                   lag(CAST(value AS DOUBLE), 2) OVER w AS l2,
                   lag(CAST(value AS DOUBLE), 3) OVER w AS l3
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        m AS (
            SELECT user_id,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(x) AS s1, sum(x * x) AS s2,
                   CAST(count(l1) AS DOUBLE) AS m1, sum(x * l1) AS cxy1,
                   sum(CASE WHEN l1 IS NOT NULL THEN x END) AS ca1,
                   sum(l1) AS cb1,
                   CAST(count(l2) AS DOUBLE) AS m2, sum(x * l2) AS cxy2,
                   sum(CASE WHEN l2 IS NOT NULL THEN x END) AS ca2,
                   sum(l2) AS cb2,
                   CAST(count(l3) AS DOUBLE) AS m3, sum(x * l3) AS cxy3,
                   sum(CASE WHEN l3 IS NOT NULL THEN x END) AS ca3,
                   sum(l3) AS cb3
            FROM b GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(s1 / n, 6) + 0.0 AS mean,
               round(CASE WHEN m1 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                   (cxy1 - s1 / n * (ca1 + cb1) + m1 * (s1 / n) * (s1 / n))
                       / (s2 - s1 * s1 / n) END, 6) + 0.0 AS acf_1,
               round(CASE WHEN m2 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                   (cxy2 - s1 / n * (ca2 + cb2) + m2 * (s1 / n) * (s1 / n))
                       / (s2 - s1 * s1 / n) END, 6) + 0.0 AS acf_2,
               round(CASE WHEN m3 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                   (cxy3 - s1 / n * (ca3 + cb3) + m3 * (s1 / n) * (s1 / n))
                       / (s2 - s1 * s1 / n) END, 6) + 0.0 AS acf_3
        FROM m
    """
    # serve_features: DuckDB ASOF joins + the engine's TTL gate (gap in
    # epoch seconds <= ttl, matched values nulled when stale)
    sql["serve_features"] = """
        WITH spine AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, ts, max(value) AS amount FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        s AS (
            SELECT user_id, ts, max(value) AS sval FROM events
            WHERE event_type = 'signup' GROUP BY 1, 2
        ),
        j1 AS (
            SELECT sp.event_id, sp.user_id, sp.ts,
                   CASE WHEN CAST(epoch_us(sp.ts) - epoch_us(p.ts)
                             AS DOUBLE) / 1000000.0 <= 172800.0
                        THEN p.amount END AS purch_amount
            FROM spine sp ASOF LEFT JOIN p
              ON sp.user_id = p.user_id AND sp.ts >= p.ts
        )
        SELECT j1.event_id, j1.purch_amount, s2.sval AS sig_sval
        FROM j1 ASOF LEFT JOIN s s2
          ON j1.user_id = s2.user_id AND j1.ts >= s2.ts
    """
    # negative sampling: identical md5 index order, md5 slot hash, mod-M
    # candidate, anti-join exclusion; chr(31) = the concat_ws separator
    sql["negative_samples"] = """
        WITH pos AS (
            SELECT DISTINCT l_suppkey AS u, l_partkey AS it
            FROM lineitem WHERE l_orderkey % 37 = 0
        ),
        uni AS (SELECT DISTINCT p_partkey AS it FROM part),
        n AS (SELECT CAST(count(*) AS BIGINT) AS m FROM uni),
        idx AS (
            SELECT it,
                   row_number() OVER (
                       ORDER BY CAST(('0x' || substr(md5(CAST(it AS VARCHAR)),
                                      1, 15)) AS BIGINT), it) - 1 AS six
            FROM uni
        ),
        slots AS (
            SELECT u, it, s AS slot
            FROM pos, (SELECT unnest([0, 1]) AS s)
        ),
        cand AS (
            SELECT u, it, slot,
                   CAST(('0x' || substr(md5(
                       CAST(u AS VARCHAR) || chr(31) ||
                       CAST(it AS VARCHAR) || chr(31) ||
                       CAST(slot AS VARCHAR) || chr(31) || '42'),
                       1, 8)) AS BIGINT) % n.m AS six
            FROM slots, n
        ),
        joined AS (
            SELECT c.u, c.it, c.slot, i.it AS neg
            FROM cand c JOIN idx i USING (six)
        )
        SELECT j.u AS l_suppkey, j.it AS l_partkey, j.slot,
               j.neg AS neg_l_partkey
        FROM joined j
        LEFT JOIN pos p ON p.u = j.u AND p.it = j.neg
        WHERE p.u IS NULL
    """
    # time-to-event: the same gated reverse running min (strictly-after
    # frame), epoch seconds = µs/1e6 in both engines
    sql["time_to_event"] = """
        WITH b AS (
            SELECT event_id, user_id, ts, event_type,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t
            FROM events
        ),
        w AS (
            SELECT event_id, t,
                   min(CASE WHEN event_type = 'purchase' THEN t END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS nt
            FROM b
        )
        SELECT event_id, round(nt - t, 6) + 0.0 AS tte_seconds FROM w
    """
    # dft features: identical position/length windows + trig folds; the
    # theta evaluation order (k * ((2π·pos)/n)) matches the engine
    trig = ", ".join(
        f"sum(x * cos({k} * (2 * pi() * pos / n))) AS re{k}, "
        f"sum(-x * sin({k} * (2 * pi() * pos / n))) AS im{k}"
        for k in (1, 2, 3)
    )
    mags = ", ".join(
        f"round(CASE WHEN cnt > {k} THEN sqrt(re{k} * re{k} + im{k} * im{k}) "
        f"END, 6) + 0.0 AS dft_mag_{k}"
        for k in (1, 2, 3)
    )
    sql["dft_features"] = f"""
        WITH b AS (
            SELECT user_id, CAST(value AS DOUBLE) AS x,
                   CAST(row_number() OVER w - 1 AS DOUBLE) AS pos,
                   CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE) AS n
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        m AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS cnt, {trig}
            FROM b GROUP BY 1
        )
        SELECT user_id, CAST(cnt AS BIGINT) AS n_obs, {mags}
        FROM m
    """
    # series features: identical lag/lead/run-id/streak window chain;
    # inc is 0 on the first row (NULL comparison), run increments on
    # every non-increasing step — the engine's when/otherwise exactly
    sql["series_features"] = """
        WITH b0 AS (
            SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS x,
                   lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
                   lag(CAST(value AS DOUBLE), 2) OVER w AS l2,
                   lead(CAST(value AS DOUBLE), 1) OVER w AS f1
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        b1 AS (
            SELECT b0.*,
                   CASE WHEN x > l1 THEN 1 ELSE 0 END AS inc
            FROM b0
        ),
        b2 AS (
            SELECT b1.*,
                   sum(1 - inc) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS run
            FROM b1
        ),
        s AS (
            SELECT b2.*,
                   sum(inc) OVER (PARTITION BY user_id, run) AS streak
            FROM b2
        ),
        m AS (
            SELECT user_id,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(x * x) AS s2,
                   CAST(count(l1) AS DOUBLE) AS nd,
                   sum(abs(x - l1)) AS sad,
                   sum(x - l1) AS sd,
                   sum((x - l1) * (x - l1)) AS sdd,
                   sum(CASE WHEN l1 < x AND x > f1 THEN 1 ELSE 0 END)
                       AS peaks,
                   sum(CASE WHEN (x - l1) * (l1 - l2) < 0 THEN 1 ELSE 0 END)
                       AS dirch,
                   max(streak) AS maxrun
            FROM s GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(s2, 6) + 0.0 AS abs_energy,
               round(CASE WHEN nd >= 1 THEN sad / nd END, 6) + 0.0
                   AS mean_abs_change,
               round(CASE WHEN nd >= 1 THEN sd / nd END, 6) + 0.0
                   AS mean_change,
               round(CASE WHEN nd >= 1 THEN sqrt(sdd) END, 6) + 0.0
                   AS cid_ce,
               CAST(peaks AS BIGINT) AS n_peaks,
               CAST(dirch AS BIGINT) AS n_dir_changes,
               CAST(maxrun AS BIGINT) AS longest_inc_run
        FROM m
    """
    # classification metrics over the deterministic (score, label) pair:
    # AUC via avg-rank cumulative (python round = half-even = DuckDB),
    # reliability via fixed-width bins, lift via quantile_cont bands
    sql["auc_roc"] = f"""
        WITH {_SCORED_SQL},
        vals AS (
            SELECT score AS v, CAST(count(*) AS DOUBLE) AS c,
                   sum(CAST(y AS DOUBLE)) AS p
            FROM scored GROUP BY 1
        ),
        cum AS (
            SELECT v, c, p, sum(c) OVER (ORDER BY v) AS cc FROM vals
        ),
        agg AS (
            SELECT sum(p) AS np, sum(c - p) AS nn,
                   sum(p * (cc - c + (c + 1) / 2.0)) AS rp
            FROM cum
        )
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round((rp - np * (np + 1) / 2.0) / (np * nn), 6) AS auc
        FROM agg
    """
    sql["reliability_curve"] = f"""
        WITH {_SCORED_SQL},
        b AS (
            SELECT least(greatest(CAST(floor(score * 10) AS INT) + 1, 1), 10)
                       AS bin,
                   count(*) AS n, avg(score) AS ms,
                   avg(CAST(y AS DOUBLE)) AS fp
            FROM scored GROUP BY 1
        )
        SELECT bin, CAST(bin - 1 AS DOUBLE) / 10 AS lo,
               CAST(bin AS DOUBLE) / 10 AS hi, n,
               round(ms, 6) + 0.0 AS mean_score,
               round(fp, 6) + 0.0 AS frac_pos,
               round(fp - ms, 6) + 0.0 AS gap
        FROM b
    """
    sql["lift_table"] = f"""
        WITH {_SCORED_SQL},
        edges AS (
            SELECT list_transform(
                quantile_cont(score, {[i / 10 for i in range(1, 10)]}),
                e -> round(e, 6)) AS e
            FROM scored
        ),
        banded AS (
            SELECT 11 - (1 + len(list_filter(edges.e, x -> score > x)))
                       AS decile,
                   CAST(y AS DOUBLE) AS y
            FROM scored, edges
        ),
        bands AS (
            SELECT decile, count(*) AS n, sum(y) AS pos
            FROM banded GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n) AS DOUBLE) AS tn, sum(pos) AS tp FROM bands
        ),
        cum AS (
            SELECT decile, n, pos,
                   sum(pos) OVER (ORDER BY decile) AS cpos,
                   CAST(sum(n) OVER (ORDER BY decile) AS DOUBLE) AS cn
            FROM bands
        )
        SELECT c.decile,
               CASE WHEN c.decile <= 9 THEN edges.e[10 - c.decile] END AS lo,
               CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS n_pos,
               round(pos / n, 6) + 0.0 AS pos_rate,
               round(CASE WHEN tp / tn > 0 THEN (pos / n) / (tp / tn) END, 6)
                   + 0.0 AS lift,
               round(CASE WHEN tp > 0 THEN cpos / tp END, 6) + 0.0
                   AS cum_capture,
               round(CASE WHEN tp / tn > 0 THEN (cpos / cn) / (tp / tn)
                     END, 6) + 0.0 AS cum_lift
        FROM cum c, edges, tot
    """
    # auc_by_group: group-partitioned rank cumulative over distinct
    # scores, same average-rank identity; single-class groups NULL
    sql["auc_by_group"] = f"""
        WITH {_SCORED_SQL},
        vals AS (
            SELECT event_type, score AS v, CAST(count(*) AS DOUBLE) AS c,
                   sum(CAST(y AS DOUBLE)) AS p
            FROM scored GROUP BY 1, 2
        ),
        cum AS (
            SELECT *, sum(c) OVER (
                PARTITION BY event_type ORDER BY v) AS cc
            FROM vals
        ),
        agg AS (
            SELECT event_type, sum(p) AS np, sum(c - p) AS nn,
                   sum(p * (cc - c + (c + 1) / 2.0)) AS rp
            FROM cum GROUP BY 1
        )
        SELECT event_type, CAST(np AS BIGINT) AS n_pos,
               CAST(nn AS BIGINT) AS n_neg,
               round(CASE WHEN np > 0 AND nn > 0
                     THEN (rp - np * (np + 1) / 2.0) / (np * nn) END, 6)
                   + 0.0 AS auc
        FROM agg
    """
    # pr_curve: per-threshold conditional counts from one pass, the same
    # NULL gates (0/0 precision, F1 needs both)
    pr_rows = []
    for t in [round(i / 10, 6) for i in range(1, 10)]:
        tp = f"sum(CASE WHEN score >= {t} AND y = 1 THEN 1 ELSE 0 END)"
        fp = f"sum(CASE WHEN score >= {t} AND y = 0 THEN 1 ELSE 0 END)"
        fn = f"sum(CASE WHEN score < {t} AND y = 1 THEN 1 ELSE 0 END)"
        tn = f"sum(CASE WHEN score < {t} AND y = 0 THEN 1 ELSE 0 END)"
        pr_rows.append(f"""
            SELECT {t} AS threshold,
                   CAST({tp} AS BIGINT) AS tp, CAST({fp} AS BIGINT) AS fp,
                   CAST({fn} AS BIGINT) AS fn, CAST({tn} AS BIGINT) AS tn,
                   round(CASE WHEN {tp} + {fp} > 0
                         THEN CAST({tp} AS DOUBLE) / ({tp} + {fp}) END, 6)
                       + 0.0 AS precision,
                   round(CASE WHEN {tp} + {fn} > 0
                         THEN CAST({tp} AS DOUBLE) / ({tp} + {fn}) END, 6)
                       + 0.0 AS recall,
                   round(CASE WHEN {tp} + {fp} > 0 AND {tp} + {fn} > 0
                              AND CAST({tp} AS DOUBLE) / ({tp} + {fp})
                                  + CAST({tp} AS DOUBLE) / ({tp} + {fn}) > 0
                         THEN 2 * (CAST({tp} AS DOUBLE) / ({tp} + {fp}))
                                * (CAST({tp} AS DOUBLE) / ({tp} + {fn}))
                              / (CAST({tp} AS DOUBLE) / ({tp} + {fp})
                                 + CAST({tp} AS DOUBLE) / ({tp} + {fn}))
                         END, 6) + 0.0 AS f1,
                   round(CAST({tp} + {tn} AS DOUBLE)
                         / ({tp} + {fp} + {fn} + {tn}), 6) + 0.0 AS accuracy
            FROM scored""")
    sql["pr_curve"] = (
        "WITH " + _SCORED_SQL + " " + " UNION ALL ".join(pr_rows)
    )
    # regression metrics: gated moments per group, same closed forms
    sql["regression_metrics"] = """
        WITH s AS (
            SELECT event_type,
                   0.8 * CAST(value AS DOUBLE)
                   + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                          || '#11'), 1, 8)) AS BIGINT) / 4294967296.0
                      - 0.5) * 20.0 + 5.0 AS pred,
                   CAST(value AS DOUBLE) AS y
            FROM events
        ),
        m AS (
            SELECT event_type,
                   CAST(count(CASE WHEN pred IS NOT NULL AND y IS NOT NULL
                              THEN 1 END) AS DOUBLE) AS n,
                   sum((pred - y) * (pred - y)) AS se,
                   sum(abs(pred - y)) AS ae,
                   sum(pred - y) AS be,
                   sum(y) AS sy, sum(y * y) AS syy
            FROM s GROUP BY 1
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(CASE WHEN n > 0 THEN sqrt(se / n) END, 6) + 0.0 AS rmse,
               round(CASE WHEN n > 0 THEN ae / n END, 6) + 0.0 AS mae,
               round(CASE WHEN n > 0 THEN be / n END, 6) + 0.0 AS bias,
               round(CASE WHEN n >= 2 AND syy - sy * sy / n > 0
                     THEN 1 - se / (syy - sy * sy / n) END, 6) + 0.0 AS r2
        FROM m
    """
    # isotonic fit: PAV's solution via the minimax identity over interval
    # averages; a(j,k) from prefix sums (cp[j-1] = cp[j] - p[j])
    sql["isotonic_fit"] = f"""
        WITH {_SCORED_SQL},
        b AS (
            SELECT least(greatest(CAST(floor(score * 10) AS INT) + 1, 1), 10)
                       AS bin,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(CAST(y AS DOUBLE)) AS p
            FROM scored GROUP BY 1
        ),
        ord AS (
            SELECT bin, n, p, row_number() OVER (ORDER BY bin) AS i FROM b
        ),
        pre AS (
            SELECT i, sum(n) OVER (ORDER BY i) AS cn,
                   sum(p) OVER (ORDER BY i) AS cp
            FROM ord
        ),
        iv AS (
            SELECT pj.i AS j, pk.i AS k,
                   (pk.cp - pj.cp + oj.p) / (pk.cn - pj.cn + oj.n) AS a
            FROM pre pj
            JOIN pre pk ON pk.i >= pj.i
            JOIN ord oj ON oj.i = pj.i
        ),
        minx AS (
            SELECT t.i, iv.j, min(iv.a) AS mn
            FROM (SELECT i FROM ord) t
            JOIN iv ON iv.j <= t.i AND iv.k >= t.i
            GROUP BY 1, 2
        ),
        fit AS (SELECT i, max(mn) AS v FROM minx GROUP BY 1)
        SELECT o.bin, round(fit.v, 6) AS fitted
        FROM fit JOIN ord o USING (i)
    """
    # psi_score: the fitted model replayed relationally — reference edges
    # via quantile_cont (type-7 equivalence), reference shares floored at
    # fit, per-group current shares floored at score; full bin spine so
    # empty bins contribute their floored term
    sql["psi_score"] = f"""
        WITH ref AS (
            SELECT CAST(value AS DOUBLE) AS v FROM events
            WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}' AND value IS NOT NULL
        ),
        edges AS (
            SELECT list_transform(
                quantile_cont(v, {[i / 5 for i in range(1, 5)]}),
                e -> round(e, 6)) AS e
            FROM ref
        ),
        spine AS (SELECT unnest(generate_series(1, 5)) AS bin),
        rb AS (
            SELECT 1 + len(list_filter(edges.e, x -> v > x)) AS bin
            FROM ref, edges
        ),
        reftot AS (SELECT CAST(count(*) AS DOUBLE) AS nr FROM rb),
        p AS (
            SELECT spine.bin,
                   greatest(CAST(count(rb.bin) AS DOUBLE) / reftot.nr, 1e-6)
                       AS p
            FROM spine LEFT JOIN rb ON rb.bin = spine.bin, reftot
            GROUP BY spine.bin, reftot.nr
        ),
        curb AS (
            SELECT event_type AS g,
                   1 + len(list_filter(edges.e, x -> CAST(value AS DOUBLE) > x))
                       AS bin
            FROM events, edges
            WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}' AND value IS NOT NULL
        ),
        gn AS (SELECT g, CAST(count(*) AS DOUBLE) AS n FROM curb GROUP BY 1),
        qc AS (SELECT g, bin, count(*) AS c FROM curb GROUP BY 1, 2),
        grid AS (
            SELECT gn.g, gn.n, p.bin, p.p,
                   greatest(CAST(coalesce(qc.c, 0) AS DOUBLE) / gn.n, 1e-6)
                       AS q
            FROM gn CROSS JOIN p
            LEFT JOIN qc ON qc.g = gn.g AND qc.bin = p.bin
        )
        SELECT g AS event_type, CAST(any_value(n) AS BIGINT) AS n,
               round(sum((p - q) * ln(p / q)), 6) + 0.0 AS psi
        FROM grid GROUP BY g
    """
    # seasonal decomposition: same centered ±period/2 µs-RANGE trend
    # (sum/count, not avg, to pin the closed form), per-(user, phase)
    # detrended mean, inner join preserves all-null groups as NULL rows
    sql["seasonal_decompose"] = """
        WITH b AS (
            SELECT event_id, user_id, value, epoch_us(ts) AS t,
                   CAST(floor((epoch_us(ts) % 86400000000)
                              / 3600000000) AS INT) AS phase
            FROM events
        ),
        w AS (
            SELECT *,
                   sum(CAST(value AS DOUBLE)) OVER fr
                       / count(CAST(value AS DOUBLE)) OVER fr AS tr
            FROM b
            WINDOW fr AS (PARTITION BY user_id ORDER BY t
                          RANGE BETWEEN 43200000000 PRECEDING
                                    AND 43200000000 FOLLOWING)
        ),
        d AS (SELECT *, CAST(value AS DOUBLE) - tr AS det FROM w),
        s AS (
            SELECT user_id, phase, sum(det) / count(det) AS seas
            FROM d GROUP BY 1, 2
        )
        SELECT d.event_id, d.phase,
               round(d.tr, 6) + 0.0 AS trend,
               round(s.seas, 6) + 0.0 AS seasonal,
               round(d.det - s.seas, 6) + 0.0 AS resid
        FROM d JOIN s USING (user_id, phase)
    """
    # quantile binning: same exact interpolated percentile edges (rounded
    # 6) and the same count-of-smaller-edges bin index as psi_drift
    sql["quantile_bin"] = """
        WITH edges AS (
            SELECT list_transform(
                quantile_cont(CAST(value AS DOUBLE),
                              [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                e -> round(e, 6)) AS e
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_id, value,
               CASE WHEN value IS NOT NULL THEN
                   CAST(1 + len(list_filter(edges.e,
                       x -> CAST(value AS DOUBLE) > x)) AS INT)
               END AS value_bin
        FROM events, edges
    """
    sql["winsorize"] = """
        WITH b AS (
            SELECT round(quantile_cont(CAST(value AS DOUBLE), 0.05), 6) AS lo,
                   round(quantile_cont(CAST(value AS DOUBLE), 0.95), 6) AS hi
            FROM events
        )
        SELECT event_id, value,
               CASE WHEN value IS NULL THEN NULL
                    WHEN CAST(value AS DOUBLE) < b.lo THEN b.lo
                    WHEN CAST(value AS DOUBLE) > b.hi THEN b.hi
                    ELSE CAST(value AS DOUBLE) END AS value_wins
        FROM events, b
    """
    # feature relevance: exact contingency replay — cell counts, expected
    # grid (E = a*b/n, the engine's evaluation order), MI over observed
    # cells + chi2 over the full grid, folded sorted by (v, y)
    sql["feature_relevance"] = """
        WITH src AS (
            SELECT CAST(floor(value / 50) AS INT) AS vbin,
                   CAST(user_id % 8 AS INT) AS ubin, event_type
            FROM events
        ),
        mel AS (
            SELECT 'vbin' AS feature, CAST(vbin AS VARCHAR) AS v,
                   CAST(event_type AS VARCHAR) AS y FROM src
            UNION ALL
            SELECT 'ubin', CAST(ubin AS VARCHAR),
                   CAST(event_type AS VARCHAR) FROM src
        ),
        cells AS (
            SELECT feature, v, y, CAST(count(*) AS DOUBLE) AS c
            FROM mel WHERE v IS NOT NULL AND y IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        av AS (SELECT feature, v, sum(c) AS a FROM cells GROUP BY 1, 2),
        bl AS (SELECT feature, y, sum(c) AS b FROM cells GROUP BY 1, 2),
        nf AS (SELECT feature, sum(c) AS n FROM cells GROUP BY 1),
        grid AS (
            SELECT av.feature, av.v, bl.y, nf.n,
                   coalesce(cells.c, 0.0) AS o,
                   av.a * bl.b / nf.n AS e
            FROM av
            JOIN bl USING (feature)
            JOIN nf ON nf.feature = av.feature
            LEFT JOIN cells ON cells.feature = av.feature
                           AND cells.v = av.v AND cells.y = bl.y
        ),
        terms AS (
            SELECT feature, n, v, y,
                   CASE WHEN o > 0 THEN (o / n) * ln(o / e)
                        ELSE 0.0 END AS mi_t,
                   (o - e) * (o - e) / e AS chi_t
            FROM grid
        ),
        folded AS (
            SELECT feature, max(n) AS n,
                   list(mi_t ORDER BY v, y) AS mis,
                   list(chi_t ORDER BY v, y) AS chis,
                   CAST(count(DISTINCT v) AS DOUBLE) AS nv,
                   CAST(count(DISTINCT y) AS DOUBLE) AS nl
            FROM terms GROUP BY 1
        )
        SELECT feature, CAST(n AS BIGINT) AS n_obs,
               CAST(nv AS BIGINT) AS n_values,
               CAST(nl AS BIGINT) AS n_labels,
               round(list_reduce(list_prepend(0.0, mis),
                                 (acc, x) -> acc + x), 6) + 0.0 AS mi_nats,
               round(list_reduce(list_prepend(0.0, chis),
                                 (acc, x) -> acc + x), 6) + 0.0 AS chi2,
               CAST((nv - 1) * (nl - 1) AS BIGINT) AS dof,
               round(CASE WHEN least(nv - 1, nl - 1) >= 1 THEN
                   sqrt(list_reduce(list_prepend(0.0, chis),
                                    (acc, x) -> acc + x)
                        / (n * least(nv - 1, nl - 1))) END, 6) + 0.0
                   AS cramers_v
        FROM folded
    """
    # Fourier: identical literal 2πh multiplier and phase expression;
    # + 0.0 canonicalizes the signed zero sin() hits at half-period
    sql["fourier_time"] = """
        SELECT event_id,
               round(sin(2 * pi() * 1 * phase), 6) + 0.0 AS ts_86400s_sin_1,
               round(cos(2 * pi() * 1 * phase), 6) + 0.0 AS ts_86400s_cos_1,
               round(sin(2 * pi() * 2 * phase), 6) + 0.0 AS ts_86400s_sin_2,
               round(cos(2 * pi() * 2 * phase), 6) + 0.0 AS ts_86400s_cos_2
        FROM (
            SELECT event_id,
                   (CAST(epoch(ts) AS DOUBLE) % 86400.0) / 86400.0 AS phase
            FROM events
        )
    """
    # scalers: fit statistics rounded to 6 BEFORE use (the engine's
    # replayable-model contract), zero/NULL spread -> scale 1
    sql["scale_zscore"] = """
        WITH m AS (
            SELECT round(avg(CAST(value AS DOUBLE)), 6) AS a,
                   round(stddev_samp(CAST(value AS DOUBLE)), 6) AS b
            FROM events
        )
        SELECT event_id, value,
               round((CAST(value AS DOUBLE) - m.a)
                     / (CASE WHEN m.b > 0 THEN m.b ELSE 1 END), 6) + 0.0
                   AS value_scaled
        FROM events, m
    """
    sql["scale_robust"] = """
        WITH m AS (
            SELECT round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS a,
                   round(quantile_cont(CAST(value AS DOUBLE), 0.75)
                         - quantile_cont(CAST(value AS DOUBLE), 0.25), 6) AS b
            FROM events
        )
        SELECT event_id, value,
               round((CAST(value AS DOUBLE) - m.a)
                     / (CASE WHEN m.b > 0 THEN m.b ELSE 1 END), 6) + 0.0
                   AS value_scaled
        FROM events, m
    """
    sql["count_encode"] = """
        SELECT event_id, event_type,
               round(CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)
                     / (SELECT count(*) FROM events), 6) AS event_type_freq
        FROM events
    """
    # one-hot: the oracle re-derives the fitted top-3 list (count desc,
    # value asc) and compares by RANK — same stable-column contract
    sql["one_hot_topk"] = """
        WITH c AS (
            SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS k,
                   count(*) AS n
            FROM events GROUP BY 1
        ),
        r AS (SELECT k, row_number() OVER (ORDER BY n DESC, k) AS rn FROM c)
        SELECT event_id, event_type,
               CAST(COALESCE(CAST(event_type AS VARCHAR), '__null__')
                    = (SELECT k FROM r WHERE rn = 1) AS INT) AS event_type_oh_1,
               CAST(COALESCE(CAST(event_type AS VARCHAR), '__null__')
                    = (SELECT k FROM r WHERE rn = 2) AS INT) AS event_type_oh_2,
               CAST(COALESCE(CAST(event_type AS VARCHAR), '__null__')
                    = (SELECT k FROM r WHERE rn = 3) AS INT) AS event_type_oh_3,
               CAST(COALESCE(CAST(event_type AS VARCHAR), '__null__')
                    NOT IN (SELECT k FROM r WHERE rn <= 3) AS INT)
                   AS event_type_oh_other
        FROM events
    """
    sql["rare_collapse"] = """
        WITH keep AS (
            SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS k
            FROM documents GROUP BY 1 HAVING count(*) >= 70
        )
        SELECT doc_id, lang,
               CASE WHEN COALESCE(CAST(lang AS VARCHAR), '__null__')
                         IN (SELECT k FROM keep)
                    THEN COALESCE(CAST(lang AS VARCHAR), '__null__')
                    ELSE '__other__' END AS lang_rc
        FROM documents
    """
    # tf-idf: sklearn smooth-idf formula term-for-term; weights round to
    # 6 BEFORE the pair dot (the engine's replayable-model contract)
    _tfidf_cte = f"""
        tf AS (
            SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY 1, 2
        ),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        dfs AS (SELECT word, count(*) AS dfc FROM tf GROUP BY 1)
    """
    sql["tfidf_vectors"] = f"""
        WITH {_tfidf_cte},
        keep AS (
            SELECT word, ln((1 + nd.n) / (1 + CAST(dfc AS DOUBLE))) + 1 AS idf
            FROM dfs, nd WHERE dfc >= 1
        ),
        w AS (
            SELECT tf.doc_id, tf.word, tf.tf,
                   CAST(tf.tf AS DOUBLE) * k.idf AS wgt
            FROM tf JOIN keep k USING (word)
        ),
        nrm AS (SELECT doc_id, sqrt(sum(wgt * wgt)) AS nm FROM w GROUP BY 1)
        SELECT w.doc_id, w.word, w.tf,
               round(w.wgt / nrm.nm, 6) + 0.0 AS tfidf
        FROM w JOIN nrm USING (doc_id)
    """
    sql["tfidf_cosine"] = f"""
        WITH {_tfidf_cte},
        keep AS (
            SELECT word, ln((1 + nd.n) / (1 + CAST(dfc AS DOUBLE))) + 1 AS idf
            FROM dfs, nd WHERE CAST(dfc AS DOUBLE) <= 0.3 * nd.n
        ),
        w AS (
            SELECT tf.doc_id, tf.word,
                   CAST(tf.tf AS DOUBLE) * k.idf AS wgt
            FROM tf JOIN keep k USING (word)
        ),
        nrm AS (SELECT doc_id, sqrt(sum(wgt * wgt)) AS nm FROM w GROUP BY 1),
        vec AS (
            SELECT w.doc_id, w.word, round(w.wgt / nrm.nm, 6) AS u
            FROM w JOIN nrm USING (doc_id)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(sum(a.u * b.u), 6) + 0.0 AS cosine
        FROM vec a JOIN vec b ON a.word = b.word AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING round(sum(a.u * b.u), 6) >= 0.3
    """
    # PCA: 2×2 symmetric eigenproblem in closed form — λ from the trace/
    # discriminant, v_k ∝ [cov, λ_k − var_x], unit-normalized, oriented
    # largest-|entry|-positive, entries rounded to 6 BEFORE projecting
    # (the engine's replayable-model contract, identical evaluation order)
    sql["pca_project"] = """
        WITH base AS (
            SELECT event_id, CAST(value AS DOUBLE) AS x,
                   CAST(length(props) AS DOUBLE) AS y
            FROM events
        ),
        fit AS (
            SELECT round(avg(x), 6) AS mx, round(avg(y), 6) AS my,
                   var_samp(x) AS a, covar_samp(x, y) AS b, var_samp(y) AS c
            FROM base WHERE x IS NOT NULL AND y IS NOT NULL
        ),
        eig AS (
            SELECT mx, my, a, b, c,
                   ((a + c) + sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS l1,
                   ((a + c) - sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS l2
            FROM fit
        ),
        raw AS (
            SELECT mx, my,
                   b / sqrt(b * b + (l1 - a) * (l1 - a)) AS u1x,
                   (l1 - a) / sqrt(b * b + (l1 - a) * (l1 - a)) AS u1y,
                   b / sqrt(b * b + (l2 - a) * (l2 - a)) AS u2x,
                   (l2 - a) / sqrt(b * b + (l2 - a) * (l2 - a)) AS u2y
            FROM eig
        ),
        v AS (
            SELECT mx, my,
                   round(CASE WHEN (CASE WHEN abs(u1x) >= abs(u1y)
                                         THEN u1x ELSE u1y END) >= 0
                              THEN u1x ELSE -u1x END, 6) AS v1x,
                   round(CASE WHEN (CASE WHEN abs(u1x) >= abs(u1y)
                                         THEN u1x ELSE u1y END) >= 0
                              THEN u1y ELSE -u1y END, 6) AS v1y,
                   round(CASE WHEN (CASE WHEN abs(u2x) >= abs(u2y)
                                         THEN u2x ELSE u2y END) >= 0
                              THEN u2x ELSE -u2x END, 6) AS v2x,
                   round(CASE WHEN (CASE WHEN abs(u2x) >= abs(u2y)
                                         THEN u2x ELSE u2y END) >= 0
                              THEN u2y ELSE -u2y END, 6) AS v2y
            FROM raw
        )
        SELECT base.event_id,
               round((base.x - v.mx) * v.v1x + (base.y - v.my) * v.v1y, 6)
                   + 0.0 AS pc_1,
               round((base.x - v.mx) * v.v2x + (base.y - v.my) * v.v2y, 6)
                   + 0.0 AS pc_2
        FROM base, v
    """
    sql["scale_by_group"] = """
        SELECT event_id, user_id, value,
               CASE WHEN count(CAST(value AS DOUBLE))
                         OVER (PARTITION BY user_id) >= 2
                         AND round(stddev_samp(CAST(value AS DOUBLE))
                                   OVER (PARTITION BY user_id), 6) > 0
                    THEN round((CAST(value AS DOUBLE)
                                - round(avg(CAST(value AS DOUBLE))
                                        OVER (PARTITION BY user_id), 6))
                               / round(stddev_samp(CAST(value AS DOUBLE))
                                       OVER (PARTITION BY user_id), 6), 6)
               END + 0.0 AS value_gz
        FROM events
    """
    # embedding drift: the _ivf_sql quantizer replay, even/odd split
    # histograms over all 8 cells, Laplace-0.5 shares, JS total as the
    # ordered list_reduce fold (== Spark's array_sort aggregate fold)
    sql["embedding_drift"] = """
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        seeds AS (
            SELECT e AS c,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                   ) - 1 AS idx
            FROM vecs
            ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
            LIMIT 8
        ),
        cents AS (
            SELECT idx, c,
                   CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN 1.0
                        ELSE sqrt(list_dot_product(c, c)) END AS cn
            FROM seeds
        ),
        assigned AS (
            SELECT v.vec_id, ct.idx,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.e, ct.c) / ct.cn DESC,
                                ct.idx DESC
                   ) AS rnk
            FROM vecs v CROSS JOIN cents ct
        ),
        cells AS (SELECT vec_id, idx FROM assigned WHERE rnk = 1),
        rf AS (SELECT idx AS cell, count(*) AS n_ref FROM cells
               WHERE vec_id % 2 = 0 GROUP BY idx),
        cr AS (SELECT idx AS cell, count(*) AS n_cur FROM cells
               WHERE vec_id % 2 = 1 GROUP BY idx),
        allc AS (SELECT CAST(UNNEST(generate_series(0, 7)) AS INT) AS cell),
        h AS (
            SELECT a.cell,
                   coalesce(rf.n_ref, 0) AS n_ref,
                   coalesce(cr.n_cur, 0) AS n_cur
            FROM allc a LEFT JOIN rf USING (cell) LEFT JOIN cr USING (cell)
        ),
        t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM h),
        x AS (
            SELECT h.cell, h.n_ref, h.n_cur,
                   (CAST(h.n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(t.tr AS DOUBLE) + CAST(0.5 AS DOUBLE) * 8.0) AS p,
                   (CAST(h.n_cur AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(t.tc AS DOUBLE) + CAST(0.5 AS DOUBLE) * 8.0) AS q
            FROM h, t
        ),
        z AS (
            SELECT *,
                   p * log2(p / ((p + q) / 2.0)) / 2.0
                   + q * log2(q / ((p + q) / 2.0)) / 2.0 AS term
            FROM x
        ),
        tot AS (
            SELECT list_reduce(
                       list_prepend(0.0, list(term ORDER BY cell)),
                       (a, b) -> a + b) AS js
            FROM z
        )
        SELECT z.cell,
               CAST(z.n_ref AS BIGINT) AS n_ref,
               CAST(z.n_cur AS BIGINT) AS n_cur,
               round(z.p, 6) + 0.0 AS share_ref,
               round(z.q, 6) + 0.0 AS share_cur,
               round(z.term, 6) + 0.0 AS js_term,
               round(tot.js, 6) + 0.0 AS js_total
        FROM z, tot
    """
    # distinct-n diversity: positional bigrams (chr(31) join), one
    # count + count-distinct aggregation per source
    sql["distinct_ngrams"] = f"""
        WITH w AS (
            SELECT source, string_split({_NORM}, ' ') AS ws FROM documents
        ),
        g AS (
            SELECT source,
                   array_to_string(
                       list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 1),
                       chr(31)) AS gram
            FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS u(i)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
               round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
                   + 0.0 AS ratio
        FROM g GROUP BY source
    """
    sql["label_propagation"] = _lpa_oracle(4)
    sql["k_anonymity"] = """
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(30 - count(*) AS BIGINT) AS deficit
        FROM documents
        GROUP BY source, lang
        HAVING count(*) < 30
    """
    from temporalscope_spark.operators.text import (
        _STRIP_CLASS,
        _TRANSLATE_FROM,
        _TRANSLATE_TO,
    )

    def _sq(s: str) -> str:
        return s.replace("'", "''")

    sql["normalize_unicode"] = f"""
        WITH d AS (
            SELECT doc_id,
                   '{_sq(_DIRTY_PREFIX)}' || substr(text, 1, 120)
                       || '{_sq(_DIRTY_SUFFIX)}' AS dirty
            FROM documents
        ),
        c AS (
            SELECT doc_id, dirty,
                   trim(regexp_replace(
                       regexp_replace(
                           translate(
                               regexp_replace(dirty, '{_sq(_STRIP_CLASS)}',
                                              '', 'g'),
                               '{_sq(_TRANSLATE_FROM)}',
                               '{_sq(_TRANSLATE_TO)}'),
                           '\\x{{2026}}', '...', 'g'),
                       '\\s+', ' ', 'g')) AS clean_text
            FROM d
        )
        SELECT doc_id, clean_text,
               coalesce(clean_text != dirty, FALSE) AS changed
        FROM c
    """
    _pq_common = """
        seeds AS (
            SELECT embedding AS cv,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')) - 1
                       AS code
            FROM embeddings
            QUALIFY code < 8
        ),
        subs AS (SELECT unnest(generate_series(0, 3)) AS j),
        dists AS (
            SELECT e.vec_id, s.j, c.code,
                   list_sum(list_transform(generate_series(1, 16), i ->
                       (CAST(e.embedding[s.j * 16 + CAST(i AS INT)] AS DOUBLE)
                        - CAST(c.cv[s.j * 16 + CAST(i AS INT)] AS DOUBLE))
                       * (CAST(e.embedding[s.j * 16 + CAST(i AS INT)] AS DOUBLE)
                        - CAST(c.cv[s.j * 16 + CAST(i AS INT)] AS DOUBLE))))
                       AS d
            FROM embeddings e, seeds c, subs s
        ),
        best AS (
            SELECT vec_id, j, code,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d, code) AS rn
            FROM dists
        ),
        codes AS (
            SELECT vec_id,
                   array_agg(CAST(code AS INT) ORDER BY j) AS codes
            FROM best WHERE rn = 1 GROUP BY vec_id
        )
    """
    sql["pq_encode"] = f"""
        WITH {_pq_common}
        SELECT vec_id, array_to_string(codes, ',') AS codes FROM codes
    """
    sql["pq_topk"] = f"""
        WITH {_pq_common},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        lut AS (
            SELECT s.j, c.code,
                   list_sum(list_transform(generate_series(1, 16), i ->
                       (CAST(q.qv[s.j * 16 + CAST(i AS INT)] AS DOUBLE)
                        - CAST(c.cv[s.j * 16 + CAST(i AS INT)] AS DOUBLE))
                       * (CAST(q.qv[s.j * 16 + CAST(i AS INT)] AS DOUBLE)
                        - CAST(c.cv[s.j * 16 + CAST(i AS INT)] AS DOUBLE))))
                       AS d
            FROM q, seeds c, subs s
        ),
        percode AS (
            SELECT b.vec_id, b.j, b.code FROM best b WHERE b.rn = 1
        ),
        adc AS (
            SELECT p.vec_id, sum(l.d) AS adc
            FROM percode p JOIN lut l ON l.j = p.j AND l.code = p.code
            GROUP BY p.vec_id
        )
        SELECT vec_id, round(adc, 6) + 0.0 AS adc
        FROM adc ORDER BY adc, vec_id LIMIT 10
    """
    sql["hybrid_rerank"] = f"""
        WITH bm AS ({sql["bm25_topk"]}),
        nv AS (SELECT count(*) AS n FROM embeddings),
        q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id = 0
        )
        SELECT bm.doc_id, bm.score,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), q.qv), 6) + 0.0 AS cosine
        FROM bm, nv, q
        JOIN embeddings e ON e.vec_id = bm.doc_id % nv.n
        ORDER BY cosine DESC, bm.doc_id
        LIMIT 10
    """

    def _kc_l2(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, 64), i -> "
            f"({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)])"
            f" * ({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)])))"
        )

    _kc_rounds = []
    _kc_sel = ["SELECT 1 AS rank, (SELECT vec_id FROM s1) AS vec_id, "
               "CAST(0.0 AS DOUBLE) AS min_dist"]
    _kc_excl = "(SELECT vec_id FROM s1)"
    for _r in range(2, 6):
        prev = f"m{_r - 1}"
        _kc_rounds.append(f"""
        p{_r} AS (
            SELECT vec_id, v, mind FROM {prev}
            WHERE vec_id NOT IN ({_kc_excl})
            ORDER BY round(mind, 6) DESC, vec_id LIMIT 1
        ),
        m{_r} AS (
            SELECT p.vec_id, p.v,
                   least(p.mind, {_kc_l2('p.v', 'c.v')}) AS mind
            FROM {prev} p, p{_r} c
        )""")
        _kc_sel.append(
            f"SELECT {_r} AS rank, (SELECT vec_id FROM p{_r}) AS vec_id, "
            f"(SELECT round(mind, 6) + 0.0 FROM p{_r}) AS min_dist"
        )
        _kc_excl += f", (SELECT vec_id FROM p{_r})"
    sql["kcenter_select"] = f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        s1 AS (
            SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42') LIMIT 1
        ),
        m1 AS (
            SELECT e.vec_id, e.v, {_kc_l2('e.v', 's.v')} AS mind
            FROM e, s1 s
        ),{",".join(_kc_rounds)}
        {" UNION ALL ".join(_kc_sel)}
    """
    sql["knn_label_agreement"] = """
        WITH p AS (
            SELECT a.vec_id AS id, a.label, b.vec_id AS nb,
                   b.label AS nbl,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY id
                                         ORDER BY c DESC, nb) AS rn
            FROM p
        )
        SELECT id AS vec_id, label,
               CAST(count(*) AS BIGINT) AS n_neighbors,
               CAST(sum(CASE WHEN nbl = label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree,
               round(CAST(sum(CASE WHEN nbl = label THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / CAST(greatest(count(*), 1) AS DOUBLE), 6) + 0.0
                   AS agreement
        FROM r WHERE rn <= 10 GROUP BY id, label
    """
    sql["triangle_counts"] = """
        WITH e AS (
            SELECT d.doc_id AS src,
                   CAST('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR) || chr(31)
                            || CAST(t.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % (SELECT count(*) FROM documents) AS dst
            FROM documents d, UNNEST([0, 1, 2]) AS t(k)
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM e WHERE src != dst
        ),
        deg AS (
            SELECT id, count(*) AS degree
            FROM (SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
            GROUP BY id
        ),
        tri AS (
            SELECT a.u AS x, a.v AS y, b.v AS z
            FROM und a
            JOIN und b ON b.u = a.v
            JOIN und c ON c.u = a.u AND c.v = b.v
        ),
        pern AS (
            SELECT id, count(*) AS triangles
            FROM (SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
                  UNION ALL SELECT z AS id FROM tri)
            GROUP BY id
        )
        SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
               CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
               round(2.0 * CAST(coalesce(p.triangles, 0) AS DOUBLE)
                     / CAST(greatest(d.degree * (d.degree - 1), 1) AS DOUBLE),
                     6) + 0.0 AS clustering_coeff
        FROM deg d LEFT JOIN pern p USING (id)
    """
    sql["lexical_diversity"] = f"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split({_NORM}, ' ') END AS w
            FROM documents
        ),
        cnt AS (
            SELECT d.doc_id, t.word, count(*) AS c
            FROM d, UNNEST(d.w) AS t(word)
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM cnt GROUP BY doc_id
        ),
        base AS (SELECT doc_id FROM d)
        SELECT b.doc_id,
               coalesce(a.n_words, 0) AS n_words,
               coalesce(a.n_types, 0) AS n_types,
               coalesce(a.n_hapax, 0) AS n_hapax,
               round(CAST(coalesce(a.n_types, 0) AS DOUBLE)
                     / CAST(greatest(coalesce(a.n_words, 0), 1) AS DOUBLE), 6)
                   + 0.0 AS ttr,
               round(CAST(coalesce(a.n_hapax, 0) AS DOUBLE)
                     / CAST(greatest(coalesce(a.n_types, 0), 1) AS DOUBLE), 6)
                   + 0.0 AS hapax_ratio,
               round(CAST(10000.0 AS DOUBLE)
                     * CAST(coalesce(a.sum_c2, 0) - coalesce(a.n_words, 0)
                            AS DOUBLE)
                     / (CAST(greatest(coalesce(a.n_words, 0), 1) AS DOUBLE)
                        * CAST(greatest(coalesce(a.n_words, 0), 1) AS DOUBLE)),
                     6) + 0.0 AS yule_k
        FROM base b LEFT JOIN agg a USING (doc_id)
    """

    def _l2sql(a: str, b: str, off: str, n: int) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {n}), i -> "
            f"(CAST({a}[{off} + CAST(i AS INT)] AS DOUBLE)"
            f" - CAST({b}[{off} + CAST(i AS INT)] AS DOUBLE))"
            f" * (CAST({a}[{off} + CAST(i AS INT)] AS DOUBLE)"
            f" - CAST({b}[{off} + CAST(i AS INT)] AS DOUBLE))))"
        )

    _ivfpq_common = f"""
        cellseed AS (
            SELECT embedding AS cv,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')) - 1
                       AS cell
            FROM embeddings
            QUALIFY cell < 8
        ),
        adist AS (
            SELECT e.vec_id, c.cell,
                   {_l2sql('e.embedding', 'c.cv', '0', 64)} AS d
            FROM embeddings e, cellseed c
        ),
        abest AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, cell) AS rn
            FROM adist
        ),
        assign AS (SELECT vec_id, cell FROM abest WHERE rn = 1),
        resid AS (
            SELECT e.vec_id, a.cell,
                   list_transform(generate_series(1, 64), i ->
                       CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                       - CAST(c.cv[CAST(i AS INT)] AS DOUBLE)) AS rv
            FROM embeddings e
            JOIN assign a USING (vec_id)
            JOIN cellseed c ON c.cell = a.cell
        ),
        pqseed AS (
            SELECT rv,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '#43')) - 1
                       AS code
            FROM resid
            QUALIFY code < 8
        ),
        subs AS (SELECT unnest(generate_series(0, 3)) AS j),
        edist AS (
            SELECT r.vec_id, r.cell, s.j, p.code,
                   {_l2sql('r.rv', 'p.rv', 's.j * 16', 16)} AS d
            FROM resid r, pqseed p, subs s
        ),
        percode AS (
            SELECT vec_id, cell, j, code
            FROM (
                SELECT vec_id, cell, j, code,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY d, code) AS rn
                FROM edist
            ) WHERE rn = 1
        )
    """
    sql["ivfpq_encode"] = f"""
        WITH {_ivfpq_common}
        SELECT vec_id,
               CAST(any_value(cell) AS BIGINT) AS cell,
               array_to_string(array_agg(CAST(code AS INT) ORDER BY j), ',')
                   AS codes
        FROM percode GROUP BY vec_id
    """
    sql["ivfpq_topk"] = f"""
        WITH {_ivfpq_common},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qcd AS (
            SELECT c.cell, {_l2sql('q.qv', 'c.cv', '0', 64)} AS d
            FROM q, cellseed c
        ),
        probe AS (
            SELECT cell FROM qcd
            QUALIFY row_number() OVER (ORDER BY d, cell) <= 4
        ),
        qres AS (
            SELECT c.cell,
                   list_transform(generate_series(1, 64), i ->
                       CAST(q.qv[CAST(i AS INT)] AS DOUBLE)
                       - CAST(c.cv[CAST(i AS INT)] AS DOUBLE)) AS qr
            FROM q, cellseed c
            WHERE c.cell IN (SELECT cell FROM probe)
        ),
        lut AS (
            SELECT r.cell, s.j, p.code,
                   {_l2sql('r.qr', 'p.rv', 's.j * 16', 16)} AS d
            FROM qres r, pqseed p, subs s
        ),
        adc AS (
            SELECT p.vec_id, p.cell, sum(l.d) AS adc
            FROM percode p
            JOIN lut l ON l.cell = p.cell AND l.j = p.j AND l.code = p.code
            GROUP BY p.vec_id, p.cell
        )
        SELECT vec_id, CAST(cell AS BIGINT) AS cell,
               round(adc, 6) + 0.0 AS adc
        FROM adc ORDER BY adc, vec_id LIMIT 10
    """
    _zx = ("CASE WHEN user_id IS NULL THEN NULL ELSE least(greatest("
           "CAST(floor((CAST(user_id AS DOUBLE) - mnx) * 255.0 / (mxx - mnx))"
           " AS BIGINT), 0), 255) END")
    _zy = ("CASE WHEN value IS NULL THEN NULL ELSE least(greatest("
           "CAST(floor((CAST(value AS DOUBLE) - mny) * 255.0 / (mxy - mny))"
           " AS BIGINT), 0), 255) END")
    _zterms = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    )
    sql["zorder_key"] = f"""
        WITH b AS (
            SELECT min(CAST(user_id AS DOUBLE)) AS mnx,
                   max(CAST(user_id AS DOUBLE)) AS mxx,
                   min(CAST(value AS DOUBLE)) AS mny,
                   max(CAST(value AS DOUBLE)) AS mxy
            FROM events
        ),
        s AS (
            SELECT event_id, {_zx} AS x, {_zy} AS y
            FROM events, b
        )
        SELECT event_id, CAST({_zterms} AS BIGINT) AS zkey FROM s
    """
    sql["edit_distance_pairs"] = f"""
        WITH s0 AS (
            SELECT doc_id AS id, substr({_NORM}, 1, 40) AS s FROM documents
        ),
        tw AS (
            SELECT id + 10000000 AS id,
                   substr(s, 1, 6) || 'z' || substr(s, 8, 33) AS s
            FROM s0 WHERE id % 7 = 0
        ),
        allr AS (
            SELECT id, s, length(s) AS len
            FROM (SELECT * FROM s0 UNION ALL SELECT * FROM tw)
        ),
        toks AS (
            SELECT id, len, CAST(i AS INT) AS pos,
                   substr(s, CAST(i AS INT), 3) AS g
            FROM allr, UNNEST(generate_series(1, len - 2)) t(i)
            WHERE len >= 9
        ),
        tk AS (
            SELECT *, row_number() OVER (PARTITION BY id, g ORDER BY pos) AS k
            FROM toks
        ),
        freq AS (SELECT g, count(*) AS f FROM tk GROUP BY g),
        pref AS (
            SELECT tk.id, tk.len, tk.g, tk.k,
                   row_number() OVER (PARTITION BY tk.id
                                      ORDER BY f, tk.g, tk.k) AS r
            FROM tk JOIN freq USING (g)
        ),
        p AS (SELECT * FROM pref WHERE r <= 7),
        lc AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM p a JOIN p b
              ON a.g = b.g AND a.k = b.k AND a.id < b.id
             AND abs(a.len - b.len) <= 2
        ),
        sh AS (SELECT id, len FROM allr WHERE len < 9),
        shish AS (SELECT id, len FROM allr WHERE len < 11),
        sc AS (
            SELECT DISTINCT least(s.id, t.id) AS id_a,
                   greatest(s.id, t.id) AS id_b
            FROM sh s JOIN shish t
              ON t.len BETWEEN s.len AND s.len + 2 AND s.id != t.id
        ),
        cand AS (SELECT * FROM lc UNION SELECT * FROM sc),
        v AS (
            SELECT c.id_a, c.id_b, levenshtein(a.s, b.s) AS dist
            FROM cand c
            JOIN allr a ON a.id = c.id_a
            JOIN allr b ON b.id = c.id_b
        )
        SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist FROM v WHERE dist <= 2
    """
    sql["l_diversity"] = """
        SELECT source, lang,
               CAST(n_chars // 200 AS BIGINT) AS len_bucket,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(count(DISTINCT CAST(n_chars % 7 AS INT)) AS BIGINT)
                   AS n_sensitive,
               CAST(5 - count(DISTINCT CAST(n_chars % 7 AS INT)) AS BIGINT)
                   AS deficit
        FROM documents
        GROUP BY 1, 2, 3
        HAVING count(DISTINCT CAST(n_chars % 7 AS INT)) < 5
    """
    sql["mmr_rerank"] = _mmr_oracle(5, 0.7)
    sql["mad_outliers"] = """
        WITH m1 AS (
            SELECT round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
            FROM events WHERE value IS NOT NULL
        ),
        m2 AS (
            SELECT round(quantile_cont(abs(CAST(value AS DOUBLE) - m1.med), 0.5), 6)
                       AS mad
            FROM events, m1 WHERE value IS NOT NULL
        )
        SELECT event_id, value,
               round(0.6745 * (CAST(value AS DOUBLE) - m1.med) / m2.mad, 6)
                   + 0.0 AS value_mz,
               CAST(abs(round(0.6745 * (CAST(value AS DOUBLE) - m1.med)
                              / m2.mad, 6)) > 3.5 AS INT) AS value_is_outlier
        FROM events, m1, m2
    """
    # OOF target encoding: identical md5 fold map and m-estimate
    # evaluation order (prior rounded to 6 first, encoding rounded last)
    sql["target_encode_oof"] = """
        WITH base AS (
            SELECT event_id, event_type, CAST(value AS DOUBLE) AS y,
                   CAST(CAST(('0x' || substr(md5(
                            concat_ws(chr(31), CAST(event_id AS VARCHAR), '0')
                        ), 1, 8)) AS BIGINT) % 5 AS INT) AS fold,
                   COALESCE(CAST(event_type AS VARCHAR), '__null__') AS k
            FROM events
        ),
        pf AS (
            SELECT k, fold, sum(y) AS sf, count(y) AS nf
            FROM base GROUP BY 1, 2
        ),
        pc AS (SELECT k, sum(sf) AS sc, sum(nf) AS nc FROM pf GROUP BY 1),
        prior AS (SELECT round(avg(y), 6) AS p FROM base)
        SELECT b.event_id, b.event_type, b.fold AS event_type_te_fold,
               round((COALESCE(pc.sc, 0) - COALESCE(pf.sf, 0) + 20.0 * prior.p)
                     / (COALESCE(pc.nc, 0) - COALESCE(pf.nf, 0) + 20.0), 6)
                   + 0.0 AS event_type_te
        FROM base b
        LEFT JOIN pf ON b.k = pf.k AND b.fold = pf.fold
        LEFT JOIN pc ON b.k = pc.k, prior
    """
    # centroid distances: md5-seed replay (the _ivf_sql quantizer) then
    # one cosine column per centroid idx, pivoted via MAX(CASE)
    sql["centroid_distances"] = """
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        seeds AS (
            SELECT e AS c,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
                   ) AS idx
            FROM vecs
            ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42')
            LIMIT 8
        ),
        scored AS (
            SELECT v.vec_id, s.idx,
                   CASE WHEN sqrt(list_dot_product(v.e, v.e)) > 0
                        THEN round(list_dot_product(v.e, s.c)
                                   / (sqrt(list_dot_product(v.e, v.e))
                                      * (CASE WHEN sqrt(list_dot_product(s.c, s.c)) = 0
                                              THEN 1.0
                                              ELSE sqrt(list_dot_product(s.c, s.c)) END)),
                                   6)
                   END AS cd
            FROM vecs v CROSS JOIN seeds s
        )
        SELECT vec_id,
               MAX(CASE WHEN idx = 1 THEN cd END) + 0.0 AS cdist_1,
               MAX(CASE WHEN idx = 2 THEN cd END) + 0.0 AS cdist_2,
               MAX(CASE WHEN idx = 3 THEN cd END) + 0.0 AS cdist_3,
               MAX(CASE WHEN idx = 4 THEN cd END) + 0.0 AS cdist_4,
               MAX(CASE WHEN idx = 5 THEN cd END) + 0.0 AS cdist_5,
               MAX(CASE WHEN idx = 6 THEN cd END) + 0.0 AS cdist_6,
               MAX(CASE WHEN idx = 7 THEN cd END) + 0.0 AS cdist_7,
               MAX(CASE WHEN idx = 8 THEN cd END) + 0.0 AS cdist_8
        FROM scored GROUP BY vec_id
    """
    # trend: identical re-zeroed hours axis + closed-form OLS sums;
    # intercept uses the engine's (Σy − slope·Σt)/n evaluation order
    sql["trend_features"] = """
        WITH base AS (
            SELECT user_id,
                   (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id))
                       / 3600.0 AS t,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        s AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
                   sum(t) AS st, sum(y) AS sy, sum(t*t) AS stt,
                   sum(y*y) AS syy, sum(t*y) AS sty
            FROM base GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(CASE WHEN n >= 2 AND n*stt - st*st > 0
                          THEN (n*sty - st*sy) / (n*stt - st*st) END, 6)
                   + 0.0 AS slope,
               round(CASE WHEN n >= 2 AND n*stt - st*st > 0
                          THEN (sy - ((n*sty - st*sy) / (n*stt - st*st)) * st)
                               / n END, 6) + 0.0 AS intercept,
               round(CASE WHEN n >= 2 AND n*stt - st*st > 0
                               AND n*syy - sy*sy > 0
                          THEN (n*sty - st*sy) * (n*sty - st*sy)
                               / ((n*stt - st*st) * (n*syy - sy*sy)) END, 6)
                   + 0.0 AS r2
        FROM s
    """
    sql["woe_iv"] = """
        WITH c AS (
            SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS category,
                   count(*) AS n,
                   sum(CAST(CAST(value AS DOUBLE) > 30 AS DOUBLE)) AS pos,
                   sum(1.0 - CAST(CAST(value AS DOUBLE) > 30 AS DOUBLE)) AS neg
            FROM events GROUP BY 1
        ),
        t AS (SELECT sum(pos) AS pt, sum(neg) AS nt FROM c)
        SELECT category, CAST(n AS BIGINT) AS n,
               CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
               round(ln(((pos + 0.5) / t.pt) / ((neg + 0.5) / t.nt)), 6)
                   + 0.0 AS woe,
               round((pos / t.pt - neg / t.nt)
                     * ln(((pos + 0.5) / t.pt) / ((neg + 0.5) / t.nt)), 6)
                   + 0.0 AS iv
        FROM c, t ORDER BY category
    """
    sql["recency_features"] = """
        SELECT event_id, user_id, event_type,
               round(epoch(ts) - epoch(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)), 6)
                   + 0.0 AS since_any,
               round(epoch(ts) - epoch(lag(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)), 6)
                   + 0.0 AS since_same_type
        FROM events
    """
    sql["entity_profile"] = """
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               round(epoch(max(ts)) - epoch(min(ts)), 6) + 0.0
                   AS tenure_seconds,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
               round(avg(CAST(value AS DOUBLE)), 6) + 0.0 AS value_mean,
               round(min(CAST(value AS DOUBLE)), 6) + 0.0 AS value_min,
               round(max(CAST(value AS DOUBLE)), 6) + 0.0 AS value_max
        FROM events GROUP BY user_id
    """
    sql["ecdf_feature"] = """
        SELECT event_id, value,
               round(cume_dist() OVER (ORDER BY CAST(value AS DOUBLE)), 6)
                   AS value_ecdf
        FROM events
    """
    sql["polynomial_features"] = """
        SELECT event_id, value,
               CAST(length(props) AS DOUBLE) AS plen,
               round(CAST(value AS DOUBLE) * CAST(value AS DOUBLE), 6) + 0.0
                   AS value_pow2,
               round(CAST(length(props) AS DOUBLE)
                     * CAST(length(props) AS DOUBLE), 6) + 0.0 AS plen_pow2,
               round(CAST(value AS DOUBLE)
                     * CAST(length(props) AS DOUBLE), 6) + 0.0 AS value_x_plen
        FROM events
    """
    sql["impute_mean"] = """
        WITH base AS (
            SELECT event_id,
                   CASE WHEN event_id % 10 <> 0
                        THEN CAST(value AS DOUBLE) END AS v
            FROM events
        ),
        m AS (SELECT round(avg(v), 6) AS fill FROM base)
        SELECT event_id, v,
               CAST(v IS NULL AS INT) AS v_was_null,
               COALESCE(v, m.fill) AS v_filled
        FROM base, m
    """
    # moment profile: identical closed forms over raw power sums
    # (population central moments, Fisher–Pearson g1, EXCESS kurtosis,
    # sample variance), identical evaluation order
    _moment_cols = {"value": "CAST(value AS DOUBLE)",
                    "plen": "CAST(length(props) AS DOUBLE)"}
    _moment_sel = " UNION ALL ".join(
        f"""
        SELECT '{name}' AS "column", CAST(count({x}) AS BIGINT) AS n,
               round(sum({x}) / count({x}), 6) + 0.0 AS mean,
               round((sum({x}*{x}) - sum({x})*sum({x})/count({x}))
                     / (count({x}) - 1.0), 6) + 0.0 AS variance,
               CASE WHEN count({x}) >= 2 AND
                         sum({x}*{x})/count({x})
                         - pow(sum({x})/count({x}), 2) > 0
                    THEN round(
                        (sum({x}*{x}*{x})/count({x})
                         - 3.0*(sum({x})/count({x}))*(sum({x}*{x})/count({x}))
                         + 2.0*pow(sum({x})/count({x}), 3))
                        / pow(sum({x}*{x})/count({x})
                              - pow(sum({x})/count({x}), 2), 1.5), 6)
               END + 0.0 AS skewness,
               CASE WHEN count({x}) >= 2 AND
                         sum({x}*{x})/count({x})
                         - pow(sum({x})/count({x}), 2) > 0
                    THEN round(
                        (sum({x}*{x}*{x}*{x})/count({x})
                         - 4.0*(sum({x})/count({x}))*(sum({x}*{x}*{x})/count({x}))
                         + 6.0*pow(sum({x})/count({x}), 2)*(sum({x}*{x})/count({x}))
                         - 3.0*pow(sum({x})/count({x}), 4))
                        / pow(sum({x}*{x})/count({x})
                              - pow(sum({x})/count({x}), 2), 2) - 3.0, 6)
               END + 0.0 AS kurtosis,
               round(min({x}), 6) + 0.0 AS "min",
               round(max({x}), 6) + 0.0 AS "max"
        FROM events
        """
        for name, x in _moment_cols.items()
    )
    sql["moment_profile"] = _moment_sel
    sql["calendar_features"] = """
        SELECT event_id, ts,
               CAST(hour(ts) AS INT) AS ts_hour,
               CAST(isodow(ts) AS INT) AS ts_dow,
               CAST(day(ts) AS INT) AS ts_day,
               CAST(month(ts) AS INT) AS ts_month,
               CAST(quarter(ts) AS INT) AS ts_quarter,
               CAST(year(ts) AS INT) AS ts_year,
               CAST(isodow(ts) >= 6 AS INT) AS ts_is_weekend,
               CAST(day(ts) = 1 AS INT) AS ts_is_month_start,
               CAST(day(ts) = day(last_day(ts)) AS INT) AS ts_is_month_end
        FROM events
    """
    # hash cross: identical portable bucket map to the engine's
    # (first 8 md5 hex chars as a 32-bit int, mod n_buckets)
    sql["hash_cross"] = """
        SELECT event_id, CAST(user_id % 50 AS BIGINT) AS ubkt, event_type,
               CAST(CAST(('0x' || substr(md5(
                        concat_ws(chr(31),
                                  COALESCE(CAST(user_id % 50 AS VARCHAR), '__null__'),
                                  COALESCE(CAST(event_type AS VARCHAR), '__null__'))
                    ), 1, 8)) AS BIGINT) % 256 AS INT) AS cross_ubkt_event_type
        FROM events
    """

    sql["t_closeness"] = """
        WITH base AS (
            SELECT CAST(doc_id % 20 AS BIGINT) AS bucket,
                   CASE WHEN doc_id % 20 < 3 THEN 'leaky' ELSE lang END AS v
            FROM documents
        ),
        n AS (SELECT count(*) AS n FROM base),
        vt AS (SELECT v, count(*) AS cv FROM base GROUP BY v),
        gv AS (SELECT bucket, v, count(*) AS cgv FROM base GROUP BY bucket, v),
        gt AS (SELECT bucket, sum(cgv) AS ng FROM gv GROUP BY bucket),
        s AS (
            SELECT gv.bucket, max(gt.ng) AS ng,
                   sum(abs(gv.cgv * n.n - vt.cv * gt.ng)) AS abs_sum,
                   sum(vt.cv) AS sum_cv
            FROM gv JOIN vt USING (v) JOIN gt USING (bucket) CROSS JOIN n
            GROUP BY gv.bucket
        )
        SELECT bucket, CAST(ng AS BIGINT) AS group_size,
               round((abs_sum + ng * (n.n - sum_cv))
                     / ((2.0 * ng) * n.n), 6) + 0.0 AS tvd,
               round((abs_sum + ng * (n.n - sum_cv))
                     / ((2.0 * ng) * n.n) - 0.3, 6) + 0.0 AS excess
        FROM s CROSS JOIN n
        WHERE round((abs_sum + ng * (n.n - sum_cv))
                    / ((2.0 * ng) * n.n), 6) > 0.3
    """
    sql["classification_report"] = f"""
        WITH {_SCORED_SQL},
        agg AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN score >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS tp,
                   sum(CASE WHEN score >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS fp,
                   sum(CASE WHEN score < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS tn,
                   sum(CASE WHEN score < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS fn,
                   sum((CAST(round(score * 100) AS BIGINT) - 100 * y)
                       * (CAST(round(score * 100) AS BIGINT) - 100 * y)) AS sq
            FROM scored
        )
        SELECT 0.5 AS threshold, CAST(n AS BIGINT) AS n,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
               round(CAST(tp + tn AS DOUBLE) / n, 6) + 0.0 AS accuracy,
               CASE WHEN tp + fp = 0 THEN 0.0
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END
                   + 0.0 AS "precision",
               CASE WHEN tp + fn = 0 THEN 0.0
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END
                   + 0.0 AS recall,
               CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                    ELSE round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
               END + 0.0 AS f1,
               round((CASE WHEN tp + fn = 0 THEN 0.0
                           ELSE CAST(tp AS DOUBLE) / (tp + fn) END
                      + CASE WHEN fp + tn = 0 THEN 0.0
                             ELSE CAST(tn AS DOUBLE) / (fp + tn) END) / 2.0, 6)
                   + 0.0 AS balanced_accuracy,
               CASE WHEN tp + fn = 0 OR fp + tn = 0 OR tp + fp = 0
                         OR fn + tn = 0 THEN 0.0
                    ELSE round(CAST(tp * tn - fp * fn AS DOUBLE)
                               / sqrt(((CAST(tp + fn AS DOUBLE)
                                        * CAST(fp + tn AS DOUBLE))
                                       * CAST(tp + fp AS DOUBLE))
                                      * CAST(fn + tn AS DOUBLE)), 6)
               END + 0.0 AS mcc,
               round(sq / (10000.0 * n), 6) + 0.0 AS brier
        FROM agg
    """
    sql["kcore"] = _kcore_oracle(3, 4)
    _url_build = """
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
                   || '://WWW.' || source
                   || (CASE WHEN doc_id % 4 = 0 THEN '.Example.CO.UK'
                            WHEN doc_id % 4 = 1 THEN '.example.com'
                            WHEN doc_id % 4 = 2 THEN '.news.example.COM.AU'
                            ELSE '.blog.example.org' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN ':443'
                            WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
                   || (CASE WHEN doc_id % 5 = 0 THEN ''
                            ELSE '/' || lang || '/page/'
                                 || CAST(doc_id AS VARCHAR) END)
                   || '?id=' || CAST(doc_id AS VARCHAR)
                   || '&utm_source=feed&x=1&gclid=zz&UTM_campaign=c'
                   || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)
                   AS url
            FROM documents
    """
    _sld_re = (
        "([^.]+\\.(?:co\\.uk|org\\.uk|ac\\.uk|gov\\.uk|co\\.jp|ne\\.jp"
        "|or\\.jp|com\\.au|net\\.au|org\\.au|co\\.nz|com\\.br|com\\.cn"
        "|com\\.mx|co\\.in|co\\.kr|com\\.tw|com\\.sg|com\\.hk"
        "|co\\.za))$"
    )
    sql["url_normalize"] = f"""
        WITH u AS ({_url_build}),
        p AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url,
                       '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                   regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
                   regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                   regexp_extract(url, '\\?([^#]*)', 1) AS query
            FROM u
        ),
        p2 AS (
            SELECT *, lower(regexp_extract(auth, '^([^:]*)', 1)) AS host,
                   regexp_extract(auth, ':([0-9]+)$', 1) AS port
            FROM p
        ),
        p3 AS (
            SELECT *,
                   CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                             OR (scheme = 'https' AND port = '443')
                        THEN '' ELSE ':' || port END AS port_part,
                   CASE WHEN path = '' THEN '/' ELSE path END AS path_n,
                   array_to_string(list_filter(str_split(query, '&'),
                       x -> x <> '' AND NOT (
                           substr(lower(split_part(x, '=', 1)), 1, 4) = 'utm_'
                           OR lower(split_part(x, '=', 1)) IN
                              ('fbclid', 'gclid', 'msclkid', 'mc_cid',
                               'mc_eid'))), '&') AS query_n
            FROM p2
        )
        SELECT doc_id,
               CASE WHEN scheme = '' OR host = '' THEN NULL
                    ELSE scheme || '://' || host || port_part || path_n
                         || (CASE WHEN query_n = '' THEN ''
                                  ELSE '?' || query_n END) END AS url_norm,
               host,
               CASE WHEN regexp_extract(host, '{_sld_re}', 1) <> ''
                    THEN regexp_extract(host, '{_sld_re}', 1)
                    WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) <> ''
                    THEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
                    ELSE host END AS domain
        FROM p3
    """
    _dom_build = """
            SELECT doc_id, n_chars,
                   source || (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
                                   WHEN doc_id % 3 = 1 THEN '.com'
                                   ELSE '.org' END) AS domain
            FROM documents
    """
    sql["domain_caps"] = f"""
        WITH base AS ({_dom_build}),
        r AS (
            SELECT doc_id, domain,
                   CAST(row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5('cap' || chr(31)
                                    || CAST(doc_id AS VARCHAR)), doc_id)
                   AS INT) AS cap_rank
            FROM base
        )
        SELECT doc_id, domain, cap_rank FROM r WHERE cap_rank <= 40
    """
    sql["domain_stats"] = f"""
        WITH base AS ({_dom_build}),
        g AS (
            SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_size
            FROM base GROUP BY domain
        )
        SELECT domain, n_docs, total_size,
               round(n_docs / CAST((SELECT count(*) FROM base) AS DOUBLE), 6)
                   + 0.0 AS share,
               round(total_size / CAST(n_docs AS DOUBLE), 6) + 0.0 AS mean_size
        FROM g
    """
    sql["fix_mojibake"] = _moji_oracle()
    # kaplan-meier: identical duration construction, at-risk/step windows
    # and ln-sum product folded in the same per-cohort duration order
    sql["kaplan_meier"] = """
        WITH per_user AS (
            SELECT user_id,
                   CAST(epoch_us(min(ts)) AS DOUBLE) / 1000000.0 AS t0,
                   CAST(epoch_us(min(CASE WHEN event_type = 'purchase'
                                          THEN ts END)) AS DOUBLE)
                       / 1000000.0 AS tp,
                   CAST(epoch_us(max(ts)) AS DOUBLE) / 1000000.0 AS tl
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CAST(user_id % 2 AS VARCHAR) AS cohort,
                   CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tl - t0 END AS t,
                   CASE WHEN tp IS NOT NULL THEN 1.0 ELSE 0.0 END AS e
            FROM per_user
        ),
        counts AS (
            SELECT cohort, t, sum(e) AS d, sum(1.0 - e) AS c,
                   count(*) AS m
            FROM durs GROUP BY cohort, t
        ),
        stepped AS (
            SELECT cohort, t,
                   CAST(d AS BIGINT) AS n_event,
                   CAST(c AS BIGINT) AS n_censored,
                   CAST(sum(m) OVER (PARTITION BY cohort)
                        - (sum(m) OVER wcum - m) AS BIGINT) AS n_risk,
                   d
            FROM counts
            WINDOW wcum AS (PARTITION BY cohort ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            SELECT cohort, t, n_risk, n_event, n_censored,
                   CASE WHEN d < n_risk THEN ln((n_risk - d) / n_risk)
                        ELSE 0.0 END AS lnf,
                   CASE WHEN d > 0 AND d < n_risk
                        THEN d / (n_risk * (n_risk - d))
                        ELSE 0.0 END AS gw,
                   CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS z
            FROM stepped
        ),
        curve AS (
            SELECT cohort, t, n_risk, n_event, n_censored,
                   max(z) OVER wcum AS zc,
                   sum(lnf) OVER wcum AS sl,
                   sum(gw) OVER wcum AS sg
            FROM terms
            WINDOW wcum AS (PARTITION BY cohort ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT cohort, t, n_risk, n_event, n_censored,
               round(CASE WHEN zc = 1 THEN 0.0 ELSE exp(sl) END, 6)
                   + 0.0 AS survival,
               CASE WHEN zc = 0
                    THEN round(exp(sl) * sqrt(sg), 6) + 0.0 END AS se
        FROM curve
    """

    # cohort retention: same fixed-width period grid, window-min cohort,
    # distinct activity, bounded-table denominator window
    sql["cohort_retention"] = """
        WITH base AS (
            SELECT user_id AS id,
                   CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                              / 86400.0) AS BIGINT) AS p
            FROM events
        ),
        aged AS (
            SELECT DISTINCT id,
                   min(p) OVER (PARTITION BY id) AS cohort_period,
                   p - min(p) OVER (PARTITION BY id) AS age
            FROM base
        ),
        counts AS (
            SELECT cohort_period, age, CAST(count(*) AS BIGINT) AS n_active
            FROM aged GROUP BY cohort_period, age
        )
        SELECT cohort_period, age, n_active,
               round(n_active / CAST(max(CASE WHEN age = 0 THEN n_active END)
                     OVER (PARTITION BY cohort_period) AS DOUBLE), 6)
                   + 0.0 AS retention
        FROM counts
    """
    # funnel: per-user sorted step lists, the same earliest-qualifying
    # chain (empty-match lists aggregate to NULL — NULL chains propagate
    # to NULL exactly like the engine's empty-array array_min)
    sql["funnel_conversion"] = """
        WITH base AS (
            SELECT user_id AS id,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   event_type AS ty
            FROM events
        ),
        arrs AS (
            SELECT id,
                   list(t ORDER BY t) FILTER (WHERE ty = 'signup') AS a0,
                   list(t ORDER BY t) FILTER (WHERE ty = 'view') AS a1,
                   list(t ORDER BY t) FILTER (WHERE ty = 'click') AS a2,
                   list(t ORDER BY t) FILTER (WHERE ty = 'purchase') AS a3
            FROM base GROUP BY id
        ),
        c0 AS (SELECT id, a1, a2, a3, a0[1] AS t0 FROM arrs),
        c1 AS (SELECT id, a2, a3, t0,
                      list_min(list_filter(a1, x -> x >= t0)) AS t1 FROM c0),
        c2 AS (SELECT id, a3, t0, t1,
                      list_min(list_filter(a2, x -> x >= t1)) AS t2 FROM c1),
        c3 AS (SELECT id, t0, t1, t2,
                      list_min(list_filter(a3, x -> x >= t2)) AS t3 FROM c2),
        agg AS (
            SELECT
              CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3
            FROM c3
        ),
        rows_ AS (
            SELECT 1 AS step_idx, 'signup' AS step, n0 AS n_entities,
                   n0 AS nf, CAST(NULL AS BIGINT) AS np FROM agg
            UNION ALL
            SELECT 2, 'view', n1, n0, n0 FROM agg
            UNION ALL
            SELECT 3, 'click', n2, n0, n1 FROM agg
            UNION ALL
            SELECT 4, 'purchase', n3, n0, n2 FROM agg
        )
        SELECT CAST(step_idx AS INTEGER) AS step_idx, step, n_entities,
               round(CASE WHEN nf > 0
                          THEN n_entities / CAST(nf AS DOUBLE) END, 6)
                   + 0.0 AS pct_of_first,
               round(CASE WHEN np > 0
                          THEN n_entities / CAST(np AS DOUBLE) END, 6)
                   + 0.0 AS pct_of_prev
        FROM rows_
    """

    # association rules: same distinct basket-item table, Apriori prune,
    # pair self-join and both-direction rule expansion
    sql["association_rules"] = f"""
        WITH pairs0 AS (
            SELECT DISTINCT doc_id AS b, word AS i FROM (
                SELECT doc_id,
                       unnest(string_split({_NORM}, ' ')) AS word
                FROM documents
            ) WHERE word <> ''
        ),
        nb AS (SELECT count(DISTINCT b) AS n FROM pairs0),
        ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM pairs0 GROUP BY i),
        minc AS (
            SELECT greatest(1, CAST(ceil(0.4 * n) AS BIGINT)) AS mc, n FROM nb
        ),
        kept AS (
            SELECT p.b, p.i
            FROM pairs0 p JOIN ic ON ic.i = p.i, minc
            WHERE ic.ni >= minc.mc
        ),
        pc AS (
            SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS npair
            FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
            GROUP BY a.i, c.i
        ),
        fp AS (SELECT ia, ib, npair, n FROM pc, minc WHERE npair >= mc),
        rules AS (
            SELECT ia AS antecedent, ib AS consequent, npair, n FROM fp
            UNION ALL
            SELECT ib, ia, npair, n FROM fp
        )
        SELECT antecedent, consequent, npair AS n_pair,
               round(npair / CAST(n AS DOUBLE), 6) + 0.0 AS support,
               round(npair / CAST(na.ni AS DOUBLE), 6) + 0.0 AS confidence,
               round((npair / CAST(na.ni AS DOUBLE))
                     / (nc.ni / CAST(n AS DOUBLE)), 6) + 0.0 AS lift
        FROM rules
        JOIN ic na ON na.i = antecedent
        JOIN ic nc ON nc.i = consequent
    """
    # transition matrix: same lead window + row-normalizing window
    sql["transition_matrix"] = """
        WITH base AS (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        c AS (
            SELECT event_type AS from_type, nxt AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM base WHERE nxt IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               round(n / CAST(sum(n) OVER (PARTITION BY from_type)
                              AS DOUBLE), 6) + 0.0 AS prob
        FROM c
    """

    # cusum: same explicit sum/count mean, sequential cumulative fold,
    # rounded-|C| argmax with the earliest-time tie rule
    sql["cusum_changepoint"] = """
        WITH b AS (
            SELECT user_id AS id,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   event_id,
                   CAST(value AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
        ),
        m AS (
            SELECT id, t, x,
                   sum(x) OVER wc
                   - CAST(count(x) OVER wc AS DOUBLE)
                     * (sum(x) OVER wf / CAST(count(x) OVER wf AS DOUBLE))
                       AS c
            FROM b
            WINDOW wc AS (PARTITION BY id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY id)
        ),
        r AS (
            SELECT id, t, round(abs(c), 6) AS a,
                   row_number() OVER (
                       PARTITION BY id
                       ORDER BY round(abs(c), 6) DESC, t ASC) AS rn
            FROM m
        ),
        s AS (
            SELECT id, CAST(count(*) AS BIGINT) AS n_obs,
                   max(c) AS cmax, min(c) AS cmin,
                   sum(x) AS sx, sum(x * x) AS sxx
            FROM m GROUP BY id
        ),
        v AS (
            SELECT id, n_obs, cmax, cmin,
                   (sxx - sx * sx / CAST(n_obs AS DOUBLE))
                       / (CAST(n_obs AS DOUBLE) - 1.0) AS var
            FROM s
        )
        SELECT v.id AS id, v.n_obs, r.t AS change_t,
               r.a + 0.0 AS cusum_abs_max,
               round(cmax - cmin, 6) + 0.0 AS s_range,
               round(CASE WHEN n_obs > 1 AND var > 0
                          THEN (cmax - cmin)
                               / (sqrt(var) * sqrt(CAST(n_obs AS DOUBLE)))
                     END, 6) + 0.0 AS stat
        FROM v JOIN r ON r.id = v.id AND r.rn = 1
    """
    # gini: the same ties-aware sorted-rank identity over the
    # source-partitioned distinct-value table
    sql["gini_concentration"] = """
        WITH counts AS (
            SELECT source, CAST(n_chars AS DOUBLE) AS v_,
                   CAST(count(*) AS DOUBLE) AS c
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars >= 0
            GROUP BY source, CAST(n_chars AS DOUBLE)
        ),
        r AS (
            SELECT source, v_, c,
                   sum(c) OVER (PARTITION BY source ORDER BY v_
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - c AS rprev
            FROM counts
        ),
        a AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n,
                   sum(v_ * c) AS total,
                   sum(v_ * (c * rprev + c * (c + 1.0) / 2.0)) AS rs
            FROM r GROUP BY source
        )
        SELECT source, n, round(total, 6) + 0.0 AS total,
               round(CASE WHEN total > 0
                          THEN 2.0 * rs / (CAST(n AS DOUBLE) * total)
                               - (CAST(n AS DOUBLE) + 1.0)
                                 / CAST(n AS DOUBLE)
                     END, 6) + 0.0 AS gini
        FROM a
    """
    # benford: identical digit extraction, spine join, chi terms
    sql["benford_digits"] = """
        WITH vals AS (
            SELECT abs(CAST(value AS DOUBLE)) AS a FROM events
            WHERE value IS NOT NULL AND abs(CAST(value AS DOUBLE)) > 0
        ),
        d AS (
            SELECT CAST(floor(a / power(10.0, floor(log10(a))))
                        AS INTEGER) AS digit
            FROM vals
        ),
        c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        spine AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)),
        j AS (
            SELECT spine.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM spine LEFT JOIN c ON c.digit = spine.digit
        ),
        t AS (SELECT digit, n, CAST(sum(n) OVER () AS DOUBLE) AS tot FROM j),
        f AS (
            SELECT digit, n, n / tot AS sh,
                   log10(1.0 + 1.0 / digit) AS e, tot
            FROM t
        )
        SELECT digit, n, round(sh, 6) + 0.0 AS share,
               round(e, 6) + 0.0 AS expected,
               round(tot * (sh - e) * (sh - e) / e, 6) + 0.0 AS chi_term
        FROM f
    """

    # attribution: same per-(entity, t) max-eid touch reduction, bracket
    # join + rank replay of the as-of pick
    _attr = """
        WITH base AS (
            SELECT event_id AS k, user_id AS entity,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   event_type AS ty
            FROM events
        ),
        conv AS (
            SELECT k AS conversion_id, entity, t AS conv_t
            FROM base WHERE ty = 'purchase'
        ),
        touch AS (
            SELECT entity, touch_t, ty AS attr_type, k AS attr_id FROM (
                SELECT entity, t AS touch_t, ty, k,
                       row_number() OVER (PARTITION BY entity, t
                                          ORDER BY k DESC) AS rn
                FROM base WHERE ty IN ('view', 'click')
            ) WHERE rn = 1
        ),
        cand AS (
            SELECT c.conversion_id, t2.attr_type, t2.attr_id, t2.touch_t,
                   row_number() OVER (PARTITION BY c.conversion_id
                                      ORDER BY t2.touch_t {ord}) AS rn
            FROM conv c JOIN touch t2
              ON t2.entity = c.entity
             AND t2.touch_t <= c.conv_t
             AND t2.touch_t >= c.conv_t - {w}
        )
        SELECT c.conversion_id, c.entity, c.conv_t,
               x.attr_type, x.attr_id, x.touch_t,
               round(c.conv_t - x.touch_t, 6) + 0.0 AS gap_seconds
        FROM conv c LEFT JOIN (SELECT * FROM cand WHERE rn = 1) x
          ON x.conversion_id = c.conversion_id
    """
    sql["attribution_last"] = _attr.format(ord="DESC", w="86400.0")
    sql["attribution_first"] = _attr.format(ord="ASC", w="259200.0")
    # rfm: same entity aggregation, rounded exact-quantile edges,
    # strictly-greater bin counting, inverted recency
    sql["rfm_features"] = """
        WITH base AS (
            SELECT user_id AS id,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   CAST(value AS DOUBLE) AS v
            FROM events
        ),
        ent AS (
            SELECT id, max(t) AS last_t,
                   CAST(count(*) AS BIGINT) AS frequency,
                   coalesce(sum(v), 0.0) AS monetary0
            FROM base GROUP BY id
        ),
        mx AS (SELECT max(last_t) AS asof_t FROM ent),
        e2 AS (
            SELECT id, round(asof_t - last_t, 6) AS recency_s, frequency,
                   round(monetary0, 6) AS monetary
            FROM ent, mx
        ),
        edges AS (
            SELECT
              list_transform(quantile_cont(recency_s,
                  [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS re,
              list_transform(quantile_cont(CAST(frequency AS DOUBLE),
                  [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS fe,
              list_transform(quantile_cont(monetary,
                  [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS me
            FROM e2
        )
        SELECT id, recency_s, frequency, monetary,
               CAST(6 - (1 + len(list_filter(edges.re,
                   x -> recency_s > x))) AS INT) AS r_score,
               CAST(1 + len(list_filter(edges.fe,
                   x -> CAST(frequency AS DOUBLE) > x)) AS INT) AS f_score,
               CAST(1 + len(list_filter(edges.me,
                   x -> monetary > x)) AS INT) AS m_score
        FROM e2, edges
    """

    # ab test: same user-level conversion metric, moment table, window
    # fold of the control row
    sql["ab_test"] = """
        WITH u AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase'
                            THEN 1.0 ELSE 0.0 END) AS y
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT CAST(user_id % 3 AS VARCHAR) AS variant,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(y) AS s, sum(y * y) AS ss
            FROM u GROUP BY 1
        ),
        st AS (
            SELECT variant, n, s / CAST(n AS DOUBLE) AS m,
                   CASE WHEN n > 1
                        THEN (ss - s * s / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0) END AS v
            FROM g
        ),
        ctl AS (
            SELECT variant, n, m, v,
                   max(CASE WHEN variant = '0' THEN m END) OVER () AS mc,
                   max(CASE WHEN variant = '0' THEN v END) OVER () AS vc,
                   max(CASE WHEN variant = '0' THEN n END) OVER () AS nc
            FROM st
        )
        SELECT variant, n, round(m, 6) + 0.0 AS mean,
               round(v, 6) + 0.0 AS "var",
               round(CASE WHEN variant <> '0' THEN m - mc END, 6)
                   + 0.0 AS diff,
               round(CASE WHEN variant <> '0' AND mc <> 0
                          THEN (m - mc) / mc END, 6) + 0.0 AS lift,
               round(CASE WHEN variant <> '0'
                           AND sqrt(v / CAST(n AS DOUBLE)
                                    + vc / CAST(nc AS DOUBLE)) > 0
                          THEN (m - mc)
                               / sqrt(v / CAST(n AS DOUBLE)
                                      + vc / CAST(nc AS DOUBLE))
                     END, 6) + 0.0 AS z
        FROM ctl
    """
    # cuped: same split sums, theta/xbar from the identical moment
    # formulas, identical adjustment arithmetic
    sql["cuped_adjust"] = """
        WITH b AS (
            SELECT user_id,
                   CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                              / 86400.0) AS BIGINT) AS p,
                   CAST(value AS DOUBLE) AS v
            FROM events
        ),
        u AS (
            SELECT user_id,
                   coalesce(sum(CASE WHEN p < 19738 THEN v END), 0.0) AS x,
                   coalesce(sum(CASE WHEN p >= 19738 THEN v END), 0.0) AS y
            FROM b GROUP BY user_id
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM u
        ),
        t AS (
            SELECT CASE WHEN n >= 2 AND (sxx - sx * sx / n) > 0
                        THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
                        ELSE 0.0 END AS theta,
                   CASE WHEN n >= 2 THEN sx / n ELSE 0.0 END AS xbar
            FROM m
        )
        SELECT user_id, y, x,
               round(y - theta * (x - xbar), 6) + 0.0 AS y_cuped
        FROM u, t
    """

    # nelson-aalen: the kaplan_meier stepped table with hazard-scale
    # cumulative sums
    sql["nelson_aalen"] = """
        WITH per_user AS (
            SELECT user_id,
                   CAST(epoch_us(min(ts)) AS DOUBLE) / 1000000.0 AS t0,
                   CAST(epoch_us(min(CASE WHEN event_type = 'purchase'
                                          THEN ts END)) AS DOUBLE)
                       / 1000000.0 AS tp,
                   CAST(epoch_us(max(ts)) AS DOUBLE) / 1000000.0 AS tl
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CAST(user_id % 2 AS VARCHAR) AS cohort,
                   CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tl - t0 END AS t,
                   CASE WHEN tp IS NOT NULL THEN 1.0 ELSE 0.0 END AS e
            FROM per_user
        ),
        counts AS (
            SELECT cohort, t, sum(e) AS d, count(*) AS m
            FROM durs GROUP BY cohort, t
        ),
        stepped AS (
            SELECT cohort, t,
                   CAST(d AS BIGINT) AS n_event,
                   CAST(sum(m) OVER (PARTITION BY cohort)
                        - (sum(m) OVER wcum - m) AS BIGINT) AS n_risk,
                   d
            FROM counts
            WINDOW wcum AS (PARTITION BY cohort ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            SELECT cohort, t, n_risk, n_event,
                   CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h,
                   CAST(n_event AS DOUBLE)
                       / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) AS v
            FROM stepped
        )
        SELECT cohort, t, n_risk, n_event,
               round(sum(h) OVER wcum, 6) + 0.0 AS hazard,
               round(sqrt(sum(v) OVER wcum), 6) + 0.0 AS se
        FROM terms
        WINDOW wcum AS (PARTITION BY cohort ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    # log-rank: grid at-risk via strictly-before exit sums, identical
    # E/V operand order
    sql["logrank_test"] = """
        WITH per_user AS (
            SELECT user_id,
                   CAST(epoch_us(min(ts)) AS DOUBLE) / 1000000.0 AS t0,
                   CAST(epoch_us(min(CASE WHEN event_type = 'purchase'
                                          THEN ts END)) AS DOUBLE)
                       / 1000000.0 AS tp,
                   CAST(epoch_us(max(ts)) AS DOUBLE) / 1000000.0 AS tl
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CAST(user_id % 2 AS VARCHAR) AS cohort,
                   CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tl - t0 END AS t,
                   CASE WHEN tp IS NOT NULL THEN 1.0 ELSE 0.0 END AS e
            FROM per_user
        ),
        counts AS (
            SELECT cohort, t, CAST(sum(e) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS m
            FROM durs GROUP BY cohort, t
        ),
        cohorts AS (
            SELECT cohort, CAST(sum(m) AS BIGINT) AS n_subjects
            FROM counts GROUP BY cohort
        ),
        times AS (SELECT DISTINCT t FROM counts WHERE d > 0),
        grid AS (SELECT c.cohort, c.n_subjects, ti.t FROM cohorts c, times ti),
        exits AS (
            SELECT g.cohort, g.t, g.n_subjects,
                   coalesce(sum(c.m), 0) AS ex
            FROM grid g LEFT JOIN counts c
              ON c.cohort = g.cohort AND c.t < g.t
            GROUP BY g.cohort, g.t, g.n_subjects
        ),
        att AS (
            SELECT e2.cohort, e2.t, e2.n_subjects,
                   e2.n_subjects - e2.ex AS ngt,
                   coalesce(c.d, 0) AS dgt
            FROM exits e2 LEFT JOIN counts c
              ON c.cohort = e2.cohort AND c.t = e2.t
        ),
        per AS (
            SELECT cohort, n_subjects, dgt AS obs,
                   sum(dgt) OVER wt * CAST(ngt AS DOUBLE)
                       / CAST(sum(ngt) OVER wt AS DOUBLE) AS expd,
                   CASE WHEN sum(ngt) OVER wt > 1 THEN
                       CAST(sum(dgt) OVER wt AS DOUBLE)
                       * (CAST(ngt AS DOUBLE) / CAST(sum(ngt) OVER wt AS DOUBLE))
                       * (1.0 - CAST(ngt AS DOUBLE)
                                / CAST(sum(ngt) OVER wt AS DOUBLE))
                       * (CAST(sum(ngt) OVER wt AS DOUBLE)
                          - CAST(sum(dgt) OVER wt AS DOUBLE))
                       / (CAST(sum(ngt) OVER wt AS DOUBLE) - 1.0)
                   ELSE 0.0 END AS vterm
            FROM att
            WINDOW wt AS (PARTITION BY t)
        ),
        agg AS (
            SELECT cohort, n_subjects,
                   CAST(sum(obs) AS BIGINT) AS observed,
                   sum(expd) AS e_, sum(vterm) AS v_
            FROM per GROUP BY cohort, n_subjects
        )
        SELECT cohort, n_subjects, observed,
               round(e_, 6) + 0.0 AS expected,
               round(CASE WHEN count(*) OVER () = 2 AND v_ > 0 THEN
                   (max(CAST(observed AS DOUBLE) - e_) OVER ())
                   * (max(CAST(observed AS DOUBLE) - e_) OVER ()) / v_
               END, 6) + 0.0 AS chi2
        FROM agg
    """

    # forecast eval: same 2-lag forecast construction, scored-subset lag,
    # identical moment sums
    sql["forecast_eval"] = """
        WITH b AS (
            SELECT user_id AS id,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   event_id,
                   CAST(value AS DOUBLE) AS a,
                   (lag(CAST(value AS DOUBLE), 1) OVER w
                    + lag(CAST(value AS DOUBLE), 2) OVER w) / 2.0 AS f
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sc AS (
            SELECT id, t, event_id, a, f FROM b
            WHERE a IS NOT NULL AND f IS NOT NULL
        ),
        lg AS (
            SELECT id, a, f,
                   lag(a) OVER (PARTITION BY id ORDER BY t, event_id) AS pa
            FROM sc
        ),
        agg AS (
            SELECT id, CAST(count(*) AS BIGINT) AS n,
                   sum(abs(a - f)) AS se,
                   sum(abs(a - f) * abs(a - f)) AS sq,
                   sum(CASE WHEN a <> 0 THEN abs(a - f) / abs(a) END) AS sp,
                   CAST(count(CASE WHEN a <> 0 THEN 1 END) AS BIGINT) AS np_,
                   sum(CASE WHEN abs(a) + abs(f) > 0
                            THEN 2.0 * abs(a - f) / (abs(a) + abs(f))
                            ELSE 0.0 END) AS ss,
                   CAST(count(CASE WHEN abs(a) + abs(f) > 0 THEN 1 END)
                        AS BIGINT) AS ns,
                   sum(abs(a - pa)) AS sn,
                   CAST(count(pa) AS BIGINT) AS nn
            FROM lg GROUP BY id
        )
        SELECT id, n,
               round(se / CAST(n AS DOUBLE), 6) + 0.0 AS mae,
               round(sqrt(sq / CAST(n AS DOUBLE)), 6) + 0.0 AS rmse,
               round(CASE WHEN np_ > 0
                          THEN sp / CAST(np_ AS DOUBLE) END, 6) + 0.0 AS mape,
               round(CASE WHEN ns > 0
                          THEN ss / CAST(ns AS DOUBLE) END, 6) + 0.0 AS smape,
               round(CASE WHEN nn > 0 AND sn / CAST(nn AS DOUBLE) > 0
                          THEN (se / CAST(n AS DOUBLE))
                               / (sn / CAST(nn AS DOUBLE))
                     END, 6) + 0.0 AS mase
        FROM agg
    """

    # did: identical conditional cell moments and effect arithmetic
    _cell = (
        "sum(CASE WHEN tr = {t} AND po = {p} THEN 1.0 END) AS n{t}{p}, "
        "sum(CASE WHEN tr = {t} AND po = {p} THEN y END) AS s{t}{p}, "
        "sum(CASE WHEN tr = {t} AND po = {p} THEN y * y END) AS ss{t}{p}"
    )
    _cells = ", ".join(_cell.format(t=t, p=p) for t in (0, 1) for p in (0, 1))
    _v = (
        "(CASE WHEN n{t}{p} > 1 THEN (ss{t}{p} - s{t}{p} * s{t}{p} / n{t}{p})"
        " / (n{t}{p} - 1.0) END) / n{t}{p}"
    )
    _sev = " + ".join(_v.format(t=t, p=p) for t in (0, 1) for p in (0, 1))
    sql["did_estimate"] = f"""
        WITH b AS (
            SELECT CAST(user_id % 2 AS INT) AS tr,
                   CASE WHEN CAST(floor(CAST(epoch_us(ts) AS DOUBLE)
                                        / 1000000.0 / 86400.0) AS BIGINT)
                             >= 19738 THEN 1 ELSE 0 END AS po,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        a AS (SELECT {_cells} FROM b),
        d AS (
            SELECT *,
                   (s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00) AS did_,
                   sqrt(0.0 + {_sev}) AS se_
            FROM a
        )
        SELECT CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n,
               round(s00 / n00, 6) + 0.0 AS m_ctl_pre,
               round(s01 / n01, 6) + 0.0 AS m_ctl_post,
               round(s10 / n10, 6) + 0.0 AS m_treat_pre,
               round(s11 / n11, 6) + 0.0 AS m_treat_post,
               round(did_, 6) + 0.0 AS did,
               round(se_, 6) + 0.0 AS se,
               round(CASE WHEN se_ > 0 THEN did_ / se_ END, 6) + 0.0 AS z
        FROM d
    """
    # vocab kl: same combined top-k vocab (n desc, word), add-alpha
    # smoothing, identical log folds
    sql["vocab_kl"] = f"""
        WITH words AS (
            SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS isa,
                   unnest(string_split({_NORM}, ' ')) AS word
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        counts AS (
            SELECT word, sum(isa) AS ca, sum(1 - isa) AS cb,
                   count(*) AS n
            FROM words WHERE word <> '' GROUP BY word
        ),
        vocab AS (
            SELECT * FROM counts ORDER BY n DESC, word LIMIT 200
        ),
        tot AS (
            SELECT sum(ca) AS na, sum(cb) AS nb,
                   CAST(count(*) AS INT) AS v
            FROM vocab
        ),
        p AS (
            SELECT (CAST(ca AS DOUBLE) + 0.5)
                       / (CAST(na AS DOUBLE) + 0.5 * v) AS pa,
                   (CAST(cb AS DOUBLE) + 0.5)
                       / (CAST(nb AS DOUBLE) + 0.5 * v) AS pb
            FROM vocab, tot
        )
        SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(tot.nb AS BIGINT) AS n_b,
               tot.v AS vocab_size,
               round(sum(pa * ln(pa / pb)), 6) + 0.0 AS kl_ab,
               round(sum(pb * ln(pb / pa)), 6) + 0.0 AS kl_ba,
               round(0.5 * sum(pa * ln(pa / ((pa + pb) / 2.0)))
                     + 0.5 * sum(pb * ln(pb / ((pa + pb) / 2.0))), 6)
                   + 0.0 AS js
        FROM p, tot
        GROUP BY tot.na, tot.nb, tot.v
    """

    # session paths: same gap sessionization, ordered list slice, join
    sql["session_paths"] = """
        WITH b AS (
            SELECT user_id AS id,
                   CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t,
                   event_id, event_type AS ty
            FROM events
        ),
        s AS (
            SELECT *, CASE WHEN lag(t) OVER w IS NULL
                            OR t - lag(t) OVER w > 14400.0
                           THEN 1 ELSE 0 END AS isnew
            FROM b
            WINDOW w AS (PARTITION BY id ORDER BY t, event_id)
        ),
        s2 AS (
            SELECT *, sum(isnew) OVER (
                PARTITION BY id ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM s
        ),
        p AS (
            SELECT id, sid,
                   array_to_string(
                       list_slice(list(ty ORDER BY t, event_id), 1, 4),
                       ' > ') AS path
            FROM s2 GROUP BY id, sid
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY path
        ORDER BY n DESC, path
        LIMIT 25
    """

    # T5 span corruption: per-position replay of the engine's segment /
    # offset arithmetic — position p belongs to segment ceil(p·n/L)−1;
    # segment i's span starts at floor(i·L/n)+1 + floor(u_i·slack) with
    # u_i the md5(doc#seed#i) unit; string_agg skips the NULL (deleted)
    # positions. Short docs (n = 0) pass through uncorrupted.
    sql["span_corruption"] = f"""
        WITH d AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
        ),
        base AS (
            SELECT doc_id, w, len(w) AS L,
                   CASE WHEN len(w) < 3 THEN 0
                        ELSE greatest(1, CAST(floor(len(w)*0.15/3 + 0.5) AS INT))
                   END AS n
            FROM d
        ),
        pos AS (
            SELECT doc_id, w, L, n, CAST(t.p AS INT) AS p
            FROM base, unnest(generate_series(1, L)) AS t(p)
            WHERE n > 0
        ),
        seg AS (
            SELECT *, CAST(ceil(p * n / L) - 1 AS INT) AS i FROM pos
        ),
        sp AS (
            SELECT *,
                   CAST(floor(i * L / n) + 1 AS INT) AS lo,
                   CAST(floor((i + 1) * L / n) AS INT) AS hi
            FROM seg
        ),
        sp2 AS (
            SELECT *,
                   least(3, hi - lo + 1) AS ln,
                   CAST(lo + floor(
                       (CAST(('0x' || substr(md5(doc_id || '#42#' || i), 1, 8))
                             AS BIGINT) / 4294967296.0)
                       * (hi - lo + 1 - least(3, hi - lo + 1) + 1)
                   ) AS INT) AS st
            FROM sp
        ),
        cls AS (
            SELECT doc_id, n, p, i, w[p] AS tok,
                   (p >= st AND p < st + ln) AS inside,
                   (p = st) AS head
            FROM sp2
        ),
        agg AS (
            SELECT doc_id,
                   string_agg(
                       CASE WHEN head THEN '<extra_id_' || i || '>'
                            WHEN inside THEN NULL ELSE tok END,
                       ' ' ORDER BY p) AS input_tokens,
                   string_agg(
                       CASE WHEN head THEN '<extra_id_' || i || '> ' || tok
                            WHEN inside THEN tok END,
                       ' ' ORDER BY p)
                   || ' <extra_id_' || any_value(n) || '>' AS target_tokens
            FROM cls GROUP BY doc_id
        )
        SELECT b.doc_id, CAST(b.L AS BIGINT) AS n_tok,
               CAST(b.n AS BIGINT) AS n_spans,
               a.input_tokens, a.target_tokens
        FROM base b JOIN agg a USING (doc_id)
        UNION ALL
        SELECT doc_id, CAST(L AS BIGINT) AS n_tok, 0 AS n_spans,
               array_to_string(w, ' ') AS input_tokens, '' AS target_tokens
        FROM base WHERE n = 0
    """

    # SFT chat packing: per-turn header+token arrays flattened in turn
    # order; the loss mask is 1 only on assistant token positions.
    sql["chat_pack"] = """
        WITH seqs AS (
            SELECT event_id, user_id,
                   generate_series(event_id % 100,
                                   event_id % 100 + event_id % 5) AS toks
            FROM events
        ),
        arrs AS (
            SELECT user_id AS conv_id, event_id AS turn_id,
                   CASE WHEN event_id % 3 = 0 THEN 'system'
                        WHEN event_id % 3 = 1 THEN 'user'
                        ELSE 'assistant' END AS role,
                   toks
            FROM seqs
        ),
        built AS (
            SELECT conv_id, turn_id,
                   ['<|' || role || '|>']
                   || list_transform(toks, t -> CAST(t AS VARCHAR)) AS tw,
                   [0] || list_transform(
                       toks,
                       t -> CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS mk
            FROM arrs
        ),
        conv AS (
            SELECT conv_id,
                   count(*) AS n_turns,
                   flatten(list(tw ORDER BY turn_id)) AS tok,
                   flatten(list(mk ORDER BY turn_id)) AS mask
            FROM built GROUP BY conv_id
        )
        SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
               array_to_string(tok, ' ') AS tokens,
               array_to_string(
                   list_transform(mask, x -> CAST(x AS VARCHAR)), '') AS loss_mask
        FROM conv
    """

    # fill-in-the-middle: u0 gates the FIM lane, (u1, u2) give the two
    # token-boundary cut points lo <= hi in 0..L; PSM assembly is plain
    # list concatenation.
    sql["fim_split"] = f"""
        WITH d AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
        ),
        base AS (
            SELECT doc_id, w, len(w) AS L,
                   CAST(('0x' || substr(md5(doc_id || '#42#0'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u0,
                   CAST(('0x' || substr(md5(doc_id || '#42#1'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u1,
                   CAST(('0x' || substr(md5(doc_id || '#42#2'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u2
            FROM d
        ),
        cut AS (
            SELECT doc_id, w, L, (u0 < 0.5 AND L >= 3) AS is_fim,
                   least(CAST(floor(least(u1, u2) * (L + 1)) AS INT), L) AS lo,
                   least(CAST(floor(greatest(u1, u2) * (L + 1)) AS INT), L) AS hi
            FROM base
        )
        SELECT doc_id, CAST(L AS BIGINT) AS n_tok, is_fim,
               CASE WHEN is_fim THEN
                   array_to_string(
                       ['<PRE>'] || w[1:lo] || ['<SUF>'] || w[hi+1:L]
                       || ['<MID>'] || w[lo+1:hi],
                       ' ')
               ELSE array_to_string(w, ' ') END AS fim_tokens,
               CASE WHEN is_fim
                    THEN coalesce(array_to_string(w[lo+1:hi], ' '), '')
                    ELSE '' END AS middle
        FROM cut
    """

    # Theil–Sen: per-user pair join on exact integer-µs time (epoch_us =
    # Spark's _time_micros), slopes in value/hour, exact interpolated
    # median (quantile_cont == Spark percentile)
    sql["theil_sen"] = """
        WITH base AS (
            SELECT user_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        ),
        nobs AS (SELECT user_id, count(*) AS n_obs FROM base GROUP BY 1),
        pairs AS (
            SELECT a.user_id,
                   (b.y - a.y) / ((b.t - a.t) / 3600000000.0) AS s
            FROM base a JOIN base b
              ON a.user_id = b.user_id AND a.t < b.t
        ),
        med AS (
            SELECT user_id, count(*) AS n_pairs,
                   quantile_cont(s, 0.5) AS m
            FROM pairs GROUP BY 1
        )
        SELECT n.user_id, CAST(n.n_obs AS BIGINT) AS n_obs,
               CAST(coalesce(med.n_pairs, 0) AS BIGINT) AS n_pairs,
               round(med.m, 6) + 0.0 AS slope
        FROM nobs n LEFT JOIN med USING (user_id)
        ORDER BY n.user_id
    """
    # Mann–Kendall: S over the same strict-time pair set, tie-corrected
    # variance over value groups, continuity-corrected z (NULL at sigma 0)
    sql["mann_kendall"] = """
        WITH base AS (
            SELECT user_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        ),
        nobs AS (SELECT user_id, count(*) AS n_obs FROM base GROUP BY 1),
        s AS (
            SELECT a.user_id,
                   CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat
            FROM base a JOIN base b
              ON a.user_id = b.user_id AND a.t < b.t
            GROUP BY 1
        ),
        ties AS (
            SELECT user_id,
                   sum(CAST(c AS DOUBLE) * (c - 1) * (2 * c + 5)) AS tie
            FROM (SELECT user_id, y, count(*) AS c FROM base GROUP BY 1, 2)
            GROUP BY 1
        ),
        j AS (
            SELECT n.user_id, n.n_obs,
                   coalesce(s.s_stat, 0) AS s_stat,
                   (CAST(n.n_obs AS DOUBLE) * (n.n_obs - 1) * (2 * n.n_obs + 5)
                    - t.tie) / 18.0 AS var_s
            FROM nobs n LEFT JOIN s USING (user_id)
                        LEFT JOIN ties t USING (user_id)
        )
        SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
               CAST(s_stat AS BIGINT) AS s_stat,
               round(var_s, 6) + 0.0 AS var_s,
               round(CASE WHEN sqrt(var_s) > 0 THEN
                       CASE WHEN s_stat > 0
                                THEN (s_stat - 1) / sqrt(var_s)
                            WHEN s_stat < 0
                                THEN (s_stat + 1) / sqrt(var_s)
                            ELSE 0.0 END
                     END, 6) + 0.0 AS z
        FROM j ORDER BY user_id
    """
    # BH step-up over the md5-derived per-event-type p family (integer
    # math -> bit-identical p in both engines); rank asc window + reverse
    # running-min envelope, both over the bounded C-row family
    sql["fdr_bh"] = """
        WITH t AS (
            SELECT coalesce(CAST(event_type AS VARCHAR), '__null__') AS test,
                   (CAST(('0x' || substr(md5(coalesce(CAST(event_type AS VARCHAR),
                                                      '__null__')), 1, 15))
                         AS BIGINT) % 1000000) / 1000000.0 AS p
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT test, p,
                   CAST(row_number() OVER (ORDER BY p, test) AS INT) AS rank,
                   count(*) OVER () AS m
            FROM t
        )
        SELECT test, p, rank,
               round(least(1.0, min(p * m / rank) OVER (
                   ORDER BY p DESC, test DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                   + 0.0 AS p_adj,
               round(least(1.0, min(p * m / rank) OVER (
                   ORDER BY p DESC, test DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                   <= 0.5 AS reject
        FROM r ORDER BY rank
    """
    # Dirichlet query likelihood: the engine's exact decomposition —
    # matched lift ln((tf+mu*pc)/(mu*pc)) + constant sum(qtf*ln(mu*pc))
    # - qlen*ln(dl+mu); query = top-3 heavy hitters, qtf 2 on the top one
    sql["query_likelihood"] = f"""
        WITH w0 AS (SELECT doc_id, string_split({_NORM}, ' ') AS w
                    FROM documents),
        d AS (
            SELECT doc_id, w,
                   CAST(CASE WHEN array_to_string(w, '') = '' THEN 0
                        ELSE len(w) END AS DOUBLE) AS dl
            FROM w0
        ),
        ranked AS (
            SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS rk
            FROM (SELECT unnest(w) AS word FROM w0)
            WHERE word <> ''
            GROUP BY word ORDER BY count(*) DESC, word LIMIT 3
        ),
        qterms AS (
            SELECT word, CASE WHEN rk = 1 THEN 2.0 ELSE 1.0 END AS qtf
            FROM ranked
        ),
        ctot AS (SELECT sum(dl) AS c FROM d),
        exploded AS (SELECT doc_id, dl, unnest(w) AS word FROM d),
        cf AS (
            SELECT q.word, q.qtf, CAST(count(*) AS DOUBLE) AS cfreq
            FROM exploded e JOIN qterms q USING (word)
            GROUP BY 1, 2
        ),
        pcs AS (
            SELECT word, qtf, cfreq / ctot.c AS pc FROM cf, ctot
            WHERE cfreq > 0
        ),
        consts AS (
            SELECT sum(qtf * ln(500.0 * pc)) AS con, sum(qtf) AS qlen
            FROM pcs
        ),
        tf AS (
            SELECT doc_id, dl, word, CAST(count(*) AS DOUBLE) AS tf
            FROM exploded JOIN pcs USING (word)
            GROUP BY 1, 2, 3
        ),
        lift AS (
            SELECT doc_id, dl,
                   sum(p.qtf * ln((tf.tf + 500.0 * p.pc) / (500.0 * p.pc)))
                       AS l
            FROM tf JOIN pcs p USING (word)
            GROUP BY 1, 2
        )
        SELECT doc_id,
               round(l + c.con - c.qlen * ln(dl + 500.0), 6) + 0.0 AS score
        FROM lift, consts c
        ORDER BY score DESC, doc_id
        LIMIT 20
    """
    # Good–Turing: unigram counts -> bounded count-of-counts -> r+1
    # self-join; identical operand order for r*, p_gt and the masses
    sql["good_turing"] = f"""
        WITH w0 AS (SELECT string_split({_NORM}, ' ') AS w FROM documents),
        uni AS (
            SELECT word, count(*) AS n
            FROM (SELECT unnest(w) AS word FROM w0)
            WHERE word <> '' GROUP BY 1
        ),
        cc AS (SELECT n AS r, count(*) AS n_r FROM uni GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM uni),
        body AS (
            SELECT cc.r, cc.n_r,
                   CAST(cc.r + 1 AS DOUBLE) * CAST(c2.n_r AS DOUBLE)
                       / CAST(cc.n_r AS DOUBLE) AS rstar
            FROM cc LEFT JOIN cc c2 ON c2.r = cc.r + 1
        )
        SELECT CAST(r AS BIGINT) AS r, CAST(n_r AS BIGINT) AS n_r,
               round(rstar, 6) + 0.0 AS r_star,
               round(rstar / t.nt, 6) + 0.0 AS p_gt,
               round(n_r * CAST(r AS DOUBLE) / t.nt, 6) + 0.0 AS mass,
               round(n_r * rstar / t.nt, 6) + 0.0 AS gt_mass
        FROM body, tot t
        UNION ALL
        SELECT CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 0.0,
               round(coalesce((SELECT n_r FROM cc WHERE r = 1), 0) / t.nt, 6)
                   + 0.0
        FROM tot t
        ORDER BY r
    """

    # chi-square independence: one contingency groupBy, marginals OF the
    # bounded table, identical operand order for e, chi2 and MI
    sql["chi2_independence"] = """
        WITH base AS (
            SELECT coalesce(CAST(event_type AS VARCHAR), '__null__') AS a,
                   coalesce(CAST(user_id % 4 AS VARCHAR), '__null__') AS b
            FROM events
        ),
        cont AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
        ma AS (SELECT a, sum(o) AS na FROM cont GROUP BY 1),
        mb AS (SELECT b, sum(o) AS nb FROM cont GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS DOUBLE) AS nt FROM cont),
        cells AS (
            SELECT CAST(o AS DOUBLE) AS o, CAST(na AS DOUBLE) AS na,
                   CAST(nb AS DOUBLE) AS nb, nt, a, b
            FROM cont JOIN ma USING (a) JOIN mb USING (b), tot
        ),
        f AS (
            SELECT CAST(sum(o) AS BIGINT) AS n,
                   count(DISTINCT a) AS ka, count(DISTINCT b) AS kb,
                   sum((o - na * nb / nt) * (o - na * nb / nt)
                       / (na * nb / nt)) AS chi2,
                   sum((o / nt) * ln((o / nt) / ((na / nt) * (nb / nt))))
                       AS mi,
                   max(nt) AS nt
            FROM cells
        )
        SELECT n, CAST(ka AS BIGINT) AS n_a, CAST(kb AS BIGINT) AS n_b,
               CASE WHEN (ka - 1) * (kb - 1) > 0
                    THEN CAST((ka - 1) * (kb - 1) AS BIGINT) END AS dof,
               round(chi2, 6) + 0.0 AS chi2,
               round(CASE WHEN least(ka - 1, kb - 1) > 0
                          THEN sqrt(chi2 / (n * least(CAST(ka AS DOUBLE) - 1,
                                                      CAST(kb AS DOUBLE) - 1)))
                     END, 6) + 0.0 AS cramers_v,
               round(mi, 6) + 0.0 AS mi
        FROM f
    """
    # Poisson bootstrap: md5 inverse-CDF weights (identical hash + CDF
    # literals), replicate means rounded to 6 BEFORE the exact quantiles
    sql["poisson_bootstrap"] = """
        WITH rep AS (
            SELECT CAST(event_id AS VARCHAR) AS id,
                   CAST(value AS DOUBLE) AS y,
                   unnest(generate_series(0, 99)) AS b
            FROM events WHERE value IS NOT NULL
        ),
        w AS (
            SELECT b, y,
                   (CAST(('0x' || substr(md5(id || '#42#' || CAST(b AS VARCHAR)),
                                        1, 15)) AS BIGINT)
                    % 1000000000) / 1000000000.0 AS u
            FROM rep
        ),
        wt AS (
            SELECT b, y,
                   CAST(CASE
                     WHEN u < 0.36787944117144233 THEN 0
                     WHEN u < 0.7357588823428847 THEN 1
                     WHEN u < 0.9196986029286058 THEN 2
                     WHEN u < 0.9810118431238462 THEN 3
                     WHEN u < 0.9963401531726563 THEN 4
                     WHEN u < 0.9994058151824183 THEN 5
                     WHEN u < 0.9999167588507119 THEN 6
                     WHEN u < 0.9999897508033253 THEN 7
                     WHEN u < 0.9999988852347653 THEN 8
                     ELSE 9 END AS DOUBLE) AS w
            FROM w
        ),
        means AS (
            SELECT round(sum(w * y) / sum(w), 6) AS m
            FROM wt GROUP BY b
            HAVING sum(w) > 0
        ),
        boot AS (
            SELECT count(*) AS nb, avg(m) AS bm, stddev_samp(m) AS se,
                   quantile_cont(m, 0.025) AS lo, quantile_cont(m, 0.975) AS hi
            FROM means
        ),
        pt AS (
            SELECT count(*) AS n, avg(CAST(value AS DOUBLE)) AS mean
            FROM events WHERE value IS NOT NULL
        )
        SELECT CAST(pt.n AS BIGINT) AS n, CAST(boot.nb AS BIGINT) AS n_boot,
               round(pt.mean, 6) + 0.0 AS mean,
               round(boot.bm, 6) + 0.0 AS boot_mean,
               round(boot.se, 6) + 0.0 AS se,
               round(boot.lo, 6) + 0.0 AS lo,
               round(boot.hi, 6) + 0.0 AS hi
        FROM pt, boot
    """

    # Mann–Whitney U: identical count-table → average-rank → 1-row fold;
    # cumulative count ordered by value replays the distributed prefix sum
    sql["mann_whitney"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type = 'click' AS BIGINT) AS ia
            FROM events
            WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        ),
        c AS (
            SELECT y, sum(ia) AS na, sum(1 - ia) AS nb, count(*) AS n
            FROM b GROUP BY 1
        ),
        r AS (SELECT *, sum(n) OVER (ORDER BY y) AS ncum FROM c),
        t AS (
            SELECT CAST(sum(na) AS DOUBLE) AS nat,
                   CAST(sum(nb) AS DOUBLE) AS nbt,
                   sum(CAST(na AS DOUBLE)
                       * ((ncum - n) + (CAST(n AS DOUBLE) + 1) / 2)) AS ra,
                   sum(CAST(n AS DOUBLE) * n * n - n) AS ties
            FROM r
        ),
        s AS (
            SELECT nat, nbt,
                   ra - nat * (nat + 1) / 2 AS ua,
                   nat * nbt - (ra - nat * (nat + 1) / 2) AS ub,
                   ra - nat * (nat + 1) / 2 - nat * nbt / 2 AS dev,
                   sqrt(nat * nbt / 12 * (nat + nbt + 1
                        - ties / ((nat + nbt) * (nat + nbt - 1)))) AS sigma
            FROM t
        )
        SELECT CAST(nat AS BIGINT) AS n_a, CAST(nbt AS BIGINT) AS n_b,
               round(ua, 6) + 0.0 AS u_a, round(ub, 6) + 0.0 AS u_b,
               round(CASE WHEN sigma > 0 THEN
                   (dev - CASE WHEN dev > 0 THEN 0.5
                               WHEN dev < 0 THEN -0.5 ELSE 0.0 END) / sigma
               END, 6) + 0.0 AS z
        FROM s
    """

    # feature hashing: identical md5 bucket/sign literals, signed sums
    # cancel exactly (integer-valued doubles), L2 norm rounds to 6
    sql["hashed_features"] = f"""
        WITH w AS (
            SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(md5(word || '#fh7'), 1, 8))
                             AS BIGINT) % 64 AS INT) AS bucket,
                   CASE WHEN CAST(('0x' || substr(md5(word || '#fs7'), 1, 2))
                             AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END AS s
            FROM w WHERE word <> ''
        ),
        v AS (
            SELECT doc_id, bucket, sum(s) AS val
            FROM h GROUP BY 1, 2 HAVING sum(s) <> 0
        ),
        nrm AS (SELECT doc_id, sqrt(sum(val * val)) AS nm FROM v GROUP BY 1)
        SELECT v.doc_id, v.bucket,
               round(v.val / nrm.nm, 6) + 0.0 AS value
        FROM v JOIN nrm USING (doc_id)
    """

    # approximate randomization test: identical md5 relabeling; both
    # observed and replicate diffs round to 6 before comparison
    sql["permutation_test"] = """
        WITH b AS (
            SELECT CAST(event_id AS VARCHAR) AS id, CAST(value AS DOUBLE) AS y,
                   event_type = 'click' AS ia
            FROM events
            WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        ),
        cnt AS (
            SELECT sum(CAST(ia AS BIGINT)) AS na,
                   sum(CAST(NOT ia AS BIGINT)) AS nb,
                   sum(CASE WHEN ia THEN y END) AS sa,
                   sum(CASE WHEN NOT ia THEN y END) AS sb
            FROM b
        ),
        ob AS (
            SELECT na, nb, round(sa / na - sb / nb, 6) AS dobs,
                   CAST(na AS DOUBLE) / (na + nb) AS pa
            FROM cnt
        ),
        rep AS (
            SELECT id, y, unnest(generate_series(0, 99)) AS r FROM b
        ),
        lab AS (
            SELECT r, y,
                   ((CAST(('0x' || substr(md5(id || '#42#' || CAST(r AS VARCHAR)),
                                         1, 15)) AS BIGINT)
                     % 1000000000) / 1000000000.0
                    < (SELECT pa FROM ob)) AS s
            FROM rep
        ),
        d AS (
            SELECT r,
                   round(sum(CASE WHEN s THEN y END)
                             / sum(CASE WHEN s THEN 1 END)
                         - sum(CASE WHEN NOT s THEN y END)
                             / sum(CASE WHEN NOT s THEN 1 END), 6) AS dr
            FROM lab GROUP BY r
        ),
        f AS (
            SELECT count(*) AS np,
                   sum(CAST(abs(dr) >= abs((SELECT dobs FROM ob)) AS BIGINT)) AS ne
            FROM d WHERE dr IS NOT NULL
        )
        SELECT CAST(ob.na AS BIGINT) AS n_a, CAST(ob.nb AS BIGINT) AS n_b,
               ob.dobs + 0.0 AS diff,
               CAST(f.np AS BIGINT) AS n_perm, CAST(f.ne AS BIGINT) AS n_extreme,
               round((f.ne + 1.0) / (f.np + 1.0), 6) + 0.0 AS p_value
        FROM ob, f
    """

    # covariate balance: same (q − s²/n)/(n−1) moment formula, pairwise
    # deletion per covariate, SMD/ratio NULL guards identical
    _cb_block = """
        SELECT '{name}' AS covariate,
               count(va) AS n_a_raw, sum(va) AS sa, sum(va * va) AS qa,
               count(vb) AS n_b_raw, sum(vb) AS sb, sum(vb * vb) AS qb
        FROM (
            SELECT CASE WHEN event_type = 'click' THEN {expr} END AS va,
                   CASE WHEN event_type = 'view' THEN {expr} END AS vb
            FROM events WHERE event_type IN ('click', 'view')
        )
    """
    sql["covariate_balance"] = f"""
        WITH s AS (
            {_cb_block.format(name='value', expr='CAST(value AS DOUBLE)')}
            UNION ALL
            {_cb_block.format(name='uid_mod', expr='CAST(user_id % 97 AS DOUBLE)')}
        ),
        m AS (
            SELECT covariate,
                   n_a_raw, n_b_raw,
                   sa / n_a_raw AS mean_a, sb / n_b_raw AS mean_b,
                   CASE WHEN n_a_raw > 1
                        THEN (qa - sa * sa / n_a_raw) / (n_a_raw - 1.0) END AS var_a,
                   CASE WHEN n_b_raw > 1
                        THEN (qb - sb * sb / n_b_raw) / (n_b_raw - 1.0) END AS var_b
            FROM s
        )
        SELECT covariate,
               CAST(n_a_raw AS BIGINT) AS n_a, CAST(n_b_raw AS BIGINT) AS n_b,
               round(mean_a, 6) + 0.0 AS mean_a, round(mean_b, 6) + 0.0 AS mean_b,
               round(CASE WHEN (var_a + var_b) / 2 > 0
                          THEN (mean_a - mean_b) / sqrt((var_a + var_b) / 2) END,
                     6) + 0.0 AS smd,
               round(CASE WHEN var_b > 0 THEN var_a / var_b END, 6) + 0.0
                   AS var_ratio
        FROM m ORDER BY covariate
    """

    # SRM: bounded count table vs the uniform design, one chi-square fold
    sql["srm_check"] = """
        WITH c AS (
            SELECT coalesce(CAST(event_type AS VARCHAR), '__null__') AS variant,
                   count(*) AS o
            FROM events GROUP BY 1
        ),
        e AS (
            SELECT * FROM (VALUES ('click', 0.2), ('view', 0.2),
                                  ('purchase', 0.2), ('signup', 0.2),
                                  ('error', 0.2)) AS t(variant, share)
        ),
        j AS (
            SELECT coalesce(c.variant, e.variant) AS variant,
                   coalesce(c.o, 0) AS o, e.share
            FROM c FULL OUTER JOIN e ON c.variant = e.variant
        ),
        t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM j),
        f AS (
            SELECT max(t.n) AS n, count(*) AS k,
                   sum((o - share * t.n) * (o - share * t.n) / (share * t.n))
                       AS chi2,
                   max(abs(o / t.n - share)) AS md
            FROM j, t
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               round(chi2, 6) + 0.0 AS chi2, CAST(k - 1 AS BIGINT) AS dof,
               round(md, 6) + 0.0 AS max_abs_dev
        FROM f
    """

    # Holt / SES: identical recursion replayed as a recursive CTE;
    # smoothing constants appear as (1 - a) COMPUTED, matching the
    # engine's F.lit(1.0 - alpha) bit-for-bit
    sql["holt_forecast"] = """
        WITH RECURSIVE base AS (
            SELECT user_id AS id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS r,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        len AS (SELECT id, max(r) AS n FROM base GROUP BY 1),
        state AS (
            SELECT b0.id, 1 AS r, b0.y AS l,
                   CASE WHEN b1.y IS NULL THEN 0.0 ELSE b1.y - b0.y END AS b
            FROM base b0 LEFT JOIN base b1 ON b1.id = b0.id AND b1.r = 2
            WHERE b0.r = 1
            UNION ALL
            SELECT s.id, s.r + 1,
                   0.4 * nx.y + (1 - 0.4) * (s.l + s.b) AS l,
                   0.3 * ((0.4 * nx.y + (1 - 0.4) * (s.l + s.b)) - s.l)
                       + (1 - 0.3) * s.b AS b
            FROM state s JOIN base nx ON nx.id = s.id AND nx.r = s.r + 1
        ),
        fin AS (
            SELECT s.id, len.n, s.l, s.b
            FROM state s JOIN len ON len.id = s.id AND s.r = len.n
        )
        SELECT id AS user_id, CAST(n AS BIGINT) AS n,
               round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
               CAST(h AS INT) AS step,
               round(l + h * b, 6) + 0.0 AS yhat
        FROM fin, (SELECT unnest(generate_series(1, 3)) AS h)
    """
    sql["ses_forecast"] = """
        WITH RECURSIVE base AS (
            SELECT user_id AS id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS r,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        len AS (SELECT id, max(r) AS n FROM base GROUP BY 1),
        state AS (
            SELECT id, 1 AS r, y AS l FROM base WHERE r = 1
            UNION ALL
            SELECT s.id, s.r + 1, 0.3 * nx.y + (1 - 0.3) * s.l AS l
            FROM state s JOIN base nx ON nx.id = s.id AND nx.r = s.r + 1
        ),
        fin AS (
            SELECT s.id, len.n, s.l
            FROM state s JOIN len ON len.id = s.id AND s.r = len.n
        )
        SELECT id AS user_id, CAST(n AS BIGINT) AS n,
               round(l, 6) + 0.0 AS level, 0.0 AS trend,
               CAST(h AS INT) AS step, round(l, 6) + 0.0 AS yhat
        FROM fin, (SELECT unnest(generate_series(1, 2)) AS h)
    """

    # interval overlap: the oracle is the quadratic within-user join the
    # chunked plan must reproduce exactly (half-open on both sides)
    sql["interval_overlap"] = """
        WITH iv AS (
            SELECT event_id, user_id,
                   epoch_us(ts) AS lo,
                   epoch_us(ts + to_minutes(CAST(floor(value) AS BIGINT))) AS hi
            FROM events WHERE value IS NOT NULL
        ),
        -- hi > lo: an empty [x, x) interval intersects nothing, but the
        -- naive predicate below would admit it when x lies inside the
        -- other interval — match the operator's half-open semantics
        l AS (SELECT * FROM iv WHERE event_id % 2 = 0 AND hi > lo),
        r AS (SELECT * FROM iv WHERE event_id % 2 = 1 AND hi > lo)
        SELECT l.user_id, l.event_id AS lid, r.event_id AS rid
        FROM l JOIN r ON l.user_id = r.user_id
                     AND l.lo < r.hi AND r.lo < l.hi
    """

    # Holt–Winters additive: identical recursion, LIST-state recursive
    # CTE; init means as FILTERed sums over the first season(s)
    sql["holt_winters"] = """
        WITH RECURSIVE base AS (
            SELECT user_id AS id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS r,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        agg AS (
            SELECT id, max(r) AS n,
                   sum(y) FILTER (WHERE r <= 7) / 7.0 AS l0,
                   CASE WHEN max(r) >= 14
                        THEN (sum(y) FILTER (WHERE r > 7 AND r <= 14) / 7.0
                              - sum(y) FILTER (WHERE r <= 7) / 7.0) / 7.0
                        ELSE 0.0 END AS b0
            FROM base GROUP BY id HAVING max(r) >= 7
        ),
        ini AS (
            SELECT b.id, max(a.l0) AS l0, max(a.b0) AS b0,
                   list(b.y - a.l0 ORDER BY b.r) AS s0
            FROM base b JOIN agg a ON a.id = b.id
            WHERE b.r <= 7 GROUP BY b.id
        ),
        state AS (
            SELECT id, CAST(7 AS BIGINT) AS r, l0 AS l, b0 AS b, s0 AS s
            FROM ini
            UNION ALL
            SELECT st.id, st.r + 1,
                   0.3 * (nx.y - st.s[1]) + (1 - 0.3) * (st.l + st.b) AS l,
                   0.1 * ((0.3 * (nx.y - st.s[1])
                           + (1 - 0.3) * (st.l + st.b)) - st.l)
                       + (1 - 0.1) * st.b AS b,
                   list_concat(st.s[2:7],
                               [0.2 * (nx.y - st.l - st.b)
                                + (1 - 0.2) * st.s[1]]) AS s
            FROM state st JOIN base nx ON nx.id = st.id AND nx.r = st.r + 1
        ),
        fin AS (
            SELECT s.id, a.n, s.l, s.b, s.s
            FROM state s JOIN agg a ON a.id = s.id AND s.r = a.n
        )
        SELECT id AS user_id, CAST(n AS BIGINT) AS n,
               round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
               CAST(h AS INT) AS step,
               round(s[CAST((h - 1) % 7 + 1 AS INT)], 6) + 0.0 AS seasonal,
               round(l + h * b + s[CAST((h - 1) % 7 + 1 AS INT)], 6) + 0.0
                   AS yhat
        FROM fin, (SELECT unnest(generate_series(1, 3)) AS h)
    """

    # IPW/AIPW: identical md5 assignment + planted effect, one fold of
    # weighted sums (Hájek ratios, Kish ESS, AIPW influence mean)
    sql["ipw_estimate"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE)
                       + 5.0 * CASE WHEN (CAST(('0x' || substr(md5(
                             CAST(event_id AS VARCHAR) || '#7'), 1, 15))
                             AS BIGINT) % 1000000000) / 1000000000.0
                           < 0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0)
                         THEN 1.0 ELSE 0.0 END AS y,
                   CASE WHEN (CAST(('0x' || substr(md5(
                             CAST(event_id AS VARCHAR) || '#7'), 1, 15))
                             AS BIGINT) % 1000000000) / 1000000000.0
                           < 0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0)
                        THEN 1.0 ELSE 0.0 END AS t,
                   0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0) AS p,
                   5.0 + CAST(user_id % 10 AS DOUBLE) AS m1,
                   CAST(user_id % 10 AS DOUBLE) AS m0
            FROM events WHERE value IS NOT NULL
        ),
        f AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN p < 0.01 OR p > 0.99 THEN 1 ELSE 0 END)
                       AS n_tr,
                   sum(t) FILTER (WHERE p >= 0.01 AND p <= 0.99) AS nt,
                   sum(1.0 - t) FILTER (WHERE p >= 0.01 AND p <= 0.99) AS nc,
                   sum(t / p * y) FILTER (WHERE p >= 0.01 AND p <= 0.99)
                       AS swy1,
                   sum(t / p) FILTER (WHERE p >= 0.01 AND p <= 0.99) AS sw1,
                   sum((t / p) * (t / p))
                       FILTER (WHERE p >= 0.01 AND p <= 0.99) AS sq1,
                   sum((1.0 - t) / (1.0 - p) * y)
                       FILTER (WHERE p >= 0.01 AND p <= 0.99) AS swy0,
                   sum((1.0 - t) / (1.0 - p))
                       FILTER (WHERE p >= 0.01 AND p <= 0.99) AS sw0,
                   sum(((1.0 - t) / (1.0 - p)) * ((1.0 - t) / (1.0 - p)))
                       FILTER (WHERE p >= 0.01 AND p <= 0.99) AS sq0,
                   avg(m1 - m0 + t * (y - m1) / p
                       - (1.0 - t) * (y - m0) / (1.0 - p))
                       FILTER (WHERE p >= 0.01 AND p <= 0.99) AS dr
            FROM b
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(n_tr AS BIGINT) AS n_trimmed,
               CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_control,
               round(swy1 / sw1, 6) + 0.0 AS mu_treat,
               round(swy0 / sw0, 6) + 0.0 AS mu_control,
               round(swy1 / sw1 - swy0 / sw0, 6) + 0.0 AS ate,
               round(sw1 * sw1 / sq1, 6) + 0.0 AS ess_treat,
               round(sw0 * sw0 / sq0, 6) + 0.0 AS ess_control,
               round(dr, 6) + 0.0 AS ate_dr
        FROM f
    """

    # Poisson Fisher-scoring round at beta=0 (mu=1, w=1, z=y-1): plain
    # sums + the shared Cramer 3x3 solve
    sql["poisson_step"] = f"""
        WITH feats AS (
            SELECT event_id, ts, CAST(event_id % 5 AS DOUBLE) AS yc,
                   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS l1,
                   lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS l2
            FROM events
        ),
        d0 AS (SELECT * FROM feats WHERE l1 IS NOT NULL AND l2 IS NOT NULL),
        s AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(l1) AS s1, sum(l2) AS s2,
                   sum(l1 * l1) AS s11, sum(l1 * l2) AS s12,
                   sum(l2 * l2) AS s22,
                   sum(yc - 1.0) AS sy,
                   sum(l1 * (yc - 1.0)) AS s1y,
                   sum(l2 * (yc - 1.0)) AS s2y,
                   sum(yc * 0.0 - 1.0) AS ll
            FROM d0
        ),
        {_cramer3_cte()}
        SELECT t.term,
               round(CASE t.term WHEN 'intercept' THEN beta.b0
                                 WHEN 'log_likelihood' THEN s.ll
                                 WHEN 'value_lag_1' THEN beta.b1
                                 ELSE beta.b2 END, 6) AS value
        FROM beta, s,
             (VALUES ('intercept'), ('log_likelihood'),
                     ('value_lag_1'), ('value_lag_2')) t(term)
    """

    # ALS round: identical md5 seed factors, identical Gram/rhs sums,
    # identical 2x2 Cramer arithmetic; user factors round to 6 BEFORE
    # the item solve (the replayable-model contract)
    sql["als_round"] = """
        WITH rat AS (
            SELECT CAST(user_id AS VARCHAR) AS u,
                   CAST(event_type AS VARCHAR) AS i,
                   CAST(count(*) AS DOUBLE) AS r
            FROM events GROUP BY 1, 2
        ),
        q0 AS (
            SELECT i,
                   0.5 * (2.0 * ((CAST(('0x' || substr(md5(i || '#42#0'), 1, 15))
                                  AS BIGINT) % 1000000000) / 1000000000.0)
                          - 1.0) AS a0,
                   0.5 * (2.0 * ((CAST(('0x' || substr(md5(i || '#42#1'), 1, 15))
                                  AS BIGINT) % 1000000000) / 1000000000.0)
                          - 1.0) AS a1
            FROM (SELECT DISTINCT i FROM rat)
        ),
        uagg AS (
            SELECT u, CAST(count(*) AS DOUBLE) AS n,
                   sum(r * a0) AS r0, sum(r * a1) AS r1,
                   sum(a0 * a0) AS g00, sum(a0 * a1) AS g01,
                   sum(a1 * a1) AS g11
            FROM rat JOIN q0 USING (i) GROUP BY u
        ),
        p AS (
            SELECT u,
                   round(((g11 + 0.1 * n) * r0 - g01 * r1)
                         / ((g00 + 0.1 * n) * (g11 + 0.1 * n) - g01 * g01),
                         6) AS a0,
                   round(((g00 + 0.1 * n) * r1 - g01 * r0)
                         / ((g00 + 0.1 * n) * (g11 + 0.1 * n) - g01 * g01),
                         6) AS a1
            FROM uagg
        ),
        iagg AS (
            SELECT i, CAST(count(*) AS DOUBLE) AS n,
                   sum(r * a0) AS r0, sum(r * a1) AS r1,
                   sum(a0 * a0) AS g00, sum(a0 * a1) AS g01,
                   sum(a1 * a1) AS g11
            FROM rat JOIN p USING (u) GROUP BY i
        )
        SELECT i AS item,
               round(((g11 + 0.1 * n) * r0 - g01 * r1)
                     / ((g00 + 0.1 * n) * (g11 + 0.1 * n) - g01 * g01), 6)
                   + 0.0 AS f0,
               round(((g00 + 0.1 * n) * r1 - g01 * r0)
                     / ((g00 + 0.1 * n) * (g11 + 0.1 * n) - g01 * g01), 6)
                   + 0.0 AS f1
        FROM iagg
    """

    # mSPRT: one moment fold, same closed-form mixture LR with the same
    # exp-cap and lambda-cap guards
    sql["msprt"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type = 'click' AS DOUBLE) AS ia,
                   CAST(event_type = 'view' AS DOUBLE) AS ib
            FROM events
            WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        ),
        m AS (
            SELECT sum(ia) AS na, sum(ib) AS nb,
                   sum(ia * y) AS sa, sum(ib * y) AS sb,
                   sum(ia * y * y) AS qa, sum(ib * y * y) AS qb
            FROM b
        ),
        s AS (
            SELECT na, nb, sa / na - sb / nb AS diff,
                   ((qa - na * (sa / na) * (sa / na))
                    + (qb - nb * (sb / nb) * (sb / nb)))
                       / (na + nb - 2.0) * (1.0 / na + 1.0 / nb) AS vn
            FROM m
        ),
        l AS (
            SELECT na, nb, diff, vn,
                   least(sqrt(vn / (vn + 1.0))
                         * exp(least(diff * diff * 1.0
                                     / (2.0 * vn * (vn + 1.0)), 700.0)),
                         1e12) AS lam
            FROM s
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               round(diff, 6) + 0.0 AS diff, round(vn, 6) + 0.0 AS v_n,
               round(CASE WHEN vn > 0 THEN lam END, 6) + 0.0 AS lambda_n,
               round(CASE WHEN vn > 0 THEN least(1.0, 1.0 / lam) END, 6) + 0.0
                   AS p_value
        FROM l
    """

    # Fellegi-Sunter linkage: blocked join + full-precision weight
    # literals (repr of the engine's math.log2 constants)
    import math as _math

    _wna = repr(_math.log2(0.95 / 0.001))
    _wnd = repr(_math.log2(0.05 / 0.999))
    _wsa = repr(_math.log2(0.9 / 0.2))
    _wsd = repr(_math.log2(0.1 / 0.8))
    sql["fs_link"] = f"""
        WITH l AS (
            SELECT c_custkey AS lid, c_nationkey, c_name, c_mktsegment
            FROM customer
        ),
        r AS (
            SELECT c_custkey + 1000000 AS rid, c_nationkey,
                   CASE WHEN c_custkey % 20 = 0 THEN c_name || 'x'
                        ELSE c_name END AS c_name,
                   c_mktsegment
            FROM customer WHERE c_custkey % 10 = 0
        ),
        p AS (
            SELECT l.lid, r.rid,
                   round(CASE WHEN l.c_name = r.c_name THEN {_wna}
                              ELSE {_wnd} END
                         + CASE WHEN l.c_mktsegment = r.c_mktsegment
                                THEN {_wsa} ELSE {_wsd} END, 6) AS weight,
                   CAST(l.c_name = r.c_name AS INT)
                       + CAST(l.c_mktsegment = r.c_mktsegment AS INT)
                       AS n_agree,
                   2 AS n_known
            FROM l JOIN r ON l.c_nationkey = r.c_nationkey
        )
        SELECT lid, rid, weight + 0.0 AS weight, n_agree, n_known
        FROM p WHERE weight >= 6.0
    """

    # Cox Newton step at beta=0 (w=1): grid + DESC suffix windows +
    # U/I fold + Cramer 2x2 — identical operand order throughout
    sql["cox_step"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS dur,
                   CAST(event_id % 2 AS DOUBLE) AS evt,
                   CAST(user_id % 10 AS DOUBLE) / 10.0 AS x1,
                   CAST(event_id % 7 AS DOUBLE) / 7.0 AS x2
            FROM events WHERE value IS NOT NULL
        ),
        grid AS (
            SELECT dur, count(*) AS n, sum(evt) AS d,
                   sum(evt * x1) AS sx0, sum(evt * x2) AS sx1,
                   CAST(count(*) AS DOUBLE) AS sw,
                   sum(x1) AS swx0, sum(x2) AS swx1,
                   sum(x1 * x1) AS sxx00, sum(x1 * x2) AS sxx01,
                   sum(x2 * x2) AS sxx11
            FROM b GROUP BY dur
        ),
        cum AS (
            SELECT *,
                   sum(sw) OVER w AS s0,
                   sum(swx0) OVER w AS s10, sum(swx1) OVER w AS s11,
                   sum(sxx00) OVER w AS s200, sum(sxx01) OVER w AS s201,
                   sum(sxx11) OVER w AS s211
            FROM grid
            WINDOW w AS (ORDER BY dur DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        f AS (
            SELECT sum(n) AS nr, sum(d) AS ne,
                   sum(CASE WHEN d > 0 THEN sx0 - d * s10 / s0 END) AS u0,
                   sum(CASE WHEN d > 0 THEN sx1 - d * s11 / s0 END) AS u1,
                   sum(CASE WHEN d > 0
                            THEN d * (s200 / s0 - s10 * s10 / (s0 * s0)) END)
                       AS i00,
                   sum(CASE WHEN d > 0
                            THEN d * (s201 / s0 - s10 * s11 / (s0 * s0)) END)
                       AS i01,
                   sum(CASE WHEN d > 0
                            THEN d * (s211 / s0 - s11 * s11 / (s0 * s0)) END)
                       AS i11,
                   sum(CASE WHEN d > 0 THEN 0.0 - d * ln(s0) END) AS ll
            FROM cum
        ),
        sol AS (
            SELECT nr, ne, ll,
                   (i11 * u0 - i01 * u1) / (i00 * i11 - i01 * i01) AS d0,
                   (i00 * u1 - i01 * u0) / (i00 * i11 - i01 * i01) AS d1
            FROM f
        )
        SELECT t.term,
               CASE t.term WHEN 'x1' THEN round(d0, 6)
                           WHEN 'x2' THEN round(d1, 6)
                           WHEN 'n_rows' THEN CAST(nr AS DOUBLE)
                           WHEN 'n_events' THEN CAST(ne AS DOUBLE)
                           ELSE round(ll, 6) END + 0.0 AS value
        FROM sol,
             (VALUES ('x1'), ('x2'), ('n_rows'), ('n_events'),
                     ('loglik')) t(term)
    """

    # Fellegi-Sunter EM round: likelihood-ratio literals COMPUTED
    # (0.8/0.1 etc.), identical posterior-weight arithmetic, one fold
    sql["fs_em_round"] = """
        WITH l AS (
            SELECT c_custkey AS lid, c_nationkey, c_name, c_mktsegment
            FROM customer
        ),
        r AS (
            SELECT c_custkey + 1000000 AS rid, c_nationkey AS rnat,
                   CASE WHEN c_custkey % 20 = 0 THEN c_name || 'x'
                        ELSE c_name END AS rname,
                   c_mktsegment AS rseg
            FROM customer WHERE c_custkey % 10 = 0
        ),
        pr AS (
            SELECT l.c_name = r.rname AS a_name,
                   l.c_mktsegment = r.rseg AS a_seg
            FROM l JOIN r ON l.c_nationkey = r.rnat
        ),
        g AS (
            SELECT a_name, a_seg,
                   0.01 * ((CASE WHEN a_name THEN 0.8 / 0.1
                                 ELSE (1 - 0.8) / (1 - 0.1) END)
                           * (CASE WHEN a_seg THEN 0.8 / 0.2
                                   ELSE (1 - 0.8) / (1 - 0.2) END))
                   / (0.01 * ((CASE WHEN a_name THEN 0.8 / 0.1
                                    ELSE (1 - 0.8) / (1 - 0.1) END)
                              * (CASE WHEN a_seg THEN 0.8 / 0.2
                                      ELSE (1 - 0.8) / (1 - 0.2) END))
                      + (1 - 0.01)) AS gw
            FROM pr
        ),
        f AS (
            SELECT count(*) AS n, sum(gw) AS sg,
                   sum(CASE WHEN a_name THEN gw END) AS ga_name,
                   sum(gw) AS gk_name,
                   sum(CASE WHEN a_name THEN 1.0 - gw END) AS ua_name,
                   sum(1.0 - gw) AS uk_name,
                   sum(CASE WHEN a_seg THEN gw END) AS ga_seg,
                   sum(CASE WHEN a_seg THEN 1.0 - gw END) AS ua_seg
            FROM g
        )
        SELECT t.term,
               round(CASE t.term
                     WHEN 'm_name' THEN ga_name / gk_name
                     WHEN 'u_name' THEN ua_name / uk_name
                     WHEN 'm_seg' THEN ga_seg / gk_name
                     WHEN 'u_seg' THEN ua_seg / uk_name
                     WHEN 'p' THEN sg / n
                     WHEN 'n_pairs' THEN CAST(n AS DOUBLE)
                     ELSE sg END, 6) + 0.0 AS value
        FROM f,
             (VALUES ('m_name'), ('u_name'), ('m_seg'), ('u_seg'),
                     ('p'), ('n_pairs'), ('expected_matches')) t(term)
    """

    # table diff: same v2 construction, full-outer join, per-column
    # NULL-safe equality counts, rows spine via VALUES
    sql["table_diff"] = """
        WITH l AS (
            SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        ),
        r AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                        ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % 50 <> 0
            UNION ALL
            SELECT c_custkey + 3000000, c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 97 = 0
        ),
        j AS (
            SELECT l.c_custkey AS lk, r.c_custkey AS rk,
                   l.c_acctbal AS la, r.c_acctbal AS ra,
                   l.c_mktsegment AS ls, r.c_mktsegment AS rs
            FROM l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey
        ),
        f AS (
            SELECT sum(CASE WHEN lk IS NOT NULL THEN 1 ELSE 0 END) AS nl,
                   sum(CASE WHEN rk IS NOT NULL THEN 1 ELSE 0 END) AS nr,
                   sum(CASE WHEN lk IS NOT NULL AND rk IS NULL
                            THEN 1 ELSE 0 END) AS nrem,
                   sum(CASE WHEN lk IS NULL AND rk IS NOT NULL
                            THEN 1 ELSE 0 END) AS nadd,
                   sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
                            THEN 1 ELSE 0 END) AS nmatch,
                   sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
                             AND la IS NOT DISTINCT FROM ra
                            THEN 1 ELSE 0 END) AS eq_bal,
                   sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
                             AND ls IS NOT DISTINCT FROM rs
                            THEN 1 ELSE 0 END) AS eq_seg
            FROM j
        )
        SELECT t.col AS "column",
               CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
               CAST(nadd AS BIGINT) AS n_added,
               CAST(nrem AS BIGINT) AS n_removed,
               CAST(CASE t.col WHEN '__rows__' THEN NULL
                               WHEN 'c_acctbal' THEN nmatch - eq_bal
                               ELSE nmatch - eq_seg END AS BIGINT) AS n_changed,
               CAST(CASE t.col WHEN '__rows__' THEN NULL
                               WHEN 'c_acctbal' THEN eq_bal
                               ELSE eq_seg END AS BIGINT) AS n_unchanged
        FROM f, (VALUES ('__rows__'), ('c_acctbal'), ('c_mktsegment')) t(col)
    """

    # FD check: one distinct-count groupBy + bounded fold
    sql["fd_violations"] = """
        WITH g AS (
            SELECT lang,
                   count(DISTINCT coalesce(CAST(source AS VARCHAR),
                                           chr(0) || '__null__'))
                       AS n_rhs_values,
                   count(*) AS n_rows
            FROM documents GROUP BY lang
        )
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_rhs_values > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violating_groups,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN n_rhs_values > 1 THEN n_rows ELSE 0 END)
                    AS BIGINT) AS n_violating_rows,
               sum(CASE WHEN n_rhs_values > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM g
    """

    # proximity join: quadratic haversine oracle with the engine's exact
    # radian constant (repr of math.pi/180) and the same asin/least guard
    import math as _m2

    _rad = repr(_m2.pi / 180.0)
    sql["proximity_join"] = f"""
        WITH pts AS (
            SELECT event_id,
                   CAST(event_id % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
                   CAST((event_id * 7 + user_id) % 3400 AS DOUBLE) / 10.0
                       - 170.0 AS lon
            FROM events
        ),
        l AS (SELECT event_id AS lid, lat, lon FROM pts WHERE event_id % 97 = 0),
        r AS (SELECT event_id AS rid, lat, lon FROM pts WHERE event_id % 13 = 1),
        d AS (
            SELECT l.lid, r.rid,
                   round(2.0 * 6371.0088 * asin(sqrt(least(
                       sin((r.lat - l.lat) * {_rad} / 2.0)
                           * sin((r.lat - l.lat) * {_rad} / 2.0)
                       + cos(l.lat * {_rad}) * cos(r.lat * {_rad})
                           * sin((r.lon - l.lon) * {_rad} / 2.0)
                           * sin((r.lon - l.lon) * {_rad} / 2.0),
                       1.0))), 6) AS distance_km
            FROM l, r
        )
        SELECT lid, rid, distance_km + 0.0 AS distance_km
        FROM d WHERE distance_km <= 150.0
    """

    # DP releases: identical md5 inverse-CDF Laplace (ln is IEEE-portable)
    _LAP = (
        "-({b}) * sign((CAST(('0x' || substr(md5({key} || '#dp42'), 1, 15)) "
        "AS BIGINT) % 1000000000) / 1000000000.0 - 0.5) "
        "* ln(greatest(1.0 - 2.0 * abs((CAST(('0x' || substr(md5({key} "
        "|| '#dp42'), 1, 15)) AS BIGINT) % 1000000000) / 1000000000.0 - 0.5), "
        "1e-12))"
    )
    sql["dp_counts"] = f"""
        WITH c AS (
            SELECT event_type, count(*) AS n FROM events GROUP BY 1
        )
        SELECT event_type,
               round(greatest(CAST(n AS DOUBLE)
                              + {_LAP.format(b='1.0', key='event_type')},
                              0.0), 6) + 0.0 AS n_noisy,
               1.0 AS epsilon
        FROM c
    """
    sql["dp_mean"] = f"""
        WITH a AS (
            SELECT event_type,
                   sum(least(greatest(CAST(value AS DOUBLE), 0.0), 500.0))
                       AS s,
                   count(*) AS n
            FROM events WHERE value IS NOT NULL GROUP BY 1
        )
        SELECT event_type,
               round(least(greatest(
                   (s + {_LAP.format(b='500.0', key="event_type || '#sum'")})
                   / greatest(CAST(n AS DOUBLE)
                              + {_LAP.format(b='1.0', key="event_type || '#cnt'")},
                              1.0),
                   0.0), 500.0), 6) + 0.0 AS mean_noisy,
               2.0 AS epsilon
        FROM a
    """

    # Wasserstein-1: same count-table → CDF → gap integral
    sql["wasserstein"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type = 'click' AS BIGINT) AS ia
            FROM events
            WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
        ),
        c AS (
            SELECT y, sum(ia) AS na, sum(1 - ia) AS nb FROM b GROUP BY 1
        ),
        r AS (
            SELECT y,
                   sum(na) OVER (ORDER BY y) AS ca,
                   sum(nb) OVER (ORDER BY y) AS cb,
                   lead(y) OVER (ORDER BY y) AS ynext
            FROM c
        ),
        t AS (SELECT CAST(sum(na) AS DOUBLE) AS nat,
                     CAST(sum(nb) AS DOUBLE) AS nbt FROM c)
        SELECT CAST(t.nat AS BIGINT) AS n_a, CAST(t.nbt AS BIGINT) AS n_b,
               round(sum(abs(CAST(ca AS DOUBLE) / t.nat
                             - CAST(cb AS DOUBLE) / t.nbt)
                         * (ynext - y)), 6) + 0.0 AS w1
        FROM r, t
        WHERE ynext IS NOT NULL
        GROUP BY t.nat, t.nbt
    """

    # Mahalanobis: refit from the same moments (cov rounded 6), 2x2
    # closed-form inverse rounded 6, identical scoring expression order
    sql["mahalanobis"] = """
        WITH b AS (
            SELECT event_id, CAST(value AS DOUBLE) AS x1,
                   CAST(user_id % 100 AS DOUBLE) AS x2
            FROM events WHERE value IS NOT NULL
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(x1) AS s1, sum(x2) AS s2,
                   sum(x1 * x1) AS q11, sum(x1 * x2) AS q12,
                   sum(x2 * x2) AS q22
            FROM b
        ),
        cv AS (
            SELECT round(s1 / n, 6) AS m1, round(s2 / n, 6) AS m2,
                   round((q11 - s1 * s1 / n) / (n - 1.0), 6) AS c11,
                   round((q12 - s1 * s2 / n) / (n - 1.0), 6) AS c12,
                   round((q22 - s2 * s2 / n) / (n - 1.0), 6) AS c22
            FROM m
        ),
        iv AS (
            SELECT m1, m2,
                   round(c22 / (c11 * c22 - c12 * c12), 6) AS i11,
                   round(-c12 / (c11 * c22 - c12 * c12), 6) AS i12,
                   round(c11 / (c11 * c22 - c12 * c12), 6) AS i22
            FROM cv
        )
        SELECT b.event_id,
               round(0.0 + iv.i11 * (b.x1 - iv.m1) * (b.x1 - iv.m1)
                         + iv.i12 * (b.x1 - iv.m1) * (b.x2 - iv.m2)
                         + iv.i12 * (b.x2 - iv.m2) * (b.x1 - iv.m1)
                         + iv.i22 * (b.x2 - iv.m2) * (b.x2 - iv.m2), 6)
                   + 0.0 AS mahalanobis
        FROM b, iv
    """

    # stratified ATT/ATE: same md5 design, quantile_cont edges rounded 6,
    # same per-stratum fold and drop convention
    sql["stratified_att"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE)
                       + 5.0 * CASE WHEN (CAST(('0x' || substr(md5(
                             CAST(event_id AS VARCHAR) || '#7'), 1, 15))
                             AS BIGINT) % 1000000000) / 1000000000.0
                           < 0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0)
                         THEN 1.0 ELSE 0.0 END AS y,
                   CASE WHEN (CAST(('0x' || substr(md5(
                             CAST(event_id AS VARCHAR) || '#7'), 1, 15))
                             AS BIGINT) % 1000000000) / 1000000000.0
                           < 0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0)
                        THEN 1.0 ELSE 0.0 END AS t,
                   0.2 + 0.6 * (CAST(user_id % 10 AS DOUBLE) / 10.0) AS p
            FROM events WHERE value IS NOT NULL
        ),
        e AS (
            SELECT round(quantile_cont(p, 0.2), 6) AS e1,
                   round(quantile_cont(p, 0.4), 6) AS e2,
                   round(quantile_cont(p, 0.6), 6) AS e3,
                   round(quantile_cont(p, 0.8), 6) AS e4
            FROM b
        ),
        g AS (
            SELECT CAST(p > e.e1 AS INT) + CAST(p > e.e2 AS INT)
                       + CAST(p > e.e3 AS INT) + CAST(p > e.e4 AS INT) AS k,
                   sum(t) AS nt, sum(1.0 - t) AS nc,
                   sum(t * y) AS st, sum((1.0 - t) * y) AS sc
            FROM b, e GROUP BY 1
        ),
        f AS (
            SELECT sum(nt + nc) AS n, count(*) AS ks,
                   sum(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END) AS ku,
                   sum(CASE WHEN nt > 0 AND nc > 0 THEN nt END) AS ntu,
                   sum(CASE WHEN nt > 0 AND nc > 0 THEN nt + nc END) AS nu,
                   sum(CASE WHEN nt > 0 AND nc > 0
                            THEN nt * (st / nt - sc / nc) END) AS wt,
                   sum(CASE WHEN nt > 0 AND nc > 0
                            THEN (nt + nc) * (st / nt - sc / nc) END) AS wa,
                   sum(CASE WHEN NOT (nt > 0 AND nc > 0)
                            THEN nt ELSE 0.0 END) AS dropped
            FROM g
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(5 AS BIGINT) AS n_strata,
               CAST(ku AS BIGINT) AS n_strata_used,
               round(wt / ntu, 6) + 0.0 AS att,
               round(wa / nu, 6) + 0.0 AS ate,
               CAST(dropped AS BIGINT) AS n_treat_dropped
        FROM f
    """

    # SCD2: identical lag/cumsum/groupBy/lead chain per entity
    sql["scd2_history"] = """
        WITH l AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        m AS (
            SELECT *,
                   sum(CASE WHEN prev_ts IS NULL
                             OR event_type IS DISTINCT FROM prev
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS vid
            FROM l
        ),
        p AS (
            SELECT user_id, vid, min(ts) AS valid_from,
                   min(event_type) AS event_type,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM m GROUP BY 1, 2
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY vid)
                   AS valid_to,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY vid)
                   IS NULL AS is_current,
               n_rows
        FROM p
    """

    # Durbin-Watson: one lag window + one grouped moment fold
    sql["durbin_watson"] = """
        WITH b AS (
            SELECT user_id, CAST(value AS DOUBLE) AS x,
                   CAST(value AS DOUBLE)
                       - lag(CAST(value AS DOUBLE))
                             OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS d
            FROM events WHERE value IS NOT NULL
        ),
        g AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
                   sum(x) AS s, sum(x * x) AS q, sum(d * d) AS dd
            FROM b GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(CASE WHEN n > 1 AND q - s * s / n > 0
                          THEN dd / (q - s * s / n) END, 6) + 0.0 AS dw
        FROM g
    """

    # Ljung-Box: the acf_features cross-moment chain, lags rounded to 6
    # BEFORE entering Q (the engine composes on acf_features output)
    sql["ljung_box"] = """
        WITH b AS (
            SELECT user_id, CAST(value AS DOUBLE) AS x,
                   lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
                   lag(CAST(value AS DOUBLE), 2) OVER w AS l2,
                   lag(CAST(value AS DOUBLE), 3) OVER w AS l3
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        m AS (
            SELECT user_id,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(x) AS s1, sum(x * x) AS s2,
                   CAST(count(l1) AS DOUBLE) AS m1, sum(x * l1) AS cxy1,
                   sum(CASE WHEN l1 IS NOT NULL THEN x END) AS ca1,
                   sum(l1) AS cb1,
                   CAST(count(l2) AS DOUBLE) AS m2, sum(x * l2) AS cxy2,
                   sum(CASE WHEN l2 IS NOT NULL THEN x END) AS ca2,
                   sum(l2) AS cb2,
                   CAST(count(l3) AS DOUBLE) AS m3, sum(x * l3) AS cxy3,
                   sum(CASE WHEN l3 IS NOT NULL THEN x END) AS ca3,
                   sum(l3) AS cb3
            FROM b GROUP BY 1
        ),
        a AS (
            SELECT user_id, n,
                   round(CASE WHEN m1 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                       (cxy1 - s1 / n * (ca1 + cb1) + m1 * (s1 / n) * (s1 / n))
                           / (s2 - s1 * s1 / n) END, 6) AS r1,
                   round(CASE WHEN m2 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                       (cxy2 - s1 / n * (ca2 + cb2) + m2 * (s1 / n) * (s1 / n))
                           / (s2 - s1 * s1 / n) END, 6) AS r2,
                   round(CASE WHEN m3 >= 1 AND s2 - s1 * s1 / n > 0 THEN
                       (cxy3 - s1 / n * (ca3 + cb3) + m3 * (s1 / n) * (s1 / n))
                           / (s2 - s1 * s1 / n) END, 6) AS r3
            FROM m
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(n * (n + 2.0) * (0.0 + r1 * r1 / (n - 1.0)
                                          + r2 * r2 / (n - 2.0)
                                          + r3 * r3 / (n - 3.0)), 6) + 0.0
                   AS q_stat,
               CAST(3 AS BIGINT) AS dof
        FROM a
    """

    # Kruskal-Wallis: joint average ranks + per-group rank sums + the
    # tie-corrected H fold
    sql["kruskal_wallis"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type AS VARCHAR) AS g
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        c AS (SELECT y, count(*) AS n FROM b GROUP BY 1),
        r AS (
            SELECT y, n, sum(n) OVER (ORDER BY y) AS ncum FROM c
        ),
        rk AS (
            SELECT y,
                   CAST(ncum - n AS DOUBLE) + (CAST(n AS DOUBLE) + 1) / 2 AS r
            FROM r
        ),
        vg AS (SELECT y, g, count(*) AS ccount FROM b GROUP BY 1, 2),
        pg AS (
            SELECT vg.g, sum(ccount) AS ng,
                   sum(CAST(ccount AS DOUBLE) * rk.r) AS rg
            FROM vg JOIN rk USING (y) GROUP BY 1
        ),
        ties AS (
            SELECT sum(CAST(n AS DOUBLE) * n * n - n) AS t FROM c
        ),
        f AS (
            SELECT sum(ng) AS nt, count(*) AS k,
                   sum(rg * rg / CAST(ng AS DOUBLE)) AS rr
            FROM pg
        )
        SELECT CAST(f.nt AS BIGINT) AS n, CAST(f.k AS BIGINT) AS k,
               round(CASE WHEN 1.0 - ties.t
                              / (CAST(f.nt AS DOUBLE) * f.nt * f.nt - f.nt) > 0
                     THEN (12.0 / (CAST(f.nt AS DOUBLE) * (f.nt + 1.0)) * f.rr
                           - 3.0 * (CAST(f.nt AS DOUBLE) + 1.0))
                          / (1.0 - ties.t
                             / (CAST(f.nt AS DOUBLE) * f.nt * f.nt - f.nt))
                     END, 6) + 0.0 AS h_stat,
               CAST(f.k - 1 AS BIGINT) AS dof
        FROM f, ties
    """

    # Levene/Brown-Forsythe: rounded per-group medians, one z-moment
    # pass, bounded F fold
    sql["levene_test"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type AS VARCHAR) AS g
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        cen AS (SELECT g, round(quantile_cont(y, 0.5), 6) AS c FROM b GROUP BY 1),
        z AS (
            SELECT b.g, abs(b.y - cen.c) AS z
            FROM b JOIN cen USING (g)
        ),
        pg AS (
            SELECT g, count(*) AS n, sum(z) AS s, sum(z * z) AS q
            FROM z GROUP BY 1
        ),
        f AS (
            SELECT sum(n) AS nt, count(*) AS k, sum(s) AS st,
                   sum(s * s / CAST(n AS DOUBLE)) AS bg,
                   sum(q - s * s / CAST(n AS DOUBLE)) AS wg
            FROM pg
        )
        SELECT CAST(nt AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               round(CASE WHEN wg > 0 THEN
                   ((bg - st * st / CAST(nt AS DOUBLE))
                        / (CAST(k AS DOUBLE) - 1.0))
                   / (wg / (CAST(nt AS DOUBLE) - k)) END, 6) + 0.0 AS f_stat,
               CAST(k - 1 AS BIGINT) AS dof1,
               CAST(nt - k AS BIGINT) AS dof2
        FROM f
    """

    # Yuen trimmed t: rounded band quantiles, winsorized moments,
    # identical trimmed-sum reconstruction and Welch-Satterthwaite dof
    sql["yuen_test"] = """
        WITH b AS (
            SELECT CAST(value AS DOUBLE) AS y,
                   CAST(event_type AS VARCHAR) AS g
            FROM events
            WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        ),
        q AS (
            SELECT g, round(quantile_cont(y, 0.2), 6) AS lo,
                   round(quantile_cont(y, 0.8), 6) AS hi
            FROM b GROUP BY 1
        ),
        w AS (
            SELECT b.g, least(greatest(b.y, q.lo), q.hi) AS wv, q.lo, q.hi
            FROM b JOIN q USING (g)
        ),
        agg AS (
            SELECT g, CAST(count(*) AS DOUBLE) AS n, max(lo) AS lo,
                   max(hi) AS hi, sum(wv) AS ws, sum(wv * wv) AS wq
            FROM w GROUP BY 1
        ),
        st AS (
            SELECT g, n, floor(0.2 * n) AS gc, n - 2 * floor(0.2 * n) AS h,
                   (ws - floor(0.2 * n) * (lo + hi))
                       / (n - 2 * floor(0.2 * n)) AS tmean,
                   ((wq - n * (ws / n) * (ws / n)) / (n - 1.0)) * (n - 1.0)
                       / ((n - 2 * floor(0.2 * n))
                          * (n - 2 * floor(0.2 * n) - 1.0)) AS d
            FROM agg
        ),
        pv AS (
            SELECT max(CASE WHEN g = 'click' THEN n END) AS na,
                   max(CASE WHEN g = 'view' THEN n END) AS nb,
                   max(CASE WHEN g = 'click' THEN h END) AS ha,
                   max(CASE WHEN g = 'view' THEN h END) AS hb,
                   max(CASE WHEN g = 'click' THEN tmean END) AS ta,
                   max(CASE WHEN g = 'view' THEN tmean END) AS tb,
                   max(CASE WHEN g = 'click' THEN d END) AS da,
                   max(CASE WHEN g = 'view' THEN d END) AS db
            FROM st
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(ha AS BIGINT) AS h_a, CAST(hb AS BIGINT) AS h_b,
               round(ta, 6) + 0.0 AS tmean_a, round(tb, 6) + 0.0 AS tmean_b,
               round(ta - tb, 6) + 0.0 AS diff,
               round(CASE WHEN da + db > 0
                          THEN (ta - tb) / sqrt(da + db) END, 6) + 0.0
                   AS t_stat,
               round(CASE WHEN da > 0 OR db > 0
                          THEN (da + db) * (da + db)
                               / (da * da / (ha - 1.0)
                                  + db * db / (hb - 1.0)) END, 6) + 0.0
                   AS dof
        FROM pv
    """

    # EB shrinkage: identical method-of-moments hyperparameters (rounded
    # AFTER tau2 is formed from unrounded sig2/mu), identical weights
    sql["eb_shrink"] = """
        WITH b AS (
            SELECT CAST(user_id % 37 AS VARCHAR) AS g,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        per AS (
            SELECT g, count(*) AS n, sum(y) AS s, sum(y * y) AS q
            FROM b GROUP BY 1
        ),
        h AS (
            SELECT CAST(sum(n) AS DOUBLE) AS nt,
                   CAST(count(*) AS DOUBLE) AS gk,
                   sum(s) AS st,
                   sum(CASE WHEN n >= 2
                            THEN q - s * s / CAST(n AS DOUBLE) END) AS sswok,
                   sum(CASE WHEN n >= 2 THEN CAST(n AS DOUBLE) - 1.0 END)
                       AS dofok,
                   sum(s * s / CAST(n AS DOUBLE)) AS bg
            FROM per
        ),
        p AS (
            SELECT round(st / nt, 6) AS mu,
                   round(sswok / dofok, 6) AS sig2,
                   round(greatest(0.0,
                       (bg - nt * (st / nt) * (st / nt)) / nt
                       - (sswok / dofok) * gk / nt), 6) AS tau2
            FROM h
        )
        SELECT per.g AS "group", CAST(per.n AS BIGINT) AS n,
               round(per.s / per.n, 6) + 0.0 AS mean,
               round(CASE WHEN p.tau2 + p.sig2 / per.n > 0
                          THEN (p.tau2 / (p.tau2 + p.sig2 / per.n))
                                   * (per.s / per.n)
                               + (1.0 - p.tau2 / (p.tau2 + p.sig2 / per.n))
                                   * p.mu
                          ELSE 1.0 * (per.s / per.n) END, 6) + 0.0 AS shrunk,
               round(CASE WHEN p.tau2 + p.sig2 / per.n > 0
                          THEN p.tau2 / (p.tau2 + p.sig2 / per.n)
                          ELSE 1.0 END, 6) + 0.0 AS weight
        FROM per, p
    """

    # calibration report: identical md5 score/label plant, binned
    # moments, identical fold operand order
    _CS_U = ("(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '{t}'), "
             "1, 15)) AS BIGINT) % 1000000000) / 1000000000.0")
    sql["calibration_report"] = f"""
        WITH b AS (
            SELECT {_CS_U.format(t='#cs')} AS p,
                   CASE WHEN {_CS_U.format(t='#cy')}
                           < 0.1 + 0.8 * ({_CS_U.format(t='#cs')})
                        THEN 1.0 ELSE 0.0 END AS y
            FROM events
        ),
        per AS (
            SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
                   CAST(count(*) AS DOUBLE) AS n, sum(p) AS sp, sum(y) AS sy,
                   sum((p - y) * (p - y)) AS sq, sum(p * p) AS spp
            FROM b GROUP BY 1
        ),
        t AS (SELECT sum(n) AS nt, sum(sy) AS syt FROM per),
        f AS (
            SELECT max(t.nt) AS n_all,
                   sum(sq) AS brier_num,
                   sum(n * (sp / n - sy / n) * (sp / n - sy / n)) AS rel,
                   sum(n * (sy / n - t.syt / t.nt)
                         * (sy / n - t.syt / t.nt)) AS res,
                   max(t.syt / t.nt) AS ybar,
                   sum(n * abs(sp / n - sy / n)) AS ece_num,
                   max(abs(sp / n - sy / n)) AS mce,
                   sum(spp - sp * sp / n) AS wv
            FROM per, t
        )
        SELECT CAST(n_all AS BIGINT) AS n, CAST(10 AS BIGINT) AS n_bins,
               round(brier_num / n_all, 6) + 0.0 AS brier,
               round(rel / n_all, 6) + 0.0 AS reliability,
               round(res / n_all, 6) + 0.0 AS resolution,
               round(ybar * (1.0 - ybar), 6) + 0.0 AS uncertainty,
               round(wv / n_all, 6) + 0.0 AS within_bin_variance,
               round(ece_num / n_all, 6) + 0.0 AS ece,
               round(mce, 6) + 0.0 AS mce
        FROM f
    """

    # Fleiss kappa: three md5 raters, per-item agreement, global shares
    _FK_U = ("(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '{t}'), "
             "1, 15)) AS BIGINT) % 1000000000) / 1000000000.0")
    _FK_R = ("SELECT event_id AS item, CASE WHEN " + "{u}" + " < 0.75 "
             "THEN CAST(event_type AS VARCHAR) ELSE 'view' END AS label "
             "FROM events")
    sql["fleiss_kappa"] = f"""
        WITH ratings AS (
            {_FK_R.format(u=_FK_U.format(t='#r1'))}
            UNION ALL {_FK_R.format(u=_FK_U.format(t='#r2'))}
            UNION ALL {_FK_R.format(u=_FK_U.format(t='#r3'))}
        ),
        counts AS (
            SELECT item, label, count(*) AS n FROM ratings
            WHERE item IS NOT NULL AND label IS NOT NULL GROUP BY 1, 2
        ),
        per AS (
            SELECT item, sum(n) AS r,
                   sum(CAST(n AS DOUBLE) * (n - 1)) AS agree
            FROM counts GROUP BY 1
        ),
        top AS (
            SELECT count(*) AS ni, sum(r) AS nr,
                   avg(agree / (CAST(r AS DOUBLE) * (r - 1))) AS pbar
            FROM per WHERE r >= 2
        ),
        sh AS (
            SELECT c.label, sum(c.n) AS nc
            FROM counts c JOIN per ON per.item = c.item
            WHERE per.r >= 2 GROUP BY 1
        ),
        pe AS (SELECT sum(CAST(nc AS DOUBLE) * nc) AS num,
                      count(*) AS k FROM sh)
        SELECT CAST(top.ni AS BIGINT) AS n_items,
               CAST(top.nr AS BIGINT) AS n_ratings,
               CAST(pe.k AS BIGINT) AS n_categories,
               CAST((SELECT count(*) FROM per WHERE r < 2) AS BIGINT)
                   AS n_items_skipped,
               round(top.pbar, 6) + 0.0 AS p_bar,
               round(pe.num / (CAST(top.nr AS DOUBLE) * top.nr), 6) + 0.0
                   AS p_e,
               round(CASE WHEN pe.num / (CAST(top.nr AS DOUBLE) * top.nr) < 1.0
                          THEN (top.pbar
                                - pe.num / (CAST(top.nr AS DOUBLE) * top.nr))
                               / (1.0 - pe.num
                                  / (CAST(top.nr AS DOUBLE) * top.nr)) END,
                     6) + 0.0 AS kappa
        FROM top, pe
    """

    # Cronbach alpha: three md5-noise probes, one moment fold
    _CA_P = ("CAST(value AS DOUBLE) + 20.0 * ((CAST(('0x' || substr(md5("
             "CAST(event_id AS VARCHAR) || '{t}'), 1, 15)) AS BIGINT) "
             "% 1000000000) / 1000000000.0 - 0.5)")
    sql["cronbach_alpha"] = f"""
        WITH b AS (
            SELECT {_CA_P.format(t='#m1')} AS m1,
                   {_CA_P.format(t='#m2')} AS m2,
                   {_CA_P.format(t='#m3')} AS m3
            FROM events WHERE value IS NOT NULL
        ),
        f AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(m1) AS s1, sum(m1 * m1) AS q1,
                   sum(m2) AS s2, sum(m2 * m2) AS q2,
                   sum(m3) AS s3, sum(m3 * m3) AS q3,
                   sum(m1 + m2 + m3) AS st,
                   sum((m1 + m2 + m3) * (m1 + m2 + m3)) AS qt
            FROM b
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k,
               round((q1 - s1 * s1 / n) / (n - 1.0)
                     + (q2 - s2 * s2 / n) / (n - 1.0)
                     + (q3 - s3 * s3 / n) / (n - 1.0), 6) + 0.0
                   AS sum_item_var,
               round((qt - st * st / n) / (n - 1.0), 6) + 0.0 AS total_var,
               round(CASE WHEN n > 1 AND (qt - st * st / n) / (n - 1.0) > 0
                     THEN (3.0 / 2.0)
                          * (1.0 - ((q1 - s1 * s1 / n) / (n - 1.0)
                                    + (q2 - s2 * s2 / n) / (n - 1.0)
                                    + (q3 - s3 * s3 / n) / (n - 1.0))
                                   / ((qt - st * st / n) / (n - 1.0))) END,
                     6) + 0.0 AS alpha
        FROM f
    """

    # RMST: the KM oracle chain + rounded-survival area fold
    _km_body = sql["kaplan_meier"].rsplit(
        "SELECT cohort, t, n_risk, n_event, n_censored,", 1
    )[0]
    sql["rmst"] = _km_body + """, km AS (
            SELECT cohort, t, n_risk, n_event,
                   round(CASE WHEN zc = 1 THEN 0.0 ELSE exp(sl) END, 6) AS s
            FROM curve
        ),
        seg AS (
            SELECT cohort,
                   s * (least(coalesce(lead(t) OVER w, 1000000.0), 1000000.0)
                        - least(t, 1000000.0))
                   + CASE WHEN row_number() OVER w = 1
                          THEN least(t, 1000000.0) ELSE 0.0 END AS seg,
                   n_event,
                   CASE WHEN row_number() OVER w = 1 THEN n_risk END AS n0
            FROM km
            WINDOW w AS (PARTITION BY cohort ORDER BY t)
        )
        SELECT cohort, 1000000.0 AS tau,
               CAST(max(n0) AS BIGINT) AS n,
               CAST(sum(n_event) AS BIGINT) AS n_events,
               round(sum(seg), 6) + 0.0 AS rmst
        FROM seg GROUP BY cohort
    """

    # Cohen's kappa: contingency + marginals + chance-corrected fold
    sql["cohen_kappa"] = """
        WITH b AS (
            SELECT CAST(event_type AS VARCHAR) AS ra,
                   CASE WHEN event_id % 5 = 0 THEN 'view'
                        ELSE CAST(event_type AS VARCHAR) END AS rb
            FROM events
            WHERE event_type IS NOT NULL
        ),
        cont AS (SELECT ra, rb, count(*) AS o FROM b GROUP BY 1, 2),
        ma AS (SELECT ra, sum(o) AS na FROM cont GROUP BY 1),
        mb AS (SELECT rb, sum(o) AS nb FROM cont GROUP BY 1),
        t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cont),
        po AS (
            SELECT coalesce(sum(o), 0) AS agree FROM cont WHERE ra = rb
        ),
        pe AS (
            SELECT sum(CAST(na AS DOUBLE) * nb) AS num
            FROM ma JOIN mb ON ma.ra = mb.rb
        ),
        kc AS (
            SELECT count(*) AS k FROM (
                SELECT ra AS v FROM cont UNION SELECT rb FROM cont
            )
        )
        SELECT CAST(t.n AS BIGINT) AS n, CAST(kc.k AS BIGINT) AS n_categories,
               round(po.agree / t.n, 6) + 0.0 AS p_observed,
               round(pe.num / (t.n * t.n), 6) + 0.0 AS p_expected,
               round(CASE WHEN pe.num / (t.n * t.n) < 1.0
                          THEN (po.agree / t.n - pe.num / (t.n * t.n))
                               / (1.0 - pe.num / (t.n * t.n)) END, 6) + 0.0
                   AS kappa
        FROM t, po, pe, kc
    """

    # McNemar: one discordant-count fold, continuity-corrected
    sql["mcnemar"] = """
        WITH b AS (
            SELECT CAST(event_id % 2 AS DOUBLE) AS x,
                   CASE WHEN event_id % 7 = 0
                        THEN 1.0 - (event_id % 2)
                        ELSE CAST(event_id % 2 AS DOUBLE) END AS y
            FROM events
        ),
        f AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN x = 1.0 AND y = 0.0 THEN 1 ELSE 0 END) AS b10,
                   sum(CASE WHEN x = 0.0 AND y = 1.0 THEN 1 ELSE 0 END) AS c01
            FROM b
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(b10 AS BIGINT) AS n_10,
               CAST(c01 AS BIGINT) AS n_01,
               round(CASE WHEN b10 + c01 > 0 THEN
                   (abs(CAST(b10 AS DOUBLE) - c01) - 1.0)
                       * (abs(CAST(b10 AS DOUBLE) - c01) - 1.0)
                       / (CAST(b10 AS DOUBLE) + c01) END, 6) + 0.0 AS chi2
        FROM f
    """

    # quantile regression round: |r|-branch weights, shared Cramer 3x3;
    # the weighted target is y (not z), so sy/s1y/s2y carry w*y
    sql["quantile_step"] = f"""
        WITH feats AS (
            SELECT event_id, ts, CAST(value AS DOUBLE) AS yv,
                   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS l1,
                   lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS l2
            FROM events
        ),
        d0 AS (
            SELECT * FROM feats
            WHERE l1 IS NOT NULL AND l2 IS NOT NULL AND yv IS NOT NULL
        ),
        m AS (
            SELECT yv, l1, l2,
                   yv - ({_IRLS_B0[0]} + {_IRLS_B0[1]} * l1
                         + ({_IRLS_B0[2]}) * l2) AS r
            FROM d0
        ),
        wts AS (
            SELECT yv, l1, l2,
                   CASE WHEN r > 0 THEN 0.5 / greatest(abs(r), 0.001)
                        ELSE (1.0 - 0.5) / greatest(abs(r), 0.001) END AS w,
                   CASE WHEN r > 0 THEN 0.5 * r ELSE (0.5 - 1.0) * r END
                       AS pin
            FROM m
        ),
        s AS (
            SELECT sum(w) AS n,
                   sum(w * l1) AS s1, sum(w * l2) AS s2,
                   sum(w * l1 * l1) AS s11, sum(w * l1 * l2) AS s12,
                   sum(w * l2 * l2) AS s22,
                   sum(w * yv) AS sy, sum(w * l1 * yv) AS s1y,
                   sum(w * l2 * yv) AS s2y,
                   sum(pin) AS loss
            FROM wts
        ),
        {_cramer3_cte()}
        SELECT t.term,
               round(CASE t.term WHEN 'intercept' THEN beta.b0
                                 WHEN 'pinball_loss' THEN s.loss
                                 WHEN 'value_lag_1' THEN beta.b1
                                 ELSE beta.b2 END, 6) AS value
        FROM beta, s,
             (VALUES ('intercept'), ('pinball_loss'),
                     ('value_lag_1'), ('value_lag_2')) t(term)
    """

    # dispersion: per-user counts -> one moment fold
    sql["dispersion"] = """
        WITH c AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        f AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, sum(y) AS s,
                   sum(y * y) AS q
            FROM c
        )
        SELECT CAST(n AS BIGINT) AS n,
               round(s / n, 6) + 0.0 AS mean,
               round(CASE WHEN n > 1
                          THEN (q - s * s / n) / (n - 1.0) END, 6) + 0.0
                   AS var,
               round(CASE WHEN s / n > 0 THEN
                   ((q - s * s / n) / (n - 1.0)) / (s / n) END, 6) + 0.0
                   AS dispersion_index,
               round(CASE WHEN s / n > 0
                          THEN (q - s * s / n) / (s / n) END, 6) + 0.0
                   AS pearson_chi2,
               round(CASE WHEN s / n > 0 AND n > 1 THEN
                   ((q - s * s / n) / (s / n) - (n - 1.0))
                       / sqrt(2.0 * (n - 1.0)) END, 6) + 0.0 AS z
        FROM f
    """

    # ratio metric: per-user sums, md5 variant, delta-method variance,
    # identical operand order
    sql["ratio_metric"] = """
        WITH pu AS (
            SELECT user_id, sum(coalesce(CAST(value AS DOUBLE), 0.0)) AS x,
                   CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        tg AS (
            SELECT x, y,
                   CASE WHEN (CAST(('0x' || substr(md5(
                            CAST(user_id AS VARCHAR) || '#rm'), 1, 15))
                            AS BIGINT) % 1000000000) / 1000000000.0 < 0.5
                        THEN 't' ELSE 'c' END AS variant
            FROM pu
        ),
        agg AS (
            SELECT variant, CAST(count(*) AS DOUBLE) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                   sum(y * y) AS syy, sum(x * y) AS sxy
            FROM tg GROUP BY 1
        ),
        st AS (
            SELECT variant, n,
                   CASE WHEN sy / n <> 0 THEN (sx / n) / (sy / n) END AS r,
                   CASE WHEN sy / n <> 0 AND n > 1 THEN
                       ((sxx - sx * sx / n) / (n - 1.0)
                        - 2.0 * ((sx / n) / (sy / n))
                            * ((sxy - sx * sy / n) / (n - 1.0))
                        + ((sx / n) / (sy / n)) * ((sx / n) / (sy / n))
                            * ((syy - sy * sy / n) / (n - 1.0)))
                       / (n * (sy / n) * (sy / n)) END AS v
            FROM agg
        ),
        ctl AS (SELECT r AS rc, v AS vc FROM st WHERE variant = 'c')
        SELECT st.variant, CAST(st.n AS BIGINT) AS n,
               round(st.r, 6) + 0.0 AS ratio,
               round(sqrt(st.v), 6) + 0.0 AS se,
               round(CASE WHEN st.variant <> 'c'
                          THEN st.r - ctl.rc END, 6) + 0.0 AS diff,
               round(CASE WHEN st.variant <> 'c'
                           AND sqrt(st.v + ctl.vc) > 0
                          THEN (st.r - ctl.rc) / sqrt(st.v + ctl.vc) END, 6)
                   + 0.0 AS z
        FROM st, ctl
        ORDER BY st.variant
    """

    # capture-recapture: distinct counts + intersect count + Chapman
    sql["capture_recapture"] = """
        WITH ka AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_id % 3 = 0 AND user_id IS NOT NULL
        ),
        kb AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_id % 2 = 0 AND user_id IS NOT NULL
        ),
        c AS (
            SELECT (SELECT count(*) FROM ka) AS na,
                   (SELECT count(*) FROM kb) AS nb,
                   (SELECT count(*) FROM ka WHERE user_id IN
                        (SELECT user_id FROM kb)) AS m
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(m AS BIGINT) AS n_both,
               round((na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0, 6) + 0.0
                   AS n_hat,
               round(sqrt(greatest((na + 1.0) * (nb + 1.0)
                                   * (na - m) * (nb - m)
                                   / ((m + 1.0) * (m + 1.0) * (m + 2.0)),
                                   0.0)), 6) + 0.0 AS se
        FROM c
    """

    # Chao1: word counts -> count-of-counts -> fold
    sql["chao1"] = f"""
        WITH w AS (
            SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
        ),
        wc AS (
            SELECT word, count(*) AS c FROM w WHERE word <> '' GROUP BY 1
        ),
        coc AS (SELECT c, count(*) AS nc FROM wc GROUP BY 1),
        f AS (
            SELECT sum(nc) AS s,
                   sum(CASE WHEN c = 1 THEN nc ELSE 0 END) AS f1,
                   sum(CASE WHEN c = 2 THEN nc ELSE 0 END) AS f2,
                   sum(c * nc) AS nt
            FROM coc
        )
        SELECT CAST(s AS BIGINT) AS s_obs, CAST(f1 AS BIGINT) AS f1,
               CAST(f2 AS BIGINT) AS f2, CAST(nt AS BIGINT) AS n_tokens,
               round(CASE WHEN f2 > 0
                          THEN s + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
                          ELSE s + CAST(f1 AS DOUBLE) * (f1 - 1.0) / 2.0 END,
                     6) + 0.0 AS s_chao1,
               round(1.0 - CAST(f1 AS DOUBLE) / nt, 6) + 0.0 AS coverage
        FROM f
    """

    # Kalman local level: identical predict/gain/update recursion,
    # diffuse init (x1=y1, P1=r), recursive CTE
    sql["kalman"] = """
        WITH RECURSIVE base AS (
            SELECT user_id AS id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS r,
                   CAST(value AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
        ),
        len AS (SELECT id, max(r) AS n FROM base GROUP BY 1),
        state AS (
            SELECT id, 1 AS r, y AS x, CAST(2.0 AS DOUBLE) AS p
            FROM base WHERE r = 1
            UNION ALL
            SELECT s.id, s.r + 1,
                   s.x + ((s.p + 0.5) / ((s.p + 0.5) + 2.0))
                       * (nx.y - s.x) AS x,
                   (1.0 - (s.p + 0.5) / ((s.p + 0.5) + 2.0))
                       * (s.p + 0.5) AS p
            FROM state s JOIN base nx ON nx.id = s.id AND nx.r = s.r + 1
        ),
        fin AS (
            SELECT s.id, len.n, s.x, s.p
            FROM state s JOIN len ON len.id = s.id AND s.r = len.n
        )
        SELECT id AS user_id, CAST(n AS BIGINT) AS n,
               round(x, 6) + 0.0 AS level, round(p, 6) + 0.0 AS p_var,
               CAST(h AS INT) AS step, round(x, 6) + 0.0 AS yhat,
               round(p + h * 0.5 + 2.0, 6) + 0.0 AS forecast_var
        FROM fin, (SELECT unnest(generate_series(1, 2)) AS h)
    """

    # PACF: same rounded-ACF CTE + the Durbin-Levinson closed forms
    sql["pacf"] = (
        sql["ljung_box"].split("SELECT user_id, CAST(n AS BIGINT) AS n_obs,")[0]
        + """
        SELECT user_id, CAST(n AS BIGINT) AS n_obs,
               round(r1, 6) + 0.0 AS pacf_1,
               round(CASE WHEN abs(1.0 - r1 * r1) > 1e-12
                          THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END, 6) + 0.0
                   AS pacf_2,
               round(CASE WHEN abs(1.0 - r1 * r1) > 1e-12
                           AND abs(1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1))
                                       * r1
                                 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2)
                               > 1e-12
                          THEN (r3 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r2
                                   - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
                               / (1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1))
                                       * r1
                                      - ((r2 - r1 * r1) / (1.0 - r1 * r1))
                                       * r2) END, 6) + 0.0 AS pacf_3
        FROM a
    """
    )

    return sql
