"""Physical-plan regression guards (PLANS.md).

These pin the scale-critical plan properties — filter pushdown to the scan,
column pruning, shuffle counts, broadcast joins — so a refactor that silently
introduces an extra exchange or un-pushes a predicate fails CI, not a 100 TB
run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_time_range_filter_pushed_to_scan(events):
    out = events.filter(F.col("ts") >= F.lit("2024-01-02").cast("timestamp_ntz"))
    plan = plan_of(out)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan, plan


def test_column_pruning_reaches_scan(events):
    out = events.select("user_id", "value")
    plan = plan_of(out)
    assert "ReadSchema: struct<user_id:bigint,value:double>" in plan, plan


def test_shift_adds_no_extra_exchange(events):
    """shift_target over an already entity-partitioned frame must not
    reshuffle: exactly the one repartition exchange."""
    from temporalscope_spark.operators.shift import shift_target

    rep = events.repartition(4, "user_id")
    out = shift_target(rep, "ts", "value", n_lags=1, id_col="user_id",
                       check_empty=False)
    plan = plan_of(out)
    assert plan.count("Exchange") == 1, plan


def test_feature_pass_single_shuffle(spark):
    """build_features (lead target + lags + split labels): ONE hash exchange
    total — all window specs share the entity partitioning."""
    from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
    from temporalscope_spark.pipelines.feature_pass import build_features

    tok = generate_tokenized_sequences(spark, num_rows=500, num_docs=5)
    out = build_features(tok, n_lags=2, pad_to=8)
    plan = plan_of(out)
    # generator itself contributes one window exchange; the feature pass must
    # add exactly one more (hashpartitioning(doc_id))
    assert plan.count("hashpartitioning(doc_id") == 1, plan


def test_chunked_window_reuses_clustering(spark):
    """The chunked window must run on the (id, chunk) clustering without a
    new exchange for the fat side; only the tiny repair side shuffles."""
    import datetime as dt

    from temporalscope_spark.operators.shift import shift_target_chunked

    rows = [
        (f"doc_{d}", dt.datetime(2023, 1, 1) + dt.timedelta(minutes=7 * i), 10 * d + i, i)
        for d in range(5)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, event_time timestamp, n_tok int, seq int"
    )
    from pyspark.sql import functions as F

    pre = df.withColumn(
        "time_chunk", F.floor(F.unix_micros("event_time") / F.lit(3600 * 1e6)).cast("long")
    ).repartition(4, "doc_id", "time_chunk")
    # broadcast mode isolates the fat side: the window and join must ride
    # the explicit (doc_id, time_chunk) clustering with NO planner-inserted
    # (ENSURE_REQUIREMENTS) exchange on the chunk keys
    out = shift_target_chunked(
        pre, "event_time", "n_tok", n_lags=1, id_col="doc_id", chunk_col="time_chunk",
        repair_join="broadcast",
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    implicit = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        and "time_chunk" in line
        and "ENSURE_REQUIREMENTS" in line
    ]
    assert implicit == [], plan

    # merge mode (the scale-safe default): the ONLY implicit chunk-key
    # exchange may be the tiny repair side feeding the sort-merge join —
    # the fat side still rides its explicit clustering
    out_m = shift_target_chunked(
        pre, "event_time", "n_tok", n_lags=1, id_col="doc_id", chunk_col="time_chunk"
    )
    plan_m = plan_of(out_m)
    assert "SortMergeJoin" in plan_m, plan_m
    implicit_m = [
        line
        for line in plan_m.splitlines()
        if "Exchange hashpartitioning" in line
        and "time_chunk" in line
        and "ENSURE_REQUIREMENTS" in line
    ]
    assert len(implicit_m) <= 1, plan_m


def test_partitioner_labels_use_broadcast_join(spark, sf_dir):
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    tf = TemporalFrame(
        events, time_col="ts", target_col="value", id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"), sort=False,
    )
    part = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.7)
    part.setup()
    part.fit()
    plan = plan_of(part.with_bucket_labels())
    assert "BroadcastHashJoin" in plan, plan


def test_ensure_layout_entity_feeds_window_with_no_exchange_or_sort(spark, sf_dir):
    """ensure_layout('entity') must leave per-entity windows exchange-free
    AND sort-free (hash clustering + within-partition sort both satisfied)."""
    from temporalscope_spark.frame import TemporalFrame
    from temporalscope_spark.operators.shift import shift_target

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    tf = TemporalFrame(
        events, time_col="ts", target_col="value", id_col="user_id",
        exempt_cols=("event_type", "props", "event_id"), sort=False,
    ).ensure_layout(num_partitions=4)
    out = shift_target(tf.df, "ts", "value", n_lags=1, id_col="user_id",
                       check_empty=False)
    plan = plan_of(out)
    assert plan.count("Exchange") == 1, plan      # only the layout repartition
    # the window's required (user_id, ts) ordering is satisfied by
    # sortWithinPartitions — no planner-inserted Sort above it
    window_idx = plan.index("Window ")
    pre_window = plan[window_idx:]
    assert pre_window.count("+- Sort") <= 1, plan  # the explicit layout sort only
