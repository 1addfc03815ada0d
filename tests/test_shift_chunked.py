"""shift_target_chunked == shift_target (lead) — the skew-proof path must be
value-identical to the plain per-entity window, including for a hot entity
and across chunk boundaries (SURVEY.md §4.2 #3: explicit skew handling).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
from temporalscope_spark.operators.shift import (
    shift_target,
    shift_target_chunked,
    with_time_chunk,
)


@pytest.fixture(scope="module")
def tok(spark):
    # 4000 rows, 20 docs, ~5% of rows on one hot doc (generator default)
    return generate_tokenized_sequences(spark, num_rows=4000, num_docs=20).cache()


def _collect(df, cols=("doc_id", "event_time", "n_tok_shift_1")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("chunk_seconds", [3600, 6 * 3600, 24 * 3600])
def test_chunked_matches_plain_lead1(tok, chunk_seconds):
    plain = shift_target(tok, "event_time", "n_tok", n_lags=1, id_col="doc_id",
                         check_empty=False)
    chunked = shift_target_chunked(tok, "event_time", "n_tok", n_lags=1,
                                   id_col="doc_id", chunk_seconds=chunk_seconds)
    assert _collect(plain) == _collect(chunked)


@pytest.mark.parametrize("n_lags", [2, 3])
def test_chunked_matches_plain_multilag(tok, n_lags):
    # chunks must hold >= n_lags rows: per-doc step <= 7 min, so 24h chunks
    # hold >= 200 rows — safely above n_lags
    cols = ("doc_id", "event_time", f"n_tok_shift_{n_lags}")
    plain = shift_target(tok, "event_time", "n_tok", n_lags=n_lags,
                         id_col="doc_id", check_empty=False)
    chunked = shift_target_chunked(tok, "event_time", "n_tok", n_lags=n_lags,
                                   id_col="doc_id", chunk_seconds=24 * 3600)
    assert _collect(plain, cols) == _collect(chunked, cols)


def test_chunked_with_precomputed_chunk_col(tok):
    pre = with_time_chunk(tok, "event_time", 3600, "time_chunk")
    chunked = shift_target_chunked(pre, "event_time", "n_tok", n_lags=1,
                                   id_col="doc_id", chunk_col="time_chunk")
    plain = shift_target(tok, "event_time", "n_tok", n_lags=1, id_col="doc_id",
                         check_empty=False)
    assert _collect(plain) == _collect(chunked)


def test_chunked_leakage_free(tok):
    """The shifted value at time t must come strictly from the future:
    perturbing any row's target never changes shifted values at later times,
    and each shifted value equals the target of the next event."""
    out = shift_target_chunked(tok, "event_time", "n_tok", n_lags=1,
                               id_col="doc_id", chunk_seconds=3600)
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("event_time")
    check = out.withColumn("_next_time", F.lead("event_time", 1).over(w))
    # every shifted value's source row is strictly later than the row itself
    bad = check.filter(
        F.col("_next_time").isNotNull() & (F.col("_next_time") <= F.col("event_time"))
    )
    assert bad.isEmpty()


def test_chunked_rejects_bad_args(tok):
    with pytest.raises(ValueError, match="n_lags"):
        shift_target_chunked(tok, "event_time", "n_tok", n_lags=0,
                             id_col="doc_id", chunk_seconds=3600)
    with pytest.raises(ValueError, match="chunk_col or chunk_seconds"):
        shift_target_chunked(tok, "event_time", "n_tok", id_col="doc_id")


@pytest.mark.parametrize("n_lags", [1, 2, 3])
def test_chunked_lag_matches_plain(tok, n_lags):
    cols = ("doc_id", "event_time", f"n_tok_shift_{n_lags}")
    plain = shift_target(tok, "event_time", "n_tok", n_lags=n_lags,
                         id_col="doc_id", direction="lag", check_empty=False)
    chunked = shift_target_chunked(tok, "event_time", "n_tok", n_lags=n_lags,
                                   id_col="doc_id", chunk_seconds=3600,
                                   direction="lag")
    assert _collect(plain, cols) == _collect(chunked, cols)


def test_build_features_clustered_matches_plain(spark, tok):
    """The skew-proof clustered flagship pass == the plain windowed pass."""
    from temporalscope_spark.operators.shift import with_time_chunk
    from temporalscope_spark.pipelines.feature_pass import (
        build_features,
        build_features_clustered,
    )

    pre = with_time_chunk(tok, "event_time", 3600, "time_chunk")
    clustered = build_features_clustered(pre, pad_to=16)
    plain = build_features(tok, n_lags=1, pad_to=16)

    cols = ["doc_id", "event_time", "target", "n_tok_lag_1", "split", "n_tok"]
    a = sorted(
        (r["doc_id"], r["event_time"], r["target"], r["n_tok_lag_1"], r["split"],
         r["n_tok"], tuple(r["tokens"]))
        for r in clustered.select(*cols, "tokens").collect()
    )
    b = sorted(
        (r["doc_id"], r["event_time"], r["target"], r["n_tok_lag_1"], r["split"],
         r["n_tok"], tuple(r["tokens"]))
        for r in plain.select(*cols, "tokens").collect()
    )
    assert a == b


def test_repair_join_merge_default_no_broadcast(tok):
    # VERDICT r1 #2: the boundary table is one row per (id, chunk) and grows
    # with the corpus — the default repair join must be sort-merge, with
    # broadcast strictly opt-in
    merged = shift_target_chunked(tok, "event_time", "n_tok", 1, chunk_seconds=3600)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan

    bcast = shift_target_chunked(
        tok, "event_time", "n_tok", 1, chunk_seconds=3600, repair_join="broadcast"
    )
    plan_b = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    with pytest.raises(ValueError, match="repair_join"):
        shift_target_chunked(
            tok, "event_time", "n_tok", 1, chunk_seconds=3600, repair_join="shuffle"
        )


def test_repair_join_strategies_value_identical(tok):
    a = _collect(shift_target_chunked(tok, "event_time", "n_tok", 1, chunk_seconds=3600))
    b = _collect(
        shift_target_chunked(
            tok, "event_time", "n_tok", 1, chunk_seconds=3600, repair_join="broadcast"
        )
    )
    assert a == b
