"""Invariance + property tests (SURVEY.md §5: the reference parametrizes every
test over backends; the Spark analogue is input partitioning — results must be
identical however the data is physically split — plus hypothesis-generated
inputs for the core operator contracts).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences


@pytest.fixture(scope="module")
def tok(spark):
    return generate_tokenized_sequences(spark, num_rows=2000, num_docs=10).cache()


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_shift_partition_invariant(tok, nparts):
    from temporalscope_spark.operators.shift import shift_target

    out = shift_target(
        tok.repartition(nparts), "event_time", "n_tok", n_lags=1,
        id_col="doc_id", check_empty=False,
    )
    rows = sorted(
        (r["doc_id"], r["event_time"], r["n_tok_shift_1"])
        for r in out.select("doc_id", "event_time", "n_tok_shift_1").collect()
    )
    base = getattr(test_shift_partition_invariant, "_base", None)
    if base is None:
        test_shift_partition_invariant._base = rows
    else:
        assert rows == base


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_sessionize_partition_invariant(spark, sf_dir, nparts):
    from temporalscope_spark.operators.sessionize import session_bounds

    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(nparts)
    out = session_bounds(events, "ts", "user_id", gap=3600.0)
    rows = sorted(tuple(r) for r in out.collect())
    base = getattr(test_sessionize_partition_invariant, "_base", None)
    if base is None:
        test_sessionize_partition_invariant._base = rows
    else:
        assert rows == base


# ---------------------------------------------------------------- hypothesis

hsettings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ts_lists = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40, unique=True
)


@hsettings
@given(times=ts_lists, gap=st.integers(min_value=1, max_value=2_000))
def test_sessionize_gap_property(spark, times, gap):
    """session id increments exactly at deltas > gap; session count ==
    1 + #(delta > gap) for a single entity."""
    from temporalscope_spark.operators.sessionize import sessionize

    rows = [(1, float(t)) for t in sorted(times)]
    df = spark.createDataFrame(rows, "uid int, t double")
    out = sessionize(df, "t", "uid", gap=float(gap))
    got = {r["t"]: r["session_id"] for r in out.collect()}

    ordered = sorted(times)
    expected, sid = {}, 1
    prev = None
    for t in ordered:
        if prev is not None and t - prev > gap:
            sid += 1
        expected[float(t)] = sid
        prev = t
    assert got == expected


@hsettings
@given(
    lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    target=st.integers(min_value=1, max_value=32),
)
def test_pad_token_arrays_property(spark, lens, target):
    """After padding: every array has exactly target_len entries; original
    prefix survives; pad id fills the tail."""
    from temporalscope_spark.operators.padding import pad_token_arrays

    rows = [(i, list(range(1, n + 1))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "i int, tokens array<int>")
    out = pad_token_arrays(df, target_len=target, n_tok_col=None, pad_id=0)
    for r in out.collect():
        orig = list(range(1, lens[r["i"]] + 1))
        expect = (orig + [0] * target)[:target]
        assert r["tokens"] == expect


@hsettings
@given(
    n=st.integers(min_value=2, max_value=25),
    n_lags=st.integers(min_value=1, max_value=5),
)
def test_shift_drops_exactly_n_lags_rows_per_entity(spark, n, n_lags):
    from temporalscope_spark.operators.shift import shift_target

    rows = [(e, float(t), float(10 * e + t)) for e in (1, 2) for t in range(n)]
    df = spark.createDataFrame(rows, "uid int, t double, target double")
    out = shift_target(df, "t", "target", n_lags=n_lags, id_col="uid", check_empty=False)
    expected = max(0, n - n_lags) * 2
    assert out.count() == expected
    # leakage-free: shifted value == target at t + n_lags
    bad = out.filter(
        F.col("target_shift_" + str(n_lags))
        != F.col("uid") * 10 + F.col("t") + F.lit(n_lags)
    )
    assert bad.isEmpty()


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_rolling_features_partition_invariant(tok, nparts):
    from temporalscope_spark.operators.rolling import rolling_features

    out = rolling_features(
        tok.repartition(nparts), ["n_tok"], [3600], time_col="event_time",
        id_col="doc_id", aggs=("count", "sum"),
    )
    rows = sorted(
        (r["doc_id"], r["event_time"], r["n_tok_count_3600s"], r["n_tok_sum_3600s"])
        for r in out.select(
            "doc_id", "event_time", "n_tok_count_3600s", "n_tok_sum_3600s"
        ).collect()
    )
    base = getattr(test_rolling_features_partition_invariant, "_base", None)
    if base is None:
        test_rolling_features_partition_invariant._base = rows
    else:
        assert rows == base


@given(
    lens=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=20),
    block=st.integers(min_value=2, max_value=16),
)
@hsettings
def test_pack_chunks_preserves_stream(spark, lens, block):
    """Property: concat-and-chunk output, re-concatenated in block order, is
    exactly the input token stream truncated to a block multiple."""
    from temporalscope_spark.operators.packing import pack_concat_chunks

    rows = []
    tok_stream = []
    pos = 0
    for i, ln in enumerate(lens):
        toks = [pos + j for j in range(ln)]
        pos += ln
        tok_stream.extend(toks)
        rows.append(("d", i, toks))
    df = spark.createDataFrame(rows, "doc_id string, seq_idx int, tokens array<int>")
    out = pack_concat_chunks(df, block_tokens=block).toPandas().sort_values("block_id")
    got = [t for arr in out["tokens"] for t in arr]
    keep = (len(tok_stream) // block) * block
    assert got == tok_stream[:keep]


@pytest.mark.parametrize("nparts", [1, 7])
def test_gemm_pairs_partition_invariant(spark, sf_dir, nparts):
    """Exact block-GEMM pair set must not depend on input partitioning."""
    from temporalscope_spark.operators.similarity import cosine_self_join_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(nparts)
    got = cosine_self_join_pairs(emb, threshold=0.4, method="gemm").toPandas()
    key = sorted((a, b, round(c, 9)) for a, b, c in got.itertuples(index=False))
    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").coalesce(1)
    want_df = cosine_self_join_pairs(emb1, threshold=0.4, method="gemm").toPandas()
    want = sorted((a, b, round(c, 9)) for a, b, c in want_df.itertuples(index=False))
    assert key == want


@pytest.mark.parametrize("nparts", [1, 5])
@pytest.mark.parametrize("dt", [0, 1_000_000])  # distributed AND driver paths
def test_connected_components_partition_invariant(spark, nparts, dt):
    from temporalscope_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(2, 4), (10, 30)],
        ["id_a", "id_b"],
    ).repartition(nparts)
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_threshold=dt).collect()
    }
    # brute-force union-find on the driver
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in [(i, i + 1) for i in range(0, 40, 2)] + [(2, 4), (10, 30)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@pytest.mark.parametrize("nparts", [1, 7])
def test_ewma_segmented_partition_invariant(spark, sf_dir, nparts):
    from temporalscope_spark.operators.rolling import ewma_segmented

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(nparts)
    out = ewma_segmented(
        ev, "value", 5.0, time_col="ts", id_col="user_id", chunk_seconds=43200
    ).toPandas()
    got = out.set_index("event_id")["value_ewma"].sort_index()
    ev1 = spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(1)
    want = (
        ewma_segmented(ev1, "value", 5.0, time_col="ts", id_col="user_id",
                       chunk_seconds=43200)
        .toPandas().set_index("event_id")["value_ewma"].sort_index()
    )
    import numpy as np
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)
