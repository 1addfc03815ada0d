"""Deterministic sampling and per-group top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    top_k_per_group,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("web"), F.lit("books"), F.lit("code")),
                     (F.col("id") % 3 + 1).cast("int")).alias("source"),
        (F.col("id") % 97).cast("double").alias("quality"),
    )


class TestDeterministicSample:
    def test_partition_invariant(self, corpus):
        a = {r["doc_id"] for r in deterministic_sample(corpus, 0.3, "doc_id", seed=1).collect()}
        b = {r["doc_id"] for r in deterministic_sample(corpus.repartition(17), 0.3, "doc_id", seed=1).collect()}
        assert a == b and 0.25 < len(a) / 3000 < 0.35

    def test_portable_matches_fraction(self, corpus):
        n = deterministic_sample(corpus, 0.5, "doc_id", seed=2, portable=True).count()
        assert 0.45 < n / 3000 < 0.55

    def test_monotone_in_fraction(self, corpus):
        small = {r["doc_id"] for r in deterministic_sample(corpus, 0.2, "doc_id").collect()}
        big = {r["doc_id"] for r in deterministic_sample(corpus, 0.6, "doc_id").collect()}
        assert small <= big  # nested samples: same hash, larger cutoff

    def test_bad_fraction(self, corpus):
        with pytest.raises(DataFrameValidationError, match="fraction"):
            deterministic_sample(corpus, -0.1, "doc_id")


class TestStratifiedSample:
    def test_per_stratum_rates(self, corpus):
        out = stratified_sample(
            corpus, "source", {"books": 1.0, "web": 0.2}, key_col="doc_id", seed=3
        )
        got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got.get("books") == 1000          # keep all
        assert 120 < got.get("web", 0) < 280     # ~20%
        assert "code" not in got                  # default 0.0


class TestTopKPerGroup:
    def test_topk(self, corpus):
        out = top_k_per_group(corpus, ["source"], "quality", k=5, tie_break="doc_id").toPandas()
        pdf = corpus.toPandas()
        for src, grp in pdf.groupby("source"):
            want = grp.sort_values(["quality", "doc_id"], ascending=[False, True]).head(5)
            got = out[out["source"] == src].sort_values("rank")
            assert list(got["doc_id"]) == list(want["doc_id"])

    def test_group_limit_pushed_below_exchange(self, corpus):
        """Small-k per-group limit must run as WindowGroupLimit (partial
        top-k before the shuffle), not a full per-group sort of everything."""
        out = top_k_per_group(corpus, ["source"], "quality", k=5, tie_break="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_bad_k(self, corpus):
        with pytest.raises(DataFrameValidationError, match="k must be"):
            top_k_per_group(corpus, ["source"], "quality", k=0)


class TestTokenBudgetSample:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (i, ["web", "code", "books"][i % 3], 10 + (i % 7))
            for i in range(600)
        ]
        return spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])

    def test_budget_hits_expected_tokens(self, corpus):
        from temporalscope_spark.operators.sampling import sample_to_token_budget

        totals = {r["source"]: r["t"] for r in
                  corpus.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
        budget = totals["web"] * 0.3
        kept = sample_to_token_budget(
            corpus, {"web": budget}, key_col="doc_id", seed=1
        ).toPandas()
        assert set(kept["source"]) == {"web"}  # unlisted strata dropped
        got = kept["n_tok"].sum()
        assert abs(got - budget) / budget < 0.35  # hash-sample variance bound

    def test_cap_keeps_source_whole(self, corpus):
        from temporalscope_spark.operators.sampling import sample_to_token_budget

        kept = sample_to_token_budget(
            corpus, {"books": 1e9}, key_col="doc_id", seed=1
        ).toPandas()
        n_books = corpus.filter(F.col("source") == "books").count()
        assert len(kept) == n_books  # fraction capped at 1.0

    def test_deterministic_and_partition_invariant(self, spark, corpus):
        from temporalscope_spark.operators.sampling import sample_to_token_budget

        a = sample_to_token_budget(corpus.repartition(1), {"web": 500},
                                   key_col="doc_id", seed=2).toPandas()
        b = sample_to_token_budget(corpus.repartition(9), {"web": 500},
                                   key_col="doc_id", seed=2).toPandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])

    def test_negative_budget_rejected(self, corpus):
        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.sampling import sample_to_token_budget

        with pytest.raises(DataFrameValidationError, match=">= 0"):
            sample_to_token_budget(corpus, {"web": -1}, key_col="doc_id")


class TestChunkDocuments:
    def test_chunks_cover_and_overlap(self, spark):
        from temporalscope_spark.operators.text import chunk_documents

        text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = chunk_documents(df, chunk_chars=100, overlap=20).toPandas()
        out = out.sort_values("chunk_idx").reset_index(drop=True)
        # step 80: starts 0, 80, 160 -> 3 chunks (1 + ceil(160/80))
        assert list(out["chunk_idx"]) == [0, 1, 2]
        assert out.loc[0, "chunk_text"] == text[0:100]
        assert out.loc[1, "chunk_text"] == text[80:180]
        assert out.loc[2, "chunk_text"] == text[160:260]
        # overlap region shared between consecutive chunks
        assert out.loc[0, "chunk_text"][-20:] == out.loc[1, "chunk_text"][:20]

    def test_short_and_empty_docs(self, spark):
        from temporalscope_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "short"), (2, "")], ["doc_id", "text"])
        out = chunk_documents(df, chunk_chars=100, overlap=10).toPandas()
        assert len(out) == 2  # one chunk each; empty doc not dropped
        assert set(out["chunk_idx"]) == {0}

    def test_bad_args(self, spark):
        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(DataFrameValidationError, match="chunk_chars"):
            chunk_documents(df, chunk_chars=0)
        with pytest.raises(DataFrameValidationError, match="overlap"):
            chunk_documents(df, chunk_chars=10, overlap=10)


class TestManyStrataCodegen:
    """5,000 strata must compile under whole-stage codegen (the chained-
    when rate tree was exactly the 64 KB-method class that silently
    de-compiled lang_id): CODEGEN_ONLY + fallback=false turns a codegen
    compile failure into a hard error instead of interpreted mode."""

    def _codegen_only(self, spark):
        return (
            ("spark.sql.codegen.factoryMode", "CODEGEN_ONLY"),
            ("spark.sql.codegen.fallback", "false"),
        )

    def _run_strict(self, spark, fn):
        saved = {}
        for k, v in self._codegen_only(spark):
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_stratified_5000_strata_compiles_and_is_exact(self, spark):
        n_strata = 5000
        df = spark.range(20000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string")).alias(
                "source"
            ),
        )
        fractions = {f"s{i}": (1.0 if i % 2 == 0 else 0.0) for i in range(n_strata)}
        out = stratified_sample(df, "source", fractions, key_col="doc_id")
        rows = self._run_strict(spark, out.collect)
        # rate 1.0 keeps everything in even strata; rate 0.0 drops odd ones
        assert len(rows) == 10000
        assert all(int(r["source"][1:]) % 2 == 0 for r in rows)
        assert out.columns == df.columns  # helper columns dropped

    def test_temperature_sample_500_sources_compiles(self, spark):
        from temporalscope_spark.operators.sampling import temperature_sample

        df = spark.range(5000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 500).cast("string")).alias(
                "source"
            ),
        )
        rows = self._run_strict(
            spark, temperature_sample(df, 2500, alpha=0.3).collect
        )
        assert 0 < len(rows) <= 5000
        assert set(r["keep_frac"] for r in rows)  # rates materialized

    def test_small_strata_stay_a_literal_map(self, spark):
        """Below the threshold the plan is a single narrow projection —
        no join node at all."""
        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("web"), F.lit("books")),
                (F.col("id") % 2 + 1).cast("int"),
            ).alias("source"),
        )
        out = stratified_sample(
            df, "source", {"web": 0.5, "books": 1.0}, key_col="doc_id"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_large_strata_use_broadcast_join(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 200).cast("string")).alias(
                "source"
            ),
        )
        out = stratified_sample(
            df, "source", {f"s{i}": 0.5 for i in range(200)}, key_col="doc_id"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestNegativeSamples:
    """negative_samples: determinism, positive exclusion, slot counts,
    index independence from partitioning."""

    @pytest.fixture
    def pos_items(self, spark):
        pos = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (3, "c")], ["uid", "item"]
        )
        items = spark.createDataFrame(
            [(x,) for x in "abcdefgh"], ["item"]
        )
        return pos, items

    def test_shape_and_exclusion(self, spark, pos_items):
        from temporalscope_spark.operators.sampling import negative_samples

        pos, items = pos_items
        out = negative_samples(pos, items, "uid", "item", k=3).collect()
        # <= k negatives per positive pair
        from collections import Counter

        per_pair = Counter((r["uid"], r["item"]) for r in out)
        assert all(v <= 3 for v in per_pair.values())
        # no negative is a true positive for that user
        truth = {(1, "a"), (1, "b"), (2, "a"), (3, "c")}
        assert all((r["uid"], r["neg_item"]) not in truth for r in out)
        # all negatives come from the item universe
        assert all(r["neg_item"] in set("abcdefgh") for r in out)

    def test_deterministic_and_partition_invariant(self, spark, pos_items):
        from temporalscope_spark.operators.sampling import negative_samples

        pos, items = pos_items
        a = sorted(
            map(tuple, negative_samples(pos.repartition(1), items, "uid", "item", k=4).collect())
        )
        b = sorted(
            map(tuple, negative_samples(pos.repartition(5), items.repartition(3), "uid", "item", k=4).collect())
        )
        assert a == b and len(a) > 0

    def test_seed_changes_draws(self, spark, pos_items):
        from temporalscope_spark.operators.sampling import negative_samples

        pos, items = pos_items
        a = sorted(map(tuple, negative_samples(pos, items, "uid", "item", k=4, seed=1).collect()))
        b = sorted(map(tuple, negative_samples(pos, items, "uid", "item", k=4, seed=2).collect()))
        assert a != b

    def test_draws_roughly_uniform(self, spark):
        from temporalscope_spark.operators.sampling import negative_samples

        pos = spark.createDataFrame([(u, -1) for u in range(500)], ["uid", "item"])
        items = spark.createDataFrame([(i,) for i in range(10)], ["item"])
        out = negative_samples(pos, items, "uid", "item", k=4).toPandas()
        counts = out["neg_item"].value_counts()
        assert len(counts) == 10
        assert counts.min() > 0.5 * counts.max()

    def test_errors(self, spark, pos_items):
        from temporalscope_spark.operators.sampling import negative_samples
        from temporalscope_spark.exceptions import DataFrameValidationError

        pos, items = pos_items
        with pytest.raises(DataFrameValidationError, match="k must be"):
            negative_samples(pos, items, "uid", "item", k=0)
        with pytest.raises(DataFrameValidationError, match="missing column"):
            negative_samples(pos, items, "nope", "item")
        one = spark.createDataFrame([("a",)], ["item"])
        with pytest.raises(DataFrameValidationError, match=">= 2 distinct"):
            negative_samples(pos, one, "uid", "item")


class TestUpsampleRepeat:
    @pytest.fixture()
    def events(self, spark):
        return spark.createDataFrame(
            [(i, "low" if i % 2 else "hi") for i in range(50)],
            "event_id long, src string",
        )

    def test_integer_factor_exact(self, spark, events):
        from temporalscope_spark.operators.sampling import upsample_repeat

        out = upsample_repeat(
            events, "src", {"low": 3.0, "hi": 1.0}, key_col="event_id", portable=True
        )
        counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert counts == {"low": 75, "hi": 25}
        # epochs are 1..3 for every low row
        eps = {r["epoch"] for r in out.filter("src = 'low'").collect()}
        assert eps == {1, 2, 3}

    def test_factor_zero_drops_and_validation(self, spark, events):
        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.sampling import upsample_repeat

        out = upsample_repeat(
            events, "src", {"low": 0.0}, key_col="event_id", default_factor=1.0
        )
        assert out.filter("src = 'low'").count() == 0
        assert out.filter("src = 'hi'").count() == 25
        with pytest.raises(DataFrameValidationError):
            upsample_repeat(events, "src", {"low": -1.0}, key_col="event_id")
        with pytest.raises(DataFrameValidationError):
            upsample_repeat(events, "src", {}, key_col="event_id", default_factor=-0.5)

    def test_fractional_matches_hashlib_and_partition_invariant(self, spark, events):
        """factor 2.5: every row gets 2 copies + 1 more iff its md5-uniform
        < 0.5 — replayed row-by-row with hashlib, and invariant to input
        partitioning."""
        import hashlib

        from temporalscope_spark.operators.sampling import upsample_repeat

        def u01(key, seed=42):
            return int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:8], 16) / 2**32

        out = upsample_repeat(
            events, "src", {"low": 2.5, "hi": 1.0}, key_col="event_id", portable=True
        )
        got = {
            r["event_id"]: r["n"]
            for r in out.filter("src = 'low'")
            .groupBy("event_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        want = {i: 2 + (1 if u01(i) < 0.5 else 0) for i in range(50) if i % 2}
        assert got == want

        re32 = upsample_repeat(
            events.repartition(32), "src", {"low": 2.5, "hi": 1.0},
            key_col="event_id", portable=True,
        )
        got32 = {
            r["event_id"]: r["n"]
            for r in re32.filter("src = 'low'")
            .groupBy("event_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got32 == want

    def test_no_shuffle_plan(self, spark, events):
        from temporalscope_spark.operators.sampling import upsample_repeat

        plan = (
            upsample_repeat(events, "src", {"low": 2.5}, key_col="event_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
