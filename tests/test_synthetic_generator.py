"""Synthetic-generator parity suite.

Ports /root/reference/test/unit/datasets/test_synthetic_data_generator.py:
shape, time-column modes, null/NaN injection, drop_time, single-row/empty
edges, percentage + negativity validation. Engine-specific additions:
seed determinism and partition-count invariance (the generator must be a
pure function of (seed, row index) — xxhash-derived, not F.rand — so the
fixture is reproducible on any cluster layout).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from temporalscope_spark.datasets.synthetic import (
    generate_synthetic_time_series,
    generate_tokenized_sequences,
)


class TestBasicShape:
    def test_basic(self, spark):
        df = generate_synthetic_time_series(spark, num_samples=100, num_features=3)
        assert df.count() == 100
        assert df.columns == ["time", "target", "feature_1", "feature_2", "feature_3"]

    def test_time_numeric_vs_datetime(self, spark):
        num = generate_synthetic_time_series(spark, num_samples=5, time_col_numeric=True)
        assert isinstance(num.schema["time"].dataType, T.DoubleType)
        dt = generate_synthetic_time_series(spark, num_samples=5, time_col_numeric=False)
        assert isinstance(dt.schema["time"].dataType, (T.TimestampType, T.TimestampNTZType))

    def test_drop_time(self, spark):
        df = generate_synthetic_time_series(spark, num_samples=3, num_features=2, drop_time=True)
        assert "time" not in df.columns
        df2 = generate_synthetic_time_series(spark, num_samples=3, num_features=2)
        assert "time" in df2.columns

    def test_empty(self, spark):
        df = generate_synthetic_time_series(spark, num_samples=0)
        assert df.count() == 0

    def test_values_in_unit_interval(self, spark):
        df = generate_synthetic_time_series(spark, num_samples=200, num_features=2)
        row = df.agg(
            F.min("target"), F.max("target"), F.min("feature_1"), F.max("feature_1")
        ).first()
        assert all(0.0 <= v < 1.0 for v in row)


class TestInjection:
    def test_nulls_present_in_every_feature(self, spark):
        df = generate_synthetic_time_series(
            spark, num_samples=100, num_features=5, with_nulls=True, with_nans=True
        )
        feats = [c for c in df.columns if c.startswith("feature_")]
        counts = df.agg(
            *[
                F.sum((F.col(c).isNull() | F.isnan(c)).cast("long")).alias(c)
                for c in feats
            ]
        ).first()
        for c in feats:
            assert counts[c] > 0, f"expected nulls/nans in {c}"

    def test_single_row_always_affected(self, spark):
        df = generate_synthetic_time_series(
            spark, num_samples=1, num_features=2, with_nulls=True, with_nans=True
        )
        v = df.select("feature_1").first()[0]
        assert v is None or math.isnan(v)
        df2 = generate_synthetic_time_series(
            spark, num_samples=1, num_features=2, with_nulls=False, with_nans=True
        )
        v2 = df2.select("feature_1").first()[0]
        assert v2 is not None and math.isnan(v2)

    def test_target_never_injected(self, spark):
        df = generate_synthetic_time_series(
            spark, num_samples=100, num_features=2, with_nulls=True, with_nans=True
        )
        assert df.filter(F.col("target").isNull() | F.isnan("target")).count() == 0


class TestValidation:
    def test_percentage_validation(self, spark):
        with pytest.raises(ValueError, match="null_percentage must be between 0.0 and 1.0"):
            generate_synthetic_time_series(spark, null_percentage=1.5)
        with pytest.raises(ValueError, match="nan_percentage must be between 0.0 and 1.0"):
            generate_synthetic_time_series(spark, nan_percentage=-0.1)

    def test_negative_values(self, spark):
        with pytest.raises(ValueError, match="`num_samples` and `num_features` must be non-negative"):
            generate_synthetic_time_series(spark, num_samples=-1, num_features=3)
        with pytest.raises(ValueError, match="`num_samples` and `num_features` must be non-negative"):
            generate_synthetic_time_series(spark, num_samples=100, num_features=-2)


class TestDeterminism:
    def test_same_seed_same_data(self, spark):
        a = generate_synthetic_time_series(spark, num_samples=50, random_seed=7).toPandas()
        b = generate_synthetic_time_series(spark, num_samples=50, random_seed=7).toPandas()
        assert a.equals(b)

    def test_different_seed_differs(self, spark):
        a = generate_synthetic_time_series(spark, num_samples=50, random_seed=7).toPandas()
        b = generate_synthetic_time_series(spark, num_samples=50, random_seed=8).toPandas()
        assert not a["target"].equals(b["target"])

    def test_partition_invariant(self, spark):
        """Values depend only on (seed, row index) — never on layout."""
        base = generate_synthetic_time_series(spark, num_samples=64, random_seed=7)
        a = base.toPandas().sort_values("time").reset_index(drop=True)
        b = (
            generate_synthetic_time_series(
                spark.range(0).sparkSession, num_samples=64, random_seed=7
            )
            .repartition(13)
            .toPandas()
            .sort_values("time")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_tokenized_sequences_deterministic(self, spark):
        a = generate_tokenized_sequences(spark, num_rows=500, num_docs=10).toPandas()
        b = generate_tokenized_sequences(spark, num_rows=500, num_docs=10).toPandas()
        a = a.sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
        assert a["tokens"].map(tuple).equals(b["tokens"].map(tuple))  # token-array equality
