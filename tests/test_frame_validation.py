"""TemporalFrame + validation parity suite.

Ports the contract of /root/reference/test/unit/core/test_core_utils.py
(temporal-ordering suites :438-686) and test_temporal_data_loader.py:
init/param errors, sort, conversion, per-group uniqueness, metadata.
"""

import warnings

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.core import convert, validation
from temporalscope_spark.exceptions import (
    DataFrameValidationError,
    ModeValidationError,
    TargetColumnWarning,
    TimeColumnError,
)
from temporalscope_spark.frame import TemporalFrame
from tests.conftest import make_ts_df


class TestTemporalFrameInit:
    def test_basic(self, spark):
        df = make_ts_df(spark, n=10, k=2, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target")
        assert tf.time_col == "time" and tf.target_col == "target"
        assert tf.df.count() == 10

    def test_bad_time_col_type_param(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True)
        with pytest.raises(TypeError, match="`time_col` must be a non-empty string"):
            TemporalFrame(df, time_col="", target_col="target")
        with pytest.raises(TypeError, match="`target_col` must be a non-empty string"):
            TemporalFrame(df, time_col="time", target_col=None)

    def test_invalid_mode(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True)
        with pytest.raises(ModeValidationError):
            TemporalFrame(df, time_col="time", target_col="target", mode="triple")

    def test_missing_column(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True)
        with pytest.raises(DataFrameValidationError, match="does not exist"):
            TemporalFrame(df, time_col="nope", target_col="target")

    def test_empty_df(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).filter(F.lit(False))
        with pytest.raises(ValueError, match="DataFrame cannot be empty"):
            TemporalFrame(df, time_col="time", target_col="target")

    def test_non_numeric_feature_rejected(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn("bad", F.lit("s"))
        with pytest.raises(DataFrameValidationError, match="must be numeric"):
            TemporalFrame(df, time_col="time", target_col="target")

    def test_exempt_cols_allowed(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn("tag", F.lit("s"))
        tf = TemporalFrame(df, time_col="time", target_col="target", exempt_cols=("tag",))
        assert "tag" in tf.df.columns

    def test_boolean_time_rejected(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn("bt", F.lit(True))
        with pytest.raises(TimeColumnError, match="must be numeric or datetime"):
            TemporalFrame(df, time_col="bt", target_col="target")

    def test_metadata_bag(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target", metadata={"v": 1})
        tf.metadata["w"] = 2
        assert tf.metadata == {"v": 1, "w": 2}

    def test_sort_descending(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target", ascending=False)
        times = [r["time"] for r in tf.df.select("time").collect()]
        assert times == sorted(times, reverse=True)

    def test_id_col_type_param(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=True)
        with pytest.raises(TypeError, match="`id_col` must be a string or None"):
            TemporalFrame(df, time_col="time", target_col="target", id_col=3)

    def test_multi_target_mode_accepts_array_target(self, spark):
        """Reference TimeFrame accepts mode='multi_target'
        (test_temporal_data_loader.py:76-80); in our engine the list-valued
        target is the native tokens payload."""
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn(
            "tokens", F.array(F.lit(1), F.lit(2))
        )
        with pytest.warns(TargetColumnWarning, match="sequential data"):
            tf = TemporalFrame(df, time_col="time", target_col="tokens", mode="multi_target")
        assert tf.mode == "multi_target" and tf.target_col == "tokens"

    def test_target_column_warning_contract(self, spark):
        """Ported warning contract (reference exceptions.py:51-70,
        test_exceptions.py:78-91): an array-valued target warns with the
        reference's message text; a scalar target stays silent."""
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn(
            "seq_target", F.array(F.lit(0.3), F.lit(0.4))
        )
        with pytest.warns(
            TargetColumnWarning,
            match=r"`target_col` appears to contain sequential data\. Ensure it is "
            r"transformed appropriately for multi_target mode\.",
        ):
            TemporalFrame(df, time_col="time", target_col="seq_target", mode="multi_target")
        with pytest.warns(TargetColumnWarning, match="single_target mode"):
            TemporalFrame(
                df, time_col="time", target_col="seq_target", mode="single_target"
            )
        with warnings.catch_warnings():
            warnings.simplefilter("error", TargetColumnWarning)
            TemporalFrame(df, time_col="time", target_col="target")

    def test_no_sort_keeps_plan_sortfree(self, spark):
        """sort=False must not inject a global Sort node
        (test_temporal_data_loader.py:88-96)."""
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
        plan = tf.df._jdf.queryExecution().executedPlan().toString()
        assert "Sort" not in plan


class TestUpdateDataframe:
    """Parity: test_temporal_data_loader.py:248-280 (update valid / invalid /
    empty), plus exemption persistence across updates."""

    def test_update_valid(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target")
        tf.update_dataframe(df.withColumn("feature_2", F.col("target") * 2))
        assert "feature_2" in tf.df.columns

    def test_update_invalid_schema(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target")
        with pytest.raises(DataFrameValidationError, match="does not exist"):
            tf.update_dataframe(df.drop("target"))

    def test_update_empty_rejected(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        tf = TemporalFrame(df, time_col="time", target_col="target")
        with pytest.raises(ValueError, match="DataFrame cannot be empty"):
            tf.update_dataframe(df.filter(F.lit(False)))

    def test_update_keeps_exemptions(self, spark):
        """exempt_cols given at construction must survive update_dataframe —
        an update with the original's shape always passes."""
        df = make_ts_df(spark, n=5, k=1, time_numeric=True).withColumn("tag", F.lit("s"))
        tf = TemporalFrame(df, time_col="time", target_col="target", exempt_cols=("tag",))
        tf.update_dataframe(df.withColumn("target", F.col("target") + 1))
        assert "tag" in tf.df.columns


class TestTimeConversion:
    def test_numeric_conversion_us(self, spark):
        df = make_ts_df(spark, n=5, k=1, time_numeric=False)
        out = convert.time_to_numeric(df, "time", "us")
        assert dict(out.dtypes)["time"] == "double"
        vals = sorted(r["time"] for r in out.collect())
        assert vals[1] - vals[0] == pytest.approx(86400 * 1e6)

    def test_numeric_conversion_ns_is_long(self, spark):
        df = make_ts_df(spark, n=3, k=1, time_numeric=False)
        out = convert.time_to_numeric(df, "time", "ns")
        assert dict(out.dtypes)["time"] == "bigint"

    def test_numeric_passthrough(self, spark):
        df = make_ts_df(spark, n=3, k=1, time_numeric=True)
        out = convert.time_to_numeric(df, "time")
        assert dict(out.dtypes)["time"] == "double"

    def test_datetime_conversion_roundtrip(self, spark):
        df = make_ts_df(spark, n=3, k=1, time_numeric=False)
        num = convert.time_to_numeric(df, "time", "us")
        back = convert.time_to_datetime(num, "time", "us")
        assert dict(back.dtypes)["time"] == "timestamp"
        orig = sorted(r["time"] for r in df.collect())
        got = sorted(r["time"] for r in back.collect())
        assert orig == got

    def test_string_parse(self, spark):
        df = spark.createDataFrame([("2023-01-01 00:00:00",)], ["time"])
        out = convert.time_to_datetime(df, "time")
        assert dict(out.dtypes)["time"] == "timestamp"

    def test_invalid_unit(self, spark):
        df = make_ts_df(spark, n=3, k=1, time_numeric=False)
        with pytest.raises(ValueError, match="Invalid time_unit"):
            convert.time_to_numeric(df, "time", "weeks")

    def test_frame_conversion_hook(self, spark):
        df = make_ts_df(spark, n=3, k=1, time_numeric=False)
        tf = TemporalFrame(df, time_col="time", target_col="target", time_col_conversion="numeric")
        assert dict(tf.df.dtypes)["time"] == "double"


class TestTemporalOrdering:
    def test_unique_ok(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True)
        validation.check_temporal_ordering(df, "time")

    def test_global_duplicates_fail(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True).withColumn(
            "time", F.floor(F.col("time") / 2).cast("double")
        )
        with pytest.raises(TimeColumnError, match="Duplicate timestamps detected globally"):
            validation.check_temporal_ordering(df, "time")

    def test_per_group_duplicates(self, spark):
        data = [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)]
        df = spark.createDataFrame(data, ["id", "time"])
        # shared timestamps across groups are fine
        validation.check_temporal_ordering(df, "time", id_col="id")
        dup = spark.createDataFrame(data + [("a", 2.0)], ["id", "time"])
        with pytest.raises(TimeColumnError, match="Duplicate timestamps detected within 'id'"):
            validation.check_temporal_ordering(dup, "time", id_col="id")

    def test_equidistant_ok_and_fail(self, spark):
        ok = spark.createDataFrame([("a", float(i)) for i in range(5)], ["id", "time"])
        validation.check_temporal_ordering(ok, "time", id_col="id", enforce_equidistant_sampling=True)
        bad = spark.createDataFrame(
            [("a", 0.0), ("a", 1.0), ("a", 3.0)], ["id", "time"]
        )
        with pytest.raises(TimeColumnError, match="Non-equidistant sampling"):
            validation.check_temporal_ordering(
                bad, "time", id_col="id", enforce_equidistant_sampling=True
            )

    def test_mixed_frequency_across_groups_ok(self, spark):
        # different per-entity deltas are valid (reference test_core_utils.py:651)
        df = spark.createDataFrame(
            [("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 10.0), ("b", 20.0)], ["id", "time"]
        )
        validation.check_temporal_ordering(df, "time", id_col="id", enforce_equidistant_sampling=True)

    def test_frame_uniqueness_hook(self, spark):
        df = make_ts_df(spark, n=10, k=1, time_numeric=True).withColumn("time", F.lit(1.0))
        with pytest.raises(TimeColumnError, match="Duplicate timestamps"):
            TemporalFrame(
                df, time_col="time", target_col="target", enforce_temporal_uniqueness=True
            )


class TestNullCounts:
    def test_fused_null_counts(self, spark):
        df = make_ts_df(spark, n=50, k=2, time_numeric=True, seed=7)
        df = df.withColumn(
            "feature_1", F.when(F.col("time") < 5, F.lit(None).cast("double")).otherwise(F.col("feature_1"))
        ).withColumn(
            "feature_2", F.when(F.col("time") < 3, F.lit(float("nan"))).otherwise(F.col("feature_2"))
        )
        counts = validation.null_counts(df)
        assert counts["feature_1"] == 5
        assert counts["feature_2"] == 3  # NaN counted as null (reference parity)
        assert counts["target"] == 0


class TestSkewAwareLayout:
    """VERDICT r3 #7: ensure_layout(detect_skew=True) measures key skew
    with the skew_profile pre-flight and derives the salt factor from the
    MEASURED top-key fraction — a planted hot key gets a salted
    (id, time_chunk) layout automatically; uniform tables stay unsalted."""

    def _table(self, spark, hot_rows, n_entities=50, rows_per=20):
        rows = [
            (f"e{e:03d}", float(86400 * 365 + e * 1000 + i), float(i))
            for e in range(n_entities)
            for i in range(rows_per)
        ]
        # hot entity spanning the full corpus time range
        span = n_entities * 1000 + rows_per
        rows += [
            ("hot", float(86400 * 365 + (i * span) // max(hot_rows, 1)), float(i))
            for i in range(hot_rows)
        ]
        return spark.createDataFrame(rows, ["doc_id", "t", "value"])

    def test_hot_key_gets_salted_layout(self, spark):
        df = self._table(spark, hot_rows=200)  # hot = ~17% of 1200 rows
        tf = TemporalFrame(
            df, time_col="t", target_col="value", id_col="doc_id", sort=False
        ).ensure_layout(num_partitions=8, detect_skew=True, skew_threshold=0.05)
        assert tf.chunk_col == "time_chunk"
        out = tf.df
        assert "time_chunk" in out.columns
        # measured fraction ~0.167, parallelism 8 -> S = ceil(1.33) = 2
        n_chunks = (
            out.filter(F.col("doc_id") == "hot")
            .select("time_chunk").distinct().count()
        )
        assert n_chunks >= 2
        # every (id, chunk) group is time-contiguous by construction
        # (chunk = floor(epoch/chunk_seconds)) — monotone in time
        pdf = (
            out.filter(F.col("doc_id") == "hot")
            .select("t", "time_chunk").toPandas().sort_values("t")
        )
        assert pdf["time_chunk"].is_monotonic_increasing

    def test_uniform_table_stays_unsalted(self, spark):
        df = self._table(spark, hot_rows=0)
        tf = TemporalFrame(
            df, time_col="t", target_col="value", id_col="doc_id", sort=False
        ).ensure_layout(num_partitions=8, detect_skew=True, skew_threshold=0.05)
        assert tf.chunk_col is None
        assert "time_chunk" not in tf.df.columns

    def test_salted_layout_chunked_shift_matches_plain(self, spark):
        """Correctness through the salted lane: shift_target_chunked over
        the frame's auto-derived chunk column == plain shift_target."""
        from temporalscope_spark.operators.shift import shift_target, shift_target_chunked

        df = self._table(spark, hot_rows=200)
        tf = TemporalFrame(
            df, time_col="t", target_col="value", id_col="doc_id", sort=False
        ).ensure_layout(num_partitions=8, detect_skew=True, skew_threshold=0.05)
        chunked = (
            shift_target_chunked(
                tf.df, "t", "value", n_lags=1, id_col="doc_id",
                chunk_col=tf.chunk_col,
            )
            .select("doc_id", "t", "value_shift_1")
            .toPandas().sort_values(["doc_id", "t"]).reset_index(drop=True)
        )
        plain = (
            shift_target(df, "t", "value", n_lags=1, id_col="doc_id")
            .select("doc_id", "t", "value_shift_1")
            .toPandas().sort_values(["doc_id", "t"]).reset_index(drop=True)
        )
        assert chunked.equals(plain)

    def test_detect_skew_off_is_unchanged(self, spark):
        df = self._table(spark, hot_rows=200)
        tf = TemporalFrame(
            df, time_col="t", target_col="value", id_col="doc_id", sort=False
        ).ensure_layout(num_partitions=8)
        assert tf.chunk_col is None
        assert "time_chunk" not in tf.df.columns
