"""DatasetValidator parity (reference test_dataset_validator.py contract)
+ checkpoint/resume kill-and-restart test (north rule)."""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.checkpoint import CheckpointStore, run_resumable, snapshot_fingerprint
from temporalscope_spark.datasets.validator import DatasetValidator, ValidationResult
from tests.conftest import make_ts_df


@pytest.fixture
def good_df(spark):
    # 5000 samples, 4 features → all checks pass
    return make_ts_df(spark, n=5000, k=4, time_numeric=True)


class TestDatasetValidator:
    def test_all_checks_pass(self, spark, good_df):
        v = DatasetValidator(time_col="time", target_col="target", enable_warnings=False)
        results = v.fit_transform(good_df)
        assert all(r.passed for r in results.values()), {
            k: r.message for k, r in results.items() if not r.passed
        }

    def test_sample_size_too_small(self, spark):
        df = make_ts_df(spark, n=1000, k=4, time_numeric=True)
        v = DatasetValidator("time", "target", enable_warnings=False)
        r = v.fit_transform(df)["sample_size"]
        assert not r.passed
        assert "fewer than recommended minimum (3000)" in r.message
        assert r.details == {"num_samples": 1000}

    def test_sample_size_too_large_boundary(self, spark):
        df = make_ts_df(spark, n=50001, k=4, time_numeric=True)
        v = DatasetValidator("time", "target", enable_warnings=False)
        r = v.fit_transform(df)["sample_size"]
        assert not r.passed
        assert "more than recommended maximum (50000)" in r.message

    def test_feature_count_bounds(self, spark):
        df = make_ts_df(spark, n=3000, k=2, time_numeric=True)
        v = DatasetValidator("time", "target", enable_warnings=False)
        r = v.fit_transform(df)["feature_count"]
        assert not r.passed and "oversimplified" in r.message

    def test_feature_ratio(self, spark):
        # 40 features / 100 samples = 0.4 > 0.1 (bypass fit's size gate by
        # calling transform directly)
        df = make_ts_df(spark, n=100, k=40, time_numeric=True)
        v = DatasetValidator("time", "target", enable_warnings=False)
        r = v.transform(df)["feature_ratio"]
        assert not r.passed and "overfitting" in r.message

    def test_feature_variability_low_cardinality(self, spark):
        df = make_ts_df(spark, n=3000, k=4, time_numeric=True).withColumn(
            "feature_1", F.floor(F.col("feature_1") * 3).cast("double")
        )
        v = DatasetValidator("time", "target", enable_warnings=False)
        r = v.transform(df)["feature_variability"]
        assert not r.passed and "feature_1" in r.message

    def test_fit_null_gate(self, spark):
        df = make_ts_df(spark, n=3000, k=4, time_numeric=True).withColumn(
            "feature_2", F.when(F.col("time") < 5, None).otherwise(F.col("feature_2"))
        )
        v = DatasetValidator("time", "target", enable_warnings=False)
        with pytest.raises(ValueError, match="Missing values detected in columns: feature_2"):
            v.fit(df)

    def test_fit_numeric_gate(self, spark):
        df = make_ts_df(spark, n=100, k=2, time_numeric=True).withColumn("bad", F.lit("s"))
        v = DatasetValidator("time", "target", enable_warnings=False)
        with pytest.raises(ValueError, match="Column bad must be numeric"):
            v.fit(df)

    def test_missing_columns(self, spark, good_df):
        v = DatasetValidator("nope", "target", enable_warnings=False)
        with pytest.raises(ValueError, match="must exist"):
            v.fit(good_df)

    def test_invalid_check_name(self):
        with pytest.raises(ValueError, match="Invalid checks"):
            DatasetValidator("t", "y", checks_to_run=["bogus"])

    def test_checks_subset(self, spark, good_df):
        v = DatasetValidator(
            "time", "target", checks_to_run=["sample_size"], enable_warnings=False
        )
        results = v.fit_transform(good_df)
        assert set(results) == {"sample_size"}

    def test_fit_transform_equals_fit_then_transform(self, spark, good_df):
        a = DatasetValidator("time", "target", enable_warnings=False).fit_transform(good_df)
        v = DatasetValidator("time", "target", enable_warnings=False)
        b = v.fit(good_df).transform(good_df)
        assert {k: r.to_dict() for k, r in a.items()} == {k: r.to_dict() for k, r in b.items()}

    def test_summary_and_report(self, spark, good_df, capsys):
        v = DatasetValidator("time", "target", enable_warnings=False)
        results = v.fit_transform(good_df)
        summary = ValidationResult.get_validation_summary(results)
        assert summary["failed_checks"] == 0
        v.print_report(results)
        out = capsys.readouterr().out
        assert "Dataset Validation Report" in out and "PASSED" in out

    def test_approx_distinct_path(self, spark, good_df):
        v = DatasetValidator("time", "target", enable_warnings=False, approx_distinct=True)
        r = v.fit_transform(good_df)["feature_variability"]
        assert r.passed


class TestCheckpointResume:
    def test_kill_and_restart_skips_done_buckets(self, spark, tmp_path):
        df = make_ts_df(spark, n=100, k=1, time_numeric=True)
        buckets = [(i, df.filter((F.col("time") >= i * 25) & (F.col("time") < (i + 1) * 25))) for i in range(4)]
        store = CheckpointStore(str(tmp_path / "ckpt"), snapshot_id="snap1")

        calls = []

        def process(b, d):
            calls.append(b)
            if len(calls) == 3:  # simulated crash mid-job, after 2 completions
                raise RuntimeError("kill -9")
            return d.withColumn("x", F.col("target") * 2)

        with pytest.raises(RuntimeError):
            run_resumable(iter(buckets), process, store, sink=lambda b, d: d.count())
        assert store.completed_buckets() == {0, 1}

        calls.clear()

        def process2(b, d):
            calls.append(b)
            return d.withColumn("x", F.col("target") * 2)

        stats = run_resumable(iter(buckets), process2, store, sink=lambda b, d: d.count())
        assert calls == [2, 3]  # completed buckets NOT recomputed
        assert stats == {"processed": 2, "skipped": 2, "rows": 50}
        rec = store.bucket_record(2)
        assert rec["row_count"] == 25 and "duration_sec" in rec["metrics"]

    def test_snapshot_change_invalidates(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "c"), snapshot_id="a")
        store.record_bucket(0, row_count=1)
        assert store.completed_buckets() == {0}
        store2 = CheckpointStore(str(tmp_path / "c"), snapshot_id="b")
        assert store2.completed_buckets() == set()

    def test_fingerprint_deterministic(self):
        assert snapshot_fingerprint("p", 10) == snapshot_fingerprint("p", 10)
        assert snapshot_fingerprint("p", 10) != snapshot_fingerprint("p", 11)
