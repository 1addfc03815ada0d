"""SlidingWindowPartitioner parity suite (spec from the commented-out
reference class — SURVEY.md §2.4 W3) + scale-path bucket labeling."""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.frame import TemporalFrame
from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
from tests.conftest import make_ts_df


@pytest.fixture
def tf100(spark):
    df = make_ts_df(spark, n=100, k=1, time_numeric=True)
    return TemporalFrame(df, time_col="time", target_col="target", sort=False)


def test_setup_derives_window_from_num_partitions(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=5)
    p.setup()
    assert p.window_size == 20 and p.stride == 20
    assert p.partition_scheme == "num_partitions"


def test_setup_derives_num_from_window(spark, tf100):
    p = SlidingWindowPartitioner(tf100, window_size=20, stride=10)
    p.setup()
    assert p.num_partitions == 9
    assert p.partition_scheme == "window_size"


def test_fit_bounds_match_reference_formula(spark, tf100):
    # time = 0..99 numeric; window 20, stride 20 → 5 windows
    p = SlidingWindowPartitioner(tf100, num_partitions=5, train_pct=0.7)
    p.setup()
    p.fit()
    parts = p.metadata["partitions"]
    assert len(parts) == 5
    # first window rows 0..19: s=0, e=19; train [0, 13.3), test [13.3, 19)
    s, hi = parts[0]["train"]
    assert s == 0.0 and hi == pytest.approx(19 * 0.7)
    lo, e = parts[0]["test"]
    assert lo == pytest.approx(19 * 0.7) and e == 19.0
    assert parts[0]["validation"] is None
    # second window starts at row 20
    assert parts[1]["train"][0] == 20.0


def test_transform_yields_range_filtered_frames(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=5, train_pct=0.7)
    p.setup()
    p.fit()
    first = next(p.transform())
    train = first["train"].toPandas()
    test = first["test"].toPandas()
    # half-open [0, 13.3) → rows 0..13 ; [13.3, 19) → rows 14..18
    assert len(train) == 14
    assert len(test) == 5
    assert first["validation"] is None


def test_validation_split(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=5, train_pct=0.6, test_pct=0.2, val_pct=0.2)
    p.setup()
    p.fit()
    part = p.metadata["partitions"][0]
    assert part["validation"] is not None
    lo, hi = part["validation"]
    assert lo == 19.0 and hi == pytest.approx(19 + 19 * 0.2)


def test_transform_before_fit_raises(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=5)
    with pytest.raises(RuntimeError, match="Call `fit` before `transform`"):
        next(p.transform())


def test_partitions_property(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=4)
    p.setup()
    p.fit()
    parts = p.partitions
    assert len(parts) == 4


def test_with_bucket_labels_one_pass(spark, tf100):
    p = SlidingWindowPartitioner(tf100, num_partitions=5, train_pct=0.7)
    p.setup()
    p.fit()
    labeled = p.with_bucket_labels().toPandas()
    assert set(labeled["bucket"].unique()) == {0, 1, 2, 3, 4}
    # bucket/split counts agree with the per-filter transform path
    for b, part in enumerate(p.transform()):
        n_train = len(part["train"].toPandas())
        lab = labeled[(labeled["bucket"] == b) & (labeled["split"] == "train")]
        assert len(lab) == n_train, f"bucket {b}"


def test_with_bucket_labels_requires_nonoverlap(spark, tf100):
    p = SlidingWindowPartitioner(tf100, window_size=20, stride=10)
    p.setup()
    p.fit()
    with pytest.raises(ValueError, match="stride == window_size"):
        p.with_bucket_labels()


def test_insufficient_rows(spark):
    df = make_ts_df(spark, n=10, k=1, time_numeric=True)
    tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
    p = SlidingWindowPartitioner(tf, window_size=20)
    with pytest.raises(ValueError, match=r"Insufficient rows \(10\) for `window_size=20`"):
        p.setup()


def test_datetime_time_col(spark):
    df = make_ts_df(spark, n=40, k=1, time_numeric=False)
    tf = TemporalFrame(df, time_col="time", target_col="target", sort=False)
    p = SlidingWindowPartitioner(tf, num_partitions=4, train_pct=0.5)
    p.setup()
    p.fit()
    parts = p.metadata["partitions"]
    assert len(parts) == 4
    import datetime as dt

    s, hi = parts[0]["train"]
    assert isinstance(s, dt.datetime)
    # window 0 covers days 0..9: midpoint split at day 4.5
    assert (hi - s) == dt.timedelta(days=4.5)
