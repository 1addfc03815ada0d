"""split_leakage_check (operators/cv.py) and weight_diagnostics / Kish
ESS (operators/sampling.py)."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.cv import split_leakage_check
from temporalscope_spark.operators.sampling import weight_diagnostics


def test_leak_detected_across_splits(spark):
    rows = [
        (1, "train", "the same text"),
        (2, "test", "THE  same   text"),   # normalizes identically
        (3, "train", "unique one"),
        (4, "test", "unique two"),
        (5, "train", "the same text"),     # third copy, same split as 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    out = split_leakage_check(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["n_splits"] == 2
    assert r["splits"] == "test,train"


def test_no_leak_when_dups_stay_in_one_split(spark):
    rows = [
        (1, "train", "dup text"),
        (2, "train", "dup text"),
        (3, "test", "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    assert split_leakage_check(df).count() == 0


def test_leakage_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(DataFrameValidationError):
        split_leakage_check(df)  # no split column


def test_ess_uniform_weights_equal_n(spark):
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(10)], "id long, g string, w double"
    )
    r = weight_diagnostics(df, "w", "g").collect()[0]
    assert r["n"] == 10
    assert r["ess"] == pytest.approx(10.0)
    assert r["ess_ratio"] == pytest.approx(1.0)


def test_ess_dominant_weight_collapses(spark):
    df = spark.createDataFrame(
        [(0, 1000.0)] + [(i, 1.0) for i in range(1, 10)], "id long, w double"
    )
    r = weight_diagnostics(df, "w").collect()[0]
    sw, sww = 1009.0, 1000.0**2 + 9
    assert r["ess"] == pytest.approx(round(sw * sw / sww, 6))
    assert r["ess"] < 1.1


def test_ess_zero_weights(spark):
    df = spark.createDataFrame([(1, 0.0), (2, 0.0)], "id long, w double")
    r = weight_diagnostics(df, "w").collect()[0]
    assert r["ess"] == 0.0
    with pytest.raises(DataFrameValidationError):
        weight_diagnostics(df, "nope")
