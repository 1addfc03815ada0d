"""Padding parity suite.

Ports /root/reference/test/unit/partition/test_padding_functional.py (5
tests): padded length, per-column mean preservation |t| < 1e-6, null/NaN
rejection, pre/post. Plus engine-specific token-array and per-group padding.
"""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.operators.padding import (
    mean_fill_pad,
    pad_groups_mean_fill,
    pad_token_arrays,
)
from tests.conftest import make_ts_df


@pytest.fixture
def df3(spark):
    # reference fixture: n=3, k=2, drop_time, seed 42
    return make_ts_df(spark, n=3, k=2, time_numeric=True, seed=42).drop("time")


@pytest.mark.parametrize("padding", ["pre", "post"])
def test_padded_length_and_means(spark, df3, padding):
    out = mean_fill_pad(df3, target_len=5, padding=padding)
    pdf = out.toPandas().sort_values("_order").reset_index(drop=True)
    assert len(pdf) == 5
    orig = df3.toPandas()
    for c in orig.columns:
        assert abs(pdf[c].mean() - orig[c].mean()) < 1e-6
    # pad rows sit before the data for 'pre', after for 'post'
    mean_t = orig["target"].mean()
    if padding == "pre":
        assert pdf.loc[0, "target"] == pytest.approx(mean_t)
        assert pdf.loc[1, "target"] == pytest.approx(mean_t)
    else:
        assert pdf.loc[3, "target"] == pytest.approx(mean_t)
        assert pdf.loc[4, "target"] == pytest.approx(mean_t)


def test_null_rejection(spark):
    df = make_ts_df(spark, n=3, k=2, time_numeric=True, seed=42).drop("time")
    df = df.withColumn(
        "feature_1",
        F.when(F.rand(1) < 2.0, F.lit(None).cast("double")),
    )
    with pytest.raises(ValueError, match="Cannot process data containing null values"):
        mean_fill_pad(df, target_len=5)


def test_nan_rejection(spark, df3):
    df = df3.withColumn("feature_2", F.lit(float("nan")))
    with pytest.raises(ValueError, match="Cannot process data containing null values"):
        mean_fill_pad(df, target_len=5)


def test_target_len_too_small(spark, df3):
    with pytest.raises(
        ValueError, match=r"target_len \(2\) must be greater than current length \(3\)"
    ):
        mean_fill_pad(df3, target_len=2)


def test_invalid_padding_direction(spark, df3):
    with pytest.raises(ValueError, match="padding must be 'pre' or 'post'"):
        mean_fill_pad(df3, target_len=5, padding="sideways")


def test_pad_token_arrays(spark):
    from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences

    df = generate_tokenized_sequences(spark, num_rows=50, num_docs=5)
    out = pad_token_arrays(df, target_len=64, pad_id=0)
    pdf = out.toPandas()
    assert (pdf["n_tok"] == 64).all()
    assert pdf["tokens"].map(len).eq(64).all()
    # original prefix preserved (token-array equality invariant)
    orig = df.toPandas().set_index(["doc_id", "seq_idx"])
    for _, row in pdf.iterrows():
        o = orig.loc[(row["doc_id"], row["seq_idx"]), "tokens"]
        assert list(row["tokens"][: len(o)]) == list(o)
        assert all(t == 0 for t in row["tokens"][len(o):])


def test_pad_groups_mean_fill(spark):
    data = [("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 1.0, 5.0)]
    df = spark.createDataFrame(data, ["id", "t", "x"])
    out = pad_groups_mean_fill(df, "id", target_len=3, numeric_cols=["t", "x"])
    pdf = out.toPandas()
    assert len(pdf) == 6
    b = pdf[pdf["id"] == "b"]
    assert len(b) == 3
    # pad rows carry entity-b means
    assert sorted(b["x"].tolist()) == [5.0, 5.0, 5.0]
