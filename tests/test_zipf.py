"""Zipf-law fit (operators/corpus_stats.zipf_fit) vs numpy OLS."""

import math

import numpy as np
import pytest

from temporalscope_spark.operators.corpus_stats import zipf_fit


def _docs(spark, freqs):
    """One doc whose text repeats word w{i} freqs[i] times."""
    text = " ".join(
        " ".join([f"w{i}"] * f) for i, f in enumerate(freqs)
    )
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def _ref(freqs):
    fr = sorted(freqs, reverse=True)
    x = np.log(np.arange(1, len(fr) + 1, dtype=float))
    y = np.log(np.array(fr, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    return round(slope, 6), round(intercept, 6), round(r * r, 6)


def test_exact_power_law(spark):
    freqs = [16, 8, 4, 2, 1]
    row = zipf_fit(_docs(spark, freqs)).collect()[0]
    s, i, r2 = _ref(freqs)
    assert row["n_vocab"] == 5
    assert row["slope"] == pytest.approx(s, abs=2e-6)
    assert row["intercept"] == pytest.approx(i, abs=2e-6)
    assert row["r2"] == pytest.approx(r2, abs=2e-6)


def test_true_zipf_slope_near_minus_one(spark):
    freqs = [round(120 / r) for r in range(1, 13)]
    row = zipf_fit(_docs(spark, freqs)).collect()[0]
    assert -1.15 < row["slope"] < -0.85
    assert row["r2"] > 0.97


def test_degenerate_single_word(spark):
    row = zipf_fit(_docs(spark, [7])).collect()[0]
    assert row["n_vocab"] == 1
    assert (row["slope"], row["intercept"], row["r2"]) == (0.0, 0.0, 0.0)


def test_uniform_freqs_zero_yvar(spark):
    # all words equal frequency: slope 0, r2 guarded to 0
    row = zipf_fit(_docs(spark, [3, 3, 3, 3])).collect()[0]
    assert row["slope"] == pytest.approx(0.0, abs=1e-9)
    assert row["r2"] == 0.0
