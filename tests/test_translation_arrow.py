"""Equivalence tests for the Arrow lanes of the text-overlap metrics:
engine='arrow' must produce bit-identical rows to engine='expr' (the
sufficient statistics are exact integers in both lanes, so every derived
double matches exactly)."""

from __future__ import annotations

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.metrics.translation import (
    bleu_corpus,
    chrf_corpus,
    rouge_l_pairs,
    rouge_n_corpus,
)

PAIRS = [
    (1, "the cat sat on the mat", "the cat sat on a mat"),
    (2, "a b c d e f g", "g f e d c b a"),
    (3, "", "non empty reference"),
    (4, "only candidate text", ""),
    (5, "", ""),
    (6, "x", "x"),
    (7, "repeat repeat repeat repeat", "repeat repeat other other"),
    (8, "Tabs\tand  runs   of spaces", "tabs and runs of spaces"),
    (9, "short", "a much longer reference with many extra words here"),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(
        PAIRS, "pair_id long, candidate string, reference string"
    )


def _rows(df):
    return [r.asDict() for r in df.orderBy(*df.columns).collect()]


def test_bleu_engines_identical(pairs_df):
    a = _rows(bleu_corpus(pairs_df, max_n=4, engine="expr"))
    b = _rows(bleu_corpus(pairs_df, max_n=4, engine="arrow"))
    assert a == b


def test_chrf_engines_identical(pairs_df):
    a = _rows(chrf_corpus(pairs_df, max_n=6, beta=2.0, engine="expr"))
    b = _rows(chrf_corpus(pairs_df, max_n=6, beta=2.0, engine="arrow"))
    assert a == b


def test_rouge_n_engines_identical(pairs_df):
    a = _rows(rouge_n_corpus(pairs_df, ns=(1, 2), engine="expr"))
    b = _rows(rouge_n_corpus(pairs_df, ns=(1, 2), engine="arrow"))
    assert a == b


def test_rouge_l_engines_identical(pairs_df):
    a = _rows(rouge_l_pairs(pairs_df, id_cols=("pair_id",), engine="expr"))
    b = _rows(rouge_l_pairs(pairs_df, id_cols=("pair_id",), engine="arrow"))
    assert a == b


def test_bad_engine_raises(pairs_df):
    with pytest.raises(DataFrameValidationError):
        chrf_corpus(pairs_df, engine="pandas")
