"""Bradley-Terry MM fitting (modeling/bt.py) vs a pure-Python Hunter
2004 reference with the same fold order and per-round quantization."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.modeling.bt import (
    bt_comparison_matrix,
    bt_win_probability,
    fit_bradley_terry,
)


def _ref_fit(pairs, rounds):
    items = sorted({i for p in pairs for i in p})
    wins = {i: sum(1 for w, _ in pairs if w == i) for i in items}
    n = {}
    for w_, l_ in pairs:
        k = (min(w_, l_), max(w_, l_))
        n[k] = n.get(k, 0) + 1
    w = {i: round(1.0 / len(items), 12) for i in items}
    for _ in range(rounds):
        u = {}
        for i in items:
            den = 0.0
            for j in items:
                if j == i:
                    continue
                nij = n.get((min(i, j), max(i, j)), 0)
                if nij:
                    den += nij / (w[i] + w[j])
            u[i] = wins[i] / den
        tot = 0.0
        for i in items:
            tot += u[i]
        w = {i: round(u[i] / tot, 12) for i in items}
    return {i: round(w[i], 6) for i in items}


PAIRS = [("a", "b")] * 3 + [("b", "a")] + [("a", "c")] * 2 + [("c", "b")] * 2


def _df(spark, pairs=PAIRS):
    return spark.createDataFrame(pairs, "winner string, loser string")


def test_fit_matches_reference(spark):
    got = {
        r["item"]: r["strength"]
        for r in fit_bradley_terry(_df(spark), num_rounds=5).collect()
    }
    assert got == _ref_fit(PAIRS, 5)


def test_matrix_and_wins(spark):
    m, wins = bt_comparison_matrix(_df(spark))
    mm = {(r["i"], r["j"]): r["n"] for r in m.collect()}
    assert mm == {
        ("a", "b"): 4, ("b", "a"): 4,
        ("a", "c"): 2, ("c", "a"): 2,
        ("b", "c"): 2, ("c", "b"): 2,
    }
    assert {r["item"]: r["wins"] for r in wins.collect()} == {"a": 5, "b": 1, "c": 2}


def test_all_loss_item_goes_to_zero(spark):
    pairs = [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")]
    got = {
        r["item"]: r["strength"]
        for r in fit_bradley_terry(_df(spark, pairs), num_rounds=8).collect()
    }
    assert got["c"] == 0.0
    assert got == _ref_fit(pairs, 8)


def test_self_pairs_dropped(spark):
    pairs = PAIRS + [("a", "a")] * 10
    got = {
        r["item"]: r["strength"]
        for r in fit_bradley_terry(_df(spark, pairs), num_rounds=5).collect()
    }
    assert got == _ref_fit(PAIRS, 5)


def test_win_probability_complements(spark):
    s = fit_bradley_terry(_df(spark), num_rounds=5)
    p = {
        (r["item_a"], r["item_b"]): r["p_win"]
        for r in bt_win_probability(s).collect()
    }
    for (a, b), v in p.items():
        assert v + p[(b, a)] == pytest.approx(1.0, abs=2e-6)
    # the dominant item beats everyone with p > 0.5
    assert p[("a", "b")] > 0.5 and p[("a", "c")] > 0.5


def test_validation_errors(spark):
    with pytest.raises(DataFrameValidationError):
        fit_bradley_terry(_df(spark), num_rounds=0)
    with pytest.raises(DataFrameValidationError):
        fit_bradley_terry(_df(spark, [("a", "a")]))
    with pytest.raises(DataFrameValidationError):
        bt_comparison_matrix(_df(spark).drop("loser"))
