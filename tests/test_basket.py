"""Association rules and Markov transitions: brute-force reference
parity, Apriori pruning, normalization, ordering determinism."""

from __future__ import annotations

import itertools
import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.basket import association_rules, transition_matrix


def _ref_rules(baskets, min_support, min_confidence):
    n = len(baskets)
    sets = [set(b) for b in baskets.values()]
    items = sorted(set().union(*sets)) if sets else []
    cnt = {i: sum(1 for s in sets if i in s) for i in items}
    minc = max(1, math.ceil(min_support * n))
    out = {}
    for a, b in itertools.permutations(items, 2):
        nab = sum(1 for s in sets if a in s and b in s)
        if nab < minc or cnt[a] < minc or cnt[b] < minc:
            continue
        conf = nab / cnt[a]
        if conf < min_confidence:
            continue
        out[(a, b)] = (
            nab,
            round(nab / n, 6),
            round(conf, 6),
            round(conf / (cnt[b] / n), 6),
        )
    return out


BASKETS = {
    1: ["milk", "bread", "butter"],
    2: ["milk", "bread"],
    3: ["milk", "beer"],
    4: ["bread", "butter"],
    5: ["milk", "bread", "butter", "beer"],
    6: ["caviar"],  # infrequent item: Apriori must prune it
}


def _df(spark, baskets):
    rows = [(bid, item) for bid, items in baskets.items() for item in items]
    return spark.createDataFrame(rows, "basket long, item string")


class TestAssociationRules:
    def test_reference_parity(self, spark):
        got = association_rules(
            _df(spark, BASKETS), "basket", "item", min_support=0.3
        ).collect()
        ref = _ref_rules(BASKETS, 0.3, 0.0)
        assert {
            (r["antecedent"], r["consequent"]): (
                r["n_pair"], r["support"], r["confidence"], r["lift"]
            )
            for r in got
        } == ref
        # deterministic ordering
        assert [tuple(r[:2]) for r in got] == sorted(tuple(r[:2]) for r in got)

    def test_confidence_filter(self, spark):
        got = association_rules(
            _df(spark, BASKETS), "basket", "item",
            min_support=0.3, min_confidence=0.8,
        ).collect()
        ref = _ref_rules(BASKETS, 0.3, 0.8)
        assert {(r["antecedent"], r["consequent"]) for r in got} == set(ref)

    def test_duplicate_rows_count_once(self, spark):
        b = {1: ["x", "x", "y"], 2: ["x", "y"]}
        got = association_rules(_df(spark, b), "basket", "item", 0.5).collect()
        xy = [r for r in got if r["antecedent"] == "x"][0]
        assert xy["n_pair"] == 2 and xy["support"] == 1.0

    def test_lift_direction_symmetric(self, spark):
        got = association_rules(
            _df(spark, BASKETS), "basket", "item", min_support=0.3
        ).collect()
        by = {(r["antecedent"], r["consequent"]): r for r in got}
        for (a, b), r in by.items():
            assert by[(b, a)]["lift"] == pytest.approx(r["lift"], abs=2e-6)

    def test_bad_support_raises(self, spark):
        with pytest.raises(DataFrameValidationError, match="min_support"):
            association_rules(_df(spark, BASKETS), "basket", "item", 0.0)


class TestTransitionMatrix:
    def test_hand_counts(self, spark):
        rows = [
            ("u1", 1.0, "a"), ("u1", 2.0, "b"), ("u1", 3.0, "a"),
            ("u1", 4.0, "b"),
            ("u2", 1.0, "a"), ("u2", 2.0, "a"),
            ("u3", 9.0, "c"),  # single event: no transition
        ]
        df = spark.createDataFrame(rows, "user string, ts double, ty string")
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in transition_matrix(df, "ts", "user", "ty").collect()
        }
        # u1: (a,b),(b,a),(a,b); u2: (a,a) — row 'a' totals 3
        assert got == {
            ("a", "b"): (2, 0.666667),
            ("b", "a"): (1, 1.0),
            ("a", "a"): (1, 0.333333),
        }

    def test_rows_normalize_to_one(self, spark):
        rows = [
            ("u", float(i), t)
            for i, t in enumerate("abacabcbabccab")
        ]
        df = spark.createDataFrame(rows, "user string, ts double, ty string")
        got = transition_matrix(df, "ts", "user", "ty").collect()
        sums = {}
        for r in got:
            sums[r["from_type"]] = sums.get(r["from_type"], 0.0) + r["prob"]
        for v in sums.values():
            assert v == pytest.approx(1.0, abs=1e-5)

    def test_tiebreak_pins_duplicate_timestamps(self, spark):
        rows = [("u", 1.0, 2, "b"), ("u", 1.0, 1, "a"), ("u", 2.0, 3, "c")]
        df = spark.createDataFrame(rows, "user string, ts double, k int, ty string")
        got = {
            (r["from_type"], r["to_type"])
            for r in transition_matrix(
                df, "ts", "user", "ty", tiebreak_col="k"
            ).collect()
        }
        assert got == {("a", "b"), ("b", "c")}
