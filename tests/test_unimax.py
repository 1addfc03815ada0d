"""UniMax budget allocation (operators/sampling.py) vs a pure-Python
waterfilling reference."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.sampling import unimax_allocation


def _ref_unimax(ns, budget, max_epochs):
    caps = sorted((n * max_epochs, g) for g, n in ns.items())
    C = len(caps)
    P, k, Pk = 0.0, 0, 0.0
    for j, (cap, _) in enumerate(caps, start=1):
        if P + cap * (C - j + 1) <= budget:
            k += 1
            Pk = P + cap
        P += cap
    w = (budget - Pk) / (C - k) if k < C else float("inf")
    return {g: min(n * max_epochs, w) for g, n in ns.items()}


def _docs(spark, ns):
    rows = []
    i = 0
    for g, n in ns.items():
        rows.append((i, g, "w " * n))
        i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.mark.parametrize("budget", [7.0, 60.0, 200.0, 10_000.0])
def test_matches_reference_waterfilling(spark, budget):
    ns = {"a": 100, "b": 30, "c": 10, "d": 3}
    got = {
        r["source"]: (r["alloc"], r["epochs"])
        for r in unimax_allocation(
            _docs(spark, ns), budget_tokens=budget, max_epochs=2.0
        ).collect()
    }
    ref = _ref_unimax(ns, budget, 2.0)
    for g, n in ns.items():
        assert got[g][0] == pytest.approx(round(ref[g], 6)), (g, budget)
        assert got[g][1] == pytest.approx(round(ref[g] / n, 6))
        # cap respected
        assert got[g][0] <= n * 2.0 + 1e-9
        assert got[g][1] <= 2.0 + 1e-9


def test_budget_conserved_or_capacity_bound(spark):
    ns = {"a": 100, "b": 30, "c": 10}
    for budget in (50.0, 500.0):
        rows = unimax_allocation(
            _docs(spark, ns), budget_tokens=budget, max_epochs=1.5
        ).collect()
        total = sum(r["alloc"] for r in rows)
        cap_total = sum(n * 1.5 for n in ns.values())
        assert total == pytest.approx(min(budget, cap_total), abs=1e-6)


def test_uniform_when_unconstrained(spark):
    # no source saturates: everyone gets exactly B/C
    ns = {"a": 100, "b": 100, "c": 100}
    rows = unimax_allocation(
        _docs(spark, ns), budget_tokens=30.0, max_epochs=2.0
    ).collect()
    for r in rows:
        assert r["alloc"] == pytest.approx(10.0)


def test_validation(spark):
    d = _docs(spark, {"a": 5})
    with pytest.raises(DataFrameValidationError):
        unimax_allocation(d, budget_tokens=0)
    with pytest.raises(DataFrameValidationError):
        unimax_allocation(d, max_epochs=0)
