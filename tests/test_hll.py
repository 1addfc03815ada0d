"""HyperLogLog sketch (operators/corpus_stats.py) vs a hashlib-based
reference: register parity on the md5 lane, the exact integer rho
identity, bias/small-range corrections, mergeability (merge == one-shot
over the union), and accuracy bounds on a larger vocabulary."""

import hashlib
import math

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import (
    _hll_alpha,
    hll_distinct,
    hll_estimates,
    hll_merge,
    hll_sketch,
)

SEED = 7


def _h(e, seed=SEED):
    return int(hashlib.md5(f"{e}#{seed}".encode()).hexdigest()[:8], 16)


def _words(texts):
    out = set()
    for t in texts:
        out |= {x for x in " ".join(t.lower().split()).split(" ") if x != ""}
    return out


def _ref_registers(elems, p):
    regs = {}
    rem = 32 - p
    for e in elems:
        h = _h(e)
        j = h >> rem
        w = h & ((1 << rem) - 1)
        rho = rem + 1 if w == 0 else rem - w.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def _ref_estimate(regs, p):
    m = 1 << p
    s = (m - len(regs)) * 1.0 + sum(2.0 ** -v for v in regs.values())
    raw = _hll_alpha(m) * m * m / s
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    if raw > 2.0**32 / 30.0:
        return -(2.0**32) * math.log(1.0 - raw / 2.0**32)
    return raw


GA = ["low deep pipe rust", "low deep gold iron zinc"]
GB = ["low deep kelp moss", "fern kelp moss opal"]


def _docs(spark):
    rows = [(i, "a", t) for i, t in enumerate(GA)] + [
        (10 + i, "b", t) for i, t in enumerate(GB)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestSketch:
    def test_registers_match_reference(self, spark):
        out = hll_sketch(_docs(spark), "text", "source", p=6, seed=SEED)
        got = {
            (r["source"], r["j"]): r["m_j"] for r in out.collect()
        }
        want = {}
        for src, texts in (("a", GA), ("b", GB)):
            for j, v in _ref_registers(_words(texts), 6).items():
                want[(src, j)] = v
        assert got == want

    def test_rho_exact_identity(self, spark):
        # every register value must equal rem - bit_length(w) + 1 — no
        # float log in the lane, so parity is exact, not approximate
        out = hll_sketch(_docs(spark), "text", "source", p=4, seed=SEED)
        regs = _ref_registers(_words(GA) | _words(GB), 4)
        assert all(1 <= r["m_j"] <= 29 for r in out.collect())
        assert max(v for v in regs.values()) <= 29

    def test_param_validation(self, spark):
        with pytest.raises(DataFrameValidationError):
            hll_sketch(_docs(spark), p=3)
        with pytest.raises(DataFrameValidationError):
            hll_sketch(_docs(spark), p=19)
        with pytest.raises(DataFrameValidationError):
            hll_sketch(_docs(spark), ngram=0)


class TestEstimate:
    def test_matches_reference_formula(self, spark):
        est = {
            r["source"]: r["est_distinct"]
            for r in hll_distinct(_docs(spark), "text", "source", p=6).collect()
        }
        for src, texts in (("a", GA), ("b", GB)):
            want = _ref_estimate(_ref_registers(_words(texts), 6), 6)
            assert est[src] == pytest.approx(round(want, 6), abs=1e-9)

    def test_small_range_is_linear_counting(self, spark):
        # tiny vocab, large m: raw <= 2.5m with zeros -> m*ln(m/V)
        regs = _ref_registers(_words(GA), 10)
        m = 1 << 10
        assert _ref_estimate(regs, 10) == pytest.approx(
            m * math.log(m / (m - len(regs)))
        )
        est = {
            r["source"]: r["est_distinct"]
            for r in hll_distinct(_docs(spark), "text", "source", p=10).collect()
        }
        assert est["a"] == pytest.approx(round(_ref_estimate(regs, 10), 6))

    def test_accuracy_on_larger_vocab(self, spark):
        # 5000 distinct tokens, p=10 -> typical error ~1.04/sqrt(1024) ~ 3%
        rows = [(i, "x", " ".join(f"tok{j}" for j in range(i, i + 5)))
                for i in range(0, 5000, 5)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        est = hll_distinct(df, "text", "source", p=10).collect()[0]
        n_true = len({f"tok{j}" for i in range(0, 5000, 5) for j in range(i, i + 5)})
        assert abs(est["est_distinct"] - n_true) / n_true < 0.10


class TestMerge:
    def test_merge_equals_one_shot(self, spark):
        docs = _docs(spark)
        a = hll_sketch(docs.filter("doc_id < 10"), "text", "source", p=6)
        b = hll_sketch(docs.filter("doc_id >= 10"), "text", "source", p=6)
        merged = hll_merge(a, b, "source")
        full = hll_sketch(docs, "text", "source", p=6)
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, full.collect()))
        assert got == want
        # and the estimates agree too
        em = {r["source"]: r["est_distinct"]
              for r in hll_estimates(merged, "source", p=6).collect()}
        ef = {r["source"]: r["est_distinct"]
              for r in hll_estimates(full, "source", p=6).collect()}
        assert em == ef
