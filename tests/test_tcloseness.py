"""t-closeness audit (operators/pii.py) vs a pure-Python TVD reference,
including absent-value mass and the NULL-is-a-value convention."""

from collections import Counter

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.pii import t_closeness

ROWS = [
    # (zip, age_band, disease)
    ("940", "20s", "flu"),
    ("940", "20s", "flu"),
    ("940", "20s", "flu"),          # skewed class: all flu
    ("941", "30s", "flu"),
    ("941", "30s", "cancer"),
    ("941", "30s", "cold"),
    ("941", "30s", "cold"),
    ("942", "20s", "cancer"),
    ("942", "20s", "cancer"),       # skewed toward the rare value
    ("942", "20s", None),           # NULL sensitive value
    ("943", "40s", "flu"),
    ("943", "40s", "cold"),
    ("943", "40s", "cancer"),
    ("943", "40s", None),
]


def _brute_tvd(rows, quasi, sens_idx):
    """½ Σ_v |p_g(v) − p(v)| over ALL global values (absent → full p(v))."""
    global_c = Counter(r[sens_idx] for r in rows)
    n = len(rows)
    groups = {}
    for r in rows:
        groups.setdefault(tuple(r[i] for i in quasi), []).append(r[sens_idx])
    out = {}
    for g, vals in groups.items():
        cg = Counter(vals)
        ng = len(vals)
        tvd = 0.5 * sum(
            abs(cg.get(v, 0) / ng - c / n) for v, c in global_c.items()
        )
        out[g] = (ng, tvd)
    return out


def _df(spark):
    return spark.createDataFrame(ROWS, "zip string, age_band string, disease string")


def test_matches_bruteforce_and_filters(spark):
    want = _brute_tvd(ROWS, (0, 1), 2)
    t = 0.2
    got = {
        (r["zip"], r["age_band"]): (r["group_size"], r["tvd"], r["excess"])
        for r in t_closeness(_df(spark), ["zip", "age_band"], "disease", t=t).collect()
    }
    expect = {g: v for g, v in want.items() if v[1] > t}
    assert set(got) == set(expect)
    for g, (ng, tvd) in expect.items():
        assert got[g][0] == ng
        assert got[g][1] == pytest.approx(tvd, abs=1e-6)
        assert got[g][2] == pytest.approx(tvd - t, abs=1e-6)
    # the single-value class ("940","20s") must be the worst violator
    assert ("940", "20s") in got


def test_null_sensitive_is_a_value(spark):
    # class 942 has a NULL; its TVD must include NULL as a category.
    want = _brute_tvd(ROWS, (0,), 2)
    got = {
        r["zip"]: r["tvd"]
        for r in t_closeness(_df(spark), ["zip"], "disease", t=0.01).collect()
    }
    for (z,), (_, tvd) in want.items():
        if tvd > 0.01:
            assert got[z] == pytest.approx(tvd, abs=1e-6)


def test_t_one_means_no_violations(spark):
    assert t_closeness(_df(spark), ["zip"], "disease", t=0.999).count() == 0


def test_errors(spark):
    df = _df(spark)
    with pytest.raises(DataFrameValidationError):
        t_closeness(df, [], "disease")
    with pytest.raises(DataFrameValidationError):
        t_closeness(df, ["zip"], "disease", t=0.0)
    with pytest.raises(DataFrameValidationError):
        t_closeness(df, ["zip"], "nope")
    with pytest.raises(DataFrameValidationError):
        t_closeness(df, ["zip", "disease"], "disease")
    with pytest.raises(DataFrameValidationError):
        t_closeness(df.limit(0), ["zip"], "disease")
