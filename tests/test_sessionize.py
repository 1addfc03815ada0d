"""Sessionize + as-of join + fill operator tests."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.operators.asof import asof_join, backward_fill, forward_fill, range_join
from temporalscope_spark.operators.sessionize import (
    session_bounds,
    sessionize,
    sessionize_builtin,
)


def _mk_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap 2h > 1h between idx 1 and 2)
        ("u1", base, 1.0),
        ("u1", base + dt.timedelta(minutes=10), 2.0),
        ("u1", base + dt.timedelta(hours=3), 3.0),
        ("u1", base + dt.timedelta(hours=3, minutes=30), 4.0),
        # user 2: one session
        ("u2", base, 5.0),
        ("u2", base + dt.timedelta(minutes=59), 6.0),
    ]
    return spark.createDataFrame(rows, ["uid", "ts", "v"])


def test_sessionize_gap_islands(spark):
    df = _mk_events(spark)
    out = sessionize(df, "ts", "uid", gap=3600.0).toPandas().sort_values(["uid", "ts"])
    assert out[out.uid == "u1"]["session_id"].tolist() == [1, 1, 2, 2]
    assert out[out.uid == "u2"]["session_id"].tolist() == [1, 1]


def test_session_bounds(spark):
    df = _mk_events(spark)
    out = session_bounds(df, "ts", "uid", gap=3600.0).toPandas()
    assert len(out) == 3
    u1s2 = out[(out.uid == "u1") & (out.session_id == 2)].iloc[0]
    assert u1s2["n_events"] == 2


def test_sessionize_matches_builtin_session_window(spark):
    """Gap-island sessionize and F.session_window agree on session counts
    and event counts (builtin gap is start-inclusive: new session when
    delta >= gap; use ours with gap-epsilon to align)."""
    df = _mk_events(spark)
    ours = session_bounds(df, "ts", "uid", gap=3600.0 - 1e-6).toPandas()
    builtin = sessionize_builtin(df, "ts", "uid", 3600.0).toPandas()
    assert len(ours) == len(builtin)
    assert sorted(ours["n_events"]) == sorted(builtin["n_events"])


def test_asof_join_backward(spark):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", base + dt.timedelta(hours=h)) for h in [1, 5, 10]], ["id", "t"]
    )
    right = spark.createDataFrame(
        [
            ("k", base, 100.0),
            ("k", base + dt.timedelta(hours=4), 200.0),
            ("k", base + dt.timedelta(hours=20), 300.0),
        ],
        ["id", "rt", "price"],
    )
    out = (
        asof_join(left, right, on="id", left_time="t", right_time="rt", value_cols=["price"])
        .toPandas()
        .sort_values("t")
    )
    assert out["price"].tolist() == [100.0, 200.0, 200.0]


def test_asof_join_exact_match_toggle(spark):
    left = spark.createDataFrame([("k", 5.0)], ["id", "t"])
    right = spark.createDataFrame([("k", 5.0, 1.0), ("k", 3.0, 2.0)], ["id", "rt", "v"])
    with_exact = asof_join(
        left, right, on="id", left_time="t", right_time="rt", value_cols=["v"]
    ).toPandas()
    without = asof_join(
        left, right, on="id", left_time="t", right_time="rt", value_cols=["v"],
        allow_exact_matches=False,
    ).toPandas()
    assert with_exact["v"].iloc[0] == 1.0
    assert without["v"].iloc[0] == 2.0


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("k", 100.0)], ["id", "t"])
    right = spark.createDataFrame([("k", 10.0, 7.0)], ["id", "rt", "v"])
    near = asof_join(
        left, right, on="id", left_time="t", right_time="rt", value_cols=["v"], tolerance=100.0
    ).toPandas()
    far = asof_join(
        left, right, on="id", left_time="t", right_time="rt", value_cols=["v"], tolerance=50.0
    ).toPandas()
    assert near["v"].iloc[0] == 7.0
    assert far["v"].isna().iloc[0]


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame([("k", 1.0)], ["id", "t"])
    right = spark.createDataFrame([("k", 5.0, 9.0)], ["id", "rt", "v"])
    out = asof_join(left, right, on="id", left_time="t", right_time="rt", value_cols=["v"]).toPandas()
    assert out["v"].isna().iloc[0]


def test_forward_backward_fill(spark):
    df = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, 5.0), ("a", 3.0, None), ("a", 4.0, 7.0)],
        ["id", "t", "v"],
    )
    ff = forward_fill(df, "t", ["v"], id_col="id").toPandas().sort_values("t")
    assert ff["v"].tolist()[1:] == [5.0, 5.0, 7.0]
    assert ff["v"].isna().iloc[0]
    bf = backward_fill(df, "t", ["v"], id_col="id").toPandas().sort_values("t")
    assert bf["v"].tolist() == [5.0, 5.0, 7.0, 7.0]


def test_range_join(spark):
    points = spark.createDataFrame([("k", 5.0), ("k", 15.0)], ["id", "p"])
    ivals = spark.createDataFrame([("k", 0.0, 10.0, "low"), ("k", 10.0, 20.0, "high")],
                                  ["id", "lo", "hi", "label"])
    out = range_join(points, ivals, on="id", point_col="p", lo_col="lo", hi_col="hi").toPandas()
    got = dict(zip(out["p"], out["label"]))
    assert got == {5.0: "low", 15.0: "high"}


def test_asof_join_forward_direction(spark):
    """Forward as-of: earliest right value at-or-after each left time;
    exact-match and tolerance semantics mirrored from backward."""
    import datetime as dt

    from temporalscope_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=h)) for h in (0, 2, 5, 9)], "uid int, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=2), 20.0),
            (1, base + dt.timedelta(hours=4), 40.0),
            (1, base + dt.timedelta(hours=8), 80.0),
        ],
        "uid int, rt timestamp, price double",
    )

    fwd = asof_join(left, right, on="uid", left_time="t", right_time="rt",
                    value_cols=["price"], direction="forward")
    got = {r["t"].hour: r["price"] for r in fwd.collect()}
    assert got == {0: 20.0, 2: 20.0, 5: 80.0, 9: None}

    strict = asof_join(left, right, on="uid", left_time="t", right_time="rt",
                       value_cols=["price"], direction="forward",
                       allow_exact_matches=False)
    got2 = {r["t"].hour: r["price"] for r in strict.collect()}
    assert got2 == {0: 20.0, 2: 40.0, 5: 80.0, 9: None}

    tol = asof_join(left, right, on="uid", left_time="t", right_time="rt",
                    value_cols=["price"], direction="forward",
                    tolerance=2 * 3600.0)
    got3 = {r["t"].hour: r["price"] for r in tol.collect()}
    assert got3 == {0: 20.0, 2: 20.0, 5: None, 9: None}


class TestServeFeatures:
    """serve_features (operators/asof.py): multi-table point-in-time
    serving, TTL expiry, prefixes, leakage, collision guard."""

    @pytest.fixture
    def store(self, spark):
        base = dt.datetime(2024, 1, 1)
        spine = spark.createDataFrame(
            [("u1", base + dt.timedelta(hours=h), h) for h in [2, 6, 30]]
            + [("u2", base + dt.timedelta(hours=3), 99)],
            ["uid", "t", "rid"],
        )
        purchases = spark.createDataFrame(
            [
                ("u1", base + dt.timedelta(hours=1), 10.0),
                ("u1", base + dt.timedelta(hours=5), 20.0),
                ("u1", base + dt.timedelta(hours=40), 99.0),  # future for all
            ],
            ["uid", "pt", "amount"],
        )
        profile = spark.createDataFrame(
            [("u1", base, 3), ("u2", base + dt.timedelta(hours=2), 7)],
            ["uid", "ut", "segment"],
        )
        return spine, purchases, profile

    def test_point_in_time_values(self, spark, store):
        from temporalscope_spark.operators.asof import serve_features

        spine, purchases, profile = store
        out = {
            r["rid"]: r
            for r in serve_features(
                spine,
                [
                    {"df": purchases, "time_col": "pt", "prefix": "purch_"},
                    {"df": profile, "time_col": "ut", "prefix": "prof_"},
                ],
                on="uid",
                spine_time="t",
            ).collect()
        }
        assert out[2]["purch_amount"] == 10.0   # hour 2 sees the hour-1 buy
        assert out[6]["purch_amount"] == 20.0   # hour 6 sees hour-5
        assert out[30]["purch_amount"] == 20.0  # hour-40 buy is the future
        assert out[99]["purch_amount"] is None  # u2 never bought
        assert out[2]["prof_segment"] == 3
        assert out[99]["prof_segment"] == 7     # u2's profile from hour 2

    def test_ttl_expires_stale_features(self, spark, store):
        from temporalscope_spark.operators.asof import serve_features

        spine, purchases, _ = store
        out = {
            r["rid"]: r["purch_amount"]
            for r in serve_features(
                spine,
                [{"df": purchases, "time_col": "pt", "prefix": "purch_",
                  "ttl": 6 * 3600.0}],
                on="uid", spine_time="t",
            ).collect()
        }
        assert out[2] == 10.0 and out[6] == 20.0
        assert out[30] is None  # hour-5 buy is 25h stale > 6h TTL

    def test_collision_raises(self, spark, store):
        from temporalscope_spark.operators.asof import serve_features
        from temporalscope_spark.exceptions import DataFrameValidationError

        spine, purchases, _ = store
        specs = [
            {"df": purchases, "time_col": "pt", "prefix": "x_"},
            {"df": purchases, "time_col": "pt", "prefix": "x_"},
        ]
        with pytest.raises(DataFrameValidationError, match="collide"):
            serve_features(spine, specs, on="uid", spine_time="t")

    def test_errors(self, spark, store):
        from temporalscope_spark.operators.asof import serve_features
        from temporalscope_spark.exceptions import DataFrameValidationError

        spine, purchases, _ = store
        with pytest.raises(DataFrameValidationError, match="non-empty"):
            serve_features(spine, [], on="uid", spine_time="t")
        with pytest.raises(DataFrameValidationError, match="spine missing"):
            serve_features(
                spine, [{"df": purchases, "time_col": "pt"}],
                on="nope", spine_time="t",
            )
        with pytest.raises(DataFrameValidationError, match="table 0 missing"):
            serve_features(
                spine, [{"df": purchases, "time_col": "nope"}],
                on="uid", spine_time="t",
            )
