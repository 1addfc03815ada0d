"""Target-shifter parity suite.

Ports the contract of /root/reference/test/unit/target_shifters/
test_single_step.py (315 lines, 13 tests): shift column naming
``{target}_shift_{n}``, row reduction == n_lags, drop_target both ways,
multi-lag, empty/all-dropped error messages, fit_transform law.
Global-order parity uses single-entity fixtures (SURVEY.md §7 risk note).
"""

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.frame import TemporalFrame
from temporalscope_spark.operators.shift import TargetShifter, lag_features, shift_target
from tests.conftest import make_ts_df


@pytest.fixture
def ts10(spark):
    return make_ts_df(spark, n=10, k=2, time_numeric=True)


def _pdf(df, sort_cols=("time",)):
    return df.toPandas().sort_values(list(sort_cols)).reset_index(drop=True)


def test_shift_column_name_and_row_reduction(spark, ts10):
    out = shift_target(ts10, "time", "target", n_lags=1)
    assert "target_shift_1" in out.columns
    assert out.count() == 10 - 1


@pytest.mark.parametrize("n_lags", [1, 2, 3])
def test_multi_lag_row_reduction(spark, ts10, n_lags):
    out = shift_target(ts10, "time", "target", n_lags=n_lags)
    assert out.count() == 10 - n_lags


def test_shift_values_are_lead(spark, ts10):
    out = _pdf(shift_target(ts10, "time", "target", n_lags=2))
    orig = _pdf(ts10)
    # value at row i equals original target at row i+2
    for i in range(len(out)):
        assert out.loc[i, "target_shift_2"] == pytest.approx(orig.loc[i + 2, "target"])


def test_drop_target_true_false(spark, ts10):
    kept = shift_target(ts10, "time", "target", n_lags=1, drop_target=False)
    dropped = shift_target(ts10, "time", "target", n_lags=1, drop_target=True)
    assert "target" in kept.columns
    assert "target" not in dropped.columns


def test_invalid_n_lags(spark, ts10):
    with pytest.raises(ValueError, match="`n_lags` must be greater than 0"):
        shift_target(ts10, "time", "target", n_lags=0)
    with pytest.raises(ValueError, match="`n_lags` must be greater than 0"):
        TargetShifter(target_col="target", n_lags=-1)


def test_empty_dataframe_error(spark, ts10):
    empty = ts10.filter(F.lit(False))
    with pytest.raises(ValueError, match="Cannot transform empty DataFrame"):
        shift_target(empty, "time", "target", n_lags=1)


def test_all_rows_dropped_error(spark, ts10):
    single = ts10.limit(1)
    with pytest.raises(ValueError, match="All rows were dropped during transformation"):
        shift_target(single, "time", "target", n_lags=1)


def test_fit_transform_equals_fit_then_transform(spark, ts10):
    tf = TemporalFrame(ts10, time_col="time", target_col="target")
    a = TargetShifter(n_lags=1).fit_transform(tf)
    b = TargetShifter(n_lags=1).fit(tf).transform(tf)
    assert _pdf(a.df).equals(_pdf(b.df))
    assert a.target_col == "target_shift_1"


def test_per_entity_shift(spark):
    df = make_ts_df(spark, n=20, k=1, time_numeric=True, id_col=True, n_ids=4)
    # per-entity time must be unique: re-time within id
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("time")
    df = df.withColumn("time", F.row_number().over(w).cast("double"))
    out = shift_target(df, "time", "target", n_lags=1, id_col="id")
    # each of the 4 entities (5 rows each) loses exactly 1 row
    assert out.count() == 20 - 4
    pdf = out.toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    orig = df.toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    for ident in orig["id"].unique():
        o = orig[orig["id"] == ident].reset_index(drop=True)
        s = pdf[pdf["id"] == ident].reset_index(drop=True)
        for i in range(len(s)):
            assert s.loc[i, "target_shift_1"] == pytest.approx(o.loc[i + 1, "target"])


def test_lag_features_fused_window(spark):
    df = make_ts_df(spark, n=12, k=1, time_numeric=True, id_col=True, n_ids=2)
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("time")
    df = df.withColumn("time", F.row_number().over(w).cast("double"))
    out = lag_features(df, "time", ["target"], [1, 2], id_col="id", drop_incomplete=True)
    assert {"target_lag_1", "target_lag_2"}.issubset(set(out.columns))
    assert out.count() == 12 - 2 * 2  # 2 incomplete rows per entity
    # single Window physical operator: both lags share one sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2


def test_multi_step_targets(spark):
    """Horizon array == [lead1..leadk]; incomplete trailing rows dropped."""
    from temporalscope_spark.operators.shift import multi_step_targets

    rows = [(1, float(t), float(t * 10)) for t in range(6)]
    df = spark.createDataFrame(rows, "uid int, t double, target double")
    out = multi_step_targets(df, "t", "target", horizon=3, id_col="uid")
    got = {r["t"]: r["target_next_3"] for r in out.collect()}
    assert got == {
        0.0: [10.0, 20.0, 30.0],
        1.0: [20.0, 30.0, 40.0],
        2.0: [30.0, 40.0, 50.0],
    }
    # keep incomplete horizons when requested: arrays carry null slots
    kept = multi_step_targets(df, "t", "target", horizon=3, id_col="uid",
                              drop_incomplete=False)
    assert kept.count() == 6

    import pytest as _pytest

    with _pytest.raises(ValueError, match="horizon"):
        multi_step_targets(df, "t", "target", horizon=0, id_col="uid")


def test_delta_features_values_and_fused_window(spark):
    from temporalscope_spark.operators.shift import delta_features

    rows = [
        # (uid, t_seconds, v)
        (1, 0.0, 10.0),
        (1, 2.0, 14.0),
        (1, 6.0, 7.0),
        (2, 0.0, 0.0),
        (2, 5.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "uid int, t double, v double")
    out = delta_features(df, "t", ["v"], [1], id_col="uid")
    got = {(r["uid"], r["t"]): r for r in out.collect()}
    assert got[(1, 0.0)]["v_diff_1"] is None
    assert got[(1, 2.0)]["v_diff_1"] == 4.0
    assert got[(1, 2.0)]["v_pct_1"] == pytest.approx(0.4)
    assert got[(1, 2.0)]["v_rate_1"] == pytest.approx(2.0)
    assert got[(1, 6.0)]["v_diff_1"] == -7.0
    assert got[(1, 6.0)]["v_rate_1"] == pytest.approx(-1.75)
    # lag value exactly 0 -> pct is null, diff/rate still real
    assert got[(2, 5.0)]["v_pct_1"] is None
    assert got[(2, 5.0)]["v_diff_1"] == 5.0
    # one fused window operator for diff+pct+rate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2


def test_delta_features_multi_lag_and_validation(spark):
    from temporalscope_spark.operators.shift import delta_features

    rows = [(1, float(t), float(t * t)) for t in range(5)]
    df = spark.createDataFrame(rows, "uid int, t double, v double")
    out = delta_features(df, "t", ["v"], [1, 2], id_col="uid", include_rate=False)
    got = {r["t"]: r for r in out.collect()}
    assert got[4.0]["v_diff_1"] == 7.0  # 16 - 9
    assert got[4.0]["v_diff_2"] == 12.0  # 16 - 4
    assert "v_rate_1" not in out.columns
    with pytest.raises(ValueError):
        delta_features(df, "t", ["v"], [0], id_col="uid")
    with pytest.raises(ValueError):
        delta_features(df, "t", [], [1], id_col="uid")


def test_delta_features_tiebreak_determinism(spark):
    from temporalscope_spark.operators.shift import delta_features

    # two rows share a timestamp; order_cols pins the lag order
    rows = [(1, 1.0, 9, 100.0), (1, 1.0, 5, 50.0), (1, 2.0, 7, 70.0)]
    df = spark.createDataFrame(rows, "uid int, t double, k int, v double")
    out = delta_features(df, "t", ["v"], [1], id_col="uid", order_cols=["k"])
    got = {r["k"]: r["v_diff_1"] for r in out.collect()}
    assert got[5] is None        # first in (t, k) order
    assert got[9] == 50.0        # 100 - 50
    assert got[7] == -30.0       # 70 - 100


class TestTimeToEvent:
    """time_to_event (operators/shift.py): gap to the next qualifying
    event per entity, right-censoring, include_current, tie order."""

    @pytest.fixture
    def tte_df(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: events at minute 0,5,10,20; purchases at 10 and 20
        for m, et in [(0, "view"), (5, "view"), (10, "buy"), (20, "buy")]:
            rows.append((1, base + dt.timedelta(minutes=m), et, m))
        # user 2: never buys -> all censored
        for m in (0, 7):
            rows.append((2, base + dt.timedelta(minutes=m), "view", 100 + m))
        return spark.createDataFrame(rows, ["uid", "ts", "etype", "rid"])

    def test_gaps_and_censoring(self, spark, tte_df):
        from temporalscope_spark.operators.shift import time_to_event

        out = {
            r["rid"]: r["tte_seconds"]
            for r in time_to_event(
                tte_df, "ts", F.col("etype") == "buy", id_col="uid",
                order_cols=["rid"],
            ).collect()
        }
        assert out[0] == 600.0      # 0 -> buy@10min
        assert out[5] == 300.0      # 5 -> buy@10min
        assert out[10] == 600.0     # strictly-after: next buy is @20min
        assert out[20] is None      # last buy: censored
        assert out[100] is None and out[107] is None  # user 2 censored

    def test_include_current(self, spark, tte_df):
        from temporalscope_spark.operators.shift import time_to_event

        out = {
            r["rid"]: r["tte_seconds"]
            for r in time_to_event(
                tte_df, "ts", F.col("etype") == "buy", id_col="uid",
                order_cols=["rid"], include_current=True,
            ).collect()
        }
        assert out[10] == 0.0 and out[20] == 0.0
        assert out[0] == 600.0

    def test_entity_isolation(self, spark, tte_df):
        """user 2 must not see user 1's purchases."""
        from temporalscope_spark.operators.shift import time_to_event

        no_id = {
            r["rid"]: r["tte_seconds"]
            for r in time_to_event(
                tte_df, "ts", F.col("etype") == "buy", order_cols=["rid"]
            ).collect()
        }
        # without the entity key, user 2's minute-0 row sees the global buy
        assert no_id[100] == 600.0

    def test_errors(self, spark, tte_df):
        from temporalscope_spark.operators.shift import time_to_event
        from temporalscope_spark.exceptions import DataFrameValidationError

        with pytest.raises(DataFrameValidationError, match="missing column"):
            time_to_event(tte_df, "nope", F.col("etype") == "buy")
        with pytest.raises(DataFrameValidationError, match="already exists"):
            time_to_event(
                tte_df.withColumn("tte_seconds", F.lit(1.0)), "ts",
                F.col("etype") == "buy",
            )

    def test_one_exchange(self, spark, tte_df):
        from temporalscope_spark.operators.shift import time_to_event

        plan = (
            time_to_event(
                tte_df, "ts", F.col("etype") == "buy", id_col="uid",
                order_cols=["rid"],
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1
