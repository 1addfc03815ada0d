"""Grid-bucketed proximity join (operators/geo.py): quadratic-reference
parity, boundary semantics, coverage guard, no-cartesian plan."""

from __future__ import annotations

import math

import numpy as np
import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.geo import haversine_km, proximity_join


def _hav(a1, o1, a2, o2):
    rad = math.pi / 180
    dphi = (a2 - a1) * rad / 2
    dlam = (o2 - o1) * rad / 2
    a = math.sin(dphi) ** 2 + math.cos(a1 * rad) * math.cos(a2 * rad) * \
        math.sin(dlam) ** 2
    return 2 * 6371.0088 * math.asin(math.sqrt(min(a, 1.0)))


def _points(spark, n=250, seed=5):
    rng = np.random.RandomState(seed)
    lats = rng.uniform(-60, 60, n)
    lons = rng.uniform(-179, 179, n)
    L = [(i, float(lats[i]), float(lons[i])) for i in range(n)]
    R = [
        (1000 + i, float(np.clip(lats[i] + rng.randn() * 0.5, -65, 65)),
         float(np.clip(lons[i] + rng.randn() * 0.5, -179.9, 179.9)))
        for i in range(n)
    ]
    return (
        L, R,
        spark.createDataFrame(L, "lid long, lat double, lon double"),
        spark.createDataFrame(R, "rid long, lat double, lon double"),
    )


class TestProximityJoin:
    def test_quadratic_parity(self, spark):
        L, R, ldf, rdf = _points(spark)
        for radius in (30.0, 120.0):
            got = sorted(
                (r["lid"], r["rid"])
                for r in proximity_join(ldf, rdf, radius_km=radius).collect()
            )
            ref = sorted(
                (l[0], r[0]) for l in L for r in R
                if round(_hav(l[1], l[2], r[1], r[2]), 6) <= radius
            )
            assert got == ref, f"radius={radius}"

    def test_distance_column(self, spark):
        ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, lat double, lon double")
        rdf = spark.createDataFrame([(2, 0.0, 1.0)], "rid long, lat double, lon double")
        r = proximity_join(ldf, rdf, radius_km=200.0).collect()[0]
        assert r["distance_km"] == pytest.approx(_hav(0, 0, 0, 1), abs=1e-4)

    def test_high_latitude_raises(self, spark):
        ldf = spark.createDataFrame([(1, 80.0, 0.0)], "lid long, lat double, lon double")
        rdf = spark.createDataFrame([(2, 0.0, 0.0)], "rid long, lat double, lon double")
        with pytest.raises(Exception, match="max_abs_lat"):
            proximity_join(ldf, rdf, radius_km=10.0).count()
        # but an explicit wider band accepts it
        got = proximity_join(ldf, rdf, radius_km=10.0, max_abs_lat=85.0)
        assert got.count() == 0

    def test_cell_too_small_raises(self, spark):
        _, _, ldf, rdf = _points(spark, n=5)
        with pytest.raises(DataFrameValidationError, match="cell_deg"):
            proximity_join(ldf, rdf, radius_km=100.0, cell_deg=0.1)

    def test_no_cartesian_plan(self, spark):
        _, _, ldf, rdf = _points(spark, n=20)
        plan = proximity_join(ldf, rdf, radius_km=50.0)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    def test_null_coords_dropped(self, spark):
        ldf = spark.createDataFrame(
            [(1, None, 0.0), (2, 0.0, 0.0)], "lid long, lat double, lon double"
        )
        rdf = spark.createDataFrame([(9, 0.0, 0.0)], "rid long, lat double, lon double")
        got = proximity_join(ldf, rdf, radius_km=1.0).collect()
        assert [(r["lid"], r["rid"]) for r in got] == [(2, 9)]

    def test_haversine_known_value(self, spark):
        # London -> Paris ~ 343.5 km
        df = spark.createDataFrame([(51.5074, -0.1278, 48.8566, 2.3522)],
                                   "a1 double, o1 double, a2 double, o2 double")
        import pyspark.sql.functions as F

        d = df.select(
            haversine_km(F.col("a1"), F.col("o1"), F.col("a2"), F.col("o2")).alias("d")
        ).first()["d"]
        assert d == pytest.approx(343.5, abs=1.0)
