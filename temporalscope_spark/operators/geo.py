"""Geospatial proximity join — grid-cell blocking + haversine, the
standard scalable radius join (the same decomposition GeoSpark/Sedona
and every geohash-bucketed pipeline use, reduced to its plan essence:
candidates ONLY from an equi-join on cell ids, never a cross join).

Each left point maps to its single (lat-band, lon-band) cell; each
right point explodes to its 3×3 neighborhood, so every pair within one
cell radius meets in EXACTLY one cell (the left point's own) — no
post-dedup. The great-circle distance then filters candidates:

    d = 2R·asin(sqrt(sin²(Δφ/2) + cos φ₁ · cos φ₂ · sin²(Δλ/2)))

with R = 6371.0088 km (IUGG mean Earth radius).

Correctness bound: a cell of ``cell_deg`` degrees spans
``cell_deg·111.195`` km in latitude everywhere but shrinks with
``cos(lat)`` in longitude, so the 3×3 neighborhood only guarantees
coverage while ``radius_km ≤ cell_deg·111.195·cos(max_abs_lat)``.
The constructor validates that inequality and the plan RAISES on any
point beyond ``max_abs_lat`` — silently missing far-north pairs is the
one failure mode a reviewer cannot see in output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG = 111.19492664455873  # EARTH_RADIUS_KM * pi / 180


def haversine_km(lat1, lon1, lat2, lon2) -> "F.Column":
    """Great-circle distance in km between two (lat, lon) column pairs
    (degrees). Pure expressions — usable inside any select/filter."""
    rad = math.pi / 180.0
    p1, p2 = lat1 * rad, lat2 * rad
    dphi = (lat2 - lat1) * rad / 2.0
    dlam = (lon2 - lon1) * rad / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def proximity_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float | None = None,
    max_abs_lat: float = 66.0,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` great-circle km.

    ``cell_deg`` defaults to the smallest width satisfying the coverage
    bound (``radius_km / (111.195·cos(max_abs_lat))``). Output: left
    columns + right columns (``suffix`` on collisions) + ``distance_km``
    (rounded 6). NULL coordinates are dropped. Latitudes beyond
    ``max_abs_lat`` raise INSIDE the plan (coverage would silently
    break); longitudes must be in [−180, 180) — the neighborhood does
    not wrap the antimeridian (document-scale telemetry convention;
    pre-shift if your data straddles it).
    """
    if radius_km <= 0:
        raise DataFrameValidationError("proximity_join: radius_km must be > 0")
    if not (0.0 < max_abs_lat < 90.0):
        raise DataFrameValidationError(
            "proximity_join: max_abs_lat must be in (0, 90)"
        )
    min_cell = radius_km / (KM_PER_DEG * math.cos(max_abs_lat * math.pi / 180.0))
    if cell_deg is None:
        cell_deg = min_cell
    if cell_deg < min_cell - 1e-12:
        raise DataFrameValidationError(
            f"proximity_join: cell_deg={cell_deg} too small for radius_km="
            f"{radius_km} at max_abs_lat={max_abs_lat}; need >= {min_cell:.6f}"
        )
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in (lat_col, lon_col) if c not in df.columns]
        if missing:
            raise DataFrameValidationError(
                f"proximity_join: {side} side missing columns {missing}"
            )

    def cells(df: DataFrame, expand: bool) -> DataFrame:
        lat = F.col(lat_col).cast("double")
        lon = F.col(lon_col).cast("double")
        out = df.filter(lat.isNotNull() & lon.isNotNull())
        guard = F.when(
            F.abs(lat) > float(max_abs_lat),
            F.raise_error(
                F.lit(
                    f"proximity_join: |lat| beyond max_abs_lat={max_abs_lat} — "
                    "raise max_abs_lat (and cell_deg) to cover it"
                )
            ).cast("double"),
        )
        ci = F.floor(F.coalesce(guard, lat) / float(cell_deg)).cast("long")
        cj = F.floor(lon / float(cell_deg)).cast("long")
        if not expand:
            return out.withColumn("_cell", F.concat_ws(":", ci, cj))
        di = F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("_di")
        out = out.select("*", ci.alias("_ci"), cj.alias("_cj"), di)
        dj = F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("_dj")
        out = out.select("*", dj)
        return out.withColumn(
            "_cell",
            F.concat_ws(
                ":", F.col("_ci") + F.col("_di"), F.col("_cj") + F.col("_dj")
            ),
        ).drop("_ci", "_cj", "_di", "_dj")

    lt = cells(left, expand=False)
    rt = cells(right, expand=True)
    renames = {
        c: c + suffix for c in right.columns if c in set(left.columns)
    }
    for old, new in renames.items():
        rt = rt.withColumnRenamed(old, new)
    rlat = renames.get(lat_col, lat_col)
    rlon = renames.get(lon_col, lon_col)
    joined = lt.join(rt, "_cell")
    dist = haversine_km(
        F.col(lat_col).cast("double"),
        F.col(lon_col).cast("double"),
        F.col(rlat).cast("double"),
        F.col(rlon).cast("double"),
    )
    return (
        joined.withColumn("distance_km", F.round(dist, 6))
        .filter(F.col("distance_km") <= float(radius_km))
        .drop("_cell")
    )
