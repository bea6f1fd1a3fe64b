"""Geo operators over Location-type values (beyond-reference analytics
for the 8-type model's ``Location`` struct — the reference stores
lat/lon pairs (src/storage/sqlite/migrations/20240110093153_init.sql:
88-95, docs/DATAMODEL.md) but exposes no spatial query surface; its geo
column *inference* is even dead code, src/infer/geo_guesser.rs:16-81).

All operators are pure Catalyst expressions — narrow projections and
filters that push into the scan; no UDF, no shuffle. Trig runs on IEEE
doubles, so cross-engine results agree to well past the 6-decimal
rounding used by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance in km (haversine form — numerically stable
    for small angles, exact same formula the oracle SQL uses)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def bbox_filter(
    points: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Bounding-box selection — four range predicates that push down to
    the parquet scan (the standard pre-filter before exact distance)."""
    return points.filter(
        (F.col(lat_col) >= lat_min)
        & (F.col(lat_col) <= lat_max)
        & (F.col(lon_col) >= lon_min)
        & (F.col(lon_col) <= lon_max)
    )


def within_radius(
    points: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_km: float,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Points within ``radius_km`` of a center, with the distance
    attached. Plan shape: a cheap bounding-box pre-filter (pushed to the
    scan) guards the trig — the box over-covers the circle by design,
    the exact haversine predicate trims the corners."""
    dlat = radius_km / 111.0  # ~km per degree latitude
    pre = bbox_filter(
        points,
        center_lat - dlat,
        center_lat + dlat,
        -180.0,
        180.0,  # longitude degrees shrink with cos(lat); keep it simple
        lat_col,
        lon_col,
    )
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col),
        F.lit(center_lat), F.lit(center_lon),
    )
    return pre.withColumn("distance_km", dist).filter(
        F.col("distance_km") <= radius_km
    )
