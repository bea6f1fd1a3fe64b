"""Geo operators (operators/geo.py): haversine correctness against
known city distances, bbox semantics, and the within_radius plan shape
(no shuffle, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensapp_spark.operators.geo import bbox_filter, within_radius


@pytest.fixture(scope="module")
def cities(spark):
    rows = [
        ("paris", 48.8566, 2.3522),
        ("london", 51.5074, -0.1278),
        ("oslo", 59.9139, 10.7522),
        ("sydney", -33.8688, 151.2093),
        ("quito", -0.1807, -78.4678),
    ]
    return spark.createDataFrame(
        rows, "name string, latitude double, longitude double"
    ).cache()


def test_haversine_known_distances(cities):
    d = {r.name: r.distance_km for r in within_radius(
        cities, 48.8566, 2.3522, 25_000.0
    ).collect()}
    assert d["paris"] == pytest.approx(0.0, abs=1e-6)
    assert d["london"] == pytest.approx(343.6, rel=0.01)
    assert d["oslo"] == pytest.approx(1337.0, rel=0.01)
    assert d["sydney"] == pytest.approx(16960.0, rel=0.01)


def test_within_radius_filters(cities):
    near = within_radius(cities, 48.8566, 2.3522, 1500.0)
    assert sorted(r.name for r in near.collect()) == [
        "london", "oslo", "paris",
    ]


def test_bbox_filter(cities):
    box = bbox_filter(cities, lat_min=40, lat_max=60, lon_min=-5, lon_max=5)
    assert sorted(r.name for r in box.collect()) == ["london", "paris"]


def test_geo_plan_is_narrow(cities):
    df = within_radius(cities, 0.0, 0.0, 2000.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
