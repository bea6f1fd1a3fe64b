"""Selection-pipeline tests: time range (Q5), per-sensor limit (Q7),
single-series fetch (Q11), dedup — on tiny in-memory frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SENSOR_SCHEMA
from sensapp_spark.operators import LabelMatcher, MatcherType, query_samples
from sensapp_spark.operators.selection import (
    dedup_values,
    fetch_series,
    per_sensor_limit,
    time_range,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def values(spark):
    rows = [
        ("s1", ts(0), 1.0), ("s1", ts(1), 2.0), ("s1", ts(2), 3.0),
        ("s1", ts(3), 4.0),
        ("s2", ts(0), 10.0), ("s2", ts(5), 20.0),
    ]
    return spark.createDataFrame(rows, "sensor_id string, time timestamp, value double").cache()


@pytest.fixture(scope="module")
def sensors(spark):
    rows = [
        ("s1", "temp", "Float", None, None, {"env": "prod"}),
        ("s2", "temp", "Float", None, None, {"env": "dev"}),
    ]
    return spark.createDataFrame(rows, SENSOR_SCHEMA).cache()


def test_time_range_inclusive_both_ends(values):
    out = time_range(values.filter(F.col("sensor_id") == "s1"), ts(1), ts(2))
    assert sorted(r.value for r in out.collect()) == [2.0, 3.0]


def test_time_range_open_bounds(values):
    assert time_range(values, start=ts(3)).count() == 2  # s1@3, s2@5
    assert time_range(values, end=ts(0)).count() == 2
    assert time_range(values).count() == 6


def test_per_sensor_limit(values):
    out = per_sensor_limit(values, 2)
    got = {(r.sensor_id, r.value) for r in out.collect()}
    assert got == {("s1", 1.0), ("s1", 2.0), ("s2", 10.0), ("s2", 20.0)}


def test_per_sensor_limit_default_is_huge(values):
    assert per_sensor_limit(values, None).count() == 6


def test_query_samples_pipeline(sensors, values):
    out = query_samples(
        sensors, values,
        [LabelMatcher("env", "prod", MatcherType.EQUAL)],
        start=ts(1), end=ts(3), limit=2,
    )
    rows = out.select("sensor_id", "value", "name").collect()
    assert [(r.sensor_id, r.value, r.name) for r in rows] == [
        ("s1", 2.0, "temp"), ("s1", 3.0, "temp")]


def test_query_samples_no_matchers_empty(sensors, values):
    assert query_samples(sensors, values, []).count() == 0


def test_fetch_series(sensors, values):
    out = fetch_series(sensors, values, "s2", limit=1)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].sensor_id == "s2" and rows[0].value == 10.0
    assert rows[0].name == "temp"


def test_dedup_values(spark):
    rows = [("s1", T0, 1.0)] * 3 + [("s1", T0, 2.0), ("s1", ts(1), 1.0)]
    df = spark.createDataFrame(rows, "sensor_id string, time timestamp, value double")
    assert dedup_values(df).count() == 3


def test_topn_uses_window_group_limit(values):
    # Physical plan must contain WindowGroupLimit — partial top-K before the
    # shuffle, the distributed analogue of the reference's LATERAL LIMIT
    # pushdown (src/storage/postgresql/batch_queries.rs:192-207).
    out = per_sensor_limit(values, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
