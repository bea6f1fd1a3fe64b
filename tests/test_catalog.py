"""Catalog aggregate tests (C1-C4) — reference metrics_summary view and
series listing."""

from __future__ import annotations

import pytest

from sensapp_spark.datamodel.types import SENSOR_SCHEMA
from sensapp_spark.operators.catalog import metrics_list, metrics_summary, series_list


@pytest.fixture(scope="module")
def sensors(spark):
    rows = [
        ("u1", "cpu", "Float", "percent", None, {"env": "prod", "host": "a"}),
        ("u2", "cpu", "Float", "percent", None, {"env": "dev"}),
        ("u3", "mem", "Integer", "bytes", None, {"host": "a"}),
        ("u4", "mem", "Float", None, None, {}),
    ]
    return spark.createDataFrame(rows, SENSOR_SCHEMA).cache()


def test_metrics_summary(sensors):
    out = {(r.name, r.type): r for r in metrics_summary(sensors).collect()}
    cpu = out[("cpu", "Float")]
    assert cpu.series_count == 2
    assert cpu.unit == "percent"
    assert cpu.label_keys == ["env", "host"]  # sorted distinct union
    assert out[("mem", "Integer")].series_count == 1
    assert out[("mem", "Float")].label_keys == []


def test_series_list_format(sensors):
    out = {r.sensor_id: r.series for r in series_list(sensors, metric="cpu").collect()}
    assert out["u1"] == 'cpu{env="prod",host="a"}'
    assert out["u2"] == 'cpu{env="dev"}'


def test_metrics_list_filters(sensors):
    assert metrics_list(sensors, name_contains="CP").count() == 1
    assert metrics_list(sensors, name_regex="^m").count() == 2
    assert metrics_list(sensors, sensor_type="Integer").count() == 1


def test_sensor_catalog_projection(sensors):
    from sensapp_spark.operators.catalog import sensor_catalog

    out = sensor_catalog(sensors)
    assert out.columns == ["sensor_id", "name", "type", "unit_name",
                           "unit_description", "labels"]
    row = {r.sensor_id: r for r in out.collect()}
    assert row["u1"].unit_name == "percent"


def test_label_names_and_values(sensors):
    from sensapp_spark.operators.catalog import label_names, label_values

    assert [r.label for r in label_names(sensors).collect()] == [
        "__name__", "env", "host",
    ]
    assert [r.value for r in label_values(sensors, "env").collect()] == [
        "dev", "prod",
    ]
    # __name__ yields metric names; absent label yields nothing.
    assert [r.value for r in label_values(sensors, "__name__").collect()] == [
        "cpu", "mem",
    ]
    assert label_values(sensors, "nosuch").count() == 0
