"""Q8/Q9 per-type scan dispatch over a multi-type lake + I6 UUID parser."""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.csv_importer import IngestBatch
from sensapp_spark.ingest.inference import parse_uuid
from sensapp_spark.operators import LabelMatcher, MatcherType
from sensapp_spark.operators.selection import query_all_types
from sensapp_spark.storage.lake import SensorLake

T0 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def multi_lake(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    sensors = spark.createDataFrame(
        [
            ("f1", "temp", "Float", None, None, {"env": "prod"}),
            ("i1", "count", "Integer", None, None, {"env": "prod"}),
            ("s1", "note", "String", None, None, {"env": "dev"}),
        ],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    values = {
        SensorType.FLOAT: spark.createDataFrame(
            [("f1", T0, 1.5)], "sensor_id string, time timestamp, value double"),
        SensorType.INTEGER: spark.createDataFrame(
            [("i1", T0, 7), ("i1", T0 + dt.timedelta(minutes=1), 8)],
            "sensor_id string, time timestamp, value long"),
        SensorType.STRING: spark.createDataFrame(
            [("s1", T0, "x")], "sensor_id string, time timestamp, value string"),
    }
    lake.publish(IngestBatch(sensors=sensors, values=values))
    return lake


def test_dispatch_only_matched_types(multi_lake):
    out = query_all_types(
        multi_lake, [LabelMatcher("env", "prod", MatcherType.EQUAL)])
    assert set(out) == {SensorType.FLOAT, SensorType.INTEGER}
    assert out[SensorType.FLOAT].count() == 1
    assert out[SensorType.INTEGER].count() == 2


def test_dispatch_numeric_only_skips_string(multi_lake):
    out = query_all_types(
        multi_lake, [LabelMatcher("__name__", ".*", MatcherType.REGEX_MATCH)],
        numeric_only=True)
    assert SensorType.STRING not in out


def test_dispatch_limit_applies_per_type(multi_lake):
    out = query_all_types(
        multi_lake, [LabelMatcher("env", "prod", MatcherType.EQUAL)], limit=1)
    assert out[SensorType.INTEGER].count() == 1


def test_parse_uuid():
    assert parse_uuid("20115fa5-aecd-8271-835d-07bfee981d6a") is not None
    assert parse_uuid("20115FA5-AECD-8271-835D-07BFEE981D6A") == (
        "20115fa5-aecd-8271-835d-07bfee981d6a")
    assert parse_uuid("zz115fa5-aecd-8271-835d-07bfee981d6a") is None
    assert parse_uuid("") is None


def test_entry_lake_dir_is_process_unique_and_idempotent():
    """Registry entries that build throwaway lakes must not race across
    concurrent registry processes (round-9 watch item #2): the scratch
    path embeds the pid, so two processes computing the path for the
    same sf_dir land in different dirs, while repeated calls within one
    process stay stable (rebuilt in place → entry idempotent)."""
    import os
    import subprocess
    import sys

    from sensapp_spark.plans.queries import _entry_lake_dir

    a = _entry_lake_dir("kmv_lake", "/root/testdata/sf0.001")
    b = _entry_lake_dir("kmv_lake", "/root/testdata/sf0.001")
    assert a == b  # stable within one process
    assert f"_{os.getpid()}" in a
    # A different process computes a different path for the same inputs.
    other = subprocess.run(
        [sys.executable, "-c",
         "from sensapp_spark.plans.queries import _entry_lake_dir;"
         "print(_entry_lake_dir('kmv_lake', '/root/testdata/sf0.001'))"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    assert other != a
    # Distinct tags and sf dirs never collide either.
    assert _entry_lake_dir("q8_lake", "/root/testdata/sf0.001") != a
    assert _entry_lake_dir("kmv_lake", "/root/testdata/sf0.01") != a
