"""SenML / InfluxDB LP / Arrow importer tests (S2, S3, S4) — fixtures
from FIXTURES.md §F4/F5/F6 and reference importer tests."""

from __future__ import annotations

import datetime as dt
import json

import pyarrow as pa
import pyarrow.ipc as ipc
import io
import pytest

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.arrow_importer import ArrowFormatError, ingest_arrow
from sensapp_spark.ingest.influxdb_importer import (
    LineProtocolError,
    ingest_lines,
    parse_line,
    sensor_name,
)
from sensapp_spark.ingest.senml_importer import SenMLError, ingest_senml

NOW = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)


# -- SenML ------------------------------------------------------------------

SENML = json.dumps([
    {"bn": "urn:dev:temp1", "bt": 1704067200, "bu": "Cel", "v": 20.5},
    {"t": 60, "v": 21.0},
    {"n": "-humidity", "u": "%RH", "v": 65.0},
])


def test_senml_base_resolution(spark):
    batch = ingest_senml(spark, SENML, now=NOW)
    sensors = {r.name: r for r in batch.sensors.collect()}
    assert set(sensors) == {"urn:dev:temp1", "urn:dev:temp1-humidity"}
    assert sensors["urn:dev:temp1"].unit == "Cel"
    assert sensors["urn:dev:temp1-humidity"].unit == "%RH"
    vals = batch.values[SensorType.FLOAT].collect()
    by = {}
    for r in vals:
        by.setdefault(r.sensor_id, []).append((r.time, r.value))
    temp = sorted(by[sensors["urn:dev:temp1"].sensor_id])
    assert temp[0] == (dt.datetime(2024, 1, 1, 0, 0, 0), 20.5)
    assert temp[1] == (dt.datetime(2024, 1, 1, 0, 1, 0), 21.0)


def test_senml_relative_time_uses_now(spark):
    batch = ingest_senml(spark, json.dumps([{"bn": "x", "t": -10, "v": 1.0}]),
                         now=NOW)
    (row,) = batch.values[SensorType.FLOAT].collect()
    assert row.time == NOW.replace(tzinfo=None) - dt.timedelta(seconds=10)


def test_senml_value_kinds(spark):
    payload = json.dumps([
        {"bn": "s", "vs": "hello"},
        {"bn": "b", "vb": True},
        {"bn": "d", "vd": "aGVsbG8"},  # url-safe base64 of 'hello'
    ])
    batch = ingest_senml(spark, payload, now=NOW)
    types = {r.name: r.type for r in batch.sensors.collect()}
    assert types == {"s": "String", "b": "Boolean", "d": "Blob"}
    (blob,) = batch.values[SensorType.BLOB].collect()
    assert bytes(blob.value) == b"hello"


def test_senml_base_value_offset(spark):
    payload = json.dumps([{"bn": "v", "bv": 100.0, "v": 5.0}, {"v": 7.0}])
    batch = ingest_senml(spark, payload, now=NOW)
    vals = sorted(r.value for r in batch.values[SensorType.FLOAT].collect())
    assert vals == [105.0, 107.0]


def test_senml_errors(spark):
    with pytest.raises(SenMLError):
        ingest_senml(spark, "{}")
    with pytest.raises(SenMLError):
        ingest_senml(spark, json.dumps([{"v": 1.0}]))  # no name


# -- InfluxDB line protocol -------------------------------------------------

def test_lp_parse_basic():
    p = parse_line("cpu,host=A,region=west usage_system=64.2 1590488773254420000")
    assert p.measurement == "cpu"
    assert p.tags == [("host", "A"), ("region", "west")]
    assert p.fields[0][0] == "usage_system"
    assert p.fields[0][1] == (SensorType.FLOAT, 64.2)
    assert p.timestamp_ns == 1590488773254420000


def test_lp_field_types():
    p = parse_line('m f_int=42i,f_float=1.5,f_str="hi there",f_bool=true')
    d = dict(p.fields)
    assert d["f_int"] == (SensorType.INTEGER, 42)
    assert d["f_float"] == (SensorType.FLOAT, 1.5)
    assert d["f_str"] == (SensorType.STRING, "hi there")
    assert d["f_bool"] == (SensorType.BOOLEAN, True)


def test_lp_escapes():
    p = parse_line(r"my\ measurement,tag\,key=va\ lue field=1i")
    assert p.measurement == "my measurement"
    assert p.tags == [("tag,key", "va lue")]


def test_lp_string_with_escaped_quote():
    p = parse_line(r'm f="say \"hi\""')
    assert p.fields[0][1] == (SensorType.STRING, 'say "hi"')


def test_lp_u64_overflow():
    with pytest.raises(LineProtocolError, match="too big"):
        parse_line(f"m f={2**63}u")


def test_lp_sensor_name_urlencoding():
    assert sensor_name("my measurement", "field/key") == (
        "my%20measurement field%2Fkey")


def test_lp_ingest(spark):
    text = ("cpu,host=A usage=64.2,idle=30.1 1700000000000000000\n"
            "cpu,host=B usage=50.0 1700000001000000000\n")
    batch = ingest_lines(spark, text, bucket="b1", org="o1")
    sensors = batch.sensors.collect()
    # (cpu usage)×2 hosts + (cpu idle)×1 = 3 sensors
    assert len(sensors) == 3
    s0 = next(s for s in sensors if s.labels.get("host") == "A"
              and s.name == "cpu usage")
    assert s0.labels == {"host": "A", "influxdb_bucket": "b1",
                         "influxdb_org": "o1"}
    vals = batch.values[SensorType.FLOAT].collect()
    assert len(vals) == 3
    t = next(v.time for v in vals if v.value == 50.0)
    assert t == dt.datetime(2023, 11, 14, 22, 13, 21)


def test_lp_precision_seconds(spark):
    batch = ingest_lines(spark, "m f=1.0 1700000000", precision="s")
    (row,) = batch.values[SensorType.FLOAT].collect()
    assert row.time == dt.datetime(2023, 11, 14, 22, 13, 20)


def test_lp_with_numeric_mode(spark):
    batch = ingest_lines(spark, "m f=1.5,g=2i", with_numeric=True)
    assert set(batch.values) == {SensorType.NUMERIC}


# -- Arrow ------------------------------------------------------------------

def _ipc(table: pa.Table) -> bytes:
    sink = io.BytesIO()
    with ipc.new_file(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def test_arrow_ingest_with_names(spark):
    table = pa.table({
        "timestamp": pa.array([dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)],
                              type=pa.timestamp("us")),
        "value": pa.array([1.5, 2.5], type=pa.float64()),
        "sensor_name": pa.array(["a", "b"]),
    })
    batch = ingest_arrow(spark, _ipc(table))
    assert {r.name for r in batch.sensors.collect()} == {"a", "b"}
    vals = batch.values[SensorType.FLOAT].collect()
    assert sorted(r.value for r in vals) == [1.5, 2.5]


def test_arrow_type_mapping(spark):
    for arr, expected in [
        (pa.array([1, 2], type=pa.int64()), SensorType.INTEGER),
        (pa.array(["x", "y"]), SensorType.STRING),
        (pa.array([True, False]), SensorType.BOOLEAN),
        (pa.array([b"a", b"b"], type=pa.binary()), SensorType.BLOB),
    ]:
        table = pa.table({
            "timestamp": pa.array([dt.datetime(2024, 1, 1)] * 2,
                                  type=pa.timestamp("us")),
            "value": arr,
        })
        batch = ingest_arrow(spark, _ipc(table))
        assert set(batch.values) == {expected}
        (s,) = batch.sensors.collect()
        assert s.name == "arrow_sensor"


def test_arrow_missing_columns(spark):
    table = pa.table({"value": pa.array([1.0])})
    with pytest.raises(ArrowFormatError, match="timestamp"):
        ingest_arrow(spark, _ipc(table))
    with pytest.raises(ArrowFormatError, match="Not an Arrow"):
        ingest_arrow(spark, b"junk bytes")
