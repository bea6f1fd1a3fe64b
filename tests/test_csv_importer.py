"""CSV importer tests (S1) — fixtures from reference
tests/common/fixtures.rs and FIXTURES.md §F1/F2."""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.csv_importer import (
    CsvFormatError,
    ingest_csv,
    iso8601_to_timestamp,
    plan_csv,
)

UTC = dt.timezone.utc

LONG_CSV = """datetime,sensor_name,value,unit
2024-01-01T00:00:00Z,temperature_X,20.5,°C
2024-01-01T00:00:00Z,humidity_X,65.0,%
2024-01-01T00:01:00Z,temperature_X,21.0,°C
2024-01-01T00:02:00Z,temperature_X,21.5,°C
"""

WIDE_CSV = """datetime,temperature,humidity,active
2024-01-01T00:00:00Z,20.5,65,true
2024-01-01T00:01:00Z,21.0,66,false
"""

NO_DATETIME_CSV = """sensor_name,value
a,1
b,2
a,3
"""


@pytest.fixture()
def write_csv(tmp_path):
    def _write(text, name="data.csv"):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    return _write


def test_plan_long_layout():
    plan = plan_csv(
        ["datetime", "sensor_name", "value", "unit"],
        [["2024-01-01T00:00:00Z", "t", "20.5", "°C"]],
    )
    assert plan.layout == "long"
    assert plan.datetime_column == "datetime"
    assert plan.sensor_name_column == "sensor_name"
    assert plan.value_column == "value"
    assert plan.unit_column == "unit"


def test_plan_candidate_names_case_insensitive():
    plan = plan_csv(["Timestamp", "Metric", "Reading"],
                    [["2024-01-01T00:00:00Z", "t", "1.5"]])
    assert plan.layout == "long"
    assert plan.sensor_name_column == "Metric"
    assert plan.value_column == "Reading"
    assert plan.datetime_column == "Timestamp"


def test_plan_wide_layout():
    plan = plan_csv(["datetime", "temperature", "humidity"],
                    [["2024-01-01T00:00:00Z", "20.5", "65"]])
    assert plan.layout == "wide"
    assert plan.sensor_columns == ["temperature", "humidity"]


def test_plan_rejects_single_column():
    with pytest.raises(CsvFormatError):
        plan_csv(["only"], [["1"]])


def test_plan_rejects_no_datetime_no_names():
    with pytest.raises(CsvFormatError):
        plan_csv(["a", "b"], [["x", "y"]])


def test_ingest_long(spark, write_csv):
    batch = ingest_csv(spark, write_csv(LONG_CSV))
    sensors = {r.name: r for r in batch.sensors.collect()}
    assert set(sensors) == {"temperature_X", "humidity_X"}
    assert sensors["temperature_X"].type == "Float"
    assert sensors["temperature_X"].unit == "°C"
    vals = batch.values[SensorType.FLOAT]
    rows = sorted(
        ((r.sensor_id, r.time, r.value) for r in vals.collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert len(rows) == 4
    temp_rows = [r for r in rows if r[0] == sensors["temperature_X"].sensor_id]
    assert [r[2] for r in temp_rows] == [20.5, 21.0, 21.5]
    assert temp_rows[0][1] == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_ingest_wide(spark, write_csv):
    batch = ingest_csv(spark, write_csv(WIDE_CSV))
    sensors = {r.name: r for r in batch.sensors.collect()}
    assert sensors["temperature"].type == "Float"
    assert sensors["humidity"].type == "Integer"
    assert sensors["active"].type == "Boolean"
    ints = batch.values[SensorType.INTEGER].collect()
    assert sorted(r.value for r in ints) == [65, 66]
    bools = batch.values[SensorType.BOOLEAN].collect()
    assert sorted(r.value for r in bools) == [False, True]


def test_ingest_no_datetime_row_index(spark, write_csv):
    # csv.rs:106-111 — row index as Unix seconds.
    batch = ingest_csv(spark, write_csv(NO_DATETIME_CSV))
    vals = batch.values[SensorType.INTEGER].collect()
    by_val = {r.value: r.time for r in vals}
    assert by_val[1] == dt.datetime(1970, 1, 1, 0, 0, 0)
    assert by_val[3] == dt.datetime(1970, 1, 1, 0, 0, 2)


def test_ingest_epoch_seconds_datetime(spark, write_csv):
    csv = "timestamp,sensor_name,value\n1700000000,a,1.5\n1700000060,a,2.5\n"
    batch = ingest_csv(spark, write_csv(csv))
    vals = sorted(batch.values[SensorType.FLOAT].collect(), key=lambda r: r.time)
    assert vals[0].time == dt.datetime.fromtimestamp(1700000000, UTC).replace(tzinfo=None)


def test_ingest_empty_sensor_name_errors(spark, write_csv):
    csv = "datetime,sensor_name,value\n2024-01-01T00:00:00Z,,1\n"
    with pytest.raises(CsvFormatError, match="Empty sensor name"):
        ingest_csv(spark, write_csv(csv))


def test_iso8601_catalyst_parser(spark):
    cases = [
        ("2024-01-01T00:00:00Z", dt.datetime(2024, 1, 1)),
        ("2024-06-15 12:30:45.5", dt.datetime(2024, 6, 15, 12, 30, 45, 500000)),
        # additive quirk: +02:00 ADDS two hours
        ("1951-10-26T00:00:00+02:00", dt.datetime(1951, 10, 26, 2, 0, 0)),
        ("2024-01-01T10:00:00-03:30", dt.datetime(2024, 1, 1, 6, 30, 0)),
        # ordinal date 1969-358 = 1969-12-24; 14:21:32.0933 + 5:35
        ("1969-358T14:21:32.0933+05:35",
         dt.datetime(1969, 12, 24, 19, 56, 32, 93300)),
        # week date 2024-W02-3 = 2024-01-10 (per the reference's simple
        # 7*(ww-1)+(d-1) day arithmetic, parsing.rs:141-146)
        ("2024-W02-3T00:00:00Z", dt.datetime(2024, 1, 10)),
        ("not a date", None),
        ("2024-13-99T00:00:00Z", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = {r.s: r.ts for r in
           df.select("s", iso8601_to_timestamp("s").alias("ts")).collect()}
    for s, want in cases:
        assert got[s] == want, f"{s}: {got[s]} != {want}"
