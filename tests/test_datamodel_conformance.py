"""Datamodel edge-case conformance, mirrored from the reference's
`/root/reference/tests/datamodel.rs` example suite: extreme timestamps
(epoch 0 and year 2096, datamodel.rs:563-587), numeric sample precision
(exact decimal round-trip, datamodel.rs:408-440), empty string values
(datamodel.rs:589+), and very long sensor names (datamodel.rs:548-561)
— all driven through the REAL lake write/read path, not in-memory
structures, so partitioning and typed-table schemas are exercised too."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

from sensapp_spark.datamodel.sensor import sensor_uuid
from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.csv_importer import IngestBatch
from sensapp_spark.storage.lake import SensorLake


def _batch(spark, stype, schema, rows, name="edge", type_name=None):
    return IngestBatch(
        sensors=spark.createDataFrame(
            [("u1", name, type_name or stype.name.title(), None, None, {})],
            "sensor_id string, name string, type string, unit string, "
            "unit_description string, labels map<string,string>",
        ),
        values={stype: spark.createDataFrame(rows, schema)},
    )


def test_extreme_timestamps_round_trip(spark, tmp_path):
    """Epoch start and year-2096 samples survive the lake round-trip
    and land in their month partitions (datamodel.rs:563-587)."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    t_old = dt.datetime(1970, 1, 1)
    t_future = dt.datetime.fromtimestamp(4_000_000_000, dt.timezone.utc)
    lake.publish(
        _batch(
            spark,
            SensorType.INTEGER,
            "sensor_id string, time timestamp, value long",
            [("u1", t_old, 42), ("u1", t_future.replace(tzinfo=None), 84)],
        )
    )
    got = {
        r.time: r.value
        for r in lake.values(SensorType.INTEGER).collect()
    }
    assert got[t_old] == 42
    assert 84 in got.values()
    from sensapp_spark.storage.lake import resolve_table

    months = sorted(
        d
        for d in os.listdir(
            resolve_table(str(tmp_path / "lake" / "integer_values"))
        )
        if d.startswith("month=")
    )
    assert months[0] == "month=1970-01"
    assert months[-1].startswith("month=2096")


def test_numeric_precision_exact_round_trip(spark, tmp_path):
    """The reference keeps Numeric samples as exact decimals
    (datamodel.rs:408-440); the decimal(38,18) table must return the
    same canonical values, not float approximations."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1)
    vals = [Decimal("123.456789"), Decimal("987.654321"), Decimal("0.000001")]
    lake.publish(
        _batch(
            spark,
            SensorType.NUMERIC,
            "sensor_id string, time timestamp, value decimal(38,18)",
            [
                ("u1", t0 + dt.timedelta(seconds=i), v)
                for i, v in enumerate(vals)
            ],
        )
    )
    got = sorted(r.value for r in lake.values(SensorType.NUMERIC).collect())
    assert got == sorted(vals)
    # Exactness, not float closeness: normalized decimal comparison.
    for g, v in zip(got, sorted(vals)):
        assert Decimal(g) == v


def test_empty_string_values_round_trip(spark, tmp_path):
    """Empty strings are valid sample values and must not collapse to
    NULL on the way through the lake (datamodel.rs:589+)."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1)
    lake.publish(
        _batch(
            spark,
            SensorType.STRING,
            "sensor_id string, time timestamp, value string",
            [("u1", t0, ""), ("u1", t0 + dt.timedelta(seconds=1), "non-empty")],
        )
    )
    got = [r.value for r in lake.values(SensorType.STRING).orderBy("time").collect()]
    assert got == ["", "non-empty"]
    assert got[0] is not None


def test_very_long_sensor_name(spark, tmp_path):
    """A 1000-char sensor name round-trips through the dimension table
    and still produces a stable deterministic UUID
    (datamodel.rs:548-561)."""
    long_name = "sensor_" + "x" * 993
    lake = SensorLake(spark, str(tmp_path / "lake"))
    uid = sensor_uuid(long_name, SensorType.FLOAT)
    lake.publish(
        _batch(
            spark,
            SensorType.FLOAT,
            "sensor_id string, time timestamp, value double",
            [(uid, dt.datetime(2024, 1, 1), 1.0)],
            name=long_name,
            type_name="Float",
        )
    )
    row = lake.sensors().collect()[0]
    assert row.name == long_name and len(row.name) == 1000
    # Deterministic identity: recomputing the UUID gives the same value.
    assert sensor_uuid(long_name, SensorType.FLOAT) == uid


def test_nonfinite_floats_dropped_at_publish(spark, tmp_path):
    """The reference's publisher silently drops NaN/Inf float samples
    (src/storage/sqlite/sqlite_publishers.rs:63-66) — replicated so
    cross-engine row counts diff clean (SURVEY §7.4 risk 5)."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1)
    lake.publish(
        _batch(
            spark,
            SensorType.FLOAT,
            "sensor_id string, time timestamp, value double",
            [
                ("u1", t0, 1.5),
                ("u1", t0 + dt.timedelta(seconds=1), float("nan")),
                ("u1", t0 + dt.timedelta(seconds=2), float("inf")),
                ("u1", t0 + dt.timedelta(seconds=3), float("-inf")),
                ("u1", t0 + dt.timedelta(seconds=4), -2.5),
            ],
            type_name="Float",
        )
    )
    got = sorted(r.value for r in lake.values(SensorType.FLOAT).collect())
    assert got == [-2.5, 1.5]


def test_null_float_samples_survive_publish(spark, tmp_path):
    """NULL samples are NOT part of the non-finite drop policy (a blank
    CSV cell casts to NULL and the reference stores it) — a bare NaN
    predicate would silently drop them."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1)
    lake.publish(
        _batch(
            spark,
            SensorType.FLOAT,
            "sensor_id string, time timestamp, value double",
            [
                ("u1", t0, 1.0),
                ("u1", t0 + dt.timedelta(seconds=1), None),
                ("u1", t0 + dt.timedelta(seconds=2), float("nan")),
            ],
            type_name="Float",
        )
    )
    got = [
        r.value
        for r in lake.values(SensorType.FLOAT).orderBy("time").collect()
    ]
    assert got == [1.0, None]
