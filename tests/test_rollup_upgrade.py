"""Maintenance-driven rollup schema upgrade (round 13): a table
committed by OLDER code must reach the current row schema through
bounded ``upgrade_tick`` batches alone — interleaved with live ingest
and ordinary refreshes — after which the schema-gated served functions
(resets/changes/irate) answer from the rollup. The round-12 verdict's
task 1: without this path, a pre-upgrade deployment's rate() falls
back to raw scans forever."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.query.promql_ext import evaluate_range, parse_extended
from sensapp_spark.query.rollup_serve import evaluate_range_rollup
from sensapp_spark.storage.lake import SensorLake
from sensapp_spark.storage.rollup import ROLLUP_META, RollupStore

NOW = dt.datetime(2024, 4, 1)


class _V2Store(RollupStore):
    """The round-12 writer: commits only the 16 pre-round-13 columns
    (the inherited aggregation computes more; the commit's VALUE_COLS
    projection drops them from the parquet) and records schema 2 —
    a genuine old-code table, not a doctored meta."""

    SCHEMA = (
        "sensor_id string, bucket timestamp, cnt long, "
        "vsum double, vmin double, vmax double, "
        "ecnt long, esum double, emin double, emax double, "
        "tfirst timestamp, vfirst double, tlast timestamp, "
        "vlast double, vsum2 double, esum2 double"
    )
    SCHEMA_VERSION = 2
    VALUE_COLS = RollupStore.VALUE_COLS[:16]


def _mk_lake(spark, tmp_path):
    """Three months of data (Jan/Feb/Mar 2024), with within-hour value
    moves so resets/changes are non-trivial."""
    rows = []
    for mo in (1, 2, 3):
        t0 = dt.datetime(2024, mo, 10)
        for k, v in enumerate([5.0, 3.0, 7.0, 7.0, 1.0, 4.0]):
            rows.append(("m/a", t0 + dt.timedelta(minutes=25 * k), v))
            rows.append(
                ("m/b", t0 + dt.timedelta(minutes=25 * k + 5), 10 - v)
            )
    lake = SensorLake(spark, str(tmp_path / "upg_lake"))
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            rows, "sensor_id string, time timestamp, value double"
        ),
    )
    sensors = (
        spark.createDataFrame(
            [("m/a", "a"), ("m/b", "b")], "sensor_id string, site string"
        ).select(
            "sensor_id",
            F.lit("m").alias("name"),
            F.lit("Float").alias("type"),
            F.lit(None).cast("string").alias("unit"),
            F.lit(None).cast("string").alias("unit_description"),
            F.create_map(F.lit("site"), F.col("site")).alias("labels"),
        )
    )
    return lake, sensors


def _pending(store):
    import json
    import os

    from sensapp_spark.storage.lake import resolve_table

    data = resolve_table(store._path(SensorType.FLOAT))
    raw = open(os.path.join(data, ROLLUP_META), "rb").read()
    return json.loads(raw).get("pending_upgrade_months")


def test_v2_table_reaches_v3_through_bounded_ticks(spark, tmp_path):
    lake, sensors = _mk_lake(spark, tmp_path)
    _V2Store(lake, grain_s=3600).refresh(SensorType.FLOAT)
    store = RollupStore(lake, grain_s=3600)
    assert store.committed_schema(SensorType.FLOAT) == 2

    # Tick 1: one month rebuilt, worklist persisted, version honest.
    r1 = store.upgrade_tick(SensorType.FLOAT, max_months=1)
    assert r1 == {
        "mode": "upgrade", "upgraded_months": 1, "remaining": 2,
        "schema": 2, "seq": r1["seq"],
    }
    assert store.committed_schema(SensorType.FLOAT) == 2
    assert _pending(store) == ["2024-02", "2024-03"]

    # LIVE INGEST mid-upgrade: an ordinary incremental refresh lands
    # between ticks — it must CARRY the worklist and keep the honest
    # version (its kept-old February rows are still schema-2).
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            [("m/a", dt.datetime(2024, 2, 10, 0, 40), 2.0)],
            "sensor_id string, time timestamp, value double",
        ),
    )
    assert store.refresh(SensorType.FLOAT)["mode"] == "incremental"
    assert store.committed_schema(SensorType.FLOAT) == 2
    assert _pending(store) == ["2024-02", "2024-03"]

    # Ticks 2–3 drain the worklist; the version flips only at the end.
    r2 = store.upgrade_tick(SensorType.FLOAT, max_months=1)
    assert (r2["upgraded_months"], r2["remaining"], r2["schema"]) == (
        1, 1, 2,
    )
    r3 = store.upgrade_tick(SensorType.FLOAT, max_months=1)
    assert (r3["upgraded_months"], r3["remaining"], r3["schema"]) == (
        1, 0, 3,
    )
    assert store.committed_schema(SensorType.FLOAT) == 3
    assert _pending(store) is None

    # Done = maintained == direct on EVERY column (the upgrade wrote
    # real v3 values, not nulls), and a further tick is a metadata
    # noop.
    cols = ["sensor_id", "bucket", *RollupStore.VALUE_COLS]
    got = sorted(map(str, store.read(
        SensorType.FLOAT
    ).select(*cols).collect()))
    want = sorted(map(str, store._direct_buckets(
        SensorType.FLOAT, None, None
    ).select(*cols).collect()))
    assert got == want
    assert store.upgrade_tick(SensorType.FLOAT)["mode"] == "noop"

    # …and the flagship: a schema-3-gated function now serves from the
    # upgraded table, hash-equal to raw.
    eq = parse_extended("resets(m[2h])", now=NOW)
    start, end = dt.datetime(2024, 2, 10, 2), dt.datetime(2024, 2, 10, 4)
    served = evaluate_range_rollup(
        store, sensors, eq, start, end, 3600, now=NOW
    )
    raw = evaluate_range(
        sensors, lake.values(SensorType.FLOAT), eq,
        start=start, end=end, step_seconds=3600, now=NOW,
    )
    assert sorted(map(str, served.collect())) == sorted(
        map(str, raw.collect())
    )


def test_fresh_table_upgrade_is_noop(spark, tmp_path):
    lake, _sensors = _mk_lake(spark, tmp_path)
    store = RollupStore(lake, grain_s=3600)
    store.refresh(SensorType.FLOAT)
    assert store.upgrade_tick(SensorType.FLOAT) == {
        "mode": "noop", "upgraded_months": 0, "remaining": 0,
        "schema": RollupStore.SCHEMA_VERSION,
    }
    # Never-committed table: also a noop, no Spark jobs.
    assert RollupStore(lake, grain_s=60).upgrade_tick(
        SensorType.FLOAT
    )["mode"] == "noop"


def test_maintenance_tick_drives_the_upgrade(spark, tmp_path):
    """The composed loop upgrades without operator action: ticks alone
    take a v2 table to the current schema, bounded months per tick,
    alongside its ordinary refresh duties."""
    from sensapp_spark.streaming.maintenance import (
        MaintenancePlan,
        maintenance_tick,
    )

    lake, _sensors = _mk_lake(spark, tmp_path)
    _V2Store(lake, grain_s=3600).refresh(SensorType.FLOAT)
    store = RollupStore(lake, grain_s=3600)
    plan = MaintenancePlan(
        rollup_grains=(3600,), upgrade_months_per_tick=2,
        optimize=False, refresh_zonemaps=False,
    )
    r1 = maintenance_tick(lake, plan, stypes=(SensorType.FLOAT,))
    assert r1["upgrade_3600s_float"]["upgraded_months"] == 2
    assert store.committed_schema(SensorType.FLOAT) == 2
    r2 = maintenance_tick(lake, plan, stypes=(SensorType.FLOAT,))
    assert r2["upgrade_3600s_float"]["remaining"] == 0
    assert store.committed_schema(SensorType.FLOAT) == 3
    r3 = maintenance_tick(lake, plan, stypes=(SensorType.FLOAT,))
    assert r3["upgrade_3600s_float"]["mode"] == "noop"
