"""Sidecar statistics consulted by the PLANNER (round 10, r9 verdict
next-#6): the folded per-file count-min estimates choose the
broadcast-vs-shuffle side of a lake virtual-sensor join, with a
counted-bound fallback whenever the sidecar cannot answer — estimates
are hints, never authority."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.operators.timeseries import lake_virtual_sensor
from sensapp_spark.storage.lake import SensorLake, resolve_table

T0 = dt.datetime(2024, 3, 1)
ST = SensorType.FLOAT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def stats_lake(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    rows = [
        ("small", T0 + dt.timedelta(minutes=i), float(i)) for i in range(30)
    ] + [
        ("big", T0 + dt.timedelta(seconds=i), float(i % 7))
        for i in range(4000)
    ]
    lake.append_values(
        ST,
        spark.createDataFrame(
            rows, "sensor_id string, time timestamp, value double"
        ),
    )
    return lake


@pytest.fixture()
def no_auto_broadcast(spark):
    """The 100 TB condition: sides exceed Spark's 10 MB auto-broadcast,
    so only an EXPLICIT hint produces a broadcast join. Without this,
    tiny test parquet would broadcast regardless of the decision under
    test."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sidecar_estimate_flips_join_strategy(
    spark, stats_lake, no_auto_broadcast
):
    """THE strategy-flip pin: identical code, identical data — the
    sidecar estimate alone decides broadcast vs shuffle."""
    df, dec = lake_virtual_sensor(
        stats_lake, ST, "big", "small", broadcast_rows=100
    )
    assert dec == {
        "strategy": "broadcast_right",
        "source": "sidecar",
        "estimates": dec["estimates"],
    }
    # Count-min never undercounts: estimates bound the true row counts.
    assert dec["estimates"]["small"] >= 30
    assert dec["estimates"]["big"] >= 4000
    assert "BroadcastHashJoin" in _plan(df)

    # Tighten the budget below both estimates: the SAME call plans a
    # shuffle join instead.
    df2, dec2 = lake_virtual_sensor(
        stats_lake, ST, "big", "small", broadcast_rows=5
    )
    assert dec2["strategy"] == "shuffle"
    assert dec2["source"] == "sidecar"
    assert "BroadcastHashJoin" not in _plan(df2)

    # Either strategy computes the same result.
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b and len(a) > 0


def test_smaller_qualifying_side_wins_the_hint(
    spark, stats_lake, no_auto_broadcast
):
    df, dec = lake_virtual_sensor(
        stats_lake, ST, "small", "big", broadcast_rows=10**9
    )
    # Both qualify under a huge budget — the SMALLER side broadcasts.
    assert dec["strategy"] == "broadcast_left"
    assert "BroadcastHashJoin" in _plan(df)


def test_missing_sidecar_falls_back_to_counted_bound(
    spark, stats_lake, no_auto_broadcast
):
    """Hint-not-authority: with the zone map gone the decision comes
    from a bounded count over the pruned single-series scans — same
    strategy, evidence source recorded as 'counted'."""
    data = resolve_table(stats_lake._values_path(ST))
    os.unlink(os.path.join(data, "_zonemap.json"))

    df, dec = lake_virtual_sensor(
        stats_lake, ST, "big", "small", broadcast_rows=100
    )
    assert dec["source"] == "counted"
    assert dec["strategy"] == "broadcast_right"
    # The counted bound is exact for the small side and CLAMPED at
    # budget+1 for the big side (the count stops early, never scanning
    # past the bound).
    assert dec["estimates"]["small"] == 30
    assert dec["estimates"]["big"] == 101
    assert "BroadcastHashJoin" in _plan(df)


def test_counted_fallback_matches_sidecar_result(spark, stats_lake):
    before, _ = lake_virtual_sensor(
        stats_lake, ST, "big", "small", broadcast_rows=100
    )
    rows_before = sorted(map(tuple, before.collect()))
    data = resolve_table(stats_lake._values_path(ST))
    os.unlink(os.path.join(data, "_zonemap.json"))
    after, dec = lake_virtual_sensor(
        stats_lake, ST, "big", "small", broadcast_rows=100
    )
    assert dec["source"] == "counted"
    assert sorted(map(tuple, after.collect())) == rows_before
