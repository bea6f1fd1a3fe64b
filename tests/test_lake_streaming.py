"""SensorLake write/read/admin tests + Structured Streaming ingest
(B4/B5, X-dedup, X-vac, streaming lifecycle)."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.csv_importer import IngestBatch, plan_csv
from sensapp_spark.storage.lake import SensorLake
from sensapp_spark.streaming.ingest import stream_csv_directory

T0 = dt.datetime(2024, 1, 15)
T1 = dt.datetime(2024, 2, 15)


def make_batch(spark, rows, sensors=None):
    sensors = sensors or [("u1", "temp", "Float", None, None, {})]
    return IngestBatch(
        sensors=spark.createDataFrame(
            sensors,
            "sensor_id string, name string, type string, unit string, "
            "unit_description string, labels map<string,string>"),
        values={SensorType.FLOAT: spark.createDataFrame(
            rows, "sensor_id string, time timestamp, value double")},
    )


def test_publish_and_read(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.publish(make_batch(spark, [("u1", T0, 1.0), ("u1", T1, 2.0)]))
    assert lake.sensors().count() == 1
    assert lake.values(SensorType.FLOAT).count() == 2


def test_month_partitioning_and_pruning(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.publish(make_batch(spark, [("u1", T0, 1.0), ("u1", T1, 2.0)]))
    from sensapp_spark.storage.lake import resolve_table

    # Month dirs live inside the committed version dir (pointer layout).
    root = resolve_table(str(tmp_path / "lake" / "float_values"))
    assert sorted(d for d in os.listdir(root) if d.startswith("month=")) == [
        "month=2024-01", "month=2024-02"]
    pruned = lake.values(SensorType.FLOAT, start=dt.datetime(2024, 2, 1))
    assert [r.value for r in pruned.collect()] == [2.0]
    # The month predicate must appear as a partition filter in the plan.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan


def test_sensor_upsert_idempotent(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    b = make_batch(spark, [("u1", T0, 1.0)])
    lake.publish(b)
    lake.publish(make_batch(spark, [("u1", T1, 2.0)]))  # same sensor again
    assert lake.sensors().count() == 1
    assert lake.values(SensorType.FLOAT).count() == 2


def test_dedup_rewrite(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.publish(make_batch(spark, [("u1", T0, 1.0)]))
    lake.publish(make_batch(spark, [("u1", T0, 1.0)]))  # exact duplicate
    assert lake.values(SensorType.FLOAT).count() == 2
    lake.dedup_rewrite(SensorType.FLOAT)
    assert lake.values(SensorType.FLOAT).count() == 1


def test_optimize_compacts_and_sorts(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    for i in range(3):
        lake.publish(make_batch(
            spark, [("u1", T0 + dt.timedelta(minutes=i), float(i))]))
    lake.optimize(SensorType.FLOAT)
    from sensapp_spark.storage.lake import resolve_table

    root = os.path.join(
        resolve_table(str(tmp_path / "lake" / "float_values")),
        "month=2024-01",
    )
    files = [f for f in os.listdir(root) if f.endswith(".parquet")]
    assert len(files) == 1
    assert lake.values(SensorType.FLOAT).count() == 3


CSV1 = """datetime,sensor_name,value,unit
2024-01-01T00:00:00Z,temp,20.5,°C
2024-01-01T00:01:00Z,temp,21.0,°C
"""
CSV2 = """datetime,sensor_name,value,unit
2024-01-01T00:02:00Z,temp,21.5,°C
2024-01-01T00:00:00Z,hum,60.0,%
"""


def test_stream_csv_directory(spark, tmp_path):
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    lake = SensorLake(spark, str(tmp_path / "lake"))
    plan = plan_csv(
        ["datetime", "sensor_name", "value", "unit"],
        [["2024-01-01T00:00:00Z", "temp", "20.5", "°C"]],
    )
    (in_dir / "a.csv").write_text(CSV1)
    q = stream_csv_directory(
        spark, str(in_dir), lake, plan,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert lake.values(SensorType.FLOAT).count() == 2

    # Second file arrives → new micro-batch appends, sensors upsert.
    (in_dir / "b.csv").write_text(CSV2)
    q2 = stream_csv_directory(
        spark, str(in_dir), lake, plan,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    assert lake.values(SensorType.FLOAT).count() == 4
    names = {r.name for r in lake.sensors().collect()}
    assert names == {"temp", "hum"}


def test_stream_lines_socket(spark, tmp_path):
    """Real socket feed → line-protocol parse → lake (S4 streaming path)."""
    import socket
    import socketserver
    import threading
    import time as time_mod

    from sensapp_spark.streaming.ingest import stream_lines_socket

    lines = (b"weather,site=x temp=11.5 1700000000000000000\n"
             b"weather,site=y temp=12.5 1700000060000000000\n")

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(lines)
            time_mod.sleep(20)  # keep the connection open for the source

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.daemon_threads = True
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    lake = SensorLake(spark, str(tmp_path / "socket_lake"))
    q = stream_lines_socket(
        spark, "127.0.0.1", port, lake,
        checkpoint_dir=str(tmp_path / "socket_ckpt"))
    try:
        deadline = time_mod.time() + 90
        while time_mod.time() < deadline:
            if lake.values(SensorType.FLOAT).count() >= 2:
                break
            time_mod.sleep(1)
        assert lake.values(SensorType.FLOAT).count() == 2
        names = {r.name for r in lake.sensors().collect()}
        assert names == {"weather temp"}
        sites = {r.labels["site"] for r in lake.sensors().collect()}
        assert sites == {"x", "y"}
    finally:
        q.stop()
        server.shutdown()


def test_concurrent_upserts_lose_nothing(spark, tmp_path):
    """Two (here: eight) writers upserting the dimension concurrently:
    the directory lock serializes the read-union-swap, so every
    publisher's sensors survive — without it, interleaved read→rewrite
    pairs drop whichever writer read the older dimension (lost update)."""
    import threading

    lake = SensorLake(spark, str(tmp_path / "lake"))
    errors = []

    def publish(i: int) -> None:
        sensors = [(f"u{i}", f"s{i}", "Float", None, None, {})]
        try:
            lake.upsert_sensors(
                spark.createDataFrame(
                    sensors,
                    "sensor_id string, name string, type string, "
                    "unit string, unit_description string, "
                    "labels map<string,string>",
                )
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=publish, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    got = {r.sensor_id for r in lake.sensors().collect()}
    assert got == {f"u{i}" for i in range(8)}
    # Lock is released — a follow-up upsert proceeds immediately
    # (the inert flock file itself remains on disk by design).
    publish(99)
    assert not errors
    assert lake.sensors().count() == 9


def test_dir_lock_timeout_and_dead_holder_release(spark, tmp_path):
    import fcntl
    import subprocess
    import sys

    lake = SensorLake(spark, str(tmp_path / "lake"))
    path = lake._sensors_path()
    lock = f"{path}.lock"

    # Held by a LIVE holder (a second fd — flock conflicts even within
    # one process) → a waiter times out loudly no matter how old the
    # lock file is; age never breaks a live holder's exclusion.
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    old = time.time() - 100_000
    os.utime(lock, (old, old))
    with pytest.raises(TimeoutError, match="lake lock"):
        with lake._dir_lock(path, timeout=0.3):
            pass
    os.close(fd)

    # A holder process that DIES without unlocking: the kernel releases
    # the lock with it, so the next writer acquires immediately — no
    # staleness heuristic, no break protocol.
    subprocess.run(
        [sys.executable, "-c",
         "import fcntl, os, sys\n"
         f"fd = os.open({lock!r}, os.O_CREAT | os.O_RDWR)\n"
         "fcntl.flock(fd, fcntl.LOCK_EX)\n"
         "os._exit(0)  # die holding the lock\n"],
        check=True,
    )
    with lake._dir_lock(path, timeout=2.0):
        pass  # acquired despite the dead holder never unlocking


def test_materialized_catalog_snapshot(spark, tmp_path):
    """C1/C2 snapshots equal the recompute-on-read views, refresh after
    a publish, and return None before the first materialization."""
    from sensapp_spark.operators.catalog import metrics_summary

    lake = SensorLake(spark, str(tmp_path / "lake"))
    assert lake.catalog_metrics() is None and lake.catalog_sensors() is None

    lake.publish(make_batch(spark, [("u1", T0, 1.0)]))
    lake.materialize_catalog()
    snap = {r.name: r.series_count for r in lake.catalog_metrics().collect()}
    live = {
        r.name: r.series_count
        for r in metrics_summary(lake.sensors()).collect()
    }
    assert snap == live == {"temp": 1}
    assert lake.catalog_sensors().count() == 1

    # A new sensor does not appear until re-materialization (MV-style
    # freshness), then does.
    lake.publish(make_batch(
        spark, [("u2", T0, 2.0)],
        sensors=[("u2", "hum", "Float", None, None, {})],
    ))
    assert {r.name for r in lake.catalog_metrics().collect()} == {"temp"}
    lake.materialize_catalog()
    assert {r.name for r in lake.catalog_metrics().collect()} == {
        "temp", "hum",
    }
