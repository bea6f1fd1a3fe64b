"""Composed maintenance scheduler (streaming/maintenance.py): rollup
refresh, sketch refresh, stats-driven compaction, retention, and
zone-map refresh run TOGETHER — under live concurrent ingest — with no
lost updates and bounded retry pressure. Each primitive's
exactly-once story is tested in its own suite; this suite is the
composition: a compaction rewriting the version a refresh scans, a
retention expiring months mid-schedule, writers racing every tick."""

import datetime as dt
import threading

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.storage.lake import SensorLake
from sensapp_spark.storage.rollup import RollupStore, SketchRollupStore
from sensapp_spark.streaming.maintenance import (
    MaintenancePlan,
    maintenance_tick,
    stream_maintenance,
)

T0 = dt.datetime(2024, 1, 5, 10, 0)


def _vals(spark, rows):
    return spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double"
    )


def _quartet(lake, grain=3600):
    store = RollupStore(lake, grain_s=grain)
    return {
        (r.sensor_id, r.bucket): (r.cnt, r.vsum)
        for r in store.read(SensorType.FLOAT).collect()
    }


def _direct_quartet(lake, grain=3600):
    store = RollupStore(lake, grain_s=grain)
    return {
        (r.sensor_id, r.bucket): (r.cnt, r.vsum)
        for r in store._aggregate(lake.values(SensorType.FLOAT))
        .drop("month")
        .collect()
    }


def test_single_tick_composes_all_steps(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    old = dt.datetime(2023, 10, 2)
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("a", old, 9.0)]),
    )
    seen = []
    plan = MaintenancePlan(
        rollup_grains=(3600,),
        sketch_grains=(3600,),
        retention_before=lambda: dt.datetime(2024, 1, 1),
        extra_ticks=(lambda: seen.append(1) or "ran",),
    )
    rep = maintenance_tick(lake, plan)
    assert rep["rollup_3600s_float"]["mode"] == "rebuild"
    assert rep["sketch_3600s_float"]["mode"] == "rebuild"
    assert rep["optimize_float"]["files_per_month"] >= 1
    assert rep["retention"]["FLOAT"]["months"] == ["2023-10"]
    assert rep["extra_0"] == "ran"
    assert seen == [1]
    assert "conflicts" not in rep
    # The NEXT tick folds the expired month out of the aggregates
    # (the lazy whole-month delete crossing), leaving rollup == direct.
    rep2 = maintenance_tick(lake, plan)
    assert _quartet(lake) == _direct_quartet(lake)
    assert set(b for _, b in _quartet(lake)) == {T0}
    store = SketchRollupStore(lake)
    assert {
        r.bucket for r in store.read(SensorType.FLOAT).collect()
    } == {T0}


def test_loop_under_concurrent_ingest_no_lost_updates(spark, tmp_path):
    """Two writer threads append 12 distinct batches while the
    composed loop ticks continuously (rollup + sketch + compaction +
    zone maps). Afterwards: every appended row is present (compaction
    lost nothing), the final tick's aggregates equal direct
    aggregation over the final table, and total CAS retry pressure
    stayed bounded (no step ever exhausted its retries)."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(SensorType.FLOAT, _vals(spark, [("seed", T0, 0.0)]))
    n_batches, rows_per = 6, 8
    errors: list = []

    def writer(wid: int):
        try:
            for b in range(n_batches):
                rows = [
                    (
                        f"w{wid}s{i % 3}",
                        T0 + dt.timedelta(minutes=30 * b + i, hours=wid),
                        float(wid * 1000 + b * 10 + i),
                    )
                    for i in range(rows_per)
                ]
                lake.append_values(SensorType.FLOAT, _vals(spark, rows))
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    plan = MaintenancePlan(
        rollup_grains=(3600,), sketch_grains=(3600,), optimize=True
    )
    reports: list[dict] = []
    stop = threading.Event()

    def loop():
        try:
            while not stop.is_set():
                reports.append(maintenance_tick(lake, plan))
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    looper = threading.Thread(target=loop)
    looper.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    looper.join()
    assert not errors, errors
    assert reports, "the loop must have ticked at least once"
    # No step ever exhausted its internal CAS retries.
    assert sum(r.get("conflicts", 0) for r in reports) == 0
    # No lost updates: every appended row survived every compaction.
    # An append that finished into a JUST-superseded dir is visible
    # only after the next maintenance pass reconciles the superseded
    # manifest (the documented append-intent protocol), so settle
    # FIRST, then count — rows may be deferred, never lost.
    maintenance_tick(lake, plan)
    got = lake.values(SensorType.FLOAT).count()
    assert got == 1 + 2 * n_batches * rows_per
    assert _quartet(lake) == _direct_quartet(lake)
    sk = SketchRollupStore(lake)
    maintained = {
        r.bucket: tuple(r.kmv)
        for r in sk.read(SensorType.FLOAT).collect()
    }
    direct = {
        r.bucket: tuple(r.kmv)
        for r in sk._aggregate(lake.values(SensorType.FLOAT))
        .drop("month")
        .collect()
    }
    assert maintained == direct


def test_streamed_scheduler_drains_ticks(spark, tmp_path):
    """The Structured-Streaming wrapper: two dropped tick files drive
    two composed passes (availableNow drain), reports surface through
    the callback, and the maintained rollup ends correct."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("b", T0, 2.0)]),
    )
    tick_dir = str(tmp_path / "ticks")
    import os

    os.makedirs(tick_dir)
    for i in range(2):
        with open(os.path.join(tick_dir, f"t{i}.txt"), "w") as fh:
            fh.write(f"tick{i}\n")
    reports: list[dict] = []
    q = stream_maintenance(
        spark,
        lake,
        MaintenancePlan(rollup_grains=(3600,), optimize=False,
                        refresh_zonemaps=False),
        checkpoint_dir=str(tmp_path / "ckpt"),
        tick_dir=tick_dir,
        trigger_available_now=True,
        on_report=reports.append,
    )
    q.awaitTermination(120)
    assert reports and reports[0]["rollup_3600s_float"]["mode"] == "rebuild"
    assert _quartet(lake) == _direct_quartet(lake)


def test_deferred_zonemap_fold(spark, tmp_path):
    """zonemap_on_append=False (round 11 — the measured write-
    throughput lever): appends leave new files unmapped (read
    UNPRUNED, never mispruned), and the maintenance tick's
    refresh_zonemap folds them in."""
    from sensapp_spark.storage import zonemap as zm
    from sensapp_spark.storage.lake import resolve_table

    lake = SensorLake(
        spark, str(tmp_path / "lake"), zonemap_on_append=False
    )
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("b", T0, 2.0)]),
    )
    data = resolve_table(lake._values_path(SensorType.FLOAT))
    files = zm.read_zonemap(data)
    assert not files  # nothing folded at append
    # Unmapped files are still READ (unpruned, not mispruned).
    assert lake.values(
        SensorType.FLOAT, sensor_ids=["a"]
    ).count() == 1
    rep = maintenance_tick(
        lake,
        MaintenancePlan(rollup_grains=(), optimize=False,
                        refresh_zonemaps=True),
    )
    assert "zonemap_float" in rep
    files = zm.read_zonemap(data)
    assert files and len(files) >= 1  # the tick folded the footer stats


def test_gateway_maintain_route(spark, tmp_path):
    """POST /api/v1/admin/maintain: one composed tick through the
    gateway — refresh + compaction + zone maps + explicit retention."""
    from sensapp_spark.server.app import create_app

    lake = SensorLake(spark, str(tmp_path / "lake"))
    app = create_app(spark, lake)
    app.testing = True
    with app.test_client() as c:
        c.post(
            "/publish",
            data="datetime,mt_a\n"
                 "2023-10-05T10:00:00Z,1.0\n"
                 "2024-01-05T10:00:00Z,2.0\n",
            content_type="text/csv",
        )
        r = c.post(
            "/api/v1/admin/maintain?sketch_grains=3600"
            "&retain_before=2024-01-01T00:00:00Z"
        )
        assert r.status_code == 200
        body = r.get_json()
        assert body["conflicts"] == 0
        assert body["steps"]["rollup_3600s_float"]["mode"] == "rebuild"
        assert body["steps"]["sketch_3600s_float"]["mode"] == "rebuild"
        assert body["steps"]["retention"]["FLOAT"]["months"] == [
            "2023-10"
        ]
        assert c.post(
            "/api/v1/admin/maintain?retain_before=junk"
        ).status_code == 400
        # Refresh runs BEFORE retention inside a tick (documented
        # order), so the expired month folds out of the aggregates on
        # the NEXT tick — the scheduler's steady state.
        assert c.post("/api/v1/admin/maintain").status_code == 200
    assert _quartet(lake) == _direct_quartet(lake)


def test_conflict_is_reported_not_raised(spark, tmp_path, monkeypatch):
    """A step that exhausts its CAS retries lands in the report as a
    conflict (the next tick retries); it must not kill the loop."""
    from sensapp_spark.storage.lake import CommitConflict

    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(SensorType.FLOAT, _vals(spark, [("a", T0, 1.0)]))

    def always_lose(self, stype, max_retries=5):
        raise CommitConflict("synthetic: lost every race")

    monkeypatch.setattr(RollupStore, "refresh", always_lose)
    rep = maintenance_tick(
        lake,
        MaintenancePlan(rollup_grains=(3600,), optimize=False,
                        refresh_zonemaps=False),
    )
    assert rep["conflicts"] == 1
    assert "conflict" in rep["rollup_3600s_float"]
