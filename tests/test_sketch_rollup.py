"""Continuous sketch aggregates (storage/rollup.py SketchRollupStore):
a bucket-keyed KMV distinct-series + CMS heavy-hitter rollup on the
SAME exactly-once maintenance machinery as the quartet rollup. The
oracle in every test is recomputation from raw — a sketch maintained
through any crossing (append, delete, retention, reset) must equal the
sketch built fresh over the current base rows, because the refresh
rule recomputes affected buckets from the base rather than mutating
sketches incrementally (a KMV cannot un-see a deleted series)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.storage.lake import SensorLake
from sensapp_spark.storage.rollup import SketchRollupStore

T0 = dt.datetime(2024, 1, 5, 10, 0)
H = dt.timedelta(hours=1)


def _vals(spark, rows):
    return spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double"
    )


def _sketches(store, stype=SensorType.FLOAT):
    return {
        r.bucket: (tuple(r.kmv), tuple(r.cms))
        for r in store.read(stype).collect()
    }


def _direct(store, stype=SensorType.FLOAT):
    return {
        r.bucket: (tuple(r.kmv), tuple(r.cms))
        for r in store._aggregate(store.lake.values(stype))
        .drop("month")
        .collect()
    }


def _estimates(store, stype=SensorType.FLOAT):
    return {
        r.bucket: r.distinct_series
        for r in store.distinct_estimates(store.read(stype)).collect()
    }


def test_build_and_incremental_equal_direct(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("b", T0, 2.0),
                      ("a", T0 + H, 3.0)]),
    )
    store = SketchRollupStore(lake)
    assert store.refresh(SensorType.FLOAT)["mode"] == "rebuild"
    assert _sketches(store) == _direct(store)
    # New rows touch one bucket; only it recomputes, result == direct.
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("c", T0 + H, 9.0), ("b", T0 + H, 4.0)]),
    )
    rep = store.refresh(SensorType.FLOAT)
    assert rep["mode"] == "incremental"
    assert _sketches(store) == _direct(store)
    # Below-k estimates are EXACT distinct counts.
    assert _estimates(store) == {T0: 2.0, T0 + H: 3.0}


def test_delete_crossing_recomputes_sketch(spark, tmp_path):
    """delete_where removes a series from one bucket: the maintained
    KMV must drop its hash (recompute-from-base), which no
    incremental sketch mutation could do."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("b", T0, 5.0),
                      ("b", T0 + H, 6.0)]),
    )
    store = SketchRollupStore(lake)
    store.refresh(SensorType.FLOAT)
    assert _estimates(store)[T0] == 2.0
    lake.delete_where(SensorType.FLOAT, "value = 5.0",
                      quiesce_wait_s=0.2)
    store.refresh(SensorType.FLOAT)
    assert _sketches(store) == _direct(store)
    assert _estimates(store)[T0] == 1.0


def test_retention_crossing_drops_expired_buckets(spark, tmp_path):
    old = dt.datetime(2023, 11, 2, 6, 0)
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", old, 1.0), ("a", T0, 2.0)]),
    )
    store = SketchRollupStore(lake)
    store.refresh(SensorType.FLOAT)
    assert len(_sketches(store)) == 2
    lake.expire_before(dt.datetime(2024, 1, 1))
    store.refresh(SensorType.FLOAT)
    assert _sketches(store) == _direct(store)
    assert set(_sketches(store)) == {T0}


def test_realtime_covers_unrefreshed_tail(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT, _vals(spark, [("a", T0, 1.0)])
    )
    store = SketchRollupStore(lake)
    store.refresh(SensorType.FLOAT)
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("b", T0, 2.0), ("c", T0 + H, 3.0)]),
    )
    live = {
        r.bucket: tuple(r.kmv)
        for r in store.read_realtime(SensorType.FLOAT).collect()
    }
    want = {
        r.bucket: tuple(r.kmv) for r in
        store._aggregate(store.lake.values(SensorType.FLOAT))
        .drop("month").collect()
    }
    assert live == want


def test_fold_merges_sketches_losslessly(spark, tmp_path):
    """Daily fold of hourly sketches == sketch built at daily grain
    directly: KMV union-dedup-keep-k and CMS counter addition are the
    mergeability contracts the fold relies on."""
    rows = [
        (f"s{i % 9}", T0 + dt.timedelta(minutes=37 * i), float(i))
        for i in range(120)
    ]
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(SensorType.FLOAT, _vals(spark, rows))
    hourly = SketchRollupStore(lake, grain_s=3600)
    hourly.refresh(SensorType.FLOAT)
    daily = SketchRollupStore(lake, grain_s=86400)
    folded = {
        r.bucket: (tuple(r.kmv), tuple(r.cms))
        for r in hourly.read_folded(SensorType.FLOAT, 86400).collect()
    }
    direct = {
        r.bucket: (tuple(r.kmv), tuple(r.cms))
        for r in daily._aggregate(lake.values(SensorType.FLOAT))
        .drop("month").collect()
    }
    assert folded == direct
    with pytest.raises(ValueError, match="multiple"):
        hourly.read_folded(SensorType.FLOAT, 5400)


def test_cms_never_underestimates(spark, tmp_path):
    rows = [
        (f"s{i % 5}", T0 + dt.timedelta(minutes=11 * i), float(i))
        for i in range(150)
    ]
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(SensorType.FLOAT, _vals(spark, rows))
    store = SketchRollupStore(lake)
    store.refresh(SensorType.FLOAT)
    probes = spark.createDataFrame(
        [(f"s{i}",) for i in range(5)], "sensor_id string"
    )
    est = {
        (r.bucket, r.sensor_id): r.rows_estimate
        for r in store.heavy_hitters(
            store.read(SensorType.FLOAT), probes
        ).collect()
    }
    truth = {
        (r.bucket, r.sensor_id): r.c
        for r in lake.values(SensorType.FLOAT)
        .groupBy(F.date_trunc("hour", "time").alias("bucket"),
                 "sensor_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for k, t in truth.items():
        assert est[k] >= t


def test_kmv_estimator_regime_above_k(spark, tmp_path):
    """Above k distinct series per bucket, the estimate switches to
    (k−1)·H/h_k — pinned within the standard KMV error envelope."""
    n = 700  # > KMV_K = 256
    rows = [
        (f"u{i}", T0 + dt.timedelta(seconds=i), 1.0) for i in range(n)
    ]
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(SensorType.FLOAT, _vals(spark, rows))
    store = SketchRollupStore(lake)
    store.refresh(SensorType.FLOAT)
    (est,) = _estimates(store).values()
    assert est != n  # the estimator regime, not exact counting
    assert abs(est - n) / n < 5 / (256 ** 0.5)  # ~5σ KMV envelope


def test_sketch_and_quartet_stores_coexist(spark, tmp_path):
    """Same lake, same grain: the quartet rollup and the sketch rollup
    maintain independent tables (distinct suffixes), each with its own
    cursor."""
    from sensapp_spark.storage.rollup import RollupStore

    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT, _vals(spark, [("a", T0, 1.0)])
    )
    quartet = RollupStore(lake)
    sketch = SketchRollupStore(lake)
    assert quartet._path(SensorType.FLOAT) != sketch._path(
        SensorType.FLOAT
    )
    quartet.refresh(SensorType.FLOAT)
    sketch.refresh(SensorType.FLOAT)
    assert quartet.read(SensorType.FLOAT).count() == 1
    assert sketch.read(SensorType.FLOAT).count() == 1
    # The quartet-serving grain discovery must NOT pick up sketch
    # tables (they cannot answer closed quartet windows).
    from sensapp_spark.query.rollup_serve import maintained_grains

    assert maintained_grains(lake) == [3600]
