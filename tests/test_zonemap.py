"""File-level zone maps (storage/zonemap.py): data skipping below the
month grain, and the safety rules that make a stale/missing/partial map
a performance event, never a correctness one.

The reference has no file-skipping layer (its backends delegate to DB
indexes — clickhouse init.sql ORDER BY (sensor_id, timestamp_us)); this
is the Delta/Iceberg-style stats layer for the lake's plain-parquet
versioned layout, so everything here is pinned by behavior, not by a
reference oracle."""

import datetime as dt
import glob
import json
import os

import pytest

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.storage import zonemap as zm
from sensapp_spark.storage.lake import SensorLake, resolve_table


def _mk_lake(spark, tmp_path, months=(1, 2, 3), sensors=8, samples=5):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    rows = [
        (f"sensor-{s:04d}", dt.datetime(2024, m, 3 + i, 10), float(i))
        for m in months
        for s in range(sensors)
        for i in range(samples)
    ]
    df = spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double"
    )
    lake.append_values(SensorType.FLOAT, df)
    return lake, len(rows)


def _data_dir(lake):
    return resolve_table(os.path.join(lake.root, "float_values"))


def test_append_writes_sidecar_with_both_axes(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path)
    doc = json.load(open(os.path.join(_data_dir(lake), zm.ZONEMAP_NAME)))
    assert doc["version"] == zm.ZONEMAP_VERSION
    assert doc["files"]
    for st in doc["files"].values():
        # TIMESTAMP_MICROS stats + short UUID-ish strings: every axis
        # present on freshly-written files.
        assert {"rows", "tmin", "tmax", "smin", "smax"} <= set(st)
        assert st["tmin"] <= st["tmax"]
        assert st["smin"] <= st["smax"]


def test_clustered_optimize_prunes_point_lookup_to_one_file_per_month(
    spark, tmp_path
):
    lake, total = _mk_lake(spark, tmp_path, sensors=40, samples=10)
    lake.optimize(SensorType.FLOAT, files_per_month=4)
    data = _data_dir(lake)
    all_files = glob.glob(data + "/month=*/*.parquet")
    assert len(all_files) >= 9  # ~4 per month across 3 months

    d = lake.values(SensorType.FLOAT, sensor_ids=["sensor-0007"])
    assert d.count() == 30  # 10 samples x 3 months
    # Range clustering makes per-file sensor ranges disjoint: the probe
    # plans over ~1 file per month, not all of them.
    assert len(d.inputFiles()) <= 3

    # Time + sensor combined: a single file survives.
    d2 = lake.values(
        SensorType.FLOAT,
        start=dt.datetime(2024, 2, 1),
        end=dt.datetime(2024, 2, 28),
        sensor_ids=["sensor-0039"],
    )
    assert d2.count() == 10
    assert len(d2.inputFiles()) == 1


def test_results_identical_with_and_without_pruning(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path, sensors=12)
    lake.optimize(SensorType.FLOAT, files_per_month=3)
    lo, hi = dt.datetime(2024, 1, 4), dt.datetime(2024, 2, 5)
    pruned = lake.values(
        SensorType.FLOAT, lo, hi, sensor_ids=["sensor-0003"]
    )
    full = (
        lake.values(SensorType.FLOAT, lo, hi)
        .filter("sensor_id = 'sensor-0003'")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_stale_map_never_hides_rows(spark, tmp_path):
    """A file the sidecar does not know (lost refresh, crashed writer,
    cross-host race) is always read — pruning only drops files whose
    recorded stats PROVE non-match."""
    lake, _ = _mk_lake(spark, tmp_path)
    data = _data_dir(lake)
    path = os.path.join(data, zm.ZONEMAP_NAME)
    before = json.load(open(path))

    extra = spark.createDataFrame(
        [("zz-unmapped", dt.datetime(2024, 2, 14, 10), 7.0)],
        "sensor_id string, time timestamp, value double",
    )
    lake.append_values(SensorType.FLOAT, extra)
    # Simulate the lost refresh: restore the pre-append sidecar.
    zm.write_zonemap(data, before["files"])

    d = lake.values(SensorType.FLOAT, sensor_ids=["zz-unmapped"])
    assert d.count() == 1


def test_empty_prune_returns_empty_frame_with_schema(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path)
    d = lake.values(
        SensorType.FLOAT,
        start=dt.datetime(2030, 1, 1),
        end=dt.datetime(2030, 2, 1),
    )
    assert d.count() == 0
    assert d.columns == ["sensor_id", "time", "value", "month"]


def test_zonemap_travels_with_at_seq(spark, tmp_path):
    lake, total = _mk_lake(spark, tmp_path)
    lake.optimize(SensorType.FLOAT)
    hist = lake.history(SensorType.FLOAT)
    old_seq = [h["seq"] for h in hist if h["on_disk"]][0]
    d = lake.values(
        SensorType.FLOAT, at_seq=old_seq, sensor_ids=["sensor-0001"]
    )
    assert d.count() == 15  # 5 samples x 3 months


def test_partial_stats_prune_on_known_axis_only():
    files = ["/d/month=2024-01/a.parquet", "/d/month=2024-01/b.parquet"]
    zmap = {
        "month=2024-01/a.parquet": {"rows": 5, "smin": "s-a", "smax": "s-f"},
        "month=2024-01/b.parquet": {"rows": 5, "smin": "s-m", "smax": "s-z"},
    }
    # No time bounds recorded (INT96-era file): a time predicate keeps
    # both; the sensor axis still prunes.
    kept = zm.prune_files("/d", files, zmap, t_lo_us=0, t_hi_us=10)
    assert kept == files
    kept = zm.prune_files("/d", files, zmap, sensor_ids=["s-p"])
    assert kept == [files[1]]


def test_cms_membership_prunes_inside_overlapping_ranges():
    """Unclustered files whose (smin, smax) ranges all overlap are
    still prunable when the probed id count-min-probes to 0 in a
    file's own counters — absence proof, never an undercount."""
    files = ["/d/month=2024-01/a.parquet", "/d/month=2024-01/b.parquet"]

    def counters(*ids):
        c: dict[str, int] = {}
        for v in ids:
            for row, salt in enumerate(zm.CMS_SALTS):
                key = f"{row}:{zm._portable_hash_py(v, salt) % zm.CMS_W}"
                c[key] = c.get(key, 0) + 1
        return c

    zmap = {
        "month=2024-01/a.parquet": {
            "rows": 2, "smin": "s-a", "smax": "s-z",
            "cms": counters("s-a", "s-z"),
        },
        "month=2024-01/b.parquet": {
            "rows": 2, "smin": "s-b", "smax": "s-y",
            "cms": counters("s-b", "s-y"),
        },
    }
    # Both ranges span s-b; only b.parquet actually holds it.
    assert zm.prune_files("/d", files, zmap, sensor_ids=["s-b"]) == [
        files[1]
    ]
    # A multi-id probe keeps any file holding ANY of the ids.
    assert (
        zm.prune_files("/d", files, zmap, sensor_ids=["s-a", "s-b"])
        == files
    )
    # No counters recorded (pre-round-9 writer): axis unknown, kept.
    zmap["month=2024-01/a.parquet"].pop("cms")
    assert zm.prune_files("/d", files, zmap, sensor_ids=["s-b"]) == files


def test_cms_membership_prunes_unclustered_lake_scan(spark, tmp_path):
    """End-to-end: two appends with disjoint sensor sets but globally
    overlapping id ranges (no optimize between them) — a point fetch
    plans only the append that holds the id."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    mk = lambda ids: spark.createDataFrame(  # noqa: E731
        [(s, dt.datetime(2024, 1, 5, 10), 1.0) for s in ids],
        "sensor_id string, time timestamp, value double",
    ).coalesce(1)
    lake.append_values(SensorType.FLOAT, mk(["s-a", "s-z"]))
    lake.append_values(SensorType.FLOAT, mk(["s-b", "s-y"]))
    d = lake.values(SensorType.FLOAT, sensor_ids=["s-b"])
    assert d.count() == 1
    assert len(d.inputFiles()) == 1


def test_non_string_sensor_column_records_no_sketches(tmp_path):
    """Round-9 review: the sketches hash str(v), so a binary/numeric
    sensor_id column would key counters under reprs no probe asks for
    — and a zero counter row is an absence PROOF, so that mis-keying
    would be a wrong prune. Non-string columns must stay sketch-less
    (axis unknown, file kept), like the smin/smax isinstance guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "bin.parquet")
    pq.write_table(
        pa.table({
            "sensor_id": pa.array([b"s-b", b"s-y"], type=pa.binary()),
            "time": [1, 2],
            "value": [1.0, 2.0],
        }),
        p,
    )
    st = zm.file_stats(p)
    assert "kmv" not in st and "cms" not in st
    zmap = {"bin.parquet": st}
    kept = zm.prune_files(
        str(tmp_path), [p], zmap, sensor_ids=["s-b"]
    )
    assert kept == [p]


def test_geometry_mismatch_strips_sketches(spark, tmp_path):
    """The counters' hash geometry is part of the on-disk format now
    that they prove absence: a sidecar stamped with a different
    CMS_W/d/k must degrade to 'sketch axis unknown' at read time —
    min/max pruning survives, membership pruning and sketch folds do
    not silently lie."""
    lake, _ = _mk_lake(spark, tmp_path)
    data = _data_dir(lake)
    path = os.path.join(data, zm.ZONEMAP_NAME)
    doc = json.load(open(path))
    assert doc["sketch_geom"] == zm._SKETCH_GEOM
    doc["sketch_geom"] = {"w": 1024, "d": 2, "k": 64}
    with open(path, "w") as f:
        json.dump(doc, f)
    zmap = zm.read_zonemap(data)
    assert zmap is not None
    for st in zmap.values():
        assert "kmv" not in st and "cms" not in st
        assert "smin" in st  # min/max axes survive the strip
    # Sketch folds see incomplete coverage and answer None, never a
    # wrong-geometry estimate.
    from sensapp_spark.datamodel.types import SensorType

    assert lake.sketch_distinct_series(SensorType.FLOAT) is None


def test_geometry_mismatch_refresh_rebuilds_sketches(spark, tmp_path):
    """Second-pass review: a refresh over a stale-geometry sidecar
    must REBUILD the entries (one-time O(files) cost), not persist the
    stripped sketch-less entries under the new stamp forever."""
    lake, _ = _mk_lake(spark, tmp_path)
    data = _data_dir(lake)
    path = os.path.join(data, zm.ZONEMAP_NAME)
    doc = json.load(open(path))
    doc["sketch_geom"] = {"w": 1024, "d": 2, "k": 64}
    with open(path, "w") as f:
        json.dump(doc, f)
    files = glob.glob(os.path.join(data, "month=*", "*.parquet"))
    merged = zm.refresh_zonemap(data, files)
    assert merged and all(
        "kmv" in st and "cms" in st for st in merged.values()
    )
    # And the rewritten doc carries the current stamp, so the rebuilt
    # sketches are trusted again.
    from sensapp_spark.datamodel.types import SensorType

    assert lake.sketch_distinct_series(SensorType.FLOAT) is not None


def test_malformed_sidecar_entry_degrades_not_raises(tmp_path):
    """A non-dict files entry (torn/foreign writer) means 'file
    unknown' — read_zonemap's contract is never-an-error."""
    import json as _json

    data = str(tmp_path)
    with open(os.path.join(data, zm.ZONEMAP_NAME), "w") as f:
        _json.dump(
            {
                "version": zm.ZONEMAP_VERSION,
                "sketch_geom": {"w": 1, "d": 1, "k": 1},  # mismatched
                "files": {"a.parquet": ["not", "a", "dict"]},
            },
            f,
        )
    assert zm.read_zonemap(data) == {}


def test_distributed_stats_equal_driver_stats(spark, tmp_path):
    """file_stats_many's mapInPandas fan-out (the module docstring's
    promised cluster path, real since round 9) must produce exactly
    the driver loop's output — stats are a pure function of the file
    bytes, so the execution venue cannot matter."""
    lake, _ = _mk_lake(spark, tmp_path, sensors=16)
    files = glob.glob(os.path.join(_data_dir(lake), "month=*", "*.parquet"))
    assert len(files) > 1
    driver = zm.file_stats_many(files)  # no session → driver loop
    dist = zm.file_stats_many(files, spark=spark, distribute_threshold=1)
    assert driver == dist
    # Torn file skipped identically on both paths.
    bad = os.path.join(_data_dir(lake), "month=2024-01", "torn.parquet")
    with open(bad, "wb") as f:
        f.write(b"not a parquet file")
    try:
        d2 = zm.file_stats_many(files + [bad])
        x2 = zm.file_stats_many(
            files + [bad], spark=spark, distribute_threshold=1
        )
        assert bad not in d2 and bad not in x2 and d2 == x2
    finally:
        os.remove(bad)


def test_month_path_pruning_without_stats():
    files = [
        "/d/month=2024-01/a.parquet",
        "/d/month=2024-03/b.parquet",
    ]
    kept = zm.prune_files(
        "/d", files, None, month_lo="2024-02", month_hi="2024-12"
    )
    assert kept == [files[1]]


def test_inclusive_bounds_keep_edge_files():
    files = ["/d/month=2024-01/a.parquet"]
    zmap = {
        "month=2024-01/a.parquet": {"rows": 1, "tmin": 100, "tmax": 200}
    }
    # Query window touching either bound exactly keeps the file.
    assert zm.prune_files("/d", files, zmap, t_lo_us=200, t_hi_us=300)
    assert zm.prune_files("/d", files, zmap, t_lo_us=0, t_hi_us=100)
    assert not zm.prune_files("/d", files, zmap, t_lo_us=201, t_hi_us=300)
    assert not zm.prune_files("/d", files, zmap, t_lo_us=0, t_hi_us=99)


def test_long_string_stats_are_not_recorded(spark, tmp_path):
    """Writer-truncatable bounds are unsound — ids at/over MAX_STAT_LEN
    must leave the sensor axis unknown (file kept), never mispruned."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    long_id = "x" * zm.MAX_STAT_LEN
    df = spark.createDataFrame(
        [(long_id, dt.datetime(2024, 1, 1, 10), 1.0)],
        "sensor_id string, time timestamp, value double",
    )
    lake.append_values(SensorType.FLOAT, df)
    doc = json.load(open(os.path.join(_data_dir(lake), zm.ZONEMAP_NAME)))
    (st,) = doc["files"].values()
    assert "smin" not in st
    assert lake.values(SensorType.FLOAT, sensor_ids=[long_id]).count() == 1


def test_corrupt_sidecar_disables_pruning(spark, tmp_path):
    lake, total = _mk_lake(spark, tmp_path)
    with open(os.path.join(_data_dir(lake), zm.ZONEMAP_NAME), "w") as f:
        f.write("{not json")
    d = lake.values(SensorType.FLOAT, sensor_ids=["sensor-0001"])
    assert d.count() == 15


def test_refresh_zonemap_backfills_existing_table(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path)
    data = _data_dir(lake)
    os.unlink(os.path.join(data, zm.ZONEMAP_NAME))
    lake.refresh_zonemap(SensorType.FLOAT)
    assert zm.read_zonemap(data)


def test_rewrite_commits_sidecar_atomically_with_version(spark, tmp_path):
    """dedup_rewrite/optimize build the map INSIDE the new version dir
    before the commit-log claim — a reader can never pair a version's
    data with another version's map."""
    lake, _ = _mk_lake(spark, tmp_path)
    old_data = _data_dir(lake)
    lake.dedup_rewrite(SensorType.FLOAT)
    new_data = _data_dir(lake)
    assert new_data != old_data
    zmap = zm.read_zonemap(new_data)
    assert zmap
    # Every data file of the committed version is mapped.
    import glob as g

    rels = {
        os.path.relpath(f, new_data)
        for f in g.glob(new_data + "/month=*/*.parquet")
    }
    assert rels == set(zmap)


@pytest.mark.parametrize("n_ids", [1, 3])
def test_values_sensor_ids_is_a_real_filter(spark, tmp_path, n_ids):
    """sensor_ids filters rows, not just files — a caller that passes it
    and does nothing else still gets only those series."""
    lake, _ = _mk_lake(spark, tmp_path, sensors=6)
    ids = [f"sensor-{i:04d}" for i in range(n_ids)]
    d = lake.values(SensorType.FLOAT, sensor_ids=ids)
    got = {r.sensor_id for r in d.select("sensor_id").distinct().collect()}
    assert got == set(ids)


def test_tz_aware_bounds_use_utc_instant(spark, tmp_path):
    """A tz-aware start whose WALL-CLOCK month differs from its UTC
    month must not drop the UTC-month's rows (round-8 review): the
    month filters and the zone-map bounds both derive from the UTC
    instant."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    # Sample at 2024-01-31T23:00Z — inside [start, end] below.
    df = spark.createDataFrame(
        [("edge", dt.datetime(2024, 1, 31, 23), 1.0)],
        "sensor_id string, time timestamp, value double",
    )
    lake.append_values(SensorType.FLOAT, df)
    # start = 2024-02-01T00:30+02:00 == 2024-01-31T22:30Z: wall-clock
    # month "2024-02", UTC month "2024-01".
    tz = dt.timezone(dt.timedelta(hours=2))
    d = lake.values(
        SensorType.FLOAT,
        start=dt.datetime(2024, 2, 1, 0, 30, tzinfo=tz),
        end=dt.datetime(2024, 2, 2, tzinfo=tz),
    )
    assert d.count() == 1


def test_gateway_probe_skipped_without_sidecar(spark, tmp_path, monkeypatch):
    """The extended-PromQL dimension probe (server/app.py
    _probe_matched_ids) costs a blocking collect(); when the scanned
    version has no zone-map sidecar the probe cannot prune anything,
    so it must be skipped with one driver-side stat (round-8 advisor,
    finding 3) — and fire again once a sidecar exists."""
    from sensapp_spark import server
    from sensapp_spark.server.app import create_app

    lake, _ = _mk_lake(spark, tmp_path, months=(1,), sensors=2)
    calls = {"n": 0}
    real = None
    import sensapp_spark.operators.selection as sel

    real = sel.probe_sensor_rows

    def counting(df):
        calls["n"] += 1
        return real(df)

    monkeypatch.setattr(sel, "probe_sensor_rows", counting)
    app = create_app(spark, lake)
    app.testing = True
    url = (
        "/api/v1/query?extended=true"
        "&query=sum(temperature%20@%201704276000)"
    )
    with app.test_client() as c:
        # Sidecar present (append wrote it): probe fires.
        r = c.get(url)
        assert r.status_code == 200, r.get_json()
        assert calls["n"] == 1
        # Remove the sidecar: same query, probe skipped.
        os.remove(os.path.join(_data_dir(lake), zm.ZONEMAP_NAME))
        r = c.get(url)
        assert r.status_code == 200, r.get_json()
        assert calls["n"] == 1
    del server


# -- persisted per-file KMV sketches (round 9) ----------------------------


def test_sidecar_fold_equals_scan_based_kmv(spark, tmp_path):
    """The persisted-sketch contract: folding the per-file KMV sets
    from the sidecar gives EXACTLY the scan-based kmv_distinct
    estimate (per-file k-minima merge losslessly), with zero data
    files opened at query time."""
    from sensapp_spark.operators.sketches import kmv_distinct

    lake, _ = _mk_lake(spark, tmp_path, months=(1, 2), sensors=30)
    folded = lake.sketch_distinct_series(SensorType.FLOAT)
    (scan,) = kmv_distinct(
        lake.values(SensorType.FLOAT), "sensor_id"
    ).collect()
    assert folded == scan.estimate == 30.0  # < k=256 → exact


def test_sidecar_fold_survives_appends_and_optimize(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path, months=(1,), sensors=10)
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            [(f"extra-{i}", dt.datetime(2024, 2, 1), 1.0) for i in range(5)],
            "sensor_id string, time timestamp, value double",
        ),
    )
    assert lake.sketch_distinct_series(SensorType.FLOAT) == 15.0
    lake.optimize(SensorType.FLOAT, quiesce_wait_s=0.2)
    assert lake.sketch_distinct_series(SensorType.FLOAT) == 15.0


def test_sidecar_fold_refuses_partial_coverage(spark, tmp_path):
    """A sketch-less entry (pre-round-9 writer) must yield None, never
    a silent undercount — the same hint-not-authority rule as
    pruning."""
    lake, _ = _mk_lake(spark, tmp_path, months=(1,), sensors=4)
    data = _data_dir(lake)
    doc = json.load(open(os.path.join(data, zm.ZONEMAP_NAME)))
    first = next(iter(doc["files"]))
    del doc["files"][first]["kmv"]
    zm.write_zonemap(data, doc["files"])
    assert lake.sketch_distinct_series(SensorType.FLOAT) is None


def test_per_file_kmv_uses_portable_hash(spark, tmp_path):
    """The persisted hashes must be the same md5-prefix construction
    Spark and DuckDB replay — pin one value end to end."""
    import hashlib

    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            [("pinned-sensor", dt.datetime(2024, 1, 1), 1.0)],
            "sensor_id string, time timestamp, value double",
        ),
    )
    doc = json.load(open(os.path.join(_data_dir(lake), zm.ZONEMAP_NAME)))
    (st,) = doc["files"].values()
    want = int(
        hashlib.md5(b"pinned-sensor").hexdigest()[:15], 16
    )
    assert st["kmv"] == [want]


def test_cms_sidecar_fold_equals_scan_based_estimates(spark, tmp_path):
    """Per-file count-min counters are additive, so the sidecar fold
    must equal the scan-built cms_build/cms_estimate path EXACTLY for
    every probed sensor — zero data files opened at query time."""
    from sensapp_spark.operators.sketches import cms_build, cms_estimate

    lake, _ = _mk_lake(spark, tmp_path, months=(1, 2), sensors=12)
    vals = lake.values(SensorType.FLOAT)
    ids = [r.sensor_id for r in vals.select("sensor_id").distinct().collect()]
    folded = lake.sketch_series_rows(SensorType.FLOAT, ids)
    assert folded is not None
    scan = {
        r.sensor_id: r.estimate
        for r in cms_estimate(
            cms_build(vals, "sensor_id"),
            vals.select("sensor_id").distinct(),
            "sensor_id",
        ).collect()
    }
    assert folded == {k: int(v) for k, v in scan.items()}
    # ≥-true-count guarantee against the exact counts.
    exact = {
        r.sensor_id: r.n
        for r in vals.groupBy("sensor_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for s, est in folded.items():
        assert est >= exact[s]


def test_cms_sidecar_survives_appends_and_optimize(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path, months=(1,), sensors=6)
    before = lake.sketch_series_rows(SensorType.FLOAT, ["s0"])
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            [("s0", dt.datetime(2024, 2, 1), 1.0)] * 3,
            "sensor_id string, time timestamp, value double",
        ),
    )
    after = lake.sketch_series_rows(SensorType.FLOAT, ["s0"])
    assert after["s0"] == before["s0"] + 3
    lake.optimize(SensorType.FLOAT, quiesce_wait_s=0.2)
    assert lake.sketch_series_rows(SensorType.FLOAT, ["s0"]) == after
    # An id the lake never saw: usually 0; never negative, and only
    # positive on a (rare at this size) bucket collision.
    ghost = lake.sketch_series_rows(SensorType.FLOAT, ["no-such"])
    assert ghost["no-such"] >= 0


def test_cms_sidecar_refuses_partial_coverage(spark, tmp_path):
    lake, _ = _mk_lake(spark, tmp_path, months=(1,), sensors=4)
    data = _data_dir(lake)
    doc = json.load(open(os.path.join(data, zm.ZONEMAP_NAME)))
    first = next(iter(doc["files"]))
    del doc["files"][first]["cms"]
    zm.write_zonemap(data, doc["files"])
    assert lake.sketch_series_rows(SensorType.FLOAT, ["s0"]) is None


def test_file_stats_many_empty_and_forced_distribution(spark):
    """Round-9 review: an empty batch must return {} on BOTH paths —
    a forced fan-out (threshold 0) used to hit repartition(0)."""
    assert zm.file_stats_many([]) == {}
    assert zm.file_stats_many([], spark=spark, distribute_threshold=0) == {}


def test_refresh_failure_is_best_effort_in_lake(spark, tmp_path, monkeypatch):
    """A failed stat job (PySparkException, not OSError) must not fail
    an append whose data write already landed — the sidecar merely
    goes stale (files read unpruned)."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    df = spark.createDataFrame(
        [("s-a", dt.datetime(2024, 1, 5, 10), 1.0)],
        "sensor_id string, time timestamp, value double",
    )
    lake.append_values(SensorType.FLOAT, df)

    def boom(*a, **kw):
        raise RuntimeError("simulated mapInPandas job failure")

    monkeypatch.setattr(zm, "refresh_zonemap", boom)
    lake.append_values(SensorType.FLOAT, df)  # must not raise
    assert lake.values(SensorType.FLOAT).count() == 2
