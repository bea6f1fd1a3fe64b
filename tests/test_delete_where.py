"""Row-level DELETE (SensorLake.delete_where): GDPR erasure / bad-batch
retraction as a maintenance rewrite. Reference anchor: the same rewrite
shape as the reference's storage-level dedup DELETE
(src/storage/sqlite/storage.rs:632-661); Delta's ``DELETE FROM`` is the
lakehouse analogue. Concurrent-append safety rides _rewrite_table's
reconciliation contract — pinned here with the injection seam."""

import datetime as dt

from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.storage.lake import SensorLake

T0 = dt.datetime(2024, 1, 5, 10)


def _vals(spark, rows):
    return spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double"
    )


def test_delete_by_sensor(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("b", T0, 2.0), ("a", T0, 3.0)]),
    )
    lake.delete_where(SensorType.FLOAT, "sensor_id = 'a'")
    got = [(r.sensor_id, r.value) for r in lake.values(SensorType.FLOAT).collect()]
    assert got == [("b", 2.0)]


def test_delete_accepts_column_predicates(spark, tmp_path):
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, 1.0), ("a", T0, 9.0)]),
    )
    lake.delete_where(SensorType.FLOAT, F.col("value") > 5)
    assert [r.value for r in lake.values(SensorType.FLOAT).collect()] == [1.0]


def test_null_predicate_rows_are_kept(spark, tmp_path):
    """SQL DELETE three-valued logic: a NULL evaluation does not match,
    so the row survives — a bare ~cond would silently drop it."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT,
        _vals(spark, [("a", T0, None), ("a", T0, 9.0)]),
    )
    lake.delete_where(SensorType.FLOAT, F.col("value") > 5)
    got = [r.value for r in lake.values(SensorType.FLOAT).collect()]
    assert got == [None]


def test_concurrent_append_cannot_resurrect_deleted_rows(spark, tmp_path):
    """An append racing the delete (resolved the pre-delete version,
    landed after the read-set pin) is folded through the SAME transform
    — matching rows stay deleted, non-matching rows are kept."""
    lake = SensorLake(spark, str(tmp_path / "lake"))
    lake.append_values(
        SensorType.FLOAT, _vals(spark, [("erase-me", T0, 1.0), ("b", T0, 2.0)])
    )

    def inject_append():
        lake.append_values(
            SensorType.FLOAT,
            _vals(spark, [("erase-me", T0, 7.0), ("c", T0, 3.0)]),
        )

    lake.delete_where(
        SensorType.FLOAT,
        "sensor_id = 'erase-me'",
        _test_after_plan=inject_append,
    )
    got = sorted(
        (r.sensor_id, r.value)
        for r in lake.values(SensorType.FLOAT).collect()
    )
    assert got == [("b", 2.0), ("c", 3.0)]


def test_deleted_rows_age_out_of_time_travel(spark, tmp_path):
    """Erasure-completeness contract: the pre-delete version stays
    readable via at_seq within retention (documented), and a follow-up
    commit + vacuum retires it."""
    lake = SensorLake(spark, str(tmp_path / "lake"), retain_generations=2)
    lake.append_values(SensorType.FLOAT, _vals(spark, [("a", T0, 1.0)]))
    pre_seq = lake.history(SensorType.FLOAT)[-1]["seq"]
    lake.delete_where(SensorType.FLOAT, "sensor_id = 'a'")
    # Within retention the old version is still visible (the honest
    # GDPR caveat in the docstring).
    assert lake.values(SensorType.FLOAT, at_seq=pre_seq).count() == 1
    # A further commit pushes it past retention; vacuum reclaims any
    # manifested leftovers.
    lake.optimize(SensorType.FLOAT)
    lake.vacuum_orphans(min_age_s=0.0)
    on_disk = [h["seq"] for h in lake.history(SensorType.FLOAT) if h["on_disk"]]
    assert pre_seq not in on_disk
    assert lake.values(SensorType.FLOAT).count() == 0
