"""Stream-stream interval join (streaming/joins.py): matches within the
trailing interval, no matches outside it, and state-eviction-safe plan
construction (both sides watermarked)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest

from sensapp_spark.streaming.joins import interval_join_stream

SCHEMA = "sensor_id string, time timestamp, value double"


def _drop_file(spark, rows, data_dir, name):
    staging = f"{data_dir}/../__stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    [part] = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{data_dir}/{name}.parquet")
    shutil.rmtree(staging)


def test_rejects_unbounded_interval(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        interval_join_stream(df, df, interval_seconds=0)


def test_interval_join_stream_matches_within_window(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")

    clicks = [
        ("s1", t.replace(minute=10), 1.0),
        ("s1", t.replace(minute=30), 2.0),
        ("s2", t.replace(minute=10), 3.0),
    ]
    views = [
        # within (10:05, 10:10] of click@10:10 → matches
        ("s1", t.replace(minute=8), 10.0),
        # equal timestamps match (inclusive right edge)
        ("s1", t.replace(minute=30), 20.0),
        # 6 min before click@10:10 → outside the 5-min interval
        ("s1", t.replace(minute=4), 30.0),
        # right key with no left counterpart
        ("s9", t.replace(minute=10), 40.0),
    ]
    _drop_file(spark, clicks, ldir, "l1")
    _drop_file(spark, views, rdir, "r1")

    l = spark.readStream.schema(SCHEMA).parquet(ldir)
    r = spark.readStream.schema(SCHEMA).parquet(rdir)
    joined = interval_join_stream(
        l, r, interval_seconds=300, watermark="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sj_out").collect()
        got = {
            (r2.sensor_id, r2.time.minute, r2.time_right.minute)
            for r2 in rows
        }
        # click@10:10 ← view@10:08 (in window; view@10:04 is not),
        # click@10:30 ← view@10:30 (equal ts inclusive). s2 click has
        # no view; s9 view has no click.
        assert got == {("s1", 10, 8), ("s1", 30, 30)}
        vals = {(r2.sensor_id, r2.time.minute): r2.value_right for r2 in rows}
        assert vals[("s1", 10)] == 10.0
        assert vals[("s1", 30)] == 20.0
    finally:
        q.stop()
