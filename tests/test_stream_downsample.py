"""Streaming windowed downsample (streaming/downsample.py): windows
finalize in append mode once the watermark passes them, and late data
behind the watermark is dropped instead of resurrecting a closed
window."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from sensapp_spark.streaming.downsample import downsample_stream

SCHEMA = "sensor_id string, time timestamp, value double"


def _drop_file(spark, rows, data_dir, name):
    """Write ``rows`` as ONE flat parquet file inside the watched
    directory — the file stream source does not descend into
    non-partition subdirectories, so ``df.write.parquet`` output
    directories would be invisible to it."""
    staging = f"{data_dir}/../__stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    [part] = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{data_dir}/{name}.parquet")
    shutil.rmtree(staging)


def _rows(spark):
    return {
        (r.sensor_id, r.bucket): r
        for r in spark.sql("SELECT * FROM ds_out").collect()
    }


def _await(spark, q, predicate, timeout=60):
    """Wait for the memory sink to satisfy ``predicate``: append-mode
    emission happens one (possibly no-data) micro-batch AFTER the
    watermark advances, so processAllAvailable alone is not enough."""
    q.processAllAvailable()
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        got = _rows(spark)
        if predicate(got):
            return got
        time.sleep(0.5)
    return _rows(spark)


def test_windows_finalize_and_late_data_drops(spark, tmp_path):
    data_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)

    batch1 = [
        ("s1", t.replace(hour=10, minute=0), 1.0),
        ("s1", t.replace(hour=10, minute=30), 2.0),
        ("s1", t.replace(hour=11, minute=45), 3.0),
    ]
    _drop_file(spark, batch1, data_dir, "b1")
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    q = (
        downsample_stream(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("ds_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # Watermark after batch1 = 11:45 - 30m = 11:15 > end of the
        # 10:00 window → that window finalizes; 11:00 stays open.
        out = _await(spark, q, lambda g: len(g) >= 1)
        assert set(out) == {("s1", t.replace(hour=10))}
        row = out[("s1", t.replace(hour=10))]
        assert row.n == 2 and row.avg_value == 1.5 and row.max_value == 2.0
        # M4 edge samples: first at 10:00 (1.0), last at 10:30 (2.0).
        assert row.first_value == 1.0 and row.last_value == 2.0

        batch2 = [
            # Late arrival at 10:15 — behind the watermark (11:15):
            # dropped, must not reopen or change the closed window.
            ("s1", t.replace(hour=10, minute=15), 99.0),
            # New event advances the watermark past 12:00, closing 11:00.
            ("s1", t.replace(hour=12, minute=40), 4.0),
        ]
        _drop_file(spark, batch2, data_dir, "b2")
        out = _await(spark, q, lambda g: len(g) >= 2)
        # Exactly one new row (the finalized 11:00 window); the 10:00
        # row is untouched by the late sample — still n=2.
        assert set(out) == {
            ("s1", t.replace(hour=10)),
            ("s1", t.replace(hour=11)),
        }
        assert out[("s1", t.replace(hour=11))].n == 1
        assert out[("s1", t.replace(hour=11))].avg_value == 3.0
        assert out[("s1", t.replace(hour=10))].n == 2
    finally:
        q.stop()


def test_tiebreaker_pins_first_last_on_duplicate_timestamps(spark, tmp_path):
    """Duplicate-timestamp samples: the tiebreaker column makes the
    streamed M4 first/last deterministic (smallest/largest tiebreaker
    at the tied instant), matching batch m4_downsample's contract."""
    data_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)

    schema = "sensor_id string, time timestamp, value double, seq long"
    staging = f"{data_dir}/../__stage_tb"
    rows = [
        ("s1", t.replace(hour=10, minute=0), 5.0, 2),
        ("s1", t.replace(hour=10, minute=0), 1.0, 1),  # same instant
        ("s1", t.replace(hour=10, minute=50), 9.0, 3),
        ("s1", t.replace(hour=12, minute=0), 0.0, 4),  # closes 10:00
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    [part] = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{data_dir}/tb.parquet")
    shutil.rmtree(staging)

    stream = spark.readStream.schema(schema).parquet(data_dir)
    q = (
        downsample_stream(stream, window="1 hour", watermark="30 minutes",
                          tiebreaker="seq")
        .writeStream.format("memory")
        .queryName("ds_tb")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        deadline = time.monotonic() + 60
        got = {}
        while time.monotonic() < deadline:
            got = {
                (r.sensor_id, r.bucket): r
                for r in spark.sql("SELECT * FROM ds_tb").collect()
            }
            if got:
                break
            time.sleep(0.5)
        row = got[("s1", t.replace(hour=10))]
        # At the tied 10:00 instant, seq=1 (value 1.0) is FIRST by the
        # tiebreaker even though it arrived second in the file.
        assert row.first_value == 1.0
        assert row.last_value == 9.0 and row.n == 3
    finally:
        q.stop()
