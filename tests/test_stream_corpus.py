"""Streaming corpus-hygiene gate (streaming/corpus.py): duplicate
fingerprints within the watermark are dropped, quality/PII gates prune
before the stateful dedup, and the signal columns match the batch
operators."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from sensapp_spark.streaming.corpus import hygiene_stream

SCHEMA = "doc_id long, text string, event_time timestamp"

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)


def _drop_file(spark, rows, data_dir, name):
    staging = f"{data_dir}/../__stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    [part] = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{data_dir}/{name}.parquet")
    shutil.rmtree(staging)


def _await_rows(spark, q, want, timeout=60):
    q.processAllAvailable()
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        got = {
            r.doc_id for r in spark.sql("SELECT doc_id FROM hygiene_out").collect()
        }
        if got >= want:
            return got
        q.processAllAvailable()
        time.sleep(0.5)
    return {
        r.doc_id for r in spark.sql("SELECT doc_id FROM hygiene_out").collect()
    }


def test_stream_dedup_quality_and_pii_gates(spark, tmp_path):
    data_dir = str(tmp_path / "in")
    os.makedirs(data_dir)
    good = (
        "the quick brown fox jumps over the lazy dog and naps in the sun "
        "while it is warm outside with a friend"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    out = hygiene_stream(
        stream, watermark="10 minutes", min_quality=0.05, drop_pii=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hygiene_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drop_file(
            spark,
            [
                (1, good, T0),
                (2, good + " twice", T0 + dt.timedelta(minutes=1)),
                # low quality: digit soup
                (3, "9 8 7 6 5 4 3 2 1 0 9 8 7 6 5", T0),
                # PII: email address
                (4, good + " mail bob@example.com", T0),
            ],
            data_dir,
            "b1",
        )
        got = _await_rows(spark, q, {1, 2})
        assert got == {1, 2}
        # Duplicate of doc 1 within the watermark → dropped; new doc kept.
        _drop_file(
            spark,
            [
                (5, good, T0 + dt.timedelta(minutes=2)),
                (6, good + " a third novel document", T0 + dt.timedelta(minutes=3)),
            ],
            data_dir,
            "b2",
        )
        got = _await_rows(spark, q, {1, 2, 6})
        assert got == {1, 2, 6}
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM hygiene_out").collect()}
        # Signal columns ride along and match the batch definition.
        from sensapp_spark.pipeline.text import quality_scores

        batch = spark.createDataFrame([(1, good)], "doc_id long, text string")
        expected_q = quality_scores(batch).collect()[0].quality
        assert rows[1].quality == expected_q
        assert not rows[1].has_pii
        assert rows[1].fp == rows[1].fp.lower() and len(rows[1].fp) == 32
    finally:
        q.stop()


def test_stream_state_is_bounded_by_watermark(spark, tmp_path):
    """The dedup operator must carry a watermark so state evicts — guard
    against silently building an unbounded-state plan."""
    data_dir = str(tmp_path / "in")
    os.makedirs(data_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    out = hygiene_stream(stream, watermark="10 minutes")
    # The logical plan must contain an event-time watermark node feeding
    # the dedup-within-watermark operator.
    plan = out._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan
    assert "DeduplicateWithinWatermark" in plan


def test_empty_document_does_not_poison_the_stream(spark, tmp_path):
    """An empty/whitespace-only document must not crash the micro-batch
    (ANSI divide-by-zero poison pill): NULL quality drops it at the
    gate and the stream keeps running."""
    data_dir = str(tmp_path / "in")
    os.makedirs(data_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    out = hygiene_stream(stream, watermark="10 minutes", min_quality=0.05)
    q = (
        out.writeStream.format("memory")
        .queryName("hygiene_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        good = "the quick brown fox naps in the warm sun with a friend"
        _drop_file(
            spark,
            [(1, "", T0), (2, "   ", T0), (3, good, T0)],
            data_dir,
            "b1",
        )
        got = _await_rows(spark, q, {3})
        assert got == {3}
        assert q.exception() is None
    finally:
        q.stop()
