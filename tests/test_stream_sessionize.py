"""Stateful streaming sessionization: session ids must stay continuous
across micro-batches and query restarts (state lives in the checkpoint)."""

from __future__ import annotations

import datetime as dt

from sensapp_spark.streaming.sessionize import sessionize_stream

BASE = dt.datetime(2024, 1, 1)
SCHEMA = "k string, time timestamp"


def _at(seconds: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=seconds)


def _run_once(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = sessionize_stream(stream, on=["k"], gap_seconds=1800,
                            watermark="10 hours")
    q = (
        out.writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return {(r.k, r.time): r.session_id
            for r in spark.read.parquet(sink).collect()}


def test_sessions_continue_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    spark.createDataFrame(
        [("u", _at(0)), ("u", _at(600)), ("v", _at(0))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    first = _run_once(spark, src, ckpt, sink)
    assert first[("u", _at(0))] == 1
    assert first[("u", _at(600))] == 1
    assert first[("v", _at(0))] == 1

    # Second batch, new query instance, same checkpoint: 1200 s continues
    # session 1 (gap 600 <= 1800); 4000 s opens session 2.
    spark.createDataFrame(
        [("u", _at(1200)), ("u", _at(4000))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    second = _run_once(spark, src, ckpt, sink)
    assert second[("u", _at(1200))] == 1
    assert second[("u", _at(4000))] == 2
    assert len(second) == 5  # nothing reprocessed, nothing lost
