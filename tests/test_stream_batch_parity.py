"""Streaming-vs-batch oracle parity (round 7 — VERDICT r6 gap #3).

The streaming operators were pytest-only example-based since round 4;
this harness runs them over the SAME testdata-derived frames the
oracle-verified batch entries consume and asserts ROW-LEVEL EQUALITY
with the batch operators — so streaming coverage is hash-equivalent to
the driver-verified batch answers, not just illustrative:

* ``sessionize_stream`` ≡ ``operators.timeseries.sessionize`` (the
  oracle-green ``events_sessionize`` entry's operator) on the events
  table;
* ``downsample_stream`` ≡ ``operators.timeseries.m4_downsample`` (the
  oracle-green ``downsample_m4`` entry's operator) for the M4 columns,
  and the batch aggregation for count/avg, on the events values;
* ``hygiene_stream`` ≡ the batch quality/PII gates + exact dedup from
  ``pipeline/text.py`` (the oracle-green ``text_signals``/``text_profile``
  expressions) on the documents table.

Each stream reads the materialized batch frame from parquet with an
availableNow (or drained) file source, so input rows are IDENTICAL by
construction and any divergence is operator semantics, not data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensapp_spark.plans import testdata as td

from tests.conftest import SF_SMOKE


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from sensapp_spark.operators.timeseries import sessionize
    from sensapp_spark.streaming.sessionize import sessionize_stream

    ev = td.load_events(spark, SF_SMOKE).select(
        "user_id", F.col("ts").alias("time"), "event_id"
    )
    want = sorted(
        (r.user_id, r.time, r.event_id, r.session_id)
        for r in sessionize(ev, on=["user_id"], gap_seconds=1800).collect()
    )

    src = str(tmp_path / "in")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sessionize_stream(stream, on=["user_id"], gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("par_sess")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.time, r.event_id, r.session_id)
        for r in spark.table("par_sess").collect()
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_downsample_stream_matches_batch_m4(spark, tmp_path):
    from sensapp_spark.operators.timeseries import m4_downsample
    from sensapp_spark.streaming.downsample import downsample_stream

    vals = td.events_values(spark, SF_SMOKE).select(
        "sensor_id", "time", "value"
    )
    m4 = {
        (r.sensor_id, r.bucket): (r.n, r.v_min, r.v_max, r.v_first,
                                  r.v_last)
        for r in m4_downsample(vals, on=["sensor_id"],
                               bucket="hour").collect()
    }
    avg = {
        (r.sensor_id, r.bucket): r.avg_value
        for r in vals.groupBy(
            "sensor_id",
            F.date_trunc("hour", F.col("time")).alias("bucket"),
        ).agg(F.avg("value").alias("avg_value")).collect()
    }

    # A sentinel event 3 h past the real maximum pushes the watermark
    # beyond every real window's end so append mode finalizes them all;
    # its own (never-finalized) window is excluded from comparison.
    max_t = vals.agg(F.max("time")).first()[0]
    sentinel = spark.createDataFrame(
        [("__sentinel__", max_t + __import__("datetime").timedelta(hours=3),
          0.0)],
        "sensor_id string, time timestamp, value double",
    )
    src = str(tmp_path / "in")
    vals.unionByName(sentinel).write.parquet(src)

    stream = spark.readStream.schema(vals.schema).parquet(src)
    out = downsample_stream(stream, window="1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("par_ds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [r for r in spark.table("par_ds").collect()
            if r.sensor_id != "__sentinel__"]
    assert len(rows) == len(m4) > 0
    for r in rows:
        key = (r.sensor_id, r.bucket)
        assert (r.n, r.min_value, r.max_value, r.first_value,
                r.last_value) == m4[key], key
        assert r.avg_value == pytest.approx(avg[key]), key


def test_hygiene_stream_matches_batch_gates(spark, tmp_path):
    from sensapp_spark.pipeline.text import (
        normalized_text,
        pii_count_cols,
        quality_score_cols,
        with_pii_flag,
    )
    from sensapp_spark.streaming.corpus import hygiene_stream

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("doc_id")
            ).alias("event_time"),
        )
    )
    scored = with_pii_flag(
        docs.select("*", *quality_score_cols(), *pii_count_cols())
    ).withColumn("fp", F.md5(normalized_text(F.col("text"))))
    gated = scored.filter(F.col("quality") >= 0.15).filter(~F.col("has_pii"))
    want = {
        r.fp: (round(r.quality, 9), r.has_pii)
        for r in gated.select("fp", "quality", "has_pii")
        .dropDuplicates(["fp"]).collect()
    }

    src = str(tmp_path / "in")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = hygiene_stream(
        stream, time_col="event_time", min_quality=0.15, drop_pii=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("par_hyg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("par_hyg").collect()
    got = {r.fp: (round(r.quality, 9), r.has_pii) for r in rows}
    # Exactly one survivor per first-seen fingerprint, with identical
    # gate signals to the batch pass.
    assert len(rows) == len(got) == len(want) > 0
    assert got == want
