"""Structured Streaming ingestion (the reference's Batch lifecycle with
real streaming semantics it lacks — SURVEY §2.8).

The reference ingests request-scoped batches: BatchBuilder accumulates
per-sensor vectors (B1), chunks to ≤8192 samples (B2), FFD-bin-packs
(B3), then one storage transaction per batch (src/datamodel/
batch_builder.rs:32-137). In Spark each of those is a property of the
micro-batch machinery:

* B1 (per-sensor accumulate)   → groupBy inside the micro-batch
* B2/B3 (chunking/bin packing) → Arrow ``maxRecordsPerBatch`` + trigger
  sizing; partitions are the bins
* publish transaction          → ``foreachBatch`` epoch (exactly-once
  per sink when the sink is idempotent — our sensors MERGE is)

Beyond-reference: a watermark + ``dropDuplicatesWithinWatermark`` gives
late-data-tolerant dedup of (sensor_id, time) re-deliveries — the
reference accepts any timestamp and never dedups on ingest
(SURVEY §7.4 risk 9; semantics defined here, documented in the test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sensapp_spark.ingest.csv_importer import CsvPlan, apply_plan
from sensapp_spark.storage.lake import SensorLake


def stream_csv_directory(
    spark: SparkSession,
    input_dir: str,
    lake: SensorLake,
    plan: CsvPlan,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    dedup_within_watermark: bool = False,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """File-drop CSV ingestion: new files under ``input_dir`` flow through
    the S1 cast plan into the lake, one epoch per micro-batch.

    The CsvPlan comes from a one-off inference pass over a sample file
    (schema-on-read happens once, not per batch — streaming sources need
    a fixed schema anyway).
    """
    schema = ", ".join(f"`{c}` STRING" for c in plan.column_names)
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .csv(input_dir)
    )

    if dedup_within_watermark and plan.datetime_column is not None:
        # Event-time dedup must run on the STREAMING frame (state lives
        # across micro-batches): cast the event time with the same S1
        # expression, watermark it, drop exact re-deliveries within the
        # watermark window. apply_plan recomputes __time downstream —
        # the cast is deterministic, so this costs one extra projection.
        from sensapp_spark.ingest.csv_importer import _datetime_cast

        ts_kind = plan.column_types[plan.datetime_column]
        raw = (
            raw.withColumn(
                "__time", _datetime_cast(F.col(plan.datetime_column), ts_kind)
            )
            .withWatermark("__time", watermark)
            .dropDuplicatesWithinWatermark()
            .drop("__time")
        )

    # Epoch-idempotent publish: the stream id is the checkpoint
    # location (that IS the replay domain — a new checkpoint is a new
    # stream with its own epoch numbering), so a foreachBatch
    # redelivery after a crash/kill is skipped instead of
    # double-appended. See SensorLake.publish for the exact
    # exactly-once contract and its stated failure window.
    stream_id = os.path.abspath(checkpoint_dir)

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.publish(
            apply_plan(spark, batch_df, plan),
            epoch=(stream_id, epoch_id),
        )

    writer = (
        raw.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_lines_socket(
    spark: SparkSession,
    host: str,
    port: int,
    lake: SensorLake,
    checkpoint_dir: str,
    with_numeric: bool = False,
    max_lines_per_publish: int = 8192,
) -> StreamingQuery:
    """InfluxDB line-protocol over a socket: each micro-batch's lines are
    parsed by the S4 parser (pure function — runs on the driver for
    control-plane-sized feeds; file-scale replays should use the
    distributed text-scan path instead).

    Driver memory is BOUNDED regardless of micro-batch size: lines are
    pulled through ``toLocalIterator`` (one partition resident at a
    time, never the whole batch) and published in slices of
    ``max_lines_per_publish`` — the same ≤8192 chunk bound the
    reference's batch splitter enforces (B2,
    src/datamodel/batch_builder.rs:90-108), so a burst on the socket
    cannot accumulate an unbounded line list the way a whole-batch
    ``collect()`` would."""
    from sensapp_spark.ingest.influxdb_importer import ingest_lines

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        buf: list[str] = []
        for row in batch_df.toLocalIterator():
            buf.append(row.value)
            if len(buf) >= max_lines_per_publish:
                lake.publish(
                    ingest_lines(
                        spark, "\n".join(buf), with_numeric=with_numeric
                    )
                )
                buf.clear()
        if buf:
            lake.publish(
                ingest_lines(spark, "\n".join(buf), with_numeric=with_numeric)
            )

    return (
        raw.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
