"""Changes-feed → continuous-aggregate maintenance as a Structured
Streaming loop — the rollup twin of ``streaming/ann_maintenance.py``.

``RollupStore.refresh`` is already exactly-once BY ITSELF (the feed
cursor commits atomically with the rollup version — a redelivered tick
re-polls from the committed cursor and recomputes the same buckets to
the same values), so unlike the ANN loop no epoch bookkeeping crosses
the boundary: the stream is purely the SCHEDULER. That asymmetry is the
point — an idempotent recompute-from-base maintainer needs nothing from
its driver beyond "call me", while an append-shaped maintainer (ANN)
needs the epoch protocol. Ticks use the same two sources as the ANN
loop: a file-drop tick dir (deterministic batches, drain-then-stop for
tests) or a 1 row/s rate source for background maintenance."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.storage.rollup import RollupStore

__all__ = ["stream_rollup_maintenance"]


def stream_rollup_maintenance(
    spark: SparkSession,
    store: RollupStore,
    stype: SensorType,
    checkpoint_dir: str,
    tick_dir: str | None = None,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    def maintain(_tick_df: DataFrame, _epoch_id: int) -> None:
        store.refresh(stype)

    if tick_dir is not None:
        os.makedirs(tick_dir, exist_ok=True)
        ticks = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(tick_dir)
        )
    else:
        ticks = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
        )
    writer = (
        ticks.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
