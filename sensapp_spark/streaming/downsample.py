"""Streaming windowed downsampling — watermarked tumbling-window
aggregation over a value stream (SURVEY §2.8: the reference has no
streaming semantics at all; its PromQL endpoint additionally rejects
aggregation outright, src/ingestors/http/simple_promql.rs:149-171).

Batch counterpart: plans/queries.downsample_1h (groupBy hour bucket).
The streaming form adds what only a stream needs: an event-time
watermark that (a) bounds aggregation state — window state is evicted
once the watermark passes the window end — and (b) defines the
late-data contract: samples arriving later than ``watermark`` behind
the stream's max event time are dropped, everything inside the bound
is aggregated exactly-once into its window.

Scale notes: tumbling windows partition by (sensor_id, window), the
same single-shuffle shape as the batch downsample; partial aggregates
combine map-side within each micro-batch before the shuffle, and state
size is O(open windows × sensors), independent of sample rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def downsample_stream(
    values: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    time_col: str = "time",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Per-sensor tumbling-window count/avg/min/max plus the M4
    first/last samples (``min_by``/``max_by`` on event time — both are
    plain declarative aggregates, so they partial-combine map-side and
    keep O(1) state per open window exactly like min/max; the window's
    full M4 quadruple streams with no extra state). Append-mode
    semantics: a window's single final row is emitted once the
    watermark passes its end — no partial re-emits, which makes the
    sink contract idempotent.

    ``tiebreaker`` names a column that breaks equal-timestamp ties in
    first/last (same contract as batch ``m4_downsample``); without it,
    duplicate timestamps make first_value/last_value pick either sample
    — set it whenever the idempotent-replay guarantee must extend to
    duplicate-timestamp streams (a checkpoint replay could otherwise
    finalize a different-but-valid row)."""
    order = (
        F.struct(F.col(time_col), F.col(tiebreaker))
        if tiebreaker
        else F.col(time_col)
    )
    return (
        values.withWatermark(time_col, watermark)
        .groupBy("sensor_id", F.window(time_col, window).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min_by("value", order).alias("first_value"),
            F.max_by("value", order).alias("last_value"),
        )
        .select(
            "sensor_id",
            F.col("w.start").alias("bucket"),
            "n",
            "avg_value",
            "min_value",
            "max_value",
            "first_value",
            "last_value",
        )
    )
