"""Streaming stream-stream interval join — watermarked event-time join
between two live value streams (SURVEY §2.8: the reference has no
streaming semantics and no sample-level joins at all; its "virtual
sensor" sketch in docs/DATAMODEL.md:125-131 is the batch cousin).

Batch counterparts: the registry's `event_context_join` family entry
(plans/queries.py — trailing-interval count + as-of alignment, folded
from the former interval_join_5m/asof_align entries) built on
operators/timeseries.asof_join. The streaming form is the
shape Structured Streaming actually supports for two unbounded inputs:
an equi-key join with a bounded event-time range condition, plus
watermarks on BOTH sides so the engine can bound join state.

State contract (and why it scales): each side buffers only rows whose
event time is within (other side's watermark − interval); once the
watermarks advance, buffered rows outside the join range are evicted.
State size is O(key cardinality × interval × rate), independent of
stream length. Without the time-range conjunct Spark would have to
buffer both streams forever — the interval bound IS the scalability
contract here, which is why this operator refuses to join without one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "sensor_id",
    time_col: str = "time",
    interval_seconds: float = 300.0,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left event to the right-side events of the same key
    within the trailing interval ``(left.time − interval, left.time]``.

    Both inputs must be streaming frames; both get the same event-time
    watermark. Output columns: key, left time/value, right time/value
    (suffixed ``_right``). ``how`` may be ``inner`` or ``leftOuter``
    (outer rows emit NULL right columns once the watermark proves no
    match can still arrive — that is Structured Streaming's outer-join
    contract, not a timeout heuristic)."""
    if interval_seconds <= 0:
        raise ValueError("interval_seconds must be positive: the range "
                         "bound is what lets Spark evict join state")
    l = (
        left.withWatermark(time_col, watermark)
        .select(
            F.col(on),
            F.col(time_col),
            *[F.col(c) for c in left.columns if c not in (on, time_col)],
        )
        .alias("l")
    )
    r = (
        right.withWatermark(time_col, watermark)
        .select(
            F.col(on).alias(f"{on}_right"),
            F.col(time_col).alias(f"{time_col}_right"),
            *[
                F.col(c).alias(f"{c}_right")
                for c in right.columns
                if c not in (on, time_col)
            ],
        )
        .alias("r")
    )
    lt, rt = F.col(f"l.{time_col}"), F.col(f"r.{time_col}_right")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}_right"))
        & (rt > lt - F.expr(f"INTERVAL {float(interval_seconds)} SECONDS"))
        & (rt <= lt)
    )
    return l.join(r, on=cond, how=how).drop(f"{on}_right")
