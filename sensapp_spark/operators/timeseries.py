"""Beyond-reference time-series alignment operators: as-of join and
gap-based sessionization.

The reference has no sample-level joins or windowing at all (SURVEY §2.8);
its docs sketch "virtual sensors" joining series on time windows
(docs/DATAMODEL.md:125-131) but never implement them. Bucketed virtual
sensors live in plans/queries.py (`virtual_sensor_join`); this module adds
the two alignment primitives bucketing cannot express:

* **as-of join** — for every left-side observation, the most recent
  right-side observation at or before it (optionally within a tolerance).
  The classic sensor-fusion / trade-vs-quote alignment.
* **sessionization** — split each key's event stream into sessions
  separated by > gap of inactivity.

Scale design: both are single-shuffle window plans. The as-of join does
NOT use a range join or per-key collect: both sides are unioned and
sorted once on (key, time), and a running ``last(value, ignorenulls)``
propagates right-side values forward — O(n log n) per partition, no
row-pair blowup, skew-bounded by the busiest key (the same bound as any
per-key ordered operation). Sessionization is one ``lag`` + one running
sum over the same sort order, so the two compose without re-shuffling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    value_cols: Sequence[str] = ("value",),
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row gains the latest right-side
    ``value_cols`` where ``right.time <= left.time`` for the same ``on``
    key (equal timestamps match, as in DuckDB/pandas ASOF). Left-outer:
    rows with no prior right sample — or none within
    ``tolerance_seconds`` — keep NULL right columns.

    If the right side can contain several rows per (key, time), reduce it
    first (e.g. max per timestamp); which duplicate wins is otherwise
    unspecified, exactly as in DuckDB's ASOF join.

    Implementation: tag sides, union, sort each key once with right rows
    ordered *before* left rows at equal timestamps, forward-fill with
    ``last(..., ignorenulls=True)`` over an unbounded preceding frame.
    One shuffle on ``on``; no join node, so no broadcast/range-join
    planning risk at any key cardinality.
    """
    on = list(on)
    rt = f"{time_col}{suffix}"
    rcols = [f"{c}{suffix}" for c in value_cols]
    payload = [c for c in left.columns if c not in on and c != time_col]

    r = right.select(
        *on,
        F.col(time_col),
        F.col(time_col).alias(rt),
        *[F.col(c).alias(a) for c, a in zip(value_cols, rcols)],
        F.lit(True).alias(_SIDE),
    )
    l = left.select("*", F.lit(False).alias(_SIDE))
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at the same timestamp so an equal
    # timestamp is visible to the left row (backward-inclusive).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).asc(), F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.select(
        *on,
        time_col,
        *payload,
        _SIDE,
        F.last(F.col(rt), ignorenulls=True).over(w).alias(rt),
        *[F.last(F.col(a), ignorenulls=True).over(w).alias(a) for a in rcols],
    )
    out = u.filter(~F.col(_SIDE)).drop(_SIDE)

    if tolerance_seconds is not None:
        keep = F.col(rt).isNotNull() & (
            F.col(time_col).cast("double") - F.col(rt).cast("double")
            <= F.lit(float(tolerance_seconds))
        )
        out = out.select(
            *on,
            time_col,
            *payload,
            F.when(keep, F.col(rt)).alias(rt),
            *[F.when(keep, F.col(a)).alias(a) for a in rcols],
        )
    return out


def sessionize(
    events: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    gap_seconds: float = 1800,
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap to
    the key's previous event exceeds ``gap_seconds`` (strictly, so events
    exactly ``gap_seconds`` apart share a session). ``session_id`` is the
    per-key 1-based ordinal of the session — deterministic given data.
    """
    on = list(on)
    w = Window.partitionBy(*on).orderBy(F.col(time_col).asc())
    prev = F.lag(F.col(time_col)).over(w)
    is_new = (
        prev.isNull()
        | (F.col(time_col).cast("double") - prev.cast("double")
           > F.lit(float(gap_seconds)))
    ).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(is_new).over(running))


def gapfill(
    observed: DataFrame,
    on: Sequence[str],
    time_col: str = "bucket",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize an irregular series: per key, generate the dense
    ``step_seconds`` grid spanning that key's observed range, left-join
    the observations, and forward-fill holes with the last observation
    (rows created by the fill carry ``gap_filled = true``).

    This is the downsample-then-fill resampling the reference only
    sketches for its "virtual sensors" (docs/DATAMODEL.md:125-131);
    ``observed`` is expected to be pre-aggregated to one row per
    (key, aligned bucket) — e.g. an hourly AVG — so the grid join is
    over the *aggregated* frame, never raw samples. The explode is at
    most (range/step) rows per key, and the forward fill reuses the
    (key, time) sort from the join-side shuffle.
    """
    on = list(on)
    spans = observed.groupBy(*on).agg(
        F.min(time_col).alias("__b0"), F.max(time_col).alias("__b1")
    )
    grid = spans.select(
        *on,
        F.explode(
            F.expr(f"sequence(__b0, __b1, interval {int(step_seconds)} second)")
        ).alias(time_col),
    )
    joined = grid.join(observed, [*on, time_col], "left")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *on,
        time_col,
        F.last(F.col(value_col), ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("gap_filled"),
    )
