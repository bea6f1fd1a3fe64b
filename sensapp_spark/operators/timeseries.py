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


def rolling_mean(
    values: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    value_col: str = "value",
    window_rows: int = 5,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Trailing moving average over the last ``window_rows`` observations
    per key (current row included). One shuffle on ``on``; the frame is
    ROWS-bounded so state per row is O(window_rows) — no unbounded
    running state, safe at any series length. ``tiebreakers`` make the
    row order (and therefore the result) deterministic when timestamps
    collide."""
    on = list(on)
    order = [F.col(time_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    return values.withColumn(
        f"{value_col}_rolling", F.avg(F.col(value_col)).over(w)
    )


def m4_downsample(
    values: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    value_col: str = "value",
    bucket: str = "day",
    tiebreaker: str | None = None,
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., PVLDB 7(10), 2014):
    per (key, time bucket) keep min, max, first and last — the four
    samples that bound the line a pixel column can render. One groupBy
    with map-side partials: shuffle bytes ∝ keys × buckets, independent
    of raw sample rate — the standard way to ship a 100 TB series to a
    dashboard without lying about extremes.

    ``first``/``last`` pick by (time, tiebreaker) so duplicate
    timestamps resolve identically on any engine."""
    on = list(on)
    order = (
        F.struct(F.col(time_col), F.col(tiebreaker))
        if tiebreaker
        else F.col(time_col)
    )
    return values.groupBy(
        *on, F.date_trunc(bucket, F.col(time_col)).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.min_by(value_col, order).alias("v_first"),
        F.max_by(value_col, order).alias("v_last"),
        F.min(time_col).alias("t_first"),
        F.max(time_col).alias("t_last"),
    )


def ewma(
    values: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    value_col: str = "value",
    alpha: float = 0.3,
    window_rows: int = 20,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Bounded-window exponentially-weighted moving average per key.

    Classic EWMA is a sequential per-series recurrence (s_t = a·v_t +
    (1-a)·s_{t-1}) — it does not distribute. Truncating to the last
    ``window_rows`` observations with renormalized weights (1-a)^k is
    the bounded-state form: the contribution of anything older is
    (1-a)^window_rows ≈ e.g. 0.7^20 < 0.1%, and the whole computation
    becomes one ROWS-bounded window + per-row higher-order functions —
    O(window) state per row, one shuffle on the key, any series length.

    Cross-engine determinism: the weighted sums fold LEFT-TO-RIGHT on
    both engines (Spark ``aggregate``; DuckDB ``list_reduce``), so the
    IEEE partial-sum order is pinned and results agree to the rounded
    output. ``tiebreakers`` make the row order deterministic when
    timestamps collide. NULL samples are dropped up front — Spark's
    ``collect_list`` silently omits NULLs from the window array while
    SQL ``list()`` keeps them, so an explicit filter is the only
    definition both engines share (EWMA over observed values; mirror
    with ``WHERE value IS NOT NULL`` in any SQL counterpart)."""
    on = list(on)
    values = values.filter(F.col(value_col).isNotNull())
    order = [F.col(time_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    staged = values.withColumn(
        "__arr", F.collect_list(F.col(value_col)).over(w)
    )
    m = F.size("__arr")
    decay = F.lit(1.0 - alpha)
    wts = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.pow(decay, (m - i).cast("double")),
    )
    num = F.aggregate(
        F.zip_with("__arr", wts, lambda v, wt: v * wt),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda a, x: a + x)
    return staged.withColumn(f"{value_col}_ewma", num / den).drop("__arr")


def lttb_downsample(
    values: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    value_col: str = "value",
    bucket: str = "day",
) -> DataFrame:
    """LTTB visualization downsampling (Steinarsson 2013,
    largest-triangle-three-buckets), parallel variant: one
    representative point per (key, time bucket), chosen to maximize the
    triangle area against the NEIGHBOR BUCKETS' average points. Classic
    LTTB anchors on the previously *selected* point — a sequential
    dependency; anchoring on the previous bucket's *average* (the
    standard parallel relaxation, also what LTTB uses for the NEXT
    bucket) makes every bucket's choice independent, so the whole thing
    is one groupBy + a bucket-grain window + a bucket-keyed join — no
    per-series sequential pass, shuffle bytes ∝ keys × buckets like M4.

    Cross-engine determinism: bucket anchors are computed from EXACT
    integer sums (epoch-micros as decimal(38,0); values as rounded
    micro-longs) with a single double conversion, so Spark and a SQL
    oracle derive bit-identical anchors regardless of partial-sum
    order; ties on triangle area resolve by (time, value) ascending.
    First/last buckets keep their first/last point, as in LTTB.

    Returns one row per (key, bucket): ``(…, bucket, n, t_sel,
    v_sel)``."""
    on = list(on)
    samples = values.select(
        *on,
        F.date_trunc(bucket, F.col(time_col)).alias("bucket"),
        F.col(time_col).alias("t"),
        F.col(value_col).alias("v"),
        F.unix_micros(F.col(time_col)).alias("t_us"),
        F.round(F.col(value_col) * F.lit(1e6)).cast("long").alias("mv"),
    )
    aggs = samples.groupBy(*on, "bucket").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("t_us").cast("decimal(38,0)")).cast("double")
         / F.count("*")).alias("at"),
        # mv widens to decimal(38,0) before summing for the same reason
        # t_us does: a plain LongType sum can overflow on large
        # buckets/values, while DuckDB's SUM promotes to HUGEINT — the
        # engines would silently diverge exactly where values are big.
        (F.sum(F.col("mv").cast("decimal(38,0)")).cast("double")
         / (F.count("*") * F.lit(1e6))).alias("av"),
    )
    w = Window.partitionBy(*on).orderBy("bucket")
    nb = aggs.select(
        *on, "bucket", "n",
        F.lag("at").over(w).alias("pat"),
        F.lag("av").over(w).alias("pav"),
        F.lead("at").over(w).alias("nat"),
        F.lead("av").over(w).alias("nav"),
    )
    # Bucket stats are keys × buckets rows — far below the sample frame,
    # but derived through a window whose static size estimate is
    # unreliable; pin the hash join (same rationale as the verdict
    # joins).
    j = samples.join(nb.hint("shuffle_hash"), on + ["bucket"])
    area = F.abs(
        (F.col("pat") - F.col("nat")) * (F.col("v") - F.col("pav"))
        - (F.col("pat") - F.col("t_us")) * (F.col("nav") - F.col("pav"))
    )
    ord1 = (
        F.when(F.col("pat").isNull() & F.col("nat").isNull(),
               F.col("t_us").cast("double"))       # single bucket: first
        .when(F.col("pat").isNull(), F.col("t_us").cast("double"))
        .when(F.col("nat").isNull(), -F.col("t_us").cast("double"))
        .otherwise(-area)                          # middle: max area
    )
    sel = Window.partitionBy(*on, "bucket").orderBy(
        ord1.asc(), F.col("t_us").asc(), F.col("mv").asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(sel))
        .filter(F.col("__rn") == 1)
        .select(
            *on, "bucket", "n",
            F.col("t").alias("t_sel"), F.col("v").alias("v_sel"),
        )
    )


def zscore_outliers(
    values: DataFrame,
    on: Sequence[str],
    value_col: str = "value",
    threshold: float = 2.5,
) -> DataFrame:
    """Per-key z-score anomaly flags: rows whose value deviates from the
    key's mean by more than ``threshold`` population standard
    deviations. Two-pass: a dimension-sized stats aggregate joined back
    to the scan (AQE broadcasts it), then a filter — both passes are
    single-shuffle, and the join carries 3 doubles per key, not
    samples."""
    on = list(on)
    stats = values.groupBy(*on).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        values.join(stats, on)
        .filter(F.col("__sigma") > 0)
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("__mu", "__sigma")
    )


def interval_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    lookback_seconds: float = 300.0,
    count_alias: str = "n_right",
) -> DataFrame:
    """For every left-side row, the number of right-side rows of the
    same key within the trailing interval ``(t - lookback, t]`` — the
    bounded "recent activity" join (e.g. views preceding each click).

    Plan: equi-join on ``on`` with the interval as a range conjunct —
    Spark sort-merges on the key and filters the range, so the pair
    blowup is bounded by events-per-key-per-interval, never the cross
    product. Left-outer so quiet intervals count 0."""
    on = list(on)
    lt = F.col(f"l.{time_col}")
    rt = F.col(f"r.{time_col}")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    cond.append(rt > lt - F.expr(f"INTERVAL {float(lookback_seconds)} SECONDS"))
    cond.append(rt <= lt)
    lcols = [F.col(f"l.{c}") for c in left.columns]
    joined = left.alias("l").join(
        right.alias("r"), on=cond, how="left"
    )
    return joined.groupBy(*lcols).agg(
        F.count(rt).alias(count_alias)
    )


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


# ---------------------------------------------------------------------------
# Sidecar-statistics-driven planning (round 10, r9 verdict next-#6)
# ---------------------------------------------------------------------------

VIRTUAL_BROADCAST_ROWS = 2_000_000
"""Per-side row bound under which a virtual-sensor join side is worth
broadcasting: ~2M (sensor_id, bucket, double) rows is tens of MB on the
wire — cheap against a corpus-sized shuffle of the other side."""


def lake_virtual_sensor(
    lake,
    stype,
    left_id: str,
    right_id: str,
    bucket: str = "1 hour",
    start=None,
    end=None,
    broadcast_rows: int = VIRTUAL_BROADCAST_ROWS,
) -> tuple[DataFrame, dict]:
    """Composite 'virtual sensor' over STORED series (the lake-side
    sibling of the registry's ``virtual_sensor_join``): both series
    are zone-map-pruned scans, resampled to ``bucket`` windows, and
    joined on the bucket — with the JOIN STRATEGY chosen from the
    lake's persisted sidecar sketches instead of a fixed constant
    (round 10, r9 verdict next-#6).

    The decision: ``lake.sketch_series_rows`` folds the per-file
    count-min counters (planned IO ∝ files, zero data reads) into a
    row-count estimate per series. Count-min NEVER undercounts, so
    ``estimate ≤ broadcast_rows`` is a SOUND broadcast gate — the true
    side is at most that many raw samples, and bucket aggregation only
    shrinks it. The smaller qualifying side gets the broadcast hint;
    if neither qualifies, the join stays a shuffle (at 100 TB that is
    the right default — Spark's own 10 MB auto-broadcast never fires
    on corpus-sized sides, and a wrong broadcast OOMs executors).

    Estimates are hints, never authority: when the sidecar answers
    ``None`` (no zone map, partial coverage, pre-sketch writer) the
    gate falls back to a COUNTED bound — a ``limit(broadcast_rows+1)``
    count over the already-pruned single-series scan, which reads at
    most one series' files and stops early. Returns
    ``(frame, decision)`` where ``decision`` records the strategy and
    its evidence source (``sidecar`` / ``counted``) so plans are
    auditable and the flip is testable."""
    est = lake.sketch_series_rows(stype, [left_id, right_id])
    source = "sidecar"
    if est is None:
        source = "counted"
        est = {}
        for sid in (left_id, right_id):
            scan = lake.values(stype, start, end, sensor_ids=[sid])
            est[sid] = scan.limit(broadcast_rows + 1).count()

    def side(sid, alias):
        scan = lake.values(stype, start, end, sensor_ids=[sid])
        return scan.groupBy(
            F.window("time", bucket).getField("start").alias("bucket")
        ).agg(F.avg("value").alias(alias))

    left = side(left_id, "left_avg")
    right = side(right_id, "right_avg")

    candidates = sorted(
        (
            (est[sid], sid)
            for sid in (left_id, right_id)
            if est[sid] <= broadcast_rows
        ),
    )
    if candidates and candidates[0][1] == left_id:
        strategy = "broadcast_left"
        joined = F.broadcast(left).join(right, "bucket")
    elif candidates:
        strategy = "broadcast_right"
        joined = left.join(F.broadcast(right), "bucket")
    else:
        strategy = "shuffle"
        joined = left.join(right, "bucket")
    out = joined.select(
        "bucket",
        "left_avg",
        "right_avg",
        F.try_divide(F.col("left_avg"), F.col("right_avg")).alias(
            "ratio"
        ),
    )
    return out, {
        "strategy": strategy,
        "source": source,
        "estimates": {left_id: est[left_id], right_id: est[right_id]},
    }
