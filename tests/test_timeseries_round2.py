"""Round-2 time-series operators: rolling mean, M4 downsampling,
z-score outliers, trailing-interval counts — semantics on hand-built
frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.operators.timeseries import (
    interval_count,
    m4_downsample,
    rolling_mean,
    zscore_outliers,
)

T0 = dt.datetime(2024, 1, 1)


def _vals(spark, rows):
    return spark.createDataFrame(
        [(s, T0 + dt.timedelta(seconds=off), float(v), i)
         for i, (s, off, v) in enumerate(rows)],
        "sensor_id string, time timestamp, value double, event_id long",
    )


def test_rolling_mean_window(spark):
    df = _vals(spark, [("a", t, v) for t, v in
                       [(0, 2.0), (1, 4.0), (2, 6.0), (3, 8.0)]])
    out = rolling_mean(df, on=["sensor_id"], window_rows=2,
                       tiebreakers=["event_id"])
    got = {r.event_id: r.value_rolling for r in out.collect()}
    assert got == {0: 2.0, 1: 3.0, 2: 5.0, 3: 7.0}


def test_rolling_mean_resets_per_key(spark):
    df = _vals(spark, [("a", 0, 10.0), ("b", 0, 20.0), ("a", 1, 20.0)])
    out = rolling_mean(df, on=["sensor_id"], window_rows=3)
    got = {(r.sensor_id, r.event_id): r.value_rolling for r in out.collect()}
    assert got[("b", 1)] == 20.0  # b unaffected by a's rows
    assert got[("a", 2)] == 15.0


def test_m4_keeps_extremes_and_endpoints(spark):
    df = _vals(spark, [("a", t, v) for t, v in
                       [(0, 5.0), (10, 1.0), (20, 9.0), (30, 3.0)]])
    row = m4_downsample(df, on=["sensor_id"], bucket="day",
                        tiebreaker="event_id").collect()[0]
    assert (row.v_first, row.v_last) == (5.0, 3.0)
    assert (row.v_min, row.v_max) == (1.0, 9.0)
    assert row.n == 4
    assert row.t_first == T0 and row.t_last == T0 + dt.timedelta(seconds=30)


def test_m4_tiebreak_on_equal_timestamps(spark):
    # Two samples at the same instant: event_id decides first/last.
    df = _vals(spark, [("a", 0, 7.0), ("a", 0, 2.0)])
    row = m4_downsample(df, on=["sensor_id"], bucket="day",
                        tiebreaker="event_id").collect()[0]
    assert row.v_first == 7.0 and row.v_last == 2.0


def test_zscore_outliers_flags_extremes(spark):
    rows = [("a", t, 10.0) for t in range(10)] + [("a", 10, 1000.0)]
    df = _vals(spark, rows)
    out = zscore_outliers(df, on=["sensor_id"], threshold=2.5).collect()
    assert [r.value for r in out] == [1000.0]
    assert out[0].zscore > 2.5


def test_zscore_constant_series_no_rows(spark):
    df = _vals(spark, [("a", t, 5.0) for t in range(5)])
    assert zscore_outliers(df, on=["sensor_id"]).count() == 0


def test_interval_count_trailing_window(spark):
    left = _vals(spark, [("u1", 100, 1.0), ("u1", 400, 2.0)])
    right = _vals(spark, [("u1", 50, 0.0), ("u1", 99, 0.0),
                          ("u1", 100, 0.0), ("u1", 395, 0.0),
                          ("u2", 100, 0.0)])
    out = interval_count(left, right, on=["sensor_id"],
                         lookback_seconds=60, count_alias="n")
    got = {r.event_id: r.n for r in out.collect()}
    # click@100: right rows in (40, 100] → 50? no (50>40 yes → in), 99, 100 → 3
    assert got[0] == 3
    # click@400: (340, 400] → 395 only
    assert got[1] == 1


def test_interval_count_zero_for_quiet_keys(spark):
    left = _vals(spark, [("u9", 100, 1.0)])
    right = _vals(spark, [("u1", 99, 0.0)])
    out = interval_count(left, right, on=["sensor_id"],
                         lookback_seconds=60, count_alias="n")
    assert out.collect()[0].n == 0


def test_single_shuffle_rolling_plan(spark):
    """rolling_mean must not re-shuffle beyond the window's partition."""
    df = _vals(spark, [("a", 0, 1.0), ("a", 1, 2.0)])
    plan = rolling_mean(df, on=["sensor_id"]).unionAll(
        rolling_mean(df, on=["sensor_id"])
    )._jdf.queryExecution().executedPlan().toString()
    # each branch: exactly one Exchange feeding the Window
    assert plan.count("Exchange") <= 2


def test_lttb_selects_spike_and_edges(spark):
    """Parallel LTTB: a middle bucket's representative is the point with
    the largest triangle against the neighbor-bucket averages (the
    spike), while first/last buckets keep their first/last sample."""
    import datetime as dt

    from sensapp_spark.operators.timeseries import lttb_downsample

    def d(day, hour):
        return dt.datetime(2024, 3, day, hour)

    rows = [
        # day 1 (first bucket): two flat points — expect the FIRST
        ("s", d(1, 1), 10.0), ("s", d(1, 9), 11.0),
        # day 2 (middle): flat line plus one spike — expect the SPIKE
        ("s", d(2, 1), 10.0), ("s", d(2, 5), 99.0), ("s", d(2, 9), 10.0),
        # day 3 (last): two points — expect the LAST
        ("s", d(3, 1), 10.0), ("s", d(3, 9), 12.0),
    ]
    df = spark.createDataFrame(rows, "sensor_id string, time timestamp, value double")
    out = {
        r.bucket.day: (r.t_sel, r.v_sel, r.n)
        for r in lttb_downsample(df, on=["sensor_id"], bucket="day").collect()
    }
    assert out[1] == (d(1, 1), 10.0, 2)
    assert out[2] == (d(2, 5), 99.0, 3)
    assert out[3] == (d(3, 9), 12.0, 2)


def test_lttb_single_bucket_and_ties(spark):
    import datetime as dt

    from sensapp_spark.operators.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [("s", dt.datetime(2024, 3, 1, 3), 5.0),
         ("s", dt.datetime(2024, 3, 1, 1), 7.0)],
        "sensor_id string, time timestamp, value double",
    )
    (row,) = lttb_downsample(df, on=["sensor_id"], bucket="day").collect()
    # Single bucket: earliest point wins.
    assert row.t_sel == dt.datetime(2024, 3, 1, 1) and row.v_sel == 7.0


def test_ewma_weights_and_truncation(spark):
    """EWMA closed form: hand-computed truncated-renormalized weights
    over a short series; deterministic order via tiebreaker."""
    import datetime as dt

    from sensapp_spark.operators.timeseries import ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [("s", t0 + dt.timedelta(minutes=i), i, float(v))
            for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(
        rows, "sensor_id string, time timestamp, event_id long, value double")
    out = {
        r.event_id: r.value_ewma
        for r in ewma(df, on=["sensor_id"], alpha=0.5, window_rows=3,
                      tiebreakers=["event_id"]).collect()
    }
    # window 3, decay 0.5: weights (0.25, 0.5, 1) renormalized by 1.75
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx((10 * 0.5 + 20 * 1) / 1.5)
    assert out[2] == pytest.approx((10 * 0.25 + 20 * 0.5 + 30) / 1.75)
    # truncation: the first sample has fallen out of the 3-row window
    assert out[3] == pytest.approx((20 * 0.25 + 30 * 0.5 + 40) / 1.75)
