"""Prometheus-native ``histogram_quantile`` over cumulative
``le``-bucket series — edge semantics pinned on hand-built frames
(the DuckDB oracle covers the registry arm; these cover the
prometheus promql/quantile.go bucketQuantile rules: monotonicity
repair, +Inf bucket, first-bucket ≤0, φ out of range, missing +Inf).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from sensapp_spark.query.promql_ext import (
    PromQLError,
    evaluate_extended,
    parse_extended,
)

T0 = dt.datetime(2024, 1, 1)
NOW = T0 + dt.timedelta(minutes=30)

# (sensor_id, labels, cumulative count) — one instant sample each.
SERIES = [
    # well-formed histogram: p50 interpolates inside (0.1, 0.5]
    ("b/i1/0.1", {"instance": "i1", "le": "0.1"}, 10.0),
    ("b/i1/0.5", {"instance": "i1", "le": "0.5"}, 60.0),
    ("b/i1/1", {"instance": "i1", "le": "1"}, 90.0),
    ("b/i1/inf", {"instance": "i1", "le": "+Inf"}, 100.0),
    # non-monotone dip (scrape race) — repaired by running max
    ("b/i2/0.1", {"instance": "i2", "le": "0.1"}, 20.0),
    ("b/i2/0.5", {"instance": "i2", "le": "0.5"}, 15.0),
    ("b/i2/1", {"instance": "i2", "le": "1"}, 95.0),
    ("b/i2/inf", {"instance": "i2", "le": "+Inf"}, 100.0),
    # no +Inf bucket → NaN
    ("b/i3/1", {"instance": "i3", "le": "1"}, 50.0),
    # negative first bucket: rank inside it returns its upper bound
    ("b/i4/-1", {"instance": "i4", "le": "-1"}, 80.0),
    ("b/i4/0", {"instance": "i4", "le": "0"}, 90.0),
    ("b/i4/inf", {"instance": "i4", "le": "+Inf"}, 100.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    sensors = spark.createDataFrame(
        [(s, "b", "Float", None, None, lbl) for s, lbl, _ in SERIES],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    vals = spark.createDataFrame(
        [(s, T0, v, i) for i, (s, _, v) in enumerate(SERIES)],
        "sensor_id string, time timestamp, value double, event_id long",
    )
    return sensors, vals


def _run(frames, expr):
    sensors, vals = frames
    out = evaluate_extended(
        sensors, vals, parse_extended(expr, now=NOW)
    )
    return {tuple(r)[0]: r.value for r in out.collect()}


def test_interpolation_and_repair(frames):
    got = _run(frames, "histogram_quantile(0.5, b)")
    # i1: rank 50 in (0.1, 0.5]: 0.1 + 0.4·(50-10)/50 = 0.42
    assert got['instance="i1"'] == pytest.approx(0.42)
    # i2 after repair (20,20,95,100): 0.5 + 0.5·(50-20)/75 = 0.7
    assert got['instance="i2"'] == pytest.approx(0.7)
    assert math.isnan(got['instance="i3"'])
    # i4: rank 50 in first bucket, le=-1 ≤ 0 → its upper bound
    assert got['instance="i4"'] == -1.0


def test_rank_in_inf_bucket_returns_highest_finite_le(frames):
    got = _run(frames, "histogram_quantile(0.99, b)")
    assert got['instance="i1"'] == 1.0
    assert got['instance="i2"'] == 1.0


def test_first_positive_bucket_interpolates_from_zero(frames):
    got = _run(frames, "histogram_quantile(0.05, b)")
    # i1: rank 5 in (0, 0.1]: 0 + 0.1·5/10 = 0.05
    assert got['instance="i1"'] == pytest.approx(0.05)


def test_aggregated_by_le_shape(frames):
    got = _run(
        frames, "histogram_quantile(0.5, sum by (le, instance) (b))"
    )
    assert got["i1"] == pytest.approx(0.42)


def test_phi_out_of_range(frames):
    lo = _run(frames, "histogram_quantile(-1, b)")
    hi = _run(frames, "histogram_quantile(1.5, b)")
    assert lo['instance="i1"'] == float("-inf")
    assert hi['instance="i1"'] == float("inf")


def test_outer_ungrouped_aggregation_folds_quantiles(frames):
    """min(histogram_quantile(…)) aggregates the QUANTILES, not the raw
    bucket counts (the round-6 review found the AGG wrapper dropping
    hist_quantile). Spark's ordering treats NaN as largest, so min
    sidesteps the NaN group."""
    got = _run(frames, "min(histogram_quantile(0.5, b))")
    assert got == {None: -1.0} or list(got.values()) == [-1.0]


def test_post_inside_outer_agg_applies_to_quantile(frames):
    """min(abs(histogram_quantile(…))): abs wraps the QUANTILES (i4's
    p50 of -1 becomes 1), never the bucket counts (second-pass review:
    series_post leaked onto the counts). min over {0.42, 0.7, 1.0,
    NaN} = 0.42 (Spark orders NaN largest)."""
    got = _run(frames, "min(abs(histogram_quantile(0.5, b)))")
    assert list(got.values()) == [pytest.approx(0.42)]


def test_zero_observation_group_is_nan(frames, spark):
    """All-zero cumulative buckets (freshly registered histogram) →
    NaN, not SQL NULL from the 0/0 interpolation."""
    import datetime as dt

    rows = [
        ("z/0.5", {"instance": "z", "le": "0.5"}, 0.0),
        ("z/inf", {"instance": "z", "le": "+Inf"}, 0.0),
    ]
    sensors = spark.createDataFrame(
        [(s, "b", "Float", None, None, lbl) for s, lbl, _ in rows],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    vals = spark.createDataFrame(
        [(s, T0, v, i) for i, (s, _, v) in enumerate(rows)],
        "sensor_id string, time timestamp, value double, event_id long",
    )
    out = evaluate_extended(
        sensors, vals, parse_extended("histogram_quantile(0.5, b)", now=NOW)
    ).collect()
    assert len(out) == 1 and math.isnan(out[0].value)


def test_range_query_evaluates_histogram_per_step(frames):
    """Round 7: histogram_quantile is range-evaluated (the round-6
    didactic rejection is gone) — each step quantiles its own bucket
    snapshot. The fixture's single sample at T0 sits inside the 1 h
    instant lookback of the first two steps but not the third, so two
    steps yield quantiles and one yields nothing — per-step windows
    are real, not broadcast."""
    from sensapp_spark.query.promql_ext import evaluate_range

    sensors, vals = frames
    out = evaluate_range(
        sensors, vals,
        parse_extended("histogram_quantile(0.5, b)", now=NOW),
        T0 + dt.timedelta(minutes=30),
        T0 + dt.timedelta(minutes=90),
        1800.0,  # steps at 00:30, 01:00, 01:30 — last is out of reach
    )
    rows = out.collect()
    steps = sorted({r.t for r in rows})
    assert steps == [T0 + dt.timedelta(minutes=30),
                     T0 + dt.timedelta(minutes=60)]
    by_step = {
        (r.labels, r.t): r.value
        for r in rows
        if not (isinstance(r.value, float) and math.isnan(r.value))
    }
    for t in steps:
        assert by_step[('instance="i1"', t)] == pytest.approx(0.42)
        assert by_step[('instance="i4"', t)] == -1.0


def test_range_query_evaluates_subquery_per_step(frames):
    """Round 7: subqueries are range-evaluated — each outer step T
    applies the outer function over the inner step samples in
    [T − range, T]."""
    from sensapp_spark.query.promql_ext import evaluate_range

    sensors, vals = frames
    out = evaluate_range(
        sensors, vals,
        parse_extended("max_over_time(b[1h:30m])", now=NOW),
        T0 + dt.timedelta(minutes=30),
        T0 + dt.timedelta(hours=3),
        3600.0,
    )
    rows = out.collect()
    # Inner grid anchors at (start − 1h); the fixture sample at T0 is
    # seen by inner steps up to T0+1h (instant lookback), so outer
    # steps at 00:30 and 01:30 carry values; 02:30+ are empty.
    steps = sorted({r.t for r in rows})
    assert steps == [T0 + dt.timedelta(minutes=30),
                     T0 + dt.timedelta(minutes=90)]
    got = {r.sensor_id: r.value for r in rows if r.t == steps[0]}
    assert got["b/i1/inf"] == 100.0 and got["b/i2/0.5"] == 15.0


class TestHistogramFraction:
    """histogram_fraction(lower, upper, b) — the classic-bucket
    analogue of Prometheus' native-histogram estimator (round 7):
    (cdf(upper) − cdf(lower)) / total with linear interpolation inside
    the bucket containing each bound."""

    def test_exact_bucket_edges(self, frames):
        got = _run(frames, "histogram_fraction(0.1, 0.5, b)")
        # i1: (60 − 10) / 100.
        assert got['instance="i1"'] == pytest.approx(0.5)
        # i2 repaired to (20, 20, 95, 100): (20 − 20) / 100 = 0.
        assert got['instance="i2"'] == 0.0
        assert math.isnan(got['instance="i3"'])  # no +Inf bucket

    def test_interpolated_bound(self, frames):
        got = _run(frames, "histogram_fraction(0, 0.3, b)")
        # i1: cdf(0.3) = 10 + 50·(0.3−0.1)/0.4 = 35; cdf(0) = 0.
        assert got['instance="i1"'] == pytest.approx(0.35)

    def test_bound_past_highest_finite_le(self, frames):
        got = _run(frames, "histogram_fraction(0.5, 99, b)")
        # cdf(99) reads the last finite bucket (90): (90 − 60) / 100.
        assert got['instance="i1"'] == pytest.approx(0.3)

    def test_reversed_bounds_clamp_to_zero(self, frames):
        got = _run(frames, "histogram_fraction(0.5, 0.1, b)")
        assert got['instance="i1"'] == 0.0

    def test_negative_first_bucket(self, frames):
        got = _run(frames, "histogram_fraction(-1, 0, b)")
        # i4: cdf(0) = 90, cdf(-1) hits the le=-1 first bucket → 80.
        assert got['instance="i4"'] == pytest.approx(0.1)

    def test_range_evaluated_per_step(self, frames):
        from sensapp_spark.query.promql_ext import evaluate_range

        sensors, vals = frames
        out = evaluate_range(
            sensors, vals,
            parse_extended("histogram_fraction(0.1, 0.5, b)", now=NOW),
            T0 + dt.timedelta(minutes=30),
            T0 + dt.timedelta(minutes=60),
            1800.0,
        )
        got = [
            (r.labels, r.value)
            for r in out.collect()
            if r.labels == 'instance="i1"'
        ]
        assert got == [('instance="i1"', 0.5)] * 2

    def test_rejections(self, frames):
        for expr, frag in [
            ("histogram_fraction(0.5, b)", "2 scalar"),
            ("histogram_fraction(0, 1, histogram_quantile(0.5, b))",
             "cannot wrap"),
            ("histogram_quantile(0.9, histogram_fraction(0, 1, b))",
             "cannot wrap"),
            ("histogram_fraction(0, 1, vector(1))", "not a constant"),
            ("absent(histogram_fraction(0, 1, b))", "plain selector"),
        ]:
            with pytest.raises(PromQLError, match=frag):
                _run(frames, expr)

    def test_rejected_as_binary_operand(self, frames):
        from sensapp_spark.query.promql_ext import (
            evaluate_binary,
            parse_extended_expr,
        )

        sensors, vals = frames
        with pytest.raises(PromQLError, match="binary operations"):
            evaluate_binary(
                sensors, vals,
                parse_extended_expr(
                    "histogram_fraction(0, 1, b) / b", now=NOW
                ),
            )


def test_post_function_applies_to_quantile_not_buckets(frames):
    """clamp_max over histogram_quantile clamps the RESULT; clamping
    the cumulative counts instead would destroy the CDF and pick the
    wrong bucket (second round-6 review finding)."""
    got = _run(frames, "clamp_max(histogram_quantile(0.5, b), 0.5)")
    assert got['instance="i1"'] == pytest.approx(0.42)
    assert got['instance="i2"'] == 0.5
    assert got['instance="i4"'] == -1.0


@pytest.mark.parametrize(
    "expr, fragment",
    [
        (
            "histogram_quantile(0.5, histogram_quantile(0.5, b))",
            "cannot wrap a histogram function",
        ),
        (
            "histogram_quantile(0.5, sum by (instance) (b))",
            "must keep the le label",
        ),
        ("histogram_quantile(b)", "1 scalar leading argument"),
        (
            "max by (instance) (histogram_quantile(0.5, b))",
            "Grouped aggregation over a histogram function",
        ),
        (
            "topk(2, histogram_quantile(0.5, b))",
            "over a histogram function is not supported",
        ),
    ],
)
def test_rejections(frames, expr, fragment):
    with pytest.raises(PromQLError) as exc:
        parse_extended(expr, now=NOW)
    assert fragment in str(exc.value)
