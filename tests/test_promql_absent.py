"""``absent()`` / ``absent_over_time()`` — the alerting absence probe
(beyond-reference: the base parser rejects all functions). Pins the
0-or-1-row contract, equality-matcher label reconstruction, and the
composition rejection matrix.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.query.promql_ext import (
    PromQLError,
    evaluate_binary,
    evaluate_extended,
    evaluate_range,
    parse_extended,
    parse_extended_expr,
)

T0 = dt.datetime(2024, 1, 1)
NOW = T0 + dt.timedelta(minutes=30)


@pytest.fixture(scope="module")
def frames(spark):
    sensors = spark.createDataFrame(
        [("up/u1", "up", "Float", None, None, {"job": "x"})],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    vals = spark.createDataFrame(
        [("up/u1", T0, 1.0, 0)],
        "sensor_id string, time timestamp, value double, event_id long",
    )
    return sensors, vals


def _run(frames, expr):
    sensors, vals = frames
    return evaluate_extended(
        sensors, vals, parse_extended(expr, now=NOW)
    ).collect()


def test_absent_of_missing_metric_is_one(frames):
    rows = _run(frames, "absent(down)")
    assert [(r.labels, r.value) for r in rows] == [("", 1.0)]


def test_absent_of_present_metric_is_empty(frames):
    assert _run(frames, "absent(up)") == []
    assert _run(frames, "absent_over_time(up[1h])") == []


def test_absent_labels_from_equality_matchers(frames):
    rows = _run(frames, 'absent(down{job="api",instance=~"i.*"})')
    # Equality matchers only (regex carries no single value).
    assert [(r.labels, r.value) for r in rows] == [('job="api"', 1.0)]


def test_absent_regex_with_brackets_is_instant(frames):
    """Brackets inside quoted matcher values are not range brackets."""
    rows = _run(frames, 'absent(down{instance=~"host[0-9]"})')
    assert len(rows) == 1
    with pytest.raises(PromQLError, match="requires a range vector"):
        parse_extended(
            'absent_over_time(down{instance=~"host[0-9]"})', now=NOW
        )


def test_absent_label_values_escaped(frames):
    rows = _run(frames, 'absent(down{job="a\\"b"})')
    assert [r.labels for r in rows] == ['job="a\\"b"']


def test_timestamp_over_histogram_rejected(frames):
    with pytest.raises(PromQLError, match="plain instant selector"):
        parse_extended(
            "timestamp(histogram_quantile(0.9, down))", now=NOW
        )


def test_absent_respects_window(frames):
    # Samples exist, but not inside a window that ends before them.
    rows = _run(frames, "absent_over_time(up[1h] offset 30d)")
    assert len(rows) == 1


def test_absent_with_post_function(frames):
    rows = _run(frames, "clamp_max(absent(down), 0.5)")
    assert [r.value for r in rows] == [0.5]


@pytest.mark.parametrize(
    "expr, fragment",
    [
        ("absent(rate(up[1h]))", "plain selector"),
        ("absent(up[1h])", "instant selector"),
        ("absent_over_time(up)", "requires a range vector"),
        ("sum(absent(down))", "meaningless"),
        ("max_over_time(absent(down)[1d:1h])", "inside a subquery"),
        ("label_replace(absent(down), \"a\", \"b\", \"c\", \".*\")",
         "is not supported"),
        # Round-7 advisor fix: EVERY known function head is rejected
        # didactically inside absent(), not just the instant-evaluable
        # ones — these three used to fall through to the selector
        # parser and surface a confusing parse error.
        ("absent(label_replace(up, \"a\", \"b\", \"c\", \".*\"))",
         "plain selector"),
        ("absent(timestamp(up))", "plain selector"),
        ("absent(histogram_quantile(0.9, up_bucket))", "plain selector"),
    ],
)
def test_absent_rejections(frames, expr, fragment):
    with pytest.raises(PromQLError) as exc:
        parse_extended(expr, now=NOW)
    assert fragment in str(exc.value)


def test_absent_rejected_in_binary(frames):
    sensors, vals = frames
    with pytest.raises(PromQLError, match="operands in binary"):
        evaluate_binary(
            sensors, vals,
            parse_extended_expr("absent(down) + absent(up)", now=NOW),
        )


def test_absent_range_evaluates_per_step(frames):
    """Round 7: absent() in range queries emits one row per step whose
    window has no matching sample (previously a didactic rejection) —
    a missing metric is absent at EVERY step, a present one at none
    within its coverage."""
    sensors, vals = frames
    out = evaluate_range(
        sensors, vals, parse_extended("absent(down)", now=NOW),
        T0, T0 + dt.timedelta(minutes=20), 600,
    )
    rows = out.collect()
    assert len(rows) == 3 and all(r.value == 1.0 for r in rows)
