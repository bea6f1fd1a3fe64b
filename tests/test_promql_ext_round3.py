"""Round-3 extended-PromQL: instantaneous/derivative functions, set
operations, comparison filters — semantics pinned on hand-built frames
(the DuckDB oracle covers the registry shapes; these cover edge rules)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.query.promql_ext import (
    BinaryQuery,
    PromQLError,
    evaluate_binary,
    evaluate_extended,
    parse_extended,
    parse_extended_expr,
)

# NOW sits 30 min after the sample epoch so both the 1 h instant
# lookback and explicit range windows cover the hand-built samples.
T0 = dt.datetime(2024, 1, 1)
NOW = T0 + dt.timedelta(minutes=30)


def _mk(spark, rows):
    """rows: (sensor_id, seconds_after_T0, value); sensors derived."""
    vals = spark.createDataFrame(
        [(s, T0 + dt.timedelta(seconds=off), float(v), i)
         for i, (s, off, v) in enumerate(rows)],
        "sensor_id string, time timestamp, value double, event_id long",
    )
    sensors = (
        vals.select("sensor_id").distinct()
        .select(
            "sensor_id",
            F.split("sensor_id", "/").getItem(0).alias("name"),
            F.lit("Float").alias("type"),
            F.lit(None).cast("string").alias("unit"),
            F.lit(None).cast("string").alias("unit_description"),
            F.create_map(
                F.lit("user"), F.split("sensor_id", "/").getItem(1)
            ).alias("labels"),
        )
    )
    return sensors, vals


def _eval(spark, sensors, vals, expr):
    return evaluate_extended(sensors, vals, parse_extended(expr, now=NOW))


def _eval_bin(spark, sensors, vals, expr):
    return evaluate_binary(
        sensors, vals, parse_extended_expr(expr, now=NOW)
    )


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_parse_predict_linear_param():
    eq = parse_extended("predict_linear(m[5m], 600)", now=NOW)
    assert eq.func == "predict_linear" and eq.func_param == 600.0


def test_parse_predict_linear_requires_param():
    with pytest.raises(PromQLError):
        parse_extended("predict_linear(m[5m])", now=NOW)


def test_parse_timestamp_rejects_nested_func():
    with pytest.raises(PromQLError):
        parse_extended("timestamp(rate(m[5m]))", now=NOW)


def test_parse_set_op_and_matching():
    bq = parse_extended_expr("a and on(user) b", now=NOW)
    assert isinstance(bq, BinaryQuery)
    assert bq.op == "and" and bq.on == ["user"]


def test_parse_bool_modifier():
    bq = parse_extended_expr("m > bool 5", now=NOW)
    assert bq.op == ">" and bq.bool_mode and bq.right == 5.0


def test_parse_cmp_inside_braces_not_an_operator():
    # != inside the matcher braces must not register as a comparison.
    eq = parse_extended_expr('m{env!="prod"}', now=NOW)
    assert not isinstance(eq, BinaryQuery)


def test_parse_or_inside_name_not_an_operator():
    eq = parse_extended_expr("floor(m)", now=NOW)
    assert not isinstance(eq, BinaryQuery)


def test_parse_nesting_bounded():
    # Two nested levels parse (round 12: MAX_BINARY_DEPTH) — the
    # left-assoc set-op chain…
    bq = parse_extended_expr("a and b and c and d", now=NOW)
    assert bq.op == "and" and isinstance(bq.left, BinaryQuery)
    assert bq.left.left.op == "and"
    # …one level further stays didactically rejected.
    with pytest.raises(PromQLError):
        parse_extended_expr("a and b and c and d and e", now=NOW)


def test_parse_set_op_scalar_rejected():
    with pytest.raises(PromQLError):
        parse_extended_expr("m and 5", now=NOW)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def test_irate_uses_last_two_samples(spark):
    sensors, vals = _mk(
        spark, [("m/1", 0, 0.0), ("m/1", 10, 100.0), ("m/1", 20, 130.0)]
    )
    out = _eval(spark, sensors, vals, "irate(m[1h])").collect()
    assert len(out) == 1
    assert out[0].value == pytest.approx((130.0 - 100.0) / 10.0)


def test_irate_single_sample_dropped(spark):
    sensors, vals = _mk(spark, [("m/1", 0, 5.0)])
    assert _eval(spark, sensors, vals, "irate(m[1h])").count() == 0


def test_irate_counter_reset_clamps(spark):
    # last (7) < prev (100): Prometheus treats this as a counter reset
    # and uses the last value itself as the rise.
    sensors, vals = _mk(
        spark, [("m/1", 0, 50.0), ("m/1", 10, 100.0), ("m/1", 20, 7.0)]
    )
    out = _eval(spark, sensors, vals, "irate(m[1h])").collect()
    assert len(out) == 1
    assert out[0].value == pytest.approx(7.0 / 10.0)


def test_idelta_no_reset_clamp(spark):
    # idelta is a gauge function: raw (possibly negative) difference.
    sensors, vals = _mk(
        spark, [("m/1", 0, 50.0), ("m/1", 10, 100.0), ("m/1", 20, 7.0)]
    )
    out = _eval(spark, sensors, vals, "idelta(m[1h])").collect()
    assert len(out) == 1
    assert out[0].value == pytest.approx(7.0 - 100.0)


def test_idelta(spark):
    sensors, vals = _mk(
        spark, [("m/1", 0, 1.0), ("m/1", 10, 7.0), ("m/1", 20, 4.0)]
    )
    out = _eval(spark, sensors, vals, "idelta(m[1h])").collect()
    assert out[0].value == pytest.approx(4.0 - 7.0)


def test_changes_and_resets(spark):
    sensors, vals = _mk(
        spark,
        [("m/1", 0, 1.0), ("m/1", 1, 1.0), ("m/1", 2, 3.0),
         ("m/1", 3, 2.0), ("m/1", 4, 2.0), ("m/1", 5, 9.0)],
    )
    changes = _eval(spark, sensors, vals, "changes(m[1h])").collect()
    assert changes[0].value == 3.0  # 1→3, 3→2, 2→9
    resets = _eval(spark, sensors, vals, "resets(m[1h])").collect()
    assert resets[0].value == 1.0  # 3→2


def test_deriv_exact_line(spark):
    # value = 2*t + 5 → slope exactly 2.
    sensors, vals = _mk(
        spark, [("m/1", t, 2.0 * t + 5.0) for t in (0, 10, 20, 30)]
    )
    out = _eval(spark, sensors, vals, "deriv(m[1h])").collect()
    assert out[0].value == pytest.approx(2.0)


def test_predict_linear_extrapolates(spark):
    # Line v = 2t+5 (t seconds after T0); eval at NOW (=1800s), +100s.
    sensors, vals = _mk(
        spark, [("m/1", t, 2.0 * t + 5.0) for t in (0, 10, 20, 30)]
    )
    out = _eval(
        spark, sensors, vals, "predict_linear(m[1d], 100)"
    ).collect()
    t_pred = 1800 + 100
    assert out[0].value == pytest.approx(2.0 * t_pred + 5.0, rel=1e-9)


def test_timestamp_returns_last_sample_epoch(spark):
    sensors, vals = _mk(spark, [("m/1", 0, 1.0), ("m/1", 30, 2.0)])
    out = _eval(spark, sensors, vals, "timestamp(m[1h])").collect()
    expected = (T0 + dt.timedelta(seconds=30)).replace(
        tzinfo=dt.timezone.utc
    ).timestamp()
    assert out[0].value == pytest.approx(expected)


def test_and_unless_or(spark):
    sensors, vals = _mk(
        spark,
        [("a/1", 0, 1.0), ("a/2", 0, 2.0), ("b/2", 0, 9.0), ("b/3", 0, 8.0)],
    )
    got = {
        r.sensor_id
        for r in _eval_bin(spark, sensors, vals, "a and b").collect()
    }
    assert got == {"a/2"}  # only user=2 exists on both sides
    got = {
        r.sensor_id
        for r in _eval_bin(spark, sensors, vals, "a unless b").collect()
    }
    assert got == {"a/1"}
    rows = _eval_bin(spark, sensors, vals, "a or b").collect()
    got = {r.sensor_id for r in rows}
    # all of a, plus b series whose key (user=3) has no a counterpart
    assert got == {"a/1", "a/2", "b/3"}
    # a/2 survives with ITS value, not b/2's
    assert {r.sensor_id: r.value for r in rows}["a/2"] == 2.0


def test_comparison_filter_and_bool(spark):
    sensors, vals = _mk(
        spark, [("m/1", 0, 1.0), ("m/2", 0, 5.0), ("m/3", 0, 9.0)]
    )
    kept = _eval_bin(spark, sensors, vals, "m > 4").collect()
    assert {r.sensor_id: r.value for r in kept} == {"m/2": 5.0, "m/3": 9.0}
    boolean = _eval_bin(spark, sensors, vals, "m > bool 4").collect()
    assert {r.sensor_id: r.value for r in boolean} == {
        "m/1": 0.0, "m/2": 1.0, "m/3": 1.0,
    }


def test_scalar_on_left_comparison(spark):
    sensors, vals = _mk(spark, [("m/1", 0, 1.0), ("m/2", 0, 5.0)])
    kept = _eval_bin(spark, sensors, vals, "4 > m").collect()
    assert {r.sensor_id for r in kept} == {"m/1"}
