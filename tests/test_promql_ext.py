"""Extended-PromQL parser + evaluator (query/promql_ext.py): the
expression classes the reference rejects, evaluated as DataFrame plans.
The BASE parser must keep rejecting them (parity) — asserted here too."""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.operators.matchers import MatcherType
from sensapp_spark.query.promql import PromQLError, parse_promql_query
from sensapp_spark.query.promql_ext import (
    BinaryQuery,
    evaluate_binary,
    evaluate_extended,
    evaluate_range,
    parse_extended,
    parse_extended_expr,
)

NOW = dt.datetime(2024, 2, 1)


# -- parser -----------------------------------------------------------------

def test_plain_selector_passthrough():
    eq = parse_extended('metric{env="prod"}[5m]', NOW)
    assert eq.func is None and eq.agg is None
    assert eq.selector.matchers[0].value == "metric"
    assert eq.selector.start_time == NOW - dt.timedelta(minutes=5)


def test_rate_requires_range():
    eq = parse_extended("rate(metric[1h])", NOW)
    assert eq.func == "rate"
    assert eq.selector.start_time == NOW - dt.timedelta(hours=1)
    with pytest.raises(PromQLError) as e:
        parse_extended("rate(metric)", NOW)
    assert e.value.kind == "call"


@pytest.mark.parametrize("query,by", [
    ('sum(rate(metric[1h]))', []),
    ('sum by (region) (rate(metric[1h]))', ["region"]),
    ('sum(rate(metric[1h])) by (region)', ["region"]),
])
def test_agg_by_positions(query, by):
    eq = parse_extended(query, NOW)
    assert eq.agg == "sum" and eq.func == "rate" and eq.by == by


def test_agg_over_plain_selector():
    eq = parse_extended('avg by (host) (metric{env="prod"})', NOW)
    assert eq.agg == "avg" and eq.func is None and eq.by == ["host"]


def test_parse_errors():
    for bad, kind in [
        ("sum by (r) (sum(metric))", "aggregation"),   # nested agg
        ("sum by (r) (metric) by (q)", "parse"),       # duplicate by
        ("sum(metric) extra", "parse"),                # trailing junk
        ("rate(metric[1h]", "parse"),                  # unbalanced
    ]:
        with pytest.raises(PromQLError) as e:
            parse_extended(bad, NOW)
        assert e.value.kind == kind


def test_metric_named_like_agg_still_plain_selector():
    # "sum" with no parens is a metric name, not an aggregation.
    eq = parse_extended("sum_total", NOW)
    assert eq.agg is None
    assert eq.selector.matchers[0].matcher_type == MatcherType.EQUAL


def test_base_parser_still_rejects():
    for bad, kind in [
        ("sum(metric)", "aggregation"),
        ("rate(metric[1h])", "call"),
    ]:
        with pytest.raises(PromQLError) as e:
            parse_promql_query(bad)
        assert e.value.kind == kind


# -- evaluator --------------------------------------------------------------

@pytest.fixture(scope="module")
def frames(spark):
    sensors = spark.createDataFrame(
        [
            ("s1", "m", "Float", None, None, {"region": "r1"}),
            ("s2", "m", "Float", None, None, {"region": "r2"}),
            ("s3", "m", "Float", None, None, {}),
            ("x1", "other", "Float", None, None, {"region": "r1"}),
        ],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    t0 = dt.datetime(2024, 1, 31, 23, 0)
    rows = []
    for sid, vals in [("s1", [1.0, 5.0]), ("s2", [2.0, 4.0]),
                      ("s3", [7.0, 7.5]), ("x1", [100.0, 200.0])]:
        for i, v in enumerate(vals):
            rows.append((sid, t0 + dt.timedelta(minutes=30 * i), v))
    values = spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double")
    return sensors, values


def _eval(spark, frames, query):
    sensors, values = frames
    return evaluate_extended(sensors, values, parse_extended(query, NOW))


def test_instant_vector_is_last_sample(spark, frames):
    out = {r.sensor_id: r.value for r in _eval(spark, frames, "m").collect()}
    assert out == {"s1": 5.0, "s2": 4.0, "s3": 7.5}


def test_rate_and_increase(spark, frames):
    rate = {r.sensor_id: r.value
            for r in _eval(spark, frames, "rate(m[1h])").collect()}
    assert rate["s1"] == pytest.approx(4.0 / 1800)
    inc = {r.sensor_id: r.value
           for r in _eval(spark, frames, "increase(m[1h])").collect()}
    assert inc == {"s1": 4.0, "s2": 2.0, "s3": 0.5}


def test_sum_by_label_and_absent_label_group(spark, frames):
    out = {r.region: r.value for r in _eval(
        spark, frames, "sum by (region) (increase(m[1h]))").collect()}
    assert out == {"r1": 4.0, "r2": 2.0, None: 0.5}


def test_avg_over_time_and_global_count(spark, frames):
    avg = {r.sensor_id: r.value for r in _eval(
        spark, frames, "avg_over_time(m[1h])").collect()}
    assert avg == {"s1": 3.0, "s2": 3.0, "s3": 7.25}
    [row] = _eval(spark, frames, "count(m)").collect()
    assert row.value == 3  # selector excludes 'other'


# -- round-2 grammar: without/topk/quantile/offset/parametric funcs ---------

def test_parse_without_and_params():
    eq = parse_extended("sum without (user) (rate(m[1h]))", NOW)
    assert eq.agg == "sum" and eq.without == ["user"] and eq.by == []
    eq = parse_extended("topk(3, m)", NOW)
    assert eq.agg == "topk" and eq.param == 3.0
    eq = parse_extended("quantile_over_time(0.9, m[30m])", NOW)
    assert eq.func == "quantile_over_time" and eq.func_param == 0.9
    assert eq.selector.start_time == NOW - dt.timedelta(minutes=30)
    with pytest.raises(PromQLError):
        parse_extended("topk(m)", NOW)  # missing scalar arg
    with pytest.raises(PromQLError) as e:
        parse_extended("sum by (a) (m) without (b)", NOW)
    assert e.value.kind == "parse"  # duplicate grouping clause


def test_parse_offset():
    eq = parse_extended("m[30m] offset 1h", NOW)
    assert eq.selector.end_time == NOW - dt.timedelta(hours=1)
    assert eq.selector.start_time == NOW - dt.timedelta(hours=1, minutes=30)
    eq = parse_extended("sum(increase(m[30m] offset 2h))", NOW)
    assert eq.agg == "sum" and eq.func == "increase"
    assert eq.selector.end_time == NOW - dt.timedelta(hours=2)
    # Base parser (reference parity) must keep rejecting offset.
    with pytest.raises(PromQLError):
        parse_promql_query("m[30m] offset 1h", NOW)


def test_metric_named_by_prefix_is_not_grouping():
    # 'sum byte_total' must not treat 'byte_total' as a 'by' clause.
    with pytest.raises(PromQLError):
        parse_extended("sum byte_total (m)", NOW)


def test_stddev_and_quantile_aggs(spark, frames):
    # last values: s1=5, s2=4, s3=7.5 → pop-stddev of the three
    [row] = _eval(spark, frames, "stddev(m)").collect()
    import statistics
    assert row.value == pytest.approx(statistics.pstdev([5.0, 4.0, 7.5]))
    [row] = _eval(spark, frames, "quantile(0.5, m)").collect()
    assert row.value == pytest.approx(5.0)


def test_topk_bottomk(spark, frames):
    top = _eval(spark, frames, "topk(2, m)").collect()
    assert sorted(r.sensor_id for r in top) == ["s1", "s3"]
    bottom = _eval(spark, frames, "bottomk(1, last_over_time(m[1h]))").collect()
    assert [r.sensor_id for r in bottom] == ["s2"]
    # per-group topk: 1 series per region (absent region is its own group)
    per = _eval(spark, frames, "topk by (region) (1, m)").collect()
    assert sorted(r.sensor_id for r in per) == ["s1", "s2", "s3"]


def test_sum_without(spark, frames):
    out = {r.labels: r.value for r in _eval(
        spark, frames, "sum without (region) (increase(m[1h]))").collect()}
    # all three series lose their region label → grouped by empty set
    assert out == {"": 6.5}
    keep = {r.labels: r.value for r in _eval(
        spark, frames, "sum without (nosuch) (increase(m[1h]))").collect()}
    assert keep == {'region="r1"': 4.0, 'region="r2"': 2.0, "": 0.5}


def test_quantile_stddev_present_over_time(spark, frames):
    q = {r.sensor_id: r.value for r in _eval(
        spark, frames, "quantile_over_time(0.5, m[1h])").collect()}
    assert q == {"s1": 3.0, "s2": 3.0, "s3": 7.25}
    sd = {r.sensor_id: r.value for r in _eval(
        spark, frames, "stddev_over_time(m[1h])").collect()}
    assert sd["s1"] == pytest.approx(2.0)  # pstdev([1, 5])
    pres = {r.sensor_id: r.value for r in _eval(
        spark, frames, "present_over_time(m[1h])").collect()}
    assert pres == {"s1": 1.0, "s2": 1.0, "s3": 1.0}


def test_parse_scalar_funcs_and_count_values():
    eq = parse_extended("clamp_max(abs(rate(m[5m])), 10)", NOW)
    assert eq.func == "rate"
    assert eq.post == [("abs", None), ("clamp_max", 10.0)]
    eq = parse_extended("round(m)", NOW)
    assert eq.post == [("round", 1.0)]
    eq = parse_extended("round(m, 0.5)", NOW)
    assert eq.post == [("round", 0.5)]
    eq = parse_extended('count_values("val", m)', NOW)
    assert eq.agg == "count_values" and eq.label_param == "val"
    with pytest.raises(PromQLError):
        parse_extended("clamp_min(m)", NOW)  # missing scalar arg
    with pytest.raises(PromQLError):
        parse_extended("count_values(m)", NOW)  # missing label arg
    # Scalar functions inside an aggregation apply per series first.
    eq = parse_extended("sum(abs(m))", NOW)
    assert eq.agg == "sum" and eq.series_post == [("abs", None)]
    assert eq.post == []


def test_scalar_funcs_evaluate(spark, frames):
    # last values: s1=5, s2=4, s3=7.5
    out = {r.sensor_id: r.value for r in _eval(
        spark, frames, "clamp_max(m, 5)").collect()}
    assert out == {"s1": 5.0, "s2": 4.0, "s3": 5.0}
    out = {r.sensor_id: r.value for r in _eval(
        spark, frames, "floor(sqrt(m))").collect()}
    assert out == {"s1": 2.0, "s2": 2.0, "s3": 2.0}
    out = {r.sensor_id: r.value for r in _eval(
        spark, frames, "round(m, 2)").collect()}
    assert out == {"s1": 6.0, "s2": 4.0, "s3": 8.0}
    # post-function applied after the aggregation
    [row] = _eval(spark, frames, "abs(sum(increase(m[1h])))").collect()
    assert row.value == pytest.approx(6.5)
    # ... and inside one: clamp per series BEFORE the sum.
    [row] = _eval(spark, frames, "sum(clamp_max(m, 5))").collect()
    assert row.value == pytest.approx(5.0 + 4.0 + 5.0)


def test_count_values_and_group(spark, frames):
    sensors, values = frames
    out = {r.val: r.value for r in _eval(
        spark, frames, 'count_values("val", m)').collect()}
    assert out == {5.0: 1, 4.0: 1, 7.5: 1}
    grp = {r.region: r.value for r in _eval(
        spark, frames, "group by (region) (m)").collect()}
    assert grp == {"r1": 1.0, "r2": 1.0, None: 1.0}


def test_parse_label_funcs():
    eq = parse_extended(
        'label_replace(m, "dst", "$1", "region", "r(.*)")', NOW)
    assert eq.label_ops == [("label_replace", ("dst", "$1", "region", "r(.*)"))]
    eq = parse_extended(
        'sum by (dst) (label_join(rate(m[5m]), "dst", "-", "region"))', NOW)
    assert eq.agg == "sum" and eq.func == "rate"
    assert eq.label_ops == [("label_join", ("dst", "-", "region"))]
    with pytest.raises(PromQLError):
        parse_extended('label_replace(m, "dst", "x")', NOW)  # arity
    with pytest.raises(PromQLError):
        parse_extended('label_replace(m, "1bad", "x", "a", ".*")', NOW)
    with pytest.raises(PromQLError) as e:
        parse_extended('label_replace(sum(m), "d", "x", "a", ".*")', NOW)
    assert e.value.kind == "aggregation"


def test_label_replace_evaluates(spark, frames):
    # region r1/r2 → bucket "b1"/"b2"; s3 (absent region) unmatched by
    # the digit regex, so it keeps its label set (no bucket label).
    out = {r.sensor_id: dict(r.labels) for r in _eval(
        spark, frames,
        'label_replace(m, "bucket", "b$1", "region", "r([0-9])")'
    ).collect()}
    assert out["s1"] == {"region": "r1", "bucket": "b1"}
    assert out["s2"] == {"region": "r2", "bucket": "b2"}
    assert out["s3"] == {}

    # Aggregation over the rewritten label — absent bucket is its own
    # group (None key), matching by-label semantics.
    agg = {r.bucket: r.value for r in _eval(
        spark, frames,
        'sum by (bucket) (label_replace(increase(m[1h]), '
        '"bucket", "b$1", "region", "r([0-9])"))'
    ).collect()}
    assert agg == {"b1": 4.0, "b2": 2.0, None: 0.5}

    # Empty replacement drops the destination label.
    out = {r.sensor_id: dict(r.labels) for r in _eval(
        spark, frames,
        'label_replace(m, "region", "", "region", ".*")'
    ).collect()}
    assert all(lbls == {} for lbls in out.values())


def test_label_join_evaluates(spark, frames):
    out = {r.sensor_id: dict(r.labels) for r in _eval(
        spark, frames,
        'label_join(m, "combo", "-", "region", "region")'
    ).collect()}
    assert out["s1"]["combo"] == "r1-r1"
    assert out["s3"]["combo"] == "-"  # absent sources read as ""


def test_range_query_sliding_windows(spark, frames):
    sensors, values = frames
    # Samples at 23:00 and 23:30 (Jan 31). Steps every 30 min from
    # 23:00 to Feb 1 00:00 with a 1h window.
    eq = parse_extended("sum_over_time(m[1h])", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 0),
        end=dt.datetime(2024, 2, 1, 0, 0),
        step_seconds=1800,
    )
    got = {(r.sensor_id, r.t.strftime("%H:%M")): r.value
           for r in out.collect()}
    # s1: samples 1.0@23:00, 5.0@23:30.
    assert got[("s1", "23:00")] == 1.0        # window [22:00, 23:00]
    assert got[("s1", "23:30")] == 6.0        # both samples
    assert got[("s1", "00:00")] == 6.0        # both still inside 1h
    # decoy metric excluded entirely
    assert not any(sid == "x1" for sid, _ in got)


def test_range_query_instant_and_agg(spark, frames):
    sensors, values = frames
    # Instant selector: last sample within the 1h lookback per step.
    eq = parse_extended("m", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 0),
        end=dt.datetime(2024, 2, 1, 0, 0),
        step_seconds=3600,
    )
    got = {(r.sensor_id, r.t.strftime("%H:%M")): r.value
           for r in out.collect()}
    assert got[("s1", "23:00")] == 1.0
    assert got[("s1", "00:00")] == 5.0   # last within [23:00, 00:00]

    # by-label aggregation per step.
    eq = parse_extended("sum by (region) (sum_over_time(m[1h]))", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 30),
        end=dt.datetime(2024, 2, 1, 0, 0),
        step_seconds=1800,
    )
    got = {(r.region, r.t.strftime("%H:%M")): r.value
           for r in out.collect()}
    assert got[("r1", "23:30")] == 6.0
    assert got[("r2", "00:00")] == 6.0
    assert got[(None, "23:30")] == 14.5


def test_range_query_topk_per_step(spark, frames):
    sensors, values = frames
    eq = parse_extended("topk(1, sum_over_time(m[1h]))", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 0),
        end=dt.datetime(2024, 2, 1, 0, 0),
        step_seconds=1800,
    )
    got = {r.t.strftime("%H:%M"): r.sensor_id for r in out.collect()}
    # 23:00: sums are s1=1, s2=2, s3=7 → s3; 23:30/00:00: s3=14.5 tops.
    assert got == {"23:00": "s3", "23:30": "s3", "00:00": "s3"}
    eq = parse_extended("bottomk(1, sum_over_time(m[1h]))", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 0),
        end=dt.datetime(2024, 1, 31, 23, 0),
        step_seconds=1800,
    )
    [row] = out.collect()
    assert row.sensor_id == "s1"  # sum 1.0 at 23:00


def test_range_query_rate_needs_two_samples(spark, frames):
    sensors, values = frames
    eq = parse_extended("rate(m[1h])", NOW)
    out = evaluate_range(
        sensors, values, eq,
        start=dt.datetime(2024, 1, 31, 23, 0),
        end=dt.datetime(2024, 2, 1, 0, 0),
        step_seconds=1800,
    )
    got = {(r.sensor_id, r.t.strftime("%H:%M")): r.value
           for r in out.collect()}
    # At 23:00 each series has ONE sample in window → no rate row.
    assert ("s1", "23:00") not in got
    assert got[("s1", "23:30")] == pytest.approx(4.0 / 1800)


def test_parse_binary():
    bq = parse_extended_expr("rate(a[5m]) / rate(b[5m])", NOW)
    assert isinstance(bq, BinaryQuery) and bq.op == "/"
    assert bq.left.func == "rate" and bq.right.func == "rate"
    bq = parse_extended_expr("a / on(user) b", NOW)
    assert bq.on == ["user"] and bq.ignoring == []
    bq = parse_extended_expr("a - ignoring(region) b", NOW)
    assert bq.ignoring == ["region"]
    bq = parse_extended_expr("m * 2", NOW)
    assert bq.right == 2.0
    # non-binary falls through to the plain grammar
    eq = parse_extended_expr("sum(rate(m[5m]))", NOW)
    assert not isinstance(eq, BinaryQuery) and eq.agg == "sum"
    # Round 11: ONE level of binary nesting parses — left-assoc split
    # (a + b) + c, and Prometheus precedence picks the loosest split.
    bq = parse_extended_expr("a + b + c", NOW)
    assert isinstance(bq, BinaryQuery) and isinstance(bq.left, BinaryQuery)
    assert bq.op == "+" and bq.left.op == "+"
    bq = parse_extended_expr("a + b * c", NOW)
    assert bq.op == "+" and isinstance(bq.right, BinaryQuery)
    assert bq.right.op == "*"
    bq = parse_extended_expr("(a / b) > 0.5", NOW)
    assert bq.op == ">" and isinstance(bq.left, BinaryQuery)
    assert bq.right == 0.5
    # Round 12: two nested levels parse; the configured bound still
    # rejects didactically one level further.
    bq = parse_extended_expr("a + b + c + d", NOW)
    assert bq.op == "+" and bq.left.op == "+" and bq.left.left.op == "+"
    with pytest.raises(PromQLError) as e:
        parse_extended_expr("a + b + c + d + e", NOW)
    assert e.value.kind == "binary"
    with pytest.raises(PromQLError) as e:
        parse_extended_expr("1 + 2", NOW)
    assert e.value.kind == "literal"


def test_binary_scalar(spark, frames):
    sensors, values = frames
    bq = parse_extended_expr("increase(m[1h]) * 2", NOW)
    out = {r.sensor_id: r.value
           for r in evaluate_binary(sensors, values, bq).collect()}
    assert out == {"s1": 8.0, "s2": 4.0, "s3": 1.0}
    # scalar on the left, non-commutative op
    bq = parse_extended_expr("10 - last_over_time(m[1h])", NOW)
    out = {r.sensor_id: r.value
           for r in evaluate_binary(sensors, values, bq).collect()}
    assert out == {"s1": 5.0, "s2": 6.0, "s3": 2.5}


def test_binary_vector_matching(spark, frames):
    sensors, values = frames
    # Self-ratio: every series matches itself on its full label set.
    bq = parse_extended_expr("increase(m[1h]) / increase(m[1h])", NOW)
    out = evaluate_binary(sensors, values, bq).collect()
    assert {r.labels for r in out} == {'region="r1"', 'region="r2"', ""}
    assert all(r.value == pytest.approx(1.0) for r in out)
    # on(region): s3 (no region) matches via empty-value key.
    bq = parse_extended_expr(
        "last_over_time(m[1h]) - on(region) avg_over_time(m[1h])", NOW)
    out = {r.labels: r.value
           for r in evaluate_binary(sensors, values, bq).collect()}
    assert out['region="r1"'] == pytest.approx(2.0)  # 5 - 3
    assert out['region=""'] == pytest.approx(0.25)  # 7.5 - 7.25
    # GLOBAL aggregates are Prometheus' one-row empty-label vectors
    # (round 11): sum(m)/sum(m) joins on the empty key.
    out = evaluate_binary(
        sensors, values, parse_extended_expr("sum(m) / sum(m)", NOW)
    ).collect()
    assert [(r.labels, r.value) for r in out] == [("", 1.0)]
    # by-GROUPED vector operands stay didactically rejected (their
    # result keys on group columns, not a label set).
    with pytest.raises(PromQLError) as e:
        evaluate_binary(
            sensors, values,
            parse_extended_expr("sum by (region) (m) / sum(m)", NOW))
    assert e.value.kind == "binary"


def test_offset_window_excludes_recent_samples(spark, frames):
    # offset 45m shifts the window to [22:15, 23:15] — only the first
    # sample of each series (23:00) is inside; the range filter is
    # inclusive-both-ends (reference Q5 semantics), so a 30m offset
    # would still catch the 23:30 samples on the boundary.
    out = {r.sensor_id: r.value for r in _eval(
        spark, frames, "sum_over_time(m[1h] offset 45m)").collect()}
    assert out == {"s1": 1.0, "s2": 2.0, "s3": 7.0}


def _hw_reference(samples, sf, tf):
    """Pure-Python port of Prometheus promql/functions.go
    funcHoltWinters — the oracle for the DataFrame fold."""
    s0, s1, b = 0.0, samples[0], samples[1] - samples[0]
    for i in range(1, len(samples)):
        x = sf * samples[i]
        if i - 1 != 0:
            b = tf * (s1 - s0) + (1.0 - tf) * b
        y = (1.0 - sf) * (s1 + b)
        s0, s1 = s1, x + y
    return s1


def test_holt_winters_matches_prometheus_recurrence(spark, frames):
    # Window [1h] holds two samples per series — the minimal legal
    # fold; the reference recurrence must agree exactly.
    out = {r.sensor_id: r.value for r in _eval(
        spark, frames, "holt_winters(m[1h], 0.5, 0.3)").collect()}
    assert set(out) == {"s1", "s2", "s3"}
    for sid, vals in [("s1", [1.0, 5.0]), ("s2", [2.0, 4.0]),
                      ("s3", [7.0, 7.5])]:
        assert out[sid] == pytest.approx(_hw_reference(vals, 0.5, 0.3))
    # Prometheus 3.x spelling is the same function.
    des = {r.sensor_id: r.value for r in _eval(
        spark, frames,
        "double_exponential_smoothing(m[1h], 0.5, 0.3)").collect()}
    assert des == out


def test_holt_winters_longer_fold(spark):
    # A 6-sample fold exercises the i>0 trend branch several times.
    sensors = spark.createDataFrame(
        [("h1", "m", "Float", None, None, {})],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    t0 = dt.datetime(2024, 1, 31, 22, 0)
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    values = spark.createDataFrame(
        [("h1", t0 + dt.timedelta(minutes=10 * i), v)
         for i, v in enumerate(vals)],
        "sensor_id string, time timestamp, value double",
    )
    out = evaluate_extended(
        sensors, values,
        parse_extended("holt_winters(m[2h], 0.5, 0.3)", NOW)).collect()
    assert out[0].value == pytest.approx(_hw_reference(vals, 0.5, 0.3))


def test_holt_winters_single_sample_drops(spark, frames):
    # offset 45m leaves one sample per series in the 30m window —
    # fewer than the two the recurrence needs, so every series drops
    # (Prometheus: windows with < 2 points yield no sample).
    out = _eval(
        spark, frames, "holt_winters(m[30m] offset 45m, 0.5, 0.3)"
    ).collect()
    assert out == []


def test_holt_winters_param_validation():
    for bad in ["holt_winters(m[1h], 0.0, 0.3)",
                "holt_winters(m[1h], 0.5, 1.0)",
                "holt_winters(m[1h], -1, 0.5)"]:
        with pytest.raises(PromQLError) as e:
            parse_extended(bad, NOW)
        assert e.value.kind == "call"
        assert "must be in (0, 1)" in str(e.value)


def test_mad_over_time(spark):
    # median(|v − median(v)|): vals 3,1,4,1,5,9 → median 3.5,
    # deviations sorted 0.5,1.5,1.5,2.5,2.5,5.5 → MAD 2.0.
    sensors = spark.createDataFrame(
        [("h1", "m", "Float", None, None, {})],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    t0 = dt.datetime(2024, 1, 31, 22, 0)
    values = spark.createDataFrame(
        [("h1", t0 + dt.timedelta(minutes=10 * i), v)
         for i, v in enumerate([3.0, 1.0, 4.0, 1.0, 5.0, 9.0])],
        "sensor_id string, time timestamp, value double",
    )
    out = evaluate_extended(
        sensors, values,
        parse_extended("mad_over_time(m[2h])", NOW)).collect()
    assert out[0].value == pytest.approx(2.0)
    # Even count uses interpolated medians: [1,2,4,8] → median 3,
    # deviations 2,1,1,5 → MAD 1.5.
    values2 = spark.createDataFrame(
        [("h1", t0 + dt.timedelta(minutes=10 * i), v)
         for i, v in enumerate([1.0, 2.0, 4.0, 8.0])],
        "sensor_id string, time timestamp, value double",
    )
    out2 = evaluate_extended(
        sensors, values2,
        parse_extended("mad_over_time(m[2h])", NOW)).collect()
    assert out2[0].value == pytest.approx(1.5)


# -- operand cache (round 14) -------------------------------------------------

def _cache_fixture_frames(spark):
    sensors = spark.createDataFrame(
        [("c/1", "click", "Float", None, None, {"user": "1"}),
         ("c/2", "click", "Float", None, None, {"user": "2"}),
         ("v/1", "view", "Float", None, None, {"user": "1"}),
         ("v/2", "view", "Float", None, None, {"user": "2"})],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for sid, base in (("c/1", 1.0), ("c/2", 2.0), ("v/1", 3.0), ("v/2", 4.0)):
        for i in range(6):
            rows.append((sid, t0 + dt.timedelta(hours=6 * i), base + 0.5 * i))
    values = spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double"
    )
    return sensors, values


def test_operand_cache_shares_series_vector(spark):
    """One cache dict per construction: canonically-equal operands are
    evaluated once (the dict holds ONE frame per distinct key) and every
    consumer sees values identical to the uncached path."""
    sensors, values = _cache_fixture_frames(spark)
    exprs = [
        "rate(click[31d]) / rate(view[31d])",
        "rate(click[31d]) / scalar(sum(rate(view[31d])))",
        "(rate(click[31d]) / rate(view[31d])) > 0",
    ]
    cache: dict = {}
    shared = [
        sorted(
            evaluate_binary(
                sensors, values, parse_extended_expr(e, now=NOW), cache
            ).collect()
        )
        for e in exprs
    ]
    plain = [
        sorted(
            evaluate_binary(
                sensors, values, parse_extended_expr(e, now=NOW)
            ).collect()
        )
        for e in exprs
    ]
    assert shared == plain
    # rate(click) + rate(view) — exactly two distinct series vectors.
    assert len(cache) == 2
    assert all(k[0] == "series" for k in cache)


def test_operand_cache_distinguishes_func_and_selector(spark):
    """The memo key must separate different funcs over one selector and
    one func over different selectors — a collision would silently serve
    the wrong vector."""
    sensors, values = _cache_fixture_frames(spark)
    cache: dict = {}
    r = evaluate_extended(
        sensors, values, parse_extended("rate(click[31d])", NOW), cache
    ).collect()
    inc = evaluate_extended(
        sensors, values, parse_extended("increase(click[31d])", NOW), cache
    ).collect()
    other = evaluate_extended(
        sensors, values, parse_extended("rate(view[31d])", NOW), cache
    ).collect()
    assert len(cache) == 3
    by_sid_rate = {row.sensor_id: row.value for row in r}
    by_sid_inc = {row.sensor_id: row.value for row in inc}
    # increase = rate × span (30h here): values must differ.
    for sid in by_sid_rate:
        assert by_sid_inc[sid] != by_sid_rate[sid]
    assert {row.sensor_id for row in other} == {"v/1", "v/2"}


def test_operand_cache_aggregations_apply_per_consumer(spark):
    """agg/by/post wrappers are OUTSIDE the memo: two different
    aggregations over one cached operand both come out right."""
    sensors, values = _cache_fixture_frames(spark)
    cache: dict = {}
    total = evaluate_extended(
        sensors, values,
        parse_extended("sum(rate(click[31d]))", NOW), cache,
    ).collect()
    per_user = evaluate_extended(
        sensors, values,
        parse_extended("sum by (user) (rate(click[31d]))", NOW), cache,
    ).collect()
    assert len(cache) == 1  # one shared series vector
    assert len(total) == 1 and len(per_user) == 2
    assert total[0].value == pytest.approx(
        sum(row.value for row in per_user)
    )
