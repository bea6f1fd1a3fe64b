"""Nested aggregations (round 8): ``topk(5, sum by (x) (rate(m[5m])))``
and the rest of the two-level dashboard shapes. Prometheus reference
semantics: promql/parser accepts arbitrary aggregation nesting and
evaluates inner-first (prometheus promql/engine.go aggregation eval);
the reference engine rejects every aggregation
(src/ingestors/http/simple_promql.rs:149-171), so this surface is
beyond-reference. Two levels are supported (no dashboard shape needs
more); unsupported compositions get didactic rejections."""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.query.promql_ext import (
    PromQLError,
    evaluate_extended,
    evaluate_range,
    needs_extended,
    parse_extended,
)

T0 = dt.datetime(2024, 1, 1)
NOW = T0 + dt.timedelta(minutes=30)


@pytest.fixture(scope="module")
def frames(spark):
    sensors = spark.createDataFrame(
        [
            (
                f"s{i}",
                "m",
                "Float",
                None,
                None,
                {"region": "eu" if i % 2 else "us", "host": f"h{i}"},
            )
            for i in range(6)
        ],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    # Latest sample per series (what the instant lookback picks): 10*i.
    vals = spark.createDataFrame(
        [
            (f"s{i}", NOW - dt.timedelta(minutes=j), float(i * 10 + j))
            for i in range(6)
            for j in range(3)
        ],
        "sensor_id string, time timestamp, value double",
    )
    return sensors, vals


def _run(frames, q):
    return evaluate_extended(*frames, parse_extended(q, NOW))


def test_topk_over_grouped_sum(frames):
    out = _run(frames, "topk(1, sum by (region) (m))")
    assert out.columns == ["region", "value"]
    assert [tuple(r) for r in out.collect()] == [("eu", 90.0)]


def test_parse_fields():
    eq = parse_extended("topk(2, sum by (region) (rate(m[5m])))", NOW)
    assert eq.agg == "sum" and eq.by == ["region"]
    assert eq.outer_agg == "topk" and eq.outer_param == 2.0
    assert eq.func == "rate"
    assert needs_extended(eq)


def test_ungrouped_outer_reduction(frames):
    out = _run(frames, "sum(sum by (region) (m))")
    assert [r.value for r in out.collect()] == [150.0]


def test_outer_by_subset(frames):
    out = _run(frames, "max by (region) (sum by (region, host) (m))")
    got = {(r.region, r.value) for r in out.collect()}
    assert got == {("eu", 50.0), ("us", 40.0)}


def test_reduction_over_selection(frames):
    # topk keeps the series shape, so the outer works like any agg.
    assert [
        r.value for r in _run(frames, "sum(topk(2, m))").collect()
    ] == [90.0]
    out = _run(frames, "sum by (region) (topk(1, m))")
    assert [tuple(r) for r in out.collect()] == [("eu", 50.0)]


def test_outer_without_over_selection(frames):
    out = _run(frames, "sum without (host) (topk(4, m))")
    got = {(r.labels, r.value) for r in out.collect()}
    assert got == {('region="eu"', 80.0), ('region="us"', 60.0)}


def test_outer_quantile_and_count(frames):
    assert [
        r.value
        for r in _run(frames, "quantile(0.5, sum by (host) (m))").collect()
    ] == [25.0]
    assert [
        r.value
        for r in _run(frames, "count(sum by (host) (m))").collect()
    ] == [6]


def test_outer_post_applies_after_outer_agg(frames):
    # Host sums are {0,10,20,30,40,50}. clamp OUTSIDE the outer
    # quantile: median 25 first, then clamp_max(…, 25) → 25. Were the
    # wrapper mis-attributed between the levels, clamping first would
    # yield median({0,10,20,25,25,25}) = 22.5.
    out = _run(frames, "clamp_max(quantile(0.5, sum by (host) (m)), 25)")
    assert [r.value for r in out.collect()] == [25.0]


def test_inner_post_applies_before_outer(frames):
    # clamp BETWEEN the levels: inner sums clamp to {0,10,20,25,25,25},
    # outer median interpolates to 22.5 (clamping after would give 25).
    out = _run(frames, "quantile(0.5, clamp_max(sum by (host) (m), 25))")
    assert [r.value for r in out.collect()] == [22.5]


def test_nested_over_subquery(frames):
    out = _run(
        frames, "topk(1, sum by (region) (max_over_time(m[10m:5m])))"
    )
    assert out.columns == ["region", "value"]
    (row,) = out.collect()
    assert row.region == "eu"


def test_range_nested(frames):
    # Samples span only the last 3 minutes, so of the three steps
    # (00:20 / 00:25 / 00:30) exactly the last one sees data — one
    # winner row, per step that evaluates.
    eq = parse_extended("topk(1, sum by (region) (m))", NOW)
    out = evaluate_range(
        *frames, eq, NOW - dt.timedelta(minutes=10), NOW, 300, now=NOW
    )
    assert out.columns == ["region", "t", "value"]
    assert [tuple(r) for r in out.collect()] == [("eu", NOW, 90.0)]


def test_range_nested_reduction(frames):
    eq = parse_extended("sum(sum by (region) (m))", NOW)
    out = evaluate_range(
        *frames, eq, NOW - dt.timedelta(minutes=10), NOW, 300, now=NOW
    )
    assert out.columns == ["t", "value"]
    assert [tuple(r) for r in out.collect()] == [(NOW, 150.0)]


@pytest.mark.parametrize(
    "bad",
    [
        "sum(sum(sum(m)))",                           # three levels
        'count_values("v", sum by (x) (m))',          # outer count_values
        "limitk(2, sum by (region) (m))",             # outer sampler
        "sum by (host) (sum by (region) (m))",        # key not a subset
        "sum without (region) (sum by (region) (m))", # without over keys
        "sum by (region) (sum without (host) (m))",   # by over canonical
        "max(histogram_quantile(0.9, sum by (le) (m)))",  # agg'd hist
    ],
)
def test_didactic_rejections(bad):
    with pytest.raises(PromQLError) as e:
        parse_extended(bad, NOW)
    assert e.value.kind == "aggregation"


def test_existing_single_agg_unchanged(frames):
    out = _run(frames, "sum by (region) (m)")
    got = {(r.region, r.value) for r in out.collect()}
    assert got == {("eu", 90.0), ("us", 60.0)}


def test_binary_rejects_subquery_wrapped_nested(frames):
    """A nested aggregation hiding inside a subquery operand loses the
    series shape just like a bare one — didactic rejection, not an
    opaque AnalysisException (round-8 review)."""
    from sensapp_spark.query.promql_ext import (
        evaluate_binary,
        parse_extended_expr,
    )

    bq = parse_extended_expr(
        "avg_over_time(sum(topk(2, m))[10m:5m]) + "
        "max_over_time(m[10m])",
        NOW,
    )
    with pytest.raises(PromQLError, match="Nested-aggregation"):
        evaluate_binary(*frames, bq)


def test_count_values_as_inner(frames):
    """count_values produces a key-shaped frame whose keys include the
    value-derived label — the outer may group by it."""
    out = _run(frames, 'sum by (v) (count_values("v", m))')
    # Latest per series: 0,10,20,30,40,50 — each value seen once, so
    # every (v, count=1) group sums to 1.
    got = {(r.v, r.value) for r in out.collect()}
    assert got == {(float(i * 10), 1) for i in range(6)}
    # And ungrouped: 6 distinct values, count 1 each, sum 6.
    tot = _run(frames, 'sum(count_values("v", m))')
    assert [r.value for r in tot.collect()] == [6]


def test_sort_over_nested(frames):
    out = _run(frames, "sort_desc(sum by (host) (m))")
    assert [r.value for r in out.collect()] == [50.0, 40.0, 30.0, 20.0, 10.0, 0.0]
    out2 = _run(frames, "sort(topk(2, sum by (region) (m)))")
    assert [r.value for r in out2.collect()] == [60.0, 90.0]


# -- the permitted third level (round 9) ----------------------------------


def test_triple_sum_over_topk_of_grouped_sum(frames):
    """sum(topk(1, sum by (region)(m))) — the 'total held by the top
    k' dashboard triple: region sums are eu=90, us=60; topk(1) keeps
    eu; outer sum = 90."""
    out = _run(frames, "sum(topk(1, sum by (region) (m)))")
    assert out.columns == ["value"]
    assert [r.value for r in out.collect()] == [90.0]
    # k wider than the groups: total of all groups.
    assert [
        r.value
        for r in _run(frames, "sum(topk(5, sum by (region) (m)))").collect()
    ] == [150.0]


def test_triple_other_reductions(frames):
    assert [
        r.value
        for r in _run(
            frames, "avg(bottomk(2, sum by (host) (m)))"
        ).collect()
    ] == [5.0]  # host sums {0,10,20,30,40,50} → bottomk(2)={0,10}
    assert [
        r.value
        for r in _run(
            frames, "count(topk(3, sum by (host) (m)))"
        ).collect()
    ] == [3]


def test_triple_parse_fields():
    eq = parse_extended(
        "sum(topk(2, sum by (region) (rate(m[5m]))))", NOW
    )
    assert eq.agg == "sum" and eq.by == ["region"]
    assert eq.outer_agg == "topk" and eq.outer_param == 2.0
    assert eq.outer2_agg == "sum"
    assert needs_extended(eq)


def test_triple_range(frames):
    eq = parse_extended("sum(topk(1, sum by (region) (m)))", NOW)
    out = evaluate_range(
        *frames, eq, NOW - dt.timedelta(minutes=10), NOW, 300, now=NOW
    )
    assert out.columns == ["t", "value"]
    assert [tuple(r) for r in out.collect()] == [(NOW, 90.0)]


@pytest.mark.parametrize(
    "bad",
    [
        "sum(sum(sum(m)))",                       # still: no plain triple
        "sum by (region) (topk(1, sum by (region) (m)))",  # grouped L3
        "topk(1, topk(1, sum by (region) (m)))",  # sampler over sampler
        "sum(sum(topk(1, sum by (region) (m))))",  # four levels
        "quantile(0.5, topk(1, sum by (region) (m)))",  # param'd L3
        "sum(abs(topk(1, sum by (region) (m))))",  # wrapper between
    ],
)
def test_triple_rejections_stay_didactic(bad):
    with pytest.raises(PromQLError) as e:
        parse_extended(bad, NOW)
    assert e.value.kind == "aggregation"
