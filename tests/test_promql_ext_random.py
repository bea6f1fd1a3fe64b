"""Randomized cross-checks: the extended-PromQL evaluator vs an
independent pandas reference implementation, over seeded random series
(unique timestamps per series — max_by ties are undefined in both
implementations, so tie-free data isolates the semantics under test).

Samples are generated both inside and outside the query window to
exercise the range filter, and a third of series lack the region label
to exercise absent-label grouping."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest

from sensapp_spark.query.promql_ext import (
    evaluate_binary,
    evaluate_extended,
    parse_extended,
    parse_extended_expr,
)

NOW = dt.datetime(2024, 2, 1)
WINDOW_START = NOW - dt.timedelta(days=31)


def _gen(seed):
    rng = random.Random(seed)
    sensors, values = [], []
    for i in range(rng.randint(4, 8)):
        sid = f"s{i}"
        region = None if i % 3 == 0 else f"r{i % 3}"
        # Unique "inst" label per series: one-to-one binary matching is
        # only defined for distinct label sets (Prometheus rejects
        # duplicate matches at runtime; this engine documents them as
        # undefined) — real scrape targets always carry an instance.
        labels = {"inst": sid}
        if region:
            labels["region"] = region
        sensors.append((sid, "m", "Float", None, None, labels))
        # Unique per-sensor timestamps, some before the window start.
        n = rng.randint(1, 30)
        offsets = rng.sample(range(-2_000_000, 2_600_000), n)
        for off in offsets:
            t = WINDOW_START + dt.timedelta(seconds=off)
            values.append((sid, t, round(rng.uniform(-50, 50), 3)))
    # A decoy metric that every selector must exclude.
    sensors.append(("x0", "other", "Float", None, None, {}))
    values.append(("x0", NOW - dt.timedelta(hours=1), 1234.5))
    return sensors, values


def _in_window(values, sid):
    return sorted(
        (t, v) for s, t, v in values
        if s == sid and WINDOW_START <= t <= NOW
    )


def _series_refs(sensors, values, func):
    """Pandas-free reference: per-series scalar under `func`."""
    out = {}
    for sid, name, *_ in sensors:
        if name != "m":
            continue
        pts = _in_window(values, sid)
        if not pts:
            continue
        vs = [v for _, v in pts]
        if func == "instant":
            out[sid] = pts[-1][1]
        elif func in ("rate", "increase"):
            span = (pts[-1][0] - pts[0][0]).total_seconds()
            if span <= 0:
                continue
            rise = pts[-1][1] - pts[0][1]
            out[sid] = rise / span if func == "rate" else rise
        elif func == "avg":
            out[sid] = sum(vs) / len(vs)
        elif func == "sum":
            out[sid] = sum(vs)
        elif func == "stddev_pop":
            mean = sum(vs) / len(vs)
            out[sid] = math.sqrt(sum((v - mean) ** 2 for v in vs) / len(vs))
    return out


def _region_of(sensors):
    return {
        sid: labels.get("region")
        for sid, name, _t, _u, _d, labels in sensors
        if name == "m"
    }


@pytest.fixture(params=[7, 23, 61])
def data(request, spark):
    sensors_rows, values_rows = _gen(request.param)
    sensors = spark.createDataFrame(
        sensors_rows,
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    values = spark.createDataFrame(
        values_rows, "sensor_id string, time timestamp, value double")
    return sensors_rows, values_rows, sensors, values


def _eval(sensors, values, query):
    return evaluate_extended(
        sensors, values, parse_extended(query, NOW))


def test_per_series_functions_match_reference(data):
    sensors_rows, values_rows, sensors, values = data
    for query, ref_key in [
        ("m[31d]", None),  # parse check only (instant below)
        ("rate(m[31d])", "rate"),
        ("increase(m[31d])", "increase"),
        ("avg_over_time(m[31d])", "avg"),
        ("sum_over_time(m[31d])", "sum"),
        ("stddev_over_time(m[31d])", "stddev_pop"),
    ]:
        if ref_key is None:
            continue
        got = {r.sensor_id: r.value
               for r in _eval(sensors, values, query).collect()}
        want = _series_refs(sensors_rows, values_rows, ref_key)
        assert set(got) == set(want), query
        for sid in want:
            assert got[sid] == pytest.approx(want[sid], rel=1e-9), (
                query, sid)


def test_grouped_aggregation_matches_reference(data):
    sensors_rows, values_rows, sensors, values = data
    got = {r.region: r.value for r in _eval(
        sensors, values, "sum by (region) (avg_over_time(m[31d]))"
    ).collect()}
    per_series = _series_refs(sensors_rows, values_rows, "avg")
    region = _region_of(sensors_rows)
    want: dict = {}
    for sid, v in per_series.items():
        want[region[sid]] = want.get(region[sid], 0.0) + v
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_topk_matches_reference(data):
    sensors_rows, values_rows, sensors, values = data
    got = [r.sensor_id for r in _eval(
        sensors, values, "topk(3, avg_over_time(m[31d]))").collect()]
    per_series = _series_refs(sensors_rows, values_rows, "avg")
    want = sorted(per_series, key=lambda s: (-per_series[s], s))[:3]
    assert sorted(got) == sorted(want)


def test_binary_self_ratio_is_one(data):
    _, _, sensors, values = data
    bq = parse_extended_expr(
        "sum_over_time(m[31d]) / sum_over_time(m[31d])", NOW)
    out = evaluate_binary(sensors, values, bq).collect()
    assert len(out) > 0
    assert all(r.value == pytest.approx(1.0) for r in out)
