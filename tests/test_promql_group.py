"""Many-to-one PromQL vector matching (``group_left``/``group_right``)
— semantics pinned on hand-built frames (the DuckDB oracle covers the
registry arms; these cover the matching rules, label copying, absent-
label groups, comparisons, and the didactic rejection matrix).

Prometheus reference semantics: prometheus/prometheus
promql/engine.go VectorBinop many-to-one matching; the reference
engine itself rejects all binary ops
(src/ingestors/http/simple_promql.rs:149-171), so this whole surface
is beyond-reference polish.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.query.promql_ext import (
    PromQLError,
    evaluate_binary,
    parse_extended_expr,
)

T0 = dt.datetime(2024, 1, 1)
NOW = T0 + dt.timedelta(minutes=30)

# (sensor_id, metric, labels, value) — one instant sample per series.
SERIES = [
    ("req/u1", "req", {"user": "u1", "team": "a"}, 15.0),
    ("req/u2", "req", {"user": "u2", "team": "a"}, 2.0),
    ("req/u3", "req", {"user": "u3", "team": "b"}, 25.0),
    ("req/u4", "req", {"user": "u4"}, 4.0),  # no team label
    ("cap/c1", "cap", {"team": "a"}, 10.0),
    ("cap/c2", "cap", {"team": "b"}, 20.0),
    ("cap/c3", "cap", {}, 30.0),  # the absent-team capacity
    ("info/u1", "info", {"user": "u1", "owner": "alice"}, 1.0),
    ("info/u2", "info", {"user": "u2", "owner": "bob"}, 1.0),
    ("info/u3", "info", {"user": "u3", "owner": "carol"}, 1.0),
    ("info/u4", "info", {"user": "u4"}, 1.0),  # no owner label
]


@pytest.fixture(scope="module")
def frames(spark):
    sensors = spark.createDataFrame(
        [(sid, m, "Float", None, None, lbls) for sid, m, lbls, _ in SERIES],
        "sensor_id string, name string, type string, unit string, "
        "unit_description string, labels map<string,string>",
    )
    vals = spark.createDataFrame(
        [(sid, T0, v, i) for i, (sid, _, _, v) in enumerate(SERIES)],
        "sensor_id string, time timestamp, value double, event_id long",
    )
    return sensors, vals


def _run(frames, expr):
    sensors, vals = frames
    out = evaluate_binary(
        sensors, vals, parse_extended_expr(expr, now=NOW)
    )
    return sorted((r.labels, r.value) for r in out.collect())


def test_group_left_aggregated_one_side(frames):
    """Each req series divides by its team's single capacity sum;
    the team-less series matches the empty-label group (Prometheus
    absent ≡ "")."""
    got = _run(frames, "req * on (team) group_left sum by (team) (cap)")
    assert got == [
        ('team="a",user="u1"', 150.0),
        ('team="a",user="u2"', 20.0),
        ('team="b",user="u3"', 500.0),
        ('user="u4"', 120.0),
    ]


def test_group_right_mirrors(frames):
    got = _run(frames, "sum by (team) (cap) * on (team) group_right req")
    assert got == [
        ('team="a",user="u1"', 150.0),
        ('team="a",user="u2"', 20.0),
        ('team="b",user="u3"', 500.0),
        ('user="u4"', 120.0),
    ]


def test_group_left_copies_labels_from_info_metric(frames):
    """The info-metric pattern: group_left(owner) stamps each result
    with the one side's owner label; a series whose info row lacks the
    label gets NO owner entry (empty ≡ removed, Prometheus)."""
    got = _run(frames, "req * on (user) group_left(owner) info")
    assert got == [
        ('owner="alice",team="a",user="u1"', 15.0),
        ('owner="bob",team="a",user="u2"', 2.0),
        ('owner="carol",team="b",user="u3"', 25.0),
        ('user="u4"', 4.0),
    ]


def test_group_left_copied_label_wins_collision(frames):
    """A copied label overrides the many side's own value for that key
    (deterministic one-side-wins, never a map_concat duplicate error).
    Copying ``user`` over itself is the degenerate collision."""
    got = _run(frames, "req * on (user) group_left(user) info")
    assert ('team="a",user="u1"', 15.0) in got


def test_group_duplicate_one_side_keys_raise(frames):
    """A non-unique "one" side raises at execution (Prometheus: "found
    duplicate series for the match group") instead of silently
    multiplying many-side rows. All four info series lack a team
    label, so they collide on the empty-team match key that req/u4
    joins."""
    sensors, vals = frames
    out = evaluate_binary(
        sensors,
        vals,
        parse_extended_expr("req * on (team) group_left info", now=NOW),
    )
    with pytest.raises(Exception, match="duplicate series"):
        out.collect()


def test_group_comparison_filters_keeping_left_value(frames):
    got = _run(frames, "req > on (team) group_left sum by (team) (cap)")
    assert got == [
        ('team="a",user="u1"', 15.0),
        ('team="b",user="u3"', 25.0),
    ]


def test_group_comparison_bool_mode(frames):
    got = _run(
        frames, "req > bool on (team) group_left sum by (team) (cap)"
    )
    assert got == [
        ('team="a",user="u1"', 1.0),
        ('team="a",user="u2"', 0.0),
        ('team="b",user="u3"', 1.0),
        ('user="u4"', 0.0),
    ]


@pytest.mark.parametrize(
    "expr, fragment",
    [
        ("req / group_left cap", "requires an explicit matching clause"),
        ("req and on (user) group_left info", "set operations"),
        (
            "sum(req) / on (team) group_left sum by (team) (cap)",
            '"many" side must be a series vector',
        ),
        (
            "req / on (team) group_left sum by (user) (cap)",
            "EXACTLY the 'on",
        ),
        (
            "req / on (team) group_left(owner) sum by (team) (cap)",
            "nothing extra to copy",
        ),
        (
            "req / ignoring (user) group_left sum by (team) (cap)",
            "needs 'on",
        ),
        ("2 / on (team) group_left cap", "scalar operand"),
    ],
)
def test_group_rejection_matrix(frames, expr, fragment):
    sensors, vals = frames
    with pytest.raises(PromQLError, match="") as exc:
        evaluate_binary(
            sensors, vals, parse_extended_expr(expr, now=NOW)
        )
    assert fragment in str(exc.value)
