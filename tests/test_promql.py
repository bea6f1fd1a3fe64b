"""PromQL selector parser tests — ports the accept/reject matrix from
reference src/ingestors/http/simple_promql.rs:326-453."""

from __future__ import annotations

import datetime as dt

import pytest

from sensapp_spark.operators.matchers import MatcherType
from sensapp_spark.query.promql import (
    DEFAULT_LOOKBACK_MS,
    PromQLError,
    parse_promql_query,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)


def parse(q):
    return parse_promql_query(q, now=NOW)


def kinds(q):
    with pytest.raises(PromQLError) as e:
        parse(q)
    return e.value.kind, str(e.value)


def test_simple_metric_name():
    p = parse("my_metric")
    assert len(p.matchers) == 1
    m = p.matchers[0]
    assert (m.name, m.value, m.matcher_type) == (
        "__name__", "my_metric", MatcherType.EQUAL)


def test_instant_query_lookback_window():
    p = parse("my_metric")
    assert p.end_time == NOW
    assert p.start_time == NOW - dt.timedelta(milliseconds=DEFAULT_LOOKBACK_MS)


def test_metric_with_labels():
    p = parse('my_metric{env="prod",region="us"}')
    assert len(p.matchers) == 3
    assert p.matchers[0].name == "__name__"
    assert p.matchers[1].name == "env" and p.matchers[1].value == "prod"


def test_matrix_selector():
    p = parse("my_metric[5m]")
    assert len(p.matchers) == 1
    assert p.end_time == NOW
    assert p.start_time == NOW - dt.timedelta(minutes=5)


def test_matrix_with_labels():
    p = parse('http_requests{method="GET"}[10m]')
    assert len(p.matchers) == 2
    assert p.start_time == NOW - dt.timedelta(minutes=10)


def test_labels_only_selector():
    p = parse('{env="prod"}')
    assert len(p.matchers) == 1
    assert p.matchers[0].name == "env"


def test_all_matcher_operators():
    p = parse('m{a="1", b!="2", c=~"x.*", d!~"y.*"}')
    ops = [m.matcher_type for m in p.matchers[1:]]
    assert ops == [MatcherType.EQUAL, MatcherType.NOT_EQUAL,
                   MatcherType.REGEX_MATCH, MatcherType.REGEX_NOT_MATCH]


def test_paren_unwrapped():
    p = parse('(my_metric{env="prod"})')
    assert len(p.matchers) == 2


def test_reject_aggregation():
    kind, msg = kinds("sum(my_metric)")
    assert kind == "aggregation" and "Aggregation" in msg


def test_reject_function_call():
    kind, msg = kinds("rate(my_metric[5m])")
    assert kind == "call" and "Function" in msg


def test_reject_binary_operation():
    kind, msg = kinds("my_metric + 1")
    assert kind == "binary" and "Binary" in msg
    assert kinds("a and b")[0] == "binary"
    assert kinds("x == 3")[0] == "binary"


def test_reject_unary():
    kind, msg = kinds("-my_metric")
    assert kind == "unary" and "Unary" in msg


def test_reject_literals():
    assert kinds("42")[0] == "literal"
    assert kinds('"hello"')[0] == "literal"


def test_reject_subquery():
    kind, msg = kinds("my_metric[5m:1m]")
    assert kind == "subquery" and "Subqueries" in msg


def test_reject_trailing_garbage():
    kind, msg = kinds("my_metric garbage")
    assert kind == "parse" and "trailing" in msg.lower()


def test_reject_empty_and_invalid():
    assert kinds("")[0] == "parse"
    assert kinds("{}")[0] == "parse"


def test_duration_units():
    for unit, ms in [("ms", 1), ("s", 1000), ("m", 60000), ("h", 3600000),
                     ("d", 86400000), ("w", 604800000), ("y", 31536000000)]:
        p = parse(f"m[2{unit}]")
        assert p.start_time == NOW - dt.timedelta(milliseconds=2 * ms), unit


def test_compound_duration():
    p = parse("m[1h30m]")
    assert p.start_time == NOW - dt.timedelta(minutes=90)
