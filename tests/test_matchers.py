"""Matcher-semantics conformance corpus — port of reference
tests/query_sensors_by_labels.rs (FIXTURES.md §F8) and the absent-label
semantics of src/storage/query.rs:12-35."""

from __future__ import annotations

import pytest

from sensapp_spark.datamodel.types import SENSOR_SCHEMA
from sensapp_spark.operators import LabelMatcher, MatcherType, matchers_predicate
from sensapp_spark.operators.matchers import apply_matchers, partition_matchers
from sensapp_spark.operators.selection import select_sensors

E, NE, RE, NRE = (
    MatcherType.EQUAL,
    MatcherType.NOT_EQUAL,
    MatcherType.REGEX_MATCH,
    MatcherType.REGEX_NOT_MATCH,
)


@pytest.fixture(scope="module")
def sensors(spark):
    rows = [
        ("u1", "cpu_usage", "Float", None, None, {"env": "prod", "region": "us-east"}),
        ("u2", "cpu_usage", "Float", None, None, {"env": "dev", "region": "us-west"}),
        ("u3", "cpu_usage", "Float", None, None, {"env": "prod", "region": "eu-central"}),
        ("u4", "mem_usage", "Integer", None, None, {"env": "prod"}),
        ("u5", "disk.io", "Float", None, None, {}),  # no labels at all
        ("u6", "Mem_Usage", "String", None, None, {"env": "Prod"}),  # case variants
    ]
    return spark.createDataFrame(rows, SENSOR_SCHEMA).cache()


def ids(df):
    return sorted(r.sensor_id for r in df.select("sensor_id").collect())


def match(sensors, *matchers):
    return ids(apply_matchers(sensors, list(matchers)))


def test_name_equal(sensors):
    assert match(sensors, LabelMatcher("__name__", "cpu_usage", E)) == ["u1", "u2", "u3"]


def test_name_not_equal(sensors):
    assert match(sensors, LabelMatcher("__name__", "cpu_usage", NE)) == ["u4", "u5", "u6"]


def test_name_regex(sensors):
    assert match(sensors, LabelMatcher("__name__", "^cpu.*", RE)) == ["u1", "u2", "u3"]


def test_name_regex_unanchored_search(sensors):
    # Rust regex is_match does substring search; rlike must behave the same.
    assert match(sensors, LabelMatcher("__name__", "usage", RE)) == ["u1", "u2", "u3", "u4"]


def test_name_regex_not(sensors):
    assert match(sensors, LabelMatcher("__name__", "usage", NRE)) == ["u5", "u6"]


def test_name_case_sensitive(sensors):
    assert match(sensors, LabelMatcher("__name__", "mem_usage", E)) == ["u4"]
    assert match(sensors, LabelMatcher("__name__", "(?i)mem_usage", RE)) == ["u4", "u6"]


def test_regex_special_chars(sensors):
    # '.' is a metachar: 'disk.io' matches 'disk.io' but so would 'diskxio';
    # escaped form matches only the literal.
    assert match(sensors, LabelMatcher("__name__", r"disk\.io", RE)) == ["u5"]


def test_label_equal(sensors):
    assert match(sensors, LabelMatcher("env", "prod", E)) == ["u1", "u3", "u4"]


def test_label_equal_absent_never_matches(sensors):
    # u5 has no labels: Equal must not match it (query.rs:14-16).
    assert match(sensors, LabelMatcher("env", "prod", E)) == ["u1", "u3", "u4"]
    assert match(sensors, LabelMatcher("nonexistent", "x", E)) == []


def test_label_not_equal_includes_absent(sensors):
    # NotEqual matches sensors lacking the label (query.rs:18-22).
    assert match(sensors, LabelMatcher("env", "prod", NE)) == ["u2", "u5", "u6"]


def test_label_regex(sensors):
    assert match(sensors, LabelMatcher("region", "^us-", RE)) == ["u1", "u2"]


def test_label_regex_absent_never_matches(sensors):
    assert match(sensors, LabelMatcher("region", ".*", RE)) == ["u1", "u2", "u3"]


def test_label_regex_not_includes_absent(sensors):
    # RegexNotMatch matches absent-label sensors (query.rs:31-34).
    assert match(sensors, LabelMatcher("region", "^us-", NRE)) == ["u3", "u4", "u5", "u6"]


def test_combined_and(sensors):
    assert match(
        sensors,
        LabelMatcher("__name__", "cpu_usage", E),
        LabelMatcher("env", "prod", E),
        LabelMatcher("region", "^us-", RE),
    ) == ["u1"]


def test_empty_matchers_select_nothing(sensors):
    # Prometheus behavior (storage.rs:437-440).
    assert match(sensors) == []


def test_numeric_only(sensors):
    out = select_sensors(sensors, [LabelMatcher("__name__", ".*usage", RE)],
                         numeric_only=True)
    assert ids(out) == ["u1", "u2", "u3", "u4"]  # u6 is String → excluded


def test_partition_matchers():
    ms = [LabelMatcher("__name__", "a", E), LabelMatcher("env", "b", E)]
    name, label = partition_matchers(ms)
    assert [m.name for m in name] == ["__name__"]
    assert [m.name for m in label] == ["env"]


def test_predicate_is_catalyst_only(sensors):
    # The whole matcher stack compiles to a single filter — no UDFs, no
    # extra exchanges in the plan.
    df = apply_matchers(sensors, [LabelMatcher("env", "prod", NE),
                                  LabelMatcher("__name__", "u", RE)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan
