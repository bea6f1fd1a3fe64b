"""Prometheus-style label matchers compiled to Catalyst Column expressions.

Semantics follow reference src/storage/query.rs:12-35 exactly:

* ``Equal``         — sensor HAS the label and value equals
* ``NotEqual``      — value differs *or the label is absent* (query.rs:18-22)
* ``RegexMatch``    — sensor HAS the label and value matches
* ``RegexNotMatch`` — value doesn't match *or the label is absent*
  (query.rs:31-34)
* ``__name__`` is reserved for the sensor/metric name (query.rs:61,137-141)
* multiple matchers are AND-ed (query.rs:79-90)
* zero matchers select nothing (src/storage/sqlite/storage.rs:437-440)

The reference compiles these to dynamic SQL with dictionary-table
semi/anti-join subqueries (src/storage/sqlite/matchers.rs:30-161). Here the
sensors dimension carries a ``labels MAP<STRING,STRING>`` column, so each
matcher is a single Column predicate — Catalyst folds the AND-chain into one
scan filter, and on Parquet the ``name`` predicates push down to the reader.

Regex dialect note (SURVEY §7.4): the reference uses Rust ``regex`` via
SQLite REGEXP / PG ``~`` — *unanchored search* semantics. Spark's ``rlike``
is also unanchored Java regex, so common Prometheus patterns behave the
same; the conformance tests in tests/test_matchers.py cover the corpus from
reference tests/query_sensors_by_labels.rs.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NAME_LABEL = "__name__"


class MatcherType(Enum):
    EQUAL = "="
    NOT_EQUAL = "!="
    REGEX_MATCH = "=~"
    REGEX_NOT_MATCH = "!~"


@dataclass(frozen=True)
class LabelMatcher:
    """One matcher; reference src/storage/query.rs:37-76."""

    name: str
    value: str
    matcher_type: MatcherType = MatcherType.EQUAL

    @property
    def is_name_matcher(self) -> bool:
        return self.name == NAME_LABEL


def _name_predicate(m: LabelMatcher) -> Column:
    col = F.col("name")
    if m.matcher_type is MatcherType.EQUAL:
        return col == m.value
    if m.matcher_type is MatcherType.NOT_EQUAL:
        return col != m.value
    if m.matcher_type is MatcherType.REGEX_MATCH:
        return col.rlike(m.value)
    return ~col.rlike(m.value)


def _label_predicate(m: LabelMatcher, labels_col: str) -> Column:
    val = F.element_at(F.col(labels_col), F.lit(m.name))  # NULL when absent
    if m.matcher_type is MatcherType.EQUAL:
        # Absent label never equals (query.rs:14-16): NULL-safe false.
        return val.eqNullSafe(F.lit(m.value))
    if m.matcher_type is MatcherType.NOT_EQUAL:
        # Matches when label absent OR value differs (query.rs:18-22).
        return val.isNull() | (val != F.lit(m.value))
    if m.matcher_type is MatcherType.REGEX_MATCH:
        # Absent label never matches (query.rs:24-29).
        return F.coalesce(val.rlike(m.value), F.lit(False))
    # RegexNotMatch: matches when absent OR not matching (query.rs:31-34).
    return val.isNull() | ~val.rlike(m.value)


def matcher_column(m: LabelMatcher, labels_col: str = "labels") -> Column:
    """Compile one matcher to a Column predicate over (name, labels)."""
    if m.is_name_matcher:
        return _name_predicate(m)
    return _label_predicate(m, labels_col)


def matchers_predicate(
    matchers: list[LabelMatcher], labels_col: str = "labels"
) -> Column:
    """AND-fold all matchers; empty list yields FALSE (Prometheus behavior,
    reference src/storage/sqlite/storage.rs:437-440)."""
    if not matchers:
        return F.lit(False)
    pred = matcher_column(matchers[0], labels_col)
    for m in matchers[1:]:
        pred = pred & matcher_column(m, labels_col)
    return pred


def partition_matchers(
    matchers: list[LabelMatcher],
) -> tuple[list[LabelMatcher], list[LabelMatcher]]:
    """Split ``__name__`` matchers from label matchers (query.rs:137-141)."""
    name = [m for m in matchers if m.is_name_matcher]
    label = [m for m in matchers if not m.is_name_matcher]
    return name, label


def apply_matchers(
    sensors: DataFrame,
    matchers: list[LabelMatcher],
    labels_col: str = "labels",
) -> DataFrame:
    """In-memory matching over an already-loaded sensors frame
    (reference src/ingestors/http/crud.rs:144-182, operator Q10)."""
    return sensors.filter(matchers_predicate(matchers, labels_col))
