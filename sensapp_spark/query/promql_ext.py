"""Extended PromQL evaluation — the expression classes the reference
REJECTS (src/ingestors/http/simple_promql.rs:149-171), implemented as
DataFrame plans behind an explicit opt-in.

The base parser (query/promql.py) reproduces the reference's rejection
matrix byte-for-byte and stays the default. This module adds what
SURVEY §2.8 lists as the "free wins": range functions
(``rate(m[5m])``, ``increase``, ``delta``, ``*_over_time``) and
aggregation operators (``sum/avg/min/max/count``, with ``by (label,…)``
grouping in either PromQL position). Grammar is deliberately the
Prometheus *core*: one optional aggregation over one optional range
function over one selector — no binary ops, no subqueries; anything
else still raises the didactic ``PromQLError``.

Evaluation shapes (all single-shuffle, map-side partial aggregates):

* range function → ``groupBy(sensor_id)`` over the selector window;
  ``rate``/``increase`` use ``max_by/min_by`` (first/last sample), the
  ``*_over_time`` family maps to the matching Spark aggregate.
* instant selector → last sample per series (``max_by(value, time)``).
* aggregation → second ``groupBy`` over ``element_at(labels, k)`` keys —
  by then the frame is one row per *series*, so this shuffle is
  dimension-sized, not sample-sized.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.operators.selection import select_sensors, time_range
from sensapp_spark.query.promql import (
    ParsedQuery,
    PromQLError,
    parse_promql_query,
)

RANGE_FUNCS = frozenset(
    "rate increase delta avg_over_time sum_over_time min_over_time "
    "max_over_time count_over_time last_over_time".split()
)
AGG_OPS = frozenset("sum avg min max count".split())

_NAME_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")


@dataclass
class ExtendedQuery:
    selector: ParsedQuery
    func: str | None = None
    agg: str | None = None
    by: list[str] = field(default_factory=list)


def _strip_parens(s: str) -> tuple[str, str]:
    """``s`` starts at '('; return (inner, trailing) respecting quoted
    strings (label values may contain parentheses)."""
    assert s[0] == "("
    depth, quote, i = 0, "", 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\" and quote != "`":
                i += 2
                continue
            if c == quote:
                quote = ""
        elif c in "\"'`":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[1:i], s[i + 1:]
        i += 1
    raise PromQLError("parse", "Failed to parse PromQL query: unbalanced '('")


def _parse_by(rest: str) -> tuple[list[str], str]:
    rest = rest.lstrip()
    if not rest.startswith("("):
        raise PromQLError(
            "parse", "Failed to parse PromQL query: expected '(' after 'by'"
        )
    inner, trailing = _strip_parens(rest)
    labels = [x.strip() for x in inner.split(",") if x.strip()]
    for lbl in labels:
        if not _NAME_RE.fullmatch(lbl):
            raise PromQLError(
                "parse", f"Failed to parse PromQL query: bad label '{lbl}'"
            )
    return labels, trailing


def parse_extended(query: str, now: dt.datetime | None = None) -> ExtendedQuery:
    """Parse selector | FUNC(matrix-selector) | AGG [by (…)] ( inner )."""
    now = now or dt.datetime.now(dt.timezone.utc)
    s = query.strip()
    m = _NAME_RE.match(s)
    head = m.group(0) if m else None
    rest = s[m.end():].lstrip() if m else s

    if head in AGG_OPS and (rest.startswith("(") or rest.startswith("by")):
        by: list[str] = []
        if rest.startswith("by"):
            by, rest = _parse_by(rest[2:])
            rest = rest.lstrip()
        if not rest.startswith("("):
            raise PromQLError(
                "parse",
                f"Failed to parse PromQL query: expected '(' after '{head}'",
            )
        inner, trailing = _strip_parens(rest)
        trailing = trailing.strip()
        if trailing.startswith("by"):
            if by:
                raise PromQLError(
                    "parse", "Failed to parse PromQL query: duplicate 'by'"
                )
            by, trailing = _parse_by(trailing[2:])
            trailing = trailing.strip()
        if trailing:
            raise PromQLError(
                "parse",
                f"Unexpected trailing content in query: '{trailing}'",
            )
        sub = parse_extended(inner, now)
        if sub.agg is not None:
            raise PromQLError(
                "aggregation", "Nested aggregations are not supported."
            )
        return ExtendedQuery(
            selector=sub.selector, func=sub.func, agg=head, by=by
        )

    if head in RANGE_FUNCS and rest.startswith("("):
        inner, trailing = _strip_parens(rest)
        if trailing.strip():
            raise PromQLError(
                "parse",
                f"Unexpected trailing content in query: '{trailing.strip()}'",
            )
        if "[" not in inner:
            raise PromQLError(
                "call",
                f"{head}() requires a range vector — e.g. {head}(metric[5m]).",
            )
        return ExtendedQuery(selector=parse_promql_query(inner, now), func=head)

    return ExtendedQuery(selector=parse_promql_query(query, now))


_OVER_TIME = {
    "avg_over_time": F.avg,
    "sum_over_time": F.sum,
    "min_over_time": F.min,
    "max_over_time": F.max,
    "count_over_time": F.count,
}


def evaluate_extended(
    sensors: DataFrame, values: DataFrame, eq: ExtendedQuery
) -> DataFrame:
    """Evaluate to an instant vector: ``(sensor_id, name, labels, value)``
    — or, aggregated, one row per ``by``-group: ``(*by, value)``."""
    q = eq.selector
    selected = select_sensors(sensors, q.matchers)
    scan = values.join(F.broadcast(selected.select("sensor_id")), "sensor_id",
                       "leftsemi")
    scan = time_range(scan, q.start_time, q.end_time)

    if eq.func is None:
        per_series = scan.groupBy("sensor_id").agg(
            F.max_by("value", "time").alias("value")
        )
    elif eq.func in ("rate", "increase", "delta"):
        span = (F.unix_micros(F.max("time")) - F.unix_micros(F.min("time"))) / 1e6
        rise = F.max_by("value", "time") - F.min_by("value", "time")
        value = rise / span if eq.func == "rate" else rise
        per_series = (
            scan.groupBy("sensor_id")
            .agg(value.alias("value"), span.alias("__span"))
            .filter(F.col("__span") > 0)
            .drop("__span")
        )
    elif eq.func == "last_over_time":
        per_series = scan.groupBy("sensor_id").agg(
            F.max_by("value", "time").alias("value")
        )
    else:
        agg_fn = _OVER_TIME[eq.func]
        per_series = scan.groupBy("sensor_id").agg(
            agg_fn("value").cast("double").alias("value")
        )

    out = per_series.join(
        F.broadcast(selected.select("sensor_id", "name", "labels")), "sensor_id"
    )
    if eq.agg is None:
        return out.select("sensor_id", "name", "labels", "value")

    keys = [
        F.element_at(F.col("labels"), lbl).alias(lbl) for lbl in eq.by
    ]
    agg_col = {
        "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
        "count": F.count,
    }[eq.agg]("value")
    if eq.agg == "count":
        agg_col = agg_col.cast("long")
    grouped = out.groupBy(*keys) if keys else out.groupBy()
    return grouped.agg(agg_col.alias("value"))
