"""Simple-PromQL selector parser (operators P1/P2).

Accepts exactly what the reference accepts
(src/ingestors/http/simple_promql.rs:83-231):

* ``VectorSelector`` — ``metric``, ``metric{l="v", l2!="v", l3=~"re",
  l4!~"re"}``, ``{l="v"}``; instant queries get the default 1-hour
  lookback window ``[now-1h, now]`` (DEFAULT_LOOKBACK_MS,
  simple_promql.rs:25);
* ``MatrixSelector`` — ``selector[5m]`` → window ``[now-range, now]``;
* parenthesized selectors are unwrapped (simple_promql.rs:162-165);

and rejects — with the reference's didactic messages
(simple_promql.rs:149-171) — aggregations, function calls, binary and
unary operations, subqueries, and bare literals. Trailing content after
a full selector is an error (simple_promql.rs:90-95).

This is a hand-written scanner, not a grammar port: the accepted
language is tiny and the rejected classes only need classification.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass

from sensapp_spark.operators.matchers import LabelMatcher, MatcherType

DEFAULT_LOOKBACK_MS = 3600 * 1000

AGGREGATION_FUNCS = frozenset(
    "sum min max avg group stddev stdvar count count_values bottomk topk "
    "quantile limitk limit_ratio".split()
)

_METRIC_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")
_LABEL_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
_NUMBER_RE = re.compile(r"[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?|\.[0-9]+|0x[0-9a-fA-F]+")
_DURATION_RE = re.compile(r"([0-9]+(?:\.[0-9]+)?)(ms|s|m|h|d|w|y)")
_BINARY_OPS = ("+", "-", "*", "/", "%", "^", "==", "!=", ">=", "<=", ">", "<")
_KEYWORD_OPS = ("and", "or", "unless")

_DUR_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
           "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000}

_MATCH_OPS = (("=~", MatcherType.REGEX_MATCH), ("!~", MatcherType.REGEX_NOT_MATCH),
              ("!=", MatcherType.NOT_EQUAL), ("=", MatcherType.EQUAL))

SELECTOR_HINT = (
    "Only simple selectors like 'metric_name{label=\"value\"}' or "
    "'metric_name[5m]' are supported."
)


class PromQLError(ValueError):
    """HTTP-400-class parse/rejection error; ``kind`` names the rejected
    expression class for tests and error routing."""

    def __init__(self, kind: str, message: str):
        super().__init__(message)
        self.kind = kind


@dataclass
class ParsedQuery:
    """The reference's internal IR (simple_promql.rs:75-80)."""

    matchers: list[LabelMatcher]
    start_time: dt.datetime | None
    end_time: dt.datetime | None


class _Scanner:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def rest(self) -> str:
        return self.text[self.pos:]

    def match_re(self, pattern: re.Pattern) -> str | None:
        m = pattern.match(self.text, self.pos)
        if m:
            self.pos = m.end()
            return m.group(0)
        return None

    def expect(self, ch: str, context: str) -> None:
        if self.peek() != ch:
            raise PromQLError(
                "parse", f"Failed to parse PromQL query: expected '{ch}' {context}"
            )
        self.pos += 1

    def string_literal(self) -> str:
        quote = self.peek()
        if quote not in "\"'`":
            raise PromQLError(
                "parse", "Failed to parse PromQL query: expected string literal"
            )
        self.pos += 1
        out = []
        while True:
            if self.pos >= len(self.text):
                raise PromQLError(
                    "parse", "Failed to parse PromQL query: unterminated string"
                )
            c = self.text[self.pos]
            if c == "\\" and quote != "`":
                self.pos += 1
                esc = self.text[self.pos] if self.pos < len(self.text) else ""
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                self.pos += 1
                continue
            if c == quote:
                self.pos += 1
                return "".join(out)
            out.append(c)
            self.pos += 1


def _parse_label_matchers(sc: _Scanner) -> list[LabelMatcher]:
    """Parse ``{name op "value", ...}`` — scanner is positioned at '{'."""
    sc.expect("{", "to open label matchers")
    matchers: list[LabelMatcher] = []
    sc.skip_ws()
    if sc.peek() == "}":
        sc.pos += 1
        return matchers
    while True:
        sc.skip_ws()
        name = sc.match_re(_LABEL_RE)
        if name is None:
            raise PromQLError(
                "parse", "Failed to parse PromQL query: expected label name"
            )
        sc.skip_ws()
        for op_text, op in _MATCH_OPS:
            if sc.rest().startswith(op_text):
                sc.pos += len(op_text)
                break
        else:
            raise PromQLError(
                "parse", "Failed to parse PromQL query: expected matcher operator"
            )
        sc.skip_ws()
        value = sc.string_literal()
        matchers.append(LabelMatcher(name, value, op))
        sc.skip_ws()
        if sc.peek() == ",":
            sc.pos += 1
            continue
        sc.expect("}", "to close label matchers")
        return matchers


def _range_ms(sc: _Scanner) -> int:
    """Parse ``[5m]`` (scanner at '['); a ':' inside is a subquery."""
    sc.expect("[", "to open range")
    total = 0
    saw = False
    while True:
        sc.skip_ws()
        m = _DURATION_RE.match(sc.text, sc.pos)
        if not m:
            break
        sc.pos = m.end()
        total += int(float(m.group(1)) * _DUR_MS[m.group(2)])
        saw = True
    sc.skip_ws()
    if sc.peek() == ":":
        raise PromQLError(
            "subquery", f"Subqueries are not supported. {SELECTOR_HINT}"
        )
    if not saw:
        raise PromQLError("parse", "Failed to parse PromQL query: bad range")
    sc.expect("]", "to close range")
    return total


def parse_promql_query(
    query: str, now: dt.datetime | None = None
) -> ParsedQuery:
    now = now or dt.datetime.now(dt.timezone.utc)
    sc = _Scanner(query)
    sc.skip_ws()

    # Parenthesized selector: unwrap and re-parse the inside, then demand
    # nothing but whitespace after the closing paren.
    if sc.peek() == "(":
        depth, start = 0, sc.pos
        for i in range(sc.pos, len(sc.text)):
            if sc.text[i] == "(":
                depth += 1
            elif sc.text[i] == ")":
                depth -= 1
                if depth == 0:
                    inner = sc.text[start + 1:i]
                    trailing = sc.text[i + 1:]
                    if trailing.strip():
                        _reject_trailing(trailing)
                    return parse_promql_query(inner, now)
        raise PromQLError("parse", "Failed to parse PromQL query: unbalanced '('")

    # Unary operations. (peek() is "" at EOF — guard the substring check.)
    if sc.peek() and sc.peek() in "+-":
        raise PromQLError(
            "unary", f"Unary operations are not supported. {SELECTOR_HINT}"
        )

    # Literals.
    if sc.peek() and sc.peek() in "\"'`":
        sc.string_literal()
        raise PromQLError(
            "literal",
            "Literal values are not valid queries. Use a metric selector "
            "like 'metric_name{label=\"value\"}'.",
        )
    num = sc.match_re(_NUMBER_RE)
    if num is not None:
        raise PromQLError(
            "literal",
            "Literal values are not valid queries. Use a metric selector "
            "like 'metric_name{label=\"value\"}'.",
        )

    # Metric name (optional when {matchers} present).
    name = sc.match_re(_METRIC_RE)
    sc.skip_ws()

    if name is not None and sc.peek() == "(":
        if name in AGGREGATION_FUNCS:
            raise PromQLError(
                "aggregation",
                "Aggregation expressions (like sum(), avg(), count()) are "
                f"not supported. {SELECTOR_HINT}",
            )
        raise PromQLError(
            "call",
            "Function calls (like rate(), increase(), histogram_quantile()) "
            f"are not supported. {SELECTOR_HINT}",
        )

    matchers: list[LabelMatcher] = []
    if name is not None:
        if name in _KEYWORD_OPS:
            raise PromQLError(
                "parse", "Failed to parse PromQL query: selector expected"
            )
        matchers.append(LabelMatcher("__name__", name, MatcherType.EQUAL))
    if sc.peek() == "{":
        matchers.extend(_parse_label_matchers(sc))
    if name is None and not matchers:
        raise PromQLError("parse", "Failed to parse PromQL query: empty selector")

    sc.skip_ws()
    range_ms: int | None = None
    if sc.peek() == "[":
        range_ms = _range_ms(sc)

    sc.skip_ws()
    if sc.rest():
        _reject_trailing(sc.rest())

    if not matchers:
        raise PromQLError(
            "empty", "Query must have at least one matcher (metric name or label)"
        )

    lookback = range_ms if range_ms is not None else DEFAULT_LOOKBACK_MS
    return ParsedQuery(
        matchers=matchers,
        start_time=now - dt.timedelta(milliseconds=lookback),
        end_time=now,
    )


def _reject_trailing(rest: str) -> None:
    stripped = rest.strip()
    for kw in _KEYWORD_OPS:
        if stripped == kw or stripped.startswith(kw + " "):
            raise PromQLError(
                "binary",
                f"Binary operations (like +, -, *, /) are not supported. "
                f"{SELECTOR_HINT}",
            )
    if stripped.startswith(_BINARY_OPS):
        raise PromQLError(
            "binary",
            f"Binary operations (like +, -, *, /) are not supported. "
            f"{SELECTOR_HINT}",
        )
    if stripped.startswith("offset"):
        raise PromQLError(
            "parse", f"Unexpected trailing content in query: '{stripped}'"
        )
    raise PromQLError(
        "parse", f"Unexpected trailing content in query: '{stripped}'"
    )
