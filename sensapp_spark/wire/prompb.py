"""Prometheus ``prompb`` message encode/decode over the minimal wire
codec — WriteRequest, ReadRequest, ReadResponse (SAMPLES).

Schemas (public, prometheus/prompb):

* WriteRequest{1: repeated TimeSeries}
* TimeSeries{1: repeated Label, 2: repeated Sample}
* Label{1: name, 2: value} — Sample{1: double value, 2: int64 ts_ms}
* ReadRequest{1: repeated Query, 2: repeated accepted_response_types}
* Query{1: start_ms, 2: end_ms, 3: repeated LabelMatcher}
* LabelMatcher{1: type EQ/NEQ/RE/NRE, 2: name, 3: value}
* ReadResponse{1: repeated QueryResult{1: repeated TimeSeries}}
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sensapp_spark.operators.matchers import LabelMatcher, MatcherType
from sensapp_spark.wire.protowire import (
    Writer,
    fixed64_double,
    iter_fields,
    signed64,
)

MATCHER_TYPES = [
    MatcherType.EQUAL,
    MatcherType.NOT_EQUAL,
    MatcherType.REGEX_MATCH,
    MatcherType.REGEX_NOT_MATCH,
]

RESPONSE_TYPE_SAMPLES = 0
RESPONSE_TYPE_STREAMED_XOR_CHUNKS = 1


@dataclass
class TimeSeries:
    labels: list[tuple[str, str]] = field(default_factory=list)
    samples: list[tuple[float, int]] = field(default_factory=list)  # (value, ts_ms)


@dataclass
class ReadQuery:
    start_ms: int
    end_ms: int
    matchers: list[LabelMatcher] = field(default_factory=list)


# -- decode -----------------------------------------------------------------

def _decode_label(buf: bytes) -> tuple[str, str]:
    name = value = ""
    for f, _, v in iter_fields(buf):
        if f == 1:
            name = v.decode()
        elif f == 2:
            value = v.decode()
    return name, value


def _decode_sample(buf: bytes) -> tuple[float, int]:
    value, ts = 0.0, 0
    for f, _, v in iter_fields(buf):
        if f == 1:
            value = fixed64_double(v)
        elif f == 2:
            ts = signed64(v)
    return value, ts


def _decode_timeseries(buf: bytes) -> TimeSeries:
    ts = TimeSeries()
    for f, _, v in iter_fields(buf):
        if f == 1:
            ts.labels.append(_decode_label(v))
        elif f == 2:
            ts.samples.append(_decode_sample(v))
    return ts


def decode_write_request(buf: bytes) -> list[TimeSeries]:
    return [_decode_timeseries(v) for f, _, v in iter_fields(buf) if f == 1]


def _decode_matcher(buf: bytes) -> LabelMatcher:
    mtype, name, value = 0, "", ""
    for f, _, v in iter_fields(buf):
        if f == 1:
            mtype = v
        elif f == 2:
            name = v.decode()
        elif f == 3:
            value = v.decode()
    return LabelMatcher(name, value, MATCHER_TYPES[mtype])


def _decode_query(buf: bytes) -> ReadQuery:
    q = ReadQuery(0, 0)
    for f, _, v in iter_fields(buf):
        if f == 1:
            q.start_ms = signed64(v)
        elif f == 2:
            q.end_ms = signed64(v)
        elif f == 3:
            q.matchers.append(_decode_matcher(v))
    return q


def decode_read_request(buf: bytes) -> tuple[list[ReadQuery], list[int]]:
    queries: list[ReadQuery] = []
    accepted: list[int] = []
    for f, _, v in iter_fields(buf):
        if f == 1:
            queries.append(_decode_query(v))
        elif f == 2:
            accepted.append(v if isinstance(v, int) else int.from_bytes(v, "little"))
    return queries, accepted


# -- encode -----------------------------------------------------------------

def _encode_timeseries(ts: TimeSeries) -> Writer:
    w = Writer()
    for name, value in ts.labels:
        w.message(1, Writer().string(1, name).string(2, value))
    for value, ts_ms in ts.samples:
        w.message(2, Writer().double(1, value).varint(2, ts_ms))
    return w


def encode_write_request(series: list[TimeSeries]) -> bytes:
    w = Writer()
    for ts in series:
        w.message(1, _encode_timeseries(ts))
    return bytes(w)


def encode_read_request(
    queries: list[ReadQuery], accepted: list[int] | None = None
) -> bytes:
    w = Writer()
    for q in queries:
        qw = Writer().varint(1, q.start_ms).varint(2, q.end_ms)
        for m in q.matchers:
            qw.message(
                3,
                Writer()
                .varint(1, MATCHER_TYPES.index(m.matcher_type))
                .string(2, m.name)
                .string(3, m.value),
            )
        w.message(1, qw)
    for a in accepted or []:
        w.varint(2, a)
    return bytes(w)


def encode_read_response(results: list[list[TimeSeries]]) -> bytes:
    w = Writer()
    for series_list in results:
        rw = Writer()
        for ts in series_list:
            rw.message(1, _encode_timeseries(ts))
        w.message(1, rw)
    return bytes(w)


def decode_read_response(buf: bytes) -> list[list[TimeSeries]]:
    out: list[list[TimeSeries]] = []
    for f, _, v in iter_fields(buf):
        if f == 1:
            out.append(
                [_decode_timeseries(x) for g, _, x in iter_fields(v) if g == 1]
            )
    return out
