"""Prometheus remote-read handler (operators P3/P4, X6).

Reference src/ingestors/http/prometheus_read.rs:105-233 and
src/parsing/prometheus/converter.rs:22-120:

* body: snappy protobuf ``ReadRequest``; per query: matchers
  (proto→internal, src/storage/query.rs:156-176), start/end ms, and
  ``numeric_only=true`` selection;
* response (SAMPLES): per query, one ``TimeSeries`` per sensor with
  labels ``__name__`` + sorted label pairs, samples cast to f64
  (Integer→f64, Numeric lossy f64; non-numeric series are skipped);
* samples are ordered by time; timestamps converted back to ms.

The scan/selection runs as the standard distributed Q1-Q9 pipeline;
only the response serialization is driver-side (as in the reference).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.operators.selection import query_samples
from sensapp_spark.wire import snappy_codec
from sensapp_spark.wire.prompb import (
    ReadQuery,
    TimeSeries,
    decode_read_request,
    encode_read_response,
)

NUMERIC_TYPES = (SensorType.INTEGER, SensorType.NUMERIC, SensorType.FLOAT)


def execute_read_queries(
    queries: list[ReadQuery],
    sensors: DataFrame,
    values_for: Callable[[SensorType], DataFrame],
    limit: int | None = None,
) -> list[list[TimeSeries]]:
    """Run each query through the Q1-Q9 pipeline over the three numeric
    value tables and assemble protobuf-ready series."""
    results: list[list[TimeSeries]] = []
    for q in queries:
        start = dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=q.start_ms)
        end = dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=q.end_ms)
        per_series: dict[str, TimeSeries] = {}
        for stype in NUMERIC_TYPES:
            vals = values_for(stype)
            if vals is None:
                continue
            out = query_samples(
                sensors, vals, q.matchers,
                start=start, end=end, limit=limit, numeric_only=True,
            ).select(
                "sensor_id", "name", "labels",
                (F.unix_micros("time") / 1000).cast("long").alias("ts_ms"),
                F.col("value").cast("double").alias("value"),  # P4 lossy cast
            )
            for row in out.toLocalIterator():
                series = per_series.get(row.sensor_id)
                if series is None:
                    labels = [("__name__", row.name)] + sorted(
                        (row.labels or {}).items()
                    )
                    series = per_series[row.sensor_id] = TimeSeries(labels=labels)
                series.samples.append((row.value, row.ts_ms))
        results.append([per_series[k] for k in sorted(per_series)])
    return results


def handle_read_request(
    body: bytes,
    sensors: DataFrame,
    values_for: Callable[[SensorType], DataFrame],
    compressed: bool = True,
) -> bytes:
    """ReadRequest bytes → snappy-compressed SAMPLES ReadResponse bytes."""
    raw = snappy_codec.decompress(body) if compressed else body
    queries, _accepted = decode_read_request(raw)
    results = execute_read_queries(queries, sensors, values_for)
    response = encode_read_response(results)
    return snappy_codec.compress(response)
