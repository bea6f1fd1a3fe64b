"""Arrow IPC exporters (operator X5).

Reference shapes:

* single (src/exporters/arrow/mod.rs:224-250): schema
  ``(timestamp: Timestamp(µs), value: <native type>)``;
* multi "long" (arrow/mod.rs:33-104): ``(timestamp, sensor_id,
  sensor_name, value: Utf8-stringified, type, labels: JSON-string)``.

Spark 4's ``DataFrame.toArrow()`` is the zero-copy interchange path; the
IPC file bytes are produced with pyarrow on the driver. For large exports
use the returned tables' streaming writer or partitioned parquet instead.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.ipc as ipc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.exporters.text import TYPE_TEXT, value_text


def _ipc_bytes(table: pa.Table) -> bytes:
    sink = io.BytesIO()
    with ipc.new_file(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


def to_arrow_single(df: DataFrame, sensor_type: SensorType) -> bytes:
    """``(time, value)`` in native type, time-ordered."""
    out = df.orderBy("time").select(
        F.col("time").alias("timestamp"), "value"
    )
    return _ipc_bytes(out.toArrow())


def _multi_frame(df: DataFrame, sensor_type: SensorType) -> DataFrame:
    return df.orderBy("sensor_id", "time").select(
        F.col("time").alias("timestamp"),
        "sensor_id",
        F.col("name").alias("sensor_name"),
        value_text(F.col("value"), sensor_type).alias("value"),
        F.lit(TYPE_TEXT[sensor_type]).alias("type"),
        F.coalesce(
            F.to_json("labels"), F.lit("{}")
        ).alias("labels"),
    )


def to_arrow_multi(df: DataFrame, sensor_type: SensorType) -> bytes:
    """Long layout with stringified values and JSON labels."""
    return _ipc_bytes(_multi_frame(df, sensor_type).toArrow())


def to_parquet_multi(df: DataFrame, sensor_type: SensorType) -> bytes:
    """The multi layout as a Parquet file (beyond-reference: the
    natural download format for a Spark-native engine — a consumer
    reads it straight back into any engine with types intact). Same
    columns as the Arrow export; ZSTD, single row group for the
    request-sized path (offline exports use the lake's partitioned
    writes instead)."""
    import pyarrow.parquet as pq

    table = _multi_frame(df, sensor_type).toArrow()
    sink = io.BytesIO()
    pq.write_table(table, sink, compression="zstd")
    return sink.getvalue()


def iter_arrow_multi(df: DataFrame, sensor_type: SensorType,
                     chunk_rows: int = 8192):
    """Bounded-memory generator of Arrow IPC *file* bytes for the multi
    layout: rows are pulled through ``toLocalIterator`` (one prefetched
    partition in flight), batched ``chunk_rows`` at a time into record
    batches, and the IPC framing (magic, schema, batches, footer) is
    flushed incrementally through a chunk-capturing sink — the driver
    never holds more than one batch. The result parses identically to
    :func:`to_arrow_multi` (same schema; N record batches instead of 1).

    The timestamp travels as JVM-computed epoch micros (int64) and is
    cast to ``timestamp[us, UTC]`` in Arrow, so the values are
    tz-conversion-free and match the ``toArrow`` path exactly."""
    out = _multi_frame(df, sensor_type).select(
        F.unix_micros("timestamp").alias("ts_us"),
        "sensor_id", "sensor_name", "value", "type", "labels",
    )
    schema = pa.schema([
        ("timestamp", pa.timestamp("us", tz="UTC")),
        ("sensor_id", pa.string()),
        ("sensor_name", pa.string()),
        ("value", pa.string()),
        ("type", pa.string()),
        ("labels", pa.string()),
    ])

    chunks: list[bytes] = []

    class _Sink(io.RawIOBase):
        def writable(self):
            return True

        def write(self, b):
            chunks.append(bytes(b))
            return len(b)

    writer = ipc.new_file(_Sink(), schema)
    buf: list[tuple] = []

    def _flush_batch():
        cols = list(zip(*buf))
        ts = pa.array(cols[0], type=pa.int64()).cast(schema.field(0).type)
        arrays = [ts] + [
            pa.array(cols[i], type=pa.string()) for i in range(1, 6)
        ]
        writer.write_batch(pa.record_batch(arrays, schema=schema))
        buf.clear()

    for row in out.toLocalIterator(prefetchPartitions=True):
        buf.append(tuple(row))
        if len(buf) >= chunk_rows:
            _flush_batch()
            yield b"".join(chunks)
            chunks.clear()
    if buf:
        _flush_batch()
    writer.close()
    if chunks:
        yield b"".join(chunks)
