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


def to_arrow_multi(df: DataFrame, sensor_type: SensorType) -> bytes:
    """Long layout with stringified values and JSON labels."""
    out = df.orderBy("sensor_id", "time").select(
        F.col("time").alias("timestamp"),
        "sensor_id",
        F.col("name").alias("sensor_name"),
        value_text(F.col("value"), sensor_type).alias("value"),
        F.lit(TYPE_TEXT[sensor_type]).alias("type"),
        F.coalesce(
            F.to_json("labels"), F.lit("{}")
        ).alias("labels"),
    )
    return _ipc_bytes(out.toArrow())
