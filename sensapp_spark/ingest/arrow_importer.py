"""Arrow IPC importer (operator S3).

Semantics follow reference src/importers/arrow.rs:26-296:

* the IPC file must have a ``timestamp`` column (Timestamp µs) and a
  ``value`` column; optional ``sensor_id`` (UUID string) and
  ``sensor_name`` columns name the series (default name "arrow_sensor");
* value type ↦ sensor type: Int64→Integer, Float64→Float,
  Decimal128→Numeric, Utf8→String, Boolean→Boolean,
  Struct{latitude,longitude}→Location, Binary→Blob (arrow.rs:143-296).

Arrow is Spark's native interchange format: the table converts to a
DataFrame without row-wise marshalling.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.ipc as ipc

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sensapp_spark.datamodel.sensor import sensor_uuid
from sensapp_spark.datamodel.types import SENSOR_SCHEMA, SensorType
from sensapp_spark.ingest.csv_importer import IngestBatch

DEFAULT_SENSOR_NAME = "arrow_sensor"


class ArrowFormatError(ValueError):
    pass


def _sensor_type_of(field: pa.Field) -> SensorType:
    t = field.type
    if pa.types.is_int64(t):
        return SensorType.INTEGER
    if pa.types.is_float64(t) or pa.types.is_float32(t):
        return SensorType.FLOAT
    if pa.types.is_decimal(t):
        return SensorType.NUMERIC
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return SensorType.STRING
    if pa.types.is_boolean(t):
        return SensorType.BOOLEAN
    if pa.types.is_struct(t):
        names = {t.field(i).name for i in range(t.num_fields)}
        if {"latitude", "longitude"} <= names:
            return SensorType.LOCATION
        raise ArrowFormatError(f"Unsupported struct value type: {t}")
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return SensorType.BLOB
    raise ArrowFormatError(f"Unsupported Arrow value type: {t}")


def ingest_arrow(spark: SparkSession, ipc_bytes: bytes) -> IngestBatch:
    try:
        table = ipc.open_file(pa.BufferReader(ipc_bytes)).read_all()
    except pa.ArrowInvalid:
        # Fall back to stream format.
        try:
            table = ipc.open_stream(pa.BufferReader(ipc_bytes)).read_all()
        except pa.ArrowInvalid as e:
            raise ArrowFormatError(f"Not an Arrow IPC payload: {e}") from e
    return ingest_arrow_table(spark, table)


def ingest_arrow_table(spark: SparkSession, table: pa.Table) -> IngestBatch:
    names = set(table.column_names)
    if "timestamp" not in names:
        raise ArrowFormatError("Arrow import requires a 'timestamp' column")
    if "value" not in names:
        raise ArrowFormatError("Arrow import requires a 'value' column")
    ts_field = table.schema.field("timestamp")
    if not pa.types.is_timestamp(ts_field.type):
        raise ArrowFormatError(
            f"'timestamp' must be an Arrow timestamp, got {ts_field.type}"
        )
    stype = _sensor_type_of(table.schema.field("value"))

    has_name = "sensor_name" in names
    has_id = "sensor_id" in names
    df = spark.createDataFrame(table)

    if has_name:
        name_col = F.col("sensor_name")
    else:
        name_col = F.lit(DEFAULT_SENSOR_NAME)
    # Distinct sensor names (small dim) → deterministic UUIDs on driver.
    dims = df.select(name_col.alias("s_name")).distinct().collect()
    rows = [
        (sensor_uuid(r.s_name, stype, None, {}), r.s_name, stype.label, None,
         None, {})
        for r in dims
    ]
    sensors = spark.createDataFrame(rows, SENSOR_SCHEMA)

    if has_id:
        # Respect provided series ids (reference keeps them, arrow.rs:75-141)
        vals = df.select(
            F.col("sensor_id").cast("string").alias("sensor_id"),
            F.col("timestamp").alias("time"),
            "value",
        )
    else:
        ids = F.broadcast(
            sensors.select(F.col("name").alias("s_name"), "sensor_id")
        )
        vals = (
            df.withColumn("s_name", name_col)
            .join(ids, "s_name")
            .select("sensor_id", F.col("timestamp").alias("time"), "value")
        )
    return IngestBatch(sensors=sensors, values={stype: vals})
