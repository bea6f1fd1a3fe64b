"""Data model: sensor types and Spark schemas.

Reference type system: src/datamodel/sensor_type.rs:11-20 (8-variant enum)
and docs/DATAMODEL.md:11-19. Storage layout: narrow tall tables, one per
value type, schema ``(sensor_id, time, value)`` — reference
src/storage/sqlite/migrations/20240110093153_init.sql:114-128.

Spark mapping decisions (SURVEY.md §1.2):

* Integer  → LongType
* Numeric  → DecimalType(38, 18)  (documented precision choice; the
  reference's rust_decimal is a 96-bit scaled decimal)
* Float    → DoubleType
* String   → StringType (Parquet dictionary encoding replaces the
  reference's manual ``strings_values_dictionary`` table)
* Boolean  → BooleanType
* Location → StructType{latitude: Double, longitude: Double}
* Json     → StringType (validated JSON text; ``from_json`` on read)
* Blob     → BinaryType

Timestamps are µs since Unix epoch; Spark TimestampType is µs-precision —
an exact match (docs/DATAMODEL.md:184-186).
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import types as T


class SensorType(IntEnum):
    """Discriminants match src/datamodel/sensor_type.rs:11-20."""

    INTEGER = 1
    NUMERIC = 20
    FLOAT = 30
    STRING = 40
    BOOLEAN = 50
    LOCATION = 60
    JSON = 70
    BLOB = 80

    @property
    def label(self) -> str:
        return self.name.capitalize()

    @classmethod
    def from_label(cls, label: str) -> "SensorType":
        return cls[label.upper()]

    @property
    def is_numeric(self) -> bool:
        # numeric_only filter semantics: reference
        # src/storage/sqlite/matchers.rs:47-50
        return self in (SensorType.INTEGER, SensorType.NUMERIC, SensorType.FLOAT)


LOCATION_STRUCT = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
    ]
)

_VALUE_TYPES: dict[SensorType, T.DataType] = {
    SensorType.INTEGER: T.LongType(),
    SensorType.NUMERIC: T.DecimalType(38, 18),
    SensorType.FLOAT: T.DoubleType(),
    SensorType.STRING: T.StringType(),
    SensorType.BOOLEAN: T.BooleanType(),
    SensorType.LOCATION: LOCATION_STRUCT,
    SensorType.JSON: T.StringType(),
    SensorType.BLOB: T.BinaryType(),
}


# The sensors dimension table. The reference normalizes units and labels into
# dictionary tables (sqlite init.sql:1-45); a MAP column + Parquet dictionary
# encoding subsumes all of that (SURVEY.md §1.4).
SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), False),  # deterministic UUID
        T.StructField("name", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # SensorType.label
        T.StructField("unit", T.StringType(), True),
        T.StructField("unit_description", T.StringType(), True),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType(), False), False),
    ]
)


def value_schema(sensor_type: SensorType) -> T.StructType:
    """Schema of the narrow tall value table for one sensor type."""
    return T.StructType(
        [
            T.StructField("sensor_id", T.StringType(), False),
            T.StructField("time", T.TimestampType(), False),
            T.StructField("value", _VALUE_TYPES[sensor_type], True),
        ]
    )


def value_table_name(sensor_type: SensorType) -> str:
    return f"{sensor_type.label.lower()}_values"
