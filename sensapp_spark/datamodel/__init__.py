from sensapp_spark.datamodel.types import (  # noqa: F401
    SENSOR_SCHEMA,
    SensorType,
    value_schema,
)
from sensapp_spark.datamodel.sensor import Sensor, sensor_uuid  # noqa: F401
