from sensapp_spark.storage.lake import SensorLake  # noqa: F401
