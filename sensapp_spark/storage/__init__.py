from sensapp_spark.storage.lake import SensorLake  # noqa: F401
from sensapp_spark.storage.ann import AnnIndexStore  # noqa: F401
