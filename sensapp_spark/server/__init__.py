from sensapp_spark.server.app import create_app  # noqa: F401
