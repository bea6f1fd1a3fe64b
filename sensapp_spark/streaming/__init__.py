from sensapp_spark.streaming.ingest import (  # noqa: F401
    stream_csv_directory,
    stream_lines_socket,
)
