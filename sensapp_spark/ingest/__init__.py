from sensapp_spark.ingest.inference import (  # noqa: F401
    InferredType,
    datetime_score,
    infer_cell,
    infer_column,
    is_header,
    likely_datetime_column,
    likely_geo_columns,
)
