from sensapp_spark.query.promql import (  # noqa: F401
    ParsedQuery,
    PromQLError,
    parse_promql_query,
)
