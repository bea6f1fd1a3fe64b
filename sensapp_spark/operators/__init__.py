from sensapp_spark.operators.matchers import (  # noqa: F401
    LabelMatcher,
    MatcherType,
    matcher_column,
    matchers_predicate,
)
from sensapp_spark.operators.selection import (  # noqa: F401
    per_sensor_limit,
    query_samples,
    select_sensors,
    time_range,
)
from sensapp_spark.operators.catalog import metrics_summary, series_list  # noqa: F401
