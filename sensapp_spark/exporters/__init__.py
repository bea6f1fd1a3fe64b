from sensapp_spark.exporters.csv_exporter import to_csv_multi, to_csv_single  # noqa: F401
from sensapp_spark.exporters.jsonl_exporter import to_jsonl  # noqa: F401
from sensapp_spark.exporters.senml_exporter import to_senml  # noqa: F401
from sensapp_spark.exporters.arrow_exporter import (  # noqa: F401
    to_arrow_multi,
    to_arrow_single,
)
