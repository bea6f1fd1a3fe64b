"""sensapp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SINTEF/sensapp (time-series gateway), plus
the large-scale training-data pipeline operators a 100 TB lake needs.

Design principles (see SURVEY.md):

* DataFrame-first: every operator is declared with the DataFrame/SQL API so
  Catalyst handles pushdown, pruning, join strategy, and AQE handles skew.
* Narrow tall value tables ``(sensor_id, time, value)`` partitioned by month,
  mirroring the reference's ClickHouse layout
  (reference: src/storage/clickhouse/migrations/20240223133248_init.sql:34-41).
* Python stays on the control plane (parsers, planners); the data plane is
  JVM whole-stage codegen. Pandas UDFs only where built-ins can't express
  the semantics (MinHash, SimHash, multimodal decode).
"""

__version__ = "0.1.0"

from sensapp_spark.session import get_spark  # noqa: F401
