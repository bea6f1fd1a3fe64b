"""Bucketed table layout — shuffle-free sensor-keyed joins at lake scale.

Month partitioning (storage/lake.py) solves time pruning; bucketing
solves the OTHER axis: every heavy operation in this engine that is not
a pure scan — per-sensor windows (Q7), as-of alignment, virtual-sensor
joins, value⋈value binary operations — shuffles on ``sensor_id``. With
the value tables written ``bucketBy(N, sensor_id)``, both sides of any
sensor-keyed join (and any sensor-keyed aggregation/window) arrive
pre-partitioned: Catalyst plans the join with ZERO exchanges
(asserted in tests/test_bucketing.py — 0 vs 2 for flat tables).

At 100 TB this converts the dominant network cost of repeated
sensor-keyed analytics into a one-time layout decision at ingest.
Bucket count guidance: samples_per_sensor × sensors / N ≈ a few hundred
MB per bucket file per month partition; N must match across tables
that join (Spark requires equal bucket counts for exchange-free joins).

The reference has no analogue — its closest layout feature is
ClickHouse ``ORDER BY (sensor_id, timestamp_us)`` clustering
(src/storage/clickhouse/migrations/20240223133248_init.sql:40), which
aids range scans but cannot co-locate two tables for a join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = DEFAULT_BUCKETS,
    key: str = "sensor_id",
    sort_cols: Sequence[str] = ("sensor_id", "time"),
) -> None:
    """Write ``df`` as an external bucketed table: data files at
    ``path``, bucket metadata in the session catalog. ``sortBy`` gives
    each bucket file the (sensor_id, time) ordering the ClickHouse
    layout has — windows over (sensor, time) then need no extra sort."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(*sort_cols)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table. Must go through the catalog —
    ``spark.read.parquet(path)`` would lose the bucket spec and
    reintroduce the shuffle."""
    return spark.table(table)
