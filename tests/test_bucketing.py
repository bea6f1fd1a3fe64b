"""Bucketed layout (storage/bucketing.py): sensor-keyed joins and
aggregations over co-bucketed tables plan with zero exchanges, where
the same query over flat tables shuffles both sides."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensapp_spark.storage.bucketing import read_bucketed, write_bucketed


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    values = spark.createDataFrame(
        [
            (f"s{i}", dt.datetime(2024, 1, 1 + j), float(i * j))
            for i in range(20)
            for j in range(5)
        ],
        "sensor_id string, time timestamp, value double",
    )
    weights = spark.createDataFrame(
        [(f"s{i}", float(i)) for i in range(20)],
        "sensor_id string, weight double",
    )
    write_bucketed(values, "bk_values", str(root / "values"), buckets=4)
    write_bucketed(
        weights, "bk_weights", str(root / "weights"), buckets=4,
        sort_cols=("sensor_id",),
    )
    # Force non-broadcast joins so the exchange count shows the layout,
    # not the broadcast fallback.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bk_values")
    spark.sql("DROP TABLE IF EXISTS bk_weights")


def test_bucketed_join_is_shuffle_free(bucketed):
    spark = bucketed
    j = read_bucketed(spark, "bk_values").join(
        read_bucketed(spark, "bk_weights"), "sensor_id"
    )
    plan = plan_of(j)
    assert plan.count("Exchange hashpartitioning") == 0
    assert j.count() == 100

    # The same join over path-read (bucket-spec-less) frames shuffles.
    flat = spark.table("bk_values").inputFiles()[0].rsplit("/", 1)[0]
    a = spark.read.parquet(flat)
    b = read_bucketed(spark, "bk_weights")
    assert plan_of(a.join(b, "sensor_id")).count(
        "Exchange hashpartitioning"
    ) >= 1


def test_bucketed_aggregation_is_shuffle_free(bucketed):
    spark = bucketed
    agg = (
        read_bucketed(spark, "bk_values")
        .groupBy("sensor_id")
        .agg(F.avg("value").alias("avg_value"))
    )
    assert plan_of(agg).count("Exchange hashpartitioning") == 0
    assert agg.count() == 20
