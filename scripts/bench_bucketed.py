"""Bucketed-layout scale proof (storage/bucketing.py): run the
sensor-keyed core of the §2 suite over FLAT parquet vs BUCKETED tables
at sf0.1 and record wall time + exchange counts per plan.

What this demonstrates for the 100 TB posture: every sensor-keyed
aggregation/window/join over the flat layout shuffles the value table
(Exchange hashpartitioning in the plan); over the bucketed layout the
same plans run with ZERO exchanges — the network cost of repeated
sensor-keyed analytics becomes a one-time layout decision at ingest.

Usage: python scripts/bench_bucketed.py [sf_dir] [buckets]
Results are recorded in BASELINE.md §"Bucketed layout".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
WAREHOUSE = "/tmp/sensapp_bucketed_proof"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchanges(df) -> int:
    return plan_of(df).count("Exchange hashpartitioning")


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def queries(values, weights):
    """The sensor-keyed §2 core: Q7 window top-N, catalog aggregation
    (C1-ish stats), sensor-keyed equi-join (virtual-sensor shape), and a
    value⋈value alignment join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("sensor_id").orderBy("time", "event_id")
    topn = (
        values.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .drop("__rn")
    )
    stats = values.groupBy("sensor_id").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    joined = values.join(weights, "sensor_id").select(
        "sensor_id", "time", (F.col("value") * F.col("weight")).alias("v"),
    )
    aligned = values.alias("a").join(
        weights.alias("b"), "sensor_id"
    ).groupBy("sensor_id").agg(F.sum(F.col("a.value") * F.col("b.weight")).alias("s"))
    return {
        "per_sensor_topn": topn,
        "per_sensor_stats": stats,
        "sensor_join": joined,
        "join_then_agg": aligned,
    }


def main() -> int:
    import shutil

    from pyspark.sql import functions as F

    from sensapp_spark.plans import testdata as td
    from sensapp_spark.session import get_spark
    from sensapp_spark.storage.bucketing import read_bucketed, write_bucketed

    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      shuffle_partitions=32)
    # Force sort-merge joins so exchange counts show the LAYOUT, not the
    # broadcast fallback (real dimension tables outgrow broadcast).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    vals = td.events_values(spark, SF_DIR)
    weights = (
        td.events_sensors(spark, SF_DIR)
        .select("sensor_id", (F.crc32(F.col("sensor_id")) % 100 / 100.0).alias("weight"))
    )

    # FLAT: same data, plain parquet (what a naive lake layout gives).
    flat_v = f"{WAREHOUSE}/flat_values"
    flat_w = f"{WAREHOUSE}/flat_weights"
    vals.write.mode("overwrite").parquet(flat_v)
    weights.write.mode("overwrite").parquet(flat_w)

    # BUCKETED: bucketBy(N, sensor_id) sortBy(sensor_id, time).
    write_bucketed(vals, "proof_values", f"{WAREHOUSE}/bk_values",
                   buckets=BUCKETS, sort_cols=("sensor_id", "time"))
    write_bucketed(weights, "proof_weights", f"{WAREHOUSE}/bk_weights",
                   buckets=BUCKETS, sort_cols=("sensor_id",))

    layouts = {
        "flat": (spark.read.parquet(flat_v), spark.read.parquet(flat_w)),
        "bucketed": (
            read_bucketed(spark, "proof_values"),
            read_bucketed(spark, "proof_weights"),
        ),
    }

    report = {}
    for layout, (v, wgt) in layouts.items():
        for name, df in queries(v, wgt).items():
            df.write.format("noop").mode("overwrite").save()  # warm
            best = min(timed(df) for _ in range(3))
            report[f"{name}[{layout}]"] = {
                "sec": round(best, 3),
                "exchanges": exchanges(df),
            }

    print(json.dumps({"sf_dir": SF_DIR, "buckets": BUCKETS,
                      "results": report}, indent=2))
    for t in ("proof_values", "proof_weights"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
