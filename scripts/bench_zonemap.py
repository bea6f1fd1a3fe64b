"""Measure file-skipping: point lookups on a clustered lake with the
zone-map sidecar present vs removed (same files, same plan shape — the
only difference is the planned read set).

Builds a FLOAT value table of N_SENSORS x N_MONTHS x SAMPLES rows,
clusters it with optimize(files_per_month=FILES_PER_MONTH), then times
single-sensor fetches and (window x sensor) fetches both ways and
reports planned-file counts from df.inputFiles().

Run idle:  python scripts/bench_zonemap.py
Env:       ZM_SENSORS (default 5000), ZM_SAMPLES (default 200),
           ZM_FILES_PER_MONTH (default 32)
"""

import datetime as dt
import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.session import get_spark
from sensapp_spark.storage.lake import SensorLake, resolve_table
from sensapp_spark.storage.zonemap import ZONEMAP_NAME

N_SENSORS = int(os.environ.get("ZM_SENSORS", "5000"))
SAMPLES = int(os.environ.get("ZM_SAMPLES", "200"))
FILES_PER_MONTH = int(os.environ.get("ZM_FILES_PER_MONTH", "32"))
MONTHS = 3
ROOT = "/tmp/bench_zonemap_lake"


def build(spark, clustered: bool = True) -> SensorLake:
    shutil.rmtree(ROOT, ignore_errors=True)
    lake = SensorLake(spark, ROOT)
    base = dt.datetime(2024, 1, 1)
    df = (
        spark.range(N_SENSORS * MONTHS * SAMPLES)
        .withColumn("sensor", (F.col("id") % N_SENSORS))
        .withColumn(
            "sensor_id", F.format_string("sensor-%06d", "sensor")
        )
        .withColumn("m", (F.col("id") / N_SENSORS % MONTHS).cast("int"))
        .withColumn(
            "i", (F.col("id") / (N_SENSORS * MONTHS)).cast("int")
        )
        .withColumn(
            "time",
            F.lit(base)
            + F.make_interval(months=F.col("m"))
            + F.make_interval(mins=F.col("i") * F.lit(3)),
        )
        .withColumn("value", F.rand(seed=7))
        .select("sensor_id", "time", "value")
    )
    if not clustered:
        # Model append-per-device-batch: each file carries a sensor
        # SUBSET (hash partition) whose lexical (smin, smax) range
        # still spans nearly the whole id space — range pruning is
        # blind here; only the count-min membership proof bites.
        df = df.repartition(FILES_PER_MONTH, "sensor_id")
    lake.append_values(SensorType.FLOAT, df)
    if clustered:
        lake.optimize(SensorType.FLOAT, files_per_month=FILES_PER_MONTH)
    return lake


def timed_fetch(lake, sensor, window=None):
    t0 = time.monotonic()
    kw = {}
    if window:
        kw = {"start": window[0], "end": window[1]}
    d = lake.values(SensorType.FLOAT, sensor_ids=[sensor], **kw)
    n = d.count()
    wall = time.monotonic() - t0
    return n, len(d.inputFiles()), wall


def scenario(spark, clustered: bool) -> dict:
    lake = build(spark, clustered=clustered)
    data = resolve_table(os.path.join(ROOT, "float_values"))
    import glob

    total_files = len(glob.glob(data + "/month=*/*.parquet"))
    probes = [f"sensor-{i:06d}" for i in (17, 1234, 4999)]
    feb = (dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 28))

    out = {"total_files": total_files, "rows": N_SENSORS * MONTHS * SAMPLES}
    moved = False
    try:
        for tag in ("with_map", "without_map"):
            if tag == "without_map":
                os.replace(
                    os.path.join(data, ZONEMAP_NAME),
                    os.path.join(data, ZONEMAP_NAME + ".bak"),
                )
                moved = True
            walls, files = [], []
            for s in probes:
                n, nf, w = timed_fetch(lake, s)
                walls.append(w)
                files.append(nf)
            nw, nfw, ww = timed_fetch(lake, probes[0], feb)
            out[tag] = {
                "point_files": files,
                "point_wall_s": [round(w, 3) for w in walls],
                "window_files": nfw,
                "window_wall_s": round(ww, 3),
            }
    finally:
        # Always restore the sidecar — a crashed without_map pass must
        # not leave the reused bench lake silently unpruned.
        if moved:
            os.replace(
                os.path.join(data, ZONEMAP_NAME + ".bak"),
                os.path.join(data, ZONEMAP_NAME),
            )
    return out


def main():
    spark = get_spark()
    # clustered: range pruning (smin/smax disjoint after optimize).
    # unclustered: every file's sensor range spans the id space, so the
    # only lever is the per-file count-min MEMBERSHIP proof (round 9).
    out = {
        "clustered": scenario(spark, clustered=True),
        "unclustered": scenario(spark, clustered=False),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
