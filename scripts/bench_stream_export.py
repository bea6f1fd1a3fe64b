"""Near-limit HTTP export: measure the bounded-driver-memory claim.

SURVEY §7.4 risk 10 (closed in round 5): the reference assembles every
export as one driver-side string up to its 10M-row limit; this engine
streams above a row threshold. This script measures the claim at
1,000,000 rows — ~10% of the reference's hard limit — by driving the
REAL gateway route with a non-buffered client and consuming the
response chunk by chunk:

* peak RSS growth of the driver process while streaming (should be
  bounded by chunk + one prefetched partition, NOT by body size);
* total bytes served and wall clock;
* cross-check: the streamed CSV line count equals the row count + 1.

Usage: python scripts/bench_stream_export.py [n_rows]
Results recorded in BASELINE.md §"Streamed export at near-limit".
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.datamodel.types import SENSOR_SCHEMA, SensorType
    from sensapp_spark.server.app import create_app
    from sensapp_spark.session import get_spark
    from sensapp_spark.storage.lake import SensorLake

    spark = get_spark(
        app_name="stream-export-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    lake = SensorLake(spark, tempfile.mkdtemp(prefix="stream_export_"))
    sensor_id = "00000000-0000-0000-0000-00000000s1"
    lake.upsert_sensors(
        spark.createDataFrame(
            [(sensor_id, "bulk", "Float", "C", None, {})], SENSOR_SCHEMA
        )
    )
    values = spark.range(N_ROWS).select(
        F.lit(sensor_id).alias("sensor_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("time"),
        (F.col("id") * 0.001).alias("value"),
    )
    lake.append_values(SensorType.FLOAT, values)

    app = create_app(spark, lake)  # default 100k threshold
    app.testing = True

    report = {}
    # Text formats verify line counts; the columnar formats (round 6:
    # both now stream row groups / record batches with the same
    # peek-ahead) are consumed byte-wise only — parsing a 1M-row body
    # would materialize it and poison the RSS measurement (small-N
    # parse equivalence is pinned in tests/test_streamed_export.py).
    for fmt in ("csv", "jsonl", "arrow", "parquet"):
        with app.test_client() as c:
            rss0 = rss_mb()
            t0 = time.time()
            r = c.get(f"/series/{sensor_id}?format={fmt}", buffered=False)
            assert r.status_code == 200
            total = 0
            lines = 0
            for chunk in r.response:  # consume WITHOUT materializing
                if isinstance(chunk, str):
                    chunk = chunk.encode()
                total += len(chunk)
                lines += chunk.count(b"\n")
            wall = round(time.time() - t0, 1)
            report[fmt] = {
                "rows": N_ROWS,
                "mb_served": round(total / 1e6, 1),
                "wall_s": wall,
                "rss_growth_mb": round(rss_mb() - rss0, 1),
            }
            if fmt in ("csv", "jsonl"):
                report[fmt]["lines"] = lines
                expect = N_ROWS + (1 if fmt == "csv" else 0)
                assert lines == expect, (fmt, lines, expect)
            else:
                assert total > 1_000_000, (fmt, total)

    print(json.dumps(report, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
