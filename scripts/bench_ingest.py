"""Write-path throughput at 10× scale (round 11 — the one lifecycle
number BASELINE.md lacked; the reference's own TODO ranks write
benchmarks first, /root/reference/TODO.md:92-98).

Measures the full publish transaction — dimension CAS upsert + typed
parquet append + file-log record + incremental zone-map fold — exactly
as a Structured-Streaming ``foreachBatch`` epoch runs it
(streaming/ingest.py's publish body, with epoch markers):

* single-writer sequential epochs (the steady-state stream): rows/s,
  per-epoch wall, and the zone-map refresh's share of it;
* N concurrent writers publishing into ONE lake (the contended case):
  rows/s, CAS claim attempts vs losses (every loss is one absorbed
  retry — the bounded-retry story under contention);
* post-hoc conservation checks: total rows and dimension cardinality
  equal the input (no lost updates under any interleaving).

Needs /tmp/sensapp_sf1/events.parquet (run scripts/bench_scale10.py
first); falls back to $SPARK_GRAFT_SF_DIR/events.parquet with the
scale noted in the output.

Usage: python scripts/bench_ingest.py [writers] (default 1 2 4)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF1 = "/tmp/sensapp_sf1/events.parquet"
LAKE_ROOT = "/tmp/sensapp_ingest_bench"
EPOCH_ROWS = 100_000


def main() -> int:
    from pyspark.sql import functions as F

    import sensapp_spark.storage.lake as lake_mod
    from sensapp_spark.datamodel.types import SensorType
    from sensapp_spark.ingest.csv_importer import IngestBatch
    from sensapp_spark.session import get_spark
    from sensapp_spark.storage.lake import CommitConflict, SensorLake

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    if os.path.exists(SF1):
        src, scale = SF1, "10x"
    else:
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        src, scale = os.path.join(sf_dir, "events.parquet"), sf_dir

    ev = spark.read.parquet(src).select(
        F.concat(
            F.col("event_type"), F.lit("/"),
            F.col("user_id").cast("string"),
        ).alias("sensor_id"),
        F.col("ts").cast("timestamp").alias("time"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type"),
        F.col("user_id"),
    )
    n_rows = ev.count()
    n_epochs = max(2, n_rows // EPOCH_ROWS)
    # Deterministic epoch assignment; cache so per-epoch filters do not
    # re-read parquet n_epochs times.
    ev = ev.withColumn(
        "__e", (F.crc32(F.concat("sensor_id", F.col("time").cast("string")))
                % n_epochs).cast("int")
    ).cache()
    ev.count()

    def batch_for(epoch: int) -> IngestBatch:
        part = ev.filter(F.col("__e") == epoch)
        user = F.col("user_id").cast("string")
        sensors = part.select("event_type", "user_id").distinct().select(
            F.concat(F.col("event_type"), F.lit("/"), user)
            .alias("sensor_id"),
            F.col("event_type").alias("name"),
            F.lit("Float").alias("type"),
            F.lit(None).cast("string").alias("unit"),
            F.lit(None).cast("string").alias("unit_description"),
            F.create_map(F.lit("user"), user).alias("labels"),
        )
        vals = part.select("sensor_id", "time", "value")
        return IngestBatch(sensors=sensors, values={SensorType.FLOAT: vals})

    # Instrument the CAS primitive (claim attempts / losses) and the
    # zone-map fold (wall share) — counters only, behavior unchanged.
    counters = {"claims": 0, "losses": 0, "zonemap_s": 0.0}
    lock = threading.Lock()
    real_claim = lake_mod._claim_commit
    real_zm = SensorLake._refresh_zonemap_dir

    def counting_claim(*a, **kw):
        with lock:
            counters["claims"] += 1
        try:
            return real_claim(*a, **kw)
        except CommitConflict:
            with lock:
                counters["losses"] += 1
            raise

    def timed_zm(self, *a, **kw):
        t = time.time()
        try:
            return real_zm(self, *a, **kw)
        finally:
            with lock:
                counters["zonemap_s"] += time.time() - t

    lake_mod._claim_commit = counting_claim
    SensorLake._refresh_zonemap_dir = timed_zm

    results: dict = {"scale": scale, "rows": n_rows, "epochs": n_epochs}
    writer_counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    try:
        for n_writers in writer_counts:
            for k in counters:
                counters[k] = 0 if k != "zonemap_s" else 0.0
            root = f"{LAKE_ROOT}_{n_writers}w"
            shutil.rmtree(root, ignore_errors=True)
            # SPARK_GRAFT_DEFER_ZM=1 measures the deferred-fold lever
            # (zonemap_on_append=False): writes skip the footer fold,
            # the maintenance tick pays it instead.
            lake = SensorLake(
                spark, root,
                zonemap_on_append=os.environ.get(
                    "SPARK_GRAFT_DEFER_ZM") != "1",
            )
            errors: list = []

            def run(wid: int, n=n_writers, lk=lake):
                try:
                    for e in range(wid, n_epochs, n):
                        lk.publish(
                            batch_for(e), epoch=(f"bench-{n}w", e)
                        )
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)

            t0 = time.time()
            if n_writers == 1:
                run(0)
            else:
                threads = [
                    threading.Thread(target=run, args=(w,))
                    for w in range(n_writers)
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
            wall = time.time() - t0
            if errors:
                raise errors[0]
            got = lake.values(SensorType.FLOAT).count()
            dims = lake.sensors().count()
            want_dims = ev.select("sensor_id").distinct().count()
            results[f"{n_writers}w"] = {
                "wall_s": round(wall, 2),
                "rows_per_s": round(got / wall),
                "epoch_wall_s": round(wall / n_epochs, 3),
                "cas_claims": counters["claims"],
                "cas_losses": counters["losses"],
                "zonemap_share": round(counters["zonemap_s"] / wall, 3),
                "rows_conserved": bool(got == n_rows),
                "dims_conserved": bool(dims == want_dims),
            }
            print(json.dumps({n_writers: results[f"{n_writers}w"]}),
                  flush=True)
            assert got == n_rows, (got, n_rows)
            assert dims == want_dims, (dims, want_dims)
    finally:
        lake_mod._claim_commit = real_claim
        SensorLake._refresh_zonemap_dir = real_zm
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
