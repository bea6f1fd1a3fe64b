"""Round-14 per-entry profiler (guide §1: measure first).

For each registry entry (filtered by substring args): time DataFrame
CONSTRUCTION (driver-side eager work: temp-lake builds, refresh ticks,
training collects) separately from the noop-sink EXECUTION (guide
§1.4), and record Spark job/task-count deltas from the statusTracker so
structural claims (fewer redundant executions) are deterministic even
when walls wobble.

Usage: python scripts/profile_r14.py [--sf DIR] [--repeats 2] [name ...]
Emits one JSON line per entry repeat and a sorted summary at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensapp_spark.plans.queries import QUERIES  # noqa: E402
from sensapp_spark.session import get_spark  # noqa: E402


def _counts(tracker, spark) -> tuple[int, int, int]:
    jids = tracker.getJobIdsForGroup(None)
    ssc = spark.sparkContext._jsc.sc().statusTracker()
    jobs = len(jids)
    stages = tasks = 0
    for jid in jids:
        info = ssc.getJobInfo(jid)
        if info.isEmpty():
            continue
        sids = info.get().stageIds()
        stages += len(sids)
        for sid in sids:
            si = ssc.getStageInfo(sid)
            if si.isDefined():
                tasks += si.get().numTasks()
    return jobs, stages, tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("only", nargs="*")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sensapp-profile-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    # Warm JVM + footers (same as bench.py).
    next(iter(QUERIES.values()))(spark, args.sf).count()

    rows = []
    for name, fn in QUERIES.items():
        if args.only and not any(s in name for s in args.only):
            continue
        best = None
        for rep in range(args.repeats):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            j0, s0, t0c = _counts(tracker, spark)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            j1, s1, t1c = _counts(tracker, spark)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2, s2, t2c = _counts(tracker, spark)
            rec = {
                "name": name,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "build_tasks": t1c - t0c,
                "exec_jobs": j2 - j1,
                "exec_stages": s2 - s1,
                "exec_tasks": t2c - t1c,
            }
            print(json.dumps(rec))
            sys.stdout.flush()
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        rows.append(best)
    spark.sparkContext.setJobDescription(None)

    rows.sort(key=lambda r: -r["total_s"])
    print(json.dumps({
        "metric": "profile_r14",
        "total": round(sum(r["total_s"] for r in rows), 2),
        "build_total": round(sum(r["build_s"] for r in rows), 2),
        "exec_total": round(sum(r["exec_s"] for r in rows), 2),
        "top": rows[:15],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
