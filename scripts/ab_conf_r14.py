"""Same-session interleaved A/B for a runtime SQL conf (round 14).

For each selected entry, alternately execute with the conf at A and B
values several rounds in ONE session, recording noop walls and
statusTracker task counts. Usage:

  python scripts/ab_conf_r14.py --conf KEY --a false --b true \
      [--rounds 2] [--sf DIR] [name ...]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("only", nargs="*")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sensapp-ab-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def _tasks() -> int:
        ssc = spark.sparkContext._jsc.sc().statusTracker()
        total = 0
        for jid in tracker.getJobIdsForGroup(None):
            info = ssc.getJobInfo(jid)
            if info.isEmpty():
                continue
            for sid in info.get().stageIds():
                si = ssc.getStageInfo(sid)
                if si.isDefined():
                    total += si.get().numTasks()
        return total

    names = [
        n for n in QUERIES if not args.only
        or any(s in n for s in args.only)
    ]
    next(iter(QUERIES.values()))(spark, args.sf).count()

    acc: dict[str, dict[str, list]] = {
        n: {args.a: [], args.b: []} for n in names
    }
    for rnd in range(args.rounds):
        for name in names:
            for val in (args.a, args.b):
                spark.conf.set(args.conf, val)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{args.conf}={val}"
                )
                t0c = _tasks()
                t0 = time.perf_counter()
                df = QUERIES[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                wall = round(time.perf_counter() - t0, 3)
                acc[name][val].append((wall, _tasks() - t0c))
                print(json.dumps({
                    "round": rnd, "name": name, "val": val,
                    "wall_s": wall, "tasks": acc[name][val][-1][1],
                }))
                sys.stdout.flush()

    summary = {}
    for name in names:
        med = {}
        for val in (args.a, args.b):
            walls = sorted(w for w, _ in acc[name][val])
            med[val] = {
                "wall": walls[len(walls) // 2],
                "tasks": acc[name][val][-1][1],
            }
        summary[name] = med
    a_tot = sum(v[args.a]["wall"] for v in summary.values())
    b_tot = sum(v[args.b]["wall"] for v in summary.values())
    print(json.dumps({
        "metric": "ab_conf", "conf": args.conf,
        f"total_{args.a}": round(a_tot, 2),
        f"total_{args.b}": round(b_tot, 2),
        "per_query": summary,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
