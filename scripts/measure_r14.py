"""Round-14 measurement harness (guide §1: measure first).

Same-session INTERLEAVED A/B for the promql operand-sharing change:
each listed entry is constructed + noop-executed alternately with
SENSAPP_PROMQL_SHARE=0 (round-13 behavior) and =1 (shared operands),
several rounds, in one Spark session — the only A/B form that survives
this sandbox's burst-credit disk (BASELINE.md / memory discipline).
Job/task counts come from the statusTracker deltas, so the structural
claim (fewer redundant executions) is deterministic even if walls
wobble.

Usage: python scripts/measure_r14.py [--sf DIR] [--rounds 2] [name ...]
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

DEFAULT = [
    "promql_ext_binary_ratio",
    "promql_ext_set_ops",
    "promql_ext_compare",
    "promql_ext_topk",
    "promql_ext_agg",
    "promql_ext_range_query",
    "value_histogram",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--plans", action="store_true",
        help="write plans/r14/<name>_{before,after}.txt "
        "(share=0 / share=1) and exit",
    )
    ap.add_argument("only", nargs="*")
    args = ap.parse_args()
    names = args.only or DEFAULT

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sensapp-measure-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    # Warm JVM + footers.
    next(iter(QUERIES.values()))(spark, args.sf).count()

    if args.plans:
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r14",
        )
        os.makedirs(plans_dir, exist_ok=True)
        for name in names:
            for share, label in (("0", "before"), ("1", "after")):
                os.environ["SENSAPP_PROMQL_SHARE"] = share
                os.environ["SENSAPP_ANN_DRIVER_TRAIN"] = share
                df = QUERIES[name](spark, args.sf)
                try:
                    txt = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")
                    )
                except Exception:
                    import contextlib
                    import io
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    txt = buf.getvalue()
                path = os.path.join(plans_dir, f"{name}_{label}.txt")
                with open(path, "w") as fh:
                    fh.write(txt)
                n_ex = txt.count("Exchange")
                n_scan = txt.count("Scan parquet")
                n_rdd = txt.count("Scan ExistingRDD")
                print(
                    f"{path}: Exchange={n_ex} parquet_scans={n_scan} "
                    f"rdd_scans={n_rdd}"
                )
        spark.stop()
        return

    def run(name: str, share: str) -> dict:
        os.environ["SENSAPP_PROMQL_SHARE"] = share
        spark.sparkContext.setJobDescription(f"{name} share={share}")
        j0 = tracker.getJobIdsForGroup(None)
        n0 = max(j0) if j0 else -1
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        jobs = [j for j in tracker.getJobIdsForGroup(None) if j > n0]
        stages = tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        return {
            "share": share,
            "construct_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "jobs": len(jobs),
            "stages": stages,
            "tasks": tasks,
        }

    results: dict[str, list[dict]] = {n: [] for n in names}
    for rnd in range(args.rounds):
        for name in names:
            for share in ("0", "1"):
                r = run(name, share)
                r["round"] = rnd
                results[name].append(r)
                print(json.dumps({"entry": name, **r}))
                sys.stdout.flush()

    print("\n=== summary (median per arm) ===")
    for name in names:
        for share in ("0", "1"):
            arm = [r for r in results[name] if r["share"] == share]
            arm.sort(key=lambda r: r["total_s"])
            m = arm[(len(arm) - 1) // 2]
            print(
                f"{name:28s} share={share} "
                f"min={arm[0]['total_s']:7.2f} med={m['total_s']:7.2f}s "
                f"(c={m['construct_s']:.2f} e={m['exec_s']:.2f}) "
                f"jobs={m['jobs']} stages={m['stages']} tasks={m['tasks']}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
