"""IVF partitioned layout: measure the ingest-time-assignment claim.

`similarity.ivf_topk`'s docstring claims that writing `centroid_id` at
ingest and partitioning the table by it turns each probe into a
partition-pruned scan. This script measures that claim:

1. replicate the sf0.1 embeddings 100x (200,000 vectors, deterministic
   per-replica perturbations) into /tmp;
2. write the corpus twice: flat parquet, and parquet PARTITIONED BY
   centroid_id (assignment computed ONCE with the default first-nlist
   codebook — the write-side half of the layout);
3. run the same 5 probe queries against both layouts and compare
   wall clock, verifying (a) identical top-k results, (b) the
   partitioned plan shows PartitionFilters on centroid_id (plan-level
   proof the pruning is real, not just row filtering).

Usage: python scripts/bench_ivf_layout.py [base_sf_dir] [replicas]
Results recorded in BASELINE.md §"IVF partitioned layout".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
OUT = "/tmp/sensapp_ivf_layout"
N_QUERIES = 5


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.pipeline.similarity import ivf_topk
    from sensapp_spark.session import get_spark

    spark = get_spark(
        app_name="ivf-layout",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    k = F.col("k")
    emb = (
        base.select(
            "vec_id", "embedding", "label",
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("k"),
        )
        .select(
            (F.col("vec_id") * REPLICAS + k).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + ((F.pmod(F.hash(F.col("vec_id"), k, i),
                                          F.lit(1000)) - 500)
                                  / F.lit(50000.0)).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    emb.write.mode("overwrite").parquet(f"{OUT}/flat")
    flat = spark.read.parquet(f"{OUT}/flat")
    n = flat.count()

    # Write-side of the layout through the REAL storage API (round 6:
    # AnnIndexStore owns assign-once + partitioned write + codebook
    # sidecar; this harness measures the same code a user runs).
    from sensapp_spark.storage.ann import AnnIndexStore

    store = AnnIndexStore(spark, f"{OUT}/store")
    t0 = time.time()
    cents = store.write_ivf(flat)
    layout_write_s = round(time.time() - t0, 1)
    by_list, stored_cents = store.read_ivf()
    assert stored_cents == cents

    queries = [
        [float(x) for x in r.embedding]
        for r in base.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    def run(frame, codebook):
        t0 = time.time()
        rows = []
        for qv in queries:
            rows.append(
                tuple(
                    (r.vec_id, r.cosine)
                    for r in ivf_topk(frame, qv, k=10,
                                      codebook=codebook).collect()
                )
            )
        return round(time.time() - t0, 2), rows

    # Warm both paths once (parquet footers, JIT).
    run(flat, cents), run(by_list, cents)
    flat_s, flat_rows = run(flat, cents)
    part_s, part_rows = run(by_list, cents)

    plan = (
        ivf_topk(by_list, queries[0], k=10, codebook=cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pruned = "PartitionFilters: [centroid_id" in plan.replace(
        "PartitionFilters: [isnotnull(centroid_id", "PartitionFilters: [centroid_id"
    ) or "centroid_id" in plan.split("PartitionFilters")[1][:120] \
        if "PartitionFilters" in plan else False

    print(json.dumps({
        "corpus": {"vectors": n, "replicas": REPLICAS,
                   "layout_write_s": layout_write_s},
        "flat_probe_s": flat_s,
        "partitioned_probe_s": part_s,
        "speedup": round(flat_s / part_s, 2) if part_s else None,
        "results_identical": flat_rows == part_rows,
        "partition_pruned_plan": bool(pruned),
    }, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
