"""Hyperplane-LSH bucket-partitioned layout: measure the pruning claim.

Companion to scripts/bench_ivf_layout.py for the second ANN index:
write ``bucket_expr`` once at ingest, partition the table by it, and
each probe's candidate list becomes directory-level partition pruning
instead of a per-query sign-bit projection over the full corpus.

Same 100x corpus (200,000 vectors), 5 queries, 4 planes + Hamming-1
multiprobe (5 of 16 buckets per query).

Usage: python scripts/bench_ann_layout.py [base_sf_dir] [replicas] [n_planes]
Results recorded in BASELINE.md §"IVF partitioned layout" (LSH row).
``n_planes`` > 4 sparsifies the buckets so the multi-table recall lift
becomes visible (at 4 planes + multiprobe the 200k corpus saturates
recall@10 = 1.0 for both layouts); queries are deterministically
PERTURBED corpus vectors, not members, so recall is not trivially 1.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
OUT = "/tmp/sensapp_ann_layout"
N_QUERIES = 5
N_PLANES = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.pipeline.similarity import hyperplane_lsh_topk
    from sensapp_spark.session import get_spark

    spark = get_spark(
        app_name="lsh-layout",
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

    # Write-side through the REAL storage API (round 6: AnnIndexStore
    # owns bucket-once + partitioned write + plane-count sidecar).
    from sensapp_spark.storage.ann import AnnIndexStore

    store = AnnIndexStore(spark, f"{OUT}/store")
    t0 = time.time()
    store.write_lsh(flat, n_planes=N_PLANES)
    layout_write_s = round(time.time() - t0, 1)
    by_bucket, stored_planes, stored_dim = store.read_lsh()
    assert stored_planes == N_PLANES

    queries = [
        [float(x) + 0.05 * math.sin(i + 7 * qi) for i, x in
         enumerate(r.embedding)]
        for qi, r in enumerate(
            base.orderBy("vec_id").limit(N_QUERIES).collect()
        )
    ]

    def run(frame):
        t0 = time.time()
        rows = []
        for qv in queries:
            rows.append(
                tuple(
                    (r.vec_id, r.cosine)
                    for r in hyperplane_lsh_topk(
                        frame, qv, k=10, n_planes=N_PLANES,
                        stored_planes=(N_PLANES if "bucket" in frame.columns else None),
                    ).collect()
                )
            )
        return round(time.time() - t0, 2), rows

    run(flat), run(by_bucket)  # warm
    flat_s, flat_rows = run(flat)
    part_s, part_rows = run(by_bucket)

    plan = (
        hyperplane_lsh_topk(by_bucket, queries[0], k=10, n_planes=N_PLANES,
                            stored_planes=N_PLANES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pruned = "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:150]

    # Multi-table stored layout (round 7): same plane count per table,
    # 3 independent plane sets — measure the recall lift at constant
    # per-table probe fraction, through the store API.
    from sensapp_spark.pipeline.similarity import cosine_topk

    t0 = time.time()
    store.write_lsh(flat, name="lsh_mt", n_planes=N_PLANES, n_tables=3)
    mt_write_s = round(time.time() - t0, 1)

    def store_recall(name):
        t0 = time.time()
        hits, truth_n = 0, 0
        for qv, truth in zip(queries, truths):
            got = {r.vec_id
                   for r in store.lsh_topk(qv, k=10, name=name).collect()}
            hits += len(got & truth)
            truth_n += len(truth)
        return round(time.time() - t0, 2), round(hits / truth_n, 3)

    truths = [
        {r.vec_id for r in cosine_topk(flat, qv, k=10).collect()}
        for qv in queries
    ]
    single_s, recall1 = store_recall("embeddings_lsh")
    multi_s, recall3 = store_recall("lsh_mt")

    print(json.dumps({
        "corpus": {"vectors": n, "replicas": REPLICAS,
                   "layout_write_s": layout_write_s},
        "flat_probe_s": flat_s,
        "partitioned_probe_s": part_s,
        "speedup": round(flat_s / part_s, 2) if part_s else None,
        "results_identical": flat_rows == part_rows,
        "partition_pruned_plan": bool(pruned),
        "multi_table": {
            "n_tables": 3, "write_s": mt_write_s,
            "single_probe_s": single_s, "recall_1table": recall1,
            "multi_probe_s": multi_s, "recall_3table": recall3,
        },
    }, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
