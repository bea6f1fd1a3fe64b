"""IVF+SQ8 stored layout: measure the compression + pruning claim.

`storage/ann.write_ivfsq` claims the codes table is ~4x smaller than
the raw-vector IVF layout before parquet encoding even helps, and that
probes prune to ~nprobe/nlist of the files like every stored layout.
This script measures both:

1. replicate the sf0.1 embeddings REPLICAS x (default 100 -> 200,000
   vectors, deterministic perturbations — same corpus recipe as
   bench_ivf_layout.py);
2. write the corpus twice through the store: `write_ivf` (raw vectors,
   partitioned) and `write_ivfsq` (uint8 codes, partitioned);
3. compare on-disk bytes, then run the same 5 probe queries against
   (a) the raw-vector IVF layout, (b) the SQ codes with exact re-rank,
   and report wall clock + recall of (b) against (a)'s exact ranking.

Usage: python scripts/bench_sq_layout.py [base_sf_dir] [replicas]
Results recorded in BASELINE.md §"IVF+SQ8 stored layout".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
OUT = "/tmp/sensapp_sq_layout"
N_QUERIES = 5
K = 10


def _tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.session import get_spark
    from sensapp_spark.storage.ann import AnnIndexStore
    from sensapp_spark.storage.lake import resolve_table

    spark = get_spark(
        app_name="sq-layout",
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
                lambda x, i: x + (
                    (F.pmod(F.hash(F.col("vec_id"), k, i), F.lit(1000))
                     .cast("double") / 1000.0 - 0.5) * 0.02
                ),
            ).cast("array<float>").alias("embedding"),
            "label",
        )
    ).cache()
    n = emb.count()

    shutil.rmtree(OUT, ignore_errors=True)
    store = AnnIndexStore(spark, OUT)
    t0 = time.monotonic()
    store.write_ivf(emb, name="raw")
    t_write_raw = time.monotonic() - t0
    t0 = time.monotonic()
    store.write_ivfsq(emb, name="sq")
    t_write_sq = time.monotonic() - t0

    raw_bytes = _tree_bytes(resolve_table(os.path.join(OUT, "raw")))
    sq_bytes = _tree_bytes(resolve_table(os.path.join(OUT, "sq")))

    queries = [
        [float(x) for x in r.embedding]
        for r in base.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    raw_walls, sq_walls, recalls = [], [], []
    for q in queries:
        t0 = time.monotonic()
        exact = [r.vec_id for r in store.ivf_topk(q, k=K, name="raw").collect()]
        raw_walls.append(time.monotonic() - t0)
        t0 = time.monotonic()
        got = [
            r.vec_id
            for r in store.ivfsq_topk(
                q, k=K, name="sq", rerank_against=emb, rerank=5 * K
            ).collect()
        ]
        sq_walls.append(time.monotonic() - t0)
        recalls.append(len(set(exact) & set(got)) / K)

    print(json.dumps({
        "n_vectors": n,
        "write_s": {
            "ivf_raw": round(t_write_raw, 1),
            "ivfsq": round(t_write_sq, 1),
        },
        "table_bytes": {"ivf_raw": raw_bytes, "ivfsq": sq_bytes},
        "compression_x": round(raw_bytes / max(1, sq_bytes), 2),
        "probe_wall_s": {
            "ivf_raw": [round(w, 3) for w in raw_walls],
            "ivfsq_rerank": [round(w, 3) for w in sq_walls],
        },
        "recall_at_10_vs_ivf": round(sum(recalls) / len(recalls), 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
