"""Corpus-assembly verdict at 100x bench scale (500,000 docs).

Round 4 measured the composed keep/drop verdict at 10x (14.3 s /
50k docs) and argued the composition stays join-bounded because every
input frame is already-scaled and the joins are doc_id-keyed hash
joins. This script checks that claim at another 10x: 5,000 base docs
from sf0.1 expand to 100 variants each — 10% exact duplicates (variant
k % 10 == 0 keeps the base text verbatim, exercising the duplicate
gate over 50k fingerprint groups), the rest near-dups (drop k % 20
leading words, append k unique marker tokens). The verdict runs
end-to-end (count) and reports wall clock + drop attribution.

Usage: python scripts/bench_verdict100.py [base_sf_dir] [replicas]
Results recorded in BASELINE.md §"Corpus verdict at scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
OUT_DIR = "/tmp/sensapp_verdict100"


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    k = F.col("k")
    words = F.split(F.col("text"), r"\s+")
    near_dup = F.concat_ws(
        " ",
        F.concat(
            F.slice(words, (k % 20) + 1, F.size(words)),
            F.transform(
                F.sequence(F.lit(1), (k % 20) + 1),
                lambda i: F.concat(
                    F.lit("vtok"), F.col("doc_id").cast("string"),
                    F.lit("_"), ((k * 100) + i).cast("string"),
                ),
            ),
        ),
    )
    out = (
        docs.select(
            "doc_id", "text", "source",
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("k"),
        )
        .select(
            (F.col("doc_id") * REPLICAS + k).alias("doc_id"),
            F.when(k % 10 == 0, F.col("text")).otherwise(near_dup)
            .alias("text"),
            "source",
        )
    )
    out.write.mode("overwrite").parquet(f"{OUT_DIR}/documents.parquet")


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.pipeline.assemble import corpus_verdict
    from sensapp_spark.session import get_spark

    spark = get_spark(
        app_name="verdict-100x",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_corpus(spark)
    gen_sec = round(time.time() - t0, 1)

    docs = spark.read.parquet(f"{OUT_DIR}/documents.parquet")
    n_docs = docs.count()
    bench = docs.filter(F.col("doc_id") % 97 == 0)

    t0 = time.time()
    verdict = corpus_verdict(docs, bench)
    rows = verdict.count()
    wall = round(time.time() - t0, 1)

    attribution = {
        (r.drop_reason or "kept"): r["count"]
        for r in verdict.groupBy("drop_reason").count().collect()
    }
    print(json.dumps({
        "corpus": {"docs": n_docs, "generation_sec": gen_sec,
                   "replicas": REPLICAS},
        "verdict": {"wall_s": wall, "rows": rows,
                    "attribution": attribution},
    }, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
