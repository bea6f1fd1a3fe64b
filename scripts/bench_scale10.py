"""sf1.0 dry run — empirical skew-guard validation for the dedup/ANN
family at 10× the per-round bench corpus.

The driver ships testdata up to sf0.1 (5,000 docs / 2,000 embeddings);
this script synthesizes a 10× corpus in /tmp — 50,000 docs / 20,000
embeddings — with REALISTIC near-duplicate structure: each source
document spawns 10 variants (drop k leading words, append k variant
tokens), so the corpus carries 5,000 clusters of ~10 near-dups each,
which is exactly the workload shape that melts unguarded all-pairs or
hot-shingle joins. Embeddings get per-variant deterministic
perturbations on a few dimensions.

This validates empirically what tests/test_plan_quality.py pins
structurally: candidate generation stays bucketed (no quadratic blowup
in wall time or pair counts), the max_df guard absorbs hot shingles,
and the LSH/IVF paths stay linear-ish.

Usage: python scripts/bench_scale10.py [base_sf_dir] [replicas]
Results recorded in BASELINE.md §"sf1.0 dry run".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OUT_DIR = "/tmp/sensapp_sf1"


def build_corpus(spark):
    """10× documents/embeddings with near-dup cluster structure, written
    once to /tmp (parquet) so every timed query reads from disk like the
    real bench."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")

    k = F.col("k")
    words = F.split(F.col("text"), r"\s+")
    # Variant k: drop the first k words, append k distinct marker words.
    variant_text = F.concat_ws(
        " ",
        F.concat(
            F.slice(words, k + 1, F.size(words)),
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat(
                    F.lit("vtok"), F.col("doc_id").cast("string"),
                    F.lit("_"), i.cast("string"),
                ),
            ),
        ),
    )
    big_docs = (
        docs.select(
            "doc_id", "text", "lang", "source",
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("k"),
        )
        .select(
            (F.col("doc_id") * REPLICAS + k).alias("doc_id"),
            F.when(k == 0, F.col("text")).otherwise(variant_text).alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_DIR}/documents.parquet"
    )

    ek = F.col("k")
    perturbed = F.transform(
        F.col("embedding"),
        lambda v, i: v + F.when(
            (i + ek) % 16 == 0, (ek.cast("float") - 5.0) * 0.01
        ).otherwise(F.lit(0.0)),
    )
    big_emb = (
        emb.select(
            "vec_id", "embedding", "label",
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("k"),
        )
        .select(
            (F.col("vec_id") * REPLICAS + ek).alias("vec_id"),
            perturbed.cast("array<float>").alias("embedding"),
            "label",
        )
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_DIR}/embeddings.parquet"
    )


def main() -> int:
    from pyspark.sql import functions as F

    from sensapp_spark.pipeline import clustering, dedup, similarity, text
    from sensapp_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    t0 = time.time()
    build_corpus(spark)
    gen_sec = time.time() - t0

    docs = spark.read.parquet(f"{OUT_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{OUT_DIR}/embeddings.parquet")
    n_docs, n_emb = docs.count(), emb.count()

    query_vec = [
        float(x)
        for x in emb.orderBy("vec_id").first().embedding
    ]

    runs = {
        "dedup_exact": lambda: dedup.dedup_exact(docs),
        "jaccard_pairs_guarded": lambda: dedup.jaccard_pairs(docs),
        "minhash_signatures": lambda: dedup.minhash_signatures(docs),
        "minhash_lsh_candidates": lambda: dedup.minhash_lsh_candidates(docs),
        "simhash": lambda: dedup.simhash(docs),
        "components_of_lsh_pairs": lambda: dedup.neardup_components(
            dedup.minhash_lsh_candidates(docs).select("doc_a", "doc_b")
        ),
        "embedding_pairs": lambda: similarity.embedding_neardup_pairs(
            emb, threshold=0.3
        ),
        "ann_cosine_topk": lambda: similarity.cosine_topk(emb, query_vec, k=10),
        "ann_lsh_topk": lambda: similarity.hyperplane_lsh_topk(
            emb, query_vec, k=10
        ),
        "ann_ivf_topk": lambda: similarity.ivf_topk(emb, query_vec, k=10),
        "kmeans_assign": lambda: clustering.kmeans_assign(emb),
        "repetition_signals": lambda: text.repetition_signals(docs),
        "benchmark_collisions": lambda: dedup.benchmark_collisions(
            docs, docs.filter(F.col("doc_id") % 970 == 0), n=3
        ),
        "chunk_plan": lambda: text.chunk_plan(docs),
        "chunk_dedup": lambda: text.chunk_plan(docs)
        .groupBy("chunk_fp")
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("copies")),
        "simhash_pairs": lambda: dedup.simhash_pairs(docs),
        "lm_perplexity": lambda: text.lm_perplexity(docs),
        "winnow_pairs": lambda: dedup.winnow_pairs(docs),
        # NOTE: jaccard_pairs_prefix is measured on its own harness
        # (bench_ppjoin_zipf.py) on BOTH frequency profiles — on this
        # flat-profile corpus it is the known-5x-slower path, so it is
        # excluded here to keep the dry run's wall bounded.
    }

    report = {"corpus": {"docs": n_docs, "embeddings": n_emb,
                         "generation_sec": round(gen_sec, 1)}}
    for name, fn in runs.items():
        t0 = time.time()
        try:
            n = fn().count()
            report[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        except Exception as e:
            report[name] = {
                "error": str(e).splitlines()[0][:300],
                "sec": round(time.time() - t0, 2),
            }
        print(f"## {name}: {report[name]}", file=sys.stderr, flush=True)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
