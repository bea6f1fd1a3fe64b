"""PPJoin prefix-filter vs inverted-index Jaccard on a ZIPFIAN corpus.

Round 4 measured prefix filtering losing 5x on the flat synthetic
document-frequency profile (BASELINE.md §"Prefix-filter experiment")
and predicted it wins on a real Zipfian profile, where most shingles
are near-unique and prefixes prune candidates toward the true pair
set. This script tests that prediction: it synthesizes a 10x-scale
corpus (50,000 docs) whose tokens follow a Zipf rank-frequency law
(rank = V^u for hash-uniform u — P(rank) ∝ 1/rank over V = 200k
types), with the same 10-variant near-dup cluster structure as
scripts/bench_scale10.py, then times

* the production inverted-index path (``jaccard_pairs``, max_df guard
  ON — what the registry runs), and
* the PPJoin path (``jaccard_pairs_prefix``, exact — rare-first
  prefix index + length filter + sorted-array verify),

and cross-checks output equality on a 5,000-doc subsample against the
unguarded exact baseline.

Usage: python scripts/bench_ppjoin_zipf.py
Results recorded in BASELINE.md §"Prefix-filter experiment".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/sensapp_zipf"
N_BASE = 5_000
VARIANTS = 10
WORDS_PER_DOC = 40
VOCAB = 200_000
THRESHOLD = 0.5


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    # Zipf token for (base_id, position): u ~ U(0,1) from a hash,
    # rank = floor(VOCAB^u) => P(rank = r) ~ 1/(r ln V).
    def token(pos_col):
        u = (
            F.pmod(F.hash(F.col("base_id"), pos_col, F.lit(0x5eed)),
                   F.lit(1_000_000))
            / 1_000_000.0
        )
        rank = F.floor(F.pow(F.lit(float(VOCAB)), u)) + 1
        return F.concat(F.lit("w"), rank.cast("string"))

    base = spark.range(N_BASE).select(
        F.col("id").alias("base_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                lambda p: token(p),
            ),
        ).alias("text"),
    )
    k = F.col("k")
    words = F.split(F.col("text"), r"\s+")
    variant_text = F.concat_ws(
        " ",
        F.concat(
            F.slice(words, k + 1, F.size(words)),
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat(
                    F.lit("vtok"), F.col("base_id").cast("string"),
                    F.lit("_"), i.cast("string"),
                ),
            ),
        ),
    )
    docs = (
        base.select(
            "base_id", "text",
            F.explode(
                F.sequence(F.lit(0), F.lit(VARIANTS - 1))
            ).alias("k"),
        )
        .select(
            (F.col("base_id") * VARIANTS + k).alias("doc_id"),
            variant_text.alias("text"),
            F.lit("zipf").alias("source"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{OUT_DIR}/documents.parquet")


def main() -> int:
    from sensapp_spark.pipeline.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )
    from sensapp_spark.session import get_spark

    spark = get_spark(
        app_name="ppjoin-zipf",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    docs = spark.read.parquet(f"{OUT_DIR}/documents.parquet")
    n_docs = docs.count()

    report: dict = {"corpus": {"docs": n_docs, "profile": "zipf",
                               "vocab": VOCAB, "threshold": THRESHOLD}}

    t0 = time.perf_counter()
    base_pairs = jaccard_pairs(docs, threshold=THRESHOLD).count()
    report["inverted_index_guarded"] = {
        "wall_s": round(time.perf_counter() - t0, 1), "pairs": base_pairs,
    }

    t0 = time.perf_counter()
    pfx_pairs = jaccard_pairs_prefix(docs, threshold=THRESHOLD).count()
    report["ppjoin_prefix_exact"] = {
        "wall_s": round(time.perf_counter() - t0, 1), "pairs": pfx_pairs,
    }

    # Exactness cross-check on a subsample small enough for the
    # unguarded quadratic-capable baseline.
    sub = docs.filter(F_mod_filter())
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(
            sub, threshold=THRESHOLD, max_df=None
        ).collect()
    }
    pfx = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(sub, threshold=THRESHOLD).collect()
    }
    report["subsample_equal"] = exact == pfx
    report["subsample_pairs"] = len(exact)

    print(json.dumps(report, indent=2))
    spark.stop()
    return 0


def F_mod_filter():
    from pyspark.sql import functions as F

    # First 500 clusters complete with all 10 variants: 5,000 docs that
    # still carry genuine near-dup pairs for the equality check.
    return F.col("doc_id") < 5_000


if __name__ == "__main__":
    raise SystemExit(main())
