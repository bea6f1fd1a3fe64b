"""Corpus assembly — the composed keep/drop verdict that actually
materializes a training corpus from the individual hygiene signals
(beyond-reference; the batch capstone over ``pipeline/text.py`` and
``pipeline/dedup.py``).

Gate order (first failure wins, mirroring how production pipelines
report drop attribution):

1. ``duplicate`` — the document is not the canonical keeper (keep-MIN)
   of its exact content fingerprint.
2. ``contaminated`` — distinct trigram collisions against the held-out
   benchmark slice reach the threshold.
3. ``low_quality`` — the heuristic quality score falls below the floor.
4. ``high_perplexity`` — the corpus-trained bigram-LM perplexity
   exceeds the ceiling (documents too short to have bigrams pass this
   gate; they are already penalized by quality).

Scale shape: every input is one of the already-scaled frames (16-byte
fingerprint groupBy, broadcast benchmark grams, single-scan quality,
TF-IDF-shaped LM scoring); the composition adds only doc_id-keyed
joins of per-doc frames. Nothing new materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.pipeline.dedup import (
    benchmark_collision_hits,
    dedup_exact,
)
from sensapp_spark.pipeline.text import (
    lm_perplexity,
    normalized_text,
    quality_score_cols,
    spread_if_needed,
)

DEFAULT_MIN_QUALITY = 0.09
DEFAULT_MAX_PERPLEXITY = 31.0


def corpus_verdict(
    docs: DataFrame,
    bench: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_perplexity: float = DEFAULT_MAX_PERPLEXITY,
    decontam_threshold: int = 2,
    decontam_ngram: int = 3,
) -> DataFrame:
    """(doc_id, kept, drop_reason) for every document; ``drop_reason``
    is NULL exactly when ``kept``."""
    fp = F.md5(normalized_text(F.col("text")))
    with_fp = docs.select("doc_id", fp.alias("fp"))
    canon = dedup_exact(docs).select("fp", "keep_doc_id")
    dup = with_fp.join(canon.hint("shuffle_hash"), "fp").select(
        "doc_id", (F.col("doc_id") != F.col("keep_doc_id")).alias("is_dup")
    )
    qual = spread_if_needed(docs).select("doc_id", *quality_score_cols())
    hits = benchmark_collision_hits(docs, bench, n=decontam_ngram)
    ppl = lm_perplexity(docs)
    # shuffle_hash hints: these are doc_id-keyed joins of per-doc
    # frames derived from aggregations/HOFs whose static size estimates
    # are unreliable — without the hint one side planned as a
    # sort-merge join, paying a sort of every per-doc frame for no
    # benefit on an equality key (caught by the registry-wide
    # join-shape test).
    joined = (
        qual.select("doc_id", "quality")
        .join(dup.hint("shuffle_hash"), "doc_id")
        .join(hits.hint("shuffle_hash"), "doc_id", "left")
        .join(ppl.hint("shuffle_hash"), "doc_id", "left")
    )
    n_coll = F.coalesce(F.col("n_collisions"), F.lit(0))
    reason = (
        F.when(F.col("is_dup"), F.lit("duplicate"))
        .when(n_coll >= decontam_threshold, F.lit("contaminated"))
        # NULL quality (empty/whitespace text) fails the quality gate —
        # a bare < comparison would skip it and keep the junk doc.
        .when(
            F.col("quality").isNull() | (F.col("quality") < min_quality),
            F.lit("low_quality"),
        )
        .when(
            F.col("perplexity") > max_perplexity, F.lit("high_perplexity")
        )
    )
    return joined.select(
        "doc_id",
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
    )
