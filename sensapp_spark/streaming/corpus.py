"""Streaming corpus hygiene — the ingest-side gate a training-data
pipeline runs BEFORE documents reach the lake (SURVEY §2.8 extension:
the reference has no streaming semantics; the batch counterparts are
``pipeline/text.py`` quality/PII and ``pipeline/dedup.py`` exact dedup).

Composition, all expressible in Structured Streaming:

* **Stateless signals** — quality score, PII counts, token stats are
  narrow per-row projections (the exact same column expressions as the
  batch operators), so they attach to a stream with zero state.
* **Watermark-bounded exact dedup** — ``dropDuplicatesWithinWatermark``
  on the content fingerprint: the engine keeps one state row per
  distinct fingerprint seen within the watermark delay and drops
  re-arrivals; state evicts as event time advances, so memory is
  O(distinct docs per window), independent of stream length. Duplicates
  separated by MORE than the watermark can re-emit — the lake's batch
  ``dedup_exact`` pass is the backstop, exactly how production
  pipelines layer streaming (cheap, bounded-state) and batch
  (exhaustive) dedup.

Scale notes: the fingerprint is computed map-side before the dedup
shuffle, so the stream shuffles (fp, doc) once; the quality filter
prunes rows BEFORE the stateful operator, shrinking dedup state to the
docs that could ever be kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.pipeline.text import (
    normalized_text,
    pii_count_cols,
    quality_score_cols,
    with_pii_flag,
)


def hygiene_stream(
    docs: DataFrame,
    time_col: str = "event_time",
    watermark: str = "1 hour",
    min_quality: float | None = None,
    drop_pii: bool = False,
) -> DataFrame:
    """Quality-score, PII-flag, and watermark-dedup a document stream.

    Input: a streaming frame with ``doc_id``, ``text`` and an event-time
    column. Output: one row per first-seen fingerprint that passes the
    gates, carrying the quality/PII signal columns alongside the
    original fields.
    """
    scored = with_pii_flag(
        docs.select("*", *quality_score_cols(), *pii_count_cols())
    ).withColumn("fp", F.md5(normalized_text(F.col("text"))))
    if min_quality is not None:
        scored = scored.filter(F.col("quality") >= min_quality)
    if drop_pii:
        scored = scored.filter(~F.col("has_pii"))
    return scored.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
