"""Training-data pipeline operators (beyond-reference, BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
column plumbing — each designed for 100 TB scale and oracle-checked
against DuckDB where SQL-expressible.
"""

from sensapp_spark.pipeline.text import (  # noqa: F401
    chunk_plan,
    fingerprint,
    lang_id,
    quality_scores,
    repetition_signals,
    source_quality,
    token_stats,
)
from sensapp_spark.pipeline.dedup import (  # noqa: F401
    benchmark_collisions,
    dedup_exact,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    neardup_components,
    simhash,
    simhash_pairs,
)
from sensapp_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    embedding_neardup_pairs,
    hyperplane_lsh_topk,
    ivf_topk,
)
