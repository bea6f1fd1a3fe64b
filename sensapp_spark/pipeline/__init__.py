"""Training-data pipeline operators (beyond-reference, BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
column plumbing — each designed for 100 TB scale and oracle-checked
against DuckDB where SQL-expressible.
"""

from sensapp_spark.pipeline.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_scores,
    token_stats,
)
from sensapp_spark.pipeline.dedup import (  # noqa: F401
    dedup_exact,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash,
)
from sensapp_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_lsh_topk,
)
