"""Deterministic sampling and dataset splitting for training-data
pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed-dependent and
engine-specific — rerunning on different cluster shapes or engines
yields different subsets, which poisons dataset reproducibility. These
operators instead derive a stable bucket in [0, 100) from a salted
content hash of the document id: the same document lands in the same
bucket on every engine, every run, every scale. Sampling, hold-out
splits, and incremental re-runs (new documents join existing splits
without reshuffling old ones) all come from the one bucket function.

All operators are shuffle-free narrow projections/filters — the bucket
is computed from the row alone, so at 100 TB they scale with input
splits and push the bucket filter straight into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.pipeline.dedup import hash32

SAMPLE_SALT = "sensapp-sample"
SPLIT_SALT = "sensapp-split"
BUCKETS = 100


def sample_bucket(col, salt: str, buckets: int = BUCKETS) -> F.Column:
    """Deterministic bucket in [0, buckets) from md5(salt ':' id) —
    reproducible across engines (DuckDB computes the identical value
    from the same expression). THE single Spark-side bucket formula:
    every sampler (and the SQL oracle's ``_bucket_sql`` twin) derives
    from it, so the hashing can never drift between samplers."""
    h = hash32(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.pmod(h, F.lit(buckets)).cast("int")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_pct: int = 0,
    stratum_col: str = "lang",
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (language,
    source, …), deterministically: a document is kept iff its bucket
    falls below its stratum's rate. Exact-fraction-in-expectation, and
    stable under re-runs — the kept set only grows/shrinks at the rate
    boundary when a rate changes."""
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    bucket = sample_bucket(F.col("doc_id"), SAMPLE_SALT)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", stratum_col, "bucket")
    )


MIX_SALT = "sensapp-mix"
MIX_BUCKETS = 1_000_000


def mix_rates(
    weights: dict[str, float], temperature: float
) -> dict[str, int]:
    """Per-source keep rates (ppm of :data:`MIX_BUCKETS`) for
    temperature-based source mixing: with corpus sizes ∝ w_s, keeping
    r_s ∝ w_s^(1/T − 1) of each source yields final mixture
    proportions ∝ w_s^(1/T) — the standard pretraining-mix sampler
    (Conneau & Lample 2019 §3.1 'Language sampling', also mC4/XLM-R).
    Scaled so the most up-weighted source keeps everything: T=1
    reproduces the natural mix (every rate = 1), T→∞ flattens toward
    uniform. Computed driver-side from the (tiny) weights dict so the
    rates are plain literals in the plan — and inlineable in a SQL
    oracle."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not weights or min(weights.values()) <= 0:
        raise ValueError("weights must be positive and non-empty")
    rel = {
        s: float(w) ** (1.0 / temperature - 1.0)
        for s, w in weights.items()
    }
    top = max(rel.values())
    return {
        s: int(round(r / top * MIX_BUCKETS)) for s, r in sorted(rel.items())
    }


def temperature_mix(
    docs: DataFrame,
    weights: dict[str, float],
    temperature: float = 1.0,
    source_col: str = "source",
) -> DataFrame:
    """Deterministic temperature-mix subsample: a document is kept iff
    its salted-hash bucket (ppm granularity, independent salt from
    sampling/splitting) falls below its source's :func:`mix_rates`
    rate. Sources absent from ``weights`` are dropped (rate 0). Like
    every sampler here this is a shuffle-free narrow filter — the
    bucket derives from the row alone, so at 100 TB it rides the scan
    stage; and the kept set is reproducible across engines, runs, and
    re-runs (new documents join the mix without disturbing old
    membership)."""
    rates = mix_rates(weights, temperature)
    rate = F.lit(0)
    for s, ppm in rates.items():
        rate = F.when(F.col(source_col) == s, F.lit(ppm)).otherwise(rate)
    bucket = sample_bucket(F.col("doc_id"), MIX_SALT, buckets=MIX_BUCKETS)
    return (
        docs.withColumn("mix_bucket", bucket)
        .filter(F.col("mix_bucket") < rate)
        .select("doc_id", source_col, "mix_bucket")
    )


def split_assign(
    docs: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Assign each document to train/val/test by hash bucket (the
    remainder after train+val is test). Uses a different salt than
    sampling so subsampling and splitting are independent events."""
    bucket = sample_bucket(F.col("doc_id"), SPLIT_SALT)
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", split.alias("split"))
