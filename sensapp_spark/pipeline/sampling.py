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


def sample_bucket(col, salt: str) -> F.Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt ':' id) —
    reproducible across engines (DuckDB computes the identical value
    from the same expression)."""
    h = hash32(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.pmod(h, F.lit(BUCKETS)).cast("int")


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
