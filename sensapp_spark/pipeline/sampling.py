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


DSIR_SALT = "sensapp-dsir"
DSIR_BUCKETS = 10_000


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et
    al. 2023, arXiv:2302.03169): score every raw document by how much
    more likely its hashed n-gram features are under a TARGET domain's
    unigram feature model than under the raw corpus's own, then keep a
    deterministic importance resample.

    Features are unigrams + bigrams of the normalized word stream,
    hashed into ``buckets`` ids (the paper's hashed n-gram trick — the
    model is a fixed-width count vector no matter the vocabulary).
    Both models are add-1-smoothed multinomials; the per-document
    score is the summed log-likelihood ratio

        dsir_logratio(d) = Σ_f  ln P_target(f) − ln P_raw(f).

    ``dsir_kept`` replaces the paper's Gumbel-noise resample with a
    salted-hash uniform — keep iff ``ln u < logratio`` with ``u``
    derived from the doc id, so membership is reproducible across
    engines, runs, and partitionings (the same property every sampler
    in this module guarantees).

    Scale shape: the only non-map stages are the two feature-count
    aggregations (map-side-combined, output ≤ ``buckets`` rows each),
    a keyless window over that ≤``buckets``-row model table (bounded
    by construction — NOT corpus-sized), and the per-doc sum. The
    model broadcasts; the corpus never joins itself."""
    from pyspark.sql import Window

    from sensapp_spark.pipeline.dedup import hash32
    from sensapp_spark.pipeline.text import word_ngrams, words_col

    def feats(df: DataFrame) -> DataFrame:
        words = F.col("__words")
        return (
            df.select("doc_id", words_col())
            .select(
                "doc_id",
                F.explode(
                    F.concat(word_ngrams(words, 1), word_ngrams(words, 2))
                ).alias("g"),
            )
            .select(
                "doc_id",
                F.pmod(hash32(F.col("g")), F.lit(buckets)).alias("f"),
            )
        )

    raw_f = feats(docs)
    raw_counts = raw_f.groupBy("f").agg(F.count("*").alias("cr"))
    tgt_counts = (
        feats(target).groupBy("f").agg(F.count("*").alias("ct"))
    )
    # The model table: one row per OBSERVED feature id (≤ buckets).
    # The keyless windows below total each side over this bounded
    # frame — the single-partition exchange moves at most `buckets`
    # rows, independent of corpus size.
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    model = (
        # Both sides are ≤`buckets`-row aggregates; without the hint
        # the unreliable post-aggregation estimates plan a sort-merge.
        raw_counts.join(tgt_counts.hint("shuffle_hash"), "f", "full_outer")
        .select(
            "f",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
        .select(
            "f",
            (
                F.log(F.col("ct") + 1)
                - F.log(F.sum("ct").over(everything) + buckets)
                - F.log(F.col("cr") + 1)
                + F.log(F.sum("cr").over(everything) + buckets)
            ).alias("term"),
        )
    )
    per_doc = (
        raw_f.join(F.broadcast(model), "f")
        .groupBy("doc_id")
        .agg(F.round(F.sum("term"), 6).alias("dsir_logratio"))
    )
    u = (
        sample_bucket(F.col("doc_id"), salt, buckets=MIX_BUCKETS)
        + F.lit(0.5)
    ) / F.lit(float(MIX_BUCKETS))
    return per_doc.select(
        "doc_id",
        "dsir_logratio",
        (F.log(u) < F.col("dsir_logratio")).alias("dsir_kept"),
    )
