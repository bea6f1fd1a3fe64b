"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions derived from the payload hash) so the Spark-side plumbing —
schema, batch shape, partitioning — is real and testable end-to-end.
Swap ``_decode_one`` for a PIL/ffmpeg call in production; nothing else
changes.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
feature extraction is a narrow mapInPandas — no shuffle; downstream
joins happen on the small extracted-feature frame, never on the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha_prefix", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def attach_binary(docs: DataFrame, spread: bool = False) -> DataFrame:
    """Demo adapter: treat each document's utf-8 bytes as an opaque media
    payload with typed metadata — the real pipeline reads payloads from
    object storage with ``binaryFile`` or parquet binary columns.

    ``spread=True`` repartitions a below-core-count input up to full
    parallelism so a CPU-heavy decode isn't serialized into a few Python
    workers. Off by default: real media tables arrive with many file
    splits (binaryFile yields one split per file) where the shuffle is a
    no-op, and on small demo inputs the shuffle + per-partition Python
    worker spin-up costs far more than the stub decode saves."""
    if spread:
        parallelism = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < parallelism:
            docs = docs.repartition(parallelism)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _decode_one(payload: bytes, fake: bool) -> tuple[int | None, int | None]:
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not in this container; "
            "pass fake=True for the deterministic stub"
        )
    # Deterministic fake: dimensions from the content hash.
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The worker function is a self-contained closure (no module-level
    references) so cloudpickle ships it by value — workers need no
    importable ``sensapp_spark`` on their path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def decode(payload: bytes) -> tuple[int | None, int | None]:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/libvips — not in this container"
                )
            h = _hl.md5(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            dims = [decode(p) for p in payloads]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) for p in payloads],
                    "sha_prefix": [
                        _hl.sha256(p).hexdigest()[:16] for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes a (stubbed) frame index
    list per payload — the real kernel would emit decoded frames. Shows
    the schema/partitioning shape: one row per sampled frame, frames
    co-partitioned with their source media."""
    n_frames = (F.length("payload") % 300 + 1).cast("int")  # fake frame count
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx"),
        F.lit(None).cast("binary").alias("frame_payload"),  # stub
    )
