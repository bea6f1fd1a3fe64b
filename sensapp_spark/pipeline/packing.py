"""Sequence packing — the concat-and-chunk manifest a pretraining
loader needs: the corpus is shuffled deterministically (salted content
hash), concatenated, and sliced into fixed token-length sequences;
each document's slice coordinates come back as a per-doc manifest row
so any training sequence can be materialized with one ranged read of
the few documents that overlap it.

Beyond the reference's scope (sensapp stops at time-series queries) —
the operator implements the packing step of GPT-style pretraining
("documents are packed into sequences of 2048 tokens", Brown et al.
2020, arXiv:2005.14165 §2.2) as a DISTRIBUTED PREFIX SUM:

  phase 1  per-bucket cumulative token sums — the window partitions on
           a hash-prefix bucket, so no partition exceeds ~1/B of the
           corpus regardless of total size;
  phase 2  bucket base offsets — a window over the B-row per-bucket
           totals (bounded by construction: B rows, default 256, ~KBs)
           broadcast back to phase 1.

Nothing is ordered globally and nothing collects to the driver; at
100 TB the only global object is the B-row offset table. The global
order is (hkey, doc_id) — and because the bucket IS the leading hex
prefix of hkey, ordering (bucket, hkey, doc_id) is the same total
order, which is what lets the per-bucket cumsums compose exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensapp_spark.pipeline.text import ws_token_count

DEFAULT_SEQ_LEN = 2048
DEFAULT_BUCKETS = 256  # one leading hex byte of the md5 order key
PACK_SALT = "sensapp-pack"


def pack_manifest(
    docs: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    salt: str = PACK_SALT,
    token_count: F.Column | None = None,
) -> DataFrame:
    """Per-document packing manifest: ``(doc_id, tok_len, pack_seq,
    pack_off, pack_n_seqs)``.

    ``pack_seq`` is the first fixed-length sequence the document lands
    in, ``pack_off`` the token offset inside it, ``pack_n_seqs`` how
    many consecutive sequences the document spans (empty documents
    occupy zero tokens but still report the sequence the cursor sits
    in, spanning 1). Deterministic across runs, engines, and partition
    counts — the order key is a salted md5 of doc_id, not any physical
    layout.

    ``token_count`` defaults to the whitespace tokenizer shared with
    ``text.token_stats`` so manifest token arithmetic matches the
    profiling surface users already see.
    """
    if token_count is None:
        token_count = ws_token_count(F.col("text"))
    hkey = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))
    )
    toks = docs.select(
        "doc_id",
        token_count.cast("long").alias("tok_len"),
        hkey.alias("hkey"),
    ).withColumn(
        # Leading hex byte of the order key: the bucket is a PREFIX of
        # the order key, so (bucket, hkey, doc_id) == (hkey, doc_id)
        # as a total order and per-bucket cumsums compose globally.
        "bucket",
        F.conv(F.substring("hkey", 1, 2), 16, 10).cast("int"),
    )

    per_bucket = Window.partitionBy("bucket").orderBy("hkey", "doc_id")
    within = toks.withColumn("cum", F.sum("tok_len").over(per_bucket))

    # Phase 2: base offset of each bucket = sum of all earlier buckets'
    # totals. The keyless window here is INTENTIONALLY tiny — its input
    # is the per-bucket aggregate, at most DEFAULT_BUCKETS rows by
    # construction, so the single-partition exchange moves ~KBs.
    totals = toks.groupBy("bucket").agg(F.sum("tok_len").alias("btot"))
    base_w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "bucket",
        (F.sum("btot").over(base_w) - F.col("btot")).alias("base"),
    )

    joined = within.join(F.broadcast(offsets), "bucket")
    gstart = F.col("base") + F.col("cum") - F.col("tok_len")
    gend = gstart + F.greatest(F.col("tok_len"), F.lit(1)) - 1
    return joined.select(
        "doc_id",
        "tok_len",
        F.floor(gstart / seq_len).alias("pack_seq"),
        (gstart % seq_len).alias("pack_off"),
        (F.floor(gend / seq_len) - F.floor(gstart / seq_len) + 1).alias(
            "pack_n_seqs"
        ),
    )
