"""Sequence-packing manifest (pipeline/packing.py): the distributed
prefix sum must tile the concatenated corpus exactly — every document
starts where the previous one (in salted-hash order) ends, spans the
right number of fixed-length sequences, and the result is a pure
function of content (partitioning-invariant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensapp_spark.pipeline.packing import pack_manifest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c"),                      # 3 tokens
        (2, " ".join(["w"] * 10)),         # 10 tokens
        (3, ""),                           # empty → 1 ws token
        (4, " ".join(["x"] * 7)),          # 7 tokens
        (5, "one two"),                    # 2 tokens
        (6, " ".join(["y"] * 13)),         # 13 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _gstart(row, seq_len):
    return row["pack_seq"] * seq_len + row["pack_off"]


def test_manifest_tiles_the_concatenated_corpus(spark, docs):
    seq_len = 8
    rows = pack_manifest(docs, seq_len=seq_len).collect()
    assert len(rows) == 6
    # Reconstruct global offsets; in offset order each doc starts
    # exactly where the previous ends (concatenation, no gaps).
    ordered = sorted(rows, key=lambda r: (_gstart(r, seq_len), r.doc_id))
    cursor = 0
    for r in ordered:
        assert _gstart(r, seq_len) == cursor
        cursor += r.tok_len
    assert cursor == sum(r.tok_len for r in rows)


def test_span_counts_match_window_arithmetic(spark, docs):
    seq_len = 8
    for r in pack_manifest(docs, seq_len=seq_len).collect():
        gs = _gstart(r, seq_len)
        ge = gs + max(r.tok_len, 1) - 1
        assert r.pack_n_seqs == ge // seq_len - gs // seq_len + 1
        assert 0 <= r.pack_off < seq_len
        # A doc never spans more sequences than its length allows.
        assert r.pack_n_seqs <= (r.tok_len // seq_len) + 2


def test_partitioning_invariant(spark, docs):
    base = {r.doc_id: r for r in pack_manifest(docs, seq_len=8).collect()}
    shuffled = {
        r.doc_id: r
        for r in pack_manifest(
            docs.repartition(7, "text"), seq_len=8
        ).collect()
    }
    assert set(base) == set(shuffled)
    for k in base:
        assert tuple(base[k]) == tuple(shuffled[k])


def test_custom_token_count_column(spark, docs):
    # n_chars as the token metric: manifest arithmetic follows it.
    counted = pack_manifest(
        docs.withColumn("n", F.length("text")),
        seq_len=16,
        token_count=F.col("n"),
    ).collect()
    by_id = {r.doc_id: r.tok_len for r in counted}
    assert by_id[2] == 19  # 10 tokens joined by single spaces
    assert by_id[3] == 0
