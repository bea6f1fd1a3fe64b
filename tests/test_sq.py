"""Scalar (SQ8) and binary quantization ANN (pipeline/sq.py): recall
floors vs exact brute force, signature-packing parity, encode clamping,
and plan shape (no shuffle before the candidate TakeOrdered)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensapp_spark.pipeline import sq
from sensapp_spark.pipeline.similarity import cosine_topk

SF = "/root/testdata/sf0.001"
K = 20


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]


def _recall(emb, queries, fn):
    total = 0.0
    for q in queries:
        truth = {r.vec_id for r in cosine_topk(emb, q, k=K).collect()}
        got = {r.vec_id for r in fn(q).collect()}
        total += len(truth & got) / K
    return total / len(queries)


def test_sq8_recall_with_rerank_is_near_exact(emb, queries):
    # 8-bit codes barely distort a 64-dim cosine; with a 5x re-rank
    # margin the two-stage search should recover the exact top-k
    # almost perfectly even on sphere-uniform (worst-case) data.
    r = _recall(emb, queries, lambda q: sq.sq_topk(emb, q, k=K))
    assert r >= 0.95, f"SQ8 recall@{K} collapsed: {r:.3f}"


def test_bq_recall_floor(emb, queries):
    # One sign bit per dim is the coarsest quantizer in the family —
    # the floor is correspondingly low, but a collapse to near-random
    # (recall ~K/n = 0.04) still trips it.
    r = _recall(emb, queries, lambda q: sq.bq_topk(emb, q, k=K))
    assert r >= 0.35, f"BQ recall@{K} collapsed: {r:.3f}"


def test_bq_signature_packing_matches_python(spark):
    vecs = [
        ("all-pos", [1.0] * 64),
        ("all-neg", [-1.0] * 64),
        ("alt", [1.0 if i % 2 == 0 else -1.0 for i in range(64)]),
        ("top-bit", [-1.0] * 63 + [1.0]),
        ("zeros", [0.0] * 64),
    ]
    df = spark.createDataFrame(
        [(n, v) for n, v in vecs], "vec_id string, embedding array<float>"
    )
    weights = [
        (1 << i) - (1 << 64) if i == 63 else (1 << i) for i in range(64)
    ]
    w_arr = F.array(*[F.lit(w).cast("bigint") for w in weights])
    sig = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            w_arr,
            lambda x, w: F.when(x > 0, w).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    got = {r.vec_id: r.sig for r in df.select("vec_id", sig.alias("sig")).collect()}
    for name, v in vecs:
        assert got[name] == sq.bq_signature_py(v), name
    # The packed form really is two's complement: the top-bit vector
    # is exactly Long.MIN_VALUE, all-pos is -1.
    assert got["top-bit"] == -(1 << 63)
    assert got["all-pos"] == -1
    assert got["zeros"] == 0


def test_bq_signature_nan_counts_as_positive(spark):
    """Round-9 review: Spark SQL (and DuckDB) order NaN above every
    number, so the engine-side `x > 0` sets a NaN component's bit; the
    Python twin must agree or a NaN-bearing vector disagrees with its
    own stored signature."""
    nan_vec = [float("nan")] * 2 + [-1.0] * 62
    df = spark.createDataFrame(
        [("nan", nan_vec)], "vec_id string, embedding array<float>"
    )
    weights = [
        (1 << i) - (1 << 64) if i == 63 else (1 << i) for i in range(64)
    ]
    w_arr = F.array(*[F.lit(w).cast("bigint") for w in weights])
    sig = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            w_arr,
            lambda x, w: F.when(x > 0, w).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    engine = df.select(sig.alias("sig")).first().sig
    assert engine == sq.bq_signature_py(nan_vec) == 0b11


def test_sq8_codes_clamp_and_roundtrip(spark):
    # A corpus of two vectors pins lo/hi exactly; dequantized values
    # must land back on the originals (codes 0 and 255) and a constant
    # dimension (hi == lo) must not divide by zero.
    df = spark.createDataFrame(
        [(0, [0.0] * 63 + [5.0]), (1, [1.0] * 63 + [5.0])],
        "vec_id long, embedding array<float>",
    )
    lo, hi = sq.sq_stats(df)
    assert lo[0] == 0.0 and hi[0] == 1.0
    assert lo[63] == hi[63] == 5.0
    xhat = sq._sq_dequant(lo, hi, 64)
    rows = {
        r.vec_id: r.xh
        for r in df.select("vec_id", xhat.alias("xh")).collect()
    }
    assert rows[0][0] == 0.0 and rows[1][0] == 1.0
    assert rows[0][63] == 5.0 and rows[1][63] == 5.0


def test_sq_stats_rejects_non_finite_corpus(spark):
    """A NaN component would poison its dimension's max (NaN-greatest
    in both engines) and then encode DIFFERENTLY in Spark (floor→0)
    vs SQL (clamp→255) — sq_stats must refuse instead of silently
    breaking the bit-for-bit replay contract."""
    df = spark.createDataFrame(
        [(0, [float("nan")] + [0.5] * 63), (1, [1.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="finite"):
        sq.sq_stats(df)


def test_dim_validation():
    with pytest.raises(ValueError, match="dimensions"):
        sq.sq_topk(None, [1.0] * 3)
    with pytest.raises(ValueError, match="dimensions"):
        sq.bq_topk(None, [1.0] * 3)


def test_candidate_stage_plans_no_shuffle(emb):
    """Both first stages are map-only scans feeding
    TakeOrderedAndProject — no Exchange before the candidate cut."""
    q = [0.1] * 64
    lo, hi = sq.sq_stats(emb)
    import math

    from sensapp_spark.pipeline.similarity import _dot, _norm

    xhat = sq._sq_dequant(lo, hi, 64)
    normq = math.sqrt(sum(x * x for x in q))
    qlit = F.array(*[F.lit(x) for x in q])
    score = F.round(_dot(xhat, qlit) / (F.lit(normq) * _norm(xhat)), 6)
    cand = (
        emb.select("vec_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(sq.SQ_RERANK)
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
