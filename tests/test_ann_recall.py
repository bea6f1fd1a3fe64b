"""Measured ANN recall vs exact brute-force cosine — approximate
operators must come with recall evidence, not just plan shapes.

The numbers are deterministic (fixed testdata + md5-derived planes /
first-k IVF codebook), so the floors pin real regressions; the margins
below the measured values (BASELINE.md "ANN recall" table) absorb
nothing — any drop means the index changed. The synthetic embeddings
are near-uniform on the sphere (no cluster structure), which is the
WORST case for hyperplane LSH; IVF holds 0.89+ even there.
"""

from __future__ import annotations

import pytest

from sensapp_spark.pipeline import similarity as sim

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
        truth = {r.vec_id for r in sim.cosine_topk(emb, q, k=K).collect()}
        got = {r.vec_id for r in fn(q).collect()}
        total += len(truth & got) / K
    return total / len(queries)


def test_ivf_recall_floor(emb, queries):
    r = _recall(emb, queries, lambda q: sim.ivf_topk(emb, q, k=K))
    assert r >= 0.80, f"IVF recall@{K} collapsed: {r:.3f}"


def test_lsh_recall_floor_and_table_lever(emb, queries):
    r1 = _recall(
        emb, queries, lambda q: sim.hyperplane_lsh_topk(emb, q, k=K)
    )
    r2 = _recall(
        emb,
        queries,
        lambda q: sim.hyperplane_lsh_topk(emb, q, k=K, n_tables=2),
    )
    assert r1 >= 0.40, f"LSH recall@{K} collapsed: {r1:.3f}"
    # The multi-table lever must actually buy recall.
    assert r2 > r1, f"2-table recall {r2:.3f} not above 1-table {r1:.3f}"


def test_tables_probe_independent_planes():
    t0 = sim.hyperplanes(4, 8, table=0)
    t1 = sim.hyperplanes(4, 8, table=1)
    assert t0 != t1
    # table 0 must keep the original unsalted constants
    assert t0 == sim.hyperplanes(4, 8)


def test_ivf_accepts_trained_codebook(emb, queries):
    from sensapp_spark.pipeline.clustering import kmeans_codebook

    cb = kmeans_codebook(emb, rounds=3)
    r = _recall(
        emb, queries, lambda q: sim.ivf_topk(emb, q, k=K, codebook=cb)
    )
    # Functional floor: the trained codebook is a drop-in (recall on
    # this near-uniform corpus measures slightly BELOW the first-nlist
    # default — recorded in BASELINE.md; it wins on clustered corpora).
    assert r >= 0.6, f"trained-codebook IVF collapsed: {r:.3f}"
