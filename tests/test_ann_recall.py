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


# ---------------------------------------------------------------------------
# Auto-sized hyperplane count (the "more planes, not a bigger cap"
# lever applied automatically) + multi-table recall recovery
# ---------------------------------------------------------------------------

def test_auto_planes_math():
    cap = sim.DEFAULT_MAX_EMB_BUCKET  # 2000 → target occupancy 500
    assert sim.auto_planes(500, cap) == 1       # tiny corpus: floor
    assert sim.auto_planes(32_000, cap) == 6    # ceil(log2(64))
    assert sim.auto_planes(3_200_000, cap) == 13
    assert sim.auto_planes(10**12, cap) == 24   # ceiling
    assert sim.auto_planes(0, cap) == 1


def _synth_vectors(spark, n: int, dim: int = 16):
    """n deterministic pseudo-random unit-cube vectors, built JVM-side
    (hash-derived components — no driver materialization)."""
    from pyspark.sql import functions as F

    comps = [
        ((F.pmod(F.hash(F.col("id"), F.lit(d)), F.lit(2001)) - 1000)
         / 1000.0).cast("float")
        for d in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


@pytest.mark.parametrize("n", [4_000, 16_000, 64_000])
def test_auto_planes_keeps_occupancy_under_cap(spark, n):
    """At 3 corpus sizes spanning 16x, the auto-sized plane count keeps
    every bucket's occupancy under the guard cap with no manual tuning
    (the scenario that previously required hand-raising n_planes)."""
    from pyspark.sql import functions as F

    cap = sim.DEFAULT_MAX_EMB_BUCKET
    b = sim.auto_planes(n, cap)
    planes = sim.hyperplanes(b, 16)
    vecs = _synth_vectors(spark, n)
    sizes = (
        vecs.select(sim.bucket_expr(F.col("embedding"), planes).alias("bk"))
        .groupBy("bk").count()
    )
    max_sz = sizes.agg(F.max("count")).first()[0]
    assert max_sz <= cap, (n, b, max_sz)
    # And the plane count actually scales: 16x more vectors → +4 bits.
    assert sim.auto_planes(16 * n, cap) == min(24, b + 4) or n == 4_000


def test_multi_table_recovers_split_pairs(spark):
    """A near-dup pair split across one table's hyperplane boundary is
    recovered by an independent table; the union dedups cleanly."""
    from pyspark.sql import functions as F

    # Near-dup clusters around hash-derived anchors: pairs (2i, 2i+1)
    # are near-identical, so each SHOULD be found; boundary splits are
    # the only reason one goes missing.
    anchors = _synth_vectors(spark, 200).withColumnRenamed("vec_id", "a_id")
    pts = (
        anchors.select(
            "a_id",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
            "embedding",
        )
        .select(
            (F.col("a_id") * 2 + F.col("j")).alias("vec_id"),
            # 0.02 per component ≈ 0.035 rad: cosine ≈ 0.9994 (still a
            # near-dup at 0.999) while each plane splits the pair with
            # ~1% probability — so table 0 misses a handful of the 200
            # and the independent tables win them back.
            F.transform(
                "embedding",
                lambda x: x + (F.col("j") * F.lit(2e-2)),
            ).cast("array<float>").alias("embedding"),
        )
    )
    def true_pairs(df):
        rows = df.filter(
            (F.col("vec_a") % 2 == 0) & (F.col("vec_b") == F.col("vec_a") + 1)
        ).collect()
        return {(r.vec_a, r.vec_b) for r in rows}

    one = sim.embedding_neardup_pairs(
        pts, threshold=0.999, n_planes=6, n_tables=1, dim=16
    )
    three = sim.embedding_neardup_pairs(
        pts, threshold=0.999, n_planes=6, n_tables=3, dim=16
    )
    r1, r3 = true_pairs(one), true_pairs(three)
    assert r1 <= r3, "multi-table must be a superset of table 0"
    assert len(r3) > len(r1), (
        f"expected boundary-split pairs recovered (t1={len(r1)}, t3={len(r3)})"
    )
    assert len(r3) <= 200
    # Dedup soundness: no (vec_a, vec_b) key appears twice.
    total = three.count()
    assert three.select("vec_a", "vec_b").distinct().count() == total


def test_ivf_precomputed_assignment_layout(spark, emb, queries, tmp_path):
    """ivf_topk over a WRITTEN table that already carries centroid_id
    (the ingest-time partitioned layout) returns the identical top-k as
    the per-query assignment path; its plan contains no assignment
    projection (array_max over the centroid structs) and prunes
    partitions on centroid_id."""
    cents = sim.ivf_centroids(emb)
    path = str(tmp_path / "by_list")
    sim.ivf_assign(emb, cents).write.partitionBy("centroid_id").parquet(path)
    stored = spark.read.parquet(path)
    for q in queries[:2]:
        a = sim.ivf_topk(emb, q, k=10, codebook=cents).collect()
        b = sim.ivf_topk(stored, q, k=10, codebook=cents).collect()
        assert [(r.vec_id, r.cosine) for r in a] == [
            (r.vec_id, r.cosine) for r in b
        ]
    plan = sim.ivf_topk(
        stored, queries[0], k=10, codebook=cents
    )._jdf.queryExecution().executedPlan().toString()
    assert "array_max" not in plan  # no per-query quantization
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1][:150]  # directory-level pruning, not just a row filter


def test_lsh_precomputed_bucket_layout(spark, emb, queries, tmp_path):
    """hyperplane_lsh_topk over a WRITTEN bucket-partitioned table (the
    ingest-time layout) returns the identical top-k as the per-query
    projection path; the plan prunes partitions and multi-table probes
    are rejected (one partition axis serves one plane set)."""
    from pyspark.sql import functions as F

    dim = len(queries[0])
    planes = sim.hyperplanes(4, dim, table=0)
    path = str(tmp_path / "by_bucket")
    emb.withColumn(
        "bucket", sim.bucket_expr(F.col("embedding"), planes)
    ).write.partitionBy("bucket").parquet(path)
    stored = spark.read.parquet(path)
    for q in queries[:2]:
        a = sim.hyperplane_lsh_topk(emb, q, k=10).collect()
        b = sim.hyperplane_lsh_topk(stored, q, k=10, stored_planes=4).collect()
        assert [(r.vec_id, r.cosine) for r in a] == [
            (r.vec_id, r.cosine) for r in b
        ]
    plan = sim.hyperplane_lsh_topk(
        stored, queries[0], k=10, stored_planes=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:150]
    with pytest.raises(ValueError, match="multi-table"):
        sim.hyperplane_lsh_topk(stored, queries[0], k=10, n_tables=2,
                                stored_planes=4)
    # Undeclared layout and plane-count mismatch both fail fast.
    with pytest.raises(ValueError, match="declare the stored"):
        sim.hyperplane_lsh_topk(stored, queries[0], k=10)
    with pytest.raises(ValueError, match="written with"):
        sim.hyperplane_lsh_topk(stored, queries[0], k=10, n_planes=6,
                                stored_planes=4)
