"""Deterministic embedding clustering: spherical k-means (Lloyd's
algorithm, cosine assignment) with a fixed iteration count and a
data-derived init, over ``embeddings(vec_id, embedding float[], label)``.

Design for 100 TB:

* The codebook (k × dim floats) is the ONLY state that ever leaves the
  executors — collected once per iteration, re-broadcast as literal
  expressions. Assignment is a narrow whole-stage-codegen projection
  (the centroid loop unrolls into one ``array_max`` over (cosine, -cid)
  structs, exactly the IVF pattern) — no shuffle, no Python.
* The update step is one groupBy(cluster) with ``dim`` avg aggregates —
  map-side partials, shuffle bytes ∝ k × dim per input partition.
* Iterations are a fixed, small constant (2 assignment rounds here):
  each round is one job, so the full fit is O(iters) scans. Convergence
  looping belongs to offline training; a pipeline wants reproducible
  output.

Determinism contract (mirrored by the DuckDB oracle in
plans/pipeline_queries.py): init centroids are the first ``k`` vectors
by vec_id; cosines round to 6 decimals before the argmax; ties pick the
smallest centroid id; updated centroids round each coordinate to 6
decimals; clusters left empty by a round simply drop out (both engines
derive the same survivor set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensapp_spark.pipeline.similarity import cosine_similarity

KMEANS_K = 8
KMEANS_ROUNDS = 2  # assignment rounds; updates run between them


def assign_expr(vec, centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Nearest-centroid-by-cosine cluster id as one JVM expression
    (round-6 cosine, smallest-id tie-break)."""
    entries = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        entries.append(
            F.struct(
                F.round(cosine_similarity(vec, c), 6).alias("c"),
                F.lit(-cid).alias("n"),
            )
        )
    best = F.array_max(F.array(*entries))
    return (-best["n"]).cast("int")


def init_centroids(
    embeddings: DataFrame, k: int = KMEANS_K
) -> list[tuple[int, list[float]]]:
    """First ``k`` stored vectors by vec_id — the same deterministic
    data-derived codebook rule as the IVF index (similarity.py), so
    both engines and every scale factor agree without a training step."""
    rows = (
        embeddings.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


def update_centroids(
    assigned: DataFrame, dim: int
) -> list[tuple[int, list[float]]]:
    """One Lloyd update: per-cluster coordinate means, rounded to 6
    decimals. Returns only non-empty clusters, sorted by cluster id.
    The collect is k × dim floats — codebook-sized by construction."""
    aggs = [
        F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(f"c{i}")
        for i in range(dim)
    ]
    rows = assigned.groupBy("cluster").agg(*aggs).orderBy("cluster").collect()
    return [
        (int(r["cluster"]), [float(r[f"c{i}"]) for i in range(dim)])
        for r in rows
    ]


def kmeans_codebook(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    rounds: int = KMEANS_ROUNDS,
    dim: int = 64,
) -> list[tuple[int, list[float]]]:
    """The TRAINED centroids after ``rounds - 1`` Lloyd updates — the
    production IVF codebook (``similarity.ivf_topk(codebook=...)``
    accepts it directly). Driver traffic stays k x dim floats per
    update; the scans are the same ones ``kmeans_assign`` runs."""
    cents = init_centroids(embeddings, k)
    for _ in range(rounds - 1):
        assigned = embeddings.withColumn(
            "cluster", assign_expr(F.col("embedding"), cents)
        )
        cents = update_centroids(assigned, dim)
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    rounds: int = KMEANS_ROUNDS,
    dim: int = 64,
) -> DataFrame:
    """Fit-and-assign: ``rounds`` assignment passes with a centroid
    update between each. Returns (vec_id, cluster)."""
    cents = init_centroids(embeddings, k)
    assigned = embeddings.withColumn(
        "cluster", assign_expr(F.col("embedding"), cents)
    )
    for _ in range(rounds - 1):
        cents = update_centroids(assigned, dim)
        assigned = embeddings.withColumn(
            "cluster", assign_expr(F.col("embedding"), cents)
        )
    return assigned.select("vec_id", "cluster")
