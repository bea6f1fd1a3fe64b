"""AnnIndexStore: persisted partitioned ANN layouts (IVF + LSH).

Pins the three claims the store makes:

1. stored-layout top-k is BIT-IDENTICAL to the flat-frame path (the
   layouts only change I/O shape, never results);
2. the probe filter reaches the scan as directory-level
   ``PartitionFilters`` (plan-level proof the pruning is real — same
   pin style as test_bucketing.py);
3. the codebook / plane count travels with the layout in the meta
   sidecar, so probes can never run against a foreign assignment.
"""

from __future__ import annotations

import pytest

from sensapp_spark.pipeline.similarity import (
    hyperplane_lsh_topk,
    ivf_centroids,
    ivf_topk,
)
from sensapp_spark.storage.ann import AnnIndexStore

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(embeddings):
    row = embeddings.orderBy("vec_id").first()
    return [float(x) for x in row.embedding]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory, embeddings):
    s = AnnIndexStore(spark, str(tmp_path_factory.mktemp("ann_store")))
    s.write_ivf(embeddings)
    s.write_lsh(embeddings, n_planes=4)
    return s


def test_ivf_store_matches_flat_path(store, embeddings, query_vec):
    flat = [
        (r.vec_id, r.centroid_id, r.cosine)
        for r in ivf_topk(embeddings, query_vec, k=10).collect()
    ]
    stored = [
        (r.vec_id, r.centroid_id, r.cosine)
        for r in store.ivf_topk(query_vec, k=10).collect()
    ]
    assert stored == flat and len(stored) == 10


def test_ivf_store_plan_prunes_partitions(store, query_vec):
    plan = _plan(store.ivf_topk(query_vec, k=10))
    assert "PartitionFilters" in plan
    filters = plan.split("PartitionFilters")[1][:200]
    assert "centroid_id" in filters


def test_ivf_codebook_round_trips(store, embeddings):
    _, cents = store.read_ivf()
    assert cents == ivf_centroids(embeddings)


def test_lsh_store_matches_flat_path(store, embeddings, query_vec):
    flat = [
        (r.vec_id, r.bucket, r.cosine)
        for r in hyperplane_lsh_topk(
            embeddings, query_vec, k=10, n_planes=4
        ).collect()
    ]
    stored = [
        (r.vec_id, r.bucket, r.cosine)
        for r in store.lsh_topk(query_vec, k=10).collect()
    ]
    assert stored == flat and len(stored) == 10


def test_lsh_store_plan_prunes_partitions(store, query_vec):
    plan = _plan(store.lsh_topk(query_vec, k=10))
    assert "PartitionFilters" in plan
    filters = plan.split("PartitionFilters")[1][:200]
    assert "bucket" in filters


def test_missing_layout_raises(store):
    with pytest.raises(FileNotFoundError, match="no ivf layout"):
        store.read_ivf("nope")


def test_kind_mismatch_raises(store):
    with pytest.raises(ValueError, match="is a 'lsh' index"):
        store.read_ivf("embeddings_lsh")
    with pytest.raises(ValueError, match="is a 'ivf' index"):
        store.read_lsh("embeddings_ivf")


def test_meta_lives_inside_committed_version(store):
    """The codebook/plane meta commits INSIDE the version dir (hidden
    `_ann_meta.json`), so one pointer resolution pairs data and meta
    from the same immutable version — the round-6 review's sidecar
    race is structurally impossible."""
    import os

    from sensapp_spark.storage.ann import META_FILE
    from sensapp_spark.storage.lake import resolve_table

    for name in ("embeddings_ivf", "embeddings_lsh"):
        data = resolve_table(store._path(name))
        assert os.path.exists(os.path.join(data, META_FILE))


def test_wrong_dim_query_raises(store):
    with pytest.raises(ValueError, match="dimensions"):
        store.ivf_topk([0.1, 0.2], k=5)
    with pytest.raises(ValueError, match="dimensions"):
        store.lsh_topk([0.1, 0.2], k=5)


def test_rewrite_with_new_codebook_rewires_assignment(
    spark, tmp_path, embeddings
):
    """Re-indexing an existing layout frame drops the stale
    ``centroid_id`` and assigns fresh under the new codebook — the
    stored assignment and the sidecar codebook can never diverge."""
    s = AnnIndexStore(spark, str(tmp_path))
    s.write_ivf(embeddings, nlist=4)
    frame, cents4 = s.read_ivf()
    assert len(cents4) == 4
    # Re-index FROM the stored frame (carries centroid_id) at nlist=8.
    s.write_ivf(frame, nlist=8)
    frame8, cents8 = s.read_ivf()
    assert len(cents8) == 8
    assert frame8.select("centroid_id").distinct().count() > 4
