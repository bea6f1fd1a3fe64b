"""Deterministic portable sketches (operators/sketches.py): KMV
distinct estimation and count-min frequency estimation. The
engine-vs-oracle bit-identity is pinned by the driver gate
(catalog_metrics_rollup members); these tests pin the MATH — accuracy
bounds, exact-below-k fallback, CMS' one-sided error — and the
Spark↔DuckDB hash portability directly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sensapp_spark.operators.sketches import (
    CMS_SALTS,
    CMS_W,
    cms_build,
    cms_estimate,
    kmv_distinct,
    portable_hash,
    sql_portable_hash,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 5000 distinct keys, skewed multiplicity 1..5.
    return spark.range(15000).select(
        F.format_string("key-%05d", (F.col("id") % 5000)).alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
    )


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "sensor/42", "", "Ünïcode-π"]
    got = dict(
        spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", portable_hash(F.col("v")).alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for v in vals:
        (want,) = con.execute(
            f"SELECT {sql_portable_hash('?')}", [v]
        ).fetchone()
        assert got[v] == want, v


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.format_string("x%d", "id").alias("k")
    )
    (row,) = kmv_distinct(df, "k", k=256).collect()
    assert row.estimate == 40.0


def test_kmv_estimate_within_bounds(keys):
    (row,) = kmv_distinct(keys, "k", k=256).collect()
    # KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma.
    assert abs(row.estimate - 5000) / 5000 < 0.25


def test_kmv_grouped(keys):
    rows = {r.g: r.estimate for r in kmv_distinct(keys, "k", by="g").collect()}
    assert set(rows) == {"0", "1", "2"}
    for est in rows.values():
        # Each group holds ~5000 distinct keys (every key appears in
        # several groups via the id stripe); just pin the bound.
        assert est > 0


def test_ungrouped_kmv_has_no_global_window(keys):
    """The ungrouped estimator must plan as TakeOrderedAndProject
    (per-partition top-k merged on the driver) — a
    ``Window.partitionBy()`` with no keys would funnel every distinct
    hash through ONE task at 100 TB (round-8 watch item #2)."""
    plan = (
        kmv_distinct(keys, "k", k=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_kmv_duplicates_do_not_inflate(spark):
    once = spark.range(500).select(F.format_string("d%d", "id").alias("k"))
    dup = once.unionByName(once).unionByName(once)
    (a,) = kmv_distinct(once, "k").collect()
    (b,) = kmv_distinct(dup, "k").collect()
    assert a.estimate == b.estimate


def test_cms_estimate_is_one_sided_and_tight(spark):
    # 100 keys with known multiplicities 1..100.
    rows = [(f"c{i:03d}",) for i in range(100) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    probes = df.select("k").distinct()
    est = {
        r.k: r.estimate
        for r in cms_estimate(cms_build(df, "k"), probes, "k").collect()
    }
    truth = {f"c{i:03d}": i + 1 for i in range(100)}
    for k, t in truth.items():
        assert est[k] >= t  # count-min never undercounts
        # With 5050 rows over 2x8192 counters, collisions are rare.
        assert est[k] <= t + 5050 * 3 / CMS_W


def test_cms_unknown_key_estimates_collision_mass_only(spark):
    df = spark.createDataFrame([("a",)] * 10, "k string")
    probes = df.sparkSession.createDataFrame([("zzz",)], "k string")
    (row,) = cms_estimate(cms_build(df, "k"), probes, "k").collect()
    assert row.estimate in (0.0, 10.0)  # 0 unless it collides with 'a'


def test_cms_counter_cardinality_is_bounded(keys):
    counters = cms_build(keys, "k")
    assert counters.count() <= len(CMS_SALTS) * CMS_W
