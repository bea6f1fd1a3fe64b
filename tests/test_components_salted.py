"""Connected components (near-dup clusters) and salted top-K tests."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from sensapp_spark.operators.selection import (
    per_sensor_limit,
    per_sensor_limit_salted,
)
from sensapp_spark.pipeline.dedup import neardup_components


# threshold=0 forces the distributed pointer-jumping loop; the default
# exercises the driver union-find fast path.
PATHS = pytest.mark.parametrize("threshold", [0, 1_000_000],
                                ids=["distributed", "driver"])


def components_of(spark, edges, threshold):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = neardup_components(df, driver_threshold=threshold).collect()
    comps: dict[int, set] = {}
    for r in rows:
        comps.setdefault(r.component, set()).add(r.doc_id)
    return {frozenset(v) for v in comps.values()}


@PATHS
def test_components_chain(spark, threshold):
    # A-B, B-C, C-D: one component even though A-D never scored.
    assert components_of(spark, [(1, 2), (2, 3), (3, 4)], threshold) == {
        frozenset({1, 2, 3, 4})}


@PATHS
def test_components_disjoint_clusters(spark, threshold):
    got = components_of(spark, [(1, 2), (5, 6), (6, 7), (10, 11)], threshold)
    assert got == {frozenset({1, 2}), frozenset({5, 6, 7}),
                   frozenset({10, 11})}


@PATHS
def test_components_cycle(spark, threshold):
    assert components_of(spark, [(1, 2), (2, 3), (3, 1)], threshold) == {
        frozenset({1, 2, 3})}


@PATHS
def test_components_label_is_min_doc_id(spark, threshold):
    df = spark.createDataFrame([(9, 4), (4, 7)], "doc_a long, doc_b long")
    labels = {r.doc_id: r.component
              for r in neardup_components(df, driver_threshold=threshold).collect()}
    assert labels == {4: 4, 7: 4, 9: 4}


def test_components_deep_chain_converges(spark):
    # Long path graph exercises multiple pointer-jumping rounds on the
    # distributed path specifically.
    edges = [(i, i + 1) for i in range(0, 30)]
    got = components_of(spark, edges, threshold=0)
    assert got == {frozenset(range(31))}


@pytest.fixture(scope="module")
def skewed_values(spark):
    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # One hot sensor with 2000 rows, two cold sensors with 10 each.
    for i in range(2000):
        rows.append(("hot", t0 + dt.timedelta(seconds=rng.randint(0, 10**6)),
                     float(i)))
    for s in ("cold1", "cold2"):
        for i in range(10):
            rows.append((s, t0 + dt.timedelta(seconds=i), float(i)))
    return spark.createDataFrame(
        rows, "sensor_id string, time timestamp, value double").cache()


def test_salted_topk_equals_plain(skewed_values):
    for k in (1, 5, 50):
        plain = {(r.sensor_id, r.time, r.value)
                 for r in per_sensor_limit(
                     skewed_values, k, tiebreakers=["value"]).collect()}
        salted = {(r.sensor_id, r.time, r.value)
                  for r in per_sensor_limit_salted(
                      skewed_values, k, tiebreakers=["value"]).collect()}
        assert salted == plain, f"k={k}"


def test_salted_topk_phase1_parallelism(skewed_values):
    # Phase 1 must rank on (sensor, salt) — visible as a window spec with
    # two partition columns in the plan.
    df = per_sensor_limit_salted(skewed_values, 3, salt_partitions=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert plan.count("WindowGroupLimit") >= 2  # both phases prune map-side
