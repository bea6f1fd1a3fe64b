"""Deterministic samplers (pipeline/sampling.py) — the oracle entry
``sample_split`` covers cross-engine parity; these pin the
temperature-mix math (Conneau & Lample 2019 §3.1 language sampling)
and the determinism contracts directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensapp_spark.pipeline.sampling import (
    MIX_BUCKETS,
    mix_rates,
    temperature_mix,
)


def test_mix_rates_t1_is_natural_mix():
    assert mix_rates({"a": 1, "b": 10, "c": 100}, 1.0) == {
        "a": MIX_BUCKETS, "b": MIX_BUCKETS, "c": MIX_BUCKETS,
    }


def test_mix_rates_downweights_large_sources():
    """T>1: keep rate ∝ w^(1/T − 1) — the biggest source is sampled
    hardest, the smallest keeps everything."""
    r = mix_rates({"small": 1, "big": 100}, 2.0)
    assert r["small"] == MIX_BUCKETS
    assert r["big"] == pytest.approx(MIX_BUCKETS * 100 ** -0.5, abs=1)
    # Resulting mixture proportions ∝ w^(1/T): big/small = 10, not 100.
    assert (100 * r["big"]) / (1 * r["small"]) == pytest.approx(
        10.0, rel=1e-4
    )


def test_mix_rates_rejects_bad_inputs():
    with pytest.raises(ValueError, match="temperature"):
        mix_rates({"a": 1}, 0)
    with pytest.raises(ValueError, match="weights"):
        mix_rates({}, 1.0)
    with pytest.raises(ValueError, match="weights"):
        mix_rates({"a": 0}, 1.0)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "srcA" if i % 2 == 0 else "srcB") for i in range(2000)],
        "doc_id long, source string",
    )


def test_temperature_mix_proportions_and_determinism(docs):
    weights = {"srcA": 1, "srcB": 100}
    kept = temperature_mix(docs, weights, temperature=2.0)
    counts = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # srcA keeps ~everything, srcB ~10%.
    assert counts["srcA"] == 1000
    assert 60 <= counts["srcB"] <= 140
    # Deterministic: a second run returns the identical kept set.
    a = {r.doc_id for r in kept.collect()}
    b = {
        r.doc_id
        for r in temperature_mix(docs, weights, temperature=2.0).collect()
    }
    assert a == b


def test_temperature_mix_unknown_source_dropped(docs):
    kept = temperature_mix(docs, {"srcA": 1}, temperature=2.0)
    assert kept.filter(F.col("source") == "srcB").count() == 0


def test_temperature_mix_membership_stable_under_growth(docs):
    """New documents join the mix without disturbing old membership —
    the incremental-re-run contract of every sampler here."""
    weights = {"srcA": 4, "srcB": 1}
    half = docs.filter(F.col("doc_id") < 1000)
    kept_half = {
        r.doc_id
        for r in temperature_mix(half, weights, temperature=3.0).collect()
    }
    kept_full = {
        r.doc_id
        for r in temperature_mix(docs, weights, temperature=3.0).collect()
    }
    assert kept_half == {d for d in kept_full if d < 1000}
