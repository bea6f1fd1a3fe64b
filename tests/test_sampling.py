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


# -- DSIR importance resampling --------------------------------------------

def _dsir_reference(texts, target_ids, buckets=10_000):
    """Pure-Python replay of dsir_weights: normalized unigram+bigram
    features, md5-hashed, add-1-smoothed log-likelihood ratio."""
    import hashlib
    import math
    import re

    def feats(text):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        words = norm.split(" ") if norm else [""]
        grams = list(words)
        grams += [f"{a} {b}" for a, b in zip(words, words[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets
            for g in grams
        ]

    raw = {d: feats(t) for d, t in texts.items()}
    cr, ct = {}, {}
    for d, fs in raw.items():
        for f in fs:
            cr[f] = cr.get(f, 0) + 1
            if d in target_ids:
                ct[f] = ct.get(f, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    out = {}
    for d, fs in raw.items():
        out[d] = sum(
            math.log(ct.get(f, 0) + 1) - math.log(tt + buckets)
            - math.log(cr.get(f, 0) + 1) + math.log(tr + buckets)
            for f in fs
        )
    return out


def test_dsir_matches_reference_model(spark):
    from sensapp_spark.pipeline.sampling import dsir_weights

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "der hund sitzt auf dem baumstamm",
        4: "le chat est sur le tapis",
        5: "the cat and the dog",
    }
    langs = {1: "en", 2: "en", 3: "de", 4: "fr", 5: "en"}
    docs = spark.createDataFrame(
        [(d, t, langs[d]) for d, t in texts.items()],
        "doc_id long, text string, lang string",
    )
    target = docs.filter(docs.lang == "en")
    out = {r.doc_id: r for r in dsir_weights(docs, target).collect()}
    expected = _dsir_reference(texts, {1, 2, 5})
    assert set(out) == set(texts)
    for d in texts:
        assert out[d].dsir_logratio == pytest.approx(
            round(expected[d], 6), abs=2e-6
        )
    # English docs score above the non-English ones — the whole point.
    assert min(out[d].dsir_logratio for d in (1, 2, 5)) > max(
        out[d].dsir_logratio for d in (3, 4)
    )


def test_dsir_kept_is_hash_deterministic(spark):
    import hashlib
    import math

    from sensapp_spark.pipeline.sampling import MIX_BUCKETS, dsir_weights

    docs = spark.createDataFrame(
        [(i, f"token{i} filler words here", "en" if i % 2 else "xx")
         for i in range(1, 21)],
        "doc_id long, text string, lang string",
    )
    out = {
        r.doc_id: r
        for r in dsir_weights(docs, docs.filter(docs.lang == "en")).collect()
    }
    for d, r in out.items():
        bucket = (
            int(hashlib.md5(f"sensapp-dsir:{d}".encode()).hexdigest()[:8], 16)
            % MIX_BUCKETS
        )
        u = (bucket + 0.5) / MIX_BUCKETS
        assert r.dsir_kept == (math.log(u) < r.dsir_logratio)
    # Partitioning-invariant, like every sampler in the module.
    again = {
        r.doc_id: r
        for r in dsir_weights(
            docs.repartition(7), docs.filter(docs.lang == "en").repartition(3)
        ).collect()
    }
    assert {d: tuple(r) for d, r in out.items()} == {
        d: tuple(r) for d, r in again.items()
    }
