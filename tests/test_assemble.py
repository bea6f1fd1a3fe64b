"""Corpus assembly verdict (pipeline/assemble.py): each gate fires, the
first-failure priority holds, and edge cases (empty text, short docs)
resolve deterministically."""

from __future__ import annotations

from sensapp_spark.pipeline.assemble import corpus_verdict


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and naps in the warm "
    "sun with a good friend for the whole afternoon"
)


def test_each_gate_fires_with_priority(spark):
    docs = _docs(
        spark,
        [
            (0, GOOD),                      # kept
            (1, GOOD),                      # duplicate of 0 (0 is canonical)
            (2, "held out benchmark sentence for decontamination checks"),
            (3, "9 8 7 6 5 4 3 2 1 0 % % % %"),   # low quality
            (4, ""),                        # empty -> low_quality (NULL)
        ],
    )
    bench = _docs(
        spark, [(99, "held out benchmark sentence for decontamination checks")]
    )
    out = {r.doc_id: r for r in corpus_verdict(docs, bench).collect()}
    assert out[0].kept and out[0].drop_reason is None
    assert out[1].drop_reason == "duplicate"
    assert out[2].drop_reason == "contaminated"
    assert out[3].drop_reason == "low_quality"
    assert out[4].drop_reason == "low_quality"
    # duplicate outranks contamination: doc 5 = copy of the contaminated
    docs2 = _docs(
        spark,
        [
            (0, "held out benchmark sentence for decontamination checks"),
            (5, "held out benchmark sentence for decontamination checks"),
        ],
    )
    out2 = {r.doc_id: r for r in corpus_verdict(docs2, bench).collect()}
    assert out2[0].drop_reason == "contaminated"  # canonical, still dirty
    assert out2[5].drop_reason == "duplicate"     # dup gate wins


def test_high_perplexity_gate(spark):
    # corpus-trained LM: repeated fluent text is predictable; the
    # one-off random-token doc is not.
    rows = [(i, GOOD) for i in range(8)]
    rows.append((8, "zq wv xk jh pl mn bt cd rs tu yz qa ws ed rf tg"))
    docs = _docs(spark, rows)
    bench = _docs(spark, [(99, "completely unrelated benchmark text")])
    out = {
        r.doc_id: r
        for r in corpus_verdict(
            docs, bench, min_quality=0.0, max_perplexity=10.0
        ).collect()
    }
    assert out[0].kept  # canonical fluent doc survives
    assert all(out[i].drop_reason == "duplicate" for i in range(1, 8))
    assert out[8].drop_reason == "high_perplexity"


def test_short_doc_passes_perplexity_gate_via_quality(spark):
    # a 1-token doc has no bigrams (NULL ppl) — it must not be kept by
    # accident, and must not crash: the quality gate owns it.
    docs = _docs(spark, [(0, GOOD), (1, "x")])
    bench = _docs(spark, [(9, "benchmark words only")])
    out = {r.doc_id: r for r in corpus_verdict(docs, bench).collect()}
    assert out[0].kept
    assert out[1].drop_reason == "low_quality"
