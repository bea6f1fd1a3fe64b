"""Corpus-trained BPE (pipeline/bpe.py) vs an INDEPENDENT pure-Python
reference implementing the same defined semantics (frequency-weighted
pair counting over the word table; merges applied as PASSES
separator-framed literal replaces; ties broken by count then
lexicographic pair). The DuckDB replay is exercised by the registry
oracle (text_terms bpe_merge/bpe_len arms, sample_split BPE packing);
here the distributed trainer itself is checked against a from-scratch
implementation, plus the contract edges."""

from __future__ import annotations

from collections import Counter

from sensapp_spark.pipeline.bpe import (
    PASSES,
    SEP,
    bpe_token_counts,
    train_bpe,
    word_freq,
)


# -- reference implementation (stdlib only, no Spark) -----------------------


def _ref_train(word_freqs: dict[str, int], num_merges: int):
    syms = {w: SEP + SEP.join(w) + SEP for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, f in word_freqs.items():
            parts = syms[w].split(SEP)[1:-1]
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # "count desc, then pair asc" the explicit way (max() with a
        # negated-string key can't express it for variable lengths).
        top = max(pairs.values())
        (a, b) = min(p for p, c in pairs.items() if c == top)
        if top < 2:
            break
        merges.append((a, b, top))
        pat, rep = f"{SEP}{a}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}"
        for w in syms:
            s = syms[w]
            for _ in range(PASSES):
                s = s.replace(pat, rep)
            syms[w] = s
    tokens = {w: s.count(SEP) - 1 for w, s in syms.items()}
    return merges, tokens


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = [
    "the merge order matters the merge order wins",
    "low lower lowest newer newest wider widest",
    "the stream窗 window windows the window",  # non-ascii char is data too
    "scan scan scan table scans scatter",
]


def test_trainer_matches_reference(spark):
    docs = _docs(spark, CORPUS)
    model = train_bpe(docs, num_merges=12, table_partitions=1)

    wf = {
        r.word: r.freq for r in word_freq(docs).collect()
    }
    ref_merges, ref_tokens = _ref_train(wf, 12)
    assert model.merges == ref_merges
    got = {
        r.word: r.n_tokens
        for r in model.words.select("word", "n_tokens").collect()
    }
    assert got == ref_tokens


def test_merges_are_deterministic_across_partitionings(spark):
    docs = _docs(spark, CORPUS)
    m1 = train_bpe(docs, num_merges=8, table_partitions=1).merges
    m2 = train_bpe(
        docs.repartition(7), num_merges=8, table_partitions=3
    ).merges
    assert m1 == m2


def test_token_counts_sum_and_oov_fallback(spark):
    """Per-doc counts = sum of per-word counts over the trained table;
    out-of-vocabulary words fall back to their character count."""
    docs = _docs(spark, CORPUS)
    model = train_bpe(docs, num_merges=8, table_partitions=1)
    per_word = {
        r.word: r.n_tokens for r in model.words.collect()
    }
    counts = {
        r.doc_id: r.bpe_len
        for r in bpe_token_counts(docs, model).collect()
    }
    for i, text in enumerate(CORPUS):
        assert counts[i] == sum(per_word[w] for w in text.lower().split())

    other = _docs(spark, ["zzzq unseenword the"])
    (row,) = bpe_token_counts(other, model).collect()
    assert row.bpe_len == len("zzzq") + len("unseenword") + per_word["the"]


def test_merges_reduce_token_counts_monotonically(spark):
    docs = _docs(spark, CORPUS)
    untrained = train_bpe(docs, num_merges=0)
    trained = train_bpe(docs, num_merges=10, table_partitions=1)
    n0 = {r.word: r.n_tokens for r in untrained.words.collect()}
    n1 = {r.word: r.n_tokens for r in trained.words.collect()}
    assert all(n1[w] <= n0[w] for w in n0)
    assert sum(n1.values()) < sum(n0.values())
    # Untrained = character segmentation.
    assert all(n0[w] == len(w) for w in n0)


def test_training_stops_at_singleton_pairs(spark):
    """Every word distinct and every pair unique → the best remaining
    pair occurs once → training memorizes nothing."""
    docs = _docs(spark, ["ab cd ef gh"])
    model = train_bpe(docs, num_merges=5, table_partitions=1)
    assert model.merges == []


def test_self_overlap_run_semantics_pinned(spark):
    """The documented divergence from Sennrich's lookaround regex: an
    odd self-run segments [aa, a, aa] here (vs [aa, aa, a] there) —
    same token count, deterministic, and identical to the DuckDB
    replay by construction (both are literal left-to-right replaces)."""
    docs = _docs(spark, ["aaaaa aaaaa aa"])
    model = train_bpe(docs, num_merges=1, table_partitions=1)
    assert model.merges[0][:2] == ("a", "a")
    got = {
        r.word: (r.sym, r.n_tokens)
        for r in model.words.collect()
    }
    assert got["aaaaa"][0] == f"{SEP}aa{SEP}a{SEP}aa{SEP}"
    assert got["aaaaa"][1] == 3
    assert got["aa"] == (f"{SEP}aa{SEP}", 1)


def test_registry_arms_agree_with_library(spark):
    """The text_terms bpe arms are the library functions verbatim
    (constants shared with the oracle generator)."""
    from sensapp_spark.plans.pipeline_queries import BPE_MERGES, _bpe_model

    docs = _docs(spark, CORPUS)
    merges, blen = _bpe_model(spark, docs)
    lib = train_bpe(docs, num_merges=BPE_MERGES, table_partitions=1)
    assert [
        (r.doc_id, r.term, r.score) for r in merges.orderBy("doc_id").collect()
    ] == [(i, f"{a} {b}", float(c)) for i, (a, b, c) in enumerate(lib.merges)]
    assert blen.count() == docs.count()


def test_driver_local_gate_matches_distributed_rounds(spark):
    """Round-13: below ``driver_threshold`` training runs the merge
    loop on the driver. Pin local == distributed bit-for-bit — merges
    (incl. win counts), final symbol strings, and token counts — on a
    corpus with non-ASCII symbols and tie-heavy pairs."""
    docs = _docs(spark, CORPUS + ["aaaaa aaaaa aa", "tie tie toe toe"])
    local = train_bpe(docs, num_merges=12, table_partitions=1)
    dist = train_bpe(
        docs, num_merges=12, table_partitions=1, driver_threshold=0
    )
    assert local.merges == dist.merges
    l_rows = {
        r.word: (r.freq, r.sym, r.n_tokens) for r in local.words.collect()
    }
    d_rows = {
        r.word: (r.freq, r.sym, r.n_tokens) for r in dist.words.collect()
    }
    assert l_rows == d_rows
