"""Text-analysis operators over a ``documents(doc_id, text, …)`` table.

The per-document operators (tokens, quality, language, repetition,
fingerprint, PII) are single-pass Catalyst projections — at 100 TB they
scale linearly with input splits; the corpus-level ones shuffle exactly
once on a small key (term df, source rollup) or posexplode bounded
per-row output (chunking). The regex patterns are ASCII-explicit so the
Java (Spark) and RE2 (DuckDB) dialects agree; every pattern/weight
constant here is imported by the oracle-SQL builder so both engines
compute the same definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, single digits, punctuation marks —
# the shape GPT-style byte-pair pretokenizers produce (letters/digits/
# punctuation split), without a vocab.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^A-Za-z0-9_\s]"
DIGIT_PATTERN = r"[0-9]"
UPPER_PATTERN = r"[A-Z]"

STOPWORDS = {
    "en": "the|a|an|and|or|of|to|in|is|it|that|for|on|with|as|was|are",
    "de": "der|die|das|und|oder|von|zu|im|ist|es|dass|für|auf|mit|als|war",
    "fr": "le|la|les|et|ou|de|du|à|en|est|il|que|pour|sur|avec|comme",
    "es": "el|la|los|las|y|o|de|del|a|en|es|que|para|sobre|con|como",
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # tie-break order, first wins


def _stop_re(lang: str) -> str:
    return rf"\b({STOPWORDS[lang]})\b"


def ws_token_count(col) -> F.Column:
    return F.size(F.split(F.trim(col), r"\s+"))


def token_stat_cols() -> list[F.Column]:
    """Column expressions for token counting — exposed separately so the
    registry's fused profile entry can compute every per-doc metric in
    ONE projection over ONE scan (zero joins) while the standalone
    operator keeps the same definition."""
    t = F.col("text")
    return [
        ws_token_count(t).alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.length(t).alias("chars"),
    ]


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars."""
    return docs.select("doc_id", *token_stat_cols())


# Quality-score weights (arbitrary but fixed; mirrored in the oracle SQL).
QUALITY_WEIGHTS = {
    "w_len": 0.25,       # saturating length credit
    "w_stop": 0.35,      # stopword presence (natural language signal)
    "w_punct": -0.25,    # punctuation-noise penalty
    "w_digit": -0.15,    # digit-soup penalty
}


def quality_score_cols() -> list[F.Column]:
    """Column expressions for the heuristic quality score (see
    ``token_stat_cols`` for why these are exposed).

    Zero denominators (empty or whitespace-only text) yield NULL
    ratios — and therefore a NULL quality — instead of throwing:
    under Spark 4's default ANSI mode an unguarded division is a
    DIVIDE_BY_ZERO poison pill for any streaming query these columns
    ride on (one malformed document would crash-loop the stream from
    its checkpoint)."""
    t = F.col("text")
    length = F.length(t).cast("double")
    words = ws_token_count(t).cast("double")

    def ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6))

    # The composite runs in EXACT DECIMAL arithmetic over the rounded
    # components. Weighted sums of 6-decimal values land on exact
    # half-way points of the 6th decimal constantly (0.25 × x quantizes
    # at quarter-micros), where double rounding is ULP-sensitive and
    # engines disagree; the decimal(18,6) cast normalizes ULP noise and
    # both Spark and DuckDB round exact decimals half-away-from-zero.
    stop_ratio = ratio(F.regexp_count(F.lower(t), F.lit(_stop_re("en"))), words)
    punct_ratio = ratio(F.regexp_count(t, F.lit(PUNCT_PATTERN)), length)
    digit_ratio = ratio(F.regexp_count(t, F.lit(DIGIT_PATTERN)), length)
    len_credit = F.round(F.least(length / F.lit(500.0), F.lit(1.0)), 6)

    def dec(col):
        return col.cast("decimal(18,6)")

    w = {k: F.lit(str(v)).cast("decimal(4,2)") for k, v in QUALITY_WEIGHTS.items()}
    score = (
        w["w_len"] * dec(len_credit)
        + w["w_stop"] * F.least(dec(stop_ratio) * 2, F.lit("1").cast("decimal(18,6)"))
        + w["w_punct"] * dec(punct_ratio)
        + w["w_digit"] * dec(digit_ratio)
    )
    return [
        len_credit.alias("len_credit"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        F.round(score, 6).cast("double").alias("quality"),
    ]


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length/stopword/punct/digit ratios
    combined into one score in [0,1]-ish, rounded for oracle parity."""
    return docs.select("doc_id", *quality_score_cols())


def chunk_plan(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Token-window chunking with overlap — the segmentation every
    pretraining / RAG pipeline applies to long documents before
    tokenization: windows of ``chunk_tokens`` tokens starting every
    ``chunk_tokens - overlap`` tokens (the final window may be short;
    a document shorter than one window is a single chunk).

    Returns (doc_id, chunk_idx, token_start, n_tokens, chunk_fp) where
    ``chunk_fp`` is the md5 of the space-joined chunk text — the
    content fingerprint downstream chunk-level dedup keys on.

    Plan shape: the window starts are a bounded JVM ``sequence`` and
    the chunk text a per-row ``slice`` + ``concat_ws`` — one
    posexplode, no shuffle, chunks co-partitioned with their source
    document (the text analog of ``multimodal.frame_sample_plan``)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    staged = spread_if_needed(docs).select("doc_id", words_col())
    words = F.col("__words")
    n = F.size(words)
    # Window starts: 0, step, 2*step, ... while start < n; guarantee at
    # least one window, and never start a window that only re-covers
    # the tail of the previous one (start + overlap >= n stops).
    last_start = F.greatest(
        F.lit(0), F.floor((n - F.lit(overlap + 1)) / step).cast("int") * step
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(step))
    exploded = staged.select(
        "doc_id", words.alias("__w"), F.posexplode(starts).alias("chunk_idx", "token_start")
    )
    chunk = F.slice(F.col("__w"), F.col("token_start") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.col("token_start").cast("long").alias("token_start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


def lm_perplexity(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Corpus-trained bigram-LM perplexity per document — the classic
    language-model quality filter (CCNet-style: score each document by
    how predictable its text is under an n-gram model; gibberish and
    keyword soup score high perplexity, fluent text low). The LM here
    is trained on the corpus itself, so the operator is fully
    self-contained and SQL-expressible.

    Model: add-alpha smoothed bigram probabilities
    ``P(b|a) = (c(a b) + alpha) / (c(a) + alpha * V)`` with unigram
    counts as the conditioning mass and V the corpus vocabulary size;
    ``ppl(doc) = exp(-mean ln P)`` over the document's bigrams (with
    multiplicity), rounded to 4 decimals. Documents with fewer than two
    tokens have no bigrams and are absent from the output.

    Scale shape: the LM "tables" are two aggregations (bigram counts,
    unigram counts — both map-side combined); scoring is one join of
    the exploded doc-bigram stream against the bigram table keyed by
    the gram string and one against the prefix unigram — the same
    shuffle profile as TF-IDF. V is a broadcast one-row scalar. At a
    real corpus the LM tables are themselves distributed — no driver
    materialization anywhere."""
    staged = spread_if_needed(docs).select("doc_id", words_col())
    words = F.col("__words")
    doc_bigrams = staged.select(
        "doc_id", F.explode(word_ngrams(words, 2)).alias("gram")
    )
    unigrams = staged.select(F.explode(words).alias("token"))
    uni_counts = unigrams.groupBy("token").agg(F.count("*").alias("c_a"))
    # V = row count of the grouped frame — no second distinct
    # aggregation over the raw token stream.
    vocab = uni_counts.agg(F.count("*").cast("double").alias("v"))
    bi_counts = doc_bigrams.groupBy("gram").agg(F.count("*").alias("c_ab"))
    scored = (
        doc_bigrams.join(bi_counts.hint("shuffle_hash"), "gram")
        .withColumn("prefix", F.split(F.col("gram"), " ")[0])
        .join(
            uni_counts.hint("shuffle_hash"),
            F.col("prefix") == F.col("token"),
        )
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log(
                (F.col("c_ab") + F.lit(alpha))
                / (F.col("c_a") + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.exp(-F.avg("lp")), 4).alias("perplexity")
    )


def source_quality(docs: DataFrame) -> DataFrame:
    """Per-source (domain) quality rollup: document count and mean
    quality score — the stat domain-level corpus filtering keys on
    (keep/boost/drop whole sources by aggregate quality). One shuffle
    keyed by source with map-side combine.

    The mean is engine-exact: the 6-decimal quality scores are summed
    as integer micros (lossless) and ONE IEEE division produces the
    mean, so Spark and the SQL oracle emit bit-identical doubles with
    no rounding-boundary sensitivity. Unscored documents (NULL quality
    — empty/whitespace text) are excluded from the mean: the
    denominator is COUNT(quality), the SQL NULL-skipping count, so
    ``avg_quality`` is the mean of SCORED documents, not a zero-padded
    mean. ``n_docs`` still counts every document of the source."""
    q = docs.select("source", *quality_score_cols())
    micro = F.round(F.col("quality") * F.lit(1e6)).cast("long")
    return q.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.sum(micro) / (F.count(micro) * F.lit(1e6))).alias("avg_quality"),
    )


def lang_id_cols() -> list[F.Column]:
    """Column expressions for language ID (the repeated regexp-count
    subtrees inside ``lang_pred`` are evaluated once per row by
    whole-stage-codegen subexpression elimination)."""
    lowered = F.lower(F.col("text"))
    hits = {
        lang: F.regexp_count(lowered, F.lit(_stop_re(lang)))
        for lang in LANG_PRIORITY
    }
    best = F.greatest(*hits.values())
    lang_expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        lang_expr = lang_expr.when(hits[lang] == best, F.lit(lang))
    cols = [hits[lang].alias(f"hits_{lang}") for lang in LANG_PRIORITY]
    cols.append(lang_expr.alias("lang_pred"))
    return cols


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-heuristic language ID: stopword-hit counts per language,
    argmax with fixed priority tie-break. One projection, no shuffle."""
    return docs.select("doc_id", *lang_id_cols())


def normalized_text(col) -> F.Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapsed
    whitespace, trimmed."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def top_terms(docs: DataFrame, k: int = 20, min_len: int = 3) -> DataFrame:
    """Corpus top-k terms by document frequency. Per-document
    ``array_distinct`` BEFORE the explode keeps the shuffle at one row
    per (doc, distinct term) without a separate distinct stage; the
    final top-k is a TakeOrdered over the term-df frame (k rows to the
    driver). Ties at the k-th place break lexicographically so the
    result is deterministic across engines."""
    words = F.split(F.trim(normalized_text(F.col("text"))), r"\s+")
    tok = docs.select(F.explode(F.array_distinct(words)).alias("token"))
    return (
        tok.filter(F.length("token") >= min_len)
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "token")
        .limit(k)
    )


def tfidf_top_term(docs: DataFrame, min_len: int = 3) -> DataFrame:
    """Each document's most characteristic term by smoothed TF-IDF:
    tf = term count / doc token count, idf = ln((N+1)/(df+1)) + 1.

    Plan: one (doc, term) count aggregation, one term-level df
    aggregation, corpus size N as a broadcast single-row cross join,
    then a per-doc rank window. doc_len and df are corpus-/vocabulary-
    sized, so their joins carry shuffle_hash hints: the STATIC planner
    otherwise broadcasts them off unreliable explode-derived size
    estimates (the executed plan showed BroadcastExchange over the
    tokenize subtree) — an OOM cliff at corpus scale that AQE cannot
    undo once a broadcast join is statically planned. Ties break
    lexicographically so the winner is deterministic across engines."""
    words = F.split(F.trim(normalized_text(F.col("text"))), r"\s+")
    tok = docs.select(
        "doc_id", F.explode(words).alias("token")
    ).filter(F.length("token") >= min_len)
    counts = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf_n"))
    doc_len = counts.groupBy("doc_id").agg(F.sum("tf_n").alias("len_n"))
    df_ = counts.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        counts.join(doc_len.hint("shuffle_hash"), "doc_id")
        .join(df_.hint("shuffle_hash"), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf_n") / F.col("len_n"))
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "tfidf")
    )


# ASCII-explicit PII patterns — valid in both Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround.
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4s": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count_cols() -> list[F.Column]:
    t = F.col("text")
    return [
        F.regexp_count(t, F.lit(pat)).alias(name)
        for name, pat in PII_PATTERNS.items()
    ]


def with_pii_flag(counted: DataFrame) -> DataFrame:
    """Adds ``has_pii`` on top of already-computed count columns. Each
    regex runs exactly once: the flag derives from the count columns in
    a second projection (collapsed by Catalyst into one stage, but
    never re-evaluating the regexes — CollapseProject declines to
    inline duplicated non-cheap expressions)."""
    total = None
    for name in PII_PATTERNS:
        c = F.col(name)
        total = c if total is None else total + c
    return counted.withColumn("has_pii", total > 0)


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII indicator counts (emails / phone-shaped numbers /
    IPv4 literals) and an any-hit flag — the redaction-triage pass a
    training pipeline runs before release. Narrow projection, regex
    evaluated JVM-side; at 100 TB this is a map-only scan."""
    return with_pii_flag(docs.select("doc_id", *pii_count_cols()))


def ttr_cols() -> list[F.Column]:
    """Column expressions for the type-token ratio over the materialized
    ``__words`` array from ``words_col``."""
    words = F.col("__words")
    total = F.size(words).cast("double")
    distinct = F.size(F.array_distinct(words)).cast("long")
    return [
        total.cast("long").alias("total_tokens"),
        distinct.alias("distinct_tokens"),
        F.round(distinct / total, 6).alias("ttr"),
    ]


def type_token_ratio(docs: DataFrame) -> DataFrame:
    """Lexical-diversity profile: whitespace token count, distinct token
    count, and their ratio (type-token ratio) over the normalized text.
    The distinct runs per document inside ``array_distinct`` — no
    explode, no shuffle."""
    return docs.select("doc_id", words_col()).select("doc_id", *ttr_cols())


def spread_if_needed(docs: DataFrame) -> DataFrame:
    """Repartition a below-core-count scan up to full parallelism before
    CPU-heavy per-row work (regex + n-gram HOFs) — same size-aware probe
    as ``dedup._tokenized``: at real scale the file layout already
    yields enough splits and no shuffle is added; on a small demo file
    the one-task plan serializes the per-row work (measured 4x at
    sf0.1 for the fused profile)."""
    from sensapp_spark.pipeline.dedup import scan_needs_spread

    if scan_needs_spread(docs):
        return docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
    return docs


def word_ngrams(words: F.Column, n: int) -> F.Column:
    """Array of word n-grams over an ``array<string>`` column; empty for
    inputs shorter than ``n`` (guards ``sequence``'s descending-range
    behavior on negative stops)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals: the fraction of all word
    bigrams occupied by the single most frequent bigram, and the
    fraction of word trigrams that are repeats of an earlier trigram.
    High values mark boilerplate / template / keyword-stuffed documents
    that near-dup passes miss (the repetition is WITHIN one document).

    Shuffle-free: the bigram mode runs inside per-row higher-order
    functions (``transform`` + ``filter`` + ``array_max``), which is
    O(distinct x total) array comparisons per document — the right
    trade for chunked corpora where documents are bounded (a few k
    tokens); an explode + groupBy variant is the fallback for unbounded
    documents. The token array and the gram arrays MUST each be
    materialized behind their own projection (``words_col`` then
    ``gram_cols``): inlined, ``element_at`` inside the n-gram lambda
    re-evaluates the regex normalization+split per ELEMENT (the same
    trap ``dedup._tokenized`` documents, ~15x there), and the gram
    expression re-evaluates per distinct bigram inside the mode HOF —
    measured minutes instead of seconds at sf0.1. CollapseProject
    keeps the stages split because the aliases are non-cheap and
    multiply referenced.
    """
    return (
        spread_if_needed(docs)
        .select("doc_id", words_col())
        .select("doc_id", *gram_cols())
        .select("doc_id", *repetition_cols())
    )


def words_col() -> F.Column:
    """The normalized token array, to MATERIALIZE (own projection)
    before any per-element consumer."""
    return F.split(F.trim(normalized_text(F.col("text"))), r"\s+").alias(
        "__words"
    )


def gram_cols() -> list[F.Column]:
    """Materialized bigram/trigram arrays (from ``__words``) feeding
    ``repetition_cols``."""
    words = F.col("__words")
    return [
        word_ngrams(words, 2).alias("__g2"),
        word_ngrams(words, 3).alias("__g3"),
    ]


def repetition_cols() -> list[F.Column]:
    """Column expressions for the repetition signals over the
    materialized ``__g2``/``__g3`` arrays from ``gram_cols``."""
    g2, g3 = F.col("__g2"), F.col("__g3")
    top2 = F.array_max(
        F.transform(
            F.array_distinct(g2),
            lambda x: F.size(F.filter(g2, lambda y: y == x)),
        )
    )
    n2 = F.size(g2).cast("long")
    n3 = F.size(g3).cast("long")
    return [
        n2.alias("bigram_total"),
        F.when(n2 > 0, F.round(top2 / n2.cast("double"), 6)).alias(
            "top_bigram_frac"
        ),
        n3.alias("trigram_total"),
        F.when(
            n3 > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(g3)) / n3.cast("double"),
                6,
            ),
        ).alias("dup_trigram_frac"),
    ]


def fingerprint_cols() -> list[F.Column]:
    return [F.md5(normalized_text(F.col("text"))).alias("fingerprint")]


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (md5 so the DuckDB
    oracle computes the identical value; a keyed xxhash64 would be the
    production choice)."""
    return docs.select("doc_id", *fingerprint_cols())
