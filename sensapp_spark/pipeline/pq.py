"""Product quantization (PQ) ANN: compress each embedding into ``m``
sub-codebook codes and score queries against the codes alone via
asymmetric distance computation (ADC) — Jégou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011.

Why this matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its
PQ code (m=8, ksub=16) is 8 codes ≤ 4 bits each — a 64× compression
that turns the scan side of ANN from IO-bound to CPU-trivial, and the
scoring into ``m`` table lookups + adds per row. The code table can be
re-scanned for every query without touching the raw vectors; the exact
re-rank (optional) touches only the ADC top-k' rows.

Spark shape:

* TRAIN (:func:`pq_codebooks`): per-subspace k-means, deterministic like
  the IVF/spherical-kmeans codebooks (init = subvectors of the first
  ``ksub`` vectors by vec_id; L2 argmin assignment with distances
  rounded to 6 decimals, smallest-code tie-break; coordinate-mean
  update rounded to 6; empty codes drop out). The one Lloyd update for
  ALL subspaces is fused into a single job: explode (subspace, code,
  subvector) structs, one groupBy — driver traffic is the
  ``m × ksub × dsub`` codebook only. At corpus scale you train on a
  deterministic sample (``vec_id % s == 0``-style) and encode the full
  corpus; the fit here uses the whole frame because the test corpora
  are codebook-sized.
* ENCODE / SCORE (:func:`pq_topk`): assignment and ADC scoring are ONE
  whole-stage-codegen projection — the argmin structs carry the
  query-side lookup-table values (dot(q_m, c) and |c|²) as literal
  struct fields, so the "table lookup" is free: ``array_min`` picks the
  code and its LUT entries together. No shuffle, no Python, no second
  pass; top-k is TakeOrderedAndProject.

The ADC score approximates cosine(q, x) by cosine(q, x̂) where x̂ is the
concatenation of the assigned sub-centroids: numerator
Σ_m dot(q_m, c_m), norm √(Σ_m |c_m|²) — rounded to 6 decimals like
every similarity operator here, and replayed exactly by the DuckDB
oracle (plans/pipeline_queries.py)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 8        # subspaces
PQ_KSUB = 16    # codes per subspace
PQ_ROUNDS = 2   # assignment rounds (one Lloyd update between)


def _assign_struct(
    emb, offset: int, cents: list[tuple[int, list[float]]],
    query_sub: list[float] | None = None,
) -> F.Column:
    """Argmin-by-L2 over one subspace as ``array_min`` of (distance,
    code[, dot(q_m,c), |c|²]) structs — deterministic smallest-code
    tie-break via the struct ordering; the optional query-LUT fields
    ride along so ADC scoring needs no lookup join.

    The codebook enters the plan as ONE nested-array LITERAL walked by
    higher-order functions, not as unrolled per-centroid expression
    trees: the unrolled form (ksub structs × dsub-term distances ×
    m subspaces) blows past Janino's 64 KiB method limit and drops the
    whole projection out of codegen (measured: 25 s interpreted vs
    ~1 s codegen at 2k vectors). Distances accumulate left-to-right
    (fold from 0.0) so the oracle's textual expansion sums in the
    identical IEEE order, and round to 6 decimals like every similarity
    operator here."""
    dsub = len(cents[0][1])
    sub = F.slice(emb, offset + 1, dsub)
    cvecs = F.lit([[float(x) for x in cv] for _, cv in cents])
    codes = F.lit([int(j) for j, _ in cents])

    def dist(c):
        return F.round(
            F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )

    if query_sub is None:
        entries = F.transform(
            cvecs,
            lambda c, i: F.struct(
                dist(c).alias("d"),
                F.element_at(codes, i + 1).alias("j"),
            ),
        )
    else:
        dq = F.lit([
            float(sum(q * x for q, x in zip(query_sub, cv)))
            for _, cv in cents
        ])
        n2 = F.lit([float(sum(x * x for x in cv)) for _, cv in cents])
        entries = F.transform(
            cvecs,
            lambda c, i: F.struct(
                dist(c).alias("d"),
                F.element_at(codes, i + 1).alias("j"),
                F.element_at(dq, i + 1).alias("dq"),
                F.element_at(n2, i + 1).alias("n2"),
            ),
        )
    return F.array_min(entries)


def _round6_py(x: float) -> float:
    """Python twin of Spark's ``round(x, 6)``: shortest-round-trip
    decimal repr scaled HALF_UP (java BigDecimal.valueOf(d).setScale(6,
    HALF_UP)) — ties away from zero, like the engine and the DuckDB
    oracle. Matches for every value whose shortest repr the two
    runtimes agree on (all values this corpus produces; the oracle
    hash gate pins it end-to-end)."""
    if not math.isfinite(x):
        return x
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _codebooks_local(
    train: list[tuple[int, list[float]]],
    m: int,
    ksub: int,
    rounds: int,
    dsub: int,
) -> list[list[tuple[int, list[float]]]]:
    """Driver-local twin of the distributed codebook fit (round 14):
    the identical init (subvectors of the first ``ksub`` vectors by
    vec_id), the identical L2 argmin — distances accumulate
    left-to-right from 0.0 exactly like the ``aggregate`` fold, round
    to 6, smallest-code tie-break — and the coordinate-mean update
    rounded to 6. Replaces one Spark job per Lloyd round (plus the
    init collect) with in-process loops over the already-collected
    corpus; the distributed path remains for corpora above the gate."""
    import numpy as np

    init = [vec for vid, vec in train if vid < ksub][:ksub]
    books = [
        [
            (j, [float(vec[mi * dsub + i]) for i in range(dsub)])
            for j, vec in enumerate(init)
        ]
        for mi in range(m)
    ]
    # Vectorized twin of the scalar loop (round 14, guide §1.2 — this
    # loop was ~1 s of every ann_ivf construction): bit-identical by
    # construction. Distances accumulate per COORDINATE with elementwise
    # numpy adds in index order — the identical ``acc = acc + t_i``
    # IEEE sequence (np.sum would use pairwise reduction and is NOT
    # used). Rounding is monotone non-decreasing, so the round-6 argmin
    # winner always lies within ``unrounded_min + 2e-6`` (two rounded
    # values can only tie when the raw gap is ≤ 1e-6 + representation
    # slop); only that tie window goes through the exact-but-slow
    # ``_round6_py``, cutting Decimal calls ~ksub-fold. Group mean sums
    # run through np.add.accumulate — sequential by definition — over
    # rows in vec_id order, the same order the scalar loop visited.
    X = np.array([vec for _, vec in train], dtype=np.float64)
    for _ in range(rounds - 1):
        sums: dict[tuple[int, int], list] = {}
        for mi in range(m):
            off = mi * dsub
            sub = X[:, off:off + dsub]
            codes_mi = [j for j, _ in books[mi]]
            C = np.array([cv for _, cv in books[mi]], dtype=np.float64)
            acc = np.zeros((sub.shape[0], C.shape[0]))
            for i in range(dsub):
                diff = sub[:, i:i + 1] - C[None, :, i]
                acc = acc + diff * diff
            dmin = acc.min(axis=1)
            for r in range(acc.shape[0]):
                row = acc[r]
                cand = np.nonzero(row <= dmin[r] + 2e-6)[0]
                best_j = min(
                    (( _round6_py(float(row[c])), codes_mi[c])
                     for c in cand)
                )[1]
                ent = sums.setdefault((mi, best_j), [0, []])
                ent[0] += 1
                ent[1].append(r)
        books = [[] for _ in range(m)]
        for (mi, code), (n, rows) in sums.items():
            off = mi * dsub
            g = X[np.array(rows), off:off + dsub]
            s = (
                np.add.accumulate(g, axis=0)[-1]
                if g.shape[0] > 1 else g[0]
            )
            books[mi].append(
                (code, [_round6_py(float(v) / n) for v in s])
            )
        for b in books:
            b.sort()
    return books


def pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rounds: int = PQ_ROUNDS,
    dim: int = 64,
    train: list[tuple[int, list[float]]] | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace codebooks: ``books[mi]`` is [(code, centroid), …]
    sorted by code, after ``rounds − 1`` fused Lloyd updates.

    ``train`` (from ``similarity.collect_train_vectors``) fits the
    books driver-locally — the same init, argmin, and rounded mean
    update without the per-round Spark jobs (the coordinate mean sums
    in vec_id order instead of partition order; both land on the same
    round-6 value, pinned by the oracle gate exactly like the
    distributed path's own order vs DuckDB's)."""
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m {m}")
    dsub = dim // m
    if train is not None:
        return _codebooks_local(train, m, ksub, rounds, dsub)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    init = (
        emb.filter(F.col("vec_id") < ksub).orderBy("vec_id").collect()
    )
    books = [
        [
            (j, [float(r.emb[mi * dsub + i]) for i in range(dsub)])
            for j, r in enumerate(init)
        ]
        for mi in range(m)
    ]
    for _ in range(rounds - 1):
        structs = [
            F.struct(
                F.lit(mi).alias("mi"),
                _assign_struct(
                    F.col("emb"), mi * dsub, books[mi]
                )["j"].alias("code"),
                *[
                    F.col("emb")[mi * dsub + i].alias(f"x{i}")
                    for i in range(dsub)
                ],
            )
            for mi in range(m)
        ]
        rows = (
            emb.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.*")
            .groupBy("mi", "code")
            .agg(*[
                F.round(F.avg(f"x{i}"), 6).alias(f"c{i}")
                for i in range(dsub)
            ])
            .collect()
        )
        books = [[] for _ in range(m)]
        for r in rows:
            books[int(r.mi)].append(
                (int(r.code), [float(r[f"c{i}"]) for i in range(dsub)])
            )
        for b in books:
            b.sort()
    return books


def _best_per_subspace(
    emb,
    books: list[list[tuple[int, list[float]]]],
    dsub: int,
    query: list[float] | None = None,
) -> F.Column:
    """All ``m`` subspace argmins as ONE literal-walk expression
    (round 14; the round-13 ``_assign_best`` precedent applied to PQ):
    ``transform`` over the subspace index walks a single nested
    (m × ksub × dsub) codebook literal instead of ``m`` separately
    analyzed ``_assign_struct`` trees — measured 2.9-3.9 s of
    per-entry Catalyst analysis collapsing to one tree. Per-element
    semantics are IDENTICAL: the same left-to-right ``(x-y)²`` fold
    from 0.0, ``round(…, 6)``, and the (distance, code[, dq, n2])
    struct ordering with its smallest-code tie-break.

    Returns an array of ``m`` structs (one argmin winner per
    subspace, in subspace order)."""
    from sensapp_spark.pipeline.similarity import sql_array_lit

    cvecs = sql_array_lit([
        [[float(x) for x in cv] for _, cv in cents] for cents in books
    ], depth=3)
    codes = sql_array_lit(
        [[int(j) for j, _ in cents] for cents in books], depth=2
    )
    if query is not None:
        dqs = sql_array_lit([
            [
                float(sum(
                    q * x for q, x in zip(
                        query[mi * dsub:(mi + 1) * dsub], cv
                    )
                ))
                for _, cv in cents
            ]
            for mi, cents in enumerate(books)
        ], depth=2)
        n2s = sql_array_lit([
            [float(sum(x * x for x in cv)) for _, cv in cents]
            for cents in books
        ], depth=2)

    def best(mi):
        sub = F.slice(emb, (mi - 1) * dsub + 1, dsub)

        def entry(c, i):
            d = F.round(
                F.aggregate(
                    F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
                6,
            )
            fields = [
                d.alias("d"),
                F.element_at(F.element_at(codes, mi), i + 1).alias("j"),
            ]
            if query is not None:
                fields.append(
                    F.element_at(F.element_at(dqs, mi), i + 1).alias("dq")
                )
                fields.append(
                    F.element_at(F.element_at(n2s, mi), i + 1).alias("n2")
                )
            return F.struct(*fields)

        return F.array_min(F.transform(F.element_at(cvecs, mi), entry))

    return F.transform(
        F.sequence(F.lit(1), F.lit(len(books))), best
    )


def pq_encode(
    embeddings: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes array<int>) — the stored representation; a
    map-only projection."""
    m = len(books)
    dsub = dim // m
    emb = F.col("embedding").cast("array<double>")
    codes = F.transform(
        _best_per_subspace(emb, books, dsub), lambda s: s["j"]
    )
    return embeddings.select("vec_id", codes.alias("codes"))


def pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rounds: int = PQ_ROUNDS,
    dim: int = 64,
    rerank: int | None = None,
    train: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """ADC top-k: (vec_id, score) where score ≈ cosine(query, vector),
    computed from the PQ codes alone. Encode + LUT lookup + top-k fuse
    into one codegen projection feeding TakeOrderedAndProject.

    ``rerank=k'`` enables the standard two-stage search (PQ paper §V):
    ADC selects the top ``k'`` candidates from the compressed
    representation, then EXACT cosine re-ranks just those ``k'`` rows —
    ``score`` is then the exact cosine. At 100 TB the first stage scans
    codes only (64× smaller than the vectors); the second touches k'
    rows via a broadcast semi-join on vec_id.

    NOT the production entry point: this convenience form RE-TRAINS
    both codebooks on every call (k-means over the corpus) so a replay
    — and the DuckDB oracle — sees deterministic books. Production
    trains once and persists: ``storage/ann.write_ivfpq`` stores codes
    + both codebooks in the versioned layout and ``ivfpq_topk`` probes
    them with partition pruning — same scoring math, none of the
    training cost. (Same loudness rule as ``kmv_distinct``'s
    approx_count_distinct note.)"""
    if len(query) != dim:
        raise ValueError(
            f"query has {len(query)} dimensions, corpus has {dim}"
        )
    books = pq_codebooks(embeddings, m, ksub, rounds, dim, train=train)
    dsub = dim // m
    q = [float(x) for x in query]
    normq = math.sqrt(sum(x * x for x in q))
    emb = F.col("embedding").cast("array<double>")
    # One literal-walk expression for all m subspace argmins (see
    # _best_per_subspace). The dq/n2 sums fold left-to-right STARTING
    # from subspace 1's value — the identical IEEE sequence as the old
    # unrolled ``b1.dq + b2.dq + …`` chain (an ``aggregate`` from 0.0
    # would differ only on an all-(-0.0) chain, so the init is the
    # first element, not a literal zero).
    bests = _best_per_subspace(emb, books, dsub, query=q)
    # The whole score is ONE aggregate over ``bests`` with a finish
    # lambda: referencing ``bests`` from several expressions would
    # re-evaluate the full argmin walk per reference (subexpression
    # elimination does not hoist across higher-order-function
    # boundaries — measured 1.3→3.8 s exec on the 2-reference form).
    # The ``first`` flag makes the fold START from subspace 1's value,
    # preserving the old unrolled ``b1.dq + b2.dq + …`` IEEE sequence.
    score = F.aggregate(
        bests,
        F.struct(
            F.lit(0.0).alias("num"),
            F.lit(0.0).alias("n2"),
            F.lit(True).alias("first"),
        ),
        lambda acc, s: F.struct(
            F.when(acc["first"], s["dq"])
            .otherwise(acc["num"] + s["dq"]).alias("num"),
            F.when(acc["first"], s["n2"])
            .otherwise(acc["n2"] + s["n2"]).alias("n2"),
            F.lit(False).alias("first"),
        ),
        lambda acc: F.round(
            acc["num"] / (F.lit(normq) * F.sqrt(acc["n2"])), 6
        ),
    )
    adc = (
        embeddings.select("vec_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(rerank if rerank is not None else k)
    )
    if rerank is None:
        return adc
    from sensapp_spark.pipeline.similarity import exact_rerank

    from sensapp_spark.pipeline.similarity import sql_array_lit as _sal
    qlit = _sal(q)
    return exact_rerank(embeddings, adc, qlit, k)
