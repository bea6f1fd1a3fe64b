"""Deterministic, engine-portable sketches: KMV distinct counting and
count-min frequency estimation.

Why these exist next to Spark's built-ins: ``approx_count_distinct``
(HLL++) and ``count_min_sketch`` are the production path at 100 TB —
map-side mergeable, one pass — but their estimates are
implementation-defined, so no external oracle can verify them
row-for-row. These operators pin the SAME estimator in both engines:
every hash is the md5-hex prefix both Spark (``conv(substr(md5(x),1,
15), 16, 10)``) and DuckDB (``CAST('0x' || substr(md5(x),1,15) AS
UBIGINT)``) reproduce bit-identically (the limitk sampler set the
precedent, promql_ext.py), so the driver's value-hash gate covers the
sketch math itself. A deployment wanting raw speed swaps the call site
for the built-in; the semantics (estimate, not exact) stay the same.

Sketch references: KMV — Bar-Yossef et al. 2002 ("Counting distinct
elements in a data stream", the k-minimum-values estimator
(k−1)/r_k); count-min — Cormode & Muthukrishnan 2005. The reference
engine has no approximate operators at all (exact SQL per backend), so
this whole surface is beyond-reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit long in both engines
# with headroom, and md5's prefix bits are uniform.
HASH_MAX = float(16 ** 15)
KMV_K = 256
CMS_W = 8192
CMS_D = 2
CMS_SALTS = tuple(f"cms{i}|" for i in range(CMS_D))


def portable_hash(col: F.Column, salt: str = "") -> F.Column:
    """Uniform 60-bit hash identical in Spark and DuckDB (see module
    docstring for the DuckDB twin expression)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame, key: str, by: str | None = None, k: int = KMV_K
) -> DataFrame:
    """K-minimum-values distinct-count estimate of ``key`` (optionally
    per ``by`` group): hash every key, keep the k smallest DISTINCT
    hashes per group, estimate (k−1)·H/h_k — or the exact distinct
    count when fewer than k survive (the standard KMV fallback, exact
    by construction).

    Plan shape: one distinct-cardinality shuffle (bounded by the
    number of distinct keys, not rows — map-side partial dedup), then
    the k smallest hashes. GROUPED, that is a per-group window
    (bounded by group sizes, Spark rewrites rank<=k windows to
    WindowGroupLimit); UNGROUPED it is ``orderBy().limit(k)`` —
    TakeOrderedAndProject, i.e. per-partition top-k merged on the
    driver, NEVER a single-reducer global window (the round-8 watch
    item: ``Window.partitionBy()`` with no keys funnels every distinct
    hash through one task). At 100 TB prefer the built-in
    ``approx_count_distinct`` (mergeable HLL++, no distinct shuffle);
    this estimator exists to be oracle-replayable.

    Returns ``(by?, estimate double)``."""
    from pyspark.sql import Window

    group = [F.col(by)] if by else []
    hashes = (
        df.filter(F.col(key).isNotNull())
        .select(*group, portable_hash(F.col(key)).alias("__h"))
        .distinct()
    )
    if group:
        w = Window.partitionBy(*group).orderBy("__h")
        top = hashes.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= k
        )
    else:
        top = hashes.orderBy("__h").limit(k)
    agg = top.groupBy(*([by] if by else [])).agg(
        F.count("*").alias("__n"), F.max("__h").alias("__hk")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_MAX)) / F.col("__hk")
    )
    return agg.select(
        *([by] if by else []), F.round(est, 6).alias("estimate")
    )


def cms_build(
    df: DataFrame, key: str, w: int = CMS_W, salts: tuple = CMS_SALTS
) -> DataFrame:
    """Count-min counter table over ``key``: d×w counters
    ``(row, bucket, cnt)``, built as d map-side-combined groupBys —
    output cardinality is d·w regardless of key cardinality (THE point
    of the sketch at 100 TB: the summary a driver can hold for a table
    it cannot groupBy)."""
    # ONE scan for all d hash rows (round 14, guide §2.4): the union of
    # d per-salt groupBys re-scanned the base table d times — at corpus
    # scale a CMS maintenance pass must read the data once. The inline
    # (row, bucket) array explodes to d rows per input row BEFORE the
    # map-side partial aggregation, so the shuffle still carries at
    # most d·w counter rows; per-(row, bucket) counts are identical to
    # the unioned form by commutativity of count.
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            (portable_hash(F.col(key), salt) % w).alias("bucket"),
        )
        for i, salt in enumerate(salts)
    ])
    return (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key: str,
    w: int = CMS_W,
    salts: tuple = CMS_SALTS,
) -> DataFrame:
    """Point-frequency estimates for every row of ``probes[key]``: for
    each of the d hash rows, look the key's bucket up in the counter
    table and take the MIN across rows (count-min guarantee:
    estimate ≥ true count, overshoot bounded by collisions ≈ N/w).
    The join is (probes × d) against a d·w-row table — broadcast-sized
    on both sides."""
    probed = None
    for i, salt in enumerate(salts):
        p = probes.select(
            F.col(key),
            F.lit(i).alias("row"),
            (portable_hash(F.col(key), salt) % w).alias("bucket"),
        )
        probed = p if probed is None else probed.unionByName(p)
    joined = probed.join(
        F.broadcast(counters), ["row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(key).agg(
        F.min("cnt").cast("double").alias("estimate")
    )


def sql_portable_hash(expr: str, salt: str = "") -> str:
    """The DuckDB twin of :func:`portable_hash` — used by oracle SQL."""
    inner = f"CONCAT('{salt}', {expr})" if salt else expr
    return f"CAST(CONCAT('0x', SUBSTR(md5({inner}), 1, 15)) AS UBIGINT)"
