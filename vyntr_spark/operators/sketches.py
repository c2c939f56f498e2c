"""Cardinality sketches — the 100-TB path for distinct counts.

At web scale, "how many distinct words/URLs/hosts per source" via exact
`count(distinct x)` shuffles every distinct value; a sketch reduces each
group to a few hundred bytes that merge associatively (one partial agg +
one tiny final agg). Spark's built-in `approx_count_distinct` is the
production answer but its HLL++ bit layout is engine-private; these
implementations trade a little constant-factor for full cross-engine
DETERMINISM — every step is exact integer math on a shared md5-derived
60-bit hash, so a DuckDB oracle replays them bit-for-bit and the
estimate itself becomes a checkable value, not just a ballpark.

* ``hll_distinct`` — HyperLogLog (Flajolet et al. 2007): bucket = top
  ``b`` hash bits, per-bucket max leading-zero rank; the 1/Σ2^-M sum is
  kept EXACT by scaling to 2^(55-M) longs. Standard error ≈ 1.04/√m.
* ``kmv_distinct`` — K-Minimum-Values (Bar-Yossef et al. 2002):
  estimate = (k-1)·2^60 / (k-th smallest hash); exact below k.

Both are per-group aggregations: sketch state lives in the hash agg, so
the shuffle carries (group, bucket) or (group, k rows), never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_BITS = 60  # 15 md5 hex chars -> always-positive int64
_BUCKET_SHIFT_BASE = 54  # w = low 54 bits when b=6


def _h60(col):
    """Shared 60-bit hash: first 15 hex chars of md5 as an integer —
    `conv(substring(md5(x),1,15),16,10)` in Spark, the strpos polynomial
    (or printf tricks) in the DuckDB oracle; both exact."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_alpha(m: int) -> float:
    """Bias-correction constant; embedded as the SAME literal in the
    Spark plan and the generated oracle SQL."""
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(df: DataFrame, col: str, group_col: str = "source",
                 b: int = 6) -> DataFrame:
    """HyperLogLog distinct estimate per group over ``col`` values.

    Determinism over floats: the harmonic sum Σ 2^-M_j is computed as
    the exact LONG Σ 2^(55-M_j) (M_j ≤ 55, so every term is integral;
    empty buckets contribute 2^55); the only float ops are one division
    and the small-range `m·ln(m/V)` correction, both from exact integer
    inputs, rounded to 4dp. Rank uses bit_length via base-2 string
    conversion (`conv(w,10,2)` / `printf('%b',w)`) — exact integer
    string ops, no log2 libm hazards.
    """
    per_bucket = (
        df.select(
            F.col(group_col).alias("grp"),
            hll_bucket_expr(F.col(col), b).alias("bucket"),
            hll_rank_expr(F.col(col), b).alias("rank"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("mx"))
    )
    return hll_finalize(per_bucket, b).select(
        F.col("grp").alias(group_col), "hll_estimate"
    )


def hll_bucket_expr(col, b: int = 6):
    """Top-b hash bits — the HLL bucket of a value column."""
    return F.shiftright(_h60(col), HASH_BITS - b).cast("int")


def hll_rank_expr(col, b: int = 6):
    """Leading-zero rank of the low hash bits (bit_length via base-2
    string conversion — exact, no log2 libm hazard)."""
    shift = HASH_BITS - b
    w = _h60(col).bitwiseAND(F.lit((1 << shift) - 1))
    bitlen = F.length(F.conv(w, 10, 2))
    return F.when(w == 0, F.lit(shift + 1)).otherwise(
        F.lit(shift) - bitlen + 1
    ).cast("int")


def hll_finalize(per_bucket: DataFrame, b: int = 6) -> DataFrame:
    """Turn (grp, bucket, mx) sketch state into the estimate — the
    merge/finalize half of the sketch, shared by the batch operator and
    the streaming variant (whose state arrives from a watermarked
    streaming max agg). See hll_distinct for the exactness contract."""
    m = 1 << b
    shift = HASH_BITS - b
    alpha = hll_alpha(m)
    scale = shift + 1  # 2^(scale - M) is integral for every M <= scale
    agg = per_bucket.groupBy("grp").agg(
        F.sum(
            # python shiftleft() wants a literal shift; the SQL form
            # takes a column — 2^(scale-M) stays an exact long
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - mx)")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    v = F.lit(m) - F.col("n_buckets")  # empty buckets
    s = F.col("s_present") + v * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        "grp", (F.round(est, 4) + F.lit(0.0)).alias("hll_estimate")
    )


def kmv_distinct(df: DataFrame, col: str, group_col: str = "source",
                 k: int = 32) -> DataFrame:
    """K-Minimum-Values distinct estimate per group: keep the k smallest
    DISTINCT 60-bit hashes; estimate = (k-1)·2^60 / kth-smallest, exact
    count when the group has fewer than k distinct values. The k-th
    order statistic is an exact integer, so the only float op is the
    final division (4dp)."""
    hashes = df.select(
        F.col(group_col).alias("grp"), _h60(F.col(col)).alias("h")
    ).distinct()
    wnd = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(wnd)).filter(
        F.col("rn") <= k
    )
    agg = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("kth")
    )
    # Divisor clamped to >= 1: a 0 hash as the k-th order statistic is
    # only reachable at k=1 (hashes are distinct) — ~2^-60 odds, but
    # adversarial input can force it, and the estimate must saturate,
    # not divide by zero. The oracle SQL applies the same greatest().
    est = F.when(
        F.col("n") < k, F.col("n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS))
        / F.greatest(F.col("kth"), F.lit(1)).cast("double")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        (F.round(est, 4) + F.lit(0.0)).alias("kmv_estimate"),
    )


def cms_build(df: DataFrame, col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency
    sibling of the cardinality sketches above: d×w counters replace a
    full per-item count at 100 TB (estimate overshoots by at most
    eN/w with probability 1-1/e^d, never undershoots). The build is ONE
    explode(d)+hash-agg; the sketch itself is d·w rows — broadcastable
    state, exactly what a heavy-hitter pass wants before an exact
    confirm stage.

    Hash row r of item x = shared 60-bit md5 of 'r:x', masked to w
    buckets (w must be a power of two) — deterministic, so the DuckDB
    oracle rebuilds the identical counters."""
    if w & (w - 1):
        raise ValueError(f"w must be a power of two (got {w})")
    ex = df.select(F.col(col).alias("item")).select(
        "item",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    )
    bucket = _h60(
        F.concat(F.col("r").cast("string"), F.lit(":"), F.col("item"))
    ).bitwiseAND(F.lit(w - 1))
    return (
        ex.select("r", bucket.alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(cms: DataFrame, probes: DataFrame, col: str,
                 d: int = 4, w: int = 256) -> DataFrame:
    """Point-query the sketch for each distinct probe item: estimate =
    min over the d counters. The sketch side (d·w rows) BROADCASTS; the
    probe side never shuffles for the lookup — at serving scale this is
    a map-side join against a few KB of state."""
    items = probes.select(F.col(col).alias("item")).distinct()
    ex = items.select(
        "item",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    )
    bucket = _h60(
        F.concat(F.col("r").cast("string"), F.lit(":"), F.col("item"))
    ).bitwiseAND(F.lit(w - 1))
    joined = ex.select("item", "r", bucket.alias("bucket")).join(
        F.broadcast(cms), ["r", "bucket"], "left"
    )
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
        .alias("cms_count")
    )


def cms_heavy_hitters(df: DataFrame, col: str, min_count: int,
                      d: int = 4, w: int = 256) -> DataFrame:
    """Heavy hitters by the sweep→confirm composition (the same shape as
    MinHash→exact-Jaccard): the broadcast CMS filters the corpus to
    CANDIDATES (cms_count ≥ min_count — no false negatives, CMS never
    undershoots), then one exact count over candidates only confirms.
    At 100 TB the exact pass aggregates the rare heavy items instead of
    every distinct item; the sketch pass is map-side against d·w
    broadcast counters.

    Returns (item, exact_count) for items with true count ≥ min_count.
    """
    cms = cms_build(df, col, d, w)
    cand = cms_estimate(cms, df, col, d, w).filter(
        F.col("cms_count") >= min_count
    ).select("item")
    return (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .filter(F.col("exact_count") >= min_count)
    )


def hll_merge_groups(df: DataFrame, col: str, group_col: str = "source",
                     b: int = 6) -> DataFrame:
    """Sketch MERGEABILITY made concrete: build the per-group HLL state,
    then merge ALL groups into one global estimate with a second tiny
    max-agg over ≤ m rows per group — the union costs nothing and never
    revisits the data. This is why sketches beat exact distinct at
    100 TB: per-partition/per-day/per-source states roll up to any
    coarser grain for free. Returns one row (hll_estimate) for the
    global distinct count."""
    per_bucket = (
        df.select(
            F.col(group_col).alias("grp"),
            hll_bucket_expr(F.col(col), b).alias("bucket"),
            hll_rank_expr(F.col(col), b).alias("rank"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("mx"))
    )
    merged = per_bucket.groupBy("bucket").agg(
        F.max("mx").alias("mx")
    ).withColumn("grp", F.lit("ALL"))
    return hll_finalize(merged, b).select("hll_estimate")
