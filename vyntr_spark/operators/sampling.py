"""Deterministic sampling operators for training-data pipelines.

Both are hash-deterministic — same rows selected on any engine, any
partitioning, any run — which is what makes them usable in a pipeline
whose outputs must be reproducible and oracle-checkable. Spark's own
``df.sample`` is seed-deterministic only for a FIXED partitioning, so it
cannot be the primitive here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# md5-prefix width: 15 hex digits = 60 bits, exact in both a Spark long
# and DuckDB's BIGINT (no float involved in the keep decision)
_HASH_SPACE = 16 ** 15


def _key_hash(key_col: str):
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def sample_deterministic(df: DataFrame, fraction: float,
                         key_col: str = "doc_id") -> DataFrame:
    """Bernoulli-style sample keeping rows whose 60-bit md5(key) prefix
    falls below ``fraction`` of the hash space.

    Zero shuffle — a pure filter that rides the scan (predicate stays
    JVM-side, whole-stage codegen). The sample is a deterministic
    function of the KEY, so it is stable under re-partitioning, retries,
    and engine swaps, and composable: sample(0.5) of sample(0.5) over
    independent key salts behaves like independent coin flips.
    """
    return df.filter(_key_hash(key_col) < F.lit(int(fraction * _HASH_SPACE)))


def stratified_topn(df: DataFrame, strata_col: str, n: int,
                    key_col: str = "doc_id") -> DataFrame:
    """Exact per-stratum quota: the ``n`` rows with the smallest
    md5(key) per stratum (ties broken by the key itself) — i.e. a
    deterministic uniform sample of exactly min(n, |stratum|) rows from
    each stratum (language, domain, source...).

    One shuffle, partitioned by the stratum. A hot stratum lands on one
    reducer; at 100 TB pre-trim it first with
    ``sample_deterministic`` — because the window ORDERS BY the same
    uniform hash, filtering to ``hash < f*SPACE`` with
    f = c*n/|stratum| keeps the true top-n with overwhelming
    probability and both engines can apply the identical pre-filter, so
    determinism survives. The plain form here is the exact primitive.
    """
    w = Window.partitionBy(strata_col).orderBy(
        _key_hash(key_col), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def mixture_weights(df: DataFrame, domain_col: str = "source",
                    token_col: str = "n_tokens",
                    alpha_num: int = 1, alpha_den: int = 2,
                    budget_tokens: int = 1_000_000) -> DataFrame:
    """Training-mixture planning (the public temperature-sampling rule
    used by multilingual/multi-domain LMs — Conneau & Lample 2019
    eq. (3); DoReMi's static baseline): reweight each domain's natural
    share ``p_d`` to ``p_d^alpha / sum(p^alpha)`` with
    ``alpha = alpha_num/alpha_den`` (default 1/2 — upsample the tail,
    downsample the head), then turn the target share into a per-domain
    sampling RATE against a token budget.

    Emits per domain: natural tokens and share, target share, the
    token quota ``round(budget * target_share)``, and
    ``sample_rate = min(1, quota / natural_tokens)`` (4dp) — the number
    a deterministic hash-sampler (:func:`sample_deterministic`) can
    consume directly.

    One hash aggregation over domains; the domain table is tiny at any
    corpus size, so the final normalization is a broadcast-size
    cross-agg, not a shuffle of the corpus.
    """
    alpha = alpha_num / alpha_den
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(token_col).cast("long").alias("nat_tokens")
    )
    tot = per.agg(F.sum("nat_tokens").alias("t")).select(
        F.col("t").cast("double").alias("tot_tokens")
    )
    j = per.crossJoin(F.broadcast(tot))
    pw = F.pow(F.col("nat_tokens") / F.col("tot_tokens"), F.lit(alpha))
    # sum of p^alpha via a window over the (tiny) domain table
    wsum = F.sum(pw).over(Window.partitionBy())
    share = pw / wsum
    quota = F.round(share * F.lit(float(budget_tokens))).cast("long")
    return j.select(
        "domain",
        "nat_tokens",
        F.round(F.col("nat_tokens") / F.col("tot_tokens"), 4)
        .alias("nat_share"),
        F.round(share, 4).alias("target_share"),
        quota.alias("token_quota"),
        F.round(
            F.least(F.lit(1.0), quota.cast("double") / F.col("nat_tokens")), 4
        ).alias("sample_rate"),
    )


def dsir_select(df: DataFrame, target_source: str = "src1",
                text_col: str = "text", source_col: str = "source",
                n_buckets: int = 1024, quota: int = 100) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.,
    NeurIPS 2023, public): score every raw document by how much more
    likely its hashed-n-gram bag is under the TARGET distribution than
    under the RAW distribution, then keep the top ``quota`` raw docs.
    The target here is the slice ``source == target_source`` (the
    "choose web pages that look like my curated set" use-case).

    Features are the paper's hashed n-grams: unigrams + adjacent
    bigrams bucketed by 60-bit md5 into ``n_buckets``. With Laplace
    smoothing the per-bucket log-ratio is

      lam[b] = ln( ((c_t[b]+1) * (R+B)) / ((c_r[b]+1) * (T+B)) )

    (c_t/c_r = target/raw bucket counts, T/R their totals, B buckets)
    and a doc's importance weight is the sum of lam over its gram
    occurrences. Determinism: lam is pinned to an exact MICRO-NAT long
    (floor(x*1e6+0.5)) so per-doc sums are order-independent exact
    adds; selection ties break on doc_id. The paper resamples with
    Gumbel noise; this is the zero-temperature (top-k) variant so the
    selected SET is reproducible and oracle-checkable.

    Scale shape: ONE explode (linear in tokens) feeds ONE exchange at
    (doc_id, b) grain; both downstream aggs (bucket counts → lam, and
    per-doc weights) hang off that same exchange, so Catalyst's
    ReusedExchange evaluates the explode+md5 pass exactly once. lam is
    a B-row table (broadcast) → per-doc weight is one hash agg → the
    quota cut is TakeOrdered + a broadcast semi-join, never a global
    window. Single-row-group small files under-parallelize the explode,
    so inputs narrower than defaultParallelism are repartitioned first;
    at warehouse scale the parquet scan splits by maxPartitionBytes and
    that branch never fires. The exact-long product inside the ln is
    safe while c_t·R < 2^62; at trillion-token scale compute the two
    smoothed ratios in double first (identical lam at micro rounding).

    Returns (doc_id, source, n_grams, w_micro, selected) for EVERY doc;
    ``selected`` is always false for target-slice docs (they are the
    reference set, not candidates).
    """
    from .textstats import _token_array, widen_small_scan

    df = widen_small_scan(df)
    toks = _token_array(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    )
    gb = grams.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10)
            .cast("long") % n_buckets
        ).cast("int").alias("b"),
    )
    # (doc_id, b) grain: dedups the explode+md5 pass via ReusedExchange
    db = gb.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    is_t = F.col("source") == target_source
    cnt = db.groupBy("b").agg(
        F.sum(F.when(is_t, F.col("k")).otherwise(0)).alias("ct"),
        F.sum(F.when(is_t, 0).otherwise(F.col("k"))).alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("long").alias("t_tot"),
        F.sum("cr").cast("long").alias("r_tot"),
    )
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            F.log(
                ((F.col("ct") + 1) * (F.col("r_tot") + n_buckets))
                .cast("double")
                / ((F.col("cr") + 1) * (F.col("t_tot") + n_buckets))
                .cast("double")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("long").alias("lam_micro"),
    )
    sc = db.join(F.broadcast(lam), "b").groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_grams"),
        F.sum(F.col("k") * F.col("lam_micro")).cast("long").alias("w_micro"),
    )
    base = (
        df.select("doc_id", F.col(source_col).alias("source"))
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("w_micro", F.lit(0)).cast("long").alias("w_micro"),
        )
    )
    top = (
        base.where(F.col("source") != target_source)
        .orderBy(F.col("w_micro").desc(), F.col("doc_id"))
        .limit(quota)
        .select("doc_id", F.lit(True).alias("selected"))
    )
    return base.join(F.broadcast(top), "doc_id", "left").select(
        "doc_id",
        "source",
        "n_grams",
        "w_micro",
        F.coalesce("selected", F.lit(False)).alias("selected"),
    )


def pack_sequences(df: DataFrame, ctx_len: int = 2048,
                   token_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   shard_col: str | None = None) -> DataFrame:
    """Sequential sequence-packing plan (the public concat-and-chunk
    recipe from GPT/T5 pretraining): lay documents end-to-end in
    ``id_col`` order and cut context windows of ``ctx_len`` tokens.
    Emits per document: the running token offset, the window id the
    document STARTS in (``floor(offset / ctx_len)``), the window it
    ends in, and whether it crosses a boundary (gets split across
    training sequences).

    ``shard_col=None`` (the oracle surface) is ONE window over a single
    global ordering — a prefix sum needs a total order, so Spark plans
    a SinglePartition Exchange; fine for test-scale oracles, serial at
    corpus scale. The scale path is ``shard_col='shard'`` composed with
    :func:`shard_plan`: the window becomes
    ``partitionBy(shard_col).orderBy(id_col)`` — independent per-shard
    concatenations (each output shard is its own token stream, exactly
    how sharded pretraining data is laid out), the Exchange hashes on
    the shard key, and all shards pack in parallel. The plan pin in
    tests/test_sampling.py asserts the sharded mode has NO
    SinglePartition Exchange; the parity test asserts a 1-shard plan
    reproduces the global pack byte-for-byte. Offsets and window ids are then
    per-shard (each shard's stream restarts at offset 0). Integer math
    end-to-end, so the oracle matches exactly.
    """
    if shard_col is None:
        w = Window.orderBy(id_col)
        extra = []
    else:
        w = Window.partitionBy(shard_col).orderBy(id_col)
        extra = [F.col(shard_col)]
    w = w.rowsBetween(Window.unboundedPreceding, -1)
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    n = F.col(token_col).cast("long")
    return df.select(
        *extra,
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        offset.alias("token_offset"),
        F.floor(offset / ctx_len).cast("long").alias("start_window"),
        F.floor((offset + F.greatest(n, F.lit(1)) - 1) / ctx_len)
        .cast("long").alias("end_window"),
        (
            F.floor(offset / ctx_len)
            != F.floor((offset + F.greatest(n, F.lit(1)) - 1) / ctx_len)
        ).alias("crosses_boundary"),
    )


def shard_plan(df: DataFrame, n_shards: int = 1024,
               key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic output-shard assignment for training data: adds
    ``shard`` = 60-bit md5 prefix of (salt:)key mod ``n_shards`` and
    ``sort_key`` = that hash — the within-shard write order. Hash order
    is a deterministic global shuffle, so every shard is an unbiased
    sample of the corpus (no domain/time clumping inside a shard —
    the property sequence packing and data loaders rely on), and the
    same corpus always produces byte-identical shards on any engine,
    partitioning, or run. ``salt`` re-deals the corpus (epoch reshuffle)
    without touching the data.

    Zero shuffle — both columns ride the scan. A writer realizes the
    plan with ``repartition(n_shards, 'shard')`` +
    ``sortWithinPartitions('sort_key')`` — the single shuffle of the
    output stage (Spark's hash partitioner on the shard column sends
    each shard to exactly one writer task).
    """
    if salt:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"),
                               F.col(key_col).cast("string"))), 1, 15),
            16, 10,
        ).cast("long")
    else:
        h = _key_hash(key_col)
    return df.withColumn("sort_key", h).withColumn(
        "shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("int")
    )


def shard_manifest(plan: DataFrame,
                   weight_col: str | None = None) -> DataFrame:
    """Per-shard manifest over a shard_plan frame: doc count, total
    ``weight_col`` (tokens/bytes) if given, and the min/max sort_key —
    the shard's write-order bounds, which double as a cheap integrity
    check of a written shard (first/last record). One hash aggregation
    on ``shard`` with full map-side combine."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("sort_key").alias("min_key"),
        F.max("sort_key").alias("max_key"),
    ]
    if weight_col is not None:
        aggs.insert(1, F.sum(F.col(weight_col).cast("long"))
                    .alias("total_weight"))
    return plan.groupBy("shard").agg(*aggs)


def sampled_quantiles(df: DataFrame, val_col: str,
                      group_col: str = "source",
                      qs: tuple[float, ...] = (0.5, 0.9),
                      fraction: float = 1.0,
                      key_col: str = "doc_id") -> DataFrame:
    """Per-group quantiles by EXPLICIT order statistics over the
    hash-deterministic sample — the monitoring quartet's quantile member
    next to HLL/KMV/CMS (operators/sketches.py).

    Why not percentile_approx / quantile_cont: their interpolation and
    sketch internals are engine-private, so the value could never be
    oracle-checked. Here quantile q = the ceil(q·n)-th smallest sample
    value — pure rank math both engines replay exactly (ceil on an
    exact q·n double of small ints; ties on value broken by the rank
    itself, so duplicated values are handled identically).

    Scale: the sample filter rides the scan (zero shuffle,
    sample_deterministic); the window sorts only the SAMPLE within each
    group. At 10^10 rows pick fraction so groups sample to ~10^5 rows —
    rank-error ~1/sqrt(samples) like any Bernoulli-sampled quantile.
    Returns (group, q, quantile_value).
    """
    base = (
        sample_deterministic(df, fraction, key_col) if fraction < 1.0
        else df
    )
    vals = base.select(
        F.col(group_col).alias("grp"), F.col(val_col).alias("v")
    ).filter(F.col("v").isNotNull())
    wnd = Window.partitionBy("grp").orderBy("v")
    ranked = vals.select(
        "grp", "v",
        F.row_number().over(wnd).alias("rn"),
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    out = None
    for q in qs:
        pick = ranked.filter(
            F.col("rn") == F.ceil(F.lit(float(q)) * F.col("n"))
        ).select(
            F.col("grp").alias(group_col),
            F.lit(float(q)).alias("q"),
            F.col("v").cast("double").alias("quantile_value"),
        )
        out = pick if out is None else out.unionByName(pick)
    return out
