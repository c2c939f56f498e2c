"""Politeness batch selection (operator C6) — top-cap-per-host with
skew-proof two-phase ranking.

Reference semantics (crawler.rs:28-48 + main.rs:175): each batch takes at
most MAX_PER_DOMAIN=5 URLs per domain, in per-domain FIFO order. Pinned
FIFO order = (discovered_round, url) (SURVEY.md §8 N4/N5).

Scale design: a plain ``row_number() OVER (PARTITION BY host ORDER BY ...)``
puts every URL of a host into ONE task — the hot-domain Zipf head becomes a
straggler at 10^10-frontier scale (AQE cannot split a window partition).
Phase 1 therefore ranks within (host, salt) — salt = xxhash64(url) % S —
keeping only cap survivors per salted group (≤ cap·S rows per host), and
phase 2 ranks those survivors per host. Correctness: the per-host top-cap
by any total order is contained in the union of per-(host,salt) top-caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_PER_DOMAIN = 5  # genesis/src/main.rs:175


def batch_shuffle_key(seed: int, rnd: int, url_col: str = "url"):
    """C7 shuffle key: md5('{seed}:{round}:' || url).

    The reference shuffles each selected batch with an OS-seeded StdRng
    (genesis/src/main.rs:173,191-199) — nondeterministic by construction.
    The rebuild pins the order (SURVEY.md §8 determinism contract) with a
    seeded pseudo-random total order that reproduces across runs AND
    across executor counts, and is expressible in the SQL oracle.
    """
    return F.md5(F.concat(F.lit(f"{seed}:{rnd}:"), F.col(url_col)))


def batch_shuffle(batch: DataFrame, seed: int, rnd: int,
                  url_col: str = "url") -> DataFrame:
    """C7: deterministic batch shuffle — the batch ordered by its seeded
    shuffle key, with the key kept as `shuffle_key`.

    Scale: orderBy is a distributed range sort on the 32-hex key (no
    global window / row_number), so the shuffle spreads a hot host's URLs
    uniformly across output partitions — the same load-spreading effect
    the reference's RNG shuffle buys, without a sequential rank.
    """
    return batch.withColumn(
        "shuffle_key", batch_shuffle_key(seed, rnd, url_col)
    ).orderBy("shuffle_key")


def politeness_select(
    frontier: DataFrame,
    cap: int = MAX_PER_DOMAIN,
    salt_buckets: int = 32,
    host_caps: DataFrame | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """Select ≤cap URLs per host in (round, url) order.

    ``host_caps`` (host, cap) optionally overrides the cap per host —
    the Crawl-delay integration point (see caps_from_delay). Hosts
    absent from it keep the default ``cap``. It is a host-dimension
    table (≤ one row per host), broadcast onto the frontier; both
    ranking phases compare against the per-host cap column, so the
    phase-1-subset-of-phase-2 containment argument holds per host with
    its own cap.

    ``order_cols`` overrides the within-host pick order (default FIFO =
    (round, url), the reference's BFS). The priority frontier mode
    passes (priority desc, round, url); the containment argument holds
    for ANY total order, so the two-phase skew design is unchanged.

    Returns the frontier columns of the selected rows.
    """
    cols = frontier.columns
    if order_cols is None:
        order_cols = [F.col("round"), F.col("url")]
    capped = frontier.withColumn("_cap", F.lit(cap))
    if host_caps is not None:
        hc = F.broadcast(
            host_caps.select(
                F.col("host").alias("_hc_host"),
                F.col("cap").cast("int").alias("_hc_cap"),
            )
        )
        capped = (
            frontier.join(hc, frontier["host"] == hc["_hc_host"], "left")
            .withColumn("_cap", F.coalesce("_hc_cap", F.lit(cap)))
            .drop("_hc_host", "_hc_cap")
        )
    # phase 1: partial top-cap per salted host group (kills hot-host skew)
    salted = capped.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("_cap"))
        .drop("_r1", "_salt")
    )
    # phase 2: exact top-cap per host over ≤ cap·salt_buckets survivors
    w2 = Window.partitionBy("host").orderBy(*order_cols)
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("_cap"))
        .select(*cols)
    )


def caps_from_delay(
    robots: DataFrame,
    batch_seconds: float = 60.0,
    default_cap: int = MAX_PER_DOMAIN,
    max_cap: int | None = None,
) -> DataFrame:
    """(host, cap) from a robots_meta table's Crawl-delay column.

    A host declaring Crawl-delay=d seconds admits at most
    floor(batch_seconds / d) fetches per ``batch_seconds``-long round
    (min 1 — a delay longer than the round still crawls, one page per
    round, matching how Bing treats large delays). Hosts with no delay
    get ``default_cap``; ``max_cap`` (default ``default_cap``) bounds
    hosts declaring tiny delays so a 'Crawl-delay: 0.01' can't void
    politeness. Output is a host-dimension table for
    politeness_select(host_caps=...); rows equal to the default are
    dropped so the broadcast ships only the exceptions.
    """
    if max_cap is None:
        max_cap = default_cap
    cap = F.when(
        F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
        F.greatest(
            F.lit(1),
            F.least(
                F.lit(max_cap),
                F.floor(F.lit(float(batch_seconds)) / F.col("crawl_delay"))
                .cast("int"),
            ),
        ),
    ).otherwise(F.lit(default_cap))
    return (
        robots.select("host", cap.alias("cap"))
        .filter(F.col("cap") != default_cap)
    )
