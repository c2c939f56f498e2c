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
) -> DataFrame:
    """Select ≤cap URLs per host in (round, url) order.

    Returns the frontier columns of the selected rows.
    """
    cols = frontier.columns
    # phase 1: partial top-cap per salted host group (kills hot-host skew)
    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy("round", "url")
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_r1", "_salt")
    )
    # phase 2: exact top-cap per host over ≤ cap·salt_buckets survivors
    w2 = Window.partitionBy("host").orderBy("round", "url")
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= cap)
        .select(*cols)
    )
