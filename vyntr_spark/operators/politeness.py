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
