"""Frontier scheduling & crawl hygiene: sitemap ingestion, freshness-
driven recrawl scheduling, redirect-chain resolution, and crawler-trap
detection.

These complete the crawl tier around the round engine (crawl.py): the
reference crawler (genesis) discovers URLs only by link expansion and
refetches on a fixed cadence; a production frontier at 10^10 URLs also
ingests sitemaps, schedules revisits from HTTP freshness metadata,
collapses redirect aliases before the seen-filter, and demotes
crawler-trap hosts. All four are public, spec-level behaviors
(sitemaps.org protocol, RFC 9111 Cache-Control, RFC 9110 3xx,
the IRLbot trap heuristics — Lee et al. 2009, public).

Everything here is native-expression DataFrame code (zero Python in the
row path) except nothing: even the sitemap XML is sliced with RE2-safe
regexes so the identical pattern runs in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s) so '.' crosses newlines inside a <url> block — supported by both
# Java regex (Spark) and RE2 (DuckDB oracle)
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml",
                  host_col: str = "host") -> DataFrame:
    """Parse sitemaps.org ``<urlset>`` documents into frontier-add rows.

    One ``regexp_extract_all`` slices the ``<url>`` blocks, an explode
    fans them out, and per-field ``regexp_extract`` pulls loc / lastmod
    / priority (priority defaults to 0.5 per the protocol; lastmod null
    when absent). Malformed blocks (no ``<loc>``) are dropped.

    Scale shape: map-side explode only — no shuffle; the output unions
    straight into the frontier-add path where the seen anti-join
    dedups it against crawled URLs.
    """
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    ex = df.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("block")
    )
    loc = F.regexp_extract(F.col("block"), _LOC, 1)
    lastmod = F.regexp_extract(F.col("block"), _LASTMOD, 1)
    prio = F.regexp_extract(F.col("block"), _PRIORITY, 1)
    return (
        ex.select(
            "host",
            loc.alias("url"),
            # try_* forms: a junk <lastmod>/<priority> in a real sitemap
            # yields null/default instead of an ANSI cast error
            F.when(lastmod != "", F.try_to_date(lastmod)).alias("lastmod"),
            F.round(
                F.coalesce(
                    F.when(prio != "", prio.try_cast("double")),
                    F.lit(0.5),
                ),
                4,
            ).alias("priority"),
        )
        .filter(F.col("url") != "")
    )


def _max_age_seconds(cache_control: Column) -> Column:
    """``max-age=N`` from a Cache-Control header (RFC 9111 §5.2.2.1);
    null when absent or unparseable."""
    raw = F.regexp_extract(F.lower(cache_control), r"max-age\s*=\s*(\d+)", 1)
    return F.when(raw != "", raw.cast("long"))


def recrawl_schedule(df: DataFrame, url_col: str = "url",
                     fetched_col: str = "fetched_ts",
                     cc_col: str = "cache_control",
                     lastmod_col: str = "last_modified",
                     min_interval_s: int = 3600,
                     max_interval_s: int = 30 * 86400) -> DataFrame:
    """Freshness-driven revisit scheduling (RFC 9111 + the classic
    age-heuristic): the revisit interval is

    * ``max-age`` when Cache-Control carries one, else
    * 10% of the document's age at fetch time
      (``fetched_ts - last_modified``) — the LM-factor heuristic
      public in every HTTP cache (squid's refresh_pattern), else
    * ``min_interval_s``,

    clamped to [min_interval_s, max_interval_s]. Emits
    ``next_fetch_epoch = fetched + interval``. Pure column arithmetic
    on epoch seconds — integer end-to-end, so the oracle matches
    exactly; no shuffle. Timestamp columns convert via unix_micros on
    an LTZ cast (session tz pinned UTC in session.py — same rule as
    operators/temporal.py); numeric columns pass through.
    """

    def _epoch_s(col: Column, dtype: str) -> Column:
        if dtype.startswith("timestamp"):
            return F.floor(
                F.unix_micros(col.cast("timestamp_ltz")) / F.lit(1_000_000)
            ).cast("long")
        return col.cast("long")

    dtypes = dict(df.dtypes)
    fetched = _epoch_s(F.col(fetched_col), dtypes[fetched_col])
    ma = _max_age_seconds(F.col(cc_col))
    lm_age = fetched - _epoch_s(F.col(lastmod_col), dtypes[lastmod_col])
    heur = F.when(
        F.col(lastmod_col).isNotNull() & (lm_age > 0),
        F.floor(lm_age / F.lit(10)),
    ).cast("long")
    interval = F.least(
        F.greatest(
            F.coalesce(ma, heur, F.lit(min_interval_s)),
            F.lit(min_interval_s).cast("long"),
        ),
        F.lit(max_interval_s).cast("long"),
    )
    return df.select(
        F.col(url_col).alias("url"),
        interval.alias("interval_s"),
        (fetched + interval).alias("next_fetch_epoch"),
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Collapse redirect chains: given ``(src, dst)`` 3xx edges, map
    every src to its terminal URL (a URL with no outgoing edge), so the
    seen-filter and frontier dedup on canonical targets instead of
    recrawling every alias.

    Pointer-doubling over the edge set: each round joins the current
    mapping to itself (``terminal = mapping[terminal]`` where one
    exists), so ``max_hops``-long chains resolve in ``ceil(log2)``
    rounds — 3 joins for 8 hops, not 8. After ``r`` rounds the mapping
    equals following exactly ``2^r`` single redirect steps (with
    absorption at terminals), which is what the oracle replays. A src
    whose endpoint STILL redirects after that many steps is a cycle or
    an over-long chain — flagged ``cycle = true`` with a null terminal
    (a crawler abandons both).

    Every round ``localCheckpoint``s the mapping — iterative plans
    otherwise grow exponentially and hang Catalyst (see
    operators/graph.py, same rule).

    Precondition: ``edges`` is a FUNCTION (one dst per src — HTTP gives
    one Location per URL); duplicate srcs would make the walk, and
    therefore the output, ambiguous.
    """
    # mapping: src -> (cur, hops, done)
    m = edges.select(
        F.col("src"), F.col("dst").alias("cur")
    ).localCheckpoint(eager=True)
    targets = edges.select(F.col("src").alias("t_src"),
                           F.col("dst").alias("t_dst"))
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        # follow cur -> mapping[cur] when cur itself redirects
        step = (
            m.alias("a")
            .join(m.select(F.col("src").alias("b_src"),
                           F.col("cur").alias("b_cur")).alias("b"),
                  F.col("a.cur") == F.col("b_src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b_cur"), F.col("a.cur")).alias("cur"),
            )
        )
        m = step.localCheckpoint(eager=True)
    # a chain is cyclic/over-long iff after the doubling rounds its
    # endpoint still has an outgoing edge
    return (
        m.join(targets.select("t_src").distinct(),
               m["cur"] == F.col("t_src"), "left")
        .select(
            "src",
            F.when(F.col("t_src").isNull(), F.col("cur")).alias("terminal"),
            F.col("t_src").isNotNull().alias("cycle"),
        )
    )


def trap_score(urls: DataFrame, url_col: str = "url",
               host_col: str = "host",
               depth_limit: int = 6,
               query_frac_limit: tuple[int, int] = (1, 2),
               repeat_seg_limit: int = 3) -> DataFrame:
    """Crawler-trap heuristics per host (IRLbot-style, public): hosts
    whose URL population shows calendar/session explosion get demoted
    before they eat the politeness budget.

    Signals, all native expressions over one groupBy(host):

    * ``max_depth`` — path segments of the deepest URL;
    * ``query_frac`` — fraction of URLs carrying a query string
      (compared as integers: ``2*n_query > n_urls`` for 1/2);
    * ``max_seg_repeat`` — the deepest URL's most-repeated path
      segment count (a/b/a/b/a… loops);

    ``trap`` fires when any signal crosses its limit. The per-host
    rollup is one hash aggregation — shuffles on host, broadcastable
    back onto the frontier as a demotion dimension.
    """
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/[^?#]*)?", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    has_q = F.col(url_col).contains("?").cast("long")
    # most-repeated segment count within ONE url's path
    seg_rep = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda d: F.size(F.filter(segs, lambda s: s == d)),
            )
        ),
        F.lit(0),
    )
    per_url = urls.select(
        F.col(host_col).alias("host"),
        F.size(segs).cast("long").alias("depth"),
        has_q.alias("has_q"),
        seg_rep.cast("long").alias("seg_rep"),
    )
    qn, qd = query_frac_limit
    agg = per_url.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.max("depth").cast("long").alias("max_depth"),
        F.sum("has_q").cast("long").alias("n_query"),
        F.max("seg_rep").cast("long").alias("max_seg_repeat"),
    )
    return agg.select(
        "host", "n_urls", "max_depth",
        F.round(F.col("n_query").cast("double") / F.col("n_urls"), 4)
        .alias("query_frac"),
        "max_seg_repeat",
        (
            (F.col("max_depth") > depth_limit)
            | (qd * F.col("n_query") > qn * F.col("n_urls"))
            | (F.col("max_seg_repeat") > repeat_seg_limit)
        ).alias("trap"),
    )


def capture_dedup(df: DataFrame, url_col: str = "url",
                  ts_col: str = "ts", digest_col: str = "digest",
                  id_col: str = "doc_id") -> DataFrame:
    """Common-Crawl CDX-style capture dedup: a crawler that revisits a
    URL stores a new capture per fetch; identical content is recorded as
    a revisit, and the index serves one canonical capture per
    (url, content-digest) — the LATEST one (ties broken by the larger
    capture id, so the rule is total and engine-independent).

    Returns one row per (url, digest) group: the canonical capture's id
    and timestamp plus ``n_captures`` (the revisit count + 1 — the
    dedup-savings signal CC publishes in its index stats).

    Plan: ONE hash aggregation — max over a (ts, id) struct picks the
    canonical row and count rides the same agg, so there is no window,
    no self-join, and map-side combine collapses per-partition revisits
    before the shuffle on (url, digest)."""
    g = df.groupBy(url_col, digest_col).agg(
        F.max(
            F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
        ).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_captures"),
    )
    return g.select(
        url_col,
        digest_col,
        F.col("m.id").alias(id_col),
        F.col("m.ts").alias(ts_col),
        "n_captures",
    )


def frontier_priority(frontier: DataFrame, edges: DataFrame,
                      host_col: str = "host", url_col: str = "url",
                      depth_col: str = "depth",
                      w_backlinks: float = 1.0,
                      w_depth: float = 0.5) -> DataFrame:
    """OPIC/backlink-family frontier prioritization: score each frontier
    URL by the authority of its host minus a depth penalty, so a
    priority-queue politeness select fetches high-value hosts first
    (the reference crawls strictly BFS — genesis/src/main.rs frontier is
    a FIFO per round; a 10^10-URL frontier cannot afford to treat a
    spam-farm leaf and a hub root as equals).

    authority(host) = ln(1 + #DISTINCT hosts linking to it) — cross-host
    backlink counting is the classic cheap PageRank surrogate (monotone
    under graph growth, one pass, no iteration). Shape: edges →
    cross-host filter → distinct (host-pair shuffle) → hash-agg, then a
    join back to the frontier; the host-authority table is |hosts|-sized
    (millions, not 10^10) so at scale it broadcast-joins. Deterministic
    order: (priority desc, url).

    priority = w_backlinks * ln(1 + backlink_hosts) - w_depth * depth
    """
    cross = edges.filter(F.col("src_host") != F.col("dst_host"))
    indeg = (
        cross.select("src_host", "dst_host").distinct()
        .groupBy(F.col("dst_host").alias(host_col))
        .agg(F.count(F.lit(1)).alias("backlink_hosts"))
    )
    return (
        frontier.join(indeg, host_col, "left")
        .withColumn("backlink_hosts",
                    F.coalesce("backlink_hosts", F.lit(0)))
        .withColumn(
            "priority",
            F.round(
                F.lit(w_backlinks) * F.log1p(F.col("backlink_hosts"))
                - F.lit(w_depth) * F.col(depth_col),
                6,
            ),
        )
        .select(url_col, host_col, depth_col, "backlink_hosts", "priority")
    )


def with_frontier_priority(frontier: DataFrame, edges: DataFrame | None,
                           host_col: str = "host",
                           depth_col: str = "depth",
                           w_backlinks: float = 1.0,
                           w_depth: float = 0.5) -> DataFrame:
    """Schema-preserving twin of :func:`frontier_priority` for the crawl
    loop: appends a ``priority`` column to ALL of the frontier's columns
    (the loop needs round/url downstream; frontier_priority's projected
    output is the oracle-checked operator surface). ``edges=None`` (no
    history yet) scores on the depth penalty alone. The host-authority
    aggregate is |hosts|-sized and comes in by broadcast — the 10^10
    frontier side is never re-shuffled for the lookup."""
    cols = frontier.columns
    pri_depth = -F.lit(w_depth) * F.col(depth_col)
    if edges is None:
        return frontier.select(
            *cols, F.round(pri_depth, 6).alias("priority")
        )
    indeg = (
        edges.filter(F.col("src_host") != F.col("dst_host"))
        .select("src_host", "dst_host").distinct()
        .groupBy(F.col("dst_host").alias(host_col))
        .agg(F.count(F.lit(1)).alias("_backlink_hosts"))
    )
    return (
        frontier.join(F.broadcast(indeg), host_col, "left")
        .withColumn(
            "priority",
            F.round(
                F.lit(w_backlinks)
                * F.log1p(F.coalesce("_backlink_hosts", F.lit(0)))
                + pri_depth,
                6,
            ),
        )
        .select(*cols, "priority")
    )


def adaptive_host_rate(outcomes: DataFrame, host_col: str = "host",
                       round_col: str = "round",
                       outcome_col: str = "outcome",
                       base_cap: int = 5, window: int = 3) -> DataFrame:
    """AIMD-style per-host politeness cap from recent fetch outcomes: a
    host that keeps failing (timeouts, 403s, Cloudflare blocks) gets its
    per-round page cap multiplicatively decreased; healthy hosts keep
    the base cap. The reference applies one global MAX_CONCURRENT_TASKS
    with a fixed per-host politeness; production crawlers adapt per host
    (additive-increase/multiplicative-decrease, the same control loop as
    TCP) so one flaky CDN does not burn the round budget.

    next_cap(host) = max(1, floor(base_cap * success_rate_over_last_W))
    with hosts absent from the window keeping base_cap. Shape: filter to
    the last W rounds (the window bound rides the scan as a pushed
    predicate), one hash-agg per host — no windows, no iteration; the
    output is |hosts|-sized and broadcast-joins into the next round's
    politeness select.
    """
    max_round = outcomes.agg(F.max(round_col).alias("mr"))
    recent = outcomes.join(F.broadcast(max_round)).filter(
        F.col(round_col) > F.col("mr") - window
    )
    return (
        recent.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("attempts"),
            F.sum((F.col(outcome_col) == "success").cast("long"))
            .alias("successes"),
        )
        .withColumn(
            "next_cap",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(base_cap) * F.col("successes")
                        / F.col("attempts")).cast("long"),
            ),
        )
        .select(host_col, "attempts", "successes", "next_cap")
    )


def adaptive_caps_from_stats(stats: DataFrame, base_cap: int = 5,
                             window: int = 3,
                             upto_round: int | None = None) -> DataFrame:
    """AIMD caps from the engine's per-round host_stats table (host,
    round, attempts, successes) — the aggregated twin of
    :func:`adaptive_host_rate` for the crawl loop, which already has
    per-round aggregates and must not keep raw outcome rows around.
    Reads are crash-idempotent: a crash-rerun can append the same
    (host, round) row twice, so rows dedupe by max() per (host, round)
    before the window sum. Output: (host, cap) for politeness_select's
    host_caps — only hosts whose cap differs from base_cap are emitted,
    keeping the broadcast at the size of the throttled set, not the
    whole host dimension."""
    if upto_round is not None:
        stats = stats.filter(F.col("round") <= upto_round)
        lo = upto_round - window
        stats = stats.filter(F.col("round") > lo)
    else:
        # anchor the window at max(round) like adaptive_host_rate does —
        # a standalone caller must still get a SLIDING controller, not an
        # all-history sum that never forgives old failures (round-3
        # review). Broadcast 1-row join keeps it a single pass.
        mr = stats.agg(F.max("round").alias("_mr"))
        stats = (
            stats.join(F.broadcast(mr))
            .filter(F.col("round") > F.col("_mr") - window)
            .drop("_mr")
        )
    dedup = (
        stats.groupBy("host", "round")
        .agg(F.max("attempts").alias("attempts"),
             F.max("successes").alias("successes"))
    )
    return (
        dedup.groupBy("host")
        .agg(F.sum("attempts").alias("attempts"),
             F.sum("successes").alias("successes"))
        .withColumn(
            "cap",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(base_cap) * F.col("successes")
                        / F.col("attempts")).cast("int"),
            ),
        )
        .filter(F.col("cap") != base_cap)
        .select("host", "cap")
    )
