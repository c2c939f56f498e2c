"""Link-graph operators: connected components, near-dup cluster labeling,
and PageRank frontier priority.

These are the training-data-pipeline extras the build brief lists as
first-class (the reference pipeline stops at pair generation — e.g.
MinHash/LSH candidates — and at FIFO frontier ordering; clustering the
pairs into canonical groups and priority-scoring the frontier are the
stages a production pipeline adds on top).

Connected components uses the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public): each round is two groupBy+join passes, and
the edge set provably converges in O(log^2 n) rounds (O(log n) in
practice) to stars centered on each component's minimum node id. That
beats naive min-label propagation, whose round count is the graph
DIAMETER — unbounded on chain-shaped dup clusters.

PageRank is standard power iteration with dangling-mass redistribution;
each iteration is one join + one aggregation, both hash-partitioned on
node id.

Scale notes (10^10 nodes / 100 TB):
  * no driver materialization anywhere: convergence is detected with a
    distributed checksum (count + sum(xxhash64)) — one two-scalar action
    per round; dangling mass is a one-scalar aggregate;
  * per-iteration results are persisted and the previous iteration
    unpersisted, so each round recomputes nothing;
  * lineage is truncated with localCheckpoint EVERY round. This is
    load-bearing, not hygiene: each star round references the previous
    edge set 4-6 times (symmetrize union + two self-joins), so without
    truncation the un-analyzed logical plan grows EXPONENTIALLY in the
    round number and Catalyst analysis (DeduplicateRelations walks the
    whole tree) hangs after ~5 rounds — measured, not theoretical. On a
    real cluster swap localCheckpoint for reliable checkpoint() to an
    HDFS dir if executor loss during the loop must be survivable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set in canonical orientation (u > v), self-loops
    dropped, deduped."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    return e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    """Distributed edge-set checksum: (count, sum(xxhash64(u,v))).
    Two scalars to the driver — never the edges."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: xxhash64 spans the full long range, and the
        # ANSI-mode long sum would overflow on a few hundred edges
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).cast("decimal(38,0)").alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for each node u, connect every STRICTLY LARGER
    neighbor to m = min(neighborhood(u) ∪ {u}). Input/output are
    undirected edge sets; output rows are (bigger, smaller)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient edges toward the smaller endpoint; for each
    node u, connect every smaller-or-equal neighbor (and u itself) to
    m = min of those neighbors."""
    orient = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = orient.groupBy("u").agg(F.min("v").alias("m"))
    rewire = (
        orient.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return (
        rewire.union(self_edge)
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Label every node of the undirected graph with its component's
    minimum node id. Returns (node, component).

    Alternates large-star/small-star until the canonical edge set is
    stable (checksum compare). On convergence the edges form stars
    (child > root), so the assignment is one projection + the roots."""
    spark = edges.sparkSession
    # eager localCheckpoint of the RAW edges FIRST: the pair-generating
    # plan (minhash over shingles etc.) runs exactly once, and BOTH
    # consumers — the node universe and the canonical edge set — read
    # the materialized rows. (Deriving nodes straight from `edges`
    # would re-execute the whole pair generation at final-action time
    # for the roots anti-join: a lazy .persist() on nodes never
    # materializes before this function unpersists it.)
    e_raw = edges.select(F.col(src), F.col(dst)).localCheckpoint(eager=True)
    nodes = (
        e_raw.select(F.col(src).alias("node"))
        .union(e_raw.select(F.col(dst).alias("node")))
        .distinct()
    )
    # second checkpoint: truncates lineage so each round's plan is
    # O(1)-sized, and makes the unpersist of the previous round safe
    # (the new edge set is self-contained)
    e = _canonical_edges(e_raw, src, dst).localCheckpoint(eager=True)
    prev_sum = _checksum(e)
    prev_df = e
    for it in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur_sum = _checksum(e)
        prev_df.unpersist()
        prev_df = e
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(assign, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return assign.union(roots)


def neardup_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """The last stage of the dedup family: near-dup candidate PAIRS
    (from MinHash/LSH, SimHash, embedding LSH, ...) → transitive
    CLUSTERS → canonical doc per cluster (the minimum doc_id).

    Returns (doc_id, canonical_id) for every doc appearing in a pair;
    rows with doc_id == canonical_id are the cluster representatives,
    the rest are the removable duplicates."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )


def neardup_keep(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Dedup KEEP-LIST: close the near-dup loop over the WHOLE corpus.
    ``neardup_components`` labels only docs that appear in a candidate
    pair; this joins the labels back onto every document and emits the
    final keep/drop decision a training-data writer consumes:

      (doc_id, canonical_id, keep∈{0,1})

    keep = 1 iff the doc is its cluster's canonical (minimum-id) member
    or belongs to no cluster at all. Exactly one keeper per cluster, so
    ``sum(keep)`` = corpus size − removable duplicates.

    Scale: components output is ≪ corpus (only docs in pairs); the
    label join is a plain key-shuffle left join (broadcastable when the
    dup set is small, which it usually is after LSH banding)."""
    comp = neardup_components(pairs, id_a=id_a, id_b=id_b)
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(
            comp.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce(F.col("canonical_id"), F.col(id_col))
            .cast("long")
            .alias("canonical_id"),
            F.when(
                F.coalesce(F.col("canonical_id"), F.col(id_col))
                == F.col(id_col),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank by power iteration over a directed edge list; returns
    (node, rank) with sum(rank) == 1.

    Dangling nodes (no out-edges) redistribute their mass uniformly:
      rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)

    Fixed iteration count keeps it cross-engine reproducible (the SQL
    oracle unrolls the same recurrence)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    # rank(u)/outdeg(u) flows along each edge; pre-join degree once
    flow_edges = e.join(deg, "src").persist()
    has_out = deg.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()
    for it in range(n_iter):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            flow_edges.join(ranks, flow_edges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        new_ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        # every iteration: ranks is referenced twice per round (dangling
        # aggregate + contribution join), so lineage growth is exponential
        # without per-round truncation — see module docstring
        new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks.unpersist()
        ranks = new_ranks
    e.unpersist()
    flow_edges.unpersist()
    nodes.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, "Authoritative Sources in a
    Hyperlinked Environment", JACM'99) by power iteration; returns
    (node, hub, auth), each score vector L1-normalized (sum = 1).

    Per iteration:  auth'(v) = Σ_{u→v} hub(u), normalized;
                    hub'(u)  = Σ_{u→v} auth'(v), normalized.
    L1 instead of the classic L2 norm: no sqrt, so the SQL oracle
    unrolls the identical recurrence in plain double math, and rankings
    are unaffected (normalization is a positive scalar). Fixed
    iteration count keeps it cross-engine reproducible.

    Scale shape mirrors :func:`pagerank`: each half-step is one
    hash-partitioned join + aggregation on the edge list; the two-row
    normalization constant is a scalar aggregate; scores are
    localCheckpoint'ed EVERY iteration (each is referenced by the next
    half-step and the norm — the same exponential-lineage rule as the
    star rounds, see module docstring)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    hubs = nodes.select("node", F.lit(1.0 / n).alias("hub")).persist()
    hubs.count()
    auths = None
    for _ in range(n_iter):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        a_un = nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("a")
        ).localCheckpoint(eager=True)
        a_tot = a_un.agg(F.sum("a")).first()[0] or 1.0
        new_auths = a_un.select(
            "node", (F.col("a") / F.lit(a_tot)).alias("auth")
        ).localCheckpoint(eager=True)
        h_raw = (
            e.join(new_auths, e["dst"] == new_auths["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        h_un = nodes.join(h_raw, nodes["node"] == h_raw["src"], "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("h")
        ).localCheckpoint(eager=True)
        h_tot = h_un.agg(F.sum("h")).first()[0] or 1.0
        new_hubs = h_un.select(
            "node", (F.col("h") / F.lit(h_tot)).alias("hub")
        ).localCheckpoint(eager=True)
        hubs.unpersist()
        hubs = new_hubs
        auths = new_auths
    out = hubs.join(auths, "node")
    e.unpersist()
    nodes.unpersist()
    return out


def frontier_priority(
    frontier: DataFrame,
    ranks: DataFrame,
    host_col: str = "host",
    node_col: str = "node",
    rank_col: str = "rank",
    default_rank: float = 0.0,
) -> DataFrame:
    """Attach a priority column to the frontier from a host-level rank
    table (e.g. PageRank of the host graph): unseen hosts get
    ``default_rank``. The crawl's pinned (round, url) reference-parity
    ordering is untouched — priority is an ADDITIONAL signal a scheduler
    can order by (``priority DESC, round, url``).

    Scale: ranks is host-level (|hosts| << |urls|) — broadcastable."""
    from pyspark.sql.functions import broadcast

    r = ranks.select(
        F.col(node_col).alias(host_col), F.col(rank_col).alias("priority")
    )
    return frontier.join(broadcast(r), host_col, "left").fillna(
        {"priority": default_rank}
    )


def anchor_text_agg(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
    approx_hosts: bool = True,
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic link-graph index
    signal (Brin & Page, WWW'98 §2.2: anchor words are indexed with the
    page they POINT AT; off-host anchors also feed ranking because they
    describe the target in the linkers' words, not the author's).

    Output, one row per ``dst_url``:
      * ``n_links``      — total in-links;
      * ``n_src_hosts``  — distinct linking hosts;
      * ``n_offhost``    — in-links whose source host differs from the
                           target host (the trust-weighted subset);
      * ``top_anchor``   — most frequent normalized anchor text
                           (lower-cased, whitespace-collapsed, trimmed;
                           empty anchors excluded; ties break to the
                           lexicographically smallest anchor). Null when
                           no in-link carries text;
      * ``top_anchor_cnt`` — its frequency (0 when top_anchor is null).

    Scale: two hash aggregations, both shuffled on ``dst_url`` (AQE
    coalesces the co-partitioned join); the per-(dst, anchor) pre-count
    gets full map-side combine, so a page with 10^7 identical
    boilerplate in-links ("home") reduces before the shuffle. The
    top-anchor pick is min(struct(-cnt, anchor)) — an aggregate, never a
    window, so a hot dst cannot become a single-task straggler.
    ``approx_hosts`` (default) keeps the host cardinality an HLL sketch
    merge (exact distinct over 10^10 edges pays an expand + second
    shuffle); at ≤ 2% relative error it is a ranking feature, not an
    accounting number. Pass ``approx_hosts=False`` for the exact count
    (what the SQL oracle checks).
    """
    dst = F.col(dst_col)
    src_host = F.parse_url(F.col(src_col), F.lit("HOST"))
    dst_host = F.parse_url(dst, F.lit("HOST"))
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(anchor_col), F.lit(""))),
                         r"\s+", " ")
    )

    host_cnt = (F.approx_count_distinct(src_host) if approx_hosts
                else F.count_distinct(src_host))
    counts = links.groupBy(dst.alias("dst_url")).agg(
        F.count(F.lit(1)).alias("n_links"),
        host_cnt.alias("n_src_hosts"),
        F.sum((src_host != dst_host).cast("long")).alias("n_offhost"),
    )
    top = (
        links.select(dst.alias("dst_url"), norm.alias("a"))
        .filter(F.col("a") != "")
        .groupBy("dst_url", "a")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("dst_url")
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                            F.col("a"))).alias("m"))
        .select(
            "dst_url",
            F.col("m.a").alias("top_anchor"),
            (-F.col("m.neg")).alias("top_anchor_cnt"),
        )
    )
    return (
        counts.join(top, "dst_url", "left")
        .withColumn("top_anchor_cnt",
                    F.coalesce("top_anchor_cnt", F.lit(0)))
    )


def _oriented_edges(edges: DataFrame, src: str, dst: str):
    """Degree table + degree-oriented edge set shared by triangle_count
    and clustering_coefficient. The oriented frame is referenced three
    times in the wedge/closure self-joins, so it is materialized ONCE
    via an eager localCheckpoint — without it the whole upstream
    canonicalize + two degree joins replan and re-execute 3× (the same
    recompute hazard fixed for connected_components). Returns
    (deg, oriented) where oriented is checkpointed and deg is the lazy
    degree aggregate (cheap: one hash-agg over the edge list)."""
    e = _canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("n").alias("u"),
                          F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"),
                         F.col("deg").alias("dv")), "v")
    )
    lower_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = with_deg.select(
        F.when(lower_is_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_is_u, F.col("v")).otherwise(F.col("u")).alias("d"),
    ).localCheckpoint(eager=True)
    return deg, o


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle count by degree-ordered orientation (the
    compact-forward / node-iterator++ algorithm every distributed
    triangle counter uses — e.g. Suri & Vassilvitskii WWW'11): orient
    each undirected edge from the lower (degree, id) endpoint to the
    higher, so every vertex's out-neighborhood is bounded by ~sqrt(m)
    on any graph (arboricity bound) and the wedge join never explodes
    on hubs — the naive neighbor self-join is quadratic in the max
    degree; this is the difference between feasible and not on a
    web graph whose degree distribution is a power law.

    Each triangle {x,y,z} with orientation ranks x<y<z is counted
    exactly once: as the wedge (x→y, x→z) closed by the oriented edge
    y→z. Plan: two self-equi-joins on the oriented edge set, one
    count — no windows, no Python. Returns one row (n_triangles)."""
    _, o = _oriented_edges(edges, src, dst)
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    wedges = x.join(y, F.col("x.s") == F.col("y.s")).filter(
        F.col("x.d") != F.col("y.d")
    )
    tri = wedges.join(
        z,
        (F.col("z.s") == F.col("x.d")) & (F.col("z.d") == F.col("y.d")),
        "left_semi",
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient C(v) = triangles_at(v) /
    C(deg(v), 2) — the standard cohesion signal over the link graph
    (boilerplate site clusters score near 1, organic link neighborhoods
    much lower). Same degree-oriented triangle enumeration as
    triangle_count (each triangle found once), with the three corners
    exploded back out so every node collects its own count; wedge
    capacity is pure integer math on the degree table. Returns
    (node, deg, n_triangles, coeff 4dp) for nodes with deg >= 2."""
    deg, o = _oriented_edges(edges, src, dst)
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    tri = (
        x.join(y, F.col("x.s") == F.col("y.s"))
        .filter(F.col("x.d") != F.col("y.d"))
        .join(z, (F.col("z.s") == F.col("x.d"))
              & (F.col("z.d") == F.col("y.d")), "left_semi")
    )
    per_node = (
        tri.select(
            F.explode(
                F.array(F.col("x.s"), F.col("x.d"), F.col("y.d"))
            ).alias("n")
        )
        .groupBy("n").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1) / 2.0), 4
            ).alias("coeff"),
        )
    )


def degree_histogram(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Log2-bucketed degree distribution of the undirected link graph —
    the one-look power-law diagnostic for a web crawl (a healthy crawl
    shows the straight-line log-log decay; a trap or mirror farm shows
    a bump). Exact integer math end-to-end: bucket = bit_length(deg)-1
    via base-2 string conversion, i.e. degrees 1 | 2-3 | 4-7 | ...
    Returns (deg_bucket, lo, hi, n_nodes)."""
    e = _canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    bucket = (F.length(F.conv(F.col("deg"), 10, 2)) - 1).cast("int")
    return (
        deg.groupBy(bucket.alias("deg_bucket"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            "deg_bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), deg_bucket)").alias("lo"),
            (F.expr("shiftleft(CAST(1 AS BIGINT), deg_bucket + 1)") - 1
             ).alias("hi"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
        )
    )
