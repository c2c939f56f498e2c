"""Frontier scheduling & crawl hygiene (operators/scheduling.py):
sitemap ingestion, freshness recrawl scheduling, redirect-chain
resolution, crawler-trap detection.
"""

from vyntr_spark.operators import scheduling


def test_parse_sitemap_fields_and_malformed_blocks(spark):
    xml = (
        "<urlset>"
        "<url>\n  <loc> https://a.example/1 </loc>\n"
        "<lastmod>2026-03-15</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://a.example/2</loc></url>"
        "<url><nav>no loc here</nav></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a.example", xml)],
                               "host string, sitemap_xml string")
    rows = {r["url"]: r.asDict()
            for r in scheduling.parse_sitemap(df).collect()}
    assert set(rows) == {"https://a.example/1", "https://a.example/2"}
    r1 = rows["https://a.example/1"]
    assert str(r1["lastmod"]) == "2026-03-15" and r1["priority"] == 0.8
    r2 = rows["https://a.example/2"]
    assert r2["lastmod"] is None and r2["priority"] == 0.5  # protocol default


def test_recrawl_schedule_sources_and_clamps(spark):
    rows = [
        # max-age wins over lastmod heuristic
        ("u1", 1_000_000, "public, max-age=7200", 1_000_000 - 864_000),
        # no cc -> 10% of age = 86400
        ("u2", 1_000_000, None, 1_000_000 - 864_000),
        # tiny max-age clamps up to the 3600 floor
        ("u3", 1_000_000, "max-age=5", None),
        # nothing known -> floor
        ("u4", 1_000_000, "no-store", None),
        # huge age clamps down to the 30-day ceiling
        ("u5", 1_000_000_000, None, 1_000_000_000 - 900_000_000),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetched_ts long, cache_control string, "
              "last_modified long")
    out = {r["url"]: r for r in scheduling.recrawl_schedule(df).collect()}
    assert out["u1"]["interval_s"] == 7200
    assert out["u2"]["interval_s"] == 86400
    assert out["u3"]["interval_s"] == 3600
    assert out["u4"]["interval_s"] == 3600
    assert out["u5"]["interval_s"] == 30 * 86400
    assert out["u1"]["next_fetch_epoch"] == 1_000_000 + 7200


def test_resolve_redirects_chains_and_cycles(spark):
    edges = [
        # chain a -> b -> c -> d (terminal)
        ("a", "b"), ("b", "c"), ("c", "d"),
        # 2-cycle x <-> y
        ("x", "y"), ("y", "x"),
        # self-loop
        ("z", "z"),
        # chain feeding INTO the cycle is also unresolvable
        ("w", "x"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["src"]: r for r in
           scheduling.resolve_redirects(df, max_hops=8).collect()}
    for s in ["a", "b", "c"]:
        assert out[s]["terminal"] == "d" and out[s]["cycle"] is False
    for s in ["x", "y", "z", "w"]:
        assert out[s]["terminal"] is None and out[s]["cycle"] is True


def test_resolve_redirects_long_chain_within_hop_cap(spark):
    # 8-hop chain resolves with max_hops=8 (2^ceil(log2(7)) = 8 steps)
    edges = [(f"n{i}", f"n{i + 1}") for i in range(8)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["src"]: r for r in
           scheduling.resolve_redirects(df, max_hops=8).collect()}
    assert out["n0"]["terminal"] == "n8" and out["n0"]["cycle"] is False


def test_trap_score_signals(spark):
    rows = (
        # depth trap
        [("deep.ex", "https://deep.ex/a/b/c/d/e/f/g")]
        # query explosion: 3 of 4 urls carry queries
        + [("q.ex", f"https://q.ex/p?s={i}") for i in range(3)]
        + [("q.ex", "https://q.ex/about")]
        # segment loop a/b/a/b/a/b/a
        + [("loop.ex", "https://loop.ex/a/b/a/b/a/b/a")]
        # healthy host
        + [("ok.ex", "https://ok.ex/x/y"), ("ok.ex", "https://ok.ex/")]
    )
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r["host"]: r.asDict() for r in scheduling.trap_score(df).collect()}
    assert out["deep.ex"]["trap"] is True and out["deep.ex"]["max_depth"] == 7
    assert out["q.ex"]["trap"] is True and out["q.ex"]["query_frac"] == 0.75
    assert out["loop.ex"]["trap"] is True
    assert out["loop.ex"]["max_seg_repeat"] == 4
    assert out["ok.ex"]["trap"] is False and out["ok.ex"]["query_frac"] == 0.0


def test_parse_sitemap_junk_fields_dont_raise(spark):
    xml = (
        "<urlset><url><loc>https://a.example/ok</loc>"
        "<lastmod>not-a-date</lastmod><priority>high</priority></url>"
        "<url><loc>https://a.example/one</loc>"
        "<priority>1</priority></url></urlset>"
    )
    df = spark.createDataFrame([("a.example", xml)],
                               "host string, sitemap_xml string")
    rows = {r["url"]: r.asDict()
            for r in scheduling.parse_sitemap(df).collect()}
    junk = rows["https://a.example/ok"]
    assert junk["lastmod"] is None and junk["priority"] == 0.5
    assert rows["https://a.example/one"]["priority"] == 1.0


def test_capture_dedup_keeps_latest(spark):
    from vyntr_spark.operators.scheduling import capture_dedup

    caps = spark.createDataFrame(
        [
            # two captures of identical content -> keep ts=20 capture
            ("u1", "d1", 10, 100),
            ("u1", "d1", 20, 101),
            # content changed -> separate group survives alongside
            ("u1", "d2", 30, 102),
            # tie on ts -> larger capture id wins (total rule)
            ("u2", "d3", 5, 200),
            ("u2", "d3", 5, 201),
        ],
        ["url", "digest", "ts", "cap_id"],
    )
    out = {(r["url"], r["digest"]): r
           for r in capture_dedup(caps, id_col="cap_id").collect()}
    assert len(out) == 3
    assert out[("u1", "d1")]["cap_id"] == 101
    assert out[("u1", "d1")]["ts"] == 20
    assert out[("u1", "d1")]["n_captures"] == 2
    assert out[("u1", "d2")]["n_captures"] == 1
    assert out[("u2", "d3")]["cap_id"] == 201


def test_frontier_priority_ordering_and_unlinked_hosts(spark):
    """Backlink authority: a host linked from many distinct hosts must
    outrank an unlinked host at equal depth; depth penalizes; hosts
    absent from the edge list get backlink_hosts=0, not null."""
    from vyntr_spark.operators.scheduling import frontier_priority

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("a", "leaf"),
         ("hub", "hub"),           # self-link must not count
         ("a", "hub"), ("a", "hub")],  # duplicate edges count once
        "src_host string, dst_host string",
    )
    frontier = spark.createDataFrame(
        [("https://hub/x", "hub", 1), ("https://leaf/x", "leaf", 1),
         ("https://lonely/x", "lonely", 1), ("https://hub/deep", "hub", 5)],
        "url string, host string, depth long",
    )
    out = {r["url"]: r for r in frontier_priority(frontier, edges).collect()}
    assert out["https://hub/x"]["backlink_hosts"] == 3
    assert out["https://leaf/x"]["backlink_hosts"] == 1
    assert out["https://lonely/x"]["backlink_hosts"] == 0
    assert (out["https://hub/x"]["priority"]
            > out["https://leaf/x"]["priority"]
            > out["https://lonely/x"]["priority"])
    # same host, deeper -> strictly lower priority
    assert out["https://hub/deep"]["priority"] < out["https://hub/x"]["priority"]


def test_adaptive_host_rate_aimd(spark):
    """A fully-failing host drops to the floor cap of 1; a healthy host
    keeps base_cap; outcomes older than the window are ignored."""
    from vyntr_spark.operators.scheduling import adaptive_host_rate

    rows = (
        # healthy host: all success in rounds 8..10
        [("good", r, "success") for r in (8, 9, 10)]
        # broken host: all failures in-window
        + [("bad", r, "failed") for r in (8, 9, 10)]
        # half-and-half
        + [("meh", 9, "success"), ("meh", 10, "failed")]
        # stale host: only old outcomes (round <= 7, outside window 3)
        + [("stale", 1, "failed")]
    )
    df = spark.createDataFrame(rows, "host string, round long, outcome string")
    out = {r["host"]: r for r in
           adaptive_host_rate(df, base_cap=5, window=3).collect()}
    assert out["good"]["next_cap"] == 5
    assert out["bad"]["next_cap"] == 1          # floor, never 0
    assert out["meh"]["next_cap"] == 2          # floor(5 * 1/2)
    assert "stale" not in out                   # outside the window


def _mk_pages(spark, rows):
    from vyntr_spark.tables import PAGES

    return spark.createDataFrame(rows, PAGES)


def test_adaptive_rate_noop_on_healthy_web(spark, tmp_path):
    """All-success crawl: AIMD caps never deviate from base, so the
    adaptive engine must be bit-identical to the fixed-cap engine."""
    from pyspark.sql import functions as F

    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.synth import default_seeds, generate_pages
    from vyntr_spark.tables import SnapshotStore

    rows = generate_pages(60, 4, seed=5)
    seeds = default_seeds(60, 4, k=2)
    results = []
    for adaptive in (False, True):
        wh = str(tmp_path / f"wh_{adaptive}")
        store = SnapshotStore(spark, wh)
        eng = CrawlEngine(spark, store, _mk_pages(spark, rows),
                          max_pages=10_000, seed=5, adaptive_rate=adaptive)
        eng.init_from_seeds(seeds)
        infos = eng.run(max_rounds=50)
        seen = frozenset(r["url"] for r in store.table("seen").read().collect())
        results.append((tuple((i.round, i.selected, i.success, i.new_urls)
                              for i in infos), seen))
    assert results[0] == results[1]


def test_adaptive_rate_throttles_failing_host(spark, tmp_path):
    """A host whose fetches all go missing gets capped at 1 from the
    next round on, while healthy hosts keep the full cap."""
    import datetime

    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.tables import SnapshotStore

    ts = datetime.datetime(2026, 1, 1)
    # hostA: 12 real pages, each links to 3 more hostA pages and 3
    # hostX pages; hostX pages are NOT in the pages table -> 'missing'
    def a(i):
        return f"http://a.example/p{i}.html"

    def x(i):
        return f"http://x.example/p{i}.html"

    rows = []
    for i in range(12):
        links = "".join(
            f'<a href="{a(j)}">l</a>' for j in (i + 1, i + 2, i + 3)
        ) + "".join(f'<a href="{x(i * 3 + k)}">m</a>' for k in range(3))
        html = f"<html><body><p>page {i}</p>{links}</body></html>"
        rows.append((a(i), ts, bytearray(html.encode()), f"page {i}",
                     "en", "text/html", 200, ""))
    pages = _mk_pages(spark, rows)
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    eng = CrawlEngine(spark, store, pages, max_pages=10_000, seed=1,
                      cap=5, adaptive_rate=True, rate_window=3,
                      collect_debug=True)
    eng.init_from_seeds([a(0), a(1)])
    infos = eng.run(max_rounds=4)
    per_round_x = [
        sum(1 for u in i.selected_urls if u.startswith("http://x."))
        for i in infos
    ]
    # round 0 fetches only seeds; once x.example urls enter the frontier
    # and fail, every later round selects exactly 1 x url (floor cap),
    # while a.example keeps up to 5
    first_x = next(i for i, n in enumerate(per_round_x) if n > 0)
    assert per_round_x[first_x] > 1  # full cap before any failure signal
    for n in per_round_x[first_x + 1:]:
        assert n <= 1
    per_round_a = [
        sum(1 for u in i.selected_urls if u.startswith("http://a."))
        for i in infos
    ]
    assert max(per_round_a) > 1  # healthy host never throttled


def test_priority_frontier_deterministic(spark, tmp_path):
    """priority_frontier=True (C30 wired into the crawl loop): two
    identical runs must produce identical per-round fetch sets,
    ordering and expansion — the authority score is a pure function of
    committed crawl history, never of execution order."""
    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.synth import default_seeds, generate_pages
    from vyntr_spark.tables import SnapshotStore

    rows = generate_pages(120, 8, seed=9)
    seeds = default_seeds(120, 8, k=3)
    runs = []
    for tag in ("a", "b"):
        store = SnapshotStore(spark, str(tmp_path / f"wh_{tag}"))
        eng = CrawlEngine(spark, store, _mk_pages(spark, rows),
                          max_pages=60, seed=9, collect_debug=True,
                          priority_frontier=True)
        eng.init_from_seeds(seeds)
        infos = eng.run(max_rounds=20)
        runs.append([(i.round, tuple(i.selected_urls),
                      tuple(i.new_url_list)) for i in infos])
    assert runs[0] == runs[1]


def test_priority_frontier_budget_cut_prefers_authority(spark, tmp_path):
    """When the page budget binds, the priority mode's truncation must
    take the high-backlink host's URLs first, where BFS order
    ((round, url)) would take alphabetically-first hosts. Web: 6 hosts;
    every non-hub seed links to 3 hub pages + 3 same-host pages, so
    after round 0 hub.example has 5 distinct backlink hosts and every
    other host has 0."""
    import datetime

    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.tables import SnapshotStore

    ts = datetime.datetime(2026, 1, 1)
    hosts = [f"h{i}.example" for i in range(5)] + ["hub.example"]

    def u(host, i):
        return f"http://{host}/p{i}.html"

    rows = []
    for host in hosts:
        for i in range(4):
            if host == "hub.example":
                links = "".join(f'<a href="{u(host, j)}">l</a>'
                                for j in (1, 2, 3))
            else:
                links = ("".join(f'<a href="{u("hub.example", j)}">l</a>'
                                 for j in (1, 2, 3))
                         + "".join(f'<a href="{u(host, j)}">s</a>'
                                   for j in (1, 2, 3)))
            html = f"<html><body><p>pg</p>{links}</body></html>"
            rows.append((u(host, i), ts, bytearray(html.encode()),
                         "pg", "en", "text/html", 200, ""))
    pages = _mk_pages(spark, rows)
    seeds = [u(h, 0) for h in hosts]

    def run(priority):
        store = SnapshotStore(
            spark, str(tmp_path / f"wh_{'p' if priority else 'b'}"))
        # round 0 fetches the 6 seeds; remaining budget 6 < the ~18
        # frontier rows of round 1, so the truncation binds there
        eng = CrawlEngine(spark, store, pages, max_pages=12, seed=3,
                          collect_debug=True,
                          priority_frontier=priority)
        eng.init_from_seeds(seeds)
        return eng.run(max_rounds=5)

    pri = run(True)
    bfs = run(False)
    pri_r1 = set(pri[1].selected_urls)
    bfs_r1 = set(bfs[1].selected_urls)
    hub_urls = {u("hub.example", j) for j in (1, 2, 3)}
    # priority run spends its bound budget on the authoritative host
    assert hub_urls <= pri_r1
    # BFS (alphabetical (round, url)) never reaches hub.example in r1
    assert not (hub_urls & bfs_r1)
    assert len(pri_r1) == len(bfs_r1) == 6


def test_adaptive_caps_window_anchors_at_max_round(spark):
    """round-3 review: with upto_round=None the controller must still
    slide its window (anchored at max(round)), so failures that aged out
    of the window are forgiven — not an all-history sum."""
    from vyntr_spark.operators.scheduling import adaptive_caps_from_stats

    stats = spark.createDataFrame(
        # rounds 1-2: total failure; rounds 8-10: fully healthy
        [("h.example", 1, 5, 0), ("h.example", 2, 5, 0),
         ("h.example", 8, 5, 5), ("h.example", 9, 5, 5),
         ("h.example", 10, 5, 5)],
        "host string, round int, attempts long, successes long",
    )
    # window [8,10] is all-success -> cap == base -> no row emitted
    assert adaptive_caps_from_stats(stats, base_cap=5, window=3).count() == 0
    # explicitly anchored in the failing era the host IS throttled
    capped = adaptive_caps_from_stats(
        stats, base_cap=5, window=3, upto_round=2
    ).collect()
    assert len(capped) == 1 and capped[0]["cap"] == 1


def test_adaptive_rate_ignores_policy_outcomes(spark, tmp_path):
    """round-3 review: robots_blocked and skipped_ct are content/policy
    signals, not server health — a host with many robots-disallowed urls
    whose real fetches all succeed must show attempts == successes in
    host_stats (and therefore never be throttled)."""
    import datetime

    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.tables import SnapshotStore

    ts = datetime.datetime(2026, 1, 1)

    def a(i):
        return f"http://a.example/p{i}.html"

    rows = []
    for i in range(12):
        # every page links to every page: allowed pages stay reachable
        # even though the robots-blocked ones contribute no outlinks
        links = "".join(f'<a href="{a(j)}">l</a>' for j in range(12))
        html = f"<html><body><p>page {i}</p>{links}</body></html>"
        rows.append((a(i), ts, bytearray(html.encode()), f"page {i}",
                     "en", "text/html", 200, ""))
    pages = _mk_pages(spark, rows)
    robots = spark.createDataFrame(
        [("a.example", [f"/p{i}" for i in range(2, 9)])],
        "host string, disallow_prefixes array<string>",
    )
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    eng = CrawlEngine(spark, store, pages, max_pages=10_000, seed=3,
                      cap=5, adaptive_rate=True, rate_window=3,
                      robots=robots, collect_debug=True)
    eng.init_from_seeds([a(0), a(1)])
    infos = eng.run(max_rounds=8)
    blocked = sum(
        1 for i in infos for o in i.outcomes.values() if o == "robots_blocked"
    )
    assert blocked >= 5  # the policy signal actually fired
    hs = store.table("host_stats").read().collect()
    assert hs, "host_stats must be committed each round"
    for r in hs:
        assert r["attempts"] == r["successes"], (
            f"round {r['round']}: policy outcomes leaked into attempts"
        )
    # fetch-health attempts must equal the non-policy outcome count
    total_attempts = sum(r["attempts"] for r in hs)
    non_policy = sum(
        1 for i in infos for o in i.outcomes.values()
        if o not in ("robots_blocked", "skipped_ct")
    )
    assert total_attempts == non_policy


def test_host_edges_compaction_is_transparent(spark, tmp_path):
    """host_edges maintenance: folding the append log into its distinct
    pair set on the compact_every cadence must not change priority
    selection (the authority aggregate re-distincts at read anyway),
    and must actually bound the table at |distinct pairs| rows."""
    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.synth import default_seeds, generate_pages
    from vyntr_spark.tables import SnapshotStore

    rows = generate_pages(120, 8, seed=9)
    seeds = default_seeds(120, 8, k=3)
    runs = []
    for tag, every in (("tight", 1), ("loose", 1000)):
        store = SnapshotStore(spark, str(tmp_path / f"wh_{tag}"))
        eng = CrawlEngine(spark, store, _mk_pages(spark, rows),
                          max_pages=60, seed=9, collect_debug=True,
                          priority_frontier=True, compact_every=every)
        eng.init_from_seeds(seeds)
        infos = eng.run(max_rounds=20)
        runs.append([(i.round, tuple(i.selected_urls),
                      tuple(i.new_url_list)) for i in infos])
        edges = store.table("host_edges").read().collect()
        n_distinct = len({(r["src_host"], r["dst_host"]) for r in edges})
        if every == 1:
            # compacted every round: stored rows == distinct pairs
            assert len(edges) == n_distinct
        runs[-1].append(("pairs", n_distinct))
    assert runs[0] == runs[1]
