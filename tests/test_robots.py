"""robots.txt parser: group model, agent selection, empty-Disallow
allow-all, comments, and the end-to-end path into the crawl gate."""

from vyntr_spark.operators.robots import parse_robots, robots_rules

SAMPLE = """
# global rules
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 10

User-agent: badbot
User-agent: otherbot
Disallow: /

User-agent: vyntr
Disallow: /vyntr-only
Allow: /vyntr-only/ok
Disallow:
"""


def test_star_group():
    assert parse_robots(SAMPLE, "*") == ["/private", "/tmp/"]


def test_exact_agent_preferred():
    assert parse_robots(SAMPLE, "vyntr") == ["/vyntr-only"]
    # shared agent run: both bots get the group's rules
    assert parse_robots(SAMPLE, "badbot") == ["/"]
    assert parse_robots(SAMPLE, "OtherBot") == ["/"]


def test_unknown_agent_falls_back_to_star():
    assert parse_robots(SAMPLE, "googlebot") == ["/private", "/tmp/"]


def test_degenerate_inputs():
    assert parse_robots(None) == []
    assert parse_robots("") == []
    assert parse_robots("Disallow: /orphan") == []  # rule before any group
    assert parse_robots("User-agent: *\nDisallow:") == []  # allow-all


def test_rules_df_feeds_crawl_gate(spark, tmp_path):
    """robots.txt text -> rules table -> CrawlEngine gate: blocked urls
    come out robots_blocked, matching the oracle with the same rules."""
    from tests.test_crawl_oracle import _pages_map, _run_engine, _assert_parity
    from vyntr_spark.oracle import run_oracle
    from vyntr_spark.synth import default_seeds, generate_pages

    rows = generate_pages(60, 4, seed=7)
    seeds = default_seeds(60, 4, k=2)
    bodies = spark.createDataFrame(
        [("host0.example", "User-agent: *\nDisallow: /p1\nDisallow: /p3\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules(bodies)
    got = {r["host"]: list(r["disallow_prefixes"]) for r in rules.collect()}
    assert got == {"host0.example": ["/p1", "/p3"]}

    robots_dict = {"host0.example": ["/p1", "/p3"]}
    orc = run_oracle(_pages_map(rows), seeds, max_pages=10_000, seed=7,
                     robots=robots_dict)
    store, infos = _run_engine(spark, tmp_path, rows, seeds, seed=7,
                               robots=robots_dict)
    _assert_parity(store, infos, orc, rows)


def test_meta_kernel_sitemaps_and_delay():
    from vyntr_spark.operators.robots import parse_robots_meta

    txt = (
        "Sitemap: https://h.ex/a.xml\n"
        "User-agent: *\nDisallow: /p\nCrawl-delay: 10\n\n"
        "User-agent: vyntr\nDisallow: /v\nCrawl-delay: 2\n"
        "Sitemap: https://h.ex/b.xml\n"
    )
    dis, delay, sm = parse_robots_meta(txt, "*")
    assert dis == ["/p"] and delay == 10.0
    # sitemaps collect file-wide regardless of agent, in file order
    assert sm == ["https://h.ex/a.xml", "https://h.ex/b.xml"]
    dis_v, delay_v, sm_v = parse_robots_meta(txt, "vyntr")
    assert dis_v == ["/v"] and delay_v == 2.0 and sm_v == sm


def test_meta_kernel_edge_cases():
    from vyntr_spark.operators.robots import parse_robots, parse_robots_meta

    # invalid / negative delays are ignored; first valid in a group wins;
    # multiple applicable groups merge to the min (politest)
    txt = (
        "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -3\n"
        "Crawl-delay: 7\nCrawl-delay: 1\nDisallow: /x\n"
        "User-agent: *\nCrawl-delay: 4\n"
    )
    dis, delay, sm = parse_robots_meta(txt, "*")
    assert dis == ["/x"] and delay == 4.0 and sm == []
    assert parse_robots_meta(None) == ([], None, [])
    assert parse_robots_meta("Sitemap: https://h.ex/s.xml") == (
        [], None, ["https://h.ex/s.xml"])
    # a Sitemap line between User-agent lines must not split the run
    run = ("User-agent: a\nSitemap: https://h.ex/s.xml\nUser-agent: b\n"
           "Disallow: /q\n")
    assert parse_robots(run, "a") == ["/q"]
    assert parse_robots(run, "b") == ["/q"]


def test_robots_meta_df(spark):
    from vyntr_spark.operators.robots import robots_meta

    bodies = spark.createDataFrame(
        [("h0.ex", "Sitemap: https://h0.ex/s.xml\nUser-agent: *\n"
                   "Disallow: /a\nCrawl-delay: 3\n"),
         ("h1.ex", None)],
        "host string, robots_txt string",
    )
    got = {r["host"]: r for r in robots_meta(bodies).collect()}
    assert list(got["h0.ex"]["disallow_prefixes"]) == ["/a"]
    assert got["h0.ex"]["crawl_delay"] == 3.0
    assert list(got["h0.ex"]["sitemaps"]) == ["https://h0.ex/s.xml"]
    assert got["h1.ex"]["crawl_delay"] is None
    assert list(got["h1.ex"]["sitemaps"]) == []


def test_caps_from_delay_and_politeness_override(spark):
    """Crawl-delay -> per-host caps -> politeness_select honors them
    exactly (per-host FIFO prefix), including through the salted phase."""
    from pyspark.sql import functions as F
    from vyntr_spark.operators.politeness import (
        caps_from_delay, politeness_select)
    from vyntr_spark.operators.robots import robots_meta

    bodies = spark.createDataFrame(
        [("slow.ex", "User-agent: *\nCrawl-delay: 30\n"),   # cap 2
         ("glacial.ex", "User-agent: *\nCrawl-delay: 600\n"),  # cap 1 (min)
         ("greedy.ex", "User-agent: *\nCrawl-delay: 0.01\n"),  # clamped to 5
         ("plain.ex", "User-agent: *\nDisallow: /x\n")],    # default
        "host string, robots_txt string",
    )
    caps = caps_from_delay(robots_meta(bodies), batch_seconds=60.0,
                           default_cap=5)
    got = {r["host"]: r["cap"] for r in caps.collect()}
    # only exceptions ship (greedy clamps back to the default and drops)
    assert got == {"slow.ex": 2, "glacial.ex": 1}

    rows = [(h, f"https://{h}/p{i:02d}", 0)
            for h in ["slow.ex", "glacial.ex", "greedy.ex", "plain.ex"]
            for i in range(9)]
    frontier = spark.createDataFrame(rows, "host string, url string, round int")
    sel = politeness_select(frontier, cap=5, salt_buckets=4, host_caps=caps)
    per_host = {r["host"]: sorted(r["urls"]) for r in
                sel.groupBy("host").agg(
                    F.collect_list("url").alias("urls")).collect()}
    assert len(per_host["slow.ex"]) == 2
    assert len(per_host["glacial.ex"]) == 1
    assert len(per_host["greedy.ex"]) == 5
    assert len(per_host["plain.ex"]) == 5
    # FIFO prefix per host, not an arbitrary subset
    assert per_host["slow.ex"] == ["https://slow.ex/p00",
                                   "https://slow.ex/p01"]


def test_pattern_to_regex_rfc_examples():
    import re

    from vyntr_spark.operators.robots import pattern_to_regex

    # RFC 9309 §2.2.3 / §5.2 example shapes
    assert re.search(pattern_to_regex("/fish*"), "/fish/salmon")
    assert re.search(pattern_to_regex("/fish*"), "/fishheads.html")
    assert not re.search(pattern_to_regex("/fish*"), "/catfish")
    assert re.search(pattern_to_regex("/*.php$"), "/folder/file.php")
    assert not re.search(pattern_to_regex("/*.php$"), "/file.php5")
    assert re.search(pattern_to_regex("/p"), "/page")
    # regex metachars in paths stay literal
    assert re.search(pattern_to_regex("/a+b.c"), "/a+b.c")
    assert not re.search(pattern_to_regex("/a+b.c"), "/aab_c")


def test_parse_robots_patterns_allow_groups():
    from vyntr_spark.operators.robots import parse_robots_patterns

    txt = (
        "User-agent: vyntr\nDisallow: /private*\nAllow: /private/ok$\n"
        "User-agent: *\nDisallow: /\n"
    )
    got = parse_robots_patterns(txt, agent="Vyntr")
    assert got == [
        (False, "/private*", "^/private.*"),
        (True, "/private/ok$", "^/private/ok$"),
    ]
    assert parse_robots_patterns(txt, agent="other") == [(False, "/", "^/")]
    assert parse_robots_patterns(None) == []


def test_robots_decision_precedence(spark):
    from pyspark.sql import functions as F

    from vyntr_spark.operators.robots import (
        pattern_to_regex, robots_decision,
    )

    rules_py = [
        (False, "/p1*"), (True, "/p12"), (False, "/*3$"),
    ]
    rules = spark.createDataFrame(
        [("h.ex", [(al, p, pattern_to_regex(p)) for al, p in rules_py])],
        "host string, "
        "rules array<struct<allow:boolean,pattern:string,rx:string>>",
    )
    urls = spark.createDataFrame(
        [("h.ex", "/p12"), ("h.ex", "/p15"), ("h.ex", "/p23"),
         ("h.ex", "/ok"), ("x.ex", "/p12")],
        "host string, path string",
    )
    got = {(r["host"], r["path"]): (r["allowed"], r["matched_pattern"])
           for r in robots_decision(urls, rules).collect()}
    assert got[("h.ex", "/p12")] == (True, "/p12")    # longest wins: allow
    assert got[("h.ex", "/p15")] == (False, "/p1*")   # wildcard block
    assert got[("h.ex", "/p23")] == (False, "/*3$")   # end-anchor block
    assert got[("h.ex", "/ok")] == (True, None)       # no match -> allowed
    assert got[("x.ex", "/p12")] == (True, None)      # no rules host
