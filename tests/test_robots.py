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
