"""robots.txt parsing (north-rule robots gate; the crawl engine consumes
a pre-parsed ``robots_rules(host, disallow_prefixes)`` table — this
operator BUILDS that table from raw robots.txt bodies, completing the
gate end-to-end. The reference crawler has no robots handling; semantics
here follow the RFC 9309 group model, reduced to what the gate consumes:

* lines are ``key: value`` with ``#`` comments stripped; keys
  case-insensitive;
* consecutive ``User-agent`` lines open a group; the group's rules apply
  to every listed agent;
* the applicable group is the one naming the crawler agent (exact,
  case-insensitive token match), else the ``*`` group;
* ``Disallow`` values collect as path prefixes for the engine's fast
  prefix gate; an EMPTY Disallow/Allow means allow-all (contributes
  nothing); the FULL RFC evaluation — ``Allow`` precedence, ``*``
  wildcards and ``$`` end-anchors with longest-match-wins,
  ties-to-allow (§2.2.2/§2.2.3) — lives in ``parse_robots_patterns`` /
  ``robots_patterns`` / ``robots_decision``; unknown keys are ignored;
* ``Crawl-delay`` is per-group (the de-facto Bing/Yandex extension): the
  applicable group's first valid value wins; invalid values are ignored;
* ``Sitemap`` is group-INDEPENDENT (RFC 9309 §2.3 treats unknown
  records file-wide; sitemaps.org specifies it outside any group), so
  every Sitemap line collects regardless of agent, in file order.

Spark shape: hosts fan out through an Arrow-batched pandas UDF (one
Python call per batch of robots bodies), producing the broadcastable
rules dimension the crawl joins per round.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# group = (agents, rules [(is_allow, pattern)], crawl_delay | None)
_Group = tuple[list[str], list[tuple[bool, str]], "float | None"]


def _parse_groups(text: str) -> tuple[list[_Group], list[str]]:
    """RFC 9309 group split + file-wide Sitemap lines (pure kernel)."""
    groups: list[_Group] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    cur_delay: float | None = None
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            # group-independent; keep scheme://... intact (the ':' split
            # above only took the FIRST colon)
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if not in_agent_run and cur_agents:
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
            cur_agents.append(val.lower())
            in_agent_run = True
        else:
            in_agent_run = False
            if not cur_agents:
                continue
            if key == "disallow" and val:
                cur_rules.append((False, val))
            elif key == "allow" and val:
                cur_rules.append((True, val))
            elif key == "crawl-delay" and cur_delay is None:
                try:
                    d = float(val)
                except ValueError:
                    continue
                if d >= 0:
                    cur_delay = d
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delay))
    return groups, sitemaps


def _applicable(groups: list[_Group], agent: str) -> list[_Group]:
    exact = [g for g in groups if agent in g[0]]
    return exact if exact else [g for g in groups if "*" in g[0]]


def parse_robots(text: str | None, agent: str = "*") -> list[str]:
    """Disallow prefixes applicable to ``agent`` (pure kernel)."""
    if not text:
        return []
    groups, _ = _parse_groups(text)
    return [p for _, rules, _ in _applicable(groups, agent.lower())
            for allow, p in rules if not allow]


def parse_robots_meta(
    text: str | None, agent: str = "*",
) -> tuple[list[str], float | None, list[str]]:
    """(disallow_prefixes, crawl_delay, sitemaps) for ``agent``.

    crawl_delay is the applicable group set's minimum declared value
    (a multi-group file with several delays for the same agent is rare;
    min is the conservative — politest — merge).
    """
    if not text:
        return [], None, []
    groups, sitemaps = _parse_groups(text)
    app = _applicable(groups, agent.lower())
    disallows = [p for _, rules, _ in app for allow, p in rules
                 if not allow]
    delays = [d for _, _, d in app if d is not None]
    return disallows, (min(delays) if delays else None), sitemaps


def robots_rules(df: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """(host, disallow_prefixes) from raw robots bodies — the table
    CrawlEngine(robots=...) consumes. Arrow-batched; at 10^8 hosts this
    is an embarrassingly parallel scan."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def parse(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_robots(t, agent))

    return df.select(
        F.col(host_col).alias("host"),
        parse(F.col(text_col)).alias("disallow_prefixes"),
    )


_META_SCHEMA = T.StructType([
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay", T.DoubleType()),
    T.StructField("sitemaps", T.ArrayType(T.StringType())),
])


def robots_meta(df: DataFrame, agent: str = "*",
                host_col: str = "host",
                text_col: str = "robots_txt") -> DataFrame:
    """(host, disallow_prefixes, crawl_delay, sitemaps) — the full
    per-host crawl-policy dimension. ``sitemaps`` feeds
    scheduling.parse_sitemap (frontier seeding); ``crawl_delay`` feeds
    politeness.caps_from_delay (per-host batch caps). Same Arrow-batched
    scan shape as robots_rules."""

    @pandas_udf(_META_SCHEMA)
    def parse(texts: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_meta(t, agent) for t in texts]
        return pd.DataFrame(
            rows, columns=["disallow_prefixes", "crawl_delay", "sitemaps"],
        )

    return df.select(
        F.col(host_col).alias("host"),
        parse(F.col(text_col)).alias("_m"),
    ).select("host", "_m.disallow_prefixes", "_m.crawl_delay", "_m.sitemaps")


import re as _re


def pattern_to_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 path pattern -> anchored regex: ``*`` matches any
    character run, a TRAILING ``$`` anchors at end-of-path, everything
    else is literal. The output uses only escapes valid in both Java
    regex (Spark) and RE2 (DuckDB), so one translation serves engine and
    oracle."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "^" + ".*".join(_re.escape(p) for p in pattern.split("*"))
    return rx + "$" if anchored else rx


def parse_robots_patterns(text: str | None,
                          agent: str = "*") -> list[tuple[bool, str, str]]:
    """Full-RFC rule list for ``agent``: (is_allow, pattern, regex) per
    applicable rule, file order preserved (pure kernel)."""
    if not text:
        return []
    groups, _ = _parse_groups(text)
    return [
        (allow, p, pattern_to_regex(p))
        for _, rules, _ in _applicable(groups, agent.lower())
        for allow, p in rules
    ]


_PATTERNS_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("allow", T.BooleanType()),
    T.StructField("pattern", T.StringType()),
    T.StructField("rx", T.StringType()),
]))


def robots_patterns(df: DataFrame, agent: str = "*",
                    host_col: str = "host",
                    text_col: str = "robots_txt") -> DataFrame:
    """(host, rules array<allow, pattern, rx>) — the full-RFC policy
    dimension ``robots_decision`` consumes. Same Arrow-batched scan
    shape as robots_rules."""

    @pandas_udf(_PATTERNS_SCHEMA)
    def parse(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_robots_patterns(t, agent))

    return df.select(
        F.col(host_col).alias("host"),
        parse(F.col(text_col)).alias("rules"),
    )


def robots_decision(urls: DataFrame, rules: DataFrame,
                    host_col: str = "host",
                    path_col: str = "path") -> DataFrame:
    """Per-URL RFC 9309 verdict against a broadcast rules dimension:
    among the rules whose pattern matches the path, the LONGEST pattern
    wins; on a length tie the allow rule wins (§2.2.2 least-restrictive
    tiebreak, the Googlebot-documented specificity = pattern length);
    no matching rule (or no rules for the host) means allowed.

    All native expressions — the regex matches run inside a
    filter/exists over the per-host rule array (regexp_like with a
    per-rule pattern column), so the URL side never shuffles; the rules
    side is the usual broadcastable host dimension. Adds
    ``matched_pattern`` (null = no match) and ``allowed``.
    """
    matched = F.filter(
        F.col("rules"),
        lambda r: F.regexp_like(F.col(path_col), r["rx"]),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"),
                r["allow"].alias("allow"),
                r["pattern"].alias("pattern"),
            ),
        )
    )
    return (
        urls.join(F.broadcast(rules), host_col, "left")
        .withColumn("_best", best)
        .withColumn("matched_pattern", F.col("_best.pattern"))
        .withColumn(
            "allowed", F.coalesce(F.col("_best.allow"), F.lit(True))
        )
        .drop("rules", "_best")
    )
