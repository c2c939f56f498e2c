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
* ``Disallow`` values collect as path prefixes; an EMPTY Disallow means
  allow-all (contributes nothing); ``Allow``/``Crawl-delay``/unknown
  keys are ignored (the gate is prefix-block only — documented subset).

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


def parse_robots(text: str | None, agent: str = "*") -> list[str]:
    """Disallow prefixes applicable to ``agent`` (pure kernel)."""
    if not text:
        return []
    agent = agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        else:
            in_agent_run = False
            if key == "disallow" and cur_agents and val:
                cur_rules.append(val)
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


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
