"""Serving-layer operators (SURVEY.md §2.5, reference website/ +
lexicon/): query-count rollups, autocomplete, trigram fuzzy match, date
math, JSON scalar access. Peripheral to the crawl north rule but part of
the reference's query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def query_count_rollup(events: DataFrame) -> DataFrame:
    """W2 (search.ts:126-144): normalized key, count per key (the
    'count = count + 1 on conflict' upsert expressed as a rollup)."""
    return (
        events.select(F.lower(F.trim(F.col("event_type"))).alias("query"))
        .groupBy("query")
        .agg(F.count("*").alias("cnt"))
    )


def autocomplete(df: DataFrame, prefix: str, k: int = 10,
                 text_col: str = "word", count_col: str = "cnt") -> DataFrame:
    """W3 (api/autocomplete/+server.ts:6-23): prefix match, order by count
    desc, limit 10 (ties broken by word)."""
    if len(prefix) < 2:
        return df.sparkSession.createDataFrame([], f"{text_col} string, {count_col} bigint")
    return (
        df.filter(F.col(text_col).startswith(prefix))
        .orderBy(F.col(count_col).desc(), F.col(text_col).asc())
        .limit(k)
    )


def trigram_similarity(df: DataFrame, query: str, threshold: float = 0.3,
                       k: int = 10, text_col: str = "word") -> DataFrame:
    """W4 (wordnet.ts:20-77): pg_trgm-style fuzzy match. Similarity =
    Jaccard over 2-gram character sets (documented stand-in for pg_trgm's
    padded trigrams). Exact matches first, then similarity desc, limit 10."""
    def grams(col):
        n = F.length(col)
        idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
        return F.array_distinct(
            F.filter(
                F.transform(idx, lambda i: col.substr(i, F.lit(2))),
                lambda g: F.length(g) == 2,
            )
        )

    w = F.lower(F.col(text_col))
    q = F.lower(F.lit(query))
    gw, gq = grams(w), grams(q)
    inter = F.size(F.array_intersect(gw, gq))
    union = F.size(F.array_union(gw, gq))
    sim = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        df.select(
            F.col(text_col),
            (w == q).cast("int").alias("exact"),
            F.round(sim, 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .orderBy(F.col("exact").desc(), F.col("sim").desc(), F.col(text_col).asc())
        .limit(k)
    )


def days_until(events: DataFrame, target_date: str) -> DataFrame:
    """W6-style date math: datediff to a fixed date per event day."""
    return events.select(
        "event_id",
        F.datediff(F.lit(target_date).cast("date"), F.col("ts").cast("date")).alias(
            "days_left"
        ),
    )


def json_prop(events: DataFrame, field: str = "k") -> DataFrame:
    """JSON scalar access over the props column (from_json/get_json_object
    family — the reference stores JSONB, SURVEY.md §1.3)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), f"$.{field}").cast("int").alias("prop_k"),
    )
