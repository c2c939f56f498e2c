"""W1 orchestration (vyntr_spark/serve.py): instant answers + web merge,
mirroring performSearch (website/src/lib/server/search.ts:14-100)."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from vyntr_spark.serve import (
    parse_bang,
    parse_currency_query,
    parse_date_query,
    parse_unit_query,
    perform_search,
)

SF = "/root/testdata/sf0.001"
TODAY = date(2026, 8, 17)


def test_parse_date_fixed_and_rules():
    c = parse_date_query("days until christmas", TODAY)
    assert c["date"] == "2026-12-25" and c["days"] == 130
    assert c["name"] == "Christmas Day"
    # easter 2026 (Apr 5) already passed on TODAY -> next year's (Mar 28)
    e = parse_date_query("how many days until easter?", TODAY)
    assert e["date"] == "2027-03-28" and e["days"] == (date(2027, 3, 28) - TODAY).days
    t = parse_date_query("days until thanksgiving", TODAY)
    assert t["date"] == "2026-11-26"  # 4th Thursday of November 2026
    assert parse_date_query("days until 2026-09-01", TODAY)["days"] == 15
    assert parse_date_query("weather tomorrow", TODAY) is None


def test_parse_date_full_table():
    # nth-weekday rules (date.ts:258-305): forward from 2026-08-17
    assert parse_date_query("days until labor day", TODAY)["date"] == "2026-09-07"
    assert parse_date_query("days until mlk day", TODAY)["date"] == "2027-01-18"
    assert parse_date_query("days until memorial day", TODAY)["date"] == "2027-05-31"
    assert parse_date_query("days until mothers day", TODAY)["date"] == "2027-05-09"
    gf = parse_date_query("days until good friday", TODAY)
    assert gf["date"] == "2027-03-26" and gf["name"] == "Good Friday"
    # apostrophe alias falls back to the normalized key — including keys
    # that END in ' day' (regression: a "s day"->"s" rewrite used to
    # shorten the alias past the table key for these)
    assert parse_date_query("days until st patrick's day", TODAY)[
        "date"] == "2027-03-17"
    assert parse_date_query("days until mother's day", TODAY)[
        "date"] == "2027-05-09"
    assert parse_date_query("days until father's day", TODAY)[
        "date"] == "2027-06-20"
    assert parse_date_query("days until presidents' day", TODAY)[
        "date"] == "2027-02-15"
    # looking back ('since') -> most recent past occurrence
    j = parse_date_query("days since juneteenth", TODAY)
    assert j["date"] == "2026-06-19" and j["days"] < 0


def test_parse_unit_currency_bang():
    u = parse_unit_query("convert 3 m to ft")
    assert u["converted"] == round(3 * 3.28084, 4)
    c = parse_currency_query("100 usd in eur")
    assert c["from"] == "usd" and c["to"] == "eur" and c["converted"] > 0
    b = parse_bang("!w spark shuffle")
    assert b["redirect"] == "https://en.wikipedia.org/wiki/spark+shuffle"
    assert parse_bang("!nosuchbang x") is None
    assert parse_bang("plain query") is None


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_perform_search_merge(spark, docs):
    cache = spark.createDataFrame(
        [("spark shuffle", "cached summary", False)],
        "query string, summary string, is_null boolean",
    )
    wordnet = spark.createDataFrame(
        [("spark",), ("spork",), ("shark",)], "word string"
    )
    out = perform_search(
        docs, "Spark shuffle", k=5, today=TODAY,
        summaries=cache, wordnet=wordnet,
    )
    assert out["query"] == "spark shuffle"
    assert out["ai_summary"] == "cached summary"
    assert out["date"] is None and out["currency"] is None
    assert out["web_total"] == len(out["web"]) <= 5
    assert all("score" in r for r in out["web"])
    assert out["word"][0]["word"] == "spark"  # exact match ranks first


def test_perform_search_bliptext_slot(spark, docs):
    """The W1 fan-out's bliptext slot (search.ts:69-70,93): best title
    match merged as {type:'bliptext', article} or None, and the full
    response carries every key of the reference's merged JSON
    (search.ts:91-99) when all fixture tables are supplied."""
    from vyntr_spark.serve import search_bliptext

    articles = spark.createDataFrame(
        [("apache-spark", "Apache Spark", "Spark is a cluster engine."),
         ("spark-plug", "Spark plug", "Ignition device."),
         ("zebra", "Zebra", "An animal.")],
        "slug string, title string, content string",
    )
    res = search_bliptext(articles, "apache spark")
    assert res["bestMatch"]["slug"] == "apache-spark"
    assert res["scores"][0]["slug"] == "apache-spark"
    assert all(s["score"] > 0 for s in res["scores"])
    assert "zebra" not in {s["slug"] for s in res["scores"]}
    # bliptext.ts:6-8 — sub-2-char queries return empty, never search
    assert search_bliptext(articles, "x") == {"scores": [],
                                              "bestMatch": None}

    cache = spark.createDataFrame(
        [("q", "s", False)], "query string, summary string, is_null boolean"
    )
    wordnet = spark.createDataFrame([("spark",)], "word string")
    out = perform_search(
        docs, "apache spark", k=3, today=TODAY,
        summaries=cache, wordnet=wordnet, bliptext=articles,
    )
    assert out["bliptext"]["type"] == "bliptext"
    assert out["bliptext"]["article"]["slug"] == "apache-spark"
    # reference merged-response keys all present (search.ts:91-99)
    for key in ("web", "bliptext", "date", "word", "currency",
                "unitConversion", "ai_summary"):
        assert key in out, key
    # no match -> None, mirroring bliptextDetail's null
    out2 = perform_search(docs, "qqqq", k=1, today=TODAY,
                          bliptext=articles)
    assert out2["bliptext"] is None


def test_perform_search_bang_short_circuits(spark, docs):
    out = perform_search(docs, "!g spark", today=TODAY)
    assert out["bang"]["redirect"].startswith("https://www.google.com/")
    assert "web" not in out


def test_perform_search_nsfw_gate(spark, docs):
    # 'NOT nsfw:true' appended by default: flagged sources never surface
    from vyntr_spark.operators import pulse

    flagged = pulse.nsfw_flag(docs, ["src1", "src13"])
    nsfw_ids = {
        r["doc_id"] for r in flagged.filter(F.col("nsfw")).select("doc_id").collect()
    }
    out = perform_search(flagged, "spark data window", k=10, today=TODAY)
    assert nsfw_ids and all(r["doc_id"] not in nsfw_ids for r in out["web"])


def test_perform_search_query_log_increment(spark, docs, tmp_path):
    """W2 at scale: each search APPENDS a (query, 1) increment row
    (O(1) per request); totals come from the rollup, not a per-request
    table rewrite."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vyntr_spark.tables import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("query", T.StringType(), False),
            T.StructField("count", T.LongType(), False),
        ]
    )
    log = store.table("search_queries", schema)
    perform_search(docs, "Spark  ", k=1, today=TODAY, query_log=log)
    out = perform_search(docs, "spark", k=1, today=TODAY, query_log=log)
    assert out["query_count"] == 2
    rolled = {
        r["query"]: r["n"]
        for r in log.read().groupBy("query")
        .agg(F.sum("count").alias("n")).collect()
    }
    assert rolled == {"spark": 2}


def test_query_log_compaction_bounds_row_count(spark, docs, tmp_path):
    """The inline compaction trigger must keep the increment log's
    read-side row count bounded by (distinct queries + compact window),
    not O(total searches), while counts stay exact."""
    from pyspark.sql import types as T

    from vyntr_spark.tables import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("query", T.StringType(), False),
            T.StructField("count", T.LongType(), False),
        ]
    )
    log = store.table("search_queries", schema)
    every = 4
    queries = ["spark", "join", "spark", "shuffle", "spark", "join",
               "spark", "plan", "spark", "join", "spark", "shuffle"]
    last = {}
    for qq in queries:
        out = perform_search(docs, qq, k=1, today=TODAY, query_log=log,
                             query_log_compact_every=every)
        last[qq] = out["query_count"]

    import collections
    want = collections.Counter(queries)
    assert last == dict(want)  # final read-back per query is exact
    # bounded: at most one rolled row per distinct query + the
    # uncompacted tail of increment appends
    n_rows = log.read().count()
    assert n_rows <= len(want) + every, n_rows
    # and compaction actually fired at least once
    assert any(s.mode == "replace" for s in log.snapshots())
