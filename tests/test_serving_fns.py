"""Pure-function operators: W9 math eval (shunting-yard), W6 date
computus, P6 query parser — reference-semantics unit tests."""

import pytest

from vyntr_spark.operators.pulse import parse_query
from vyntr_spark.operators.serving import easter_date, math_eval, nth_weekday


@pytest.mark.parametrize("expr,expected", [
    ("2+3*4", 14.0),
    ("(2+3)*4", 20.0),
    ("2^3^2", 512.0),          # right-assoc power (math.ts semantics)
    ("10/4", 2.5),
    ("sqrt(16)+abs(-2)", 6.0),
    ("floor(2.7)+ceil(2.2)", 5.0),
    ("round(2.5)", 2.0),        # python banker's rounding, documented
    ("log(100)", 2.0),
    ("-3+5", 2.0),
    ("2*-3", -6.0),
])
def test_math_eval(expr, expected):
    assert math_eval(expr) == pytest.approx(expected)


def test_math_eval_constants():
    import math

    assert math_eval("sin(pi/2)") == pytest.approx(1.0)
    assert math_eval("ln(e)") == pytest.approx(1.0)
    assert math_eval("pi*2") == pytest.approx(2 * math.pi)


@pytest.mark.parametrize("bad", ["", "1/0", "wat?", "((1+2)", "1+", "sin()", "1 2"])
def test_math_eval_errors(bad):
    assert math_eval(bad) is None


@pytest.mark.parametrize("year,expected", [
    (2024, "2024-03-31"), (2025, "2025-04-20"), (2026, "2026-04-05"),
    (2000, "2000-04-23"), (1999, "1999-04-04"),
])
def test_easter(year, expected):
    assert str(easter_date(year)) == expected


def test_nth_weekday():
    # 4th Thursday of November 2026 (Thanksgiving)
    assert str(nth_weekday(2026, 11, 3, 4)) == "2026-11-26"
    # 1st Monday of September 2025 (Labor Day)
    assert str(nth_weekday(2025, 9, 0, 1)) == "2025-09-01"


def test_parse_query():
    pq = parse_query("spark data AND window NOT nsfw:true -slow lang:en +fast")
    assert pq.terms == ["spark", "data"]
    assert pq.must == ["window", "fast"]
    assert pq.must_not == ["slow"]
    assert pq.fields == {"nsfw": "false", "lang": "en"}


def test_parse_query_edge():
    pq = parse_query("NOT bad OR good field:v")
    assert pq.must_not == ["bad"]
    assert pq.terms == ["good"]
    assert pq.fields == {"field": "v"}
    assert parse_query("").terms == []


def test_proxy_pool_loader_and_assignment(spark):
    """C14: parser drops malformed lines, falls back bad IPs to 0.0.0.0
    (proxy.rs:45-48); assignment is deterministic, balanced-ish, and
    every pick resolves to a pool row."""
    from pyspark.sql import functions as F

    from vyntr_spark.operators.fingerprint import (
        assign_proxies, load_proxy_pool,
    )

    pool = load_proxy_pool(spark, [
        "1.2.3.4:8080:u:p", "bad-line", "5.6.7.8:3128:u:p",
        "300.0.0.1:80:u:p", "only:three:parts",
    ])
    rows = {r["proxy_idx"]: r for r in pool.collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[2]["ip"] == "0.0.0.0"               # bad-IP fallback
    assert rows[2]["addr"] == "http://300.0.0.1:80"  # addr keeps raw text
    assert rows[0]["addr"] == "http://1.2.3.4:8080"

    batch = spark.range(300).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url")
    )
    a = assign_proxies(batch, pool, seed=9, rnd=2).collect()
    b = assign_proxies(batch.repartition(7), pool, seed=9, rnd=2).collect()
    assert {(r["url"], r["proxy_idx"]) for r in a} == \
           {(r["url"], r["proxy_idx"]) for r in b}   # layout-independent
    used = {r["proxy_idx"] for r in a}
    assert used == {0, 1, 2}                         # all proxies rotate in
    assert all(r["addr"] is not None for r in a)

    empty = assign_proxies(batch, pool.filter("proxy_idx < 0"), 9, 2)
    assert empty.filter(F.col("proxy_idx").isNotNull()).count() == 0


def test_rrf_fuse_hand_computed(spark):
    from vyntr_spark.operators.serving import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse(a, b, k=60, topk=10).collect()}
    assert got[3] == round(1 / 63 + 1 / 61, 6)   # in both lists, wins
    assert got[1] == round(1 / 61, 6)
    assert got[4] == round(1 / 62, 6)
    assert got[2] == round(1 / 62, 6)
    # doc 3 (two lists) outranks every single-list doc
    assert got[3] == max(got.values())
