"""Deterministic sampling operators (operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F

from vyntr_spark.operators import sampling


def _keyhash(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def test_sample_deterministic_matches_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = sorted(r["doc_id"] for r in
                 sampling.sample_deterministic(df, 0.3).collect())
    want = sorted(i for i in range(1000)
                  if _keyhash(i) < int(0.3 * 16 ** 15))
    assert got == want
    # uniform hash → rate close to the nominal fraction
    assert 0.25 < len(got) / 1000 < 0.35


def test_sample_deterministic_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in
               sampling.sample_deterministic(df, 0.5).collect())
    b = sorted(r["doc_id"] for r in
               sampling.sample_deterministic(df.repartition(7), 0.5).collect())
    assert a == b


def test_sample_deterministic_no_shuffle(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (sampling.sample_deterministic(df, 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # pure filter, rides the scan


def test_stratified_topn_exact_quota(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)] + [(1000, "fr")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_topn(df, "lang", 4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["en"]) == 4 and len(by_lang["de"]) == 4
    assert by_lang["fr"] == [1000]  # stratum smaller than n → all rows
    # smallest-hash-first: replicate the selection in pure python
    want_en = sorted((i for i in range(90) if i % 3),
                     key=lambda i: (_keyhash(i), i))[:4]
    assert sorted(by_lang["en"]) == sorted(want_en)
