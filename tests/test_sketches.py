"""HLL / KMV sketches vs an exact pure-Python replay + accuracy sanity
(standard error ~1.04/sqrt(64) ~ 13% for HLL at b=6)."""

import hashlib
import math

from vyntr_spark.operators.sketches import (
    HASH_BITS, hll_alpha, hll_distinct, kmv_distinct,
)


def _h60(w):
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16)


def _hll_ref(words, b=6):
    m = 1 << b
    shift = HASH_BITS - b
    mask = (1 << shift) - 1
    M = {}
    for wd in words:
        h = _h60(wd)
        bkt, w = h >> shift, h & mask
        rank = shift + 1 if w == 0 else shift - w.bit_length() + 1
        M[bkt] = max(M.get(bkt, 0), rank)
    scale = shift + 1
    s = sum(1 << (scale - mx) for mx in M.values())
    v = m - len(M)
    s += v * (1 << scale)
    raw = hll_alpha(m) * m * m * float(1 << scale) / float(s)
    est = (float(m) * math.log(float(m) / float(v))
           if (raw <= 2.5 * m and v > 0) else raw)
    return round(est, 4) + 0.0


def _kmv_ref(words, k=32):
    hs = sorted({_h60(w) for w in words})
    if len(hs) < k:
        return round(float(len(hs)), 4) + 0.0
    return round((k - 1) * float(1 << 60) / float(hs[k - 1]), 4) + 0.0


def test_sketches_match_reference_and_are_accurate(spark):
    rows = (
        [("big", f"word{i}") for i in range(2000)]
        + [("small", f"w{i % 9}") for i in range(100)]   # dups collapse
        + [("tiny", "only")]
    )
    df = spark.createDataFrame(rows, "source string, word string")
    hll = {r["source"]: r["hll_estimate"]
           for r in hll_distinct(df, "word").collect()}
    kmv = {r["source"]: r["kmv_estimate"]
           for r in kmv_distinct(df, "word").collect()}
    for grp in ("big", "small", "tiny"):
        words = [w for s, w in rows if s == grp]
        assert hll[grp] == _hll_ref(words), grp
        assert kmv[grp] == _kmv_ref(words), grp
    # accuracy: within 3 standard errors of truth on the big group
    assert abs(hll["big"] - 2000) < 3 * 1.04 / math.sqrt(64) * 2000
    assert abs(kmv["big"] - 2000) < 3 / math.sqrt(31) * 2000
    # below-k groups are EXACT for KMV
    assert kmv["small"] == 9.0
    assert kmv["tiny"] == 1.0


def test_sketch_plans_stay_native(spark):
    from tests.test_plans import audit  # reuse the audit helpers

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "source string, word string"
    )
    assert audit.python_eval_count(hll_distinct(df, "word")) == 0
    assert audit.python_eval_count(kmv_distinct(df, "word")) == 0


def test_cms_never_undershoots_and_mostly_exact(spark):
    from collections import Counter

    from vyntr_spark.operators.sketches import cms_build, cms_estimate

    words = [f"w{i % 40}" for i in range(400)] + ["hot"] * 250
    truth = Counter(words)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    cms = cms_build(df, "word", d=4, w=256)
    probes = spark.createDataFrame(
        [(w,) for w in truth], "word string"
    )
    got = {r["item"]: r["cms_count"]
           for r in cms_estimate(cms, probes, "word", d=4, w=256).collect()}
    assert set(got) == set(truth)
    # CMS can only overshoot
    assert all(got[w] >= c for w, c in truth.items())
    # with 41 items in 256 buckets x 4 rows, nearly all lookups exact
    exact = sum(1 for w, c in truth.items() if got[w] == c)
    assert exact >= len(truth) * 0.9
    assert got["hot"] == 250 or got["hot"] > 250


def test_cms_rejects_non_power_of_two():
    import pytest as _pt

    from vyntr_spark.operators.sketches import cms_build

    with _pt.raises(ValueError):
        cms_build(None, "word", w=100)


def test_cms_lookup_broadcasts_sketch(spark):
    from tests.test_plans import audit

    from vyntr_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",), ("b",)], "word string")
    est = cms_estimate(cms_build(df, "word"), df, "word")
    assert audit.has_broadcast_join(est)
    assert audit.python_eval_count(est) == 0


def test_cms_heavy_hitters_equals_exact(spark):
    from collections import Counter

    from vyntr_spark.operators.sketches import cms_heavy_hitters

    words = [f"tail{i}" for i in range(300)] + ["hot"] * 50 + ["warm"] * 20
    truth = {w: c for w, c in Counter(words).items() if c >= 20}
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["item"]: r["exact_count"]
           for r in cms_heavy_hitters(df, "word", min_count=20).collect()}
    assert got == truth  # sweep+confirm == exact spec, nothing lost


def test_hll_merge_equals_single_group(spark):
    from pyspark.sql import functions as F

    from vyntr_spark.operators.sketches import hll_distinct, hll_merge_groups

    rows = ([("a", f"w{i}") for i in range(400)]
            + [("b", f"w{i}") for i in range(200, 700)]  # overlapping sets
            + [("c", "w5")])
    df = spark.createDataFrame(rows, "source string, word string")
    merged = hll_merge_groups(df, "word", "source").collect()[0][
        "hll_estimate"
    ]
    single = hll_distinct(
        df.withColumn("g", F.lit("ALL")), "word", group_col="g"
    ).collect()[0]["hll_estimate"]
    assert merged == single  # max-of-maxes identity, bit-exact
