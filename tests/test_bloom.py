"""Bloom-shard prefilter safety: no false negatives, exact-equivalence of
bloom_anti_join to the plain anti-join (SURVEY.md §5.4)."""

from pyspark.sql import functions as F

from vyntr_spark.operators.bloom import (
    BloomShards, _shard_of, bloom_anti_join, shard_expr,
)


def test_bloom_equivalence(spark):
    seen = spark.createDataFrame(
        [(f"http://h{i % 7}.example/p{i}.html",) for i in range(500)], "url string"
    )
    cand = spark.createDataFrame(
        [(f"http://h{i % 7}.example/p{i}.html",) for i in range(400, 900)]
        + [("http://new.example/x",), (None,)],
        "url string",
    ).filter(F.col("url").isNotNull())

    bloom = BloomShards.sized_for(1000, fpp=0.01, n_shards=4).add_df(seen)
    plain = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    for route in ("sharded", "broadcast"):
        via_bloom = {
            r["url"]
            for r in bloom_anti_join(cand, seen, bloom, route=route).collect()
        }
        assert via_bloom == plain, route
        # every truly-new url survived (no false negatives by construction)
        assert "http://new.example/x" in via_bloom


def test_bloom_prefilter_rate(spark):
    """Most unseen urls should be dropped by the bloom (fpp ~1%), so the
    exact confirm join sees only a sliver."""
    seen = spark.createDataFrame(
        [(f"http://a.example/{i}",) for i in range(2000)], "url string"
    )
    unseen = spark.createDataFrame(
        [(f"http://b.example/{i}",) for i in range(2000)], "url string"
    )
    bloom = BloomShards.sized_for(4000, fpp=0.01, n_shards=8).add_df(seen)
    pred = bloom.might_contain_udf(spark)
    fp = unseen.withColumn("m", pred(F.col("url"))).filter("m").count()
    assert fp < 2000 * 0.05, f"false-positive rate too high: {fp}/2000"


def test_shard_expr_matches_python_hash(spark):
    """The native routing expr must agree with the Python _shard_of used
    at build time, else sharded lookups would consult the wrong bitmap."""
    urls = [(f"http://h{i % 13}.example/p{i}?q={i * 7}",) for i in range(300)]
    df = spark.createDataFrame(urls, "url string")
    for n_shards in (4, 8, 1024):
        got = df.select(
            "url", shard_expr(F.col("url"), n_shards).alias("s")
        ).collect()
        for r in got:
            assert r["s"] == _shard_of(r["url"], n_shards), (r["url"], n_shards)


def test_sharded_flagging_no_false_negatives_incremental(spark):
    """extend-then-apply through the sharded route: everything added to
    the bloom must flag as maybe-seen (zero false negatives), across an
    incremental add_df chain (partial bitmaps merged per shard)."""
    a = spark.createDataFrame(
        [(f"http://a.example/{i}",) for i in range(800)], "url string"
    ).repartition(7)
    b = spark.createDataFrame(
        [(f"http://b.example/{i}",) for i in range(800)], "url string"
    ).repartition(5)
    bloom = BloomShards.sized_for(2000, fpp=0.01, n_shards=8)
    bloom = bloom.add_df(a).add_df(b)
    flagged = bloom.flag_maybe_sharded(a.unionByName(b))
    assert flagged.filter(~F.col("_maybe")).count() == 0


def test_crawl_parity_with_bloom(spark, tmp_path):
    """Full crawl parity against the sequential oracle with the bloom
    prefilter ON (the scale path must not change the crawl's URL-seen
    set, fetch ordering, or expansion)."""
    from tests.test_crawl_oracle import (
        _assert_parity, _pages_map, _run_engine,
    )
    from vyntr_spark.oracle import run_oracle
    from vyntr_spark.synth import default_seeds, generate_pages

    rows = generate_pages(60, 4, seed=7)
    seeds = default_seeds(60, 4, k=2)
    orc = run_oracle(_pages_map(rows), seeds, max_pages=10_000, seed=7)
    store, infos = _run_engine(
        spark, tmp_path, rows, seeds, seed=7,
        use_bloom=True, bloom_expected_n=10_000,
    )
    _assert_parity(store, infos, orc, rows)
