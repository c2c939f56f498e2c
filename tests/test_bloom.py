"""Bloom-shard prefilter safety: no false negatives, exact-equivalence of
bloom_anti_join to the plain anti-join (SURVEY.md §5.4)."""

from pyspark.sql import functions as F

from vyntr_spark.operators.bloom import BloomShards, bloom_anti_join


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
    via_bloom = {r["url"] for r in bloom_anti_join(cand, seen, bloom).collect()}
    plain = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    assert via_bloom == plain
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
