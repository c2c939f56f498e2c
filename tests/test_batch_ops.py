"""C7 seeded batch shuffle and D7 skip-if-fresh incremental clean."""

from pyspark.sql import functions as F

from vyntr_spark.operators.cleaner import skip_if_fresh
from vyntr_spark.operators.politeness import batch_shuffle


def _batch(spark, n=100):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url")
    )


def test_batch_shuffle_deterministic_across_partitioning(spark):
    """SURVEY.md §8: the pinned shuffle order must not depend on the
    physical layout (reference main.rs:191-199 is OS-seeded — the rebuild
    pins it)."""
    a = batch_shuffle(_batch(spark), seed=42, rnd=3).collect()
    b = batch_shuffle(_batch(spark).repartition(13), seed=42, rnd=3).collect()
    assert [r["url"] for r in a] == [r["url"] for r in b]
    # ordered by the seeded key, and the key is md5(seed:round:url)
    keys = [r["shuffle_key"] for r in a]
    assert keys == sorted(keys)
    import hashlib
    assert keys[0] == min(
        hashlib.md5(f"42:3:{r['url']}".encode()).hexdigest() for r in a
    )


def test_batch_shuffle_seed_and_round_change_order(spark):
    base = [r["url"] for r in batch_shuffle(_batch(spark), 42, 1).collect()]
    other_seed = [r["url"] for r in batch_shuffle(_batch(spark), 43, 1).collect()]
    other_round = [r["url"] for r in batch_shuffle(_batch(spark), 42, 2).collect()]
    assert base != other_seed
    assert base != other_round


def test_skip_if_fresh_cleans_only_unprocessed(spark):
    docs = spark.createDataFrame(
        [(i, f"text  {i} <b>x</b>") for i in range(10)], "doc_id long, text string"
    )
    processed = docs.filter(F.col("doc_id") < 4)
    out = skip_if_fresh(docs, processed).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(4, 10))
    # the remainder went through the D1 pipeline (tags stripped, spaces squeezed)
    assert all("<b>" not in r["cleaned_text"] for r in out)
    assert all("  " not in r["cleaned_text"] for r in out)


def test_skip_if_fresh_rerun_is_empty(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(5)], "doc_id long, text string"
    )
    assert skip_if_fresh(docs, docs).count() == 0


def test_minhash_lsh_hot_bucket_cap(spark, caplog):
    """Scale guard: a boilerplate clone-cluster's band bucket is dropped
    (with a log line), distinct near-dups elsewhere still pair."""
    import logging

    from vyntr_spark.operators.textstats import minhash_lsh_pairs

    boiler = [(i, "copyright footer nav home about contact " * 3)
              for i in range(40)]
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    pair = [(100, shared + "omega end"), (101, shared + "omega fin")]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    with caplog.at_level(logging.WARNING,
                         logger="vyntr_spark.operators.textstats"):
        pairs = minhash_lsh_pairs(docs, max_bucket=10).collect()
    assert any("hot bucket" in r.message for r in caplog.records)
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (100, 101) in got                      # real near-dups survive
    assert not any(a < 100 and b < 100 for a, b in got)  # clone block dropped
