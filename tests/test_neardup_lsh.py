"""Scale-parametric embedding LSH (VERDICT r1 #7): adaptive hash width,
banded candidate generation, and the hot-bucket cap on a skewed fixture."""

import math
import random

import pytest
from pyspark.sql import functions as F

from vyntr_spark.operators.vectors import (
    cosine_neardup_pairs, lsh_sign_buckets, n_bits_for,
)

DIM = 64


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def skewed(spark):
    """200 near-identical vectors (one degenerate direction — the
    boilerplate-embedding case) + 100 spread vectors."""
    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(DIM)]
    rows = []
    for i in range(200):
        rows.append(
            (i, [float(b + rng.uniform(-0.01, 0.01)) for b in base])
        )
    for i in range(200, 300):
        rows.append((i, [float(rng.uniform(-1, 1)) for _ in range(DIM)]))
    return _vecs(spark, rows)


def test_n_bits_scales_with_corpus():
    assert n_bits_for(1_000) == 4                      # floor
    assert n_bits_for(10 ** 7, target_bucket=4096) == math.ceil(
        math.log2(10 ** 7 / 4096)
    )
    # the 10^10 case that made fixed-8-bit a scale-killer
    assert n_bits_for(10 ** 10, target_bucket=4096) >= 21
    assert n_bits_for(10 ** 15) == 24                  # ceiling


def test_max_bucket_drops_hot_bucket_with_log(spark, skewed, caplog):
    import logging

    with caplog.at_level(logging.WARNING,
                         logger="vyntr_spark.operators.vectors"):
        pairs = cosine_neardup_pairs(
            skewed, threshold=0.99, n_bits=4, max_bucket=150
        ).collect()
    # the 200-clone bucket was dropped: no quadratic 200x200 block
    assert any("hot bucket" in r.message for r in caplog.records)
    clone_pairs = [p for p in pairs if p["id_a"] < 200 and p["id_b"] < 200]
    assert clone_pairs == []


def test_banded_recall_superset_of_single_band(spark, skewed):
    """A pair colliding in band 0 OR band 1 is a candidate; with the
    same total bit budget, banding can only add candidates relative to
    either single band alone."""
    banded = {
        (p["id_a"], p["id_b"])
        for p in cosine_neardup_pairs(
            skewed, threshold=0.99, n_bits=4, n_bands=2
        ).collect()
    }
    single = {
        (p["id_a"], p["id_b"])
        for p in cosine_neardup_pairs(
            skewed, threshold=0.99, n_bits=4, n_bands=1, seed=42000
        ).collect()
    }
    # band 0 of the banded run IS seed 42000 -> single's hits all survive
    assert single <= banded
    assert banded, "clone cluster must produce near-dup pairs"


def test_bucket_population_bounded_on_spread_data(spark):
    """On non-degenerate data the adaptive width keeps the max bucket
    population within a small multiple of target_bucket."""
    rng = random.Random(11)
    df = _vecs(
        spark,
        [(i, [float(rng.uniform(-1, 1)) for _ in range(DIM)])
         for i in range(2000)],
    )
    bits = n_bits_for(2000, target_bucket=64)
    sizes = (
        lsh_sign_buckets(df, n_bits=bits)
        .groupBy("bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert sizes <= 64 * 8, f"max bucket {sizes} far beyond target"
