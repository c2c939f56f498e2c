"""pHash banded Hamming near-dup: the pigeonhole recall guarantee and
the mapInPandas hash plumbing."""

import hashlib

import pytest

from vyntr_spark.operators.multimodal import (
    PHASH_BITS, media_from_documents, phash_media, phash_neardup_pairs,
)


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "media_id long, phash long")


def test_phash_worst_case_spread_still_found(spark):
    # 5 flipped bits spread across 5 DIFFERENT 10-bit bands — the worst
    # case for banding; the untouched 6th band still matches
    # (max_hamming=5 < n_bands=6 -> guaranteed)
    base = (1 << 60) - 1 >> 4  # arbitrary 56-bit pattern
    flips = sum(1 << (b * 10) for b in range(5))  # one bit in bands 0-4
    out = phash_neardup_pairs(
        _hashes(spark, [(1, base), (2, base ^ flips)]),
        max_hamming=5, n_bands=6,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 5)]


def test_phash_over_threshold_dropped(spark):
    base = 0x0123456789ABCDE
    flips = sum(1 << (b * 10) for b in range(6))  # 6 bits, 6 bands
    out = phash_neardup_pairs(
        _hashes(spark, [(1, base), (2, base ^ flips)]),
        max_hamming=5, n_bands=6,
    ).collect()
    assert out == []


def test_phash_identical_pair_once(spark):
    # identical hashes collide in EVERY band — distinct must collapse
    # the pair to one row
    out = phash_neardup_pairs(
        _hashes(spark, [(1, 42), (2, 42)]), max_hamming=5, n_bands=6
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_phash_recall_guard():
    with pytest.raises(ValueError):
        phash_neardup_pairs(None, max_hamming=6, n_bands=6)


def test_phash_media_kernel(spark):
    docs = spark.createDataFrame(
        [(7, "hello world")], "doc_id long, text string"
    )
    row = phash_media(media_from_documents(docs)).collect()[0]
    want = int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
    assert (row["media_id"], row["phash"]) == (7, want)
    assert row["phash"] < (1 << PHASH_BITS)
