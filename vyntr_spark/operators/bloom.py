"""Partitioned Bloom-shard URL-seen prefilter (north rule scale path).

The reference keeps an exact in-memory HashSet (main.rs:159); at a
10^10-URL frontier an exact set is ~1 TB of strings, so the rebuild uses
the classic two-stage design:

  1. **Bloom prefilter** — K shards, shard = murmur3(url) mod K. Each
     shard is a numpy bitarray built distributively (one bool-reduce per
     shard partition) and broadcast; candidates that the bloom says are
     definitely-unseen skip the expensive exact anti-join.
  2. **Exact confirm** — bloom "maybe seen" survivors (a small fraction:
     the true positives + fpp false positives) are anti-joined against
     the exact ``seen`` table.

  Safety invariant (property-tested): a Bloom filter has NO false
  negatives, so bloom-dropped ⇒ definitely unseen ⇒ the union of
  (bloom-unseen) ∪ (exact-confirmed unseen) equals the plain anti-join.

Memory math at 10^10 URLs, 1% fpp: ~9.6 bits/key → ~12 GB of bitarray
total → 1024 shards of ~12 MB, each executor holding only the shards its
hash range needs; shards update incrementally per round (OR of the new
URLs' bit positions). At sandbox scale K=8 suffices; the layout is the
same.

Pure public APIs: hashing via md5 (stable across engines/sessions).
Build: per-partition partial bitmaps merged executor-side via
reduceByKey (one reduce task per shard; driver sees K blobs). Apply:
candidates hash-routed to their shard and cogrouped with the shard
table so each task holds one bitmap — with a broadcast + vectorized
pandas-UDF fast path for small blooms.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf


_MASK64 = (1 << 64) - 1


def _hashes(url: str, m_bits: int, k: int) -> list[int]:
    """k bit positions via double hashing of md5(url) (Kirsch-Mitzenmacher).
    (h1 + i*h2) wraps mod 2^64 so the scalar form agrees bit-for-bit with
    the vectorized numpy batch path below."""
    d = hashlib.md5(url.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(((h1 + i * h2) & _MASK64) % m_bits) for i in range(k)]


def _shard_of(url: str, n_shards: int) -> int:
    return int.from_bytes(hashlib.md5(url.encode()).digest()[:4], "little") % n_shards


def _digest_matrix(urls) -> np.ndarray:
    """(n, 16) uint8 matrix of md5 digests — the only per-row Python work;
    everything downstream (shard routing, bit positions, membership) is
    vectorized numpy over the whole Arrow batch."""
    buf = b"".join(hashlib.md5(u.encode()).digest() for u in urls)
    return np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)


def _shards_vec(dm: np.ndarray, n_shards: int) -> np.ndarray:
    le = np.ascontiguousarray(dm[:, :4]).view("<u4").ravel()
    return (le % np.uint32(n_shards)).astype(np.int64)


def _positions_vec(dm: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions; uint64 arithmetic wraps mod 2^64, matching
    the scalar ``_hashes``."""
    h1 = np.ascontiguousarray(dm[:, :8]).view(">u8").ravel().astype(np.uint64)
    h2 = (np.ascontiguousarray(dm[:, 8:]).view(">u8").ravel().astype(np.uint64)
          | np.uint64(1))
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def _contains_vec(arr: np.ndarray, dm: np.ndarray,
                  m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership of each digest row against one shard bitmap."""
    pos = _positions_vec(dm, m_bits, k)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    masks = np.left_shift(
        np.uint8(1), (pos & np.uint64(7)).astype(np.uint8), dtype=np.uint8
    )
    return ((arr[byte_idx] & masks) != 0).all(axis=1)


def shard_expr(col, n_shards: int):
    """Native-expression twin of ``_shard_of`` (md5 digest bytes 0..3
    little-endian mod K) so candidate routing stays JVM-side."""
    h = F.md5(col)
    le_hex = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )
    return (F.conv(le_hex, 16, 10).cast("long") % n_shards).cast("int")


def _or_blobs(a: bytes, b: bytes) -> bytes:
    return np.bitwise_or(
        np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


class BloomShards:
    """Immutable snapshot of K bloom shards; build/extend distributively."""

    def __init__(self, n_shards: int, m_bits: int, k_hashes: int,
                 shards: list[np.ndarray] | None = None):
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k_hashes = k_hashes
        self.shards = shards or [
            np.zeros(m_bits // 8 + 1, dtype=np.uint8) for _ in range(n_shards)
        ]

    def total_bytes(self) -> int:
        return sum(s.nbytes for s in self.shards)

    @classmethod
    def sized_for(cls, expected_n: int, fpp: float = 0.01,
                  n_shards: int = 8) -> "BloomShards":
        n = max(expected_n, 1024)
        m = int(-n * math.log(fpp) / (math.log(2) ** 2))
        k = max(1, round(m / n * math.log(2)))
        return cls(n_shards, m, k)

    def add_df(self, urls: DataFrame, url_col: str = "url") -> "BloomShards":
        """OR the bit positions of every url into the shards.

        Scale shape: each input partition emits at most one partial bitmap
        per *touched* shard; ``reduceByKey`` (map-side combine, one reduce
        task per shard) merges the partials executor-side, so the
        partition-count x shard-count partial set is never co-resident
        anywhere — the driver receives exactly ``n_shards`` merged blobs.
        """
        n_shards, m_bits, k_hashes = self.n_shards, self.m_bits, self.k_hashes
        nbytes = m_bits // 8 + 1

        def build(part):
            urls = [row[0] for row in part if row[0] is not None]
            if not urls:
                return []
            dm = _digest_matrix(urls)
            shard_ids = _shards_vec(dm, n_shards)
            pos = _positions_vec(dm, m_bits, k_hashes)
            out = []
            for s in np.unique(shard_ids):
                p = pos[shard_ids == s].ravel()
                byte_idx = (p >> np.uint64(3)).astype(np.int64)
                masks = np.left_shift(
                    np.uint8(1), (p & np.uint64(7)).astype(np.uint8),
                    dtype=np.uint8,
                )
                arr = np.zeros(nbytes, dtype=np.uint8)
                np.bitwise_or.at(arr, byte_idx, masks)
                out.append((int(s), arr.tobytes()))
            return out

        merged = (
            urls.select(url_col).rdd.mapPartitions(build)
            .reduceByKey(_or_blobs, numPartitions=n_shards)
            .collect()
        )
        shards = [s.copy() for s in self.shards]
        for s, b in merged:
            shards[s] |= np.frombuffer(b, dtype=np.uint8)
        return BloomShards(n_shards, m_bits, k_hashes, shards)

    def flag_maybe_sharded(self, candidates: DataFrame,
                           url_col: str = "url") -> DataFrame:
        """Shard-routed maybe-seen flagging: candidates are hash-routed to
        their shard (native expr) and cogrouped with a (shard_id, blob)
        DataFrame, so **each task holds exactly one shard's bitmap** —
        no process ever materializes all shards (the 10^10-URL layout:
        1024 x ~12 MB shards, one per reduce task). Returns the candidate
        columns plus a ``_maybe`` boolean.

        Parallelism = number of shards; use the broadcast
        ``might_contain_udf`` path instead when the whole bloom is small
        enough to ship to every executor.
        """
        n_shards, m_bits, k_hashes = self.n_shards, self.m_bits, self.k_hashes
        spark = candidates.sparkSession
        shards_df = spark.createDataFrame(
            [(i, bytearray(s.tobytes())) for i, s in enumerate(self.shards)],
            "shard_id int, blob binary",
        )
        cand = candidates.withColumn(
            "_shard", shard_expr(F.col(url_col), n_shards)
        )
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("_maybe", T.BooleanType(), True)]
        )
        cand_cols = [f.name for f in candidates.schema.fields]

        def check(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            out = cand_pdf[cand_cols].copy()
            arr = (
                np.frombuffer(shard_pdf["blob"].iloc[0], dtype=np.uint8)
                if len(shard_pdf)
                else None
            )
            urls = cand_pdf[url_col]
            valid = urls.notna().to_numpy()
            maybe = np.zeros(len(cand_pdf), dtype=bool)
            if arr is not None and valid.any():
                dm = _digest_matrix(urls[valid].tolist())
                maybe[valid] = _contains_vec(arr, dm, m_bits, k_hashes)
            out["_maybe"] = maybe
            return out

        return (
            cand.groupby("_shard")
            .cogroup(shards_df.groupby("shard_id"))
            .applyInPandas(check, out_schema)
        )

    def might_contain_udf(self, spark: SparkSession):
        """Broadcast the shards; return a vectorized maybe-seen predicate.
        Small-bloom fast path only — ships every shard to every executor,
        so use ``flag_maybe_sharded`` once total bloom size is beyond a
        few hundred MB."""
        bc = spark.sparkContext.broadcast(
            (self.n_shards, self.m_bits, self.k_hashes,
             [s.tobytes() for s in self.shards])
        )

        # per-worker cache of the stacked matrix: np.stack copies the whole
        # bloom, so doing it per Arrow batch would cost O(bloom bytes) per
        # ~512 rows on the crawl hot path. The closure dict ships empty and
        # persists in each worker process; broadcast.value is deserialized
        # once per worker, so id(blobs) is a stable key there.
        _mat_cache: dict[int, np.ndarray] = {}

        @pandas_udf(T.BooleanType())
        def might_contain(url: pd.Series) -> pd.Series:
            n_shards, m_bits, k_hashes, blobs = bc.value
            # (n_shards, nbytes) matrix: per-row shard select is one gather
            mat = _mat_cache.get(id(blobs))
            if mat is None:
                mat = np.stack([np.frombuffer(b, dtype=np.uint8) for b in blobs])
                _mat_cache.clear()  # bound worker memory to one matrix
                _mat_cache[id(blobs)] = mat
            valid = url.notna().to_numpy()
            maybe = np.zeros(len(url), dtype=bool)
            if valid.any():
                dm = _digest_matrix(url[valid].tolist())
                shard_ids = _shards_vec(dm, n_shards)
                pos = _positions_vec(dm, m_bits, k_hashes)
                byte_idx = (pos >> np.uint64(3)).astype(np.int64)
                masks = np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8),
                    dtype=np.uint8,
                )
                bits = mat[shard_ids[:, None], byte_idx] & masks
                maybe[valid] = (bits != 0).all(axis=1)
            return pd.Series(maybe)

        return might_contain


#: shards whose total size fits comfortably in an executor broadcast take
#: the no-shuffle path; beyond this the cogroup keeps per-task memory at
#: one shard (the 10^10-URL layout)
BROADCAST_MAX_BYTES = 64 << 20


def flag_maybe(bloom: BloomShards, candidates: DataFrame,
               url_col: str = "url", route: str = "auto") -> DataFrame:
    """Candidates + a ``_maybe`` bloom-membership column.

    ``route='auto'`` broadcasts the whole bloom while it is small
    (≤ BROADCAST_MAX_BYTES: a narrow pandas UDF, no shuffle, parallelism =
    input partitions) and switches to the shard-routed cogroup once the
    bloom outgrows what every executor should hold."""
    if route == "auto":
        route = ("broadcast" if bloom.total_bytes() <= BROADCAST_MAX_BYTES
                 else "sharded")
    if route == "sharded":
        return bloom.flag_maybe_sharded(candidates, url_col)
    pred = bloom.might_contain_udf(candidates.sparkSession)
    return candidates.withColumn("_maybe", pred(F.col(url_col)))


def split_by_flag(flagged: DataFrame, seen: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """bloom-definitely-unseen ∪ exact-confirmed-unseen over a flagged
    frame. Callers that materialize the result once should persist
    ``flagged`` first — both union branches read it."""
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    survivors = flagged.filter(F.col("_maybe")).drop("_maybe")
    confirmed_new = survivors.join(seen.select(url_col), url_col, "left_anti")
    return definitely_new.unionByName(confirmed_new)


def bloom_anti_join(candidates: DataFrame, seen: DataFrame,
                    bloom: BloomShards, url_col: str = "url",
                    route: str = "auto") -> DataFrame:
    """Unseen candidates = bloom-definitely-unseen ∪ exact-confirmed.
    Equivalent to candidates.join(seen, url, 'left_anti') — the bloom just
    shrinks the shuffled side. See ``flag_maybe`` for route selection."""
    return split_by_flag(flag_maybe(bloom, candidates, url_col, route),
                         seen, url_col)
