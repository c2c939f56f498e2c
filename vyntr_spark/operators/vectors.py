"""Embedding/vector operators (SURVEY.md §2.3, reference
genesis/tools/embedding). ANN indexes (pgvector HNSW,
merge_embeddings.py:69-74) have no Spark analog; the exact top-K is the
test-scale path and LSH sign-bucketing is the scale path (E7 note).

All arithmetic in double precision, scores rounded to 4dp so the DuckDB
oracle hashes identically.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def vector_mean(emb: DataFrame, group_col: str = "label",
                vec_col: str = "embedding") -> DataFrame:
    """E6 (merge_embeddings.py:92-105): element-wise mean per group.
    Exploded output (group, dim, mean_val) — scalable (one shuffle on
    (group, dim), no collect_list of whole vectors) and cleanly
    cross-engine comparable."""
    return (
        emb.select(group_col, F.posexplode(vec_col).alias("dim", "v"))
        .groupBy(group_col, "dim")
        # + 0.0 normalizes IEEE -0.0 after rounding (cross-engine hashing)
        .agg((F.round(F.avg(F.col("v").cast("double")), 4) + F.lit(0.0)).alias("mean_val"))
    )


def unprocessed_scan(chunks: DataFrame, merged: DataFrame,
                     key: str = "url") -> DataFrame:
    """E5 (merge_embeddings.py:79-89): distinct keys lacking a merged row
    (LEFT JOIN ... IS NULL → left_anti)."""
    return chunks.select(key).distinct().join(merged.select(key), key, "left_anti")


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """E9 (search_repl.py:125-144): exact cosine top-K, K=10. The scan is
    embarrassingly parallel; top-K is TakeOrderedAndProject (partial
    per-partition heaps + driver merge) — no full sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (
        emb.select(F.col(id_col), (F.round(score, 4) + F.lit(0.0)).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_sign_buckets(emb: DataFrame, n_bits: int = 8, dim: int = 64,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42) -> DataFrame:
    """Scale-path ANN (E7 analog of BucketedRandomProjectionLSH): sign-bit
    bucketing under deterministic pseudo-random hyperplanes derived from
    md5(seed, bit, dim) — reproducible in plain SQL for the oracle.
    Candidate generation = equi-join on bucket (co-partitioned, no cross
    join)."""
    planes = projection_planes(n_bits, dim, seed)
    bits = []
    for b in range(n_bits):
        p = F.array(*[F.lit(w) for w in planes[b]])
        bits.append(F.when(_dot(F.col(vec_col), p) >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.lit(0)
    for b, bit in enumerate(bits):
        bucket = bucket + bit * F.lit(2 ** b)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def projection_planes(n_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes: w[b][d] = (md5int(seed:b:d) % 2001 - 1000)/1000."""
    planes = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{b}:{d}".encode()).digest()[:8], "big"
            )
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def ann_ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_bits: int = 4, dim: int = 64, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN (the HNSW stand-in of E7, merge_embeddings.py:69-74,
    as a Spark-scalable plan): coarse-quantize vectors into LSH sign
    buckets, probe ONLY the query's bucket, exact cosine top-K within it.
    At 100 TB the bucket is the partition key, so a probe reads
    ~1/2^n_bits of the data (partition pruning), vs the full scan of
    ``cosine_topk``. Approximate by construction: recall trades off
    against n_bits like an IVF nprobe=1 search."""
    planes = projection_planes(n_bits, dim, seed)
    qbucket = sum(
        1 << b
        for b in range(n_bits)
        if sum(planes[b][d] * float(query_vec[d]) for d in range(dim)) >= 0
    )
    buckets = lsh_sign_buckets(emb, n_bits=n_bits, dim=dim,
                               id_col=id_col, vec_col=vec_col, seed=seed)
    cand = emb.join(
        buckets.filter(F.col("bucket") == qbucket).select(id_col), id_col
    )
    return cosine_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)


def n_bits_for(n_vectors: int, target_bucket: int = 4096,
               lo: int = 4, hi: int = 24) -> int:
    """Scale-parametric LSH width: enough sign bits that the EXPECTED
    bucket population n / 2^bits stays near ``target_bucket`` (the
    within-bucket pairwise join is quadratic in bucket size, so a fixed
    width is a scale-killer: 8 bits at 10^10 vectors = ~4x10^7
    rows/bucket)."""
    import math as _m

    bits = _m.ceil(_m.log2(max(n_vectors, 1) / target_bucket)) \
        if n_vectors > target_bucket else lo
    return max(lo, min(hi, bits))


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_bits: int | None = 8, n_bands: int = 1,
                         dim: int = 64, seed: int = 42,
                         max_bucket: int | None = None,
                         expected_n: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.
    Scale path: LSH-bucket first (equi-join) so the pairwise compare runs
    within buckets only, never the full cross product.

    * ``n_bits=None`` sizes the hash adaptively from ``expected_n`` (or
      one count job) via ``n_bits_for`` — bucket populations stay
      bounded as the corpus grows.
    * ``n_bands > 1`` banks several independent narrower sign-hashes
      (seeds derived per band, MinHash-LSH style): a pair is a candidate
      if it collides in ANY band, recovering the recall a single wide
      hash loses while keeping each band's buckets small.
    * ``max_bucket`` drops degenerate hot buckets (near-zero vectors,
      boilerplate embeddings) from pair generation per band — dropped
      bucket/row counts are LOGGED, never silent (scale guard: one hot
      bucket would otherwise go quadratic).
    """
    if n_bits is None:
        n = expected_n if expected_n is not None else emb.count()
        n_bits = n_bits_for(n)

    all_pairs = None
    for band in range(n_bands):
        band_seed = seed if n_bands == 1 else seed * 1000 + band
        b = lsh_sign_buckets(emb, n_bits=n_bits, dim=dim, id_col=id_col,
                             vec_col=vec_col, seed=band_seed)
        if max_bucket is not None:
            sizes = b.groupBy("bucket").count()
            hot = sizes.filter(F.col("count") > max_bucket).collect()
            if hot:
                import logging

                logging.getLogger(__name__).warning(
                    "cosine_neardup_pairs band %d: dropping %d hot "
                    "bucket(s) totaling %d rows (> max_bucket=%d): %s",
                    band, len(hot), sum(r["count"] for r in hot),
                    max_bucket,
                    [(r["bucket"], r["count"]) for r in hot[:10]],
                )
                hot_ids = [r["bucket"] for r in hot]
                b = b.filter(~F.col("bucket").isin(hot_ids))
        pim = b.select(id_col, "bucket")
        left = pim.select(F.col(id_col).alias("id_a"), "bucket")
        right = pim.select(F.col(id_col).alias("id_b"), "bucket")
        cand = (
            left.join(right, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        all_pairs = cand if all_pairs is None else all_pairs.unionByName(cand)
    if n_bands > 1:
        all_pairs = all_pairs.distinct()

    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = all_pairs.join(ea, "id_a").join(eb, "id_b")
    score = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", (F.round(score, 4) + F.lit(0.0)).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Embedding preparation: E1 relevant text, E2 token chunking, E3 stub embed
# ---------------------------------------------------------------------------

TOKEN_SPLIT = "[^a-z0-9]+"


def relevant_text(df: DataFrame, title_col: str, desc_col: str,
                  content_col: str) -> DataFrame:
    """E1 (generate_embeddings.py:90-105): 'Title: {t}\\nDescription: {d}\\n
    Content: {c}' then strip — native format_string + trim."""
    return df.withColumn(
        "relevant_text",
        F.trim(
            F.format_string(
                "Title: %s\nDescription: %s\nContent: %s",
                F.coalesce(F.col(title_col), F.lit("")),
                F.coalesce(F.col(desc_col), F.lit("")),
                F.coalesce(F.col(content_col), F.lit("")),
            )
        ),
    )


def token_chunks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 max_tokens: int = 16, overlap: int = 4) -> DataFrame:
    """E2 (generate_embeddings.py:107-165): sliding token windows of
    effective size ``max_tokens`` with stride ``max_tokens - overlap``;
    windows until the text is exhausted; per-doc chunk_id counter.
    Native exprs only (the HF tokenizer is replaced by the documented
    whitespace/punct tokenizer — no model downloads)."""
    stride = max_tokens - overlap
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), "")
    n = F.size(toks)
    # count = 1 + ceil(max(0, n - max_tokens) / stride); 0 chunks for empty
    extra = F.greatest(n - max_tokens, F.lit(0))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(extra.cast("double") / stride).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(toks, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(
            F.when(n_chunks > 0, chunks).otherwise(F.array().cast(
                "array<struct<chunk_id:int,chunk_text:string>>"
            ))
        ).alias("c"))
        .select(id_col, F.col("c.chunk_id").alias("chunk_id"),
                F.col("c.chunk_text").alias("chunk_text"))
    )


def stub_embed(chunks: DataFrame, dim: int = 8,
               text_col: str = "chunk_text") -> DataFrame:
    """E3/E8 deterministic stub embedder (FIXTURES.md §6): component i =
    md5-derived float in [-1, 1] — no model download, byte-stable across
    engines (exploded output (…, dim, val) for oracle comparison). The
    production path swaps this for an Arrow pandas UDF batching a real
    encoder; the dataflow (chunk → vector → merge/search) is identical."""
    comps = []
    for i in range(dim):
        hx = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col(text_col))), 1, 4),
            16, 10,
        ).cast("double")
        comps.append((hx / 65535.0 * 2.0 - 1.0).alias(f"v{i}"))
    wide = chunks.select("*", *comps)
    arr = F.array(*[F.round(F.col(f"v{i}"), 4) for i in range(dim)])
    return wide.select(
        *chunks.columns, F.posexplode(arr).alias("dim", "val")
    )


def quantize_int8(emb: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization (the standard 4× shrink
    applied to an embedding store before ANN serving): scale =
    max|x|/127, q_i = round(x_i / scale). Pure array expressions — zero
    shuffle, rides the scan.

    Returns (vec_id, n_dims, scale 6dp, qhash) with qhash =
    md5(comma-joined int codes) — the array itself stays internal so the
    surface is driver-canonicalizable (scalar columns only).
    """
    xs = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(xs, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    q = F.when(
        mx > 0,
        F.transform(xs, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(xs, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.size(F.col(vec_col)).cast("long").alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.md5(F.array_join(q, ",")).alias("qhash"),
    )


def _half_away(v: float) -> int:
    """Round half away from zero — Spark F.round's HALF_UP and DuckDB's
    round() agree on this; Python's round() is banker's and does NOT."""
    import math

    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def int8_codes(emb: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """The MATERIALIZABLE int8 store for two-stage ANN serving
    (merge_embeddings.py:69-74 stores float vectors; this is the
    4x-smaller serving copy): (vec_id, scale, codes array<int>) with
    the same symmetric per-vector quantization as :func:`quantize_int8`
    but carrying the codes themselves, and scale UNROUNDED so serving
    from the written table is bit-identical to deriving codes on the
    fly. Write it once per store snapshot; ``ann_rerank_topk`` stage 1
    then scans ONLY this table (1 byte/dim of IO instead of 4)."""
    xs = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(xs, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    codes = F.when(
        mx > 0,
        F.transform(xs, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(xs, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        scale.alias("scale"),
        codes.alias("codes"),
    )


def ann_rerank_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                    c: int = 50, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    store: DataFrame | None = None) -> DataFrame:
    """Two-stage retrieval — the standard production ANN serving shape:

    * **stage 1** scores the int8-quantized store against the quantized
      query — approx = scale_v * scale_q * int-dot, all native exprs —
      and keeps the top-``c`` candidates via TakeOrderedAndProject
      (partial per-partition heaps, no full sort);
    * **stage 2** re-scores ONLY those ``c`` survivors with exact float
      cosine (a broadcast semi-join of the c-row candidate set back
      into the float store) and returns the top-``k``.

    ``store`` is the :func:`int8_codes` table — pass the written
    (materialized) copy and stage 1's scan touches only (vec_id, scale,
    codes): 1 byte per dim of IO instead of 4, the whole point of the
    int8 first pass (plan-pinned in tests/test_plans.py). When ``store``
    is None the codes derive on the fly from ``emb`` — identical
    results (scale is unrounded in both), but the scan reads floats, so
    at scale always pass the materialized store. The recall loss is
    bounded by quantization error, and the exact rerank removes its
    effect on the final ordering within the candidate set. Ties break
    by (score desc, vec_id asc) at both stages so the candidate CUT is
    deterministic and cross-engine reproducible (int-dot is exact
    integer arithmetic; the scale product is one IEEE double expression
    with pinned association)."""
    if store is None:
        store = int8_codes(emb, vec_col=vec_col, id_col=id_col)
    qmx = max(abs(float(x)) for x in query_vec)
    qscale = qmx / 127.0
    qq = F.array(*[
        F.lit(_half_away(float(x) / qscale) if qmx > 0 else 0).cast("long")
        for x in query_vec
    ])
    intdot = F.aggregate(
        F.zip_with(F.col("codes"), qq, lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    approx = F.col("scale") * F.lit(qscale) * intdot.cast("double")
    cand = (
        store.select(F.col("vec_id"), approx.alias("_approx"))
        .orderBy(F.col("_approx").desc(), F.col("vec_id").asc())
        .limit(c)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    survivors = emb.join(
        F.broadcast(cand.select(F.col("vec_id").alias(id_col))),
        id_col,
    )
    return (
        survivors.select(
            F.col(id_col),
            (F.round(score, 4) + F.lit(0.0)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 2,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, DataFrame]:
    """Deterministic k-means (the IVF coarse-quantizer training step
    that turns the LSH-bucketed ANN path into a true IVF index): Lloyd
    iterations with

      * seeds = the k vectors with the smallest (md5(vec_id), vec_id) —
        a hash-uniform, engine-independent sample (NOT kmeans||; the
        point is bit-reproducibility, the hash sample is
        distribution-equivalent to uniform);
      * assignment by squared L2 in double precision, ties broken by
        the smaller cluster id (min over (dist, cluster) structs);
      * centroid update = per-dimension mean ROUNDED to 6dp — the
        rounding pins the centroid bits across engines and float
        summation orders, so the next assignment is deterministic;
      * an empty cluster keeps its previous centroid.

    Plan (MLlib's own shape): centroids live in a k-row DataFrame that
    BROADCASTS into the assignment join — the n-row side never shuffles;
    the update is one posexplode + (cluster, dim) hash agg. Centroid
    lineage is localCheckpoint-truncated per iteration (see
    operators/graph.py for why that is load-bearing on iterative plans).

    Returns (xs, centroids): xs = the persisted (vec_id, v double[])
    working frame (caller unpersists), centroids = the k-row
    (cluster, c double[]) frame after ``n_iter`` Lloyd rounds.
    """
    xs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()

    cent = (
        xs.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("_h", "vec_id")) - 1
             ).alias("cluster"),
            F.col("v").alias("c"),
        )
        .localCheckpoint(eager=True)
    )

    assigned = None
    for _ in range(n_iter):
        assigned = (
            xs.join(F.broadcast(cent))
            .select(
                "vec_id", "v", "cluster",
                _sqdist(F.col("v"), F.col("c")).alias("d"),
            )
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("d", "cluster")).alias("m"),
                F.first("v").alias("v"),
            )
            .select("vec_id", "v", F.col("m.cluster").alias("cluster"))
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), 6).alias("mx"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mx"))),
                    lambda s: s["mx"],
                ).alias("c_new")
            )
        )
        # empty cluster keeps its previous centroid
        cent = (
            cent.join(means, "cluster", "left")
            .select("cluster", F.coalesce("c_new", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    return xs, cent


def kmeans_assign(emb: DataFrame, k: int = 8, n_iter: int = 2,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Final cluster assignment after ``kmeans_fit`` — see that
    docstring. Returns (vec_id, cluster, dist 4dp)."""
    xs, cent = kmeans_fit(emb, k, n_iter, vec_col, id_col)
    out = (
        xs.join(F.broadcast(cent))
        .select("vec_id", "cluster", _sqdist(F.col("v"), F.col("c")).alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cluster").cast("int").alias("cluster"),
            F.round("m.d", 4).alias("dist"),
        )
    )
    out = out.localCheckpoint(eager=True)
    xs.unpersist()
    return out


def ann_kmeans_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                    n_clusters: int = 8, n_iter: int = 2, nprobe: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """True IVF search closing the loop on ``kmeans_fit``: rank the
    trained centroids by squared L2 to the query, probe only the
    ``nprobe`` nearest inverted lists, exact cosine top-k within them.

    At scale the assignment is materialized once (cluster = partition
    key), so a query reads ~nprobe/n_clusters of the store — the
    centroid ranking is k rows on the driver (a query-time constant,
    same as the query vector itself). Recall/nprobe trades off exactly
    as in FAISS-style IVF-Flat."""
    xs, cent = kmeans_fit(emb, n_clusters, n_iter, vec_col, id_col)
    assigned = (
        xs.join(F.broadcast(cent))
        .select("vec_id", _sqdist(F.col("v"), F.col("c")).alias("d"), "cluster")
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster")).alias("m"))
        .select("vec_id", F.col("m.cluster").alias("cluster"))
    )
    q = [float(x) for x in query_vec]
    crows = cent.collect()  # k rows — a query-time constant
    ranked = sorted(
        ((sum((float(v) - q[i]) ** 2 for i, v in enumerate(r["c"])),
          r["cluster"]) for r in crows)
    )
    probe = [c for _, c in ranked[:nprobe]]
    probe_ids = assigned.filter(F.col("cluster").isin(probe)).select(
        F.col("vec_id").alias("_probe_id")
    )
    cand = emb.join(
        probe_ids, F.col(id_col) == F.col("_probe_id"), "left_semi"
    )
    out = cosine_topk(cand, q, k, id_col=id_col, vec_col=vec_col)
    xs.unpersist()
    return out


def semdedup(emb: DataFrame, k: int = 8, n_iter: int = 2,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication for training data — k-means cluster the embedding
    space, then compare pairs ONLY within a cluster and drop every
    vector whose cosine similarity to a lower-id vector in the same
    cluster reaches ``threshold``.

    Determinism deviation from the paper, on purpose: the paper keeps
    the member with the lowest cosine to the cluster centroid; we keep
    the lowest-id member of each duplicate set so the Spark plan and the
    DuckDB oracle agree bit-for-bit (the paper's rule is
    float-tie-fragile across engines). The clustering is the
    deterministic Lloyd of ``kmeans_fit``.

    Scale: this is the whole point of SemDeDup's design — the quadratic
    compare is confined within clusters, so with k scaled ∝ N (cluster
    size held ~constant, same contract as ``n_bits_for``) total pair
    work stays ~N·cluster_size, never N². Assignment is one broadcast
    join; the within-cluster join shuffles on `cluster` (hot-cluster
    guard = raise k; cluster sizes are one groupBy count to audit).

    Returns (vec_id, cluster, keep∈{0,1}) for every input vector.
    """
    assign = kmeans_assign(
        emb, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col
    ).select(id_col, "cluster")
    ea = emb.select(id_col, vec_col).join(assign, id_col)
    left = ea.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cluster"
    )
    right = ea.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cluster"
    )
    score = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    # same 4dp-pinned compare as cosine_neardup_pairs: both engines
    # round the double cosine before the threshold test
    dups = (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b", (F.round(score, 4) + F.lit(0.0)).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("id_b").alias("_dup_id"))
        .distinct()
    )
    return (
        assign.join(dups, F.col(id_col) == F.col("_dup_id"), "left")
        .select(
            id_col,
            "cluster",
            F.when(F.col("_dup_id").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    )


# ---- Product quantization (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) — the standard memory-compression
# path for web-scale ANN: m sub-codebooks of k centroids turn a
# 64-float vector into m small codes (here m·2 bits ≈ 64× shrink), and
# query-time Asymmetric Distance Computation (ADC) scans codes against a
# per-query lookup table instead of raw floats. Complements quantize_int8
# (4×, exact-ish) and the IVF path (kmeans_fit) — IVF-PQ composed =
# probe a coarse list, then ADC within it.


def pq_fit(emb: DataFrame, m: int = 16, sub_dim: int = 4, k: int = 4,
           n_iter: int = 2, vec_col: str = "embedding",
           id_col: str = "vec_id") -> DataFrame:
    """Train the m per-subspace codebooks JOINTLY — one Spark job set per
    Lloyd round regardless of m, by keying every stage with the subspace
    id instead of looping subspaces on the driver:

      * explode each vector into m (sub, v_sub) rows once (persisted);
      * seeds: the k vectors with the smallest (md5(vec_id), vec_id) —
        the same engine-independent hash sample kmeans_fit uses — seed
        ALL m subspaces (per-sub slices of the same k vectors);
      * assignment joins the (m·k)-row centroid frame by BROADCAST on
        sub, so the n·m working rows never shuffle for distance;
      * centroid update = one (sub, cluster, dim) hash agg, means
        rounded to 6dp for bit-reproducibility (kmeans_fit contract);
        empty clusters keep their previous centroid;
      * per-round localCheckpoint truncates the iterative lineage.

    Returns the (sub, cluster, c double[]) codebook frame (m·k rows).
    """
    xs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.array(*[
                F.slice(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    s * sub_dim + 1, sub_dim,
                )
                for s in range(m)
            ])
        ).alias("sub", "v"),
    ).persist()

    seed_ids = (
        xs.select("vec_id").distinct()
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(k)
        .select(
            "vec_id",
            (F.row_number().over(Window.orderBy("_h", "vec_id")) - 1
             ).alias("cluster"),
        )
    )
    cent = (
        xs.join(F.broadcast(seed_ids), "vec_id")
        .select("sub", "cluster", F.col("v").alias("c"))
        .localCheckpoint(eager=True)
    )

    for _ in range(n_iter):
        assigned = (
            xs.join(F.broadcast(cent), "sub")
            .select(
                "vec_id", "sub", "v", "cluster",
                _sqdist(F.col("v"), F.col("c")).alias("d"),
            )
            .groupBy("vec_id", "sub")
            .agg(
                F.min(F.struct("d", "cluster")).alias("mn"),
                F.first("v").alias("v"),
            )
            .select("vec_id", "sub", "v", F.col("mn.cluster").alias("cluster"))
        )
        means = (
            assigned.select("sub", "cluster",
                            F.posexplode("v").alias("dim", "x"))
            .groupBy("sub", "cluster", "dim")
            .agg(F.round(F.avg("x"), 6).alias("mx"))
            .groupBy("sub", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mx"))),
                    lambda st: st["mx"],
                ).alias("c_new")
            )
        )
        cent = (
            cent.join(means, ["sub", "cluster"], "left")
            .select("sub", "cluster",
                    F.coalesce("c_new", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    xs.unpersist()
    return cent


def pq_codebook_collect(cent: DataFrame) -> list[list[list[float]]]:
    """Materialize a trained codebook frame to the nested-list model form
    ``codebook[sub][cluster] -> centroid`` that pq_encode/pq_adc_topk
    embed as literals. The codebook is a MODEL (m·k rows), not data —
    collecting it is the broadcast-a-model pattern, not a driver loop
    over records."""
    rows = cent.collect()
    m = 1 + max(r["sub"] for r in rows)
    k = 1 + max(r["cluster"] for r in rows)
    book: list[list[list[float]]] = [[None] * k for _ in range(m)]
    for r in rows:
        book[r["sub"]][r["cluster"]] = [float(x) for x in r["c"]]
    return book


def fixture_codebook(m: int = 16, k: int = 4, sub_dim: int = 4,
                     seed: int = 42) -> list[list[list[float]]]:
    """Deterministic synthetic codebook for oracle-checked PQ queries:
    values in [-0.25, 0.25) derived from md5(seed:sub:cluster:dim) —
    the same literal lands in the Spark plan and the generated DuckDB
    SQL, so the two sides agree by construction (the projection_planes
    trick, fixture-sized)."""
    book = []
    for s in range(m):
        cl = []
        for c in range(k):
            vec = []
            for d in range(sub_dim):
                h = hashlib.md5(f"{seed}:{s}:{c}:{d}".encode()).hexdigest()
                vec.append(round(int(h[:8], 16) / 0xFFFFFFFF * 0.5 - 0.25, 6))
            cl.append(vec)
        book.append(cl)
    return book


def _pq_sub_dist_micro(vec_col, s: int, centroid: list[float],
                       sub_dim: int):
    """Exact-integer micro-unit squared distance of subspace ``s`` of a
    float[] column to a literal centroid: chained left-associative
    double adds in fixed dim order (identical expression both engines),
    then floor(·1e6 + 0.5) to a long so every later compare/sum is
    exact integer math."""
    expr = None
    for j, cval in enumerate(centroid):
        x = F.element_at(F.col(vec_col), s * sub_dim + j + 1).cast("double")
        t = (x - F.lit(float(cval))) * (x - F.lit(float(cval)))
        expr = t if expr is None else expr + t
    return F.floor(expr * 1e6 + 0.5).cast("long")


def _pq_codes_expr(vec_col: str, codebook: list[list[list[float]]],
                   sub_dim: int):
    """array<int> of the m sub-codes via HIGHER-ORDER functions: the
    codebook enters as one nested array literal and transform/zip_with/
    aggregate walk it — the expression tree stays O(1) in m·k·sub_dim,
    so whole-stage codegen never hits its size cliff (the first, flat
    formulation generated m·k·sub_dim duplicated terms and fell back to
    interpreted eval — 10× slower at sf0.1).

    Exactness contract (what the DuckDB oracle replays term-for-term):
    per-dim squared diff in double, summed LEFT-ASSOCIATIVELY in dim
    order by ``aggregate`` (the 0.0 seed is exact: 0.0 + x == x for the
    non-negative squares), floor(·1e6 + 0.5) to a long, argmin with
    ties to the smallest code (array_position = first hit, matching
    list_position)."""
    book_lit = F.array(*[
        F.array(*[
            F.array(*[F.lit(float(v)) for v in c]) for c in cl
        ])
        for cl in codebook
    ])
    xs = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_for(cl, s):
        sub = F.slice(xs, s * F.lit(sub_dim) + 1, F.lit(sub_dim))
        dists = F.transform(
            cl,
            lambda c: F.floor(
                F.aggregate(
                    F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                ) * 1e6 + 0.5
            ).cast("long"),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.transform(book_lit, code_for)


def pq_encode(emb: DataFrame, codebook: list[list[list[float]]],
              sub_dim: int = 4, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode the store against a (trained or fixture) codebook — pure
    native array expressions, ZERO shuffle: the codebook enters as plan
    literals (the model is km floats; at real scale ship it via
    broadcast the same way), each sub-code is an argmin over k exact
    integer distances, and the whole encode rides the parquet scan.

    Surface is scalar-only for the driver gate: (vec_id, n_subs,
    codes = comma-joined sub-codes)."""
    codes = _pq_codes_expr(vec_col, codebook, sub_dim)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.lit(len(codebook)).cast("long").alias("n_subs"),
        F.array_join(
            F.transform(codes, lambda c: c.cast("string")), ","
        ).alias("codes"),
    )


def pq_adc_topk(emb: DataFrame, codebook: list[list[list[float]]],
                query_vec: list[float], k: int = 10, sub_dim: int = 4,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric Distance Computation top-K: the per-query lookup table
    lut[sub][code] = exact-integer micro squared distance from the query
    subvector to that centroid is computed ONCE driver-side (m·k pure
    model math — replayed identically when the oracle SQL is generated),
    embedded as literals, and each row's ADC distance is an exact LONG
    sum of m table lookups selected by its sub-codes. No floats survive
    into the compare, so the (adc_micro, vec_id) ordering — and
    therefore the top-K row set — is bit-deterministic across engines.
    TakeOrderedAndProject, no full sort."""
    lut = pq_adc_lut(codebook, query_vec, sub_dim)
    lut_lit = F.array(*[
        F.array(*[F.lit(v).cast("long") for v in row]) for row in lut
    ])
    codes = _pq_codes_expr(vec_col, codebook, sub_dim)
    adc = F.aggregate(
        F.zip_with(codes, lut_lit,
                   lambda c, row: F.element_at(row, c + 1)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"), adc.alias("adc_micro"))
        .orderBy("adc_micro", "vec_id")
        .limit(k)
    )


def fixture_query_vec(dim: int = 64, seed: int = 7) -> list[float]:
    """Deterministic synthetic ADC query vector (same md5 literal trick
    as fixture_codebook) so oracle_sql() can embed the identical vector
    without reading data."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"q:{seed}:{d}".encode()).hexdigest()
        out.append(round(int(h[:8], 16) / 0xFFFFFFFF * 0.5 - 0.25, 6))
    return out


def pq_adc_lut(codebook: list[list[list[float]]], query_vec: list[float],
               sub_dim: int = 4) -> list[list[int]]:
    """The per-query ADC lookup table lut[sub][code] = exact-integer
    micro squared distance — pure model math shared by pq_adc_topk and
    the oracle-SQL generator so both embed byte-identical literals."""
    lut = []
    for s, centroids in enumerate(codebook):
        qs = query_vec[s * sub_dim:(s + 1) * sub_dim]
        row = []
        for c in centroids:
            acc = None
            for x, cv in zip(qs, c):
                t = (float(x) - float(cv)) * (float(x) - float(cv))
                acc = t if acc is None else acc + t
            row.append(int(math.floor(acc * 1e6 + 0.5)))
        lut.append(row)
    return lut


def ivfpq_topk(emb: DataFrame, codebook: list[list[list[float]]],
               query_vec: list[float], k: int = 10, n_bits: int = 4,
               dim: int = 64, seed: int = 42, sub_dim: int = 4,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ — the composition that actually serves billion-scale ANN
    (FAISS's IVFPQ shape): the LSH sign-bucket coarse quantizer prunes
    the store to ~1/2^n_bits (bucket = partition key at scale, so the
    probe is partition pruning, not a scan), then PQ ADC scores only the
    probed list with exact-integer lookup sums. Query bucket and the ADC
    LUT are pure model math computed once driver-side."""
    planes = projection_planes(n_bits, dim, seed)
    qbucket = sum(
        1 << b
        for b in range(n_bits)
        if sum(planes[b][d] * float(query_vec[d]) for d in range(dim)) >= 0
    )
    buckets = lsh_sign_buckets(emb, n_bits=n_bits, dim=dim,
                               id_col=id_col, vec_col=vec_col, seed=seed)
    cand = emb.join(
        buckets.filter(F.col("bucket") == qbucket).select(id_col), id_col
    )
    return pq_adc_topk(cand, codebook, query_vec, k, sub_dim,
                       vec_col=vec_col, id_col=id_col)
