"""E2 chunking edge cases + E4 upsert semantics."""

from pyspark.sql import functions as F

from vyntr_spark.operators.vectors import token_chunks
from vyntr_spark.tables import SnapshotStore


def test_token_chunks_windows(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(40))),  # 40 toks -> 3 chunks
            (2, "a b c"),                                # under max -> 1 chunk
            (3, ""),                                     # empty -> 0 chunks
            (4, " ".join(f"w{i}" for i in range(16))),   # exactly max -> 1
            (5, " ".join(f"w{i}" for i in range(17))),   # max+1 -> 2
        ],
        "doc_id long, text string",
    )
    out = token_chunks(df, max_tokens=16, overlap=4)
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out.collect()
    }
    counts = {}
    for (d, _c) in got:
        counts[d] = counts.get(d, 0) + 1
    assert counts == {1: 3, 2: 1, 4: 1, 5: 2}
    # stride 12: chunk 1 of doc 1 starts at w12
    assert got[(1, 1)].startswith("w12 ")
    # overlap: last 4 tokens of chunk 0 == first 4 of chunk 1
    assert got[(1, 0)].split()[-4:] == got[(1, 1)].split()[:4]
    # doc 5: second window covers the tail (tokens 12..16)
    assert got[(5, 1)].split() == [f"w{i}" for i in range(12, 17)]


def test_snapshot_upsert(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    t = store.table("seen")
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "url_hash long, url string")
    )
    t.upsert(
        spark.createDataFrame([(2, "B2"), (3, "c")], "url_hash long, url string"),
        keys=["url_hash"],
    )
    rows = {r["url_hash"]: r["url"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}
    # time travel still sees the pre-merge state
    first = t.snapshots()[0].snapshot_id
    old = {r["url_hash"]: r["url"] for r in t.read(as_of=first).collect()}
    assert old == {1: "a", 2: "b"}


def test_search_composition(spark):
    from vyntr_spark.operators.pulse import search

    df = spark.createDataFrame(
        [
            (1, "spark window data", "en"),
            (2, "spark batch data", "en"),     # excluded: -batch
            (3, "spark window fast", "de"),    # excluded: lang:en
            (4, "nothing relevant here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = search(df, "spark window -batch lang:en", k=5)
    ids = [r["doc_id"] for r in out.collect()]
    assert 1 in ids and 2 not in ids and 3 not in ids


def test_quantize_int8_reference(spark):
    import hashlib

    from vyntr_spark.operators.vectors import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r.asDict() for r in quantize_int8(df).collect()}
    # vec 1: scale = 2/127; q = round(x*127/2) = [64, -127, 32]
    assert out[1]["qhash"] == hashlib.md5(b"64,-127,32").hexdigest()
    assert out[1]["scale"] == round(2.0 / 127.0, 6)
    # zero vector: all-zero codes, no div-by-zero
    assert out[2]["qhash"] == hashlib.md5(b"0,0,0").hexdigest()
    assert out[2]["n_dims"] == 3


def _lloyd_reference(vecs, k, n_iter):
    import hashlib

    seeds = sorted(vecs, key=lambda kv: (hashlib.md5(str(kv[0]).encode())
                                         .hexdigest(), kv[0]))[:k]
    cent = {i: list(v) for i, (_, v) in enumerate(seeds)}

    def assign():
        a = {}
        for vid, v in vecs:
            best = min(
                ((sum((x - c[j]) ** 2 for j, x in enumerate(v)), ci)
                 for ci, c in cent.items()))
            a[vid] = best[1]
        return a

    for _ in range(n_iter):
        a = assign()
        for ci in cent:
            members = [v for vid, v in vecs if a[vid] == ci]
            if members:
                cent[ci] = [round(sum(col) / len(members), 6)
                            for col in zip(*members)]
    return assign()


def test_kmeans_assign_matches_reference(spark):
    import random

    from vyntr_spark.operators.vectors import kmeans_assign

    rng = random.Random(7)
    vecs = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
            for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, k=3, n_iter=2).collect()}
    # float32 storage: the reference must see the same float32-rounded
    # values Spark reads back
    import struct as _s
    vecs32 = [(i, [_s.unpack("f", _s.pack("f", x))[0] for x in v])
              for i, v in vecs]
    want = _lloyd_reference(vecs32, k=3, n_iter=2)
    assert got == want
    assert len(set(got.values())) > 1  # non-degenerate clustering


def test_kmeans_broadcasts_centroids(spark):
    from vyntr_spark.operators.vectors import kmeans_assign

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_assign(df, k=2, n_iter=1)
    # the final frame is localCheckpointed (plan truncated), so assert on
    # the result instead: exact cover of all ids, clusters in range
    rows = out.collect()
    assert sorted(r["vec_id"] for r in rows) == list(range(10))
    assert all(r["cluster"] in (0, 1) for r in rows)


def test_ann_kmeans_topk_probe(spark):
    import random

    from vyntr_spark.operators.vectors import ann_kmeans_topk, cosine_topk

    rng = random.Random(11)
    # two well-separated blobs → the probe list containing the query's
    # blob holds ALL its true neighbors, so nprobe=1 recall is exact
    vecs = [(i, [rng.gauss(5.0, 0.1), rng.gauss(5.0, 0.1)]) for i in range(20)]
    vecs += [(100 + i, [rng.gauss(-5.0, 0.1), rng.gauss(-5.0, 0.1)])
             for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = [5.0, 5.0]
    approx = {r["vec_id"] for r in
              ann_kmeans_topk(df, q, k=5, n_clusters=2, n_iter=2,
                              nprobe=1).collect()}
    exact = {r["vec_id"] for r in cosine_topk(df, q, 5).collect()}
    assert approx == exact
    assert all(v < 100 for v in approx)  # all from the query's blob


def test_semdedup_drops_higher_id_duplicates(spark):
    # 3 exact duplicates (ids 0,1,2), 1 near-orthogonal (id 3), plus a
    # far-away duplicate pair (ids 4,5) — k=2 separates the two groups
    from vyntr_spark.operators import vectors

    a = [1.0, 0.0, 0.0, 0.0] + [0.0] * 60
    b = [0.0, 1.0, 0.0, 0.0] + [0.0] * 60
    far = [100.0, 100.0, 0.0, 0.0] + [0.0] * 60
    rows = [(0, a), (1, a), (2, a), (3, b), (4, far), (5, far)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = vectors.semdedup(emb, k=2, n_iter=2, threshold=0.95)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(got) == 6  # every vector gets a verdict
    assert got[0] == 1 and got[1] == 0 and got[2] == 0  # lowest id kept
    assert got[3] == 1  # orthogonal survivor (cos 0 to the a-dups)
    assert got[4] == 1 and got[5] == 0  # second cluster keeps its min id


def _pq_reference(vecs32, m, sub_dim, k, n_iter):
    """Pure-Python replay of pq_fit: same hash seeds, same min-(d,
    cluster) tie-break, same 6dp centroid rounding, empty cluster keeps
    its previous centroid. vecs32 = [(vec_id, float32-rounded list)]."""
    import hashlib as _h

    seed_ids = sorted(
        (vid for vid, _ in vecs32),
        key=lambda v: (_h.md5(str(v).encode()).hexdigest(), v),
    )[:k]
    subs = {
        (vid, s): v[s * sub_dim:(s + 1) * sub_dim]
        for vid, v in vecs32 for s in range(m)
    }
    cent = {
        (s, ci): list(subs[(vid, s)])
        for ci, vid in enumerate(seed_ids) for s in range(m)
    }
    for _ in range(n_iter):
        assign = {}
        for (vid, s), v in subs.items():
            best = min(
                (sum((x - cent[(s, ci)][j]) ** 2 for j, x in enumerate(v)),
                 ci)
                for ci in range(k)
            )
            assign[(vid, s)] = best[1]
        for s in range(m):
            for ci in range(k):
                members = [subs[(vid, ss)] for (vid, ss), a in assign.items()
                           if ss == s and a == ci]
                if members:
                    cent[(s, ci)] = [
                        round(sum(col) / len(members), 6)
                        for col in zip(*members)
                    ]
    return cent


def test_pq_fit_matches_reference(spark):
    import random
    import struct as _s

    from vyntr_spark.operators.vectors import pq_fit

    rng = random.Random(13)
    vecs = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r["sub"], r["cluster"]): [float(x) for x in r["c"]]
        for r in pq_fit(df, m=2, sub_dim=4, k=3, n_iter=2).collect()
    }
    vecs32 = [(i, [_s.unpack("f", _s.pack("f", x))[0] for x in v])
              for i, v in vecs]
    want = _pq_reference(vecs32, m=2, sub_dim=4, k=3, n_iter=2)
    assert got == want
    assert len(got) == 6  # m*k codebook rows


def test_pq_encode_roundtrip_trained(spark):
    # train -> collect codebook -> encode: every code is the true argmin
    # under the pure-Python distance replay
    import random
    import struct as _s

    from vyntr_spark.operators.vectors import (
        pq_codebook_collect, pq_encode, pq_fit,
    )

    rng = random.Random(17)
    vecs = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    book = pq_codebook_collect(pq_fit(df, m=2, sub_dim=4, k=3, n_iter=2))
    got = {r["vec_id"]: r["codes"]
           for r in pq_encode(df, book, sub_dim=4).collect()}
    import math as _m
    for vid, v in vecs:
        v32 = [_s.unpack("f", _s.pack("f", x))[0] for x in v]
        want = []
        for s in range(2):
            sub = v32[s * 4:(s + 1) * 4]
            d = [
                int(_m.floor(
                    sum((x - c[j]) ** 2 for j, x in enumerate(sub))
                    * 1e6 + 0.5))
                for c in book[s]
            ]
            want.append(d.index(min(d)))
        assert got[vid] == ",".join(str(c) for c in want), vid
