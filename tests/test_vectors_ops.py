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
