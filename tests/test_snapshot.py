"""SnapshotStore semantics: append/replace reads, time travel, rollback."""

from vyntr_spark.tables import SnapshotStore


def test_append_replace_timetravel_rollback(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    t = store.table("seeds")

    assert t.is_empty()
    assert t.read().count() == 0

    s1 = t.commit(spark.createDataFrame([("a",)], "url string"), "append", {"n": 1})
    s2 = t.commit(spark.createDataFrame([("b",)], "url string"), "append", {"n": 2})
    assert {r["url"] for r in t.read().collect()} == {"a", "b"}
    assert {r["url"] for r in t.read(as_of=s1).collect()} == {"a"}

    s3 = t.commit(spark.createDataFrame([("c",)], "url string"), "replace")
    assert {r["url"] for r in t.read().collect()} == {"c"}
    assert {r["url"] for r in t.read(as_of=s2).collect()} == {"a", "b"}

    t.commit(spark.createDataFrame([("d",)], "url string"), "append")
    assert {r["url"] for r in t.read().collect()} == {"c", "d"}

    t.rollback(s3)
    assert {r["url"] for r in t.read().collect()} == {"c"}
    assert t.current_snapshot_id() == s3

    # lineage chain
    snaps = t.snapshots()
    assert [s.parent_id for s in snaps] == [None, s1, s2]
    assert snaps[0].summary == {"n": 1}


def test_fresh_store_reopens(spark, tmp_path):
    root = str(tmp_path / "wh2")
    store = SnapshotStore(spark, root)
    store.table("seeds").commit(spark.createDataFrame([("x",)], "url string"))
    # a second store instance (new "process") sees committed state
    store2 = SnapshotStore(spark, root)
    assert [r["url"] for r in store2.table("seeds").read().collect()] == ["x"]
