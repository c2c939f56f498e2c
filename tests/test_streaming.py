"""Structured-Streaming production mode: incremental index build resumes
from its checkpoint and yields the same postings as a batch rebuild."""

from pyspark.sql import functions as F

from vyntr_spark.operators.pulse import postings
from vyntr_spark.streaming.frontier_stream import stream_index_build, stream_metrics


def test_stream_index_build_incremental(spark, tmp_path):
    analyses = str(tmp_path / "analyses")
    post_dir = str(tmp_path / "postings")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [("u1", "spark data spark"), ("u2", "window data")],
        "url string, content_text string",
    )
    batch1.write.mode("append").parquet(analyses)
    stream_index_build(spark, analyses, post_dir, ckpt)

    # append more analyses; AvailableNow resumes from the checkpoint and
    # processes ONLY the new files
    batch2 = spark.createDataFrame(
        [("u3", "spark window")], "url string, content_text string"
    )
    batch2.write.mode("append").parquet(analyses)
    stream_index_build(spark, analyses, post_dir, ckpt)

    got = {
        (r["term"], r["url"], r["tf"])
        for r in spark.read.parquet(post_dir).collect()
    }
    want = {
        (r["term"], r["url"], r["tf"])
        for r in postings(
            batch1.unionByName(batch2), text_col="content_text", id_col="url"
        ).collect()
    }
    assert got == want


def test_stream_metrics_windowed(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck2")
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "fetch", 1.0),
            ("2024-01-01 00:20:00", "fetch", 2.0),
            ("2024-01-01 05:00:00", "fail", 1.0),  # closes the first window
        ],
        "ts string, event_type string, value double",
    ).select(F.col("ts").cast("timestamp"), "event_type", "value")
    df.write.mode("append").parquet(events_dir)
    stream_metrics(spark, events_dir, out, ckpt)
    rows = spark.read.parquet(out).collect()
    fetch = [r for r in rows if r["event_type"] == "fetch"]
    assert fetch and fetch[0]["total"] == 2 and fetch[0]["sum_value"] == 3.0
