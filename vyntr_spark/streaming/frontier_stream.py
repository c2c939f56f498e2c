"""Structured-Streaming production mode (SURVEY.md §2 coverage notes).

The reference has no event-time/watermark semantics — its "streaming" is
an mpsc channel + 1 s-tick micro-batching (genesis/src/main.rs:169-214),
which the batch engine models as deterministic rounds. These operators
are the optional production-mode equivalents:

* ``stream_index_build`` — pulse's incremental index build (P5: "commit
  every 1000 docs", pulse/src/main.rs:13) as a file-source stream over
  the analyses table with foreachBatch postings maintenance and a
  checkpoint; ``Trigger.AvailableNow`` drains whatever is committed and
  stops (resumable — the checkpoint carries the file-source log).
* ``stream_metrics`` — the 5 s metrics tick (C20, main.rs:80-111) as a
  windowed event-time aggregation with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.pulse import TOKEN_SPLIT

ANALYSES_MIN = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("content_text", T.StringType(), True),
    ]
)


def stream_index_build(spark: SparkSession, analyses_dir: str,
                       postings_dir: str, checkpoint_dir: str,
                       bucket_partitions: int | None = None):
    """Incrementally maintain the postings table from analyses file
    appends. Returns the finished StreamingQuery (AvailableNow).
    ``bucket_partitions`` appends into the same hive ``bucket =
    md5(term) % K`` layout the serving path prunes on
    (operators/pulse.py materialize_index) so an incrementally-grown
    index keeps O(matched buckets) term lookups."""
    src = (
        spark.readStream.schema(ANALYSES_MIN)
        .option("maxFilesPerTrigger", 64)
        .parquet(analyses_dir)
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        post = (
            batch.select(
                "url",
                F.explode(
                    F.split(F.lower(F.col("content_text")), TOKEN_SPLIT)
                ).alias("term"),
            )
            .filter(F.col("term") != "")
            .groupBy("term", "url")
            .agg(F.count("*").alias("tf"))
        )
        if bucket_partitions:
            from ..operators.pulse import term_bucket_expr

            post = post.withColumn(
                "bucket", term_bucket_expr(F.col("term"), bucket_partitions)
            )
            post.write.mode("append").partitionBy("bucket").parquet(
                postings_dir
            )
            return
        post.write.mode("append").parquet(postings_dir)

    q = (
        src.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_metrics(spark: SparkSession, events_dir: str, out_dir: str,
                   checkpoint_dir: str, window: str = "1 hour",
                   watermark: str = "2 hours"):
    """Windowed fetch-metrics rollup with late-data watermark — the
    streaming analog of the per-round metrics table."""
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("total"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "total", "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_host_cap(spark: SparkSession, frontier_dir: str, out_dir: str,
                    checkpoint_dir: str, cap: int = 5):
    """Streaming politeness admission (C6/C9 analog): admit at most
    ``cap`` URLs per host across the WHOLE stream — a running per-host
    counter in GroupState via ``applyInPandasWithState``.

    This is the custom-stateful case the built-ins can't express:
    watermarked ``dropDuplicates`` dedups identities, it cannot cap a
    per-key admission count across micro-batches. Within a micro-batch
    rows are admitted in the pinned (round, url) politeness order
    (SURVEY.md §8); the counter survives restarts through the query
    checkpoint. Scale: state is one int64 per host, hash-partitioned by
    the group key — the same per-host layout as the batch engine's
    politeness stage."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    frontier_schema = T.StructType([
        T.StructField("url", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("round", T.LongType(), True),
    ])
    out_schema = T.StructType([
        T.StructField("url", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("round", T.LongType(), True),
    ])
    state_schema = T.StructType([T.StructField("n", T.LongType(), True)])

    def admit(key, pdf_iter, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        # Arrow hands the group over as an iterator of bounded chunks
        # (maxRecordsPerBatch rows each). The admission order must be the
        # global (round, url) order over the WHOLE group, so collect the
        # chunks before sorting — a per-chunk sort+head would spend the
        # cap on whichever chunk arrives first, i.e. on physical row
        # order. Memory is bounded by one host's rows in this micro-batch
        # — the same per-host working set the batch politeness stage
        # holds.
        chunks = [pdf for pdf in pdf_iter if not pdf.empty]
        if chunks and n < cap:
            pdf = pd.concat(chunks, ignore_index=True)
            batch = pdf.sort_values(["round", "url"]).head(cap - n)
            n += len(batch)
            yield batch[["url", "host", "round"]]
        state.update((n,))

    src = spark.readStream.schema(frontier_schema).parquet(frontier_dir)
    admitted = src.groupBy("host").applyInPandasWithState(
        admit, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        admitted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_sessionize(spark: SparkSession, events_dir: str, out_dir: str,
                      checkpoint_dir: str, gap: str = "30 minutes",
                      watermark: str = "2 hours"):
    """Streaming gap-based sessionization with Spark's native
    ``session_window`` — the event-time analog of
    operators/temporal.sessionize (same gap semantics; the batch form is
    the oracle-checkable one, this is the production stream). Sessions
    merge across micro-batches until the watermark passes their end,
    then emit exactly once (append mode).

    Scale: state is one (user, open-session) row keyed by user_id — the
    same hash layout as the batch window; the watermark bounds state
    lifetime so an idle user's session closes and leaves memory.
    """
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_exact_dedup(spark: SparkSession, docs_dir: str, out_dir: str,
                       checkpoint_dir: str, watermark: str = "1 hour"):
    """Streaming exact dedup: first occurrence of each fingerprint wins,
    duplicates dropped ACROSS micro-batches —
    ``dropDuplicatesWithinWatermark`` keys state by (fingerprint) and
    the watermark bounds how long a fingerprint is remembered, so state
    is O(unique keys within the watermark horizon), not O(stream).

    The batch analog is textstats.exact_dups; this is the ingest-time
    guard that keeps re-crawled pages from ever landing in the corpus.
    """
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("fingerprint", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(docs_dir)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
