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


def stream_neardup_dedup(spark: SparkSession, docs_dir: str, out_dir: str,
                         checkpoint_dir: str, n_hashes: int = 8,
                         bands: int = 4, k: int = 3):
    """Streaming NEAR-dup admission — the ingest-time MinHash-LSH guard
    (the batch analog is textstats.minhash_lsh_pairs): a document is
    flagged ``is_dup`` when ANY of its LSH band buckets was already
    claimed by an earlier document; the first claimant of every bucket
    is remembered in GroupState keyed by (band, bucket).

    The MinHash signature is computed PER ROW with array expressions
    (array_min over the shingle-hash array) instead of the batch
    explode+groupBy — no streaming aggregation, so the one stateful
    operator in the query is the bucket-claim state, and the identical
    integer math means a doc gets the same signature here as in the
    batch operator. Docs with no shingles (shorter than ``k`` tokens)
    claim a private sentinel bucket and are always kept.

    State: one int64 owner per distinct band bucket — the same
    cardinality the batch LSH join shuffles on, hash-partitioned by the
    group key. For unbounded streams add a TTL via GroupStateTimeout
    (bounding memory trades off recall against re-crawl distance,
    exactly like the watermark in stream_exact_dedup); this guard keeps
    NoTimeout so the parity with the batch operator over a finite
    corpus is exact.

    Emits (doc_id, is_dup) per document; duplicates-of-earlier-docs get
    ``is_dup = true`` (matching the id_b side of the batch candidate
    pairs when texts collide in a band).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from vyntr_spark.operators.textstats import (
        MINHASH_P, TOKEN_SPLIT, minhash_params,
    )

    schema = T.StructType([
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    src = spark.readStream.schema(schema).parquet(docs_dir)

    toks = F.array_remove(F.split(F.lower(F.coalesce("text", F.lit(""))),
                                  TOKEN_SPLIT), "")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )
    bases = F.transform(
        sh,
        lambda x: F.pmod(
            F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_P),
        ),
    )
    def _sig_component(a: int, b_const: int):
        return F.array_min(
            F.transform(
                bases,
                lambda x: F.pmod(F.lit(a) * x + F.lit(b_const),
                                 F.lit(MINHASH_P)),
            )
        )

    hs = [_sig_component(a, b_) for a, b_ in minhash_params(n_hashes)]
    rows_per_band = n_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[hs[b * rows_per_band + j].cast("string")
                       for j in range(rows_per_band)]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    # shingle-less docs claim a private bucket: always first, always kept
    claims_arr = F.when(F.size(sh) > 0, F.array(*band_structs)).otherwise(
        F.array(
            F.struct(
                F.lit(-1).alias("band"),
                F.concat(F.lit("empty:"), F.col("doc_id").cast("string"))
                .alias("key"),
            )
        )
    )
    claims = src.select(
        "ts", "doc_id", F.explode(claims_arr).alias("bk")
    ).select(
        "ts", "doc_id",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("owner", T.LongType(), True),
    ])
    state_schema = T.StructType([T.StructField("owner", T.LongType(), True)])

    def claim(key, pdf_iter, state):
        import pandas as pd

        chunks = [pdf for pdf in pdf_iter if not pdf.empty]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # global (ts, doc_id) order over the whole group — the claim
        # winner must not depend on Arrow chunk arrival order
        pdf = pdf.sort_values(["ts", "doc_id"])
        owner = state.get[0] if state.exists else int(pdf["doc_id"].iloc[0])
        state.update((owner,))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "owner": owner})

    claimed = claims.groupBy("band", "key").applyInPandasWithState(
        claim, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )

    def verdict(batch, batch_id):
        (
            batch.groupBy("doc_id")
            .agg(F.max((F.col("owner") != F.col("doc_id")).cast("int"))
                 .alias("d"))
            .select("doc_id", (F.col("d") == 1).alias("is_dup"))
            .write.mode("append").parquet(out_dir)
        )

    q = (
        claimed.writeStream.outputMode("append")
        .foreachBatch(verdict)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_hll_distinct(spark: SparkSession, events_dir: str, out_dir: str,
                        checkpoint_dir: str, col: str = "host",
                        window: str = "1 hour", watermark: str = "2 hours",
                        b: int = 6):
    """Windowed distinct-count sketch over the stream — "distinct hosts
    fetched per hour" without keeping every host in state: streaming
    state per (window, bucket) is ONE int (the max rank), i.e. ≤ 2^b
    rows per window whatever the traffic, emitted append-mode when the
    watermark closes the window. The batch finalize (read the sink,
    hll_finalize) turns state into estimates — bit-identical to running
    the batch hll_distinct on the same rows grouped by window, which is
    what the parity test pins."""
    from vyntr_spark.operators.sketches import hll_bucket_expr, hll_rank_expr

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField(col, T.StringType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        src.filter(F.col(col).isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            hll_bucket_expr(F.col(col), b).alias("bucket"),
        )
        .agg(F.max(hll_rank_expr(F.col(col), b)).alias("mx"))
        .select(F.col("w.start").alias("window_start"), "bucket", "mx")
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


def hll_estimates_from_sink(spark: SparkSession, out_dir: str,
                            b: int = 6) -> "DataFrame":
    """Batch finalize over the streaming sketch sink."""
    from vyntr_spark.operators.sketches import hll_finalize

    state = spark.read.parquet(out_dir).select(
        F.col("window_start").alias("grp"), "bucket", "mx"
    )
    return hll_finalize(state, b).select(
        F.col("grp").alias("window_start"), "hll_estimate"
    )


def stream_cms(spark: SparkSession, events_dir: str, out_dir: str,
               checkpoint_dir: str, col: str = "host",
               window: str = "1 hour", watermark: str = "2 hours",
               d: int = 4, w: int = 256):
    """Windowed Count-Min state over the stream — per-(window, hash-row,
    bucket) COUNTS, i.e. ≤ d·w rows of state per window however heavy
    the traffic: the frequency twin of stream_hll_distinct. Emitted
    append-mode when the watermark closes the window; point queries run
    batch-side against the sink (cms_estimate on the window's slice) —
    parity-pinned against the batch cms_build in tests."""
    from vyntr_spark.operators.sketches import _h60

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField(col, T.StringType(), True),
        ]
    )
    src = spark.readStream.schema(schema).parquet(events_dir)
    ex = (
        src.filter(F.col(col).isNotNull())
        .withWatermark("ts", watermark)
        .select(
            "ts",
            F.col(col).alias("item"),
            F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
        )
    )
    bucket = _h60(
        F.concat(F.col("r").cast("string"), F.lit(":"), F.col("item"))
    ).bitwiseAND(F.lit(w - 1))
    agg = (
        ex.groupBy(
            F.window("ts", window).alias("wd"), "r", bucket.alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("wd.start").alias("window_start"), "r", "bucket",
                "cnt")
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


def stream_adaptive_caps(spark: SparkSession, outcomes_dir: str,
                         out_dir: str, checkpoint_dir: str,
                         base_cap: int = 5, window: int = 3):
    """Streaming twin of the batch AIMD politeness controller
    (operators/scheduling.adaptive_caps_from_stats, wired into
    CrawlEngine adaptive_rate): a stream of fetch outcomes
    (host, round, outcome) drives a per-host sliding window of
    per-round aggregates in GroupState, emitting the host's next-round
    cap after every micro-batch.

    This is again the custom-stateful case built-ins can't express: a
    windowed aggregation with watermarks windows EVENT TIME, while the
    AIMD window is the host's last `window` CRAWL ROUNDS regardless of
    when their outcomes arrive (late/out-of-order outcome rows for an
    old round must still update that round's bucket while it is in the
    window). State per host: up to `window` (round, attempts,
    successes) triples — a bounded struct list, hash-partitioned by
    host exactly like the batch politeness stage.

    Emission: (host, upto_round, cap) per host per micro-batch, cap =
    max(1, floor(base_cap * successes/attempts over the window ending
    at the host's latest observed round). With every host active in
    every round this matches the batch controller exactly
    (tests/test_streaming.py parity)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    in_schema = T.StructType([
        T.StructField("host", T.StringType(), True),
        T.StructField("round", T.LongType(), True),
        T.StructField("outcome", T.StringType(), True),
    ])
    out_schema = T.StructType([
        T.StructField("host", T.StringType(), True),
        T.StructField("upto_round", T.LongType(), True),
        T.StructField("cap", T.LongType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("rounds", T.ArrayType(T.LongType()), True),
        T.StructField("attempts", T.ArrayType(T.LongType()), True),
        T.StructField("successes", T.ArrayType(T.LongType()), True),
    ])

    def control(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            rs, ats, scs = state.get
            buckets = {r: [a, s] for r, a, s in zip(rs, ats, scs)}
        else:
            buckets = {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            g = pdf.groupby("round")["outcome"].agg(
                attempts="count", successes=lambda s: int((s == "success").sum())
            )
            for rnd, row in g.iterrows():
                b = buckets.setdefault(int(rnd), [0, 0])
                b[0] += int(row["attempts"])
                b[1] += int(row["successes"])
        if not buckets:
            return
        hi = max(buckets)
        # slide: keep only rounds inside (hi - window, hi]
        buckets = {r: v for r, v in buckets.items() if r > hi - window}
        att = sum(v[0] for v in buckets.values())
        suc = sum(v[1] for v in buckets.values())
        cap = max(1, int(base_cap * suc // att)) if att else base_cap
        state.update((
            sorted(buckets),
            [buckets[r][0] for r in sorted(buckets)],
            [buckets[r][1] for r in sorted(buckets)],
        ))
        yield pd.DataFrame(
            {"host": [key[0]], "upto_round": [hi], "cap": [cap]}
        )

    src = spark.readStream.schema(in_schema).parquet(outcomes_dir)
    caps = src.groupBy("host").applyInPandasWithState(
        control, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        caps.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
