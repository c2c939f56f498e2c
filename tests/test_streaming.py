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


def test_stream_host_cap_across_batches(spark, tmp_path):
    """The GroupState counter must persist across separate query runs
    (checkpoint): a host exhausted in run 1 admits nothing in run 2,
    a fresh host admits up to the remaining cap."""
    from vyntr_spark.streaming.frontier_stream import stream_host_cap

    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt_cap")

    b1 = spark.createDataFrame(
        [(f"https://a.ex/p{i}", "a.ex", 0) for i in range(8)]
        + [("https://b.ex/p0", "b.ex", 0)],
        "url string, host string, round long",
    )
    b1.write.mode("append").parquet(frontier)
    stream_host_cap(spark, frontier, out, ckpt, cap=3)

    got1 = spark.read.parquet(out)
    per_host = {r["host"]: r["n"] for r in
                got1.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host == {"a.ex": 3, "b.ex": 1}
    # pinned (round, url) order: the 3 smallest a.ex urls were admitted
    a_urls = sorted(r["url"] for r in got1.filter("host='a.ex'").collect())
    assert a_urls == [f"https://a.ex/p{i}" for i in range(3)]

    # run 2: a.ex is exhausted, b.ex admits 2 more then caps
    b2 = spark.createDataFrame(
        [(f"https://a.ex/q{i}", "a.ex", 1) for i in range(4)]
        + [(f"https://b.ex/p{i}", "b.ex", 1) for i in range(1, 6)],
        "url string, host string, round long",
    )
    b2.write.mode("append").parquet(frontier)
    stream_host_cap(spark, frontier, out, ckpt, cap=3)

    got2 = spark.read.parquet(out)
    per_host = {r["host"]: r["n"] for r in
                got2.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host == {"a.ex": 3, "b.ex": 3}


def test_stream_host_cap_chunked_group_order(spark, tmp_path):
    """A host whose rows span multiple Arrow chunks must admit in the
    global (round, url) order, not per-chunk order (regression: the cap
    used to be spent on the first chunk's rows, i.e. physical file
    order, whenever a group exceeded maxRecordsPerBatch)."""
    from vyntr_spark.streaming.frontier_stream import stream_host_cap

    frontier = str(tmp_path / "frontier_c")
    out = str(tmp_path / "admitted_c")
    ckpt = str(tmp_path / "ckpt_c")

    # one host, 12 rows written in DESCENDING url order so the
    # politeness-smallest urls sit in the last Arrow chunk
    rows = [(f"https://c.ex/p{i:02d}", "c.ex", 0) for i in range(11, -1, -1)]
    (spark.createDataFrame(rows, "url string, host string, round long")
     .coalesce(1).write.mode("append").parquet(frontier))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream_host_cap(spark, frontier, out, ckpt, cap=3)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = sorted(r["url"] for r in spark.read.parquet(out).collect())
    assert got == [f"https://c.ex/p{i:02d}" for i in range(3)]


def test_stream_index_build_bucketed(spark, tmp_path):
    """bucket_partitions appends into the hive bucket=md5(term)%K layout
    — incremental growth keeps the serving path's partition pruning."""
    from vyntr_spark.operators.pulse import term_bucket

    analyses = str(tmp_path / "analyses_b")
    post_dir = str(tmp_path / "postings_b")
    ckpt = str(tmp_path / "ckpt_b")
    spark.createDataFrame(
        [("u1", "spark data spark"), ("u2", "window data")],
        "url string, content_text string",
    ).write.mode("append").parquet(analyses)
    stream_index_build(spark, analyses, post_dir, ckpt, bucket_partitions=8)
    spark.createDataFrame(
        [("u3", "spark window")], "url string, content_text string"
    ).write.mode("append").parquet(analyses)
    stream_index_build(spark, analyses, post_dir, ckpt, bucket_partitions=8)

    post = spark.read.parquet(post_dir)
    rows = post.collect()
    assert {(r["term"], r["url"], r["tf"]) for r in rows} == {
        ("spark", "u1", 2), ("data", "u1", 1), ("window", "u2", 1),
        ("data", "u2", 1), ("spark", "u3", 1), ("window", "u3", 1),
    }
    # every row landed in its term's bucket directory
    assert all(r["bucket"] == term_bucket(r["term"], 8) for r in rows)
    # a pruned term lookup reads only that bucket's files
    one = post.filter(F.col("bucket") == term_bucket("spark", 8)).filter(
        F.col("term") == "spark"
    )
    assert {r["url"] for r in one.collect()} == {"u1", "u3"}


def test_stream_sessionize_gap_merge(spark, tmp_path):
    from vyntr_spark.streaming.frontier_stream import stream_sessionize

    events_dir = str(tmp_path / "sev")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sck")
    df = spark.createDataFrame(
        [
            # user 1: 00:00 and 00:10 merge (gap 30m); 01:00 is a new
            # session; a far-future event closes all watermarks
            ("2024-01-01 00:00:00", 1, 1.0),
            ("2024-01-01 00:10:00", 1, 2.0),
            ("2024-01-01 01:00:00", 1, 4.0),
            ("2024-01-02 00:00:00", 2, 8.0),
        ],
        "ts string, user_id long, value double",
    ).select(F.col("ts").cast("timestamp"), "user_id", "value")
    df.write.mode("append").parquet(events_dir)
    stream_sessionize(spark, events_dir, out, ckpt)
    rows = spark.read.parquet(out).collect()
    u1 = sorted([r for r in rows if r["user_id"] == 1],
                key=lambda r: r["session_start"])
    # the first (closed) session emitted: 2 events, sum 3.0
    assert u1 and u1[0]["n_events"] == 2 and u1[0]["sum_value"] == 3.0


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    from vyntr_spark.streaming.frontier_stream import stream_exact_dedup

    docs_dir = str(tmp_path / "ddocs")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dck")
    b1 = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1, "fpA", "hello"),
         ("2024-01-01 00:01:00", 2, "fpB", "world")],
        "ts string, doc_id long, fingerprint string, text string",
    ).select(F.col("ts").cast("timestamp"), "doc_id", "fingerprint", "text")
    b1.write.mode("append").parquet(docs_dir)
    stream_exact_dedup(spark, docs_dir, out, ckpt)

    # second batch: fpA is a re-crawl within the watermark → dropped;
    # fpC is new → kept
    b2 = spark.createDataFrame(
        [("2024-01-01 00:05:00", 3, "fpA", "hello again"),
         ("2024-01-01 00:06:00", 4, "fpC", "fresh")],
        "ts string, doc_id long, fingerprint string, text string",
    ).select(F.col("ts").cast("timestamp"), "doc_id", "fingerprint", "text")
    b2.write.mode("append").parquet(docs_dir)
    stream_exact_dedup(spark, docs_dir, out, ckpt)

    got = sorted(r["fingerprint"] for r in spark.read.parquet(out).collect())
    assert got == ["fpA", "fpB", "fpC"]
    ids = {r["fingerprint"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids["fpA"] == 1  # the FIRST occurrence won


def test_stream_neardup_dedup_across_batches(spark, tmp_path):
    """Streaming MinHash-LSH guard: identical text arriving later is
    flagged is_dup; the bucket-claim state survives a query restart via
    the checkpoint; shingle-less docs are always kept."""
    from vyntr_spark.streaming.frontier_stream import stream_neardup_dedup

    docs = str(tmp_path / "docs")
    out = str(tmp_path / "neardup")
    ckpt = str(tmp_path / "ckpt_nd")
    text_a = "the quick brown fox jumps over the lazy dog today"
    text_b = "completely different content about spark shuffle plans"

    b1 = spark.createDataFrame(
        [
            ("2024-01-01 00:00:01", 1, text_a),
            ("2024-01-01 00:00:02", 2, text_a),   # same bands as doc 1
            ("2024-01-01 00:00:03", 3, text_b),
            ("2024-01-01 00:00:04", 4, "hi"),     # < k tokens
        ],
        "ts string, doc_id long, text string",
    ).select(F.col("ts").cast("timestamp"), "doc_id", "text")
    b1.write.mode("append").parquet(docs)
    stream_neardup_dedup(spark, docs, out, ckpt)
    got1 = {r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1: False, 2: True, 3: False, 4: False}

    # run 2: state remembered across runs -> doc 5 (text_a) is a dup of
    # doc 1; doc 6 is new
    b2 = spark.createDataFrame(
        [
            ("2024-01-01 01:00:00", 5, text_a),
            ("2024-01-01 01:00:01", 6, "fresh words never seen before ok"),
        ],
        "ts string, doc_id long, text string",
    ).select(F.col("ts").cast("timestamp"), "doc_id", "text")
    b2.write.mode("append").parquet(docs)
    stream_neardup_dedup(spark, docs, out, ckpt)
    got2 = {r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}
    assert got2[5] is True and got2[6] is False
    assert got2[1] is False  # earlier verdicts untouched


def test_stream_neardup_matches_batch_pairs(spark, tmp_path):
    """Parity with the batch operator: the streamed is_dup set equals
    the id_b side of minhash_lsh_pairs' band-collision candidates when
    docs arrive in doc_id order."""
    from vyntr_spark.operators import textstats
    from vyntr_spark.streaming.frontier_stream import stream_neardup_dedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),      # exact dup of 1
        (3, "one two three four five six seven eight"),
        (4, "one two three four five six seven eight"),  # exact dup of 3
        (5, "unique snowflake content entirely its own"),
    ]
    batch_df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = textstats.minhash_lsh_pairs(batch_df, n_hashes=8, bands=4)
    want_dups = {r["id_b"] for r in pairs.select("id_b").collect()}

    docs = str(tmp_path / "docs2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ck2")
    spark.createDataFrame(
        [(f"2024-01-01 00:00:{i:02d}", did, tx)
         for i, (did, tx) in enumerate(rows)],
        "ts string, doc_id long, text string",
    ).select(F.col("ts").cast("timestamp"), "doc_id", "text") \
        .write.mode("append").parquet(docs)
    stream_neardup_dedup(spark, docs, out, ckpt)
    got_dups = {r["doc_id"] for r in
                spark.read.parquet(out).filter("is_dup").collect()}
    assert got_dups == want_dups == {2, 4}


def test_stream_hll_matches_batch(spark, tmp_path):
    from vyntr_spark.operators.sketches import hll_distinct
    from vyntr_spark.streaming.frontier_stream import (
        hll_estimates_from_sink, stream_hll_distinct,
    )

    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "hll")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        ("2020-01-01 10:%02d:00" % (i % 60), f"host{i % 37}.example")
        for i in range(300)
    ] + [
        ("2020-01-01 11:%02d:00" % (i % 60), f"h{i}.example")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "ts string, host string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.write.mode("append").parquet(events_dir)
    stream_hll_distinct(spark, events_dir, out, ckpt)
    # close the watermark: a late row far in the future flushes windows
    spark.createDataFrame(
        [("2020-01-02 10:00:00", "flush.example")], "ts string, host string"
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(
        events_dir
    )
    stream_hll_distinct(spark, events_dir, out, ckpt)

    got = {
        str(r["window_start"]): r["hll_estimate"]
        for r in hll_estimates_from_sink(spark, out).collect()
    }
    # batch replay: same rows, grouped by the same window
    batch = df.select(
        F.date_trunc("hour", "ts").alias("w").cast("string"), "host"
    )
    want = {
        r["w"]: r["hll_estimate"]
        for r in hll_distinct(batch, "host", group_col="w").collect()
    }
    assert set(want) <= set(got)
    for w, est in want.items():
        assert got[w] == est, w
    assert 30 <= got["2020-01-01 10:00:00"] <= 45   # true 37
    assert 65 <= got["2020-01-01 11:00:00"] <= 100  # true 80


def test_stream_cms_matches_batch(spark, tmp_path):
    from vyntr_spark.operators.sketches import cms_build, cms_estimate
    from vyntr_spark.streaming.frontier_stream import stream_cms

    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")

    rows = [("2020-01-01 10:%02d:00" % (i % 60), f"host{i % 13}")
            for i in range(150)]
    df = spark.createDataFrame(rows, "ts string, host string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.write.mode("append").parquet(events_dir)
    stream_cms(spark, events_dir, out, ckpt)
    # flush the watermark
    spark.createDataFrame(
        [("2020-01-02 10:00:00", "flush")], "ts string, host string"
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(
        events_dir
    )
    stream_cms(spark, events_dir, out, ckpt)

    state = spark.read.parquet(out).filter(
        F.col("window_start") == "2020-01-01 10:00:00"
    ).select("r", "bucket", "cnt")
    probes = df.select(F.col("host").alias("word")).distinct()
    got = {r["item"]: r["cms_count"]
           for r in cms_estimate(state, probes, "word").collect()}
    # batch replay over the same window's rows
    batch_cms = cms_build(df.select(F.col("host").alias("word")), "word")
    want = {r["item"]: r["cms_count"]
            for r in cms_estimate(batch_cms, probes, "word").collect()}
    assert got == want
    # sanity: true counts are 150/13 -> 11 or 12, CMS never undershoots
    assert all(v >= 11 for v in got.values())


def test_stream_adaptive_caps_matches_batch(spark, tmp_path):
    """Streaming AIMD caps == the batch controller on the same outcome
    history (every host active in every round, so the per-host window
    equals the batch upto_round window), and the window actually
    slides: a host that recovers gets its cap back once the failing
    rounds age out."""
    from vyntr_spark.operators.scheduling import adaptive_caps_from_stats
    from vyntr_spark.streaming.frontier_stream import stream_adaptive_caps

    rows = []
    for rnd in range(6):
        for host, ok in (("good", True), ("bad", False),
                         ("flaky", rnd >= 3)):  # flaky recovers at r3
            for i in range(4):
                rows.append((host, rnd,
                             "success" if ok else "failed"))
    df = spark.createDataFrame(rows, "host string, round long, outcome string")

    src = str(tmp_path / "outcomes")
    out = str(tmp_path / "caps")
    ckpt = str(tmp_path / "ckpt_aimd")
    # two arrivals: rounds 0-3 then 4-5 (state crosses a restart)
    df.filter("round <= 3").write.mode("append").parquet(src)
    stream_adaptive_caps(spark, src, out, ckpt, base_cap=5, window=3)
    df.filter("round > 3").write.mode("append").parquet(src)
    stream_adaptive_caps(spark, src, out, ckpt, base_cap=5, window=3)

    got = spark.read.parquet(out)
    latest = {
        r["host"]: r["cap"]
        for r in got.orderBy("upto_round").collect()
    }  # later rows overwrite: final cap per host
    # batch controller over the full history at the final round
    stats = (
        df.groupBy("host", "round")
        .agg(F.count("*").alias("attempts"),
             F.sum((F.col("outcome") == "success").cast("long"))
             .alias("successes"))
    )
    batch = {r["host"]: r["cap"]
             for r in adaptive_caps_from_stats(
                 stats, base_cap=5, window=3, upto_round=5).collect()}
    # throttled set identical; healthy hosts keep base cap in the stream
    assert latest["bad"] == batch["bad"] == 1
    assert latest["good"] == 5 and "good" not in batch
    # flaky failed r0-2, succeeded r3-5: window (3,5] is all-success
    assert latest["flaky"] == 5 and "flaky" not in batch
    # mid-stream evidence: flaky WAS throttled while failures were in
    # the window (some row with cap < 5 exists before the recovery aged in)
    flaky_caps = [r["cap"] for r in got.filter("host='flaky'")
                  .orderBy("upto_round").collect()]
    assert flaky_caps[0] == 1
