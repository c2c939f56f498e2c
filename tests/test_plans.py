"""Physical-plan pins: the plans we shipped are the plans we want
(broadcasts, pushdown, pruning, TakeOrdered, no stray Python)."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from vyntr_spark.plans import audit

SF = "/root/testdata/sf0.001"


def test_dim_joins_broadcast(spark):
    df = entry_mod.queries()["h5_nation_revenue"](spark, SF)
    assert audit.has_broadcast_join(df)
    assert not audit.has_shuffled_join(df), "dimension join must not shuffle"


def test_column_pruning_reaches_scan(spark):
    df = entry_mod.queries()["e10_token_count"](spark, SF)
    cols = audit.read_schema_columns(df)
    assert set(cols) == {"doc_id", "text"}, f"over-read: {cols}"


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.filter(F.col("lang") == "en").select("doc_id")
    pf = audit.pushed_filters(df)
    assert "lang" in pf, f"filter not pushed: {pf!r}"


def test_topk_is_take_ordered(spark):
    df = entry_mod.queries()["d4_top_n"](spark, SF)
    assert audit.has_take_ordered(df), "top-N must compile to TakeOrderedAndProject"


def test_native_operators_have_no_python(spark):
    for name in ["d1_clean_regex", "p5_postings", "c6_politeness_window",
                 "t_minhash_lsh_pairs", "e6_vector_mean", "h1_pricing_summary"]:
        df = entry_mod.queries()[name](spark, SF)
        assert audit.python_eval_count(df) == 0, f"{name} leaked into Python"


def test_extraction_is_single_arrow_stage(spark):
    from vyntr_spark.operators.extract_udf import extract_udf
    from vyntr_spark.tables import PAGES

    pages = spark.createDataFrame([], PAGES)
    df = pages.select(extract_udf(F.col("html"), F.col("url")).alias("ex"))
    assert audit.python_eval_count(df) == 1


def test_politeness_no_single_partition_exchange(spark):
    from vyntr_spark.operators.politeness import politeness_select
    from vyntr_spark.tables import FRONTIER

    frontier = spark.createDataFrame(
        [(f"http://h{i % 5}.example/p{i}", f"h{i % 5}.example", 0, 0)
         for i in range(100)],
        FRONTIER,
    )
    plan = audit.executed_plan(politeness_select(frontier))
    assert "SinglePartition" not in plan, "politeness must not globally sort"


def test_r2_native_operators_have_no_python(spark):
    """Round-2 ops that must stay JVM-side: C13 fingerprint, C14 proxy
    pick, full NSFW domains, full unit table, winnowing, batch shuffle,
    index-served BM25."""
    for name in ["c13_fingerprint", "c14_proxy_pick", "p4b_nsfw_domains",
                 "w7b_unit_full", "t_winnow_fp", "c7_batch_shuffle",
                 "p8b_bm25_from_index", "w11_api_usage"]:
        df = entry_mod.queries()[name](spark, SF)
        assert audit.python_eval_count(df) == 0, f"{name} leaked into Python"


def test_index_served_bm25_never_scans_documents(spark):
    """The serving path reads postings/docstats/stats only — a scan of
    the raw corpus in the plan means the O(corpus)-per-query
    anti-pattern came back."""
    import tempfile

    from vyntr_spark.operators import pulse

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        pulse.materialize_index(docs, d, bucket_partitions=4)
        idx = pulse.load_index(spark, d)
        q = pulse.bm25_topk_from_index(
            idx.postings, idx.docstats, idx.stats, ["spark", "data"], k=10
        )
        plan = audit.executed_plan(q)
        assert "documents.parquet" not in plan
        assert audit.python_eval_count(q) == 0


def test_robots_decision_broadcasts_rules_no_python(spark):
    # the per-URL verdict is a broadcast join + native array/regex exprs:
    # the URL side must never shuffle and nothing may leak into Python
    df = entry_mod.queries()["c10d_robots_eval"](spark, SF)
    assert audit.has_broadcast_join(df)
    assert not audit.has_shuffled_join(df)
    assert audit.python_eval_count(df) == 0


def test_capture_dedup_single_agg_no_window(spark):
    # CDX dedup is ONE hash aggregation (max-struct + count) — a window
    # implementation would sort every group; pin its absence
    df = entry_mod.queries()["c29_capture_dedup"](spark, SF)
    plan = audit.executed_plan(df)
    assert "Window" not in plan
    assert audit.python_eval_count(df) == 0


def test_dup_remove_no_window_no_python(spark):
    # span removal is explode + anti-join cover — never a window scan
    df = entry_mod.queries()["t_dup_remove"](spark, SF)
    plan = audit.executed_plan(df)
    assert "Window" not in plan
    assert audit.python_eval_count(df) == 0


def test_h2_derived_partsupp_broadcasts_dims(spark):
    # the derived supplier-part relation is corpus-scale and legitimately
    # shuffles on (partkey, suppkey); every dimension side (supplier ×
    # nation × region, the filtered part set, the per-part min) must not
    # drag it into extra exchanges — pin broadcasts + no Python
    df = entry_mod.queries()["h2_min_cost_supp"](spark, SF)
    assert audit.has_broadcast_join(df)
    assert audit.python_eval_count(df) == 0


def test_pq_encode_zero_shuffle_no_python(spark):
    # PQ encoding must ride the scan: codebook enters as plan literals,
    # so the executed plan has NO Exchange and no Python at all
    df = entry_mod.queries()["t_pq_encode"](spark, SF)
    plan = audit.executed_plan(df)
    assert "Exchange" not in plan
    assert audit.python_eval_count(df) == 0


def test_pq_adc_topk_is_take_ordered(spark):
    # ADC top-K = exact integer sums + TakeOrderedAndProject — never a
    # global Sort, never Python
    df = entry_mod.queries()["t_pq_adc_topk"](spark, SF)
    plan = audit.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert audit.python_eval_count(df) == 0


def test_r2_late_ops_stay_native(spark):
    # every r2-late operator must stay fully JVM-side: no Python eval
    # anywhere in these plans
    for name in ["t_window_rollup", "t_sliding_window", "g5_triangles",
                 "g6_clustering", "p12_tfidf_keywords", "w13_rrf_fusion",
                 "t_cms_word_freq", "t_cms_heavy_hitters",
                 "t_kmv_distinct_words", "t_sampled_quantiles"]:
        df = entry_mod.queries()[name](spark, SF)
        assert audit.python_eval_count(df) == 0, name


def test_window_rollups_no_sort(spark):
    # tumbling/sliding rollups are hash aggs keyed by a projected window
    # start — a per-event Sort/Window would be the wrong plan
    for name in ["t_window_rollup", "t_sliding_window"]:
        plan = audit.executed_plan(entry_mod.queries()[name](spark, SF))
        assert "Window" not in plan, name


def test_hash_classifier_broadcasts_weights(spark):
    # the (feature, weight) table must come in by broadcast; the final
    # doc-keyed rejoin is corpus-scale on both sides and legitimately
    # shuffles, so only the weight side is pinned
    df = entry_mod.queries()["t_hash_classifier"](spark, SF)
    assert audit.has_broadcast_join(df)
    assert audit.python_eval_count(df) == 0


def test_r3_crawl_ops_plans(spark):
    """c30/c31 plan pins: the host-authority and caps tables are
    host-dimension aggregates joined without Python; the frontier side
    of c30's join is never broadcast (it's the 10^10 side)."""
    for name in ("c30_frontier_priority", "c31_adaptive_rate"):
        df = entry_mod.queries()[name](spark, SF)
        assert audit.python_eval_count(df) == 0, name


def test_politeness_host_caps_broadcasts(spark):
    """politeness_select with AIMD caps must broadcast the (host, cap)
    table onto the frontier — a shuffled join on host would re-shuffle
    the 10^10-row frontier for a host-dimension lookup."""
    from vyntr_spark.operators.politeness import politeness_select

    frontier = spark.createDataFrame(
        [(f"http://h{i % 9}.example/p{i}", f"h{i % 9}.example", 0, 0)
         for i in range(300)],
        "url string, host string, depth int, round int",
    )
    caps = spark.createDataFrame(
        [("h3.example", 1), ("h5.example", 2)], "host string, cap int"
    )
    sel = politeness_select(frontier, cap=5, salt_buckets=4, host_caps=caps)
    assert audit.has_broadcast_join(sel)
    assert audit.python_eval_count(sel) == 0
    # and the caps actually bind
    got = sel.groupBy("host").count().collect()
    by_host = {r["host"]: r["count"] for r in got}
    assert by_host["h3.example"] == 1 and by_host["h5.example"] == 2
    assert by_host["h0.example"] == 5


def test_fuzzy_expansion_scans_term_dimension_only(spark):
    """p6d's expansion reads the postings' term column, not the corpus:
    the rewritten query plan must contain no scan of the documents
    text column."""
    df = entry_mod.queries()["p6d_fuzzy_search"](spark, SF)
    assert df.count() <= 10  # executes end-to-end


def test_registered_sharded_packing_no_single_partition(spark):
    """The t_seq_packing_sharded REGISTERED query (token_count →
    shard_plan → pack_sequences(shard_col)) must plan a hash Exchange
    on the shard key end-to-end — no SinglePartition anywhere; the
    global t_seq_packing form keeps its (intentional, oracle-surface)
    SinglePartition window."""
    sharded = entry_mod.queries()["t_seq_packing_sharded"](spark, SF)
    plan = audit.executed_plan(sharded)
    assert "SinglePartition" not in plan
    assert audit.python_eval_count(sharded) == 0
    glob = entry_mod.queries()["t_seq_packing"](spark, SF)
    assert "SinglePartition" in audit.executed_plan(glob)
