"""Index-served BM25 (P8 from materialized postings/docstats/stats):
parity with the ad-hoc path, filter semantics, and the parquet
materialize/load roundtrip."""

import pytest
from pyspark.sql import functions as F

from vyntr_spark.operators import pulse

DOCS = [
    (0, "spark shuffle join spark", "en", False),
    (1, "spark window agg", "en", False),
    (2, "merge sort spill", "de", False),
    (3, "spark spark spark shuffle", "en", True),
    (4, "join probe build hash", "de", False),
    (5, "", "en", False),  # empty doc: counts in n_docs, absent from avgdl
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, language string, nsfw boolean"
    )


@pytest.fixture(scope="module")
def index(docs):
    return pulse.build_index(docs, meta_cols=("language", "nsfw"))


def test_index_topk_matches_adhoc(docs, index):
    adhoc = pulse.bm25_topk(docs, ["spark", "join"], k=10).collect()
    served = pulse.bm25_topk_from_index(
        index.postings, index.docstats, index.stats, ["spark", "join"], k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in adhoc] == [
        (r["doc_id"], r["score"]) for r in served
    ]


def test_corpus_stats_counts_empty_doc_in_n_only(docs):
    row = pulse.corpus_stats(docs).collect()[0]
    assert row["n_docs"] == 6
    # avgdl over the 5 non-empty docs: (4+3+3+4+4)/5
    assert abs(row["avgdl"] - 18 / 5) < 1e-9


def test_search_index_field_filter(index):
    hits = pulse.search_index(index, "spark", k=10, lang="en").collect()
    ids = {r["doc_id"] for r in hits}
    assert ids == {0, 1, 3}


def test_search_index_must_not(index):
    hits = pulse.search_index(index, "spark NOT nsfw:true", k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 1}
    # scores keep corpus-level idf: equal to unfiltered scores for the
    # same docs (Tantivy boolean-filter semantics)
    full = {
        r["doc_id"]: r["score"]
        for r in pulse.search_index(index, "spark", k=10).collect()
    }
    for r in hits:
        assert r["score"] == full[r["doc_id"]]


def test_search_index_must_term(index):
    # +join restricts to docs containing join (0 and 4); both score on
    # spark+join, doc 0 higher (it matches both terms)
    hits = pulse.search_index(index, "spark +join", k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 4}
    assert hits[0]["doc_id"] == 0


def test_materialize_load_roundtrip(spark, docs, index, tmp_path):
    out = str(tmp_path / "idx")
    pulse.materialize_index(
        docs, out, meta_cols=("language", "nsfw"), bucket_partitions=4
    )
    loaded = pulse.load_index(spark, out, with_meta=True)
    a = pulse.search_index(index, "spark join", k=10).collect()
    b = pulse.search_index(loaded, "spark join", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_perform_search_uses_index(spark, docs, index):
    from vyntr_spark.serve import perform_search
    from datetime import date

    out = perform_search(
        docs, "spark shuffle", k=5, today=date(2025, 1, 1), index=index
    )
    assert out["web"], "index-served search returned no hits"
    assert {r["doc_id"] for r in out["web"]} <= {0, 1, 3}


def test_term_bucket_expr_parity(spark):
    """Driver-side term_bucket must agree with the native expr for every
    bucket width (the query path computes buckets in Python, the write
    path in JVM exprs — disagreement would silently empty results)."""
    terms = ["spark", "join", "a", "0", "über", "東京", "x" * 500]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    for k in (2, 8, 1024):
        got = {
            r["term"]: r["b"]
            for r in df.select(
                "term", pulse.term_bucket_expr(F.col("term"), k).alias("b")
            ).collect()
        }
        assert got == {t: pulse.term_bucket(t, k) for t in terms}, k


def test_bucketed_index_prunes_and_matches(spark, docs, tmp_path):
    """bucket_partitions=K writes hive-partitioned postings; queries
    must (a) return byte-identical results to the flat layout and
    (b) scan only the query terms' bucket directories."""
    bdir, fdir = str(tmp_path / "b"), str(tmp_path / "f")
    pulse.materialize_index(docs, bdir, bucket_partitions=8)
    pulse.materialize_index(docs, fdir)
    bidx = pulse.load_index(spark, bdir)
    fidx = pulse.load_index(spark, fdir)
    assert bidx.n_buckets == 8 and fidx.n_buckets is None

    q = ["spark", "join"]
    got = pulse.bm25_topk_from_index(
        bidx.postings, bidx.docstats, bidx.stats, q, k=10
    ).collect()
    want = pulse.bm25_topk_from_index(
        fidx.postings, fidx.docstats, fidx.stats, q, k=10
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    pruned = pulse.prune_terms(bidx.postings, q, bidx.n_buckets)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the scan reads only the matched buckets' files
    want_buckets = {pulse.term_bucket(t, 8) for t in q}
    files = {
        r[0]
        for r in pruned.select(
            F.input_file_name()
        ).distinct().collect()
    }
    import re
    seen_buckets = {
        int(re.search(r"bucket=(\d+)", f).group(1)) for f in files
    }
    assert seen_buckets <= want_buckets

    # per-term lookup helper prunes to exactly one bucket
    one = bidx.term_postings("spark")
    fs = {
        int(re.search(r"bucket=(\d+)", r[0]).group(1))
        for r in one.select(F.input_file_name()).distinct().collect()
    }
    assert fs == {pulse.term_bucket("spark", 8)}


def test_snippet_hit_window_and_tiebreak(spark):
    from vyntr_spark.operators.pulse import snippet

    long_tail = "x" * 300
    rows = [
        (1, "alpha beta SPARK gamma " + long_tail),  # case-insensitive hit
        (2, "data here and spark there"),            # data at 1 wins
        (3, "nothing relevant at all " + long_tail), # no hit -> preview
        (4, None),                                   # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in snippet(df, ["spark", "data"], width=40).collect()}
    r1 = out[1]
    assert r1["matched_term"] == "spark" and r1["hit_pos"] == 12
    assert r1["snippet"].startswith("…") and r1["snippet"].endswith("…")
    assert "SPARK" in r1["snippet"]
    r2 = out[2]
    assert r2["matched_term"] == "data" and r2["hit_pos"] == 1
    assert not r2["snippet"].startswith("…")   # window starts at text head
    assert not r2["snippet"].endswith("…")     # short text, no tail cut
    r3 = out[3]
    assert r3["matched_term"] is None and r3["hit_pos"] == 0
    assert r3["snippet"] == "nothing relevant at all " + "x" * 16 + "…"
    assert out[4]["snippet"] == "" and out[4]["hit_pos"] == 0
    # query-constant plan: no shuffle, no UDF
    plan = (snippet(df, ["spark"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan
