"""Gopher-style quality filters and paragraph-level exact dedup
(training-data pipeline stages; see operators/textstats.py docstrings).
"""

import pytest

from vyntr_spark.operators import textstats


GOOD = " ".join(f"word{i} alpha beta gamma delta" for i in range(20))


@pytest.fixture()
def docs(spark):
    rows = [
        # 0: long clean doc — keep
        (0, GOOD),
        # 1: too short (< 50 words)
        (1, "tiny doc"),
        # 2: symbol-heavy (### everywhere)
        (2, " ".join(["###"] * 60)),
        # 3: duplicate lines (same line 10x) — dup_line_frac > 0.3
        (3, "\n".join(["the same exact line here"] * 10)),
        # 4: bullet-heavy
        (4, "\n".join([f"- bullet {i}" for i in range(10)])),
        # 5: null text
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_quality_flags(spark, docs):
    out = {r["doc_id"]: r.asDict()
           for r in textstats.gopher_quality(docs.filter("text is not null")).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["keep"] is False and out[2]["symbol_ratio"] > 0.1
    assert out[3]["keep"] is False and out[3]["dup_line_frac"] == pytest.approx(0.9)
    assert out[4]["keep"] is False and out[4]["bullet_frac"] == 1.0


def test_gopher_quality_word_shape():
    # integer-threshold forms equal the float thresholds they encode:
    # mean word length in [3, 10], alpha-word ratio >= 0.8
    assert (3 * 10 <= 35) == (35 / 10 >= 3)


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha\nshared para\nbeta"),
            (2, "shared para\ngamma"),
            (3, "shared para"),
            (4, "  shared para  \ndelta"),  # trims to the same para
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict()
           for r in textstats.paragraph_dedup(df).collect()}
    # doc 1 is the global first (smallest doc_id) — keeps everything
    assert out[1]["dedup_text"] == "alpha\nshared para\nbeta"
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
    # later docs lose the shared paragraph but keep their own, in order
    assert out[2]["dedup_text"] == "gamma"
    assert out[3]["dedup_text"] == ""
    assert out[3]["n_paras"] == 1 and out[3]["n_kept"] == 0
    assert out[4]["dedup_text"] == "delta"


def test_paragraph_dedup_within_doc(spark):
    # a paragraph repeated WITHIN one doc keeps only its first position
    df = spark.createDataFrame(
        [(7, "x\ny\nx\nz\nx")], "doc_id long, text string"
    )
    row = textstats.paragraph_dedup(df).collect()[0]
    assert row["dedup_text"] == "x\ny\nz"
    assert row["n_paras"] == 5 and row["n_kept"] == 3


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this one"),
            (3, "quick brown fox somewhere else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark says the quick brown fox runs",)], "text string"
    )
    out = {r["doc_id"]: r.asDict()
           for r in textstats.decontaminate(docs, bench, k=3).collect()}
    # docs 1 and 3 share the 3-gram "quick brown fox" with the benchmark
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 2  # "the quick brown" too
    assert out[3]["contaminated"] and out[3]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0


def test_decontaminate_broadcasts_benchmark(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c",)], "text string")
    plan = (textstats.decontaminate(docs, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_domain_quality_rollup_integer_gate(spark):
    good = "the and for are with this that from " * 20
    docs = spark.createDataFrame(
        [
            (1, "siteA", good), (2, "siteA", good), (3, "siteA", "x,,,;;;"),
            (4, "siteB", "!!!"), (5, "siteB", ",,,"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["domain"]: r.asDict()
           for r in textstats.domain_quality_rollup(docs).collect()}
    assert out["siteA"]["n_docs"] == 3 and out["siteA"]["n_good"] == 2
    assert out["siteA"]["domain_keep"] is True  # 2*2 >= 3
    assert out["siteB"]["n_good"] == 0 and out["siteB"]["domain_keep"] is False
