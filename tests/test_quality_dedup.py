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


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.co.uk or visit 192.168.1.254 "
                "or call +44 (0) 20-7946 058 thanks"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and ip 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in textstats.pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["scrubbed"] and "<IP>" in out[1]["scrubbed"]
    assert "<PHONE>" in out[1]["scrubbed"]
    assert "jo.doe" not in out[1]["scrubbed"] and "192.168" not in out[1]["scrubbed"]
    assert out[2]["scrubbed"] == "no pii here at all"
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0
    assert out[3]["n_emails"] == 2 and out[3]["n_ips"] == 1


def test_boilerplate_strip_domain_frequency(spark):
    footer = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            # domain A: footer in 3/4 docs (> 0.5 → stripped); "rare line"
            # in 1/4 (kept)
            (1, "A", f"content one\n{footer}"),
            (2, "A", f"content two\n{footer}\nrare line"),
            (3, "A", f"{footer}\ncontent three"),
            (4, "A", "content four"),
            # domain B: same footer but only 1/2 docs → NOT > 0.5 → kept
            (5, "B", f"{footer}\nb content"),
            (6, "B", "other b content"),
            # domain C: single doc → min_docs guard, nothing stripped
            (7, "C", f"{footer}"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r.asDict()
           for r in textstats.boilerplate_strip(df).collect()}
    assert out[1]["clean_text"] == "content one" and out[1]["n_kept"] == 1
    assert out[2]["clean_text"] == "content two\nrare line"
    assert out[3]["clean_text"] == "content three"
    assert out[4]["clean_text"] == "content four"
    assert footer in out[5]["clean_text"]  # 1/2 is not > 0.5
    assert out[7]["clean_text"] == footer  # single-doc domain untouched
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2


def test_unigram_logprob_orders_rarity(spark):
    # "common" appears 12x, "rare" once → the rare-token doc scores a
    # strictly higher mean NLL
    rows = [(i, "common " * 4) for i in range(3)] + [(9, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in textstats.unigram_logprob(df).collect()}
    import math
    assert out[0]["nll"] == round(-math.log(12 / 13), 4)
    assert out[9]["nll"] == round(-math.log(1 / 13), 4)
    assert out[9]["nll"] > out[0]["nll"]
    assert out[9]["n_tokens"] == 1 and out[0]["n_tokens"] == 4


def test_gopher_repetition_fracs(spark):
    df = spark.createDataFrame(
        [
            # "ab cd" bigram occurs 3x out of 5 positional bigrams;
            # tokens: ab cd ab cd ab cd → 18 word chars... use exact:
            (1, "ab cd ab cd ab cd"),
            # long enough that any single bigram is well under 20% of
            # the doc's characters (Gopher thresholds assume real docs)
            (2, " ".join(f"unique{i:02d}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict()
           for r in textstats.gopher_repetition(df).collect()}
    # doc 1: toks = [ab,cd,ab,cd,ab,cd], tot_wchars=12; bigrams (5):
    # "ab cd"x3 (glen 4) + "cd ab"x2 (glen 4) → top2 = 12/12 = 1.0
    assert out[1]["tot_wchars"] == 12
    assert out[1]["top2_frac"] == 1.0
    # dup5: the single 5-gram occurs once → 0
    assert out[1]["dup5_frac"] == 0.0
    assert out[1]["keep"] is False  # top2 1.0 > 0.20
    # doc 2: every bigram unique → top2 = max single bigram chars / tot
    assert out[2]["keep"] is True
    assert out[2]["dup5_frac"] == 0.0 and out[2]["top2_frac"] < 0.5


def test_gopher_repetition_short_doc(spark):
    df = spark.createDataFrame([(1, "single")], "doc_id long, text string")
    row = textstats.gopher_repetition(df).collect()[0]
    # fewer than 2 tokens → no grams → zeros, keep (vacuous) true
    assert row["tot_wchars"] == 0 and row["keep"] is True


# ---------------------------------------------------------------------------
# C4 line + page filters
# ---------------------------------------------------------------------------


def test_c4_line_filters(spark):
    rows = [
        # 0: three good sentences -> keep
        (0, "this sentence is long enough to survive.\n"
            "another proper sentence with terminal punctuation!\n"
            'a third one ends with a quote so it stays."'),
        # 1: good lines but only two -> page dropped (< 3 sentences)
        (1, "this sentence is long enough to survive.\n"
            "another proper sentence with terminal punctuation!"),
        # 2: line-level drops: no terminal punct / short / javascript /
        #    cookie policy — all four lines die, page dropped
        (2, "no terminal punctuation on this line\n"
            "too short.\n"
            "please enable javascript to continue reading this.\n"
            "we updated our cookie policy again today folks."),
        # 3: lorem ipsum poison -> page dropped despite 3 good lines
        (3, "this sentence is long enough to survive.\n"
            "another proper sentence with terminal punctuation!\n"
            "lorem ipsum dolor sit amet consectetur adipiscing elit."),
        # 4: curly brace poison -> page dropped
        (4, "this sentence is long enough to survive.\n"
            "another proper sentence with terminal punctuation!\n"
            "function f() { return this sentence anyway. }"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in textstats.c4_line_filters(df).collect()}
    assert out[0]["keep"] is True and out[0]["n_kept"] == 3
    assert out[1]["keep"] is False and out[1]["n_kept"] == 2
    assert out[2]["keep"] is False and out[2]["n_kept"] == 0
    assert out[2]["n_lines"] == 4
    assert out[3]["keep"] is False and out[3]["has_lorem"] is True
    assert out[4]["keep"] is False and out[4]["has_brace"] is True
    # kept_frac reflects the line survival rate, not the page verdict
    assert out[2]["kept_frac"] == 0.0
    assert out[0]["kept_frac"] == 1.0


def test_c4_clean_hash_is_joined_survivors(spark):
    import hashlib

    df = spark.createDataFrame(
        [(0, "good sentence number one stays right here.\n"
             "dropped line\n"
             "good sentence number two stays right here too.")],
        "doc_id long, text string",
    )
    row = textstats.c4_line_filters(df).collect()[0]
    expect = hashlib.md5(
        ("good sentence number one stays right here.\n"
         "good sentence number two stays right here too.").encode()
    ).hexdigest()
    assert row["clean_hash"] == expect


# ---------------------------------------------------------------------------
# CCNet per-language perplexity buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_per_language_thirds(spark):
    # 6 docs per language; within a language, docs built from rarer
    # tokens score a higher unigram NLL and must land in later buckets
    common = "alpha " * 12
    rows = []
    for li, lang in enumerate(["en", "de"]):
        for i in range(6):
            # doc i mixes the common token with i distinct rare tokens
            rare = " ".join(f"rare{lang}{i}x{j}" for j in range(i))
            rows.append((li * 10 + i, lang, (common + rare).strip()))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = textstats.ccnet_buckets(df).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert sorted(r["bucket"] for r in rs) == sorted(
            ["head", "head", "middle", "middle", "tail", "tail"]
        )
        # monotone: nll order matches bucket order
        rs.sort(key=lambda r: (r["nll"], r["doc_id"]))
        assert [r["bucket"] for r in rs] == [
            "head", "head", "middle", "middle", "tail", "tail"]


def test_bpe_token_count_pieces(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "it's 2026!  multi  space"),
         (2, "a1b2"), (3, None), (4, "x...y, z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_pieces"], r["n_tokens"])
           for r in textstats.bpe_token_count(df).collect()}
    # "hello" + " world" — the leading space glues to the word piece
    assert out[0] == (2, 2)
    # it / ' / s / " 2026" / ! / "  " / multi / "  " / space
    assert out[1] == (9, 7)
    # letter-run and digit-run alternate: a / 1 / b / 2
    assert out[2] == (4, 4)
    assert out[3] == (0, 0)
    # x / ... / y / , / " z"
    assert out[4] == (5, 5)


def test_dup_spans_hand_computed(spark):
    """Cross-doc duplicated grams count; within-doc repetition does not;
    short docs get zero grams and never flag."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"),       # grams: abc bcd cde def
         (2, "a b c d x y"),       # grams: abc bcd cdx dxy -> 2/4 shared
         (3, "z z z z z z z z"),   # 6x "z z z", all within-doc only
         (4, "q w")],              # shorter than k
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in textstats.dup_spans(docs, k=3, flag_frac=0.5).collect()}
    assert (out[1]["n_grams"], out[1]["n_dup_grams"]) == (4, 2)
    assert out[1]["dup_frac"] == 0.5 and out[1]["dup_flag"] is True
    assert (out[2]["n_grams"], out[2]["n_dup_grams"]) == (4, 2)
    assert (out[3]["n_grams"], out[3]["n_dup_grams"]) == (6, 0)
    assert out[3]["dup_flag"] is False
    assert (out[4]["n_grams"], out[4]["dup_frac"],
            out[4]["dup_flag"]) == (0, 0.0, False)
    # aggregate/join-only plan — no windows, no cross joins
    plan = (textstats.dup_spans(docs, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "CartesianProduct" not in plan


def test_dedup_spans_remove_hand_computed(spark):
    import hashlib

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y z"),   # owner of the shared 3-grams
            (2, "q r a b c d e w"),   # loses the covered middle
            (3, "a b c"),             # fully covered -> empty survivor
            (4, "m n"),               # shorter than k: untouched
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           textstats.dedup_spans_remove(docs, k=3).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_removed"] == 0 and out[1]["n_tokens"] == 8
    assert out[1]["clean_hash"] == md5("a b c d e x y z")
    # doc 2: dup starts at p=2,3,4 cover p=2..6 -> "q r w" survives
    assert out[2]["n_removed"] == 5
    assert out[2]["clean_hash"] == md5("q r w")
    assert out[2]["kept_frac"] == pytest.approx(3 / 8, abs=1e-4)
    assert out[3]["n_removed"] == 3 and out[3]["clean_hash"] == md5("")
    assert out[4]["n_removed"] == 0 and out[4]["clean_hash"] == md5("m n")


def test_hash_classifier_known_weights(spark):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def wt(tok):
        fid = h60(tok) % 1024
        return (h60(f"w{fid}") % 2001) - 1000

    docs = spark.createDataFrame(
        [(1, "hello world hello"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in
           textstats.hashed_linear_score(docs).collect()}
    exp = round((2 * wt("hello") + wt("world")) / 3000.0, 4) + 0.0
    assert out[1]["n_tokens"] == 3
    assert out[1]["score"] == pytest.approx(exp, abs=1e-9)
    assert out[1]["label"] == (exp >= 0)
    for d in (2, 3):  # empty/null docs: neutral score, positive label
        assert out[d]["n_tokens"] == 0 and out[d]["score"] == 0.0
        assert out[d]["label"] is True


def test_containment_catches_subset_jaccard_misses(spark):
    from vyntr_spark.operators.textstats import (
        containment_pairs, ngram_jaccard_pairs,
    )

    long_text = " ".join(f"w{i}" for i in range(60))
    short_text = " ".join(f"w{i}" for i in range(12))  # strict prefix
    df = spark.createDataFrame(
        [(1, "s", long_text), (2, "s", short_text), (3, "s", "x y z q r")],
        "doc_id long, source string, text string",
    )
    got = {(r["id_sub"], r["id_super"]): r["containment"]
           for r in containment_pairs(df, threshold=0.8).collect()}
    # the short doc is fully contained in the long one...
    assert got[(2, 1)] == 1.0
    # ...directed: the long one is NOT contained in the short one
    assert (1, 2) not in got
    assert not any(3 in p for p in got)
    # and symmetric Jaccard misses this pair at the same threshold
    jac = {(r["id_a"], r["id_b"]) for r in
           ngram_jaccard_pairs(df, threshold=0.8).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac


def test_collocations_hand_computed(spark):
    import math

    from vyntr_spark.operators.textstats import collocations

    # "big data" appears 4x, unigram slots: big=4+? etc.
    df = spark.createDataFrame(
        [(1, "big data big data"), (2, "big data big data small data")],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
           for r in collocations(df, min_count=2).collect()}
    # bigram occurrences: doc1: (big,data),(data,big),(big,data);
    # doc2: (big,data),(data,big),(big,data),(data,small),(small,data)
    # -> N=8; (big,data)=4, (data,big)=2
    # slots: big=4+2*? count w1/w2 occurrences across pairs:
    # big: w1 in 4 (big,data) + w2 in 2 (data,big) = 6
    # data: w2 in 4 + w1 in 2 + w1 in 1 (data,small) + w2 in 1 = 8
    # small: w1 1 + w2 1 = 2
    assert got[("big", "data")][0] == 4
    assert got[("big", "data")][1] == round(math.log(4 * 8 / (6 * 8)), 4)
    assert got[("data", "big")][0] == 2
    assert got[("data", "big")][1] == round(math.log(2 * 8 / (8 * 6)), 4)


def test_bigram_nll_backoff_branches(spark):
    import math

    from vyntr_spark.operators.textstats import bigram_logprob

    train = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    # train pairs: (a,b)x2, (b,a), (b,c) -> N=4; c1: a=2,b=2; c2: b=2,a=1,c=1
    score = spark.createDataFrame(
        [(1, "a b"),      # seen bigram: p = 2/2 = 1 -> nll 0
         (2, "c a"),      # unseen bigram, a seen 2nd: p = .4*1/4
         (3, "z q"),      # both unseen: p = .4/4
         (4, "a")],       # < 2 tokens -> null
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_pairs"], r["nll"])
           for r in bigram_logprob(score, train=train).collect()}
    assert got[1] == (1, 0.0)
    assert got[2] == (1, round(
        math.floor(-math.log(0.4 * 1 / 4.0) * 1e6 + 0.5) / 1e6, 4))
    assert got[3] == (1, round(
        math.floor(-math.log(0.4 / 4.0) * 1e6 + 0.5) / 1e6, 4))
    assert got[4] == (0, None)


def test_chi2_terms_finds_group_marker(spark):
    from vyntr_spark.operators.textstats import chi2_terms

    # 'zebra' appears only in group g1; shared filler everywhere
    rows = ([(i, "g1", "zebra common words here") for i in range(10)]
            + [(100 + i, "g2", "common words here plain") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = chi2_terms(df, k=2).collect()
    top = {r["source"]: [x["term"] for x in got if x["source"] == r["source"]]
           for r in got}
    assert top["g1"][0] == "zebra"   # the exclusive marker dominates g1
    assert top["g2"][0] == "plain"   # and g2's exclusive term dominates g2


def test_char_entropy_exact_cases(spark):
    import math

    rows = [
        (1, "aaaa"),             # one symbol -> H = 0
        (2, "abab"),             # uniform over 2 -> H = ln 2
        (3, "a b! c? d."),       # uniform over 4 (punct/space excluded)
        (4, ""),                 # no alphanumerics
        (5, None),               # null text
        (6, "AaBb"),             # case-folded: uniform over 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy_micro"])
           for r in textstats.char_entropy(df).collect()}
    ln2_term = math.floor((0.5 * math.log(2)) * 1e6 + 0.5)  # per-symbol
    ln4_term = math.floor((0.25 * math.log(4)) * 1e6 + 0.5)
    assert got[1] == (4, 0)
    assert got[2] == (4, 2 * ln2_term)
    assert got[3] == (4, 4 * ln4_term)
    assert got[4] == (0, 0)
    assert got[5] == (0, 0)
    assert got[6] == (4, 2 * ln2_term)
    # gibberish (near-uniform) scores far above skewed prose-like text
    wide = spark.createDataFrame(
        [(10, "abcdefghijklmnopqrstuvwxyz0123456789"),
         (11, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab")],
        "doc_id long, text string")
    w = {r["doc_id"]: r["entropy_micro"]
         for r in textstats.char_entropy(wide).collect()}
    assert w[10] > 5 * w[11]


def test_lang_mix_detects_code_switching(spark):
    en = "the cat sat of the mat and it is a fine day for all of the team "
    es = "el perro es un animal que vive con la familia por una casa con "
    rows = [
        (1, en * 3),                  # monolingual: every window agrees
        (2, en * 2 + es * 2),         # code-switched halves
        (3, "tiny text"),             # single window, no stopword hits
        (4, ""),                      # empty
        (5, None),                    # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.lang_mix(df).collect()}
    assert got[1]["doc_lang"] == "en" and got[1]["mix_frac"] == 0.0
    assert not got[1]["is_mixed"]
    assert got[2]["is_mixed"] and got[2]["mix_frac"] > 0.0
    assert got[2]["n_agree"] < got[2]["n_windows"]
    assert got[3]["doc_lang"] == "und" and got[3]["n_windows"] == 1
    assert got[3]["n_agree"] == 1      # its one window is also 'und'
    for d in (4, 5):
        assert got[d]["n_windows"] == 0 and got[d]["n_agree"] == 0
        assert got[d]["mix_frac"] == 0.0 and not got[d]["is_mixed"]
    # window count replicates ceil(n_tokens / 20)
    import math
    n_tok = len((en * 3).split())
    assert got[1]["n_windows"] == math.ceil(n_tok / 20)


def test_char_entropy_invariances(spark):
    # entropy is a bag-of-chars statistic: permuting the text and
    # doubling it (same distribution) must not change entropy_micro;
    # the uniform alphabet is the maximum
    base = "the quick brown fox jumps over the lazy dog 0123456789"
    rows = [
        (1, base),
        (2, base[::-1]),            # permutation: same char bag
        (3, base + base),           # doubled: same distribution
        (4, "abcdefghijklmnopqrstuvwxyz0123456789"),  # uniform max
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.char_entropy(df).collect()}
    assert got[1]["entropy_micro"] == got[2]["entropy_micro"]
    assert got[1]["entropy_micro"] == got[3]["entropy_micro"]
    assert got[3]["n_chars"] == 2 * got[1]["n_chars"]
    for d in (1, 2, 3):
        assert got[d]["entropy_micro"] < got[4]["entropy_micro"]
    import math
    assert got[4]["entropy_micro"] == 36 * math.floor(
        (math.log(36) / 36) * 1e6 + 0.5)


def test_lang_mix_partitioning_invariant(spark):
    rows = [(i, ("the cat of the mat " if i % 2 else "el perro es la casa ")
             * (i % 7 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, textstats.lang_mix(df).collect()))
    b = sorted(map(tuple, textstats.lang_mix(df.repartition(7)).collect()))
    assert a == b


def test_widen_small_scan_is_identity_on_derived_frames(spark):
    from pyspark.sql import functions as F
    from vyntr_spark.operators.textstats import widen_small_scan

    docs = spark.createDataFrame(
        [(i, "t") for i in range(10)], "doc_id long, text string")
    # aggregate / join / generate lineage: returned untouched, no probe
    agg = docs.groupBy("doc_id").count()
    assert widen_small_scan(agg) is agg
    joined = docs.join(docs.select("doc_id"), "doc_id")
    assert widen_small_scan(joined) is joined
    exploded = docs.select(F.explode(F.split("text", "")).alias("c"))
    assert widen_small_scan(exploded) is exploded
    # one-partition scan-like frame: widened to defaultParallelism
    par = spark.sparkContext.defaultParallelism
    narrow = docs.coalesce(1)
    out = widen_small_scan(narrow)
    if out is not narrow:  # coalesce is Repartition-family in some plans
        assert out.rdd.getNumPartitions() == par


def test_dsir_partitioning_invariant_and_quota(spark):
    from vyntr_spark.operators import sampling

    rows = [(i, "tgt" if i < 5 else "raw",
             f"alpha beta gamma doc{i} common words here")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(map(tuple, sampling.dsir_select(
        df, target_source="tgt", n_buckets=64, quota=7).collect()))
    b = sorted(map(tuple, sampling.dsir_select(
        df.repartition(5), target_source="tgt", n_buckets=64,
        quota=7).collect()))
    assert a == b
    sel = [r for r in a if r[-1]]
    assert len(sel) == 7  # exact quota when enough raw candidates


def test_tokenizer_fertility_exact(spark):
    rows = [
        (1, "hello world abc123"),   # "abc123" -> 2 pieces: 4/3 words
        (2, "a.b,c!d 99x"),          # punct soup: 9 pieces / 5 words
        (3, "plain words here"),     # 1.0 fertility
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"], r["fertility_milli"])
           for r in textstats.tokenizer_fertility(df).collect()}
    assert got[1] == (3, 4, 1333)
    assert got[2] == (5, 9, 1800)
    assert got[3] == (3, 3, 1000)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)
    # noisy text must out-score clean prose
    assert got[2][2] > got[3][2]
