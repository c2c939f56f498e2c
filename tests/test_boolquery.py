"""P6 full query semantics: quoted phrases (positional adjacency),
parenthesized boolean groups, NOT/AND/OR — served from the positional
index, cross-checked against a naive Python evaluator."""

import re

import pytest
from pyspark.sql import functions as F

from vyntr_spark.operators import boolquery, pulse

DOCS = [
    (0, "the quick brown fox jumps", "en"),
    (1, "quick brown dog naps", "en"),
    (2, "brown quick reversed order", "en"),
    (3, "a fox and a dog", "de"),
    (4, "quick-brown hyphen splits to adjacency", "en"),
    (5, "quick x brown gap", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, language string")


@pytest.fixture(scope="module")
def index(docs):
    return pulse.build_index(
        docs, meta_cols=("language",), with_positions=True
    )


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def _naive_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _naive_phrase(words):
    out = set()
    for doc_id, text, _ in DOCS:
        toks = _naive_tokens(text)
        for i in range(len(toks) - len(words) + 1):
            if toks[i:i + len(words)] == words:
                out.add(doc_id)
                break
    return out


def test_positions_are_cleaned_sequence_indices(index):
    rows = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in index.postings.collect()
    }
    assert rows[("quick", 0)] == [1]      # after "the"
    assert rows[("brown", 2)] == [0]
    assert rows[("quick", 4)] == [0]      # hyphen splits into two tokens


def test_phrase_adjacency(index):
    got = _ids(boolquery.search_boolean(index, '"quick brown"', k=10))
    assert got == _naive_phrase(["quick", "brown"])
    assert got == {0, 1, 4}  # not 2 (reversed), not 5 (gap)


def test_three_word_phrase(index):
    got = _ids(boolquery.search_boolean(index, '"quick brown fox"', k=10))
    assert got == {0}


def test_grouped_boolean(index):
    got = _ids(boolquery.search_boolean(index, "(fox OR dog) AND quick", k=10))
    assert got == {0, 1}


def test_not_and_field(index):
    got = _ids(boolquery.search_boolean(index, "fox NOT dog", k=10))
    # bare adjacency is OR for matching; NOT dog excludes dog docs
    assert got == {0}
    got = _ids(
        boolquery.search_boolean(index, "(fox OR dog) AND language:de", k=10)
    )
    assert got == {3}


def test_phrase_scores_match_term_bm25_on_matched_docs(index):
    """Scoring = BM25 of the positive terms restricted to matched docs,
    corpus-level idf — so a phrase hit scores exactly like the same doc
    under the plain two-term query."""
    phrase = {
        r["doc_id"]: r["score"]
        for r in boolquery.search_boolean(index, '"quick brown"', k=10).collect()
    }
    plain = {
        r["doc_id"]: r["score"]
        for r in pulse.bm25_topk_from_index(
            index.postings, index.docstats, index.stats,
            ["quick", "brown"], k=10
        ).collect()
    }
    for doc_id, score in phrase.items():
        assert score == plain[doc_id]


def test_adhoc_search_delegates_phrases(docs, index):
    """pulse.search() routes quoted/parenthesized queries through the
    boolean evaluator — same hits as the direct index path."""
    via_search = pulse.search(docs, '"quick brown"', k=10).collect()
    direct = boolquery.search_boolean(index, '"quick brown"', k=10).collect()
    assert {r["doc_id"] for r in via_search} == {r["doc_id"] for r in direct}
    grouped = pulse.search(docs, "(fox OR dog) AND quick", k=10).collect()
    assert {r["doc_id"] for r in grouped} == {0, 1}


def _naive_eval(node):
    """Pure-Python mirror of boolquery._eval_docs over DOCS (same
    Tantivy occurs semantics: Or = union of shoulds ∩ field musts −
    must_nots)."""
    all_ids = {d for d, _, _ in DOCS}
    if isinstance(node, boolquery.Term):
        return {d for d, t, _ in DOCS if node.word in _naive_tokens(t)}
    if isinstance(node, boolquery.Phrase):
        return _naive_phrase(node.words)
    if isinstance(node, boolquery.FieldFilter):
        if node.name != "language":
            return all_ids
        return {d for d, _, lang in DOCS if lang == node.value}
    if isinstance(node, boolquery.Not):
        return all_ids - _naive_eval(node.child)
    if isinstance(node, boolquery.And):
        out = all_ids
        for c in node.children:
            out &= _naive_eval(c)
        return out
    if isinstance(node, boolquery.Or):
        neg = [c for c in node.children if isinstance(c, boolquery.Not)]
        fields = [c for c in node.children
                  if isinstance(c, boolquery.FieldFilter)]
        pos = [c for c in node.children
               if not isinstance(c, (boolquery.Not, boolquery.FieldFilter))]
        out = set()
        for c in pos:
            out |= _naive_eval(c)
        if not pos:
            out = set(all_ids)
        for c in fields:
            out &= _naive_eval(c)
        for c in neg:
            out -= _naive_eval(c.child)
        return out
    raise TypeError(node)


TRICKY = [
    "quick brown",                    # bare shoulds = union
    '"brown fox" OR dog',
    "NOT (fox OR dog)",
    "((quick))",
    "-quick fox",                     # must_not over the clause set
    "+fox -dog",
    'language:en "quick brown"',      # field must + phrase should
    '"fox" AND "dog"',                # 1-word phrases degrade to terms
    "(quick AND brown) OR (fox AND dog)",
    "language:de OR language:en NOT brown",
]


@pytest.mark.parametrize("q", TRICKY)
def test_boolean_eval_matches_naive(index, q):
    node = boolquery.parse_boolean(q)
    got = _ids(boolquery.search_boolean(index, q, k=100))
    assert got == _naive_eval(node), q


def test_parse_fuzz_never_crashes():
    from hypothesis import given, settings, strategies as st

    piece = st.one_of(
        st.sampled_from(['"', "(", ")", "AND", "OR", "NOT", "-", "+", ":",
                         "fox", "dog", "quick", "language:en", " "]),
        st.text(max_size=6),
    )
    @given(st.lists(piece, max_size=12).map(" ".join))
    @settings(max_examples=300, deadline=None)
    def check(q):
        boolquery.parse_boolean(q)  # must never raise

    check()


def test_parser_shapes():
    n = boolquery.parse_boolean('(a OR b) AND c')
    assert isinstance(n, boolquery.And)
    assert isinstance(n.children[0], boolquery.Or)
    n = boolquery.parse_boolean('"one two" -bad field:val')
    assert isinstance(n, boolquery.Or)
    kinds = [type(c).__name__ for c in n.children]
    assert kinds == ["Phrase", "Not", "FieldFilter"]
    assert boolquery.parse_boolean("") is None
    assert boolquery.parse_boolean('""') is None


def test_has_phrase_gates_positional_index():
    """search() builds positional postings only for ASTs that actually
    contain a multi-word Phrase — parens, single-word quotes, NOT/field
    shapes must not trigger the corpus-wide posexplode pass."""
    needs = ['"exact phrase" AND x', 'NOT "two words"', '("a b" OR c)']
    skips = ['"single"', '(a OR b) AND c', 'plain terms',
             'field:value -x', '', '""']
    for q in needs:
        assert boolquery.has_phrase(boolquery.parse_boolean(q)), q
    for q in skips:
        assert not boolquery.has_phrase(boolquery.parse_boolean(q)), q


# ---------------------------------------------------------------------------
# p6c: phrase slop + clause boosts (server.rs:165-173 QueryParser tail)
# ---------------------------------------------------------------------------


def _naive_slop(words, slop):
    """In-order sloppy phrase: exists increasing positions with total
    slack (span - (k-1)) <= slop."""
    out = set()
    for doc_id, text, _ in DOCS:
        toks = _naive_tokens(text)
        pos = {w: [i for i, t in enumerate(toks) if t == w] for w in words}
        if any(not pos[w] for w in words):
            continue

        def ok(idx, prev, start):
            if idx == len(words):
                return True
            return any(
                p > prev and p - start - idx <= slop and ok(idx + 1, p, start)
                for p in pos[words[idx]]
            )

        if any(ok(1, p0, p0) for p0 in pos[words[0]]):
            out.add(doc_id)
    return out


def test_parse_slop_and_boost():
    n = boolquery.parse_boolean('"quick brown"~2')
    assert isinstance(n, boolquery.Phrase) and n.slop == 2 and n.boost == 1.0
    n = boolquery.parse_boolean('"quick brown"^1.5')
    assert isinstance(n, boolquery.Phrase) and n.slop == 0 and n.boost == 1.5
    n = boolquery.parse_boolean('"quick brown"~3^2')
    assert n.slop == 3 and n.boost == 2.0
    n = boolquery.parse_boolean("fox^2")
    assert isinstance(n, boolquery.Term) and n.boost == 2.0
    n = boolquery.parse_boolean("language:en^3")
    assert isinstance(n, boolquery.FieldFilter) and n.boost == 3.0
    # suffix must NOT swallow an ordinary following term
    n = boolquery.parse_boolean('"quick brown"~1 fox')
    assert isinstance(n, boolquery.Or)
    assert isinstance(n.children[0], boolquery.Phrase)
    assert n.children[0].slop == 1
    assert isinstance(n.children[1], boolquery.Term)


def test_phrase_slop_matching(index):
    # slop 0: adjacency only; slop 1 admits one gap ("quick x brown");
    # slop never admits reversed order (doc 2)
    for slop in (0, 1, 2):
        got = _ids(boolquery.search_boolean(
            index, f'"quick brown"~{slop}', k=10))
        assert got == _naive_slop(["quick", "brown"], slop), f"slop={slop}"
    assert 5 in _ids(boolquery.search_boolean(index, '"quick brown"~1', k=10))
    assert 2 not in _ids(boolquery.search_boolean(index, '"quick brown"~9', k=10))


def test_phrase_slop_three_words(spark):
    rows = [
        (0, "alpha beta gamma"),             # slack 0
        (1, "alpha x beta gamma"),           # slack 1
        (2, "alpha x beta y gamma"),         # slack 2
        (3, "alpha beta x y z gamma"),       # slack 3
        (4, "gamma beta alpha"),             # out of order
        (5, "alpha beta"),                   # missing word
        (6, "alpha alpha x x beta gamma"),   # best chain uses 2nd alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = pulse.build_index(df, with_positions=True)
    global DOCS
    saved = DOCS
    DOCS = [(i, t, "en") for i, t in rows]  # reuse the naive evaluator
    try:
        for slop in (0, 1, 2, 3):
            got = _ids(boolquery.search_boolean(
                idx, f'"alpha beta gamma"~{slop}', k=10))
            want = _naive_slop(["alpha", "beta", "gamma"], slop)
            assert got == want, f"slop={slop}: {got} != {want}"
    finally:
        DOCS = saved


def test_boost_scales_term_contribution(index):
    base = {r["doc_id"]: r["score"]
            for r in boolquery.search_boolean(index, "fox dog", k=10).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in boolquery.search_boolean(index, "fox^2 dog", k=10).collect()}
    assert set(base) == set(boosted)
    # doc 3 has both fox and dog; doc 0 only fox; doc 1 only dog.
    # Boosting fox must raise fox-docs proportionally and leave
    # dog-only docs untouched.
    assert boosted[1] == base[1]
    assert boosted[0] == pytest.approx(2 * base[0], abs=2e-4)
    assert boosted[3] > base[3]
    # boost 1.0 must be bit-identical to no boost
    same = {r["doc_id"]: r["score"]
            for r in boolquery.search_boolean(index, "fox^1 dog", k=10).collect()}
    assert same == base


def test_fuzzy_parse_forms():
    from vyntr_spark.operators.boolquery import (
        FuzzyTerm, Term, parse_boolean,
    )

    n = parse_boolean("spark~1")
    assert isinstance(n, FuzzyTerm) and (n.word, n.distance) == ("spark", 1)
    n = parse_boolean("spark~")
    assert isinstance(n, FuzzyTerm) and n.distance == 2
    # ~0 is exact -> plain Term; boost composes after the fuzzy suffix
    assert isinstance(parse_boolean("spark~0"), Term)
    n = parse_boolean("spark~1^2")
    assert isinstance(n, FuzzyTerm) and n.boost == 2.0 and n.distance == 1
    # field filters never go fuzzy (the suffix stays in the value)
    from vyntr_spark.operators.boolquery import FieldFilter

    assert isinstance(parse_boolean("lang:en~1"), FieldFilter)


def test_fuzzy_search_matches_typo(spark):
    """'grphics~1' must match docs containing 'graphics' via dictionary
    expansion, rank exact-vocabulary neighbours too, and an
    out-of-vocabulary word with no neighbours matches nothing."""
    from vyntr_spark.operators import pulse
    from vyntr_spark.operators.boolquery import search_boolean

    docs = spark.createDataFrame(
        [(0, "graphics card review"), (1, "graphic novels are books"),
         (2, "totally unrelated text"), (3, "graphics graphics graphics")],
        "doc_id long, text string",
    )
    idx = pulse.build_index(docs)
    got = {r["doc_id"] for r in search_boolean(idx, "grphics~1", k=10).collect()}
    assert 0 in got and 3 in got
    assert 2 not in got
    # distance 2 additionally reaches 'graphic'
    got2 = {r["doc_id"] for r in search_boolean(idx, "grphics~2", k=10).collect()}
    assert 1 in got2 and got <= got2
    assert search_boolean(idx, "zzzzqqqq~1", k=10).count() == 0


def test_range_parse_forms():
    from vyntr_spark.operators.boolquery import (
        Not, RangeFilter, parse_boolean,
    )

    n = parse_boolean("n:[10 TO 20]")
    assert isinstance(n, RangeFilter)
    assert (n.lo, n.hi, n.lo_inc, n.hi_inc) == ("10", "20", True, True)
    n = parse_boolean("n:{a TO b}")
    assert (n.lo_inc, n.hi_inc) == (False, False)
    # mixed brackets, unbounded endpoints, negated occur prefix
    n = parse_boolean("n:{10 TO *]")
    assert n.lo == "10" and n.hi is None and not n.lo_inc
    n = parse_boolean("-n:[* TO 5}")
    assert isinstance(n, Not) and isinstance(n.child, RangeFilter)
    assert n.child.lo is None and n.child.hi == "5" and not n.child.hi_inc


def test_range_filter_numeric_and_string(spark):
    """Numeric columns compare numerically (so '9' < '10'), string
    columns lexicographically; exclusive bounds exclude the endpoint;
    an unknown field fails CLOSED (empty match — a range is an explicit
    restriction; intentional divergence from FieldFilter's no-op)."""
    from vyntr_spark.operators import pulse
    from vyntr_spark.operators.boolquery import search_boolean

    docs = spark.createDataFrame(
        [(0, "word", "de", 9), (1, "word", "en", 10),
         (2, "word", "fr", 100), (3, "word", "zh", 450)],
        "doc_id long, text string, lang string, size long",
    )
    idx = pulse.build_index(docs, meta_cols=("lang", "size"))
    got = {r["doc_id"]
           for r in search_boolean(idx, "word size:[9 TO 100]", k=10).collect()}
    assert got == {0, 1, 2}  # numeric: 9 <= x <= 100 (NOT lexicographic)
    got = {r["doc_id"]
           for r in search_boolean(idx, "word size:{9 TO 100}", k=10).collect()}
    assert got == {1}  # exclusive both ends
    got = {r["doc_id"]
           for r in search_boolean(idx, "word lang:[de TO fr]", k=10).collect()}
    assert got == {0, 1, 2}  # string compare: de <= lang <= fr
    got = {r["doc_id"]
           for r in search_boolean(idx, "word size:[100 TO *]", k=10).collect()}
    assert got == {2, 3}
    assert search_boolean(idx, "word nosuch:[1 TO 2]", k=10).count() == 0


def test_wildcard_parse_and_search(spark):
    from vyntr_spark.operators import pulse
    from vyntr_spark.operators.boolquery import (
        WildcardTerm, parse_boolean, search_boolean,
    )

    n = parse_boolean("spar*")
    assert isinstance(n, WildcardTerm) and n.pattern == "spar*"
    n = parse_boolean("f?o^2")
    assert isinstance(n, WildcardTerm) and n.boost == 2.0
    assert parse_boolean("*") is None  # all-'*' match-all unsupported
    assert parse_boolean("***") is None
    # metachar-only '?' runs ARE valid Lucene wildcards (any-N-char
    # term) and route through the dictionary expansion
    n = parse_boolean("???")
    assert isinstance(n, WildcardTerm) and n.pattern == "???"

    docs = spark.createDataFrame(
        [(0, "sparks fly upward"), (1, "spartan training"),
         (2, "spare parts bin"), (3, "irrelevant words")],
        "doc_id long, text string",
    )
    idx = pulse.build_index(docs)
    got = {r["doc_id"] for r in search_boolean(idx, "spar*", k=10).collect()}
    assert got == {0, 1, 2}
    # '?' is exactly one char: 'part?' hits 'parts' only, not 'part'
    got = {r["doc_id"] for r in search_boolean(idx, "part?", k=10).collect()}
    assert got == {2}
    # no dictionary match -> matches nothing (empty BooleanQuery rewrite)
    assert search_boolean(idx, "zzz*", k=10).count() == 0
    # wildcard mid-word
    got = {r["doc_id"] for r in search_boolean(idx, "sp*n", k=10).collect()}
    assert got == {1}  # spartan
    # '???' matches every 3-char dictionary term ('fly', 'bin')
    got = {r["doc_id"] for r in search_boolean(idx, "???", k=10).collect()}
    assert got == {0, 2}


def test_range_malformed_and_boost_edges(spark):
    """Review regressions: (1) a bracketed token that is not a
    well-formed range degrades to the field-equality filter the
    pre-range grammar produced (fail-closed), (2) a '^B' boost suffix
    on a range parses inert instead of leaking a spurious scoring
    term, (3) a non-numeric bound on a numeric field matches nothing
    instead of crashing."""
    from vyntr_spark.operators import pulse
    from vyntr_spark.operators.boolquery import (
        FieldFilter, Not, Or, RangeFilter, Term, parse_boolean,
        search_boolean,
    )

    # (1) malformed brackets -> FieldFilter, negation preserved
    n = parse_boolean("f:[a]")
    assert isinstance(n, FieldFilter) and (n.name, n.value) == ("f", "[a]")
    n = parse_boolean("price:[10 20]")  # forgot TO: still one token
    assert isinstance(n, FieldFilter) and n.value == "[10 20]"
    n = parse_boolean("-f:[a]")
    assert isinstance(n, Not) and isinstance(n.child, FieldFilter)

    # (2) boost suffix swallowed with the range token, inert
    n = parse_boolean("n:[10 TO 20]^2")
    assert isinstance(n, RangeFilter) and (n.lo, n.hi) == ("10", "20")
    n = parse_boolean("word n:[10 TO 20]^1.5")
    assert isinstance(n, Or) and not any(
        isinstance(c, Term) and c.word in ("2", "1", "5") for c in n.children
    )

    docs = spark.createDataFrame(
        [(0, "word alpha", "en", 10), (1, "word beta", "fr", 100)],
        "doc_id long, text string, lang string, size long",
    )
    idx = pulse.build_index(docs, meta_cols=("lang", "size"))
    # (3) non-numeric bound on numeric column: empty, no crash
    assert search_boolean(idx, "word size:[low TO high]", k=10).count() == 0
    assert search_boolean(idx, "word size:[10 TO high]", k=10).count() == 0
    # well-formed boost-suffixed range still filters and scores sanely
    got = {r["doc_id"]
           for r in search_boolean(idx, "word size:[9 TO 50]^2", k=10).collect()}
    assert got == {0}
    # malformed-bracket filter on an EXISTING field fails closed
    assert search_boolean(idx, "word lang:[en]", k=10).count() == 0


def test_wildcard_expand_matches_fnmatch_reference(spark):
    """Differential check of the wildcard->regex translation
    (_wildcard_expand) against Python's fnmatch semantics over a
    generated pattern zoo — including the r5 metachar-only '?' runs,
    leading '*', interior runs, and mixed literals. The dictionary is
    fixed; for every pattern the expansion must equal the fnmatch
    filter of the dictionary (both: '*' = any run, '?' = exactly one
    char, case-folded terms)."""
    import fnmatch

    from vyntr_spark.operators import pulse
    from vyntr_spark.operators.boolquery import _wildcard_expand

    words = ["a", "ab", "abc", "abcd", "axc", "bbc", "cab", "cat",
             "cart", "car", "dog", "do", "spark", "spork", "spars",
             "s", "sp", "zzz", "a1b", "x9", "42", "part", "parts"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    idx = pulse.build_index(docs)
    patterns = ["?", "??", "???", "*a", "a*", "*a*", "?a?", "a?c",
                "*?", "?*", "s*k", "sp?r?", "*ar*", "c?t", "*9",
                "4?", "??????", "*zz", "z*z", "a*?c", "p?rt*"]
    for pat in patterns:
        got = set(_wildcard_expand(idx, pat))
        want = {w for w in words if fnmatch.fnmatchcase(w, pat)}
        assert got == want, (pat, got, want)
