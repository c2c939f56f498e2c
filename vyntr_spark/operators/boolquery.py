"""Tantivy-QueryParser-shaped boolean/phrase queries over the
materialized index (P6 full semantics; reference
pulse/src/bin/server.rs:165-173 — Tantivy's QueryParser accepts quoted
phrases, parenthesized boolean groups, AND/OR/NOT and +/- prefixes).

Grammar (recursive descent):
    or_expr  := and_expr (OR and_expr)*
    and_expr := unary (AND unary)*
    unary    := NOT unary | '-' primary | '+' primary | primary
    primary  := '(' or_expr ')' | '"phrase words"' | field:value
              | field:[lo TO hi] | term | term* | te?m | term~N

Bare space-separated terms at the same level are OR-combined for
matching (Tantivy's default "should" clauses) while every positive term
still contributes to the BM25 score.

Evaluation is doc-set algebra on the index tables — per-term postings
lookups (partition-prunable when postings are bucketed by term),
semi/anti/union joins on doc ids, and positional adjacency via
``array_intersect`` on per-term position lists. Nothing scans the raw
corpus. Scoring reuses ``bm25_topk_from_index`` (corpus-level idf,
Tantivy boolean-filter semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .pulse import TOKEN_SPLIT, BM25Index, bm25_topk_from_index

# ---------------------------------------------------------------------------
# positional postings (P5 extension: Tantivy stores positions per posting)
# ---------------------------------------------------------------------------


def tokens_expr(text_col: str):
    """Order-preserving cleaned token array (split + drop empties), so a
    token's array index IS its position."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )


def postings_positions(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(term, id, tf, positions) — positions are 0-based indices into the
    cleaned token sequence, sorted ascending. One shuffle (groupBy term+id
    with map-side partial agg), same shape as plain postings plus the
    position list Tantivy keeps for phrase queries."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("pos", "term"),
    )
    return tok.groupBy("term", id_col).agg(
        F.count("*").alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Term:
    word: str
    boost: float = 1.0


@dataclass
class Phrase:
    words: list[str]
    slop: int = 0       # "a b"~N (Tantivy QueryParser slop suffix)
    boost: float = 1.0  # "a b"^2 / "a b"~2^1.5


@dataclass
class FuzzyTerm:
    word: str
    distance: int = 2   # 'term~' (Lucene-classic default 2) / 'term~1'
    boost: float = 1.0


@dataclass
class FieldFilter:
    name: str
    value: str
    boost: float = 1.0  # parsed for grammar completeness; filters
    #                     don't score, so the boost is inert like
    #                     Tantivy's boost on a pure filter occur


@dataclass
class RangeFilter:
    """``field:[lo TO hi]`` — Tantivy QueryParser's range syntax
    (square bracket = inclusive, curly = exclusive, ``*`` = unbounded;
    mixed bounds like ``[a TO b}`` allowed). Like FieldFilter it is a
    pure filter occur: it constrains the matched set and never scores."""

    name: str
    lo: str | None       # None = unbounded ('*')
    hi: str | None
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass
class WildcardTerm:
    """``foo*`` / ``f?o`` — Lucene-classic wildcard term. Tantivy's
    parser reserves the same syntax (its RegexQuery serves it); we
    expand against the term dictionary like FuzzyTerm, capped."""

    pattern: str
    boost: float = 1.0


@dataclass
class Not:
    child: object


@dataclass
class And:
    children: list


@dataclass
class Or:
    children: list


# the RANGE alternative must precede WORD: `field:[a TO b]` contains a
# space, which the bare-word class would split at. An optional trailing
# '^B' boost (valid Lucene range syntax) is swallowed with the token so
# it cannot leak into a spurious scoring term.
_TOKEN_RE = re.compile(
    r'"([^"]*)"|(\()|(\))'
    r'|([^\s()]+:[\[{][^\]}]*[\]}](?:\^\d+(?:\.\d+)?)?)'
    r'|([^\s()]+)'
)


def _lex(q: str) -> list[tuple[str, str]]:
    out = []
    for m in _TOKEN_RE.finditer(q):
        if m.group(1) is not None:
            out.append(("PHRASE", m.group(1)))
        elif m.group(2):
            out.append(("LPAREN", "("))
        elif m.group(3):
            out.append(("RPAREN", ")"))
        elif m.group(4):
            out.append(("RANGE", m.group(4)))
        else:
            out.append(("WORD", m.group(5)))
    return out


_RANGE_RE = re.compile(r"^([^:\s]+):([\[{])\s*(.*?)\s+TO\s+(.*?)\s*([\]}])$")


def _range_node(tok: str):
    """Parse `field:[lo TO hi]` (any bracket mix; `*` = unbounded;
    leading +/- occur prefixes on the field name; a trailing `^B`
    boost parses and is inert, like FieldFilter's — filters don't
    score). A bracketed token that is NOT a well-formed range (missing
    TO, stray brackets) degrades to the plain field-equality token the
    pre-range grammar produced — fail-CLOSED, never a dropped filter."""
    neg = tok.startswith("-")
    if tok[:1] in "+-":
        tok = tok[1:]
    bm = re.match(r"^(.*[\]}])\^\d+(?:\.\d+)?$", tok)
    if bm:
        tok = bm.group(1)
    m = _RANGE_RE.match(tok)
    if not m:
        node = _Parser._word_node(tok)  # FieldFilter('f', '[a]') shape
        if node is None:
            return None
        return Not(node) if neg else node
    name, lb, lo, hi, rb = m.groups()
    node = RangeFilter(
        name,
        None if lo in ("*", "") else lo,
        None if hi in ("*", "") else hi,
        lo_inc=(lb == "["),
        hi_inc=(rb == "]"),
    )
    return Not(node) if neg else node


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        return node

    def or_expr(self):
        children = [self.and_expr()]
        while True:
            kind, val = self.peek()
            if kind == "WORD" and val.upper() == "OR":
                self.take()
                children.append(self.and_expr())
            elif kind in ("WORD", "PHRASE", "LPAREN", "RANGE"):
                # bare adjacency = Tantivy "should" clauses (OR for match)
                children.append(self.and_expr())
            else:
                break
        children = [c for c in children if c is not None]
        if not children:
            return None
        return children[0] if len(children) == 1 else Or(children)

    def and_expr(self):
        children = [self.unary()]
        while True:
            kind, val = self.peek()
            if kind == "WORD" and val.upper() == "AND":
                self.take()
                children.append(self.unary())
            else:
                break
        children = [c for c in children if c is not None]
        if not children:
            return None
        return children[0] if len(children) == 1 else And(children)

    def unary(self):
        kind, val = self.peek()
        if kind == "WORD" and val.upper() == "NOT":
            self.take()
            child = self.unary()
            return Not(child) if child is not None else None
        if kind == "WORD" and val.startswith("-") and len(val) > 1:
            self.take()
            return Not(self._word_node(val[1:]))
        if kind == "WORD" and val.startswith("+") and len(val) > 1:
            self.take()
            return self._word_node(val[1:])
        return self.primary()

    def primary(self):
        kind, val = self.take()
        if kind == "RANGE":
            return _range_node(val)
        if kind == "LPAREN":
            node = self.or_expr()
            k, _ = self.peek()
            if k == "RPAREN":
                self.take()
            return node
        if kind == "PHRASE":
            words = [w for w in re.split(TOKEN_SPLIT, val.lower()) if w]
            if not words:
                # a suffix token after an empty phrase is still consumed
                self._phrase_suffix()
                return None
            slop, boost = self._phrase_suffix()
            if len(words) == 1:
                return Term(words[0], boost=boost)
            return Phrase(words, slop=slop, boost=boost)
        if kind == "WORD":
            return self._word_node(val)
        return None

    _SUFFIX_RE = re.compile(r"^(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$")

    def _phrase_suffix(self) -> tuple[int, float]:
        """Consume a '~N' / '^B' / '~N^B' WORD token right after a
        closing quote (the lexer splits on whitespace, so Tantivy's
        '"a b"~2^1.5' arrives as PHRASE then WORD '~2^1.5')."""
        kind, val = self.peek()
        if kind == "WORD" and val:
            m = self._SUFFIX_RE.match(val)
            if m and (m.group(1) or m.group(2)):
                self.take()
                return (int(m.group(1) or 0),
                        float(m.group(2) or 1.0))
        return 0, 1.0

    @staticmethod
    def _word_node(val: str):
        boost = 1.0
        m = re.match(r"^(.*?)\^(\d+(?:\.\d+)?)$", val)
        if m and m.group(1):
            val, boost = m.group(1), float(m.group(2))
        # fuzzy suffix on a bare term: 'term~' (distance 2, the
        # Lucene-classic default) / 'term~1' / 'term~2' — distances are
        # capped at 2 like Lucene/Tantivy's FuzzyTermQuery
        fuzzy = None
        fm = re.match(r"^(.+?)~([0-2]?)$", val)
        if fm and fm.group(1) and ":" not in fm.group(1):
            val = fm.group(1)
            fuzzy = int(fm.group(2)) if fm.group(2) else 2
        if ":" in val:
            name, v = val.split(":", 1)
            if name and v:
                return FieldFilter(name, v, boost=boost)
        if "*" in val or "?" in val:
            # wildcard term: keep only chars that can appear in a
            # dictionary term plus the two metachars
            pat = re.sub(r"[^a-z0-9*?]", "", val.lower())
            if pat.strip("*"):
                # any literal char OR at least one '?' — metachar-only
                # patterns like '???' are valid Lucene wildcards (match
                # any 3-char term) and the dictionary-expansion regex
                # path handles them ('?' -> '.')
                return WildcardTerm(pat, boost=boost)
            return None  # all-'*' — matches everything in Lucene only
            #              as field:*, not supported
        w = re.sub(TOKEN_SPLIT, "", val.lower())
        if not w:
            return None
        if fuzzy:
            return FuzzyTerm(w, distance=fuzzy, boost=boost)
        return Term(w, boost=boost)


def parse_boolean(q: str):
    """Parse a Tantivy-style query string into an AST (None = empty)."""
    return _Parser(_lex(q)).parse()


def has_phrase(node) -> bool:
    """True when the AST contains a multi-word Phrase — the only node
    that needs positional postings. Callers building an on-the-fly index
    can skip the posexplode position pass for everything else."""
    if isinstance(node, Phrase):
        return True
    if isinstance(node, Not):
        return has_phrase(node.child)
    if isinstance(node, (And, Or)):
        return any(has_phrase(c) for c in node.children)
    return False


# ---------------------------------------------------------------------------
# evaluation over the index
# ---------------------------------------------------------------------------


def _phrase_docs(index: BM25Index, words: list[str],
                 id_col: str, slop: int = 0) -> DataFrame:
    """Docs where the words occur at consecutive positions: shift each
    term's position list by its offset and intersect — a per-term
    (bucket-pruned) postings lookup + doc_id equi-joins, never a corpus
    scan.

    ``slop > 0`` ("a b"~N, server.rs:165-173 — Tantivy's QueryParser
    slop suffix) relaxes adjacency to IN-ORDER occurrence with total
    slack <= slop: exists p_0 < p_1 < ... < p_{k-1} with
    p_{k-1} - p_0 - (k-1) <= slop — Lucene/Tantivy's sloppy-phrase
    distance for in-order matches (out-of-order transposition matches,
    which Lucene admits at cost 2 per swap, are NOT matched; documented
    divergence). Evaluated as a per-doc chain fold over the position
    lists: the chain set stays bounded by tf(word_i), all inside one
    native higher-order expression per join step — no Python, no
    explode of the position lists."""
    if "positions" not in index.postings.columns:
        raise ValueError(
            "phrase query needs positional postings "
            "(build_index(..., with_positions=True))"
        )
    if slop > 0:
        cur = index.term_postings(words[0]).select(
            F.col(id_col),
            F.transform(
                "positions",
                lambda p: F.struct(p.alias("s"), p.alias("e")),
            ).alias("_chains"),
        )
        for i, w in enumerate(words[1:], start=1):
            nxt = index.term_postings(w).select(
                F.col(id_col), F.col("positions").alias("_pos")
            )
            step = (lambda off: (lambda q: F.filter(
                F.col("_chains"),
                lambda c: (c["e"] < q) & ((q - c["s"] - off) <= slop),
            )))(i)
            cur = (
                cur.join(nxt, id_col)
                .withColumn(
                    "_chains",
                    # array_distinct: two chains with the same start
                    # collapse once extended to the same q — without it
                    # the chain list can grow multiplicatively
                    F.array_distinct(F.flatten(F.transform(
                        "_pos",
                        lambda q: F.transform(
                            step(q),
                            lambda c: F.struct(
                                c["s"].alias("s"), q.alias("e")
                            ),
                        ),
                    ))),
                )
                .filter(F.size("_chains") > 0)
                .drop("_pos")
            )
        return cur.select(id_col)
    cur = index.term_postings(words[0]).select(
        F.col(id_col), F.col("positions").alias("_starts")
    )
    for i, w in enumerate(words[1:], start=1):
        # NB: any 2-parameter lambda (even with a default) is treated by
        # F.transform as the (element, index) form — build a unary
        # closure over the offset instead
        shift = (lambda o: (lambda x: x - o))(i)
        nxt = index.term_postings(w).select(
            F.col(id_col),
            F.transform("positions", shift).alias("_shift"),
        )
        cur = (
            cur.join(nxt, id_col)
            .withColumn("_starts", F.array_intersect("_starts", "_shift"))
            .filter(F.size("_starts") > 0)
            .drop("_shift")
        )
    return cur.select(id_col)


def _eval_docs(node, index: BM25Index, id_col: str) -> DataFrame:
    if isinstance(node, Term):
        return index.term_postings(node.word).select(id_col).distinct()
    if isinstance(node, Phrase):
        return _phrase_docs(index, node.words, id_col, slop=node.slop)
    if isinstance(node, FieldFilter):
        if index.docmeta is None or node.name not in index.docmeta.columns:
            return index.docstats.select(id_col)  # unknown field: no-op
        v = node.value
        col = F.col(node.name)
        cond = col == (v.lower() == "true") if v.lower() in ("true", "false") \
            else col == v
        return index.docmeta.filter(cond).select(id_col)
    if isinstance(node, RangeFilter):
        if index.docmeta is None or node.name not in index.docmeta.columns:
            # unknown/typo'd field: fail CLOSED (empty match) like the
            # non-numeric-bound case below — a range is an explicit
            # restriction, and matching ALL docs would silently drop it.
            # Tantivy errors on unknown fields; empty-match is the
            # non-crashing analog. NB: this intentionally diverges from
            # FieldFilter's unknown-field no-op (an equality tail is
            # routinely a literal 'word:like this' in user queries and
            # must degrade gracefully; bracketed range syntax is not).
            return index.docstats.limit(0).select(id_col)
        col = F.col(node.name)
        dt = dict(index.docmeta.dtypes)[node.name]
        numeric = dt in ("tinyint", "smallint", "int", "bigint", "float",
                         "double") or dt.startswith("decimal")
        if numeric:
            for v in (node.lo, node.hi):
                if v is not None:
                    try:
                        float(v)
                    except ValueError:
                        # non-numeric bound on a numeric field: the
                        # constraint is unsatisfiable — fail CLOSED
                        # (empty match), never crash and never silently
                        # drop the user's restriction
                        return index.docmeta.limit(0).select(id_col)

        def bound(v):
            return F.lit(float(v) if numeric else v)

        cond = F.lit(True)
        if node.lo is not None:
            cond = cond & (col >= bound(node.lo) if node.lo_inc
                           else col > bound(node.lo))
        if node.hi is not None:
            cond = cond & (col <= bound(node.hi) if node.hi_inc
                           else col < bound(node.hi))
        return index.docmeta.filter(cond).select(id_col)
    if isinstance(node, Not):
        return index.docstats.select(id_col).join(
            _eval_docs(node.child, index, id_col), id_col, "anti"
        )
    if isinstance(node, And):
        cur = _eval_docs(node.children[0], index, id_col)
        for c in node.children[1:]:
            cur = cur.join(_eval_docs(c, index, id_col), id_col, "semi")
        return cur
    if isinstance(node, Or):
        # Tantivy's flat BooleanQuery occurs: Not children are must_not
        # over the whole clause set, FieldFilter children are musts
        # (filters, matching the rest of the repo's field semantics),
        # everything else is a should (union)
        neg = [c for c in node.children if isinstance(c, Not)]
        fields = [c for c in node.children
                  if isinstance(c, (FieldFilter, RangeFilter))]
        pos = [
            c for c in node.children
            if not isinstance(c, (Not, FieldFilter, RangeFilter))
        ]
        if pos:
            cur = _eval_docs(pos[0], index, id_col)
            for c in pos[1:]:
                cur = cur.unionByName(_eval_docs(c, index, id_col))
            cur = cur.distinct()
        else:
            cur = index.docstats.select(id_col)
        for c in fields:
            cur = cur.join(_eval_docs(c, index, id_col), id_col, "semi")
        for c in neg:
            cur = cur.join(_eval_docs(c.child, index, id_col), id_col, "anti")
        return cur
    raise TypeError(f"unknown node {node!r}")


def _positive_terms(node, negated: bool = False) -> list[tuple[str, float]]:
    """Scoring terms with their clause boosts: every Term/Phrase word
    under an even number of NOTs (Tantivy scores the positive clauses
    of a boolean query; '^B' multiplies that clause's score,
    server.rs:165-173 QueryParser grammar)."""
    if node is None or isinstance(node, (FieldFilter, RangeFilter)):
        return []
    if isinstance(node, Term):
        return [] if negated else [(node.word, node.boost)]
    if isinstance(node, Phrase):
        return [] if negated else [(w, node.boost) for w in node.words]
    if isinstance(node, Not):
        return _positive_terms(node.child, not negated)
    out: list[tuple[str, float]] = []
    for c in node.children:
        out.extend(_positive_terms(c, negated))
    return out


def _fuzzy_expand(index: BM25Index, word: str, distance: int,
                  cap: int = 50) -> list[str]:
    """Vocabulary terms within ``distance`` edits of ``word``. Tantivy's
    FuzzyTermQuery walks the term dictionary with a Levenshtein
    automaton; the Spark shape filters the term DIMENSION (distinct
    postings terms — never the corpus) with the native levenshtein
    expression, a length-difference prefilter pruning most of the scan.
    Deterministic cap: closest-first, ties by term (Tantivy caps
    expansion at 50 terms too, via its automaton's term limit)."""
    lw = len(word)
    cand = (
        index.postings.select("term").distinct()
        .filter(F.length("term").between(lw - distance, lw + distance))
        .withColumn("_d", F.levenshtein(F.col("term"), F.lit(word)))
        .filter(F.col("_d") <= distance)
        .orderBy("_d", "term")
        .limit(cap)
        .collect()
    )
    return [r["term"] for r in cand]


def _wildcard_expand(index: BM25Index, pattern: str,
                     cap: int = 50) -> list[str]:
    """Dictionary terms matching a Lucene wildcard pattern (`*` = any
    run, `?` = one char). Same dimension-only shape as _fuzzy_expand: a
    literal-prefix ``startswith`` prefilter (sargable, prunes the term
    scan when the pattern doesn't lead with a metachar) then a native
    rlike. Deterministic cap: term-ascending, like Lucene's
    TermRangeQuery rewrite order."""
    regex = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    )
    prefix = re.match(r"^[a-z0-9]*", pattern).group(0)
    cand = index.postings.select("term").distinct()
    if prefix:
        cand = cand.filter(F.col("term").startswith(prefix))
    rows = (
        cand.filter(F.col("term").rlike(f"^{regex}$"))
        .orderBy("term")
        .limit(cap)
        .collect()
    )
    return [r["term"] for r in rows]


#: equality on this sentinel can never hit — TOKEN_SPLIT strips every
#: non-[a-z0-9] char, so no dictionary term contains a NUL
_NO_MATCH_TERM = "\x00"


def _rewrite_fuzzy(node, index: BM25Index):
    """Replace FuzzyTerm/WildcardTerm nodes with the OR of their
    vocabulary expansion (every variant scores at the clause's boost),
    so matching AND scoring downstream see plain Terms. A fuzzy word
    with an empty expansion degrades to its exact Term; an empty
    wildcard expansion matches nothing (like Lucene's rewrite to an
    empty BooleanQuery)."""
    if isinstance(node, FuzzyTerm):
        words = _fuzzy_expand(index, node.word, node.distance)
        if not words:
            return Term(node.word, boost=node.boost)
        if len(words) == 1:
            return Term(words[0], boost=node.boost)
        return Or([Term(w, boost=node.boost) for w in words])
    if isinstance(node, WildcardTerm):
        words = _wildcard_expand(index, node.pattern)
        if not words:
            return Term(_NO_MATCH_TERM, boost=node.boost)
        if len(words) == 1:
            return Term(words[0], boost=node.boost)
        return Or([Term(w, boost=node.boost) for w in words])
    if isinstance(node, Not):
        return Not(_rewrite_fuzzy(node.child, index))
    if isinstance(node, (And, Or)):
        return type(node)([_rewrite_fuzzy(c, index) for c in node.children])
    return node


def search_boolean(index: BM25Index, query: str, k: int = 10,
                   id_col: str = "doc_id") -> DataFrame:
    """Full P6 query semantics served from the index: boolean/phrase/
    field matching as doc-set algebra, BM25 scoring of the positive
    terms restricted to the matched set (corpus-level idf). Fuzzy terms
    ('word~N') expand against the term dictionary first."""
    node = parse_boolean(query)
    node = _rewrite_fuzzy(node, index)
    if node is None:
        return (
            index.docstats.select(id_col).limit(0)
            .withColumn("score", F.lit(0.0))
        )
    matched = _eval_docs(node, index, id_col)
    # dedup terms keeping first occurrence's boost (a term repeated
    # under different boosts scores once, at its first clause's weight)
    weights: dict[str, float] = {}
    for w, b in _positive_terms(node):
        weights.setdefault(w, b)
    if not weights:
        return matched.limit(k).withColumn("score", F.lit(0.0))
    return bm25_topk_from_index(
        index.postings, index.docstats, index.stats, list(weights),
        k=k, id_col=id_col, restrict=matched, weights=weights,
    )
