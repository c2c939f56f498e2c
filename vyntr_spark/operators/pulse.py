"""Full-text indexing + BM25 search operators (SURVEY.md §2.4, reference
pulse/). The Tantivy inverted index is re-expressed as derived DataFrames
(postings / docstats / corpus stats) — all hash aggregations with map-side
partial combine; "commit every 1000 docs" becomes a snapshot commit.

BM25 uses Tantivy's defaults k1=1.2, b=0.75 and Lucene/Tantivy idf
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (pulse/src/bin/search.rs:14,
server.rs:75-77 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K1 = 1.2
B = 0.75

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).filter(F.col("term") != "")


def postings(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """P5: (term, doc, tf) — one shuffle, partial agg map-side."""
    return (
        tokens(df, text_col, id_col)
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def docstats(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """P5: per-doc token length dl."""
    return (
        tokens(df, text_col, id_col)
        .groupBy(id_col)
        .agg(F.count("*").alias("dl"))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """P8: BM25 top-K for a parsed term list (TopDocs::with_limit(10),
    pulse/src/bin/server.rs:14). Score rounded to 4dp for cross-engine
    comparison; ties broken by id.

    Plan shape: postings filtered to the query terms FIRST (predicate
    pushdown into the postings agg), then joined to docstats and the
    broadcast per-term df counts — no full-corpus scoring.
    """
    spark = df.sparkSession
    post = postings(df, text_col, id_col)
    ds = docstats(df, text_col, id_col)
    n_docs = df.count()
    avgdl_row = ds.agg(F.avg("dl").alias("avgdl")).collect()[0]
    avgdl = float(avgdl_row["avgdl"] or 0.0)

    qterms = spark.createDataFrame([(t,) for t in query_terms], "term string")
    qpost = post.join(F.broadcast(qterms), "term")
    dfreq = qpost.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        qpost.join(F.broadcast(dfreq), "term")
        .join(ds, id_col)
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return scored


def preview(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P2 (pulse/src/main.rs:24-33): trim; ≤500 chars kept, else first 500
    chars + '...'. Char (not byte) semantics."""
    t = F.trim(F.col(text_col))
    return df.withColumn(
        "preview",
        F.when(F.length(t) <= 500, t).otherwise(
            F.concat(F.substring(t, 1, 500), F.lit("..."))
        ),
    )


def lang_default(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    """P3 (main.rs:109): null/empty language -> 'en'."""
    return df.withColumn(
        "language", F.coalesce(F.nullif(F.col(lang_col), F.lit("")), F.lit("en"))
    )


def nsfw_flag(df: DataFrame, nsfw_set: list[str],
              source_col: str = "source") -> DataFrame:
    """P4 (main.rs:219-246): membership of the lowercased domain-ish field
    in a broadcast blocklist."""
    return df.withColumn(
        "nsfw", F.lower(F.col(source_col)).isin([s.lower() for s in nsfw_set])
    )


def meta_agg(events: DataFrame) -> DataFrame:
    """P11 (pulse/migrations/add_indexes.sql:7-16): string_agg of
    'name: content' per key. Deterministic order via sort-by-id inside the
    collected array (collect_list alone is order-nondeterministic)."""
    return (
        events.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("event_id"),
                                F.format_string(
                                    "%s: %.2f", F.col("event_type"),
                                    F.col("value")
                                ).alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                " ",
            ).alias("meta_text")
        )
    )


# ---------------------------------------------------------------------------
# Query parsing + search composition (P6/P7/P9)
# ---------------------------------------------------------------------------

from dataclasses import dataclass, field as _field  # noqa: E402


@dataclass
class ParsedQuery:
    """Mini query AST: Tantivy QueryParser subset (P6,
    pulse/src/bin/server.rs:165-173): bare terms (OR semantics like the
    default parser), field:value filters, +term (AND/must), -term /
    NOT term (must-not)."""

    terms: list[str] = _field(default_factory=list)       # should (OR)
    must: list[str] = _field(default_factory=list)        # +term / AND
    must_not: list[str] = _field(default_factory=list)    # -term / NOT
    fields: dict[str, str] = _field(default_factory=dict)  # field:value


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    toks = q.split()
    negate_next = False
    must_next = False
    for t in toks:
        up = t.upper()
        if up == "NOT":
            negate_next = True
            continue
        if up == "AND":
            must_next = True
            continue
        if up == "OR":
            continue
        neg = negate_next or t.startswith("-")
        must = must_next or t.startswith("+")
        word = t.lstrip("+-")
        negate_next = must_next = False
        if not word:
            continue
        if ":" in word:
            f, v = word.split(":", 1)
            if neg and v.lower() in ("true", "false"):
                # "NOT nsfw:true" — flip the boolean filter
                out.fields[f] = "false" if v.lower() == "true" else "true"
            else:
                out.fields[f] = v
            continue
        w = word.lower()
        if neg:
            out.must_not.append(w)
        elif must:
            out.must.append(w)
        else:
            out.terms.append(w)
    return out


def search(df: DataFrame, query: str, k: int = 10,
           text_col: str = "text", id_col: str = "doc_id",
           lang: str | None = None) -> DataFrame:
    """P6-P9 composed: parse → field/language filters (P7: server appends
    'AND language:{lang}', pulse/src/bin/server.rs:66-68) → BM25 over the
    scoring terms → top-K projection."""
    pq = parse_query(query)
    if lang is not None:
        pq.fields["language"] = lang
    base = df
    for f_name, v in pq.fields.items():
        if f_name in base.columns:
            if v.lower() in ("true", "false"):
                base = base.filter(F.col(f_name) == (v.lower() == "true"))
            else:
                base = base.filter(F.col(f_name) == v)
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), "")
    for w in pq.must_not:
        base = base.filter(~F.array_contains(toks, w))
    for w in pq.must:
        base = base.filter(F.array_contains(toks, w))
    score_terms = pq.terms + pq.must
    if not score_terms:
        return base.select(id_col).limit(k).withColumn("score", F.lit(0.0))
    return bm25_topk(base, score_terms, k=k, text_col=text_col, id_col=id_col)
