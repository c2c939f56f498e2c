"""Full-text indexing + BM25 search operators (SURVEY.md §2.4, reference
pulse/). The Tantivy inverted index is re-expressed as derived DataFrames
(postings / docstats / corpus stats) — all hash aggregations with map-side
partial combine; "commit every 1000 docs" becomes a snapshot commit.

BM25 uses Tantivy's defaults k1=1.2, b=0.75 and Lucene/Tantivy idf
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (pulse/src/bin/search.rs:14,
server.rs:75-77 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


def corpus_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """P5: 1-row (n_docs, avgdl) table, materialized at index-build time
    (pulse's per-commit segment metadata) so the query path never scans
    the corpus. avgdl averages over docs with >=1 token, matching
    ``docstats`` (which has no row for an empty doc)."""
    tok = F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), "")
    return df.select(F.size(tok).alias("dl")).agg(
        F.count("*").alias("n_docs"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
    )


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`term_bucket_expr` (md5 digest bytes
    0..3 big-endian mod K) — lets the query path compute which hive
    partitions its terms live in without a Spark job."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(term.encode()).digest()[:4], "big"
    ) % n_buckets


def term_bucket_expr(col, n_buckets: int):
    """Deterministic term -> bucket as a native expr (first 8 md5 hex
    chars = digest bytes 0..3 big-endian). Used as the hive partition
    column of a materialized postings table — the parquet stand-in for
    an Iceberg ``bucket(K, term)`` partition transform."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def prune_terms(post: DataFrame, query_terms: list[str],
                n_buckets: int | None) -> DataFrame:
    """Restrict a postings frame to the hive partitions holding
    ``query_terms``. On a bucket-partitioned postings table the
    ``bucket IN (...)`` predicate is a PartitionFilter — the scan
    touches only those directories (O(matched buckets), not O(index)).
    No-op for unbucketed postings (n_buckets falsy / no bucket col)."""
    if not n_buckets or "bucket" not in post.columns:
        return post
    buckets = sorted({term_bucket(t, n_buckets) for t in query_terms})
    return post.filter(F.col("bucket").isin(buckets))


def bm25_topk_from_index(post: DataFrame, ds: DataFrame, stats: DataFrame,
                         query_terms: list[str], k: int = 10,
                         id_col: str = "doc_id",
                         restrict: DataFrame | None = None,
                         weights: dict[str, float] | None = None
                         ) -> DataFrame:
    """P8 serving path: BM25 top-K straight from the materialized index
    tables (postings/docstats/corpus-stats) — the query never touches the
    raw corpus, so per-query cost is O(df(term)) not O(corpus). This is
    pulse's server shape (pulse/src/bin/server.rs:75-77: Tantivy searches
    committed segments, not raw documents).

    ``restrict`` (optional, ids to keep) is applied to the scored
    candidates only; idf stays corpus-level like Tantivy's boolean
    filter clauses. ``weights`` (optional term -> boost) multiplies a
    term's BM25 contribution — QueryParser's '^B' clause boosts
    (server.rs:165-173); omitted terms weigh 1.0, and an all-1.0 map is
    bit-identical to no map. Score rounded to 4dp; ties broken by id.
    """
    spark = post.sparkSession
    row = stats.collect()[0]  # 1-row stats table — the only driver fetch
    n_docs = float(row["n_docs"])
    avgdl = float(row["avgdl"] or 0.0)
    # bucket-partitioned index (materialize_index): prune the postings
    # scan to the query terms' hive partitions before the term join
    n_buckets = row["n_buckets"] if "n_buckets" in stats.columns else None
    post = prune_terms(post, query_terms, n_buckets)

    qterms = spark.createDataFrame(
        [(t, float((weights or {}).get(t, 1.0))) for t in query_terms],
        "term string, _boost double",
    )
    qpost = post.join(F.broadcast(qterms), "term")
    dfreq = qpost.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    cand = qpost if restrict is None else qpost.join(
        restrict.select(id_col), id_col, "semi"
    )
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        cand.join(F.broadcast(dfreq), "term")
        .join(ds, id_col)
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl)))
            * F.col("_boost"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """P8 ad-hoc form: derive the index tables inline and delegate to
    ``bm25_topk_from_index`` — ONE scoring implementation, so the ad-hoc
    and index-served paths are byte-identical by construction.

    Plan shape: postings filtered to the query terms FIRST (predicate
    pushdown into the postings agg), then joined to docstats and the
    broadcast per-term df counts — no full-corpus scoring.
    """
    return bm25_topk_from_index(
        postings(df, text_col, id_col),
        docstats(df, text_col, id_col),
        corpus_stats(df, text_col, id_col),
        query_terms, k=k, id_col=id_col,
    )


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
    in a broadcast blocklist (simplified single-column form; the full
    reference semantics are ``nsfw_flag_domains``)."""
    return df.withColumn(
        "nsfw", F.lower(F.col(source_col)).isin([s.lower() for s in nsfw_set])
    )


def domain_of_expr(col):
    """pulse/src/main.rs:226-233 parity: strip repeated ``http://`` then
    ``https://`` then ``www.`` prefixes (Rust trim_start_matches removes
    every leading repetition, in that order), take up to the first '/',
    lowercase. Applied to arbitrary TEXT too — the reference feeds
    content/title/meta through the same function."""
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, "^(http://)+", ""), "^(https://)+", ""
        ),
        r"^(www\.)+", "",
    )
    return F.lower(F.split(stripped, "/")[0])


def nsfw_flag_domains(df: DataFrame, domains: DataFrame,
                      cols: tuple[str, ...] = ("content_text", "title", "url"),
                      id_col: str = "doc_id") -> DataFrame:
    """P4 full semantics (main.rs:114-118): nsfw = OR over
    ``domain_of(col) IN nsfw_domains`` for content/title/meta/url.

    Scale shape: the reference's 1M-site set rides as a broadcast
    domains table; per row the <=len(cols) candidate domains explode and
    SEMI-join the broadcast set (no 1M-literal isin in the plan), then a
    broadcast join marks the hit ids back onto df."""
    cand = df.select(
        F.col(id_col),
        F.explode(
            F.array(*[domain_of_expr(F.col(c)) for c in cols])
        ).alias("_dom"),
    )
    dom = domains.select(F.lower(F.col(domains.columns[0])).alias("_dom"))
    hits = (
        cand.join(F.broadcast(dom), "_dom", "semi")
        .select(id_col).distinct()
        .withColumn("nsfw", F.lit(True))
    )
    # hit-id join left to AQE: the nsfw id set is usually broadcastable
    # but can grow with the corpus, unlike the fixed 1M-domain table
    return df.join(hits, id_col, "left").fillna(False, ["nsfw"])


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
    scoring terms → top-K projection.

    Queries using quoted phrases or parenthesized groups delegate to the
    full boolean evaluator over an on-the-fly positional index
    (operators/boolquery.py) — note its documented idf difference:
    corpus-level statistics with filters as boolean clauses, like
    Tantivy, vs this flat path's filtered-subset statistics."""
    if '"' in query or "(" in query:
        from . import boolquery

        meta_cols = tuple(
            c for c in df.columns if c not in (text_col, id_col)
        )
        q2 = query if lang is None else f"{query} language:{lang}"
        # positional postings (a corpus-wide posexplode) are only needed
        # when the parse actually contains a quoted phrase — a stray
        # paren or quote pair with no multi-word phrase must not trigger
        # the positions pass
        need_pos = boolquery.has_phrase(boolquery.parse_boolean(q2))
        idx = build_index(df, text_col, id_col, meta_cols=meta_cols,
                          with_positions=need_pos)
        return boolquery.search_boolean(idx, q2, k=k, id_col=id_col)
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


# ---------------------------------------------------------------------------
# Materialized-index serving path (P5 build -> P8 serve without corpus scan)
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass  # noqa: E402


@_dataclass
class BM25Index:
    """The committed-segment state pulse serves from
    (pulse/src/bin/server.rs:75-77): postings(term, id, tf),
    docstats(id, dl), stats(n_docs, avgdl) and optional per-doc
    attributes for field filters. Each member is a DataFrame so it can
    be backed by a snapshot table / parquet dir and partition-pruned."""

    postings: DataFrame
    docstats: DataFrame
    stats: DataFrame
    docmeta: DataFrame | None = None
    #: hive-bucket count of the postings table (None = unbucketed);
    #: per-term lookups prune to md5(term) % n_buckets
    n_buckets: int | None = None

    def term_postings(self, term: str) -> DataFrame:
        """One term's postings — partition-pruned on a bucketed index."""
        return prune_terms(self.postings, [term], self.n_buckets).filter(
            F.col("term") == term
        )


def build_index(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                meta_cols: tuple[str, ...] = (),
                with_positions: bool = False) -> BM25Index:
    """P5 index build: one tokenize pass fans into the three index
    tables (each a hash agg with map-side partial combine).
    ``with_positions`` stores per-posting position lists (Tantivy keeps
    them for phrase queries — operators/boolquery.py)."""
    if with_positions:
        from .boolquery import postings_positions

        post = postings_positions(df, text_col, id_col)
    else:
        post = postings(df, text_col, id_col)
    return BM25Index(
        postings=post,
        docstats=docstats(df, text_col, id_col),
        stats=corpus_stats(df, text_col, id_col),
        docmeta=df.select(id_col, *meta_cols) if meta_cols else None,
    )


def materialize_index(df: DataFrame, out_dir: str, text_col: str = "text",
                      id_col: str = "doc_id",
                      meta_cols: tuple[str, ...] = (),
                      bucket_partitions: int | None = None,
                      with_positions: bool = False) -> None:
    """Write the index tables to ``out_dir``. With ``bucket_partitions``
    = K the postings land hive-partitioned by ``bucket = md5(term) % K``
    (the parquet stand-in for an Iceberg ``bucket(K, term)`` transform):
    a query computes its terms' buckets driver-side (:func:`term_bucket`)
    and the scan directory-prunes to those partitions — per-query IO is
    O(matched buckets / K of the index), which is what keeps term
    lookups cheap at a 10^10-posting index. The bucket count rides the
    1-row stats table so every reader agrees without extra scans.
    ``with_positions`` persists per-posting position lists so quoted
    phrases serve from the same pruned on-disk layout."""
    idx = build_index(df, text_col, id_col, meta_cols,
                      with_positions=with_positions)
    post = idx.postings
    stats = idx.stats.withColumn(
        "n_buckets", F.lit(int(bucket_partitions or 0))
    )
    if bucket_partitions:
        post = post.withColumn(
            "bucket", term_bucket_expr(F.col("term"), bucket_partitions)
        )
        # one output file per bucket dir (term-local row groups)
        post = post.repartition(bucket_partitions, "bucket")
        post.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{out_dir}/postings"
        )
    else:
        post.write.mode("overwrite").parquet(f"{out_dir}/postings")
    idx.docstats.write.mode("overwrite").parquet(f"{out_dir}/docstats")
    stats.write.mode("overwrite").parquet(f"{out_dir}/stats")
    if idx.docmeta is not None:
        idx.docmeta.write.mode("overwrite").parquet(f"{out_dir}/docmeta")


def load_index(spark, out_dir: str, with_meta: bool = False) -> BM25Index:
    stats = spark.read.parquet(f"{out_dir}/stats")
    n_buckets = None
    if "n_buckets" in stats.columns:
        n_buckets = stats.select("n_buckets").collect()[0][0] or None
    return BM25Index(
        postings=spark.read.parquet(f"{out_dir}/postings"),
        docstats=spark.read.parquet(f"{out_dir}/docstats"),
        stats=stats,
        docmeta=spark.read.parquet(f"{out_dir}/docmeta") if with_meta else None,
        n_buckets=n_buckets,
    )


def search_index(index: BM25Index, query: str, k: int = 10,
                 id_col: str = "doc_id",
                 lang: str | None = None) -> DataFrame:
    """P6-P9 served from the materialized index: field filters resolve
    against docmeta, +term/-term resolve as postings semi/anti-joins, and
    scoring reads only the query terms' postings — per-query work is
    proportional to the matched postings, never the corpus. idf stays
    corpus-level (Tantivy treats filters as boolean clauses and keeps
    global term statistics), which is the one documented difference from
    the ad-hoc ``search(df, ...)`` that re-derives stats on the filtered
    subset."""
    pq = parse_query(query)
    if lang is not None:
        pq.fields["language"] = lang

    restrict: DataFrame | None = None
    if pq.fields:
        if index.docmeta is None:
            raise ValueError(
                "field-filtered query needs an index built with meta_cols"
            )
        meta = index.docmeta
        for f_name, v in pq.fields.items():
            if f_name in meta.columns:
                if v.lower() in ("true", "false"):
                    meta = meta.filter(F.col(f_name) == (v.lower() == "true"))
                else:
                    meta = meta.filter(F.col(f_name) == v)
        restrict = meta.select(id_col)
    for w in pq.must:
        ids_w = index.term_postings(w).select(id_col)
        restrict = ids_w if restrict is None else restrict.join(
            ids_w, id_col, "semi"
        )
    for w in pq.must_not:
        ids_w = index.term_postings(w).select(id_col)
        base = restrict if restrict is not None else \
            index.docstats.select(id_col)
        restrict = base.join(ids_w, id_col, "anti")

    score_terms = pq.terms + pq.must
    if not score_terms:
        base = restrict if restrict is not None else \
            index.docstats.select(id_col)
        return base.limit(k).withColumn("score", F.lit(0.0))
    return bm25_topk_from_index(
        index.postings, index.docstats, index.stats, score_terms,
        k=k, id_col=id_col, restrict=restrict,
    )


def snippet(df: DataFrame, terms: list[str], width: int = 120,
            text_col: str = "text") -> DataFrame:
    """Result-snippet generation (the P9 result projection's missing
    half — every search page shows a context window around the first
    query-term hit, e.g. website/src/routes/search's result preview
    consumes pulse's stored preview; this computes it query-aware).

    Adds, per row:
      * ``matched_term`` — the term with the EARLIEST case-insensitive
        occurrence (position ties break to the lexicographically
        smallest term); null when no term occurs;
      * ``hit_pos`` — its 1-based char position (0 when no hit);
      * ``snippet`` — a ``width``-char window starting ``width // 4``
        chars before the hit (clamped to the text start), with ``…``
        marking truncation on either side; rows with no hit fall back
        to the leading ``width`` chars (preview semantics).

    Zero shuffle, native exprs only — the term list is a query-time
    constant folded into codegen, so this rides whatever scan or join
    produced the results. Char (not byte) semantics, like P2.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(t)
    hits = F.filter(
        F.array(*[
            F.struct(
                F.locate(term.lower(), low).alias("pos"),
                F.lit(term).alias("term"),
            )
            for term in sorted(terms)
        ]),
        lambda h: h["pos"] > 0,
    )
    best = F.array_min(hits)  # struct order: (pos, term) — the tie-break
    pos = F.coalesce(best["pos"], F.lit(0))
    start = F.greatest(F.lit(1), pos - F.lit(width // 4))
    raw = t.substr(start, F.lit(width))
    return (
        df.withColumn("matched_term", best["term"])
        .withColumn("hit_pos", pos)
        .withColumn(
            "snippet",
            F.concat(
                F.when(start > 1, F.lit("…")).otherwise(F.lit("")),
                raw,
                F.when(start + width <= F.length(t), F.lit("…"))
                .otherwise(F.lit("")),
            ),
        )
    )


def tfidf_top_terms(df: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf·idf, the
    standard "what is this page about" signal next to BM25 (which ranks
    docs for a query; this ranks terms for a doc).

    Plan: reuses the P5 postings shuffle for tf, one hash-agg on term
    for df(t), and a broadcast of the 1-row corpus count; the per-doc
    top-k is a (doc) window over the postings frame — rank state only,
    no second corpus scan.

    Determinism contract: idf = ln(N/df) is the one libm op — it is
    rounded to INTEGER MICRO-NATS before the tf multiply, so the
    ranking key ``score_micro = tf · round(ln(N/df)·1e6)`` is an exact
    long and the (score desc, term asc) order — and therefore the top-k
    row SET — is identical across engines (a last-ulp ln difference
    would need to move the micro-rounding across a boundary to matter:
    P ~ 1e-10 per term).
    """
    post = postings(df, text_col, id_col)
    n = df.select(F.count(F.lit(1)).alias("n"))
    dfreq = post.groupBy("term").agg(
        F.countDistinct(id_col).alias("dft")
    )
    idf_micro = F.round(
        F.log(F.col("n").cast("double") / F.col("dft").cast("double"))
        * 1e6
    ).cast("long")
    scored = (
        post.join(F.broadcast(n))
        .join(dfreq, "term")
        .select(
            id_col, "term",
            (F.col("tf") * idf_micro).alias("score_micro"),
        )
    )
    wnd = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "score_micro",
                F.col("rnk").cast("int").alias("rnk"))
    )
