"""W10 full-shape bang table + handleBangQuery parity.

The reference ships a 108,502-line static table (website/src/lib/
bangs.ts:1-30 — entries {c: category, d: domain, r: rank, s: title,
sc: subcategory, t: tag, u: url-template}) consumed by
handleBangQuery (website/src/lib/utils/bangs.ts:3-18): scan the
query's space-split words left to right, and for the FIRST '!'-word
whose lowercased tag exists in the table, redirect to the entry's
template with '{{{s}}}' replaced by encodeURIComponent(all other
words joined by single spaces). Unknown '!'-words are skipped, later
ones still match.

Spark shape: the table is a dimension (even at the reference's 108k
rows it is a few MB) -> broadcast hash join against the exploded
'!'-word candidates; the first-match rule is an aggregate (min over
word position), never a window, so one query with many bangs cannot
straggle. No Python anywhere in the plan: the percent-encoder is a
transform() over the character array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BANG_SCHEMA = (
    "c string, d string, r int, s string, sc string, t string, u string"
)

_CATS = ["Tech", "Entertainment", "Online Services", "News",
         "Research", "Shopping", "Translation", "Multimedia"]
_SUBCATS = ["Search", "Forum", "Downloads (apps)", "Movies",
            "Music", "Reference", "Tools"]

# encodeURIComponent's unreserved set (ECMA-262 §19.2.6.5):
# A-Z a-z 0-9 - _ . ! ~ * ' ( ) — everything else becomes %XX.
_URI_UNRESERVED = r"^[A-Za-z0-9\-_.!~*'()]$"


def synth_bangs(spark: SparkSession, n: int = 100_000) -> DataFrame:
    """Deterministic full-size bang table matching the bangs.ts shape
    (same seven fields, lowercase tags, '{{{s}}}' placeholder in the
    url template) — the sandbox stand-in for loading the real 108k-row
    table. Pure spark.range + native exprs: no driver-side list, so the
    same call synthesizes 10^8 rows without blinking."""
    i = F.col("id")
    dom = F.concat(F.lit("site"), (i % 997).cast("string"),
                   F.lit(".example.com"))
    return spark.range(n).select(
        F.element_at(F.array(*[F.lit(c) for c in _CATS]),
                     (i % len(_CATS)).cast("int") + 1).alias("c"),
        dom.alias("d"),
        (i % 7).cast("int").alias("r"),
        F.concat(F.lit("Site "), i.cast("string")).alias("s"),
        F.element_at(F.array(*[F.lit(c) for c in _SUBCATS]),
                     (i % len(_SUBCATS)).cast("int") + 1).alias("sc"),
        F.concat(F.lit("b"), i.cast("string")).alias("t"),
        F.concat(F.lit("https://"), dom, F.lit("/search?q={{{s}}}&r="),
                 (i % 13).cast("string")).alias("u"),
    )


def load_bangs_json(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a bangs.ts-shaped table from JSON/JSONL (the natural
    export format of the reference's TS array). Schema is pinned so a
    malformed file fails loudly instead of inferring drift."""
    return spark.read.schema(BANG_SCHEMA).json(path)


def encode_uri_component(col):
    """encodeURIComponent twin for ASCII text, as a native expression:
    per-character transform keeping the unreserved set, percent-hex
    for the rest. Non-ASCII codepoints would need UTF-8 multi-byte
    expansion (%E2%82%AC-style) — out of scope for the ASCII fixture
    corpus, documented here so nobody trusts it with emoji."""
    return F.array_join(
        F.transform(
            F.split(col, ""),
            lambda ch: F.when(ch.rlike(_URI_UNRESERVED), ch).otherwise(
                F.concat(F.lit("%"),
                         F.lpad(F.upper(F.hex(F.ascii(ch))), 2, "0"))
            ),
        ),
        "",
    )


def bang_resolve(queries: DataFrame, bangs: DataFrame,
                 query_col: str = "q") -> DataFrame:
    """handleBangQuery parity (utils/bangs.ts:3-18) over a DataFrame of
    queries: returns (query_col, bang, redirect_url) for queries where
    some '!'-word's tag matches; non-matching queries drop out (the
    reference returns null and the caller falls through to search).

    Split is on a SINGLE space, not \\s+, like the reference's
    query.split(' '). The matched word is removed by position (not by
    value — a query may repeat the bang word as a plain term)."""
    words = F.split(F.col(query_col), " ")
    cand = (
        queries.select(query_col, F.posexplode(words).alias("pos", "w"))
        .filter(F.col("w").startswith("!"))
        .select(
            query_col, "pos",
            F.lower(F.expr("substring(w, 2)")).alias("tag"),
        )
    )
    hit = cand.join(
        F.broadcast(bangs.select(F.col("t").alias("tag"), "u")), "tag"
    )
    first = hit.groupBy(query_col).agg(
        F.min(F.struct("pos", "tag", "u")).alias("m")
    )
    term = F.array_join(
        F.filter(
            F.split(F.col(query_col), " "),
            lambda w, i: i != F.col("m.pos"),
        ),
        " ",
    )
    return first.select(
        query_col,
        F.col("m.tag").alias("bang"),
        F.replace(
            F.col("m.u"), F.lit("{{{s}}}"), encode_uri_component(term)
        ).alias("redirect_url"),
    )
