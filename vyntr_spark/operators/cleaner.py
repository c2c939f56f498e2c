"""Dataset-cleaning operators (SURVEY.md §2.2, reference
genesis/tools/dataset). All native Catalyst expressions — no Python in
the data path.

D1 regex-clean pipeline order is semantic (content_cleaner.js:20-37):
spaces → tags → entities → control chars → U+FFFD → markdown → urls →
extra line breaks → trim. Order is preserved as one nested select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (java_regex, replacement) in reference application order
# (content_cleaner.js:20-37; '　' = U+3000 ideographic space)
CLEAN_PATTERNS: list[tuple[str, str]] = [
    ("[ \\t\u3000]+", " "),                                  # spaces
    ("<[^>]+>", ""),                                          # tags
    ("(?i)&(?:[a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});", ""),  # entities
    ("[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""),                    # control chars
    ("\uFFFD", ""),                                           # U+FFFD
    ("\\[(.*?)\\]\\((.*?)\\)", "$1"),                         # markdown links
    ("\\?[^\"'\\s<>]+", ""),                                  # url query tails
    ("\\n{3,}", "\n\n"),                                      # extra line breaks
]


def clean_text_col(col: Column) -> Column:
    """D1: the ordered regex pipeline + trim (content_cleaner.js:82-94)."""
    out = col
    for pat, rep in CLEAN_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def clean_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """D1 applied to a documents-like table; null text passes through (D3)."""
    cleaned = F.when(
        F.col(text_col).isNull(), F.col(text_col)
    ).otherwise(clean_text_col(F.col(text_col)))
    return df.withColumn("cleaned_text", cleaned)


def drop_empty(df: DataFrame, text_col: str = "cleaned_text",
               meta_col: str | None = None) -> DataFrame:
    """D2 (content_cleaner.js:97-101): drop rows whose cleaned text is empty
    AND whose meta_tags are null/empty. Without a meta column the meta side
    is vacuously empty (documents table has none)."""
    empty_text = F.coalesce(F.col(text_col), F.lit("")) == ""
    if meta_col is None:
        return df.filter(~empty_text)
    empty_meta = F.col(meta_col).isNull() | (F.size(meta_col) == 0)
    return df.filter(~(empty_text & empty_meta))


def skip_if_fresh(df: DataFrame, processed: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """D7: incremental clean — skip rows already processed.

    The reference's dataset tool skips an input file whose cleaned output
    already exists and is fresh (mtime check, content_cleaner.js). The
    set-based analog: anti-join the already-processed ids and run the D1
    pipeline only on the remainder, so a re-run re-does no work.

    Scale: a left-anti equi-join on the id key — broadcasts when the
    processed set is small, shuffles on the key otherwise; either way no
    per-row driver logic.
    """
    todo = df.join(processed.select(id_col), id_col, "left_anti")
    return clean_documents(todo, text_col)


def top_n_largest(df: DataFrame, n: int = 1000, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """D4 (find_largest.js): global top-N by content length. Spark plans
    this as TakeOrderedAndProject — the same partial-top-N-per-split +
    merge the reference hand-rolls. Ties broken by id for determinism."""
    return (
        df.select(id_col, F.length(text_col).alias("text_len"))
        .orderBy(F.col("text_len").desc(), F.col(id_col).asc())
        .limit(n)
    )


def remove_largest(df: DataFrame, largest: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """D5 (remove_largest.js): anti-join the removal list."""
    return df.join(largest.select(id_col), id_col, "left_anti")


def top_frequent_words(df: DataFrame, n: int = 200,
                       text_col: str = "text") -> DataFrame:
    """D6: the 200 most frequent words (tokenize → count → top-N).
    Ties broken by word for determinism."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(n)
    )
