"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units",
ACL'16 — the public algorithm behind GPT-2-style tokenizers).

The classic formulation trains on a WORD HISTOGRAM, not the corpus:
pretokenize once (the lookahead-free GPT-2-ish pretokenizer shared with
textstats.bpe_token_count), reduce the corpus to (word, count) — after
that every merge round costs O(|distinct words|), independent of corpus
size. That is the whole scale story: 100 TB of text becomes a ~10^7-row
histogram in one map-side-combinable aggregation, and the iterative part
never touches the corpus again.

Per merge round:
  1. pair counts — explode adjacent symbol pairs per word, weighted by
     the word count (native exprs, hash agg with map-side combine);
  2. argmax — highest count, ties to the lexicographically smallest
     (left, right); ``takeOrdered(1)``-style driver pick (two scalars);
  3. apply — rewrite each word's symbol array merging that pair
     (leftmost-first, non-overlapping — "aaa" with merge (a,a) gives
     ["aa","a"]); Arrow-batched pandas UDF over the histogram only;
  4. ``localCheckpoint`` — same exponential-lineage rule as every other
     iterative operator in this repo (see operators/graph.py).

``pair_counts`` alone is SQL-expressible and oracle-checked
(``t_bpe_pairs``); the full trainer is verified against an exact
pure-Python reference in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from vyntr_spark.operators.textstats import BPE_SPLIT_PATTERN


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over pretokenizer pieces; whitespace runs dropped,
    leading-space pieces kept verbatim (they are distinct BPE symbols in
    GPT-2-style vocabularies)."""
    pieces = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(BPE_SPLIT_PATTERN), 0,
    )
    words = F.filter(pieces, lambda p: ~p.rlike("^[ \t\n]+$"))
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _sym_pairs(sym_col):
    n = F.size(sym_col)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(sym_col, i + 1).alias("left"),
            F.element_at(sym_col, i + 2).alias("right"),
        ),
    )


def pair_counts(words: DataFrame, sym_col: str = "symbols") -> DataFrame:
    """(left, right, cnt) adjacent-pair counts over symbol arrays,
    weighted by the word count. One explode + one hash agg."""
    return (
        words.select("cnt", F.explode(_sym_pairs(F.col(sym_col))).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _chars(col):
    # split-between-every-char; Java split keeps a trailing "" (the
    # lookahead also matches at end-of-string) — drop it
    return F.array_remove(F.split(col, "(?!^)"), "")


def char_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Round-0 pair counts (initial symbols = characters) straight off a
    corpus — the oracle-checkable entry point."""
    words = word_histogram(df, text_col).withColumn("symbols",
                                                    _chars(F.col("word")))
    return pair_counts(words)


def _merge_udf(left: str, right: str):
    """Arrow UDF applying ONE merge (leftmost-first, non-overlapping:
    "aaa" under (a,a) -> ["aa","a"]) to a symbol-array column."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(sym: pd.Series) -> pd.Series:
        def m(arr):
            out, i, n = [], 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out
        return sym.map(m)

    return apply_merge


def bpe_train(df: DataFrame, n_merges: int = 40,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns the ordered
    merge list [(left, right, pair_count), ...]. Stops early when no
    pair occurs twice (merging hapax pairs is noise)."""
    words = (
        word_histogram(df, text_col)
        .withColumn("symbols", _chars(F.col("word")))
        .select("symbols", "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append((left, right, int(cnt)))

        apply_merge = _merge_udf(left, right)
        words = words.select(
            apply_merge("symbols").alias("symbols"), "cnt"
        ).localCheckpoint(eager=True)
    return merges
