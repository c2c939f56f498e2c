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


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sennrich sequential encode (pure kernel, shared with the pytest
    reference): merges apply in TRAINING ORDER, each exhaustively,
    leftmost-first non-overlapping — the original subword-nmt encoder
    semantics (tiktoken's rank-priority loop can differ on rare inputs;
    this repo pins the sequential form end-to-end)."""
    sym = list(word)
    for left, right in merges:
        if len(sym) < 2:
            break
        out, i, n = [], 0, len(sym)
        while i < n:
            if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Encode the corpus with a TRAINED merge list — the tokenization
    stage a training-data pipeline runs after ``bpe_train``.

    Scale story (same histogram trick as training): the Python merge
    loop runs once per DISTINCT word — an Arrow-batched UDF over the
    vocabulary table, O(|vocab|) Python work no matter how big the
    corpus — and the corpus side is pure native exprs: pretokenize,
    posexplode (piece order preserved), equi-join word→tokens (the
    vocab side is small enough to broadcast in practice; AQE decides),
    and a per-doc reassembly agg. Nothing row-wise Python ever touches
    corpus-scale data.

    Returns scalar surface (doc_id, n_pieces, n_tokens, token_hash):
    token_hash = md5 of the doc's token stream joined with the 0x1f
    unit separator in piece order — the cheap equality witness for the
    pytest pure-Python parity check.
    """
    mlist = [(left, right) for left, right, *_ in merges]

    @pandas_udf(T.ArrayType(T.StringType()))
    def enc(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, mlist))

    pieces_arr = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_SPLIT_PATTERN), 0
    )
    pieces = (
        df.select("doc_id", F.posexplode(pieces_arr).alias("p", "word"))
        .filter(~F.col("word").rlike("^[ \t\n]+$"))
    )
    vocab = pieces.select("word").distinct().select(
        "word", enc(F.col("word")).alias("toks")
    )
    joined = pieces.join(vocab, "word")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pieces"),
        F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "toks"))
                        ),
                        lambda s: s["toks"],
                    )
                ),
                "\x1f",
            )
        ).alias("token_hash"),
    )
    return (
        df.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pieces", F.lit(0).cast("long")).alias("n_pieces"),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("token_hash", F.md5(F.lit(""))).alias("token_hash"),
        )
    )


# -- E2b: tokenizer-faithful chunking ---------------------------------------

# Symbol markers for the native merge applier below. Any two characters
# outside the corpus alphabet work; STX/ETX never appear in text fields.
_SYM_L, _SYM_R = "\x02", "\x03"
_SYM_TOKEN_RE = r"[^\x02\x03]+"


def apply_merges_expr(word_col, merges: list[tuple[str, str]]):
    """Apply a FIXED ranked merge list to one pretokenizer piece as a
    pure native expression — no Python UDF.

    Representation: every symbol rides marker-wrapped (\\x02 sym \\x03),
    so a merge (a, b) is one string replace of '<a><b>' with '<ab>' —
    replace() scans left-to-right non-overlapping, which is exactly
    BPE's leftmost-first application order, and the markers make symbol
    boundaries explicit (naive separator-joins would merge across
    boundaries: ['at','h'] must NOT match merge ('t','h')). A left fold
    equals the scan because a merged symbol can never equal its own
    left half. This works for any FIXED merge list; the trained-list
    path (bpe_encode) keeps its vocabulary-table Arrow UDF.

    Returns the marker-wrapped symbol string; extract tokens with
    regexp_extract_all(_SYM_TOKEN_RE)."""
    s = F.array_join(
        F.transform(
            F.split(word_col, ""),
            lambda c: F.concat(F.lit(_SYM_L), c, F.lit(_SYM_R)),
        ),
        "",
    )
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(_SYM_L + a + _SYM_R + _SYM_L + b + _SYM_R),
            F.lit(_SYM_L + a + b + _SYM_R),
        )
    return s


def chunk_params(max_tokens: int, overlap: int,
                 num_special: int = 2, safety: int = 15
                 ) -> tuple[int, int]:
    """The reference's effective-window/stride math
    (generate_embeddings.py:107-146): effective = max(1, max_tokens -
    num_special_tokens - SAFETY_BUFFER); if effective <= overlap the
    overlap degrades to effective//4; stride = effective - overlap,
    floored at effective//2 (>=1). Returns (effective, stride)."""
    eff = max(1, max_tokens - num_special - safety)
    if eff <= overlap:
        overlap = max(0, eff // 4)
    stride = eff - overlap
    if stride <= 0:
        stride = max(1, eff // 2)
    return eff, stride


def bpe_token_chunks(df: DataFrame, merges: list[tuple[str, str]],
                     max_tokens: int = 48, overlap: int = 8,
                     num_special: int = 2, safety: int = 15,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """E2 chunking windowed by SUBWORD tokens (the trained-BPE stand-in
    for the reference's HF token ids — generate_embeddings.py
    chunk_text_yield_token_ids, :107-165): window = max_tokens −
    num_special − SAFETY_BUFFER subwords, stride = window − overlap,
    text that fits the window yields ONE whole chunk, otherwise windows
    start at 0, stride, 2·stride, … while the start is inside the token
    stream (the final window may be short — reference keeps it). The
    production config is max_tokens=512, overlap=50, safety=15
    (generate_embeddings.py:34-43); the defaults here scale that shape
    down to the fixture corpus.

    Wholly native plan: pretokenize (regexp_extract_all), per-piece
    fixed-merge BPE via apply_merges_expr, flatten to the doc's token
    stream, one explode over the window index sequence — zero Python,
    zero shuffle beyond the input scan.

    Returns (id_col, chunk_id, start_tok, n_tokens, chunk_hash) where
    chunk_hash = md5 of the space-joined token slice — the value
    witness the DuckDB oracle replays exactly."""
    from vyntr_spark.operators.textstats import (BPE_SPLIT_PATTERN,
                                                 widen_small_scan)

    if (max_tokens - num_special) <= 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, chunk_id int, start_tok int, "
                "n_tokens long, chunk_hash string")
    eff, stride = chunk_params(max_tokens, overlap, num_special, safety)

    pieces = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(BPE_SPLIT_PATTERN), 0)
    words = F.filter(pieces, lambda w: ~w.rlike("^[ \t\n]+$"))
    toks = F.flatten(
        F.transform(
            words,
            lambda w: F.regexp_extract_all(
                apply_merges_expr(w, merges), F.lit(_SYM_TOKEN_RE), 0
            ),
        )
    )
    base = widen_small_scan(df, id_col).select(
        F.col(id_col), toks.alias("toks"), F.size(toks).alias("n")
    )
    n = F.col("n")
    k = (
        F.when(n <= 0, F.lit(0))
        .when(n <= eff, F.lit(1))
        .otherwise(F.ceil(n.cast("double") / stride).cast("int"))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).cast("int").alias("start_tok"),
            F.slice(F.col("toks"), i * stride + 1, eff).alias("sl"),
        ),
    )
    return (
        base.select(
            id_col,
            F.explode(
                F.when(k > 0, chunks).otherwise(
                    F.array().cast(
                        "array<struct<chunk_id:int,start_tok:int,"
                        "sl:array<string>>>"
                    )
                )
            ).alias("c"),
        )
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.start_tok").alias("start_tok"),
            F.size("c.sl").cast("long").alias("n_tokens"),
            F.md5(F.array_join(F.col("c.sl"), " ")).alias("chunk_hash"),
        )
    )
