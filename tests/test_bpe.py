"""Distributed BPE training vs an exact pure-Python reference
(histogram-based Sennrich et al. trainer with the same tie-break:
highest pair count, then lexicographically smallest pair)."""

import re

from vyntr_spark.operators import bpe
from vyntr_spark.operators.textstats import BPE_SPLIT_PATTERN


def _ref_histogram(texts):
    hist = {}
    for t in texts:
        for w in re.findall(BPE_SPLIT_PATTERN, t or ""):
            if re.fullmatch(r"[ \t\n]+", w):
                continue
            hist[w] = hist.get(w, 0) + 1
    return hist


def _ref_train(texts, n_merges):
    words = {tuple(w): c for w, c in _ref_histogram(texts).items()}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        new = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        words = new
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the catalog, the cathode",
    "a cattle cart carted carts",
    "low lower lowest newest newest",
    None,
    "",
]


def test_char_pair_counts_hand_checked(spark):
    docs = spark.createDataFrame([(0, "aa ab aa")], "doc_id long, text string")
    got = {(r["left"], r["right"]): r["cnt"]
           for r in bpe.char_pair_counts(docs).collect()}
    # words: 'aa', ' ab', ' aa' (leading-space pieces are DISTINCT symbols)
    assert got[("a", "a")] == 2      # 'aa', ' aa'
    assert got[(" ", "a")] == 2      # ' ab', ' aa'
    assert got[("a", "b")] == 1


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = bpe.bpe_train(docs, n_merges=25)
    want = _ref_train(CORPUS, 25)
    assert got == want
    assert len(got) >= 10            # non-vacuous: real merges learned
    # overlapping-run semantics: leftmost-first, non-overlapping
    tricky = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    got2 = bpe.bpe_train(tricky, n_merges=3)
    assert got2 == _ref_train(["aaa aaa"], 3)


def test_bpe_train_stops_when_dry(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once -> nothing to merge
    assert bpe.bpe_train(docs, n_merges=5) == []


def test_bpe_encode_matches_reference(spark):
    """End-to-end train→encode parity: Spark's bpe_encode over the
    corpus equals a pure-Python pretokenize + sequential-merge encode
    per doc (n_pieces, n_tokens, and the exact token-stream hash)."""
    import hashlib

    from vyntr_spark.operators.bpe import _encode_word, bpe_encode, bpe_train

    texts = [
        (1, "the cat sat on the mat, the cat sat."),
        (2, "banana bandana ban ban banana!"),
        (3, "the the the unrelated zzz"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges = bpe_train(df, n_merges=12)
    assert merges, "trainer found merges"
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}

    mlist = [(l, r) for l, r, _ in merges]
    for doc_id, text in texts:
        pieces = [w for w in re.findall(BPE_SPLIT_PATTERN, text or "")
                  if not re.fullmatch(r"[ \t\n]+", w)]
        toks = [t for w in pieces for t in _encode_word(w, mlist)]
        want_hash = hashlib.md5("\x1f".join(toks).encode()).hexdigest()
        r = got[doc_id]
        assert r["n_pieces"] == len(pieces)
        assert r["n_tokens"] == len(toks)
        assert r["token_hash"] == want_hash, f"doc {doc_id}"
    # merging must compress: fewer tokens than characters-in-pieces
    assert got[1]["n_tokens"] < sum(
        len(w) for w in re.findall(BPE_SPLIT_PATTERN, texts[0][1])
        if not re.fullmatch(r"[ \t\n]+", w)
    )


def _ref_chunk_token_ids(tokens, max_tokens, overlap,
                         num_special=2, safety=15):
    """Pure-Python re-specification of the reference's
    chunk_text_yield_token_ids (generate_embeddings.py:107-165),
    operating on an already-encoded token list."""
    if not tokens:
        return
    effective = max(1, max_tokens - num_special - safety)
    if effective <= overlap:
        overlap = max(0, effective // 4)
    if (max_tokens - num_special) <= 0:
        return
    if len(tokens) <= effective:
        yield tokens[:max_tokens] if len(tokens) > max_tokens else tokens
        return
    stride = effective - overlap
    if stride <= 0:
        stride = max(1, effective // 2)
    pos = 0
    while pos < len(tokens):
        chunk = tokens[pos:pos + effective]
        if not chunk:
            break
        yield chunk
        pos += stride


def test_bpe_token_chunks_reference_parity(spark):
    """e2b chunking must reproduce the reference generator chunk by
    chunk: same chunk_id sequence, same window starts (stride math),
    same window contents — including the short trailing window and the
    single-chunk fast path."""
    import hashlib

    from vyntr_spark.operators.bpe import (_encode_word,
                                           apply_merges_expr,  # noqa: F401
                                           bpe_token_chunks)

    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
              ("i", "n"), ("e", "r"), ("o", "n"), ("s", "t")]
    texts = [
        (1, "the theater is on and in there, standing another era " * 9),
        (2, "short one"),
        (3, ""),
        (4, None),
        (5, "x" * 200),  # one long word -> one token per merge-free char
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in bpe_token_chunks(df, merges, max_tokens=48, overlap=8).collect():
        got.setdefault(r["doc_id"], []).append(r)

    for doc_id, text in texts:
        pieces = [w for w in re.findall(BPE_SPLIT_PATTERN, text or "")
                  if not re.fullmatch(r"[ \t\n]+", w)]
        toks = [t for w in pieces for t in _encode_word(w, merges)]
        want = list(_ref_chunk_token_ids(toks, 48, 8))
        rows = sorted(got.get(doc_id, []), key=lambda r: r["chunk_id"])
        assert len(rows) == len(want), f"doc {doc_id} chunk count"
        eff, stride = 48 - 2 - 15, (48 - 2 - 15) - 8
        for i, (row, chunk) in enumerate(zip(rows, want)):
            assert row["chunk_id"] == i
            assert row["start_tok"] == (0 if len(toks) <= eff else i * stride)
            assert row["n_tokens"] == len(chunk)
            assert row["chunk_hash"] == hashlib.md5(
                " ".join(chunk).encode()).hexdigest(), f"doc {doc_id} c{i}"


def test_apply_merges_expr_matches_encode_word(spark):
    """The native replace-chain encoder must agree with the pure-Python
    leftmost-scan BPE applier on boundary-hazard words (symbol whose
    tail equals a merge's left half; cascaded and repeated merges)."""
    import pyspark.sql.functions as F

    from vyntr_spark.operators.bpe import _encode_word, apply_merges_expr

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("s", "t")]
    words = ["the", "ath", "tth", "aaaa", "aaa", "sthe", "stst",
             "theater", "xyz", "t", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    out = df.select(
        "w",
        F.regexp_extract_all(
            apply_merges_expr(F.col("w"), merges),
            F.lit(r"[^\x02\x03]+"), 0,
        ).alias("toks"),
    ).collect()
    for r in out:
        assert list(r["toks"]) == _encode_word(r["w"], merges), r["w"]


def test_bpe_encode_matches_committed_fixture(spark):
    """The committed t_bpe_encode value-oracle fixture
    (tests/fixtures/bpe_encode_sf001.parquet — computed PURE-PYTHON:
    re.findall pretokenize + sequential _encode_word, independent of
    the Spark plan AND of the DuckDB replace-chain oracle) must equal
    Spark's bpe_encode over the sf0.01 corpus under the fixed merge
    list. Three independent engines now witness the same values."""
    import os

    import pandas as pd

    from __spark_entry__ import _BPE_FIXED_MERGES
    from vyntr_spark.operators.bpe import bpe_encode

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "bpe_encode_sf001.parquet")
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        import pytest
        pytest.skip("sf0.01 driver tables not present")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (bpe_encode(docs, _BPE_FIXED_MERGES).toPandas()
           .sort_values("doc_id").reset_index(drop=True)
           .astype({"doc_id": "int64", "n_pieces": "int64",
                    "n_tokens": "int64"}))
    want = pd.read_parquet(fixture)
    pd.testing.assert_frame_equal(got, want)
