#!/usr/bin/env python
"""Regenerate the t_bpe_encode value-oracle fixture
(bpe_encode_sf001.parquet) after a change to _BPE_FIXED_MERGES or the
pretokenizer.

Computed PURE-PYTHON (re.findall pretokenize + sequential _encode_word
merge application) — independent of both the Spark plan it oracles and
the DuckDB replace-chain oracle, so the three engines triangulate.
Writes one sorted single-file parquet.

Usage: python tests/fixtures/regen_bpe_fixture.py [sf_dir]
       (default /root/testdata/sf0.01)
"""

import hashlib
import os
import re
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from vyntr_spark.operators.bpe import _encode_word  # noqa: E402
from vyntr_spark.operators.textstats import BPE_SPLIT_PATTERN  # noqa: E402
from __spark_entry__ import _BPE_FIXED_MERGES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        pieces = [w for w in re.findall(BPE_SPLIT_PATTERN, text or "")
                  if not re.fullmatch(r"[ \t\n]+", w)]
        toks = [t for w in pieces
                for t in _encode_word(w, _BPE_FIXED_MERGES)]
        rows.append((int(doc_id), len(pieces), len(toks),
                     hashlib.md5("\x1f".join(toks).encode()).hexdigest()))
    out = pd.DataFrame(rows, columns=["doc_id", "n_pieces", "n_tokens",
                                      "token_hash"]).sort_values("doc_id")
    tbl = pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema([
        ("doc_id", pa.int64()), ("n_pieces", pa.int64()),
        ("n_tokens", pa.int64()), ("token_hash", pa.string())]))
    dest = os.path.join(HERE, "bpe_encode_sf001.parquet")
    pq.write_table(tbl, dest)
    print(f"wrote {len(out)} rows -> {dest}")


if __name__ == "__main__":
    main()
