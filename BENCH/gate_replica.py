"""Driver-faithful replica of the per-round correctness gate.

Runs every __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB at sf0.01 and compares row count, column names and
an order-insensitive value hash — using the SAME canonicalization shape
the driver uses (pandas sort_values over name-sorted columns), so any
column type the driver cannot hash (arrays, maps) fails HERE first.

Usage: python BENCH/gate_replica.py [sf_dir] [name ...]
(trailing args, if given, restrict the run to those query names —
for targeted re-checks after editing an operator)
"""

import hashlib
import json
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
from vyntr_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # driver-style: lexsort on all columns (raises on unhashable cells)
    pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for _, row in pdf.iterrows():
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                h.update(b"<null>")
            elif isinstance(v, float):
                h.update(f"{v:.4f}".encode())
            elif isinstance(v, bool):
                h.update(str(bool(v)).encode())
            else:
                h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return cols, len(pdf), h.hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spark = get_spark()
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            sys.exit(2)
        qs = {k: v for k, v in qs.items() if k in only}
    results, n_fail = {}, 0
    for name, qfn in qs.items():
        rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            scols, srows, shash = _canon(qfn(spark, sf).toPandas())
            if name in sqls:
                dcols, drows, dhash = _canon(con.sql(sqls[name]).df())
                rec.update(
                    rows_match=srows == drows,
                    schema_match=scols == dcols,
                    hash_match=shash == dhash,
                    spark_rows=srows,
                    oracle_rows=drows,
                )
                if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                    n_fail += 1
                    rec["spark_cols"], rec["oracle_cols"] = scols, dcols
            else:
                rec.update(rows_match=srows >= 0, spark_rows=srows, note="rows-only")
        except Exception as e:  # driver keeps going per-query these days; we do too
            rec["err"] = f"{type(e).__name__}: {e}"
            n_fail += 1
        results[name] = rec
        flag = ("OK " if rec["err"] is None
                and rec.get("rows_match")
                and rec.get("hash_match", True) in (True, None)
                and rec.get("schema_match", True) in (True, None)
                else "FAIL")
        print(f"{flag} {name} rows={rec.get('spark_rows')}", flush=True)
    print(json.dumps({"total": len(qs), "failed": n_fail}))
    with open("/tmp/gate_replica.json", "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
