"""Self-check replica of the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.001 and
compare row count + column names + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df):
    """pandas frame -> sorted list of row tuples of canonical strings."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<null>")
            elif isinstance(v, float):
                vals.append(f"{v:.4f}")
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


QUERIES = sorted(entry_mod.queries().keys())

# Deliberately oracle-less (driver rows-only) entries. EMPTY since r5:
# t_bpe_encode (the last holdout) now carries the replace-chain SQL
# oracle + a committed pure-Python fixture. Keep it empty — adding to
# it weakens the battery.
ORACLE_LESS: set[str] = set()


def test_oracle_less_set_is_exact():
    sqls = entry_mod.oracle_sql()
    assert {q for q in QUERIES if q not in sqls} == ORACLE_LESS


@pytest.mark.parametrize("name", QUERIES)
def test_query_vs_oracle(spark, ddb, name):
    if name in ORACLE_LESS:
        df = entry_mod.queries()[name](spark, SF)
        assert df.count() >= 0  # rows-only, parity lives in its own test
        return
    qfn = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    assert name in sqls, f"{name} missing oracle_sql (rows-only queries excluded here)"
    spark_pdf = qfn(spark, SF).toPandas()
    duck_pdf = ddb.sql(sqls[name]).df()
    scols, srows = _canon(spark_pdf)
    dcols, drows = _canon(duck_pdf)
    assert scols == dcols, f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "score" in df.columns and "preview" in df.columns


def test_entry_query_time_is_index_only(spark):
    """The flagship serves from the materialized index: the returned
    query's plan reads postings/docstats/stats/docmeta parquet only —
    documents.parquet appearing in it would mean the O(corpus)-per-query
    shape came back (preview/language must ride the index as stored
    fields, not a corpus re-join)."""
    from vyntr_spark.plans import audit

    df = entry_mod.entry(spark)
    plan = audit.executed_plan(df)
    assert "documents.parquet" not in plan
    assert "vyntr_entry_index" in plan  # it IS the index being read
