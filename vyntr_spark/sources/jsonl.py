"""Lenient JSONL source (operator P1, reference pulse/src/main.rs:91-154).

The reference's readers skip unparseable lines with a warning
(pulse/src/main.rs:145-153, generate_embeddings.py:192-195). Spark
equivalent: PERMISSIVE mode with a corrupt-record column, dropping rows
where parsing failed — schema is explicit, never inferred (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANALYSES_JSONL = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField(
            "meta_tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), True),
                        T.StructField("content", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("canonical_url", T.StringType(), True),
        T.StructField("content_text", T.StringType(), True),
    ]
)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = ANALYSES_JSONL) -> DataFrame:
    """Read JSONL, skipping bad lines (and lines missing a url)."""
    # NB: StructType.add mutates in place — build a fresh schema so the
    # caller's (often module-level) schema object is never modified
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return (
        df.filter(F.col("_corrupt").isNull() & F.col("url").isNotNull())
        .drop("_corrupt")
    )


def write_jsonl(df: DataFrame, path: str, partition_col: str | None = None) -> None:
    """Partitioned JSONL sink (C19 analog: analyses/partition=XX/...,
    genesis/src/db.rs:110-120 — but partitioned per-ROW by md5 prefix,
    fixing the reference's first-record-of-chunk quirk)."""
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.json(path)
