"""Deterministic sampling operators for training-data pipelines.

Both are hash-deterministic — same rows selected on any engine, any
partitioning, any run — which is what makes them usable in a pipeline
whose outputs must be reproducible and oracle-checkable. Spark's own
``df.sample`` is seed-deterministic only for a FIXED partitioning, so it
cannot be the primitive here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# md5-prefix width: 15 hex digits = 60 bits, exact in both a Spark long
# and DuckDB's BIGINT (no float involved in the keep decision)
_HASH_SPACE = 16 ** 15


def _key_hash(key_col: str):
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def sample_deterministic(df: DataFrame, fraction: float,
                         key_col: str = "doc_id") -> DataFrame:
    """Bernoulli-style sample keeping rows whose 60-bit md5(key) prefix
    falls below ``fraction`` of the hash space.

    Zero shuffle — a pure filter that rides the scan (predicate stays
    JVM-side, whole-stage codegen). The sample is a deterministic
    function of the KEY, so it is stable under re-partitioning, retries,
    and engine swaps, and composable: sample(0.5) of sample(0.5) over
    independent key salts behaves like independent coin flips.
    """
    return df.filter(_key_hash(key_col) < F.lit(int(fraction * _HASH_SPACE)))


def stratified_topn(df: DataFrame, strata_col: str, n: int,
                    key_col: str = "doc_id") -> DataFrame:
    """Exact per-stratum quota: the ``n`` rows with the smallest
    md5(key) per stratum (ties broken by the key itself) — i.e. a
    deterministic uniform sample of exactly min(n, |stratum|) rows from
    each stratum (language, domain, source...).

    One shuffle, partitioned by the stratum. A hot stratum lands on one
    reducer; at 100 TB pre-trim it first with
    ``sample_deterministic`` — because the window ORDERS BY the same
    uniform hash, filtering to ``hash < f*SPACE`` with
    f = c*n/|stratum| keeps the true top-n with overwhelming
    probability and both engines can apply the identical pre-filter, so
    determinism survives. The plain form here is the exact primitive.
    """
    w = Window.partitionBy(strata_col).orderBy(
        _key_hash(key_col), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
