"""Temporal/event operators: gap-based sessionization and as-of join.

Event analytics a web-scale pipeline needs next to the crawl: grouping a
user's clickstream into sessions, and enriching events with the most
recent state row at-or-before each event time (the classic point-in-time
/ as-of join Spark has no built-in for).

Determinism contract (these feed the DuckDB oracle gate): every time
comparison happens on ``unix_micros`` INTEGERS, never on floats or
truncated seconds, and every window order has a total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(col):
    """Epoch-microsecond integer for TIMESTAMP or TIMESTAMP_NTZ input.
    unix_micros only accepts LTZ; the session timezone is pinned to UTC
    (session.py), so the NTZ→LTZ cast is deterministic and agrees with
    DuckDB's epoch_us on the same wall-clock value."""
    return F.unix_micros(col.cast("timestamp_ltz"))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               value_col: str = "value") -> DataFrame:
    """Gap-based sessionization: a user's event starts a NEW session when
    it arrives strictly more than ``gap_minutes`` after their previous
    event. Returns one row per session:
    (user_id, session_idx, session_start, session_end, n_events,
    sum_value) with session_idx numbered 1..k per user in time order.

    Plan: one shuffle on ``user_col`` shared by both windows (lag →
    session-start flag, running sum → session index) and the final
    groupBy — Catalyst reuses the single hash partitioning, so the whole
    operator is ONE exchange. Skew note: partitions are per-user; at
    100 TB a single pathological user (a bot) bounds one task at that
    user's event count — cap upstream or pre-split bots by (user, day)
    if that ever dominates.

    Spark's native ``F.session_window`` implements the same gap
    semantics for streaming aggregation (see streaming/frontier_stream);
    this window-function form is used on the batch/oracle path because
    its boundary rule (strictly-greater-than-gap starts a session) is
    bit-reproducible in ANSI SQL.
    """
    gap_us = gap_minutes * 60_000_000
    us = _micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(us).over(w)
    new_s = (prev.isNull() | (us - prev > gap_us)).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_idx = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(value_col).alias("value"),
    ).withColumn("session_idx", F.sum(new_s).over(wsum))
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: tuple[str, ...] = ("value",),
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: to each ``left`` row attach ``value_cols``
    from the most recent ``right`` row of the same ``key`` with
    ``right_ts <= left_ts`` (nulls when no such row) — the point-in-time
    enrichment DuckDB spells ``ASOF LEFT JOIN`` and Spark lacks.

    NOT a range join: a range/inequality join on (key, ts) is a
    BroadcastNestedLoop or O(n*m) range-bucket explosion at scale. This
    is the union + last-value-carry-forward plan: tag both inputs, union
    on (key, ts, side, payload), ONE window partitioned by key ordered
    by (ts, side) carrying the last non-null right payload forward, keep
    the left rows. One shuffle on the key, linear work, AQE-splittable
    partitions. Right rows at ts == left_ts DO match (right sorts before
    left on the tiebreak), matching ASOF's <= contract.
    """
    lcols = list(left.columns)
    r_struct_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + ">"
    )
    l = left.select(
        F.col(key).alias("_k"),
        _micros(F.col(left_ts)).alias("_us"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        _micros(F.col(right_ts)).alias("_us"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    # `_r` as the final key makes the pick among right rows sharing an
    # identical (key, ts) deterministic (max payload struct wins); ASOF
    # leaves that pathological tie engine-defined, so fixtures must not
    # rely on it — real event streams don't collide at the microsecond
    w = (
        Window.partitionBy("_k")
        .orderBy("_us", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "_rv", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def window_rollup(events: DataFrame, minutes: int = 60,
                  type_col: str = "event_type",
                  ts_col: str = "ts",
                  val_col: str = "value") -> DataFrame:
    """Tumbling-window rollup — the BATCH form of the streaming metrics
    aggregation (streaming/frontier_stream.py uses the same F.window
    semantics with a watermark): epoch-aligned windows of ``minutes``,
    count + exact-cent value sum per (window, type). One hash agg; the
    window start is a pure projection of ts so the shuffle key is
    (window_start, type) — never a per-event sort.

    Exactness: the value sum uses the integer-cent trick (floor(v·100 +
    0.5) longs) so the 2dp surface is addition-order-independent; the
    window start is exact integer floor division on epoch micros
    (matching DuckDB's epoch-aligned time_bucket).
    """
    cents = F.floor(F.col(val_col) * 100 + 0.5).cast("long")
    win = F.window(F.col(ts_col), f"{minutes} minutes")
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            win.getField("start").alias("window_start"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(cents) / 100.0, 2).alias("sum_value"),
        )
    )


def sliding_window_rollup(events: DataFrame, minutes: int = 60,
                          slide_minutes: int = 30,
                          type_col: str = "event_type",
                          ts_col: str = "ts") -> DataFrame:
    """Sliding (hopping) window counts — F.window with a slide: each
    event lands in window/slide overlapping windows (the replication
    factor is the constant window/slide, so data volume scales linearly,
    not with window width). Spark materializes the replication inside
    the window expression; the oracle replays it as an explicit
    unnest-over-offsets join, which is also the portable spelling for
    engines without native hopping windows."""
    if minutes % slide_minutes:
        raise ValueError("window must be a multiple of slide")
    win = F.window(F.col(ts_col), f"{minutes} minutes",
                   f"{slide_minutes} minutes")
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            win.getField("start").alias("window_start"),
            F.col(type_col).alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def window_anomalies(events: DataFrame, minutes: int = 60,
                     z_threshold: float = 3.0,
                     type_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """Volume-anomaly detection over the tumbling rollup — the crawl
    monitor's "did a host/type spike this hour" signal: flag windows
    whose event count sits more than ``z_threshold`` sample standard
    deviations above that type's mean window count.

    Determinism: mean and variance come from exact long sums
    (Σn, Σn², window count) per type — one tiny second agg over the
    already-rolled-up windows, broadcast back. The only floats are one
    sqrt and one compare built from identical exact-integer inputs on
    both engines. Types with < 2 windows have no sample stddev and are
    never flagged. Returns (window_start, event_type, n_events,
    z_score 4dp) for flagged windows.
    """
    win = F.window(F.col(ts_col), f"{minutes} minutes")
    counts = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            win.getField("start").alias("window_start"),
            F.col(type_col).alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    j = counts.join(F.broadcast(stats), "event_type")
    mean = F.col("s1").cast("double") / F.col("k")
    # sample variance from exact sums: (s2 - s1^2/k) / (k-1)
    var = (
        (F.col("s2").cast("double")
         - F.col("s1").cast("double") * F.col("s1") / F.col("k"))
        / (F.col("k") - 1)
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        j.filter((F.col("k") >= 2) & (F.sqrt(var) > 0)
                 & (z >= F.lit(z_threshold)))
        .select("window_start", "event_type", "n_events",
                F.round(z, 4).alias("z_score"))
    )
