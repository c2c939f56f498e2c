"""Sessionization and as-of join (operators/temporal.py)."""

import datetime as dt

from pyspark.sql import functions as F

from vyntr_spark.operators import temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: events at 0, 10, 50, 90 min → gaps 10/40/40 with
        # gap=30 → sessions {0,10}, {50}, {90}
        (1, _ts(0), 100, 1.0), (2, _ts(10), 100, 2.0),
        (3, _ts(50), 100, 4.0), (4, _ts(90), 100, 8.0),
        # user 2: single event
        (5, _ts(7), 200, 16.0),
        # user 1: an event EXACTLY 30min after 90 → same session
        # (strictly-greater-than starts a new one)
        (6, _ts(120), 100, 32.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {(r["user_id"], r["session_idx"]): r.asDict()
           for r in temporal.sessionize(df, gap_minutes=30).collect()}
    assert len(out) == 4
    s1 = out[(100, 1)]
    assert s1["n_events"] == 2 and s1["sum_value"] == 3.0
    assert s1["session_start"] == _ts(0) and s1["session_end"] == _ts(10)
    assert out[(100, 2)]["n_events"] == 1
    s3 = out[(100, 3)]
    assert s3["n_events"] == 2 and s3["sum_value"] == 40.0  # 90 + 120min
    assert out[(200, 1)]["n_events"] == 1


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    plan = (temporal.sessionize(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # windows + groupBy share one shuffle


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10), 1.0), (2, 10, _ts(30), 2.0), (3, 20, _ts(5), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(101, 10, _ts(0), 10.0), (102, 10, _ts(20), 20.0),
         (103, 10, _ts(30), 30.0),   # equal ts → must match row 2 (<=)
         (104, 30, _ts(0), 40.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {r["event_id"]: r.asDict()
           for r in temporal.asof_join(
               left, right, key="user_id",
               value_cols=("event_id", "value")).collect()}
    assert out[1]["event_id_asof"] == 101 and out[1]["value_asof"] == 10.0
    assert out[2]["event_id_asof"] == 103  # ts == left ts matches
    # user 20 has no right rows at all → nulls
    assert out[3]["event_id_asof"] is None and out[3]["value_asof"] is None
    # left columns pass through untouched
    assert out[2]["value"] == 2.0 and out[2]["ts"] == _ts(30)


def test_asof_join_no_nested_loop(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    plan = (temporal.asof_join(df, df, key="user_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_window_rollup_alignment_and_sums(spark):
    from vyntr_spark.operators.temporal import window_rollup

    rows = [
        (1, "2020-01-01 10:05:00", "a", 1.115),
        (2, "2020-01-01 10:59:59", "a", 2.0),
        (3, "2020-01-01 11:00:00", "a", 4.0),   # next window boundary
        (4, "2020-01-01 10:30:00", "b", 0.005), # cent rounding half-up
        (5, None, "a", 9.0),                    # null ts dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in window_rollup(df, minutes=60).collect()}
    assert got[("2020-01-01 10:00:00", "a")] == (2, 3.12)  # 1.115->1.12
    assert got[("2020-01-01 11:00:00", "a")] == (1, 4.0)
    assert got[("2020-01-01 10:00:00", "b")] == (1, 0.01)
    assert len(got) == 3


def test_sliding_window_replication(spark):
    import pyspark.sql.functions as F

    from vyntr_spark.operators.temporal import sliding_window_rollup

    df = spark.createDataFrame(
        [(1, "2020-01-01 10:15:00", "a")],
        "event_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(str(r["window_start"])
                 for r in sliding_window_rollup(df, 60, 30).collect())
    # one event -> exactly two 60-min windows, 30 min apart
    assert got == ["2020-01-01 09:30:00", "2020-01-01 10:00:00"]

    import pytest as _pt
    with _pt.raises(ValueError):
        sliding_window_rollup(df, 60, 45)


def test_window_anomalies_flags_spike(spark):
    import pyspark.sql.functions as F

    from vyntr_spark.operators.temporal import window_anomalies

    # 5 calm hours of 2 events + one 20-event spike hour for type "a";
    # type "b" has one window only -> never flaggable
    rows = []
    for h in range(5):
        rows += [(f"2020-01-01 {h:02d}:{m:02d}:00", "a") for m in (1, 2)]
    rows += [(f"2020-01-01 05:{m:02d}:00", "a") for m in range(20)]
    rows += [("2020-01-01 00:30:00", "b")]
    df = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = window_anomalies(df, minutes=60, z_threshold=2.0).collect()
    assert len(got) == 1
    r = got[0]
    assert (str(r["window_start"]), r["event_type"], r["n_events"]) == (
        "2020-01-01 05:00:00", "a", 20
    )
    assert r["z_score"] > 2.0
