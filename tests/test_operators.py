"""Operator-level correctness: as-of join, range join, sessionization —
hand-computed expectations on tiny frames, then invariants on testdata."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.asof import asof_join
from transitlog_hfp_sink_spark.operators.range_join import range_join
from transitlog_hfp_sink_spark.operators.sessionize import sessionize, session_stats


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 100.0),
            ("A", ts("2024-01-01 10:05:00"), 101.0),
            ("A", ts("2024-01-01 10:10:00"), 102.0),
            ("B", ts("2024-01-01 10:03:00"), 200.0),
        ],
        "sym string, qts timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:04:59"), 1),  # -> 10:00 quote
            ("A", ts("2024-01-01 10:05:00"), 2),  # exact match -> 10:05
            ("A", ts("2024-01-01 10:30:00"), 3),  # -> 10:10
            ("A", ts("2024-01-01 09:00:00"), 4),  # before any quote -> NULL
            ("B", ts("2024-01-01 10:04:00"), 5),  # -> B 10:03
            ("C", ts("2024-01-01 10:00:00"), 6),  # no quotes for C -> NULL
        ],
        "sym string, tts timestamp, trade_id int",
    )


def test_asof_backward(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_time="tts", right_time="qts", direction="backward"
    )
    got = {r["trade_id"]: r["price_right"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: 200.0, 6: None}
    assert out.count() == trades.count()  # left-outer: every trade kept


def test_asof_forward(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_time="tts", right_time="qts", direction="forward"
    )
    got = {r["trade_id"]: r["price_right"] for r in out.collect()}
    assert got == {1: 101.0, 2: 101.0, 3: None, 4: 100.0, 5: None, 6: None}


def test_asof_no_python_eval(quotes, trades):
    from transitlog_hfp_sink_spark.plans.inspect import has_python_eval

    out = asof_join(trades, quotes, on="sym", left_time="tts", right_time="qts")
    assert not has_python_eval(out)


def test_range_join_keyless_bucketed(spark):
    """Keyless interval join must go through bucketing (no cartesian) and
    must agree with the naive cross-filter result."""
    points = spark.createDataFrame(
        [(i, ts(f"2024-01-0{1 + i % 5} 0{i % 9}:30:00")) for i in range(40)],
        "pid int, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
            (2, ts("2024-01-02 12:00:00"), ts("2024-01-04 00:00:00")),
            (3, ts("2024-01-03 00:00:00"), ts("2024-01-03 06:00:00")),
        ],
        "iid int, lo timestamp, hi timestamp",
    )
    got = range_join(points, intervals, "pts", "lo", "hi", bucket_seconds=3600)
    naive = points.crossJoin(intervals).where(
        (F.col("pts") >= F.col("lo")) & (F.col("pts") < F.col("hi"))
    )
    assert sorted(map(tuple, got.select("pid", "iid").collect())) == sorted(
        map(tuple, naive.select("pid", "iid").collect())
    )


def test_range_join_equi_key_plan(spark, sf_dir):
    """With an equi key, the range join must be a single hash join (no
    nested-loop) with the range as a join/filter condition."""
    from transitlog_hfp_sink_spark.plans.inspect import explain_str
    from transitlog_hfp_sink_spark.queries.timeseries import q_range_join

    plan = explain_str(q_range_join(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-01 10:29:59")),  # 1799s gap -> same session
        (1, ts("2024-01-01 11:00:00")),  # 1801s gap -> new session
        (2, ts("2024-01-01 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap_seconds=1800)
    sessions = {
        (r["user_id"], str(r["ts"])): r["session_id"] for r in out.collect()
    }
    assert sessions[(1, "2024-01-01 10:00:00")] == 1
    assert sessions[(1, "2024-01-01 10:29:59")] == 1
    assert sessions[(1, "2024-01-01 11:00:00")] == 2
    assert sessions[(2, "2024-01-01 10:00:00")] == 1


def test_session_stats_partition_invariants(spark, sf_dir):
    from transitlog_hfp_sink_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    stats = session_stats(ev, "user_id", "ts", 1800, value="value")
    # sessions cover every event exactly once
    assert stats.agg(F.sum("n_events")).first()[0] == ev.count()
    # session bounds are ordered
    bad = stats.where(F.col("session_end") < F.col("session_start"))
    assert bad.count() == 0
