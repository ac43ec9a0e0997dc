"""Trajectory similarity search (operators/trajsim.py): signature
determinism, planted-neighbor recovery, degenerate trajectories."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.trajsim import (
    trajectory_signatures,
    trajectory_topk,
)


def _mk_points(traj: dict[str, list[tuple[float, float]]]):
    rows = []
    for vid, pts in traj.items():
        for i, (x, y) in enumerate(pts):
            rows.append((vid, i, x, y))
    return rows


def _line(x0, y0, dx, dy, n):
    return [(x0 + i * dx, y0 + i * dy) for i in range(n)]


def test_planted_neighbor_recovered(spark):
    """Three parallel lines; the middle line's nearest trajectory is the
    closer of the two others, at every k."""
    traj = {
        "a": _line(0.0, 0.0, 1.0, 0.0, 20),
        "b": _line(0.0, 0.1, 1.0, 0.0, 20),   # close to a
        "c": _line(0.0, 5.0, 1.0, 0.0, 20),   # far
    }
    df = spark.createDataFrame(
        _mk_points(traj), "vid string, seq int, x double, y double"
    )
    sigs = trajectory_signatures(df, "vid", ("seq",), "x", "y", m=8)
    out = trajectory_topk(
        sigs, sigs.select(F.col("id").alias("query_id"), "sig"), k=2
    ).collect()
    top = {
        r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1
    }
    assert top == {"a": "b", "b": "a", "c": "b"}
    # distances: parallel lines offset by d have signature L2 = d*sqrt(8)
    d_ab = [r["dist"] for r in out if r["query_id"] == "a" and r["rank"] == 1][0]
    assert abs(d_ab - 0.1 * math.sqrt(8)) < 1e-6


def test_signature_partitioning_invariance(spark):
    """Same signature under any input row order/partitioning (the sort
    key is total)."""
    rng = random.Random(5)
    pts = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(37)]
    rows = [("v", i, x, y) for i, x, y in pts]
    df1 = spark.createDataFrame(rows, "vid string, seq int, x double, y double")
    df2 = spark.createDataFrame(
        rng.sample(rows, len(rows)), "vid string, seq int, x double, y double"
    ).repartition(7)
    s1 = trajectory_signatures(df1, "vid", ("seq",), "x", "y").collect()[0]
    s2 = trajectory_signatures(df2, "vid", ("seq",), "x", "y").collect()[0]
    assert s1["sig"] == s2["sig"]
    assert s1["n_points"] == 37
    # endpoints always sampled
    assert s1["sig"][0] == pts[0][1] and s1["sig"][1] == pts[0][2]
    assert s1["sig"][-2] == pts[-1][1] and s1["sig"][-1] == pts[-1][2]


def test_single_point_trajectory(spark):
    df = spark.createDataFrame(
        [("v", 0, 3.0, 4.0)], "vid string, seq int, x double, y double"
    )
    (row,) = trajectory_signatures(df, "vid", ("seq",), "x", "y", m=8).collect()
    assert row["sig"] == [3.0, 4.0] * 8
    assert row["n_points"] == 1


def test_topk_excludes_self_and_breaks_ties(spark):
    # two identical trajectories + one distinct: dist 0 pair, tie broken
    # by neighbor id, self excluded
    traj = {
        "a": _line(0.0, 0.0, 1.0, 1.0, 5),
        "b": _line(0.0, 0.0, 1.0, 1.0, 5),
        "c": _line(9.0, 9.0, 1.0, 1.0, 5),
    }
    df = spark.createDataFrame(
        _mk_points(traj), "vid string, seq int, x double, y double"
    )
    sigs = trajectory_signatures(df, "vid", ("seq",), "x", "y", m=4)
    out = trajectory_topk(
        sigs, sigs.select(F.col("id").alias("query_id"), "sig"), k=3
    ).collect()
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
    first_a = [r for r in out if r["query_id"] == "a" and r["rank"] == 1][0]
    assert first_a["neighbor_id"] == "b" and first_a["dist"] == 0.0
