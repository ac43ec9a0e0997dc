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


def test_dtw_referee_basics():
    from transitlog_hfp_sink_spark.operators.trajsim import dtw_distance_python

    a = [0.0, 0.0, 1.0, 0.0, 2.0, 0.0]
    assert dtw_distance_python(a, a) == 0.0
    # single far point vs line: sum of distances to every line point
    b = [0.0, 3.0]
    d = dtw_distance_python(a, b, band=8)
    assert abs(d - (3.0 + (1 + 9) ** 0.5 + (4 + 9) ** 0.5)) < 1e-9
    # symmetric
    assert dtw_distance_python(b, a, band=8) == d


def test_dtw_time_shift_beats_l2(spark):
    """The point of the refine stage: a time-SHIFTED copy of a zigzag is
    nearly identical under DTW but far under pointwise L2."""
    import math

    from transitlog_hfp_sink_spark.operators.trajsim import dtw_distance_python

    zig = [(float(i), float(i % 2) * 2.0) for i in range(16)]
    shifted = [(0.0, 0.0)] + zig[:-1]  # one-step lag
    straight = [(float(i), 1.0) for i in range(16)]
    flat = lambda p: [c for xy in p for c in xy]
    d_shift = dtw_distance_python(flat(zig), flat(shifted))
    d_straight = dtw_distance_python(flat(zig), flat(straight))
    assert d_shift < d_straight
    # pointwise L2 ranks them the other way (shift misaligns the zigzag)
    l2 = lambda a, b: math.sqrt(
        sum((x - y) ** 2 for x, y in zip(flat(a), flat(b)))
    )
    assert l2(zig, shifted) > l2(zig, straight)


def test_dtw_refine_pipeline(spark):
    """Coarse signature prune -> exact DTW re-rank, end to end, against
    the pure-Python referee."""
    from transitlog_hfp_sink_spark.operators.trajsim import (
        dtw_distance_python,
        dtw_refine,
        trajectory_points,
    )

    rng = random.Random(9)
    traj = {
        f"v{j}": [
            (float(i) + rng.uniform(-0.1, 0.1), rng.uniform(0, 2))
            for i in range(20)
        ]
        for j in range(6)
    }
    df = spark.createDataFrame(
        _mk_points(traj), "vid string, seq int, x double, y double"
    )
    sigs = trajectory_signatures(df, "vid", ("seq",), "x", "y", m=8)
    coarse = trajectory_topk(
        sigs, sigs.select(F.col("id").alias("query_id"), "sig"), k=4
    ).select("query_id", "neighbor_id")
    pts = trajectory_points(df, "vid", ("seq",), "x", "y", max_points=16)
    out = dtw_refine(coarse, pts, band=8, k=2).collect()

    pypts = {
        vid: [c for xy in p for c in xy]
        for vid, p in (
            (vid, [p[int(i * (len(p) - 1) // 15)] for i in range(16)])
            for vid, p in traj.items()
        )
    }
    for r in out:
        want = round(
            dtw_distance_python(pypts[r["query_id"]], pypts[r["neighbor_id"]], 8), 6
        )
        assert r["dtw_dist"] == want, (r, want)
    # ranks are 1..2 per query, deterministic
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2] for v in per_q.values())


def test_batch_kernel_matches_referee_rectangular():
    """_dtw_batch_numpy == dtw_distance_python bit-for-bit, including
    unequal sequence lengths and varied bands."""
    import random

    from transitlog_hfp_sink_spark.operators.trajsim import (
        _dtw_batch_numpy,
        dtw_distance_python,
    )

    rng = random.Random(17)
    for band in (1, 4, 8):
        pas, pbs = [], []
        for _ in range(20):
            na, nb = rng.randrange(1, 12), rng.randrange(1, 12)
            pas.append([rng.uniform(-5, 5) for _ in range(2 * na)])
            pbs.append([rng.uniform(-5, 5) for _ in range(2 * nb)])
        # group by shape as the kernel requires
        for pa, pb in zip(pas, pbs):
            (got,) = _dtw_batch_numpy([pa], [pb], band)
            want = dtw_distance_python(pa, pb, band)
            assert float(got) == want, (band, pa, pb)


def test_hot_key_million_point_trajectory_bounded(spark):
    """VERDICT r3 #4: a degenerate 1M-point trajectory (plus small
    normal keys) must build signatures with BOUNDED per-key aggregation
    state — the rank-filter formulation keeps <=m points per key past
    the window, so no executor holds a million-point array row. The
    sampled signature is checked against the closed-form expectation."""
    n = 1_000_000
    m = 8
    hot = spark.range(n).select(
        F.lit("hot").alias("unique_vehicle_id"),
        F.col("id").alias("tst"),
        (F.col("id") * 0.001).alias("lat"),
        (F.col("id") * -0.002).alias("long"),
    )
    cold = spark.range(10).select(
        F.lit("cold").alias("unique_vehicle_id"),
        F.col("id").alias("tst"),
        F.col("id").cast("double").alias("lat"),
        F.col("id").cast("double").alias("long"),
    )
    sigs = {
        r["id"]: r
        for r in trajectory_signatures(
            hot.unionByName(cold), "unique_vehicle_id", ("tst",), "lat", "long", m=m
        ).collect()
    }
    assert sigs["hot"]["n_points"] == n
    expected = []
    for i in range(m):
        r = (i * (n - 1)) // (m - 1)
        expected.extend([r * 0.001, r * -0.002])
    got = sigs["hot"]["sig"]
    assert len(got) == 2 * m
    for g, e in zip(got, expected):
        assert abs(g - e) < 1e-9
    assert sigs["cold"]["n_points"] == 10


def test_signature_queries_identity_and_reuse(spark):
    """signature_queries is a RESULT IDENTITY over the naive filter
    (round 12: the bench reuse-pin idiom moved into the library), and
    the pinned filter must not reach the scan — the plan's filter stays
    above the signature aggregation."""
    from transitlog_hfp_sink_spark.operators.trajsim import (
        signature_queries,
        trajectory_signatures,
    )

    pts = spark.range(200).select(
        F.concat(F.lit("v"), (F.col("id") % 7).cast("string")).alias(
            "unique_vehicle_id"
        ),
        F.col("id").alias("tst"),
        (F.col("id") * 0.01).alias("lat"),
        (F.col("id") * -0.02).alias("long"),
    )
    sigs = trajectory_signatures(
        pts, "unique_vehicle_id", ("tst",), "lat", "long", m=8
    )
    pred = F.substring("id", -1, 1).isin("0", "1")
    naive = sigs.where(pred).select(F.col("id").alias("query_id"), "sig")
    pinned = signature_queries(sigs, pred)
    assert sorted(map(repr, naive.collect())) == sorted(
        map(repr, pinned.collect())
    )
    # the pin keeps the filter above the aggregation: the optimized plan
    # must not push a size(sig)-bearing filter below the HashAggregate
    plan = pinned._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = plan.find("Aggregate")
    filt_pos = plan.find("Filter")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos < agg_pos
