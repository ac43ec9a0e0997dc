"""Grouped-map applyInPandas resampler: hand-checked interpolation."""

import datetime as dt

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.resample import resample_trajectories


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_linear_interpolation_on_grid(spark):
    rows = [
        ("v1", ts("2024-01-01 10:00:30"), 60.0, 24.0),
        ("v1", ts("2024-01-01 10:02:30"), 60.2, 24.4),  # linear in between
        ("v2", ts("2024-01-01 10:00:00"), 61.0, 25.0),  # single point -> dropped
    ]
    df = spark.createDataFrame(rows, "key string, tst timestamp, lat double, long double")
    out = resample_trajectories(df, "key", "tst", freq="60s")
    got = {(r["key"], str(r["grid_ts"])): (round(r["lat"], 6), round(r["long"], 6)) for r in out.collect()}
    # grid points 10:01 and 10:02 inside [10:00:30, 10:02:30]
    assert got[("v1", "2024-01-01 10:01:00")] == (60.05, 24.1)
    assert got[("v1", "2024-01-01 10:02:00")] == (60.15, 24.3)
    assert not any(k == "v2" for k, _ in got)


def test_resample_on_hfp_stream(spark, sf_dir):
    """End to end over the synthesized vehicles stream: every output row
    sits on the grid and inside its vehicle's observed time range."""
    from transitlog_hfp_sink_spark.queries.hfp import synth_vehicles

    v = synth_vehicles(spark, sf_dir).where(F.col("lat").isNotNull()).limit(2000)
    out = resample_trajectories(v, "unique_vehicle_id", "tst", freq="300s").cache()
    assert out.count() > 0
    off_grid = out.where(F.unix_timestamp("grid_ts") % 300 != 0)
    assert off_grid.count() == 0
    assert out.where(F.col("lat").isNull()).count() == 0
