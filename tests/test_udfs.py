"""UDF surface: scalar + grouped-agg pandas UDFs, DataFrame and SQL use."""

import math

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.functions.udfs import (
    geometric_mean,
    haversine_km,
    register_udfs,
)


def test_haversine_scalar_udf(spark):
    df = spark.createDataFrame(
        [(60.1699, 24.9384, 60.4518, 22.2666)],  # Helsinki -> Turku
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    km = df.select(haversine_km("lat1", "lon1", "lat2", "lon2").alias("km")).first()["km"]
    assert km == pytest.approx(151.0, abs=5.0)


def test_geometric_mean_grouped_agg(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 0.0)], "k string, v double"
    )
    got = {
        r["k"]: r["gm"]
        for r in df.groupBy("k").agg(geometric_mean("v").alias("gm")).collect()
    }
    assert got["a"] == pytest.approx(4.0)
    assert got["b"] == pytest.approx(3.0)  # non-positive values excluded


def test_udfs_registered_for_sql(spark, sf_dir):
    register_udfs(spark)
    from transitlog_hfp_sink_spark.sources.files import read_table

    read_table(spark, sf_dir, "events").createOrReplaceTempView("ev_udf")
    row = spark.sql(
        "SELECT event_type, geometric_mean(value) AS gm FROM ev_udf "
        "GROUP BY event_type ORDER BY event_type LIMIT 1"
    ).first()
    assert row["gm"] > 0


def test_haversine_symmetry_and_zero(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0, 10.0, 20.0), (0.0, 0.0, 0.0, 180.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = [r["km"] for r in df.select(haversine_km("lat1", "lon1", "lat2", "lon2").alias("km")).collect()]
    assert got[0] == pytest.approx(0.0, abs=1e-9)
    assert got[1] == pytest.approx(math.pi * 6371.0088, rel=1e-6)  # antipodal
