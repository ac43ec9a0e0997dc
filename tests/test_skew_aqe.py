"""Skew utilities + AQE runtime behavior."""

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.plans.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark, sf_dir):
    from transitlog_hfp_sink_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["count_value"], r["sum_value"])
        for r in salted_agg(ev, ["event_type"], {"value": "count"}, salt=8)
        .join(
            salted_agg(ev, ["event_type"], {"value": "sum"}, salt=8),
            "event_type",
        )
        .collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6 * abs(plain[k][1])


def test_salted_join_equals_plain(spark):
    left = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )  # heavily skewed: 3 keys
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, tag string")
    plain = left.join(right, "k").groupBy("tag").count()
    salted = salted_join(left, right, on="k", salt=4).groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_enabled_and_coalesces(spark, sf_dir):
    """AQE must be on (the session contract for 100 TB) and visible in the
    post-execution plan of a shuffling query."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    from transitlog_hfp_sink_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").count()
    agg.collect()  # execute so AQE finalizes the plan
    final_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in final_plan
    assert "isFinalPlan=true" in final_plan
