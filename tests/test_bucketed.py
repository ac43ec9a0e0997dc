"""Bucketed-table co-location (sinks/bucketed.py): a join of two tables
bucketed on the same key plans with ZERO Exchange (the 100 TB win:
the shuffle is paid once at write time), and results stay correct."""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.plans.inspect import explain_str
from transitlog_hfp_sink_spark.sinks.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    signals = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("double").alias("quality"),
    )
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_signals_b")
    write_bucketed(docs, "t_docs_b", ["doc_id"], n_buckets=8)
    write_bucketed(signals, "t_signals_b", ["doc_id"], n_buckets=8)
    yield "t_docs_b", "t_signals_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_signals_b")


def test_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so the bucket co-location is what
        # eliminates the shuffle, not a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "doc_id")
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_agg_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_bucketed(spark, ta).groupBy("doc_id").agg(F.count("*").alias("n"))
    plan = explain_str(agg, "simple")
    assert "Exchange" not in plan
    assert agg.count() == 2000


def test_join_result_correct(spark, bucketed_pair):
    ta, tb = bucketed_pair
    joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "doc_id")
    got = joined.agg(
        F.count("*").alias("n"),
        F.sum("quality").cast("long").alias("sq"),
    ).collect()[0]
    assert got["n"] == 2000
    assert got["sq"] == sum(i % 100 for i in range(2000))


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    # control: the same join without bucketing needs Exchanges
    ta, _ = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.lit(1.0).alias("quality")
        )
        joined = read_bucketed(spark, ta).join(plain, "doc_id")
        assert "Exchange" in explain_str(joined, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
