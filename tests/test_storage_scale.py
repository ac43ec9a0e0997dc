"""Storage-layout scale features: bucketed co-located joins (the Q2
space-dimension story at cluster scale) and dynamic partition pruning
over the hypertable-equivalent layout."""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.plans.inspect import explain_str
from transitlog_hfp_sink_spark.schema import HFP_RAW_SCHEMA
from transitlog_hfp_sink_spark.transform import hfp_transform, with_partition_columns
from tests.hfp_fixtures import make_hfp_rows


@pytest.fixture(scope="module")
def vehicles_df(spark):
    return hfp_transform(
        spark.createDataFrame(make_hfp_rows(600), schema=HFP_RAW_SCHEMA)
    ).cache()


def test_bucketed_join_avoids_shuffle(spark, vehicles_df):
    """Two tables bucketed on unique_vehicle_id join WITHOUT a shuffle on
    either side — the bucketing contract that makes repeated per-vehicle
    joins cheap at 100 TB."""
    spark.sql("DROP TABLE IF EXISTS veh_bucketed")
    spark.sql("DROP TABLE IF EXISTS veh_stats_bucketed")
    (
        vehicles_df.write.mode("overwrite")
        .bucketBy(8, "unique_vehicle_id")
        .sortBy("unique_vehicle_id")
        .saveAsTable("veh_bucketed")
    )
    (
        vehicles_df.groupBy("unique_vehicle_id")
        .agg(F.count("*").alias("n_events"))
        .write.mode("overwrite")
        .bucketBy(8, "unique_vehicle_id")
        .saveAsTable("veh_stats_bucketed")
    )
    joined = spark.table("veh_bucketed").join(
        spark.table("veh_stats_bucketed"), "unique_vehicle_id"
    )
    # disable auto-broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = explain_str(
            spark.table("veh_bucketed").join(
                spark.table("veh_stats_bucketed"), "unique_vehicle_id"
            ),
            "simple",
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # bucketing removed both shuffles
    assert joined.count() == vehicles_df.count()
    spark.sql("DROP TABLE veh_bucketed")
    spark.sql("DROP TABLE veh_stats_bucketed")


def test_dynamic_partition_pruning(spark, vehicles_df, tmp_path):
    """A join against a filtered dim must prune fact partitions at runtime
    (DPP) — the mechanism that keeps dim-filtered scans off the full
    100 TB fact table."""
    fact_path = str(tmp_path / "fact")
    with_partition_columns(vehicles_df).write.partitionBy("received_hour").mode(
        "overwrite"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    hours = spark.createDataFrame(
        [(6, "six"), (7, "seven")], "received_hour int, label string"
    )
    q = fact.join(hours, "received_hour")
    plan = explain_str(q, "formatted")
    assert "dynamicpruning" in plan.lower() or "Partition" in plan
    n_all = fact.count()
    n_joined = q.count()
    assert 0 < n_joined < n_all
