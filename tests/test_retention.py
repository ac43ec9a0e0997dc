"""Retention policy (sinks/retention.py): drop-chunks parity on the
partitioned parquet hypertable layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.sinks.retention import (
    drop_partitions_older_than,
    parse_partition,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "vehicles")
    df = spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d}", h)
            for i, (d, h) in enumerate(
                [(1, 0), (1, 23), (2, 5), (3, 12), (4, 1), (5, 9)]
            )
        ],
        "id bigint, received_date string, received_hour int",
    )
    df.write.partitionBy("received_date", "received_hour").parquet(path)
    return path


def test_parse_partition():
    assert parse_partition("received_date=2024-01-01/received_hour=3") == {
        "received_date": "2024-01-01",
        "received_hour": "3",
    }


def test_drop_by_date_cutoff(spark, table):
    before = spark.read.parquet(table).count()
    assert before == 6
    rep = drop_partitions_older_than(
        spark, table, cutoff={"received_date": "2024-01-03"}
    )
    assert rep["partitions_dropped"] == 3  # (1,0) (1,23) (2,5)
    assert sorted(
        parse_partition(p)["received_date"] for p in rep["dropped"]
    ) == ["2024-01-01", "2024-01-01", "2024-01-02"]
    left = spark.read.parquet(table)
    assert left.count() == 3
    # partition-column type inference reads the dir value back as a date
    assert str(left.agg(F.min("received_date")).collect()[0][0]) == "2024-01-03"


def test_dry_run_touches_nothing(spark, table):
    rep = drop_partitions_older_than(
        spark, table, cutoff={"received_date": "2024-01-03"}, dry_run=True
    )
    assert rep["partitions_dropped"] == 3 and rep["files_dropped"] >= 3
    assert spark.read.parquet(table).count() == 6


def test_idempotent_and_noop_cases(spark, table, tmp_path):
    kw = dict(cutoff={"received_date": "2024-01-03"})
    drop_partitions_older_than(spark, table, **kw)
    rep2 = drop_partitions_older_than(spark, table, **kw)
    assert rep2["partitions_dropped"] == 0
    # nothing older than an ancient cutoff
    rep3 = drop_partitions_older_than(
        spark, table, cutoff={"received_date": "2000-01-01"}
    )
    assert rep3["partitions_dropped"] == 0
    # missing table is a clean no-op
    rep4 = drop_partitions_older_than(
        spark, str(tmp_path / "absent"), cutoff={"received_date": "2024-01-01"}
    )
    assert rep4 == {
        "partitions_seen": 0,
        "partitions_dropped": 0,
        "files_dropped": 0,
        "bytes_dropped": 0,
        "dropped": [],
        "failed": [],
    }


def test_custom_predicate_hour_granularity(spark, table):
    rep = drop_partitions_older_than(
        spark,
        table,
        older_than=lambda v: (
            v.get("received_date", "9999") ,
            int(v.get("received_hour", 99)),
        )
        < ("2024-01-01", 23),
    )
    assert rep["partitions_dropped"] == 1  # only (2024-01-01, 0)
    left = spark.read.parquet(table)
    assert left.count() == 5
    assert (
        left.where(
            (F.col("received_date") == "2024-01-01") & (F.col("received_hour") == 0)
        ).count()
        == 0
    )


def test_cutoff_validation(spark, table):
    with pytest.raises(ValueError):
        drop_partitions_older_than(spark, table)
    with pytest.raises(ValueError):
        drop_partitions_older_than(
            spark, table, cutoff={"a": "b"}, older_than=lambda v: False
        )


def test_unknown_layout_never_dropped(spark, tmp_path):
    # partitions lacking the cutoff column are kept (fail-safe)
    path = str(tmp_path / "other")
    df = spark.range(4).withColumn("region", F.lit("eu"))
    df.write.partitionBy("region").parquet(path)
    rep = drop_partitions_older_than(
        spark, path, cutoff={"received_date": "2024-01-01"}
    )
    assert rep["partitions_dropped"] == 0
    assert os.path.exists(path)


def test_unpadded_hours_compare_numerically(spark, table):
    """The lexicographic footgun: hour 12 is NEWER than hour 2 even
    though "12" < "2" as strings — the cutoff must not drop it."""
    rep = drop_partitions_older_than(
        spark,
        table,
        cutoff={"received_date": "2024-01-03", "received_hour": "2"},
    )
    # day 1 and 2 partitions expire; (2024-01-03, 12) must survive
    assert all("received_date=2024-01-03" not in p for p in rep["dropped"])
    left = spark.read.parquet(table)
    assert (
        left.where(
            (F.col("received_date").cast("string") == "2024-01-03")
            & (F.col("received_hour") == 12)
        ).count()
        == 1
    )
    assert rep["failed"] == []


def test_mixed_numeric_forms_fail_safe(spark, table):
    """A non-numeric cutoff against numeric hour dirs never drops."""
    rep = drop_partitions_older_than(
        spark,
        table,
        cutoff={"received_date": "2024-01-03", "received_hour": "two"},
    )
    # date components still expire day 1/2; the mixed hour component can
    # only be reached on equal dates and then fails safe
    assert all("received_date=2024-01-03" not in p for p in rep["dropped"])
