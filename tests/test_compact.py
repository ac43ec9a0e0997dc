"""Small-file compaction (sinks/compact.py): file counts shrink to the
computed target, row content is bit-identical, untouched partitions'
files are left alone, empty/missing tables no-op."""

import os

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.sinks.compact import (
    compact_partitioned,
    partition_file_stats,
)


def _list_parquet_files(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


@pytest.fixture()
def fragmented_table(spark, tmp_path):
    """Two partitions; partition p=0 fragmented by 6 appends x 4 files,
    p=1 written once with a single file."""
    path = str(tmp_path / "frag")
    for i in range(6):
        (
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id"), F.lit(0).alias("p"))
            .repartition(4)
            .write.mode("append")
            .partitionBy("p")
            .parquet(path)
        )
    (
        spark.range(1000, 1100)
        .select(F.col("id"), F.lit(1).alias("p"))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("p")
        .parquet(path)
    )
    return path


def test_compact_reduces_files_and_preserves_rows(spark, fragmented_table):
    path = fragmented_table
    before = {r["id"] for r in spark.read.parquet(path).collect()}
    stats = {s["partition"]: s for s in partition_file_stats(spark, path)}
    assert stats["p=0"]["n_files"] == 24
    assert stats["p=1"]["n_files"] == 1

    report = compact_partitioned(spark, path, ["p"], max_files_per_partition=4)
    assert report["partitions_seen"] == 2
    assert report["partitions_compacted"] == 1
    assert report["files_before"] == 24
    # tiny bytes -> one target file
    assert report["files_after_target"] == 1

    after_stats = {s["partition"]: s for s in partition_file_stats(spark, path)}
    assert after_stats["p=0"]["n_files"] == 1
    assert after_stats["p=1"]["n_files"] == 1
    assert {r["id"] for r in spark.read.parquet(path).collect()} == before


def test_compact_leaves_small_partitions_untouched(spark, fragmented_table):
    path = fragmented_table
    p1_files_before = [f for f in _list_parquet_files(path) if "/p=1/" in f]
    compact_partitioned(spark, path, ["p"], max_files_per_partition=4)
    p1_files_after = [f for f in _list_parquet_files(path) if "/p=1/" in f]
    # same file paths -> partition p=1 was never rewritten
    assert p1_files_after == p1_files_before


def test_compact_noop_cases(spark, tmp_path):
    # missing table
    report = compact_partitioned(
        spark, str(tmp_path / "nope"), ["p"], max_files_per_partition=4
    )
    assert report == {
        "partitions_seen": 0,
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after_target": 0,
    }
    # already-compact table: nothing rewritten
    path = str(tmp_path / "ok")
    spark.range(50).select("id", F.lit(0).alias("p")).coalesce(1).write.partitionBy(
        "p"
    ).parquet(path)
    files_before = _list_parquet_files(path)
    report = compact_partitioned(spark, path, ["p"], max_files_per_partition=4)
    assert report["partitions_compacted"] == 0
    assert _list_parquet_files(path) == files_before


def test_compact_splits_by_target_bytes(spark, tmp_path):
    # force multiple output files: target_file_bytes tiny
    path = str(tmp_path / "split")
    for _ in range(3):
        spark.range(2000).select("id", F.lit(0).alias("p")).repartition(
            3
        ).write.mode("append").partitionBy("p").parquet(path)
    report = compact_partitioned(
        spark, path, ["p"], max_files_per_partition=2, target_file_bytes=8 * 1024
    )
    assert report["partitions_compacted"] == 1
    after = {s["partition"]: s for s in partition_file_stats(spark, path)}
    # got multiple files, fewer than before, content intact
    assert 1 < after["p=0"]["n_files"] < 9
    assert spark.read.parquet(path).count() == 6000
