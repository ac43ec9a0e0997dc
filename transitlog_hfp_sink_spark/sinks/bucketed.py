"""Bucketed-table storage — shuffle-free co-located joins and aggs.

At 100 TB the recurring cost in a curation pipeline is not one query but
the SAME join key being shuffled every run: documents joined to per-doc
signals (quality scores, dedup verdicts, PII profiles) on doc_id, or
vehicles to per-vehicle rollups. Hive-style bucketing pays that shuffle
ONCE at write time: both sides are hash-partitioned into the same number
of buckets on the join key and each bucket is sorted, so Catalyst plans
the join with zero Exchange on either side (and zero Sort when
sortBy matches the join key) — a per-bucket sort-merge join.

This is the parquet/catalog analogue of the reference's btree-indexed
row store (run/init.sql:78-85): the index work happens at write time,
reads get the cheap path. Rules that make the Exchange-free plan
actually appear (all asserted in tests/test_bucketed.py):
- both tables bucketed on the join key with the SAME bucket count;
- spark.sql.sources.bucketing.enabled (default true);
- spark.sql.autoBroadcastJoinThreshold=-1 or big tables, else Spark
  just broadcasts (fine too — the point is no shuffle).

`bucketBy` requires a managed/external TABLE (metastore bookkeeping of
the bucketing spec), not a bare path — hence saveAsTable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (+ optionally sorted) parquet table.

    n_buckets is a write-time contract: pick it so a bucket of the
    LARGER table stays ~100-500 MB at target scale (e.g. ~2048 for a
    100 TB fact table). Joining tables must agree on it.
    """
    sort_cols = sort_cols if sort_cols is not None else bucket_cols
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the bucketing spec rides along from the
    catalog, so downstream joins/aggs on the bucket key skip their
    Exchange."""
    return spark.table(table)
