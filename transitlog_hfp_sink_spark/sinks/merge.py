"""Keyed upsert (MERGE) into a partitioned parquet table.

The reference sink is INSERT-only (QueueWriter.java:36-48) — correction
feeds, late re-sends, and dimension maintenance all need upsert
semantics downstream (TimescaleDB users reach for INSERT ... ON CONFLICT
DO UPDATE). Plain parquet has no MERGE, so this implements the
engine-side equivalent with the partition-targeted read-modify-overwrite
pattern proven by streaming/rollup_sink.py:

1. partition-prune the store to ONLY the partitions the update batch
   touches (driver list under a bound, broadcast semi-join above it);
2. anti-join those partitions' rows against the update keys (drop the
   old versions), union the new rows;
3. dynamic-partition-overwrite exactly the touched partitions — file
   deletion defers to job commit, so a mid-job crash leaves the old
   data in place (write-then-swap, never update-in-place).

Cost per call is O(touched partitions), not O(table) — the property
that keeps upserts usable when the table is 100 TB. Last-writer-wins
within a batch is resolved deterministically (greatest version column,
then arbitrary-but-stable key order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.fs import path_exists


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    version_col: str | None = None,
    max_touched_list: int = 4096,
    count_rows: bool = False,
) -> dict | None:
    """MERGE `updates` into the parquet table at `path`.

    key_cols: row identity (conflict target).
    partition_cols: the table's partitionBy layout; updates must carry
      them. A key's partition values must be stable across versions
      (enforced by the anti-join being within-partition only — same as
      hypertable chunks, where the partition key is part of identity).
    version_col: when several update rows share a key, the row with the
      GREATEST version wins; None keeps an arbitrary-but-deterministic
      single row per key (max of a stable row hash).
    count_rows: when True, return {"rows_upserted": n} — the POST-dedup
      row count actually merged (the number an ops report should print).
      The count reads the persisted `fresh`, not the raw source, so it
      costs one cached pass, not a recompute.
    """
    # no version column: order by a hash of the WHOLE row (hashing only
    # the key would tie for every conflicting row and leave the winner to
    # partition luck)
    dedup_order = (
        F.col(version_col).desc()
        if version_col
        else F.xxhash64(*updates.columns).asc()
    )
    w = Window.partitionBy(*key_cols).orderBy(
        dedup_order, *[F.col(c).asc() for c in key_cols]
    )
    fresh = (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # fresh feeds 2-4 actions below (touched collect, write, optional
    # count); without the persist each one re-runs the source read +
    # transform — a 3-4x I/O tax on what is by definition a bulk path
    fresh = fresh.persist()
    try:
        return _upsert_body(
            spark, path, fresh, key_cols, partition_cols,
            max_touched_list, count_rows,
        )
    finally:
        fresh.unpersist()


def _upsert_body(
    spark: SparkSession,
    path: str,
    fresh: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    max_touched_list: int,
    count_rows: bool,
) -> dict | None:
    stats = {"rows_upserted": fresh.count()} if count_rows else None
    if not path_exists(spark, path):
        fresh.write.partitionBy(*partition_cols).parquet(path)
        return stats
    store = spark.read.parquet(path)
    touched_df = fresh.select(*partition_cols).distinct()
    touched = touched_df.limit(max_touched_list + 1).collect()
    if not touched:
        # empty update batch: nothing to merge — and proceeding would
        # build a WHERE over zero partition clauses (round-2 ADVICE)
        return {"rows_upserted": 0} if count_rows else None
    if len(touched) > max_touched_list:
        existing = store.join(
            F.broadcast(touched_df), on=partition_cols, how="left_semi"
        )
    else:
        cond = None
        for row in touched:
            clause = None
            for c in partition_cols:
                eq = F.col(c) == row[c]
                clause = eq if clause is None else (clause & eq)
            cond = clause if cond is None else (cond | clause)
        existing = store.where(cond)
    # NULL-SAFE key matching (NULLS NOT DISTINCT, matching
    # transform.dedup_vehicles' dropDuplicates semantics): a plain
    # equi-anti-join never matches a NULL key component, so a store row
    # with e.g. NULL journey_type would survive every merge AND be
    # re-inserted by fresh — duplicating once per backfill run (round-4
    # fix, caught by the app-backfill idempotency test).
    fresh_keys = fresh.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols]
    ).distinct()
    null_safe = None
    for c in key_cols:
        e = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        null_safe = e if null_safe is None else (null_safe & e)
    kept = existing.join(F.broadcast(fresh_keys), on=null_safe, how="left_anti")
    merged = kept.select(*fresh.columns).unionByName(fresh)
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        # the self-read-then-overwrite is safe ONLY under dynamic mode
        # (deletion defers to commit); see rollup_sink for the same rule
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return stats
