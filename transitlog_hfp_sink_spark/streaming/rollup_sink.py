"""Incrementally-maintained rollups — TimescaleDB continuous-aggregate
parity (the reference's data model exists to feed hourly/daily aggregates
over the vehicles hypertable; Timescale materializes them incrementally).

Spark-native formulation: a foreachBatch sink that keeps a partitioned
parquet aggregate table current by re-aggregating ONLY the hour partitions
the incoming micro-batch touches — merge existing partials with the
batch's partials and overwrite just those partitions (dynamic partition
overwrite). Cost per trigger is O(touched hours), not O(history), which is
what makes the aggregate maintainable when history is 100 TB.

Aggregates maintained as mergeable partials: count + decimal sum (avg is
derived at read time), so merging old+new partials is exact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.fs import path_exists

_DEC = "decimal(30,12)"


def _aggregate_partials(df: DataFrame, dims: list[str], value: str) -> DataFrame:
    return df.groupBy("bucket", *dims).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value).cast(_DEC)).alias("sum_value_dec"),
    )


@dataclass
class ContinuousRollupSink:
    """foreachBatch sink maintaining an hourly rollup table.

    path: rollup store (parquet, partitioned by bucket_date/bucket_hour).
    dims: extra group keys beside the time bucket.
    ts_col/value_col: event-time + measure in the incoming batch.
    """

    spark: SparkSession
    path: str
    ts_col: str
    value_col: str
    dims: list[str]
    #: above this many touched hour-buckets the sink stops materializing
    #: the bucket list on the driver and filters via a broadcast semi-join
    #: (a replay of a huge historical batch must not blow the driver)
    max_touched_list: int = 4096

    def _meta_path(self) -> str:
        return os.path.join(self.path, "_last_committed_batch")

    def _last_committed(self) -> int:
        try:
            with open(self._meta_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _touched_filter(self, touched: list) -> F.Column:
        """Partition-pruning filter for the touched buckets: equality on
        the PARTITION columns (bucket_date grouped with its hours), so the
        self-read lists only the touched hour directories instead of
        scanning the whole store.

        ``touched`` rows carry (d, h) computed JVM-SIDE with the same
        to_date/hour expressions that produce the partition columns —
        never derived from collected datetimes, whose Python-local-tz
        rendering diverges from the session tz under a non-UTC session
        (round-4 fix: that mismatch silently dropped existing partials at
        overwrite time under Europe/Helsinki)."""
        by_date: dict = {}
        for r in touched:
            by_date.setdefault(r["d"], []).append(r["h"])
        cond = F.lit(False)
        for d, hours in by_date.items():
            cond = cond | (
                (F.col("bucket_date") == F.lit(d))
                & F.col("bucket_hour").isin(sorted(set(hours)))
            )
        return cond

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # replay guard, step 1 (fast path): after a failure/restart,
        # Structured Streaming re-delivers the last uncommitted batch with
        # the SAME batch_id; skip ids at or below the high-water mark
        if batch_id <= self._last_committed():
            return
        batch_df.persist()
        prev_mode = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        try:
            batch = batch_df.withColumn(
                "bucket", F.date_trunc("hour", F.col(self.ts_col))
            )
            new_partials = _aggregate_partials(batch, self.dims, self.value_col)
            touched = (
                new_partials.select(
                    F.to_date("bucket").alias("d"), F.hour("bucket").alias("h")
                )
                .distinct()
                .limit(self.max_touched_list + 1)
                .collect()
            )
            if not touched:
                return
            merged = new_partials
            if path_exists(self.spark, self.path):
                store = self.spark.read.parquet(self.path)
                if len(touched) > self.max_touched_list:
                    # giant replay: no driver-side bucket list; restrict the
                    # store via a broadcast semi-join on the batch partials
                    existing = store.join(
                        F.broadcast(new_partials.select("bucket").distinct()),
                        on="bucket",
                        how="left_semi",
                    )
                else:
                    existing = store.where(self._touched_filter(touched))
                # replay guard, step 2 (crash-safe): the partition
                # overwrite below and the meta-file write are two steps; if
                # we crashed between them, the data already carries this
                # batch (every row written in a batch is stamped with
                # last_batch_id, and the partition overwrite commits as one
                # job) — merging again would double-count, so only bump the
                # high-water mark and stop.
                if "last_batch_id" in existing.columns:
                    prev_max = existing.agg(F.max("last_batch_id")).first()[0]
                    if prev_max is not None and prev_max >= batch_id:
                        with open(self._meta_path(), "w") as f:
                            f.write(str(batch_id))
                        return
                merged = (
                    existing.select("bucket", *self.dims, "n", "sum_value_dec")
                    .unionByName(new_partials)
                    .groupBy("bucket", *self.dims)
                    .agg(
                        F.sum("n").alias("n"),
                        F.sum("sum_value_dec").alias("sum_value_dec"),
                    )
                )
            out = (
                merged.withColumn("bucket_date", F.to_date("bucket"))
                .withColumn("bucket_hour", F.hour("bucket"))
                .withColumn("last_batch_id", F.lit(batch_id))
            )
            # overwrite ONLY the touched partitions. The read-then-overwrite
            # of the same path is safe ONLY under dynamic overwrite (file
            # deletion deferred to job commit); static mode would drop the
            # untouched partitions — hence set + restore around the write.
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            out.write.mode("overwrite").partitionBy("bucket_date", "bucket_hour").parquet(
                self.path
            )
            with open(self._meta_path(), "w") as f:
                f.write(str(batch_id))
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
            batch_df.unpersist()

    def read(self) -> DataFrame:
        """The user-facing aggregate view (avg derived from partials)."""
        df = self.spark.read.parquet(self.path)
        return df.select(
            "bucket",
            *self.dims,
            "n",
            F.col("sum_value_dec").cast("double").alias("sum_value"),
            (F.col("sum_value_dec").cast("double") / F.col("n")).alias("avg_value"),
        )

    def refresh(self, base: DataFrame, start: str, end: str) -> dict:
        """``refresh_continuous_aggregate(start, end)`` parity: recompute
        the hour buckets in [start, end) FROM THE BASE TABLE and overwrite
        exactly those partitions — the repair path for late rewrites or a
        corrupted range, O(range) not O(history). start/end are timestamp
        strings compared against the event time column.

        The recomputed partials replace (not merge with) whatever the
        store holds for the range, so a refresh after arbitrary store
        damage converges to the batch truth. Buckets inside the range
        with NO base rows are dropped (their partitions overwritten only
        if the range recompute yields rows for them — fully-empty buckets
        are removed via the retention-style delete below)."""
        from transitlog_hfp_sink_spark.sinks.retention import (
            drop_partitions_older_than,
        )

        for label, v in (("start", start), ("end", end)):
            tail = v.replace("T", " ")[13:]
            if tail.strip(":0 "):
                # TimescaleDB aligns refresh windows to bucket boundaries;
                # a mid-hour bound here would drop a whole hour partition
                # while recomputing only part of it — refuse instead
                raise ValueError(
                    f"{label}={v!r} is not on an hour boundary"
                )
        ts = F.col(self.ts_col)
        ts_type = dict(base.dtypes).get(self.ts_col, "timestamp")
        cast_to = ts_type if ts_type.startswith("timestamp") else "timestamp"
        lo, hi = F.lit(start).cast(cast_to), F.lit(end).cast(cast_to)
        ranged = base.where((ts >= lo) & (ts < hi)).withColumn(
            "bucket", F.date_trunc("hour", F.col(self.ts_col))
        )
        partials = _aggregate_partials(ranged, self.dims, self.value_col)
        out = (
            partials.withColumn("bucket_date", F.to_date("bucket"))
            .withColumn("bucket_hour", F.hour("bucket"))
            .withColumn("last_batch_id", F.lit(-1))
        )
        n_buckets = out.select("bucket").distinct().count()
        # drop every store partition inside the range first: dynamic
        # overwrite only replaces partitions present in the output, so a
        # bucket that lost ALL its base rows would otherwise survive stale
        if path_exists(self.spark, self.path):

            def _key(ts_str: str) -> tuple[str, int]:
                t = ts_str.replace("T", " ")
                hour = int(t[11:13]) if len(t) >= 13 else 0
                return t[:10], hour

            k_lo, k_hi = _key(start), _key(end)

            def _in_range(values: dict[str, str]) -> bool:
                d = values.get("bucket_date", "")
                h = values.get("bucket_hour", "")
                if not d or not h.isdigit():
                    return False
                return k_lo <= (d, int(h)) < k_hi

            report = drop_partitions_older_than(
                self.spark, self.path, older_than=_in_range
            )
            if report.get("failed"):
                # appending over a partition we failed to clear would
                # double-count; surface the problem instead
                raise RuntimeError(
                    f"refresh aborted: could not clear partitions "
                    f"{report['failed']}"
                )
        prev_mode = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        try:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            out.write.mode("append").partitionBy(
                "bucket_date", "bucket_hour"
            ).parquet(self.path)
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        return {"refreshed_buckets": n_buckets, "start": start, "end": end}
