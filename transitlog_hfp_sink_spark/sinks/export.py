"""Training-data export sink: deterministic sharded JSONL.

The tail of a curation pipeline hands data to a trainer, and trainers
read newline-delimited JSON shards, not parquet. The reference
(HSLdevcom/transitlog-hfp-sink) stops at its SQL sink; this is a
north-star extension shaped for the 100 TB case:

- shard assignment is CONTENT-keyed (md5 of the id, pack.shard_of), so
  it is stable across runs, partitionings, and engines — re-exporting
  after an upstream change moves only the rows that changed, and a
  trainer can resume per-shard;
- one Spark write: repartition into exactly n_shards output partitions
  keyed by the shard id, sort within each partition by the same md5
  permutation (deterministic line order), write
  ``part-SSSSS``-per-shard JSONL via the built-in json datasource —
  no driver-side iteration, no Python in the row path;
- shards are sized by count, not byte-balanced: the md5 key spreads
  rows uniformly, so shard skew is O(sqrt) — the same argument the
  pack operator relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.pack import shard_of


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "export",
    mode: str = "overwrite",
) -> None:
    """Write df as n_shards deterministic JSONL shards under path.

    Rows land in shard ``shard_of(id, n_shards, salt)`` regardless of
    input partitioning; within a shard, lines are ordered by the md5
    permutation of the id (ties on the id itself), so byte-identical
    inputs produce byte-identical shards. Layout: one ``__shard=K/``
    directory per non-empty shard (Hive-partitioned, so trainers can
    list/resume per shard), and because the frame is hash-repartitioned
    on the shard key first, every directory holds exactly ONE part file
    written by the one task that owned that shard.
    """
    keyed = df.withColumn("__shard", shard_of(id_col, n_shards, salt)).withColumn(
        "__ord", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    # lead the sort with the partition column: the file writer requires
    # rows clustered by partition value and would otherwise inject its
    # own (unstable) sort on __shard, scrambling the line order
    (
        keyed.repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__ord", id_col)
        .drop("__ord")
        .write.mode(mode)
        .partitionBy("__shard")
        .json(path)
    )


def read_jsonl_shards(spark, path: str) -> DataFrame:
    """Read an exported shard set back (schema inferred from the JSONL)."""
    return spark.read.json(path)
