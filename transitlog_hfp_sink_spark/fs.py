"""Filesystem helpers valid on every Hadoop-supported scheme.

The sinks that read-modify-overwrite a table (sinks/merge.py,
streaming/rollup_sink.py) need a "does the table exist yet" probe.
``os.path.exists`` only sees the driver's local filesystem — on the
actual 100 TB deployment targets (HDFS, S3A, GCS) it always returns
False, so the first-write branch would clobber an existing table.
Resolve existence through the table path's own Hadoop FileSystem
instead (the same API Spark's committers use).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """True if `path` exists on the filesystem its scheme selects
    (file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))
