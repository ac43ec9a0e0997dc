"""Time-bucket rollups — the hypertable/continuous-aggregate workload.

TimescaleDB's time_bucket over 1-hour chunks (init.sql:70-73) maps to
date_trunc grouping; on the partitioned parquet layout the partition
columns (received_date, received_hour) make the groupBy align with the
physical layout, so the shuffle is small (partial aggregation happens
map-side within each hour-partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(col: str, width: str = "hour") -> Column:
    """TimescaleDB time_bucket equivalent for calendar widths."""
    return F.date_trunc(width, F.col(col)).alias(f"bucket_{width}")


def hourly_rollup(
    df: DataFrame,
    ts: str,
    dims: list[str],
    value: str | None = None,
    width: str = "hour",
) -> DataFrame:
    aggs = [F.count("*").alias("n")]
    if value is not None:
        aggs += [
            F.round(F.sum(value), 4).alias("sum_value"),
            F.round(F.avg(value), 4).alias("avg_value"),
        ]
    return df.groupBy(time_bucket(ts, width).alias("bucket"), *dims).agg(*aggs)
