"""Gap-based sessionization (gaps-and-islands).

Streaming Spark has session windows (F.session_window); for batch the
idiomatic plan is lag + cumulative sum: one shuffle on the key, one sort
within partitions — the same cost envelope as any per-key windowing, AQE
handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append a ``session_id`` column: consecutive rows of the same key
    more than gap_seconds apart start a new session. session_id is
    deterministic: (key, ordinal-within-key)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(ts).asc())
    gap = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.lag(ts).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap_seconds: int = 1800,
    value: str | None = None,
) -> DataFrame:
    """Per-session aggregates: start/end, n_events, optional value sum.
    Reuses the sessionize shuffle — groupBy on the same keys is a
    map-side-combinable agg over already co-located data."""
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, keys, ts, gap_seconds)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value is not None:
        # decimal-sum idiom: exact & order-independent across engines
        aggs.append(
            F.round(F.sum(F.col(value).cast("decimal(30,12)")).cast("double"), 4).alias(
                "total_value"
            )
        )
    return s.groupBy(*keys, "session_id").agg(*aggs)
