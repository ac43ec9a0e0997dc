"""Distributed as-of join (point-in-time join).

Spark has no native ASOF JOIN (DuckDB/Pandas do). The classic distributed
formulation — union both sides tagged, sort by (key, time), carry the last
right-side row forward with a window — costs ONE shuffle of (|L|+|R|) rows
keyed by the join key, versus the naive inequality-join which Catalyst
plans as a broadcast-nested-loop (quadratic, dead at scale).

At 100 TB: the shuffle partitions by key only; within a partition rows are
sorted by (key, time) — exactly a sort-merge pass. Skewed keys (one vehicle
with billions of rows) are handled by AQE skew splitting since the window
is keyed the same way as the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time (direction='backward'; 'forward' gives the
    earliest right row with right_time >= left_time) within the same key.

    Left rows with no match keep NULL right columns (left-outer semantics,
    matching DuckDB's LEFT ASOF JOIN used as the test oracle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    keys = [on] if isinstance(on, str) else list(on)

    right_cols = [c for c in right.columns if c not in keys]
    # tag and align the two sides on a common schema
    l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_cols).alias("__r"),
    )
    both = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left rows at equal time so an exact-time
        # match is visible to the left row (<= semantics)
        w = Window.partitionBy(*keys).orderBy(
            F.col("__t").asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        carried = F.last("__r", ignorenulls=True).over(w)
    else:
        w = Window.partitionBy(*keys).orderBy(
            F.col("__t").desc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        carried = F.last("__r", ignorenulls=True).over(w)

    matched = (
        both.withColumn("__match", carried)
        .where(F.col("__is_left") == 1)
        .select(
            F.col("__l.*"),
            *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
    return matched
