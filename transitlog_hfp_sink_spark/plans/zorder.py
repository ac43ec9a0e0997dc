"""Z-order (Morton) clustering for multi-dimensional pruning.

SURVEY §2.5 Q3: the reference's btrees serve point/range lookups on
several independent columns; parquet only prunes on row-group min/max
stats, which a single-column sort optimizes for ONE column. Interleaving
the bits of two (rank-normalized) sort keys gives row groups that are
tight in BOTH dimensions — the same trick Delta's OPTIMIZE ZORDER BY
applies, here as a plain expression + sortWithinPartitions, no table
format required.

Pure integer bit-twiddling expressions (shiftleft/shiftright/AND on
Python-int bit positions), codegen-friendly, exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank16(col: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric column into [0, 65535] given its lo/hi bounds."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    x = (col.cast("double") - lo) / span
    return F.least(F.lit(65535), F.greatest(F.lit(0), (x * 65535).cast("bigint")))


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two pre-ranked integer columns (each < 2^bits)."""
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order of (col_a, col_b): range
    partition on the z-key, sort within partitions — every file covers a
    compact rectangle in (a, b) space, so min/max stats prune scans
    filtered on EITHER column."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).first()
    a = _rank16(F.col(col_a), F.lit(bounds["a_lo"]), F.lit(bounds["a_hi"]))
    b = _rank16(F.col(col_b), F.lit(bounds["b_lo"]), F.lit(bounds["b_hi"]))
    z = df.withColumn("__z", zorder_key(a, b))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
