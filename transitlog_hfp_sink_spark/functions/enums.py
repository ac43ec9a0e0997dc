"""Enum-domain validation.

PostgreSQL enforces the four enum domains at insert time
(/root/reference/run/init.sql:21-24, cast at QueueWriter.java:45-46). Spark
has no enum type; the engine stores StringType and validates against the
frozen domains from ``schema.ENUM_DOMAINS``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.schema import ENUM_DOMAINS


def validate_enum(col: Column | str, domain: Iterable[str]) -> Column:
    """Pass the value through when in-domain, else NULL.

    CHECK-constraint-as-expression: an out-of-domain value degrades to NULL
    (consistent with the engine-wide try_cast policy) instead of failing the
    row the way a PG enum cast would.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*sorted(domain)), c).otherwise(F.lit(None).cast("string"))


def enum_violations(df: DataFrame) -> DataFrame:
    """Rows of (column, value, n) counting out-of-domain enum values —
    the observability half of the PG CHECK constraint."""
    parts = []
    for name, domain in ENUM_DOMAINS.items():
        if name not in df.columns:
            continue
        c = F.col(name)
        parts.append(
            df.where(c.isNotNull() & ~c.isin(*sorted(domain)))
            .groupBy(c.alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(name).alias("column"), "value", "n")
        )
    if not parts:
        raise ValueError("no enum columns present")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
