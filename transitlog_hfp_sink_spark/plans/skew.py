"""Skew mitigation: salting utilities + AQE reliance, documented.

First line of defense is AQE (enabled in session.build_session): runtime
skew-join splitting and partition coalescing handle most hot keys with
zero code. Salting is the explicit fallback for the cases AQE cannot fix:
a single giant group in an aggregation, or a broadcast-ineligible join
with one pathological key (one vehicle producing billions of rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial agg on (keys + salt), then
    final merge on keys. The salt spreads a hot key over `salt` reducers;
    the second shuffle carries only |groups|*salt rows.

    aggs: {column: fn} with fn in {sum, count, min, max} (mergeable
    aggregates only — avg must be derived as sum/count by the caller).
    """
    mergeable = {"sum", "count", "min", "max"}
    if not set(aggs.values()) <= mergeable:
        raise ValueError(f"salted_agg supports {mergeable}")
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial_exprs = []
    for col, fn in aggs.items():
        e = getattr(F, fn)(col).alias(f"__p_{col}")
        partial_exprs.append(e)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = []
    for col, fn in aggs.items():
        merge_fn = "sum" if fn in ("count", "sum") else fn
        final_exprs.append(getattr(F, merge_fn)(f"__p_{col}").alias(f"{fn}_{col}"))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a salt that
    is stable for the duration of the join (derived from partition layout
    via monotonically_increasing_id, so NOT reproducible across runs —
    irrelevant for join results, which never depend on which salt bucket a
    row landed in); the (smaller) right side is replicated `salt` times so
    every salted left key finds its match. Use when the right side is too
    big to broadcast but small enough to replicate xsalt.

    Only left-preserving joins are valid: with how='right'/'full'/
    'right_semi' an unmatched right row would be emitted once PER REPLICA
    (salt duplicates). Those shapes should salt the other side or rely on
    AQE skew-join handling.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join replicates the right side; how={how!r} would "
            f"duplicate unmatched right rows. Allowed: {sorted(allowed)}"
        )
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, on=[on, "__salt"], how=how).drop("__salt")
    return out
