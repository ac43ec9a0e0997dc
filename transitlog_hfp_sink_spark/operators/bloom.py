"""Bloom-filter membership prefilter — the no-false-negative set sketch
(Bloom 1970) that lets a 100 TB scan test "could this key be in that
set?" against a fixed-size broadcast artifact instead of the set itself.

Primary consumer here: benchmark decontamination
(operators/decontaminate.py). The benchmark's n-gram set can reach 10^7+
grams; broadcasting the gram STRINGS costs GBs, while the m-bit filter
is m/8 bytes regardless of gram length. Because a Bloom filter never
produces false negatives, prefilter + exact-verify returns exactly the
same contaminated set as the exact join — the filter only prunes work.

Representation: the filter is a DataFrame of SET BIT POSITIONS
(<= min(m, k * n_keys) rows), not a packed bitmap. That keeps build and
probe pure relational ops (explode + distinct; join + all-k-present),
broadcastable like any dimension table, and bit-for-bit replayable in
SQL. A packed binary bitmap would be 8x smaller but needs per-row bit
arithmetic at probe time; at m = 2^27 the position-set form is still
only ~0.5 GB worst-case and compresses far below that in practice.

Scale shape:
- build: one explode(k) + distinct over the KEYED side (the small side
  by construction) — one shuffle of at most k * n_keys rows, output
  <= m rows, persist/broadcast once.
- probe: explode(k) over DISTINCT probe keys, broadcast-join the
  position set, keep keys with all k positions present (min-over-k) —
  the probe side never shuffles its full width.
- hashes are md5-derived (the repo's engine-portable hash), so a SQL
  twin reproduces every position and verdict exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 5
DEFAULT_M = 1 << 14


def bloom_positions(
    item: Column, k: int = DEFAULT_K, m: int = DEFAULT_M, salt: str = "bloom"
) -> Column:
    """array<int> of the k bit positions for one key: position_j =
    md5('<salt><j>:<key>')[:8] as int, mod m (the cms_bucket recipe with
    a per-hash seed prefix)."""
    cols = []
    for j in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{j}:"), item)), 1, 8
            ),
            16,
            10,
        )
        cols.append(F.pmod(h.cast("bigint"), F.lit(m)).cast("int"))
    return F.array(*cols)


def bloom_build(
    df: DataFrame,
    col: str,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    salt: str = "bloom",
) -> DataFrame:
    """The filter: distinct set bit positions (pos int) over every key in
    df[col]."""
    return (
        df.select(F.col(col).cast("string").alias("__key"))
        .select(F.explode(bloom_positions(F.col("__key"), k, m, salt)).alias("pos"))
        .distinct()
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    salt: str = "bloom",
) -> DataFrame:
    """(col, might_contain boolean) for each DISTINCT probe key: true iff
    all k of the key's positions are set. No false negatives: every key
    that went into bloom_build comes back true."""
    cells = (
        probes.select(F.col(col).cast("string").alias("__key"))
        .distinct()
        .select(
            "__key",
            F.posexplode(bloom_positions(F.col("__key"), k, m, salt)).alias(
                "__j", "pos"
            ),
        )
    )
    hit = cells.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), on="pos", how="left"
    ).select("__key", F.coalesce(F.col("__set"), F.lit(0)).alias("__hit"))
    return hit.groupBy("__key").agg(
        (F.min("__hit") == 1).alias("might_contain")
    ).select(F.col("__key").alias(col), "might_contain")
