"""Count-min sketch (CMS) — fixed-memory frequency estimation and
heavy-hitter detection over unbounded key domains (Cormode & Muthukrishnan
2005). The streaming/sub-linear sibling of an exact groupBy-count: the
sketch is a depth x width counter grid whose size NEVER grows with the
number of distinct keys, and point estimates only ever OVER-count
(est >= true, within eps*N with probability 1-delta for
width=ceil(e/eps), depth=ceil(ln(1/delta))).

Reference scope note: the reference engine (HSLdevcom/transitlog-hfp-sink)
has no sketch surface — this module belongs to the beyond-reference
training-data-pipeline family (hot-token / hot-key detection over a
100 TB corpus where the distinct-term table itself is too big to hold).

Scale shape:
- build: explode each row into its `depth` (seed, bucket) cells, then one
  hash-agg — map-side combine collapses everything to at most
  depth*width rows per partition before the (single) shuffle. The
  finished sketch is <= depth*width rows: persist or broadcast it.
- estimate: probe keys explode to depth cells, broadcast-join the
  sketch, min over seeds. Corpus-scale work never recurs.
- cross-engine exact: buckets come from md5 (the engine-portable hash
  used across the repo), so a SQL twin reproduces every counter and
  estimate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048


def cms_bucket(item: Column, seed: Column, width: int, salt: str = "cms") -> Column:
    """Row of hash functions: bucket_j(x) = md5('<salt><j>:<x>')[:8] as
    int, mod width. One md5 per (item, seed) — independent rows of the
    grid come from the seed prefix."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), seed.cast("string"), F.lit(":"), item)), 1, 8
        ),
        16,
        10,
    )
    return F.pmod(h.cast("bigint"), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch over one occurrence per input row: returns
    (seed, bucket, cnt) with at most depth*width rows. Missing cells are
    implicitly zero."""
    seeded = df.select(F.col(col).cast("string").alias("__item")).select(
        "__item",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    )
    return seeded.groupBy(
        "seed", cms_bucket(F.col("__item"), F.col("seed"), width, salt).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each distinct key in `keys`: est = min over the
    depth counters the key hashes into (absent cell = 0). Returns
    (key_col, est). Guarantee: est >= the key's true occurrence count in
    the sketched data — the min of counters each >= truth."""
    probes = (
        keys.select(F.col(key_col).cast("string").alias("__item"))
        .distinct()
        .select(
            "__item",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
        )
        .select(
            "__item",
            "seed",
            cms_bucket(F.col("__item"), F.col("seed"), width, salt).alias("bucket"),
        )
    )
    joined = probes.join(F.broadcast(cms), on=["seed", "bucket"], how="left").select(
        "__item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("__item").agg(F.min("cnt").alias("est")).select(
        F.col("__item").alias(key_col), "est"
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Keys whose CMS estimate reaches min_count: (key, est). Because the
    sketch never under-counts, this is a SUPERSET of the true heavy
    hitters — every key with true count >= min_count appears; collisions
    may add a bounded tail of false positives (filter them with one exact
    count over this small candidate set if needed). Candidates are
    enumerated from the data's distinct keys here; in a true streaming
    deployment the sketch is probed with an external candidate list
    instead, keeping state at depth*width forever."""
    cms = cms_build(df, col, depth, width, salt)
    est = cms_estimate(cms, df.select(col), col, depth, width, salt)
    return est.where(F.col("est") >= min_count)
