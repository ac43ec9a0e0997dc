"""Deterministic, reproducible sampling for training-data pipelines.

Random sampling (df.sample / TABLESAMPLE) is useless for dataset curation
at 100 TB: re-runs must select the SAME rows (resumable jobs, auditable
datasets, cross-engine verification). Both operators here derive the
sampling decision from md5 of a stable key, so the selected set is a pure
function of the data — identical on Spark, DuckDB, or anything else with
md5 (which is exactly how the driver's oracle check verifies them).

Scale notes:
- hash_sample is a stateless per-row filter: no shuffle, pushes through
  the scan pipeline, trivially parallel at any cluster size.
- stratified_take is one window shuffle on the stratum key; the per-
  stratum ORDER BY md5 is a uniform random permutation (keyed, salted)
  so the cap takes a uniform sample of each stratum, not a biased head.
  Skewed strata are bounded by the cap itself (only n rows survive per
  stratum, and rank-beyond-cap rows are dropped map-side by the window's
  partial sort at scale with AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(key_col: str | Column, salt: str = "") -> Column:
    """Uniform 32-hex sampling key: md5(salt || key). Changing the salt
    yields an independent sample (e.g. train/validation splits)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def hash_sample(
    df: DataFrame, key_col: str, keep_below: str, salt: str = ""
) -> DataFrame:
    """Deterministic ~N% sample: keep rows whose sampling key is
    lexicographically below `keep_below` (a lowercase hex prefix).
    '40' keeps 64/256 = 25%; '0a' keeps 10/256 ~ 3.9%; 4-hex prefixes
    give 1/65536 granularity. Pure filter — no shuffle, no state."""
    return df.where(F.substring(sample_key(key_col, salt), 1, len(keep_below)) < keep_below)


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified cap: keep at most n rows per stratum,
    chosen by the md5 permutation (uniform within the stratum). The
    row_number tie-breaks on the key itself, so the result is total-order
    stable even under md5 collisions."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )
