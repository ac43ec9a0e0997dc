"""Winnowing document fingerprints (MOSS-style rolling-hash selection).

Classic sequential formulation: hash every character k-gram with a rolling
hash, slide a window of w hashes, keep each window's minimum — the kept
minima are the document's fingerprints; near-duplicates share many
fingerprints even under edits/reordering.

Spark-native formulation (rolling-ness is a sequential-efficiency trick,
not a semantic requirement — the SELECTION is what matters):
  1. posexplode the normalized text into (doc, pos, char) rows;
  2. assemble k-grams with a windowed collect over the next k-1 rows
     (one shuffle on doc id, sorted by pos — the per-key window shape);
  3. hash each k-gram (xxhash64), take min over the w-gram window;
  4. distinct minima per doc = the fingerprint set.

Near-dup detection joins on individual fingerprints (equi-join — the
same blocking shape as MinHash bands) and scores pairs by shared count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import hash64, normalize_text


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fingerprint) rows: winnowed k-gram hash minima.

    Guarantees (from the winnowing paper): any match of length >= k+window-1
    between two documents shares at least one selected fingerprint.
    """
    chars = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalize_text(text_col), "")).alias("pos", "ch"),
    )
    wk = Window.partitionBy("id").orderBy("pos").rowsBetween(0, k - 1)
    grams = chars.select(
        "id",
        "pos",
        F.concat_ws("", F.collect_list("ch").over(wk)).alias("gram"),
    ).where(F.length("gram") == k)
    ww = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    minima = grams.select(
        "id",
        F.min(hash64(F.col("gram"), hash_fn)).over(ww).alias("fingerprint"),
    ).distinct()
    return minima


def winnow_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs scored by shared winnowed fingerprints.

    Plan: fingerprint equi-self-join (hot fingerprints are the skew risk —
    AQE splits them; a stop-fingerprint filter dropping the most common
    hashes is the content-level mitigation at corpus scale).
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, window, hash_fn)
    sizes = fp.groupBy("id").agg(F.count("*").alias("n_fp"))
    pairs = (
        fp.alias("a")
        .join(fp.alias("b"), on=[F.col("a.fingerprint") == F.col("b.fingerprint"),
                                 F.col("a.id") < F.col("b.id")])
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_fp_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_fp_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / F.least(F.col("n_fp_a"), F.col("n_fp_b")).cast("double"),
                6,
            ).alias("containment"),
        )
    )
