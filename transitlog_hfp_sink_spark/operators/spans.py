"""Exact duplicated-substring detection — the window-level exact dedup
of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499): find every n-token window whose exact text
occurs MORE THAN ONCE across the corpus (including self-repetition
within one document), and measure per document how much of it sits
inside duplicated windows. Document-level exact/near dedup misses this
entirely — two distinct documents sharing one boilerplate paragraph are
not near-duplicates, but the paragraph still memorizes.

The reference paper builds a corpus-wide suffix array; a distributed
suffix array is not a Spark-shaped object, so this module implements the
standard relational equivalent used at corpus scale: fixed-length
sliding windows + hash aggregation, which finds exactly the duplicated
substrings of length >= n (a duplicated substring of length L >= n
duplicates all its L - n + 1 windows, so window coverage reconstructs
the span).

Scale shape:
- windows: staged normalize -> split -> shifted-slice zip (the
  operators/dedup.py gram machinery, one pass per row) + posexplode —
  corpus-token-count rows, map-only.
- counting: a SINGLE pass — count() over a window partitioned by the
  60-bit md5-prefix hash marks every occurrence with its corpus-wide
  multiplicity in one shuffle (the hash, not the window STRING,
  crosses the wire). A groupBy + join-back would recompute the whole
  window explosion on both sides of the join (measured 2x the cost at
  sf0.1), and a collect_list-based single pass would buffer a
  degenerate hyper-frequent window ("the the the ...") into one row;
  the analytic count has neither problem — sort-based, any
  multiplicity, one scan.
- per-doc coverage: duplicated windows partition cleanly by doc_id;
  interval union via lead() over (doc_id, start) — one keyed window,
  no driver state.

No counterpart in the reference engine; part of the training-data
pipeline family (SURVEY north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import (
    fixup_words,
    grams_from_words,
    raw_words,
)

#: md5 hex prefix length for window hashes: 15 digits = 60 bits, safely
#: inside BIGINT in both engines (conv() and '0x..'::BIGINT)
_HASH_HEX = 15


def doc_windows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """(doc_id, start, whash): every n-token window of the normalized
    token stream; start is the 0-based token offset, whash the 60-bit
    md5-prefix of the space-joined window text."""
    s1 = docs.select(
        F.col(id_col).alias("doc_id"), raw_words(text_col).alias("__w0")
    )
    s2 = s1.select("doc_id", fixup_words(F.col("__w0")).alias("__words"))
    grams = s2.select("doc_id", grams_from_words(F.col("__words"), n).alias("__g"))
    # posexplode_OUTER + null filter, not posexplode: the non-outer form
    # makes InferFiltersFromGenerate clone the ENTIRE gram-construction
    # expression into a size()>0 filter that sinks below the widening
    # exchange — the whole corpus re-derives its grams on one task
    # (measured 10x on this stage at sf0.1). The outer form infers no
    # filter; windowless docs yield one null row, dropped here.
    return (
        grams.select("doc_id", F.posexplode_outer("__g").alias("start", "__gram"))
        .where(F.col("__gram").isNotNull())
        .select(
            "doc_id",
            "start",
            F.conv(F.substring(F.md5("__gram"), 1, _HASH_HEX), 16, 10)
            .cast("bigint")
            .alias("whash"),
        )
    )


def duplicated_window_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """Per-document duplicated-substring coverage:
    (doc_id, n_tokens, n_windows, dup_windows, dup_tokens,
    dup_token_frac) — dup_tokens is the UNION length of the doc's
    duplicated [start, start+n) intervals (overlaps merged via lead()),
    dup_token_frac that length over the doc's token count. Every doc
    appears (zeros when nothing is duplicated), so the output is a
    complete per-doc signal a filter can join on."""
    w = doc_windows(docs, text_col, id_col, n)
    dw = (
        w.withColumn("__c", F.count("*").over(Window.partitionBy("whash")))
        .where(F.col("__c") >= 2)
        .select("doc_id", "start")
    )
    nxt = F.lead("start").over(Window.partitionBy("doc_id").orderBy("start"))
    contrib = F.when(nxt.isNull(), F.lit(n)).otherwise(
        F.least(nxt - F.col("start"), F.lit(n))
    )
    per_doc = (
        dw.withColumn("__contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dup_windows"),
            F.sum("__contrib").alias("dup_tokens"),
        )
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"), raw_words(text_col).alias("__w0")
    ).select(
        "doc_id",
        F.size(fixup_words(F.col("__w0"))).cast("bigint").alias("n_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        F.greatest(F.col("n_tokens") - n + 1, F.lit(0)).alias("n_windows"),
    )
    return totals.join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        "n_tokens",
        "n_windows",
        F.coalesce(F.col("dup_windows"), F.lit(0)).cast("bigint").alias("dup_windows"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
    )
