"""Token-sequence packing: concat-and-chunk sharding for LLM training.

A training-data exporter concatenates the token stream of the whole
corpus and cuts it into fixed-size sequences (the GPT-style pack: a
document may span a sequence boundary; a sequence may hold many short
documents). The reference (HSLdevcom/transitlog-hfp-sink) has nothing
like it — this is a SURVEY §2.6 north-star operator.

Scale design: a single global running sum would funnel the corpus
through ONE window partition (driver-killer at 100 TB). Instead the
corpus is hashed into `n_shards` independent shards; each shard packs
its own token stream with a shard-local cumulative sum (window
partitioned BY SHARD — every shard is a separate task) and numbers its
own sequences. This is exactly how production exporters shard training
files; sequence ids are (shard, seq) pairs.

Everything is integer arithmetic over deterministic hashes — no floats
anywhere — so the DuckDB oracle matches bit-for-bit, including the
within-shard document order (md5 permutation, doc_id tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from transitlog_hfp_sink_spark.operators.textanalysis import whitespace_token_count


def shard_of(id_col: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard in [0, n_shards): first 8 md5 hex digits of the
    salted id, mod n_shards. (Not monotonically_increasing_id — stable
    across runs, partitionings, and engines.)"""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_shards)).cast("int")


def pack_chunks(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "pack",
    token_count: Column | None = None,
) -> DataFrame:
    """Assign every document its interval in the packed token stream.

    Within each shard, documents are laid head-to-tail in the md5-salt
    permutation order (reproducible global shuffle — correlated neighbors
    from the source ordering are broken up, which is the point of
    pre-training shuffle), then the stream is cut every `budget` tokens.

    Returns one row per document:
      shard, doc_id, n_tokens, start_pos  — token offset of the doc,
      first_seq / last_seq — the [first, last] training sequences the
      document lands in (last_seq > first_seq means it straddles cuts),
      offset_in_seq — position within first_seq.

    Plan shape: one map-side projection (token counts + shard), one
    shuffle into shards, a per-shard window cumsum. Shards are
    independent tasks — wall-clock scales with corpus/shards, no global
    serialization point.

    `token_count` overrides the default whitespace count with any
    deterministic per-doc width expression — e.g. a real subword count
    (operators/bpe.bpe_tokens_expr) so the packed layout matches what
    the training job will actually see.
    """
    width = (
        token_count
        if token_count is not None
        else whitespace_token_count(text_col)
    )
    toks = df.select(
        shard_of(id_col, n_shards, salt).alias("shard"),
        F.col(id_col).alias("doc_id"),
        width.cast("bigint").alias("n_tokens"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("__ord"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__ord"), F.col("doc_id"))
    cum = toks.withColumn("__cum", F.sum("n_tokens").over(w))
    # integer DIV, not `/`: Spark's `/` on bigints is DOUBLE division,
    # which silently loses exactness once cumulative sums pass 2^53 —
    # reachable on a 100 TB token stream.
    b = F.lit(budget)
    start = F.col("__cum") - F.col("n_tokens")
    return cum.select(
        "shard",
        "doc_id",
        "n_tokens",
        start.alias("start_pos"),
        F.expr(f"(__cum - n_tokens) DIV {budget}").alias("first_seq"),
        F.when(F.col("n_tokens") > 0, F.expr(f"(__cum - 1) DIV {budget}"))
        .otherwise(F.expr(f"(__cum - n_tokens) DIV {budget}"))
        .alias("last_seq"),
        F.pmod(start, b).alias("offset_in_seq"),
    )


def shard_manifest(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard export manifest: documents, tokens, and the number of
    full training sequences the shard yields (ceil(tokens/budget))."""
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    ).withColumn(
        # ceil via integer DIV (see pack_chunks: `/` would go double)
        "n_sequences",
        F.expr(f"(n_tokens + {budget} - 1) DIV {budget}"),
    )
