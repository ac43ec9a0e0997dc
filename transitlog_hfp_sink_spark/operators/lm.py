"""Unigram language-model scoring: corpus-likelihood quality signals.

The heavier sibling of textanalysis.quality_score: train a unigram LM on
a reference corpus (token -> add-k-smoothed log-probability) and score
documents by average negative log-likelihood (cross-entropy, nats per
token). CCNet/KenLM-style pipelines use exactly this shape to rank web
text by "reference-corpus-likeness" and cut the tail; the unigram variant
keeps the whole computation in built-in expressions and makes the model
itself a DataFrame — trainable, persistable, broadcastable.

Scale shape:
- train: one explode + hash-agg over the reference corpus (map-side
  combine); the model is |vocab| rows — persist it like any dimension
  table.
- score: explode + join tokens->model + per-doc agg. The model is
  BROADCAST here (unigram vocabularies are MBs); if a giant vocab ever
  outgrows that, drop the hint and the join degrades gracefully to a
  shuffle join on the term key.
- exactness: per-token log-probs are deterministic doubles (identical
  inputs both engines), summed as DECIMAL(20,10) — order-independent,
  so the per-doc average is bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import normalize_text

#: add-k smoothing mass (Jeffreys-ish half count)
SMOOTH_K = 0.5


def train_unigram_lm(
    docs: DataFrame, text_col: str = "text", k: float = SMOOTH_K
) -> DataFrame:
    """(term, c, logp) over the reference corpus, add-k smoothed:
    p(term) = (c + k) / (total + k * |V|). The returned model carries the
    corpus constants on every row (total, v) so scoring needs no second
    aggregation pass over the corpus."""
    toks = docs.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("term")
    )
    cnt = toks.groupBy("term").agg(F.count("*").alias("c"))
    stats = cnt.agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    )
    return cnt.crossJoin(F.broadcast(stats)).select(
        "term",
        "c",
        "total",
        "v",
        F.log((F.col("c") + k) / (F.col("total") + k * F.col("v"))).alias("logp"),
    )


def oov_logp(lm: DataFrame, k: float = SMOOTH_K):
    """The smoothed log-prob of an unseen token, as a 1-row DataFrame
    (keeps the whole plan driver-free)."""
    return lm.select("total", "v").limit(1).select(
        F.log(k / (F.col("total") + k * F.col("v"))).alias("oov_logp")
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = SMOOTH_K,
) -> DataFrame:
    """Per-document cross-entropy under the model: (doc_id, n_tokens,
    avg_nll). Lower = more reference-like; rank and cut the tail for
    corpus filtering. Out-of-vocabulary tokens take the smoothed unseen
    mass, so scoring a disjoint corpus is well-defined."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    )
    joined = (
        toks.join(F.broadcast(lm.select("term", "logp")), on="term", how="left")
        .crossJoin(F.broadcast(oov_logp(lm, k)))
        .select(
            "doc_id",
            (-F.coalesce(F.col("logp"), F.col("oov_logp"))).cast(
                "decimal(20,10)"
            ).alias("nll"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.sum("nll").cast("double") / F.count("*"), 4
        ).alias("avg_nll"),
    )
