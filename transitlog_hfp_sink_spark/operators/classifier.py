"""Hashed-feature Naive-Bayes text classifier — the fastText-shaped
linear filter a large-corpus curation stack runs for quality gating and
domain/language routing (CCNet/RefinedWeb-style pipelines train exactly
this shape: a linear model over hashed bag-of-words features, applied to
every document to rank or route it).

Reference scope note: the reference engine (HSLdevcom/transitlog-hfp-sink,
QueueWriter.java) has no classifier surface — this module is part of the
beyond-reference training-data-pipeline family (SURVEY.md north-star
operators), built to the same cross-engine-exact standards as
operators/lm.py.

Scale shape:
- featurize: normalize -> split -> explode -> md5-hash each token into a
  FIXED-WIDTH feature space [0, num_features) (the hashing trick). Map
  side only; the model is at most num_features rows no matter how the
  vocabulary grows, so it broadcasts forever.
- train: one explode + hash-agg with conditional sums (map-side
  combine); weights are add-k-smoothed log-odds. The model is a
  DataFrame — trainable, persistable, broadcastable, inspectable.
- score: explode + broadcast join on the feature id + per-doc
  DECIMAL(20,10)-exact sum (order-independent, so results are
  bit-stable across engines and partitionings — the lm.py idiom).
- unseen buckets at scoring time take the smoothed zero-count log-odds
  (a corpus constant carried on every model row, like train_unigram_lm
  carries total/v), so scoring a disjoint corpus is well-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.functions.units import dec_units, units_double
from transitlog_hfp_sink_spark.operators.dedup import fixup_words, raw_words

#: add-k smoothing mass, matching operators/lm.py
SMOOTH_K = 0.5


def hashed_feature(term: Column | str, num_features: int, salt: str = "nbf") -> Column:
    """Deterministic feature id in [0, num_features): first 8 md5 hex
    digits of the salted token, mod the feature-space width (the
    engine-portable hash already used by operators/pack.py:shard_of)."""
    c = F.col(term) if isinstance(term, str) else term
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c)), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(num_features)).cast("int")


def _doc_features(
    docs: DataFrame, text_col: str, num_features: int, salt: str, *extra: Column
) -> DataFrame:
    """One row per token occurrence: (*extra, feature). Normalization is
    staged once per document (round 11: the raw-split -> fixup fast
    tokenizer, value-identical to split(normalize_text(c), " "));
    hashing is per token occurrence (bag semantics — repeated tokens
    count repeatedly, as in fastText)."""
    s1 = docs.select(*extra, raw_words(text_col).alias("__w0"))
    toks = s1.select(
        *[c for c in s1.columns if c != "__w0"],
        F.explode(fixup_words(F.col("__w0"))).alias("__term"),
    )
    return toks.select(
        *[c for c in toks.columns if c != "__term"],
        hashed_feature(F.col("__term"), num_features, salt).alias("feature"),
    )


def train_nb_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    num_features: int = 4096,
    k: float = SMOOTH_K,
    salt: str = "nbf",
) -> tuple[DataFrame, DataFrame]:
    """Train the binary model: returns (weights, prior).

    weights: (feature, c_pos, c_neg, t_pos, t_neg, w) — per hashed
    feature, token-occurrence counts under each class and the add-k
    log-odds weight
        w = ln((c_pos + k) / (t_pos + k*D)) - ln((c_neg + k) / (t_neg + k*D)).
    Corpus totals ride on every row so scoring needs no second pass.

    prior: 1 row, ln((n_pos_docs + k) / (n_neg_docs + k)).
    """
    feats = _doc_features(
        docs, text_col, num_features, salt,
        (F.col(label_col) == positive).alias("__pos"),
    )
    weights = nb_weights_from_features(feats, num_features, k)
    prior = nb_prior(docs, label_col, positive, k)
    return weights, prior


def nb_weights_from_features(
    feats: DataFrame, num_features: int = 4096, k: float = SMOOTH_K
) -> DataFrame:
    """The weights table over an ALREADY-DERIVED (__pos, feature) frame —
    the self-scoring seam (round 11, the lm.doc_tokens idiom): q_lm_score
    and the bench nb leg lazily localCheckpoint one hashed-feature frame
    carrying (doc_id, __pos, feature) and feed it to both training and
    scoring, so the corpus-wide tokenize+hash runs once per execution.
    Value-identical to the docs form: same features in, same counts."""
    # result-identity filter (feature = pmod(md5(..)) over never-NULL
    # tokens): nb_score's broadcast weights join infers IsNotNull(feature)
    # on this subtree; stating it here keeps the tot/weights/unseen_w
    # branches' exchanges canonically equal so the tokenize+hash partial
    # count runs once per execution (the lm.py reuse idiom, guide §2.4)
    feats = feats.select("__pos", "feature").where(F.col("feature").isNotNull())
    cnt = feats.groupBy("feature").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0)).alias("c_neg"),
    )
    tot = cnt.agg(F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "feature",
        "c_pos",
        "c_neg",
        "t_pos",
        "t_neg",
        (
            F.log((F.col("c_pos") + k) / (F.col("t_pos") + k * num_features))
            - F.log((F.col("c_neg") + k) / (F.col("t_neg") + k * num_features))
        ).alias("w"),
    )


def nb_prior(
    docs: DataFrame,
    label_col: str = "lang",
    positive: str = "en",
    k: float = SMOOTH_K,
) -> DataFrame:
    """The 1-row class prior (a label-column scan, no tokenize)."""
    return docs.agg(
        F.sum(F.when(F.col(label_col) == positive, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col(label_col) != positive, 1).otherwise(0)).alias("n_neg"),
    ).select(
        (F.log(F.col("n_pos") + k) - F.log(F.col("n_neg") + k)).alias("prior")
    )


def _unseen_w(weights: DataFrame, num_features: int, k: float) -> DataFrame:
    """Log-odds of a feature bucket with zero training occurrences, as a
    1-row DataFrame (keeps the scoring plan driver-free). The c_pos/c_neg
    filter is a result identity (conditional sums are never negative or
    NULL here) that pins this limit branch's partial aggregate to the
    model branch's shape so they share one exchange — the oov_logp reuse
    idiom (operators/lm.py, guide §2.4); without it the branch re-runs
    the tokenize+hash pass with a DISTINCT-shaped partial."""
    return weights.where(
        (F.col("c_pos") >= 0) & (F.col("c_neg") >= 0)
    ).select("t_pos", "t_neg").limit(1).select(
        (
            F.log(k / (F.col("t_pos") + k * num_features))
            - F.log(k / (F.col("t_neg") + k * num_features))
        ).alias("unseen_w")
    )


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 4096,
    k: float = SMOOTH_K,
    salt: str = "nbf",
) -> DataFrame:
    """Per-document class score: (doc_id, n_tokens, avg_logodds, pred).

    avg_logodds = (prior + sum of per-token-occurrence log-odds) /
    n_tokens, rounded to 4 digits; pred = avg_logodds >= 0 (positive
    class wins). The per-token weights are summed as DECIMAL(20,10), so
    the score is bit-stable across engines and partitionings."""
    feats = _doc_features(
        docs, text_col, num_features, salt, F.col(id_col).alias("doc_id")
    )
    return nb_score_from_features(feats, weights, prior, num_features, k)


def nb_score_from_features(
    feats: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    num_features: int = 4096,
    k: float = SMOOTH_K,
) -> DataFrame:
    """nb_score over an ALREADY-DERIVED (doc_id, feature) frame — the
    self-scoring seam (see nb_weights_from_features)."""
    feats = feats.select("doc_id", "feature")
    # decimal(20,10) HALF_UP per row (the value law, unchanged), summed
    # as exact bigint units of 1e-10 (functions/units.py, round 12):
    # per-row |log-odds| <= ~40 => <= 4e11 units, signed — a bigint sum
    # overflows only past ~2e7 worst-case tokens in one document,
    # ANSI-loud. Reconversion is an exact decimal divide + the same
    # single double cast; value-identical, smaller aggregate state.
    lo = F.coalesce(F.col("w"), F.col("unseen_w")).cast("decimal(20,10)")
    joined = (
        feats.join(F.broadcast(weights.select("feature", "w")), on="feature", how="left")
        .crossJoin(F.broadcast(_unseen_w(weights, num_features, k)))
        .select("doc_id", dec_units(lo, 10).alias("__u"))
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("__u").alias("__sum_u"),
    )
    scored = per_doc.crossJoin(F.broadcast(prior)).select(
        "doc_id",
        "n_tokens",
        F.round(
            (F.col("prior") + units_double(F.col("__sum_u"), 10))
            / F.col("n_tokens"),
            4,
        ).alias("avg_logodds"),
    )
    return scored.withColumn("pred", F.col("avg_logodds") >= 0)
