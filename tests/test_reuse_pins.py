"""Round-11 exchange-reuse pins are RESULT IDENTITIES.

The optimization round added always-true filters (and count-column
references) whose only purpose is to keep sibling plan branches
canonically equal so ReuseExchange folds their map work into one stage
(OPTIMIZATION_r11.md). These tests pin that the filtered formulations
return exactly what the unfiltered ones did, on fixtures that include
the edge rows the filters could plausibly touch (empty text, NULL text,
single-token docs, disjoint scoring corpus, empty corpus)."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the quick brown fox", "en"),
    (3, "pack my box with five dozen liquor jugs", "en"),
    (4, "", "fi"),
    (5, None, "fi"),
    (6, "word", "fi"),
    (7, "bussi kulkee linjalla kymmenen", "fi"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")


def rows(df):
    return sorted(map(repr, df.collect()))


def test_unigram_score_identity(spark, docs):
    from transitlog_hfp_sink_spark.operators.dedup import normalize_text
    from transitlog_hfp_sink_spark.operators.lm import lm_score, train_unigram_lm

    k = 0.5
    # reference: the pre-round-11 formulation, inline (no pins)
    toks = docs.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("term")
    )
    cnt = toks.groupBy("term").agg(F.count("*").alias("c"))
    stats = cnt.agg(F.sum("c").alias("total"), F.count("*").alias("v"))
    ref_lm = cnt.crossJoin(F.broadcast(stats)).select(
        "term", "c", "total", "v",
        F.log((F.col("c") + k) / (F.col("total") + k * F.col("v"))).alias("logp"),
    )
    ref_oov = ref_lm.select("total", "v").limit(1).select(
        F.log(k / (F.col("total") + k * F.col("v"))).alias("oov_logp")
    )
    t2 = docs.select(
        F.col("doc_id"),
        F.explode(F.split(normalize_text("text"), " ")).alias("term"),
    )
    ref = (
        t2.join(F.broadcast(ref_lm.select("term", "logp")), on="term", how="left")
        .crossJoin(F.broadcast(ref_oov))
        .select(
            "doc_id",
            (-F.coalesce(F.col("logp"), F.col("oov_logp")))
            .cast("decimal(20,10)").alias("nll"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("nll").cast("double") / F.count("*"), 4).alias("avg_nll"),
        )
    )
    got = lm_score(docs, train_unigram_lm(docs, "text", k=k), "text", "doc_id", k=k)
    assert rows(got) == rows(ref)


def test_unigram_score_empty_corpus(spark):
    from transitlog_hfp_sink_spark.operators.lm import lm_score, train_unigram_lm

    empty = spark.createDataFrame([], "doc_id bigint, text string, lang string")
    out = lm_score(empty, train_unigram_lm(empty, "text"), "text", "doc_id")
    assert out.collect() == []


def test_bigram_score_identity(spark, docs):
    from transitlog_hfp_sink_spark.operators.lm import (
        _doc_bigrams,
        bigram_score,
        train_bigram_lm,
    )
    from transitlog_hfp_sink_spark.operators.dedup import normalize_text

    bi = _doc_bigrams(docs, "text", "doc_id")
    ref_pairs = bi.groupBy("prev", "term").agg(F.count("*").alias("c2"))
    ref_hist = ref_pairs.groupBy("prev").agg(F.sum("c2").alias("c1h"))
    ref_vstat = (
        docs.select(F.explode(F.split(normalize_text("text"), " ")).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    pairs, hist, vstat = train_bigram_lm(docs, "text", "doc_id")
    assert rows(pairs) == rows(ref_pairs)
    assert rows(hist) == rows(ref_hist)
    assert rows(vstat) == rows(ref_vstat)
    got = bigram_score(docs, pairs, hist, vstat, "text", "doc_id")
    ref = bigram_score(docs, ref_pairs, ref_hist, ref_vstat, "text", "doc_id")
    assert rows(got) == rows(ref)


def test_nb_train_score_identity(spark, docs):
    from transitlog_hfp_sink_spark.operators.classifier import (
        _doc_features,
        nb_score,
        train_nb_classifier,
    )

    k, nf = 0.5, 4096
    feats = _doc_features(
        docs, "text", nf, "nbf", (F.col("lang") == "en").alias("__pos")
    )
    ref_cnt = feats.groupBy("feature").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0)).alias("c_neg"),
    )
    ref_tot = ref_cnt.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    )
    ref_weights = ref_cnt.crossJoin(F.broadcast(ref_tot)).select(
        "feature", "c_pos", "c_neg", "t_pos", "t_neg",
        (
            F.log((F.col("c_pos") + k) / (F.col("t_pos") + k * nf))
            - F.log((F.col("c_neg") + k) / (F.col("t_neg") + k * nf))
        ).alias("w"),
    )
    weights, prior = train_nb_classifier(docs, "text", "lang", "en")
    assert rows(weights) == rows(ref_weights)
    got = nb_score(docs, weights, prior)
    ref = nb_score(docs, ref_weights, prior)
    assert rows(got) == rows(ref)


def test_bm25_tf_pin_identity(spark, docs):
    """bm25_search's tf pin (tf > 0 AND dl IS NOT NULL) must drop no rows:
    compare against the direct DuckDB-twin shape computed inline."""
    from transitlog_hfp_sink_spark.operators.search import bm25_search, search_tokens

    queries = [(1, "quick fox"), (2, "liquor"), (3, "")]
    got = bm25_search(docs, queries, "text", "doc_id", topk=5)
    # reference: score every (query, doc) by hand via exploded tokens
    toks = docs.select(
        F.col("doc_id"), search_tokens("text").alias("__toks")
    )
    exploded = toks.select(
        "doc_id", F.size("__toks").alias("dl"),
        F.explode_outer("__toks").alias("term"),
    ).where(F.col("term").isNotNull())
    qdf = spark.createDataFrame(queries, "query_id int, qtext string")
    query_terms = qdf.select(
        "query_id",
        F.explode(F.array_distinct(search_tokens("qtext"))).alias("term"),
    )
    stats = toks.select("doc_id", F.size("__toks").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    matched = exploded.join(F.broadcast(query_terms), on="term")
    tf = matched.groupBy("query_id", "term", "doc_id").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__s",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (1.2 + 1.0))
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).cast("decimal(20,8)"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(F.sum("__s").alias("__score"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("__score").desc(), F.col("doc_id").asc()
    )
    ref = (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", "doc_id",
            F.round(F.col("__score").cast("double"), 4).alias("score"), "rank",
        )
    )
    assert rows(got) == rows(ref)
