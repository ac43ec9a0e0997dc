"""Hashed-feature Naive-Bayes classifier (operators/classifier.py):
separation on planted vocabularies, exact weight math vs a Python
referee, unseen-bucket scoring, determinism, bounded model size."""

import math

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.classifier import (
    hashed_feature,
    nb_score,
    train_nb_classifier,
)

POS_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
NEG_WORDS = ["uno", "dos", "tres", "cuatro", "cinco"]


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        pos = i % 2 == 0
        vocab = POS_WORDS if pos else NEG_WORDS
        text = " ".join(rng.choice(vocab) for _ in range(30))
        rows.append((i, text, "en" if pos else "es"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_nb_separates_planted_vocabularies(corpus):
    weights, prior = train_nb_classifier(corpus, "text", "lang", "en", num_features=512)
    out = {r["doc_id"]: r for r in
           nb_score(corpus, weights, prior, num_features=512).collect()}
    for i in range(60):
        assert out[i]["pred"] == (i % 2 == 0), i
        # scores are decisively signed, not borderline
        assert abs(out[i]["avg_logodds"]) > 1.0


def test_nb_weights_match_python_referee(spark):
    rows = [
        (0, "aa aa bb", "en"),
        (1, "aa cc", "en"),
        (2, "bb bb dd", "fr"),
        (3, "dd", "fr"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    D, k = 64, 0.5
    weights, prior = train_nb_classifier(corpus, "text", "lang", "en", num_features=D, k=k)
    got = {r["feature"]: r for r in weights.collect()}

    import hashlib

    def feat(term):
        return int(hashlib.md5(("nbf" + term).encode()).hexdigest()[:8], 16) % D

    c_pos, c_neg = {}, {}
    for _, text, lang in rows:
        for t in text.split():
            f = feat(t)
            if lang == "en":
                c_pos[f] = c_pos.get(f, 0) + 1
            else:
                c_neg[f] = c_neg.get(f, 0) + 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    feats = set(c_pos) | set(c_neg)
    assert set(got) == feats
    for f in feats:
        w = (math.log((c_pos.get(f, 0) + k) / (t_pos + k * D))
             - math.log((c_neg.get(f, 0) + k) / (t_neg + k * D)))
        assert got[f]["w"] == pytest.approx(w, rel=1e-12)
        assert got[f]["c_pos"] == c_pos.get(f, 0)
        assert got[f]["c_neg"] == c_neg.get(f, 0)
    assert prior.first()["prior"] == pytest.approx(
        math.log(2 + k) - math.log(2 + k), rel=1e-12
    )


def test_nb_unseen_buckets_take_smoothed_mass(spark):
    train = spark.createDataFrame(
        [(0, "aa bb", "en"), (1, "cc dd", "fr")],
        "doc_id long, text string, lang string",
    )
    D, k = 32, 0.5
    weights, prior = train_nb_classifier(train, "text", "lang", "en", num_features=D, k=k)
    # a scoring corpus with entirely novel tokens: every bucket may be
    # unseen (modulo hash collisions with training buckets)
    score_docs = spark.createDataFrame(
        [(9, "zz yy xx ww")], "doc_id long, text string"
    )
    out = nb_score(score_docs, weights, prior, num_features=D, k=k).first()
    assert out["n_tokens"] == 4
    # with t_pos == t_neg the unseen log-odds is 0 and prior is 0, so any
    # unseen-heavy doc scores ~0 unless a collision hits a trained bucket
    import hashlib

    def feat(term):
        return int(hashlib.md5(("nbf" + term).encode()).hexdigest()[:8], 16) % D

    trained = {feat(t) for t in ["aa", "bb", "cc", "dd"]}
    novel = [feat(t) for t in ["zz", "yy", "xx", "ww"]]
    if not (set(novel) & trained):
        assert out["avg_logodds"] == pytest.approx(0.0, abs=1e-9)


def test_nb_score_deterministic_under_repartition(corpus):
    weights, prior = train_nb_classifier(corpus, "text", "lang", "en", num_features=512)
    a = {(r["doc_id"], r["avg_logodds"])
         for r in nb_score(corpus, weights, prior, num_features=512).collect()}
    b = {(r["doc_id"], r["avg_logodds"])
         for r in nb_score(corpus.repartition(13), weights, prior,
                           num_features=512).collect()}
    assert a == b


def test_nb_model_is_bounded_by_feature_space(corpus):
    D = 16  # tiny space forces collisions; model can never exceed D rows
    weights, _ = train_nb_classifier(corpus, "text", "lang", "en", num_features=D)
    assert weights.count() <= D
    feats = [r["feature"] for r in weights.collect()]
    assert all(0 <= f < D for f in feats)


def test_hashed_feature_range_and_stability(spark):
    df = spark.range(100).select(F.concat(F.lit("tok"), F.col("id")).alias("t"))
    out = df.select(hashed_feature("t", 37).alias("f")).collect()
    assert all(0 <= r["f"] < 37 for r in out)
    out2 = df.select(hashed_feature("t", 37).alias("f")).collect()
    assert [r["f"] for r in out] == [r["f"] for r in out2]
