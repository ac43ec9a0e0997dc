"""Unigram LM scoring: probability axioms, OOV handling, ranking."""

import math

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.lm import (
    lm_score,
    oov_logp,
    train_unigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "the cat and the dog"),
        (4, "zyx qwv jjj"),  # rare tokens -> high NLL
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_probabilities_sum_to_one_minus_oov_mass(corpus, spark):
    lm = train_unigram_lm(corpus, k=0.5).collect()
    total = lm[0]["total"]
    v = lm[0]["v"]
    # sum of smoothed seen-token probs + 0 unseen = (total + 0.5v)/(total + 0.5v) - nothing
    s = sum(math.exp(r["logp"]) for r in lm)
    assert s == pytest.approx(total / (total + 0.5 * v) + 0.5 * v / (total + 0.5 * v))


def test_common_docs_score_lower_than_rare(corpus):
    lm = train_unigram_lm(corpus, k=0.5)
    scores = {r["doc_id"]: r["avg_nll"] for r in lm_score(corpus, lm).collect()}
    assert scores[4] > max(scores[1], scores[2], scores[3])


def test_oov_scoring_is_well_defined(spark, corpus):
    lm = train_unigram_lm(corpus, k=0.5)
    unseen = spark.createDataFrame(
        [(99, "completely novel wording here")], "doc_id long, text string"
    )
    out = lm_score(unseen, lm).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 4
    (oov,) = oov_logp(lm).collect()
    assert out[0]["avg_nll"] == pytest.approx(-oov["oov_logp"], abs=1e-3)


def test_score_deterministic_across_partitionings(corpus):
    lm = train_unigram_lm(corpus, k=0.5)
    a = {tuple(r) for r in lm_score(corpus, lm).collect()}
    b = {tuple(r) for r in lm_score(corpus.repartition(7), lm).collect()}
    assert a == b
