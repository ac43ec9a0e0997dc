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


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def test_bigram_model_matches_python(spark, corpus):
    from transitlog_hfp_sink_spark.operators.lm import bigram_score, train_bigram_lm

    pairs, hist, vstat = train_bigram_lm(corpus)
    # python referee over the same 4 docs
    texts = {r["doc_id"]: r["text"].split() for r in corpus.collect()}
    ref_pairs = {}
    for ws in texts.values():
        for a, b in zip(ws, ws[1:]):
            ref_pairs[(a, b)] = ref_pairs.get((a, b), 0) + 1
    got_pairs = {(r["prev"], r["term"]): r["c2"] for r in pairs.collect()}
    assert got_pairs == ref_pairs
    hist_ref = {}
    for (a, _), c in ref_pairs.items():
        hist_ref[a] = hist_ref.get(a, 0) + c
    assert {r["prev"]: r["c1h"] for r in hist.collect()} == hist_ref
    v = vstat.collect()[0]["v"]
    assert v == len({w for ws in texts.values() for w in ws})
    # per-doc NLL referee
    out = {r["doc_id"]: r for r in
           bigram_score(corpus, pairs, hist, vstat, k=0.5).collect()}
    for did, ws in texts.items():
        bi = list(zip(ws, ws[1:]))
        if not bi:
            assert did not in out
            continue
        nll = [-math.log((ref_pairs[p] + 0.5) / (hist_ref[p[0]] + 0.5 * v)) for p in bi]
        assert out[did]["n_units"] == len(bi)
        assert out[did]["avg_nll"] == pytest.approx(sum(nll) / len(nll), abs=1e-3)


def test_bigram_conditionals_normalize(spark, corpus):
    """For every seen history, sum over the FULL vocab of p(t|prev) = 1."""
    from transitlog_hfp_sink_spark.operators.lm import train_bigram_lm

    pairs, hist, vstat = train_bigram_lm(corpus)
    v = vstat.collect()[0]["v"]
    hist_d = {r["prev"]: r["c1h"] for r in hist.collect()}
    by_prev = {}
    for r in pairs.collect():
        by_prev.setdefault(r["prev"], []).append(r["c2"])
    for prev, c2s in by_prev.items():
        seen = sum((c + 0.5) / (hist_d[prev] + 0.5 * v) for c in c2s)
        unseen = (v - len(c2s)) * 0.5 / (hist_d[prev] + 0.5 * v)
        assert seen + unseen == pytest.approx(1.0)


def test_bigram_oov_and_short_docs(spark, corpus):
    from transitlog_hfp_sink_spark.operators.lm import bigram_score, train_bigram_lm

    pairs, hist, vstat = train_bigram_lm(corpus)
    v = vstat.collect()[0]["v"]
    probe = spark.createDataFrame(
        [(90, "one"), (91, ""), (92, "unseen history tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           bigram_score(probe, pairs, hist, vstat, k=0.5).collect()}
    # <2-token docs have no bigram evidence: absent, not zero-scored
    assert 90 not in out and 91 not in out
    # fully-unseen pairs with unseen histories: -ln(k/(k*V)) = ln(V)
    assert out[92]["avg_nll"] == pytest.approx(math.log(v), abs=1e-3)


def test_update_unigram_lm_equals_full_retrain(spark):
    """Incremental count merge == full retrain over the merged corpus,
    and downstream scoring is identical."""
    from transitlog_hfp_sink_spark.operators.lm import (
        lm_score,
        train_unigram_lm,
        update_unigram_lm,
    )

    old = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a dog ate the bone")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(2, "the cat and the dog became friends")],
        "doc_id bigint, text string",
    )
    inc = update_unigram_lm(train_unigram_lm(old), batch)
    full = train_unigram_lm(old.unionByName(batch))

    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(inc) == key(full)

    score_docs = spark.createDataFrame(
        [(9, "the cat dog unseenword")], "doc_id bigint, text string"
    )
    assert key(lm_score(score_docs, inc)) == key(lm_score(score_docs, full))
