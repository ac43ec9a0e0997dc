"""Corpus profile (operators/profile.py): referee math, duplicate and
empty-doc accounting, plan shape (single exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.profile import corpus_profile

ROWS = [
    # src0: 4 docs, one exact duplicate pair (after normalization), one empty
    (0, "the quick brown fox jumps over the lazy dog today", "src0"),
    (1, "The quick brown fox jumps over the lazy dog today!", "src0"),
    (2, "a completely different document with several words", "src0"),
    (3, "", "src0"),
    # src1: 2 distinct docs
    (4, "short one", "src1"),
    (5, "another short document here", "src1"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string, source string")


def test_profile_referee(docs):
    out = {r["source"]: r.asDict() for r in corpus_profile(docs).collect()}
    s0, s1 = out["src0"], out["src1"]

    assert s0["n_docs"] == 4
    # tokens: 10 + 10 + 7 + 0
    assert s0["n_tokens"] == 10 + 10 + 7 + 0
    # docs 0 and 1 normalize to the same fingerprint -> 3 distinct of 4
    assert s0["dup_doc_rate"] == 0.25
    assert s0["empty_doc_rate"] == 0.25
    assert s1["n_docs"] == 2
    assert s1["dup_doc_rate"] == 0.0
    assert s1["empty_doc_rate"] == 0.0
    # exact interpolated percentiles over [0, 7, 10, 10]
    assert s0["p50_tokens"] == 8.5
    assert s0["p90_tokens"] == 10.0
    assert 0.0 <= s0["mean_quality"] <= 1.0
    assert 0.0 <= s0["quality_pass_rate"] <= 1.0


def test_profile_modes_agree_on_small_data(docs):
    exact = {r["source"]: r.asDict() for r in corpus_profile(docs).collect()}
    approx = {
        r["source"]: r.asDict()
        for r in corpus_profile(
            docs, exact_distinct=False, approx_percentiles=True
        ).collect()
    }
    for src in exact:
        # approx modes must agree on tiny groups (HLL exact at low card,
        # percentile_approx exact under the accuracy default)
        assert approx[src]["n_docs"] == exact[src]["n_docs"]
        assert approx[src]["dup_doc_rate"] == exact[src]["dup_doc_rate"]
        assert approx[src]["n_tokens"] == exact[src]["n_tokens"]


def test_profile_single_exchange(docs):
    plan = (
        corpus_profile(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # partial/final agg pair, one shuffle
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_profile_whole_corpus_group(spark, docs):
    (row,) = corpus_profile(docs, group_cols=()).collect()
    assert row["n_docs"] == 6
    assert row["n_tokens"] == 10 + 10 + 7 + 0 + 2 + 4
