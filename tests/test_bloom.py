"""Bloom filter (operators/bloom.py): no-false-negative guarantee,
deterministic verdicts, bounded size, forced false positives at tiny m,
and result-identity of Bloom-prefiltered decontamination."""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], "key string"
    ).cache()


@pytest.fixture(scope="module")
def outsiders(spark):
    return spark.createDataFrame(
        [(f"outsider-{i}",) for i in range(500)], "key string"
    ).cache()


def test_bloom_no_false_negatives(members, outsiders):
    filt = bloom_build(members, "key", k=5, m=1 << 14)
    probe = members.unionByName(outsiders)
    verdicts = {r["key"]: r["might_contain"]
                for r in bloom_might_contain(filt, probe, "key", k=5, m=1 << 14).collect()}
    for i in range(200):
        assert verdicts[f"member-{i}"], i  # the Bloom guarantee


def test_bloom_wide_filter_rejects_outsiders_here(members, outsiders):
    # 200 members x 5 hashes into 16384 bits -> ~6% occupancy; fp rate
    # ~(0.06)^5 ~ 1e-6. Deterministic dataset: pin that no outsider
    # passes (guards the position-derivation layout too)
    filt = bloom_build(members, "key", k=5, m=1 << 14)
    got = bloom_might_contain(filt, outsiders, "key", k=5, m=1 << 14)
    assert got.where(F.col("might_contain")).count() == 0


def test_bloom_tiny_m_forces_false_positives_never_negatives(members, outsiders):
    filt = bloom_build(members, "key", k=3, m=64)
    probe = members.unionByName(outsiders)
    verdicts = {r["key"]: r["might_contain"]
                for r in bloom_might_contain(filt, probe, "key", k=3, m=64).collect()}
    assert all(verdicts[f"member-{i}"] for i in range(200))
    # 64 bits cannot hold 200 keys: saturated filter -> outsiders pass
    assert any(verdicts[f"outsider-{i}"] for i in range(500))


def test_bloom_size_bounded_and_deterministic(members):
    filt = bloom_build(members, "key", k=5, m=1 << 14)
    n = filt.count()
    assert n <= min(1 << 14, 5 * 200)
    n2 = bloom_build(members.repartition(11), "key", k=5, m=1 << 14).count()
    assert n == n2
    rows = {r["pos"] for r in filt.collect()}
    assert all(0 <= p < (1 << 14) for p in rows)


def test_decontaminate_with_bloom_matches_exact(spark, sf_dir):
    from transitlog_hfp_sink_spark.operators.decontaminate import (
        contamination_gram_candidates,
        decontaminate,
        decontaminate_with_bloom,
    )
    from transitlog_hfp_sink_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    exact = {r["doc_id"] for r in
             decontaminate(corpus, bench, "text", "doc_id", n=3).select("doc_id").collect()}
    via_bloom = {r["doc_id"] for r in
                 decontaminate_with_bloom(corpus, bench, "text", "doc_id", n=3)
                 .select("doc_id").collect()}
    assert via_bloom == exact  # no false negatives -> identical result
    # the prefilter really prunes: candidate docs are a strict subset of
    # the corpus (on this data most docs carry no benchmark gram)
    n_corpus = corpus.count()
    n_cand = contamination_gram_candidates(
        corpus, bench, "text", "doc_id", n=3
    ).count()
    assert 0 < n_cand < n_corpus
