"""Degenerate-input sweep: empty documents, whitespace/punct-only text,
docs shorter than the shingle width, and zero-norm embeddings must flow
through the operator family without ANSI arithmetic errors (at 100 TB a
single empty row must never kill the job) and with sane semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "", "en"),
    (1, "   ", "en"),
    (2, "!!! ... ???", "en"),
    (3, "one", "en"),
    (4, "two words", "en"),
    (5, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (6, "the quick brown fox jumps over the lazy dog again and again", "en"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")


def test_exact_dedup_degenerate(docs):
    from transitlog_hfp_sink_spark.operators.dedup import exact_dedup

    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    # empty/whitespace/punct-only docs normalize to '' -> one group of 3
    assert out[0] == 3
    assert out[5] == 2


def test_minhash_short_docs_drop_out(docs):
    from transitlog_hfp_sink_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    # shingle_n=3: docs 3/4 have no trigrams, 0/1/2 normalize to ''
    sigs = minhash_signatures(docs, shingle_n=3, num_perm=16)
    ids = {r["id"] for r in sigs.select("id").collect()}
    assert ids == {5, 6}
    pairs = minhash_lsh_pairs(
        docs, num_perm=16, bands=4, shingle_n=3, threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(5, 6)}


def test_ngram_jaccard_empty_shingles_no_crash(docs):
    from transitlog_hfp_sink_spark.operators.dedup import ngram_jaccard_pairs

    # full cross-pairing incl. docs with [] shingles: the 0/0 guard must
    # report jaccard 0.0 instead of raising DIVIDE_BY_ZERO
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert by_pair[(3, 4)] == 0.0  # both empty shingle sets
    assert by_pair[(5, 6)] == 1.0


def test_simhash_fingerprints_degenerate(docs):
    from transitlog_hfp_sink_spark.operators.dedup import simhash_near_dups

    out = simhash_near_dups(docs, bits=16, band_bits=4, shingle_n=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(5, 6)}


def test_text_quality_degenerate(docs):
    from transitlog_hfp_sink_spark.operators.textanalysis import analyze_documents

    rows = {r["doc_id"]: r.asDict() for r in analyze_documents(docs).collect()}
    assert len(rows) == len(DOCS)
    assert rows[0]["punct_ratio"] == 0.0  # empty doc: guarded, not an error
    assert rows[2]["punct_ratio"] > 0.5
    for r in rows.values():
        assert r["quality"] is not None


def test_bpe_encode_degenerate(spark, docs):
    from transitlog_hfp_sink_spark.operators.bpe import bpe_encode_expr, bpe_train

    merges = bpe_train([t for _, t, _ in DOCS], num_merges=8)
    out = {r["id"]: r for r in bpe_encode_expr(docs, merges).collect()}
    assert out[0]["n_tokens"] == 0
    assert out[1]["n_tokens"] == 0
    assert out[3]["n_tokens"] >= 1


def test_cosine_zero_norm_vectors(spark):
    from transitlog_hfp_sink_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 0.0, 0.0]),  # zero vector: cos := 0.0, no crash
            (2, [1.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, q, k=2).collect()
    zero_rows = [r for r in out if r["query_id"] == 1 or r["neighbor_id"] == 1]
    assert zero_rows and all(r["cos_sim"] == 0.0 for r in zero_rows)


def test_pack_zero_token_docs(spark, docs):
    from transitlog_hfp_sink_spark.operators.pack import pack_chunks

    out = {r["doc_id"]: r for r in pack_chunks(docs, budget=8).collect()}
    assert len(out) == len(DOCS)
    # blank docs are ZERO tokens wide — no phantom budget unit from
    # split('') == [''] — and hence span no sequence boundary
    for i in (0, 1):
        assert out[i]["n_tokens"] == 0
        assert out[i]["first_seq"] == out[i]["last_seq"]
    assert out[3]["n_tokens"] == 1
    assert out[5]["n_tokens"] == 12
