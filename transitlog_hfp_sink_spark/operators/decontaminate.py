"""Benchmark decontamination — cross-corpus n-gram overlap.

Every LLM training pipeline runs this before training: find (and drop)
training documents that share word n-grams with an evaluation/benchmark
set, so benchmark scores measure generalization, not memorization. This
is NOT dedup: the comparison is corpus-vs-benchmark (bipartite), the
predicate is "any shared n-gram" (containment), and the output feeds a
filter, not a cluster assignment.

Plan shape (the one that scales to a 100 TB corpus):
- Both sides explode to (id, distinct n-gram) rows via the shared
  dedup.word_shingles expression (normalize -> split -> zip_with chain,
  all codegen).
- The BENCHMARK side is broadcast: eval sets are small by construction
  (10^3..10^6 docs), so the corpus side joins map-side and NEVER
  shuffles its gram stream. The only shuffle is the (corpus_id,
  bench_id) count aggregation — keyed by doc ids, map-side combinable,
  output bounded by true contamination volume.
- With `broadcast_benchmark=False` (a benchmark too big to broadcast)
  it degrades to a shuffle equi-join on the gram string; AQE handles
  the hot-gram skew. At that size, prefer joining on xxhash64(gram)
  to halve shuffle width — kept off here so the result is exactly
  oracle-comparable (string grams, zero collision caveats).

No counterpart in the reference (HSLdevcom/transitlog-hfp-sink); part of
the training-data-pipeline family alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import shingle_frame


def _gram_rows(df: DataFrame, text_col: str, id_col: str, n: int, out_id: str) -> DataFrame:
    return shingle_frame(df, text_col, id_col, n).select(
        F.col("id").alias(out_id),
        F.explode(F.col("shingles")).alias("gram"),
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(corpus_id, bench_id, shared) for every corpus/benchmark doc pair
    sharing >= min_shared distinct word n-grams."""
    c = _gram_rows(corpus, text_col, id_col, n, "corpus_id")
    b = _gram_rows(benchmark, text_col, id_col, n, "bench_id")
    if broadcast_benchmark:
        b = F.broadcast(b)
    pairs = (
        c.join(b, "gram")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count("*").alias("shared"))
    )
    if min_shared > 1:
        pairs = pairs.where(F.col("shared") >= min_shared)
    return pairs


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The corpus minus every document contaminated against `benchmark`
    (one left-anti join on the contaminated id set). Documents too short
    to have any n-gram are trivially clean and are kept."""
    dirty = contamination_pairs(
        corpus, benchmark, text_col, id_col, n, min_shared, broadcast_benchmark
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(dirty, id_col, "left_anti")


def contamination_gram_candidates(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 5,
    m: int = 1 << 14,
) -> DataFrame:
    """Bloom-prefilter stage: (corpus_id, candidate_grams) — for each
    corpus doc, how many of its distinct n-grams MIGHT be benchmark
    grams per an m-bit/k-hash Bloom filter built over the benchmark's
    gram set (operators/bloom.py). Docs with zero candidate grams (the
    vast majority of a clean corpus) are omitted — they can skip the
    exact-verify join entirely.

    This is the 100 TB shape when the benchmark gram set is too wide to
    broadcast as strings: the broadcast artifact becomes the <= m-row
    position set. No false negatives, so prefilter + exact verify is
    result-identical to the exact join (decontaminate_with_bloom)."""
    from transitlog_hfp_sink_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    bgrams = _gram_rows(benchmark, text_col, id_col, n, "bench_id").select("gram")
    filt = bloom_build(bgrams, "gram", k=k, m=m)
    cgrams = _gram_rows(corpus, text_col, id_col, n, "corpus_id")
    verdicts = bloom_might_contain(filt, cgrams.select("gram"), "gram", k=k, m=m)
    return (
        cgrams.join(verdicts.where(F.col("might_contain")), on="gram")
        .groupBy("corpus_id")
        .agg(F.count("*").alias("candidate_grams"))
    )


def decontaminate_with_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
    k: int = 5,
    m: int = 1 << 14,
) -> DataFrame:
    """decontaminate(), but only Bloom-candidate docs enter the exact
    verify join. Result-identical to the exact path (no false
    negatives); the exact join's corpus side shrinks from every doc to
    the candidate tail (tests pin the equality)."""
    cand_ids = contamination_gram_candidates(
        corpus, benchmark, text_col, id_col, n, k, m
    ).select(F.col("corpus_id").alias(id_col))
    suspects = corpus.join(cand_ids, id_col, "left_semi")
    dirty = contamination_pairs(
        suspects, benchmark, text_col, id_col, n, min_shared
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(dirty, id_col, "left_anti")


def semantic_contamination_pairs(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC decontamination pairs: training docs whose EMBEDDING is
    near-identical to a benchmark doc's (paraphrased/reformatted leaks
    that share no n-gram — the case the gram overlap above cannot see;
    the two detectors compose, they don't compete).

    Bipartite version of similarity.embedding_neardup_pairs: both sides
    SRP-bucketed (map-only signatures), benchmark side broadcast (eval
    sets are small), candidates = equal-bucket pairs only, then exact
    cosine verify >= threshold. The corpus never self-joins and never
    shuffles: one broadcast-hash-join plus a filter.

    Returns (corpus_id, bench_id, cos_sim).
    """
    from transitlog_hfp_sink_spark.operators.similarity import (
        _as_double,
        cosine,
        rp_signature,
    )

    c = corpus_emb.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(vec_col).alias("__cv"),
        rp_signature(vec_col, dim, bits, seed).alias("__sig"),
    )
    b = bench_emb.select(
        F.col(id_col).alias("bench_id"),
        _as_double(vec_col).alias("__bv"),
        rp_signature(vec_col, dim, bits, seed).alias("__sig"),
    )
    return (
        c.join(F.broadcast(b), "__sig")
        .select(
            "corpus_id",
            "bench_id",
            F.round(cosine(F.col("__cv"), F.col("__bv")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows with NO semantic contamination hit (left-anti on the
    pair set) — the embedding-level companion of decontaminate().

    SRP bucketing is recall<1 by construction (a near-identical pair can
    straddle a bucket boundary); raise `bits` down / add rotations for
    stricter sweeps, or run the exact variant over a candidate superset
    when the benchmark is tiny. Recall-vs-exact is measured in
    tests/test_decontaminate.py."""
    hits = semantic_contamination_pairs(
        corpus_emb, bench_emb, threshold, dim, bits, seed, id_col, vec_col
    ).select("corpus_id").distinct()
    return corpus_emb.join(
        hits, corpus_emb[id_col] == hits["corpus_id"], "left_anti"
    )
