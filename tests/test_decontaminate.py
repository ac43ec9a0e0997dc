"""Benchmark decontamination (operators/decontaminate.py): planted
overlaps, short-doc triviality, fuzz vs a Python n-gram reference, and
the broadcast plan shape."""

import random

from transitlog_hfp_sink_spark.operators.decontaminate import (
    contamination_pairs,
    decontaminate,
)
from transitlog_hfp_sink_spark.plans.inspect import explain_str


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_norm_words(text):
    import re

    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ") if t else []


def _py_grams(text, n):
    w = _py_norm_words(text)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def _py_pairs(corpus, bench, n, min_shared=1):
    out = {}
    for cid, ct in corpus:
        cg = _py_grams(ct, n)
        for bid, bt in bench:
            shared = len(cg & _py_grams(bt, n))
            if shared >= min_shared:
                out[(cid, bid)] = shared
    return out


def test_planted_contamination(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    corpus = _docs(
        spark,
        [
            (1, "lazy dogs avoid the quick brown fox entirely"),  # shares 2 trigrams
            (2, "completely unrelated sentence about spark plans"),
            (3, "fox jumps"),  # too short for any trigram -> trivially clean
        ],
    )
    pairs = {
        (r["corpus_id"], r["bench_id"]): r["shared"]
        for r in contamination_pairs(corpus, bench, n=3).collect()
    }
    assert pairs == {(1, 100): 2}  # 'the quick brown', 'quick brown fox'
    clean = sorted(r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect())
    assert clean == [2, 3]


def test_fuzz_vs_python(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25)))
    corpus_rows = [(i, mk()) for i in range(40)]
    bench_rows = [(1000 + i, mk()) for i in range(8)]
    got = {
        (r["corpus_id"], r["bench_id"]): r["shared"]
        for r in contamination_pairs(
            _docs(spark, corpus_rows), _docs(spark, bench_rows), n=3
        ).collect()
    }
    assert got == _py_pairs(corpus_rows, bench_rows, 3)


def test_min_shared_threshold(spark):
    bench = _docs(spark, [(9, "a b c d e f")])
    corpus = _docs(spark, [(1, "a b c d x y"), (2, "x a b c z")])
    # doc 1 shares 'a b c','b c d' (2); doc 2 shares 'a b c' (1)
    got = {
        r["corpus_id"]
        for r in contamination_pairs(corpus, bench, n=3, min_shared=2).collect()
    }
    assert got == {1}


def test_benchmark_side_broadcasts(spark):
    bench = _docs(spark, [(9, "a b c d e f")])
    corpus = _docs(spark, [(1, "a b c d x y")])
    plan = explain_str(contamination_pairs(corpus, bench, n=3), "simple")
    assert "BroadcastHashJoin" in plan


def test_semantic_contamination_planted(spark):
    """Paraphrase-leak detector: planted near-identical embeddings across
    corpus/benchmark are found; unrelated vectors are not; clean set
    excludes exactly the hit docs."""
    import random

    from transitlog_hfp_sink_spark.operators.decontaminate import (
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    rng = random.Random(3)
    dim = 64

    def vec():
        return [rng.gauss(0, 1) for _ in range(dim)]

    bench_vecs = [vec() for _ in range(5)]
    corpus = []
    for i in range(40):
        if i < 3:  # leaked: tiny perturbation of a benchmark vector
            v = [x + rng.gauss(0, 0.001) for x in bench_vecs[i]]
        else:
            v = vec()
        corpus.append((i, v))
    cdf = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    bdf = spark.createDataFrame(
        [(100 + i, v) for i, v in enumerate(bench_vecs)],
        "vec_id bigint, embedding array<double>",
    )
    pairs = semantic_contamination_pairs(cdf, bdf, threshold=0.99, dim=dim).collect()
    got = {(r["corpus_id"], r["bench_id"]) for r in pairs}
    assert got == {(0, 100), (1, 101), (2, 102)}
    assert all(r["cos_sim"] > 0.999 for r in pairs)

    clean = semantic_decontaminate(cdf, bdf, threshold=0.99, dim=dim)
    kept = {r["vec_id"] for r in clean.select("vec_id").collect()}
    assert kept == set(range(3, 40))
    # plan: no cartesian, benchmark broadcast
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
