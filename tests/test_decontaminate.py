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
