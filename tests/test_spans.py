"""Duplicated-substring detection (operators/spans.py): planted shared
paragraphs, self-repetition, interval-union coverage vs a Python
referee, short-doc edges, determinism."""

import hashlib

import pytest

from transitlog_hfp_sink_spark.operators.spans import (
    doc_windows,
    duplicated_window_stats,
)

PARA = "the quick brown fox jumps over the lazy dog again and again tonight"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # docs 0 and 1 share PARA (13 tokens) inside distinct text
        (0, "unique preamble zero " + PARA + " unique tail zero here now"),
        (1, "totally different opening words " + PARA + " and other closing words"),
        # doc 2: self-repeats an 8+ token phrase twice
        (2, "one two three four five six seven eight nine ten "
            "one two three four five six seven eight different ending"),
        # doc 3: fully unique, long enough to have windows
        (3, "completely unrelated sentence with many distinct tokens "
            "that never repeat anywhere in this corpus at all"),
        # doc 4: too short for any 8-token window
        (4, "just five little words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _norm_words(text):
    import re

    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return [w for w in re.sub(r"\s+", " ", t).strip().split(" ")]


def _referee(rows, n=8):
    # python reimplementation: window hash counts -> dup starts -> union
    from collections import Counter

    wins = {}
    for did, text in rows:
        words = _norm_words(text)
        wins[did] = [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]
    counts = Counter(w for ws in wins.values() for w in ws)
    out = {}
    for did, text in rows:
        words = _norm_words(text)
        starts = [i for i, w in enumerate(wins[did]) if counts[w] >= 2]
        covered = set()
        for s in starts:
            covered.update(range(s, s + n))
        out[did] = (len(words), len(starts), len(covered))
    return out


def test_span_stats_match_python_referee(corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = _referee(rows, n=8)
    got = {r["doc_id"]: r for r in
           duplicated_window_stats(corpus, n=8).collect()}
    assert set(got) == set(want)
    for did, (n_tok, dup_w, dup_tok) in want.items():
        assert got[did]["n_tokens"] == n_tok, did
        assert got[did]["dup_windows"] == dup_w, did
        assert got[did]["dup_tokens"] == dup_tok, did
        frac = round(dup_tok / n_tok, 6) if n_tok else 0.0
        assert got[did]["dup_token_frac"] == pytest.approx(frac, abs=1e-9), did


def test_planted_share_and_self_repeat_detected(corpus):
    got = {r["doc_id"]: r for r in duplicated_window_stats(corpus, n=8).collect()}
    # the shared paragraph gives docs 0 and 1 duplicated coverage
    assert got[0]["dup_windows"] > 0 and got[1]["dup_windows"] > 0
    # 13-token shared run -> 6 windows -> 13 covered tokens in each doc
    assert got[0]["dup_tokens"] == 13 and got[1]["dup_tokens"] == 13
    # self-repetition within doc 2 is duplication too
    assert got[2]["dup_windows"] > 0
    # unique doc 3 and too-short doc 4 report zeros
    assert got[3]["dup_windows"] == 0 and got[3]["dup_token_frac"] == 0.0
    assert got[4]["n_windows"] == 0 and got[4]["dup_windows"] == 0


def test_doc_windows_hash_is_md5_prefix(corpus, spark):
    rows = {(r["doc_id"], r["start"]): r["whash"]
            for r in doc_windows(corpus, n=8).collect()}
    data = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for (did, start), wh in list(rows.items())[:25]:
        words = _norm_words(data[did])
        gram = " ".join(words[start : start + 8])
        want = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        assert wh == want, (did, start)


def test_span_stats_deterministic_under_repartition(corpus):
    a = sorted(map(tuple, duplicated_window_stats(corpus, n=8).collect()))
    b = sorted(
        map(tuple, duplicated_window_stats(corpus.repartition(5), n=8).collect())
    )
    assert a == b
