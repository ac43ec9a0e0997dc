"""Repetition signals (textanalysis.duplicate_line_fraction /
duplicate_ngram_fraction) and the word_grams multiset contract. The
synthetic documents table is single-line, so planted inputs exercise
the newline paths here."""

import random
import re

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import word_grams, word_shingles
from transitlog_hfp_sink_spark.operators.textanalysis import (
    duplicate_line_fraction,
    duplicate_ngram_fraction,
)


def _frac_cols(spark, texts, n=3):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i bigint, text string"
    )
    rows = (
        df.select(
            "i",
            duplicate_line_fraction("text").alias("dl"),
            duplicate_ngram_fraction("text", n).alias("dg"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r["dl"], r["dg"]) for r in rows]


def _py_norm_words(text):
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ") if t else [""]


def _py_dup_gram_frac(text, n):
    w = _py_norm_words(text)
    grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    return (len(grams) - len(set(grams))) / len(grams) if grams else 0.0


def _py_dup_line_frac(text):
    lines = [l for l in text.split("\n") if l.strip()]
    return (len(lines) - len(set(lines))) / len(lines) if lines else 0.0


def test_duplicate_line_fraction_planted(spark):
    got = _frac_cols(
        spark,
        [
            "buy now\nbuy now\nbuy now\nunique line",  # 2 of 4 lines repeat
            "one line only",
            "a\n\n  \na",  # blank lines ignored; 1 of 2 repeats
            "",
        ],
    )
    assert [dl for dl, _ in got] == [0.5, 0.0, 0.5, 0.0]


def test_duplicate_ngram_fraction_planted(spark):
    texts = [
        "spam spam spam spam spam spam",  # all trigrams identical: 3/4 dup
        "the quick brown fox jumps high",  # all distinct
        "too short",  # no trigram -> 0
    ]
    got = _frac_cols(spark, texts)
    assert got[0][1] == 0.75
    assert got[1][1] == 0.0
    assert got[2][1] == 0.0


def test_fuzz_vs_python(spark):
    rng = random.Random(3)
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15)))
        for _ in range(50)
    ]
    got = _frac_cols(spark, texts)
    for t, (dl, dg) in zip(texts, got):
        assert abs(dl - _py_dup_line_frac(t)) < 1e-9, t
        assert abs(dg - _py_dup_gram_frac(t, 3)) < 1e-9, t


def test_word_grams_keeps_repeats(spark):
    df = spark.createDataFrame([("a b a b a",)], "text string")
    row = df.select(
        word_grams("text", 2).alias("g"), word_shingles("text", 2).alias("s")
    ).collect()[0]
    assert row["g"] == ["a b", "b a", "a b", "b a"]  # ordered multiset
    assert row["s"] == ["a b", "b a"]  # the distinct set


def _analyze(spark, texts):
    from transitlog_hfp_sink_spark.operators.textanalysis import analyze_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return {r["doc_id"]: r.asDict() for r in analyze_documents(df).collect()}


def test_structure_signals_planted(spark):
    """C4/Gopher structural rules on planted rich text (the synthetic
    corpus is single-line word soup, so the interesting paths need
    crafted documents)."""
    texts = [
        # 0: well-formed prose: terminal punctuation, long lines
        "This is a good sentence with many words in it.\n"
        "Here is another one that also ends properly!\n"
        "And a third full line of reasonable prose text?",
        # 1: bullet list with ellipses
        "- item one ...\n- item two ...\n* item three\nplain trailer line",
        # 2: code-ish doc (brace) + lorem
        "function f() { return 1; }\nLorem Ipsum dolor sit amet and more words here",
        # 3: short lines only
        "hi\nok\nyes no",
    ]
    got = _analyze(spark, texts)

    assert got[0]["term_punct_line_frac"] == 1.0
    assert got[0]["short_line_frac"] == 0.0
    assert got[0]["bullet_line_frac"] == 0.0
    assert got[0]["c4_keep"] is True

    assert got[1]["bullet_line_frac"] == 0.75
    assert got[1]["ellipsis_line_frac"] == 0.5
    assert got[1]["gopher_keep"] is False  # too few words + ellipsis share

    assert got[2]["c4_keep"] is False  # brace AND lorem ipsum
    assert got[3]["short_line_frac"] == 1.0
    assert got[3]["c4_keep"] is False  # under 5 words


def test_structure_signals_gopher_keep_boundaries(spark):
    """gopher_keep flips on word-count and symbol-ratio bounds."""
    good = " ".join(["word"] * 60) + "."
    short = " ".join(["word"] * 10)
    hashy = " ".join(["word"] * 60) + " " + "#" * 30
    got = _analyze(spark, [good, short, hashy])
    assert got[0]["gopher_keep"] is True
    assert got[1]["gopher_keep"] is False  # < 50 words
    assert got[2]["gopher_keep"] is False  # symbol ratio > 0.1
    assert got[2]["symbol_word_ratio"] > 0.1
    assert got[0]["alpha_word_frac"] == 1.0


def test_structure_signals_empty_and_single_line(spark):
    got = _analyze(spark, ["", "one single line of text here"])
    # empty doc: every fraction is a definite 0.0 (no NULLs, no ANSI 0/0)
    for name in (
        "term_punct_line_frac", "short_line_frac", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "symbol_word_ratio",
    ):
        assert got[0][name] == 0.0, name
    assert got[0]["c4_keep"] is False and got[0]["gopher_keep"] is False
    assert got[1]["short_line_frac"] == 0.0
    assert got[1]["bullet_line_frac"] == 0.0
    assert got[1]["alpha_word_frac"] == 1.0


def test_structure_signals_crlf_lines(spark):
    """CRLF documents: the trailing \\r must not defeat the
    terminal-punctuation anchor or the ellipsis suffix check (and the
    DuckDB twin agrees — covered by the oracle gate)."""
    got = _analyze(spark, ["Good line one.\r\nGood line two.\r\n",
                           "- a ...\r\n- b ...\r\nplain\r\n"])
    assert got[0]["term_punct_line_frac"] == 1.0
    assert got[1]["ellipsis_line_frac"] == 0.6667
    assert got[1]["bullet_line_frac"] == 0.6667


def test_text_quality_oracle_handles_blank_docs(spark):
    """The blank-document rules (n_ws=0, guarded ratios) must hold in
    BOTH engines — the driver corpus has no blank docs, so only this
    test would catch a one-sided guard (which briefly existed in round
    3 when an oracle edit was lost to a failed patch script)."""
    import duckdb
    import pandas as pd

    from transitlog_hfp_sink_spark.operators.textanalysis import analyze_documents
    from transitlog_hfp_sink_spark.queries.ml import ORACLE_TEXT_QUALITY

    rows = [
        (0, "", "en"),
        (1, "   \n  ", "en"),
        (2, "a normal document with several plain words in it.", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r["doc_id"]: r.asDict()
        for r in analyze_documents(df, "text", "doc_id", ("lang",)).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    want = {
        int(r["doc_id"]): dict(r)
        for r in con.execute(ORACLE_TEXT_QUALITY).fetch_arrow_table().to_pylist()
    }
    assert set(got) == set(want)
    for i in got:
        for col, v in want[i].items():
            g = got[i][col]
            assert g == v or (g is None and v is None), (i, col, g, v)
