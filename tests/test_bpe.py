"""BPE tokenizer: training determinism, cross-engine encode identity,
and the documented two-pass-fixpoint semantics (operators/bpe.py)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.bpe import (
    bpe_encode_expr,
    bpe_encode_pandas,
    bpe_tokens_expr,
    bpe_train,
    encode_text_python,
    full_vocab,
    oracle_bpe_tokens_sql,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown table",
    "quick brown foxes and lazy dogs, the lot of them!",
    "THE THE THE the the the lazy lazy quick quick",
    "a b c d e f g the end",
] * 4

WORDS = ["the", "lazy", "quick", "brown", "dog", "table", "fox", "a", "ab", "s"]


def random_text(rng: random.Random) -> str:
    n = rng.randrange(0, 30)
    parts = []
    for _ in range(n):
        w = rng.choice(WORDS)
        if rng.random() < 0.2:
            w = w.upper()
        if rng.random() < 0.15:
            w += rng.choice([",", ".", "!!", "'s"])
        parts.append(w)
    sep = lambda: rng.choice([" ", "  ", "\t", "\n"])
    return sep().join(parts)


def test_train_deterministic_and_sensible():
    m1 = bpe_train(CORPUS, num_merges=24)
    m2 = bpe_train(CORPUS, num_merges=24)
    assert m1 == m2
    assert 0 < len(m1) <= 24
    # 'th'/'the' must be learned on a the-heavy corpus
    products = {a + b for a, b in m1}
    assert "th" in products or "he" in products
    assert "the" in products
    # every merge operand is either a single char or an earlier product
    seen = set()
    for a, b in m1:
        for side in (a, b):
            assert len(side) == 1 or side in seen
        seen.add(a + b)
    vocab = full_vocab(m1)
    assert len(vocab) == len(set(vocab))
    assert all(a + b in vocab for a, b in m1)


def test_train_early_stop_on_tiny_corpus():
    assert bpe_train(["x"], num_merges=8) == []
    assert bpe_train([], num_merges=8) == []
    # all-singleton pairs (each word once, no repeated pair) -> no merges
    assert bpe_train(["ab", "cd", "ef"], num_merges=8) == []


def test_two_pass_reaches_fixpoint():
    """The docstring's proof, executed: a third replace pass never
    changes the string, for any merge over adversarial repetitions."""
    rng = random.Random(11)
    for _ in range(300):
        k = rng.randrange(1, 8)
        text = " ".join(rng.choice(["a", "b", "ab"]) for _ in range(k))
        spaced = " " + "".join(
            (c + " ") if c != " " else "  " for c in text
        ).replace("   ", "  ")
        pat, rep = " a b ", " ab "
        once = spaced.replace(pat, rep).replace(pat, rep)
        assert once.replace(pat, rep) == once, (text, once)


def test_python_referee_word_isolation():
    merges = [("t", "h"), ("th", "e")]
    # gap stays double: no merge may bridge 'not' + 'the'
    assert encode_text_python("not the", merges) == ["n", "o", "t", "the"]
    assert encode_text_python("the the", merges) == ["the", "the"]
    assert encode_text_python("", merges) == []
    assert encode_text_python("  !! ", merges) == []


def test_encode_cross_engine_identity(spark):
    """Spark expression chain == DuckDB generated SQL == pandas fast
    path == Python referee, on fuzzed adversarial texts."""
    rng = random.Random(7)
    merges = bpe_train(CORPUS, num_merges=24)
    texts = [random_text(rng) for _ in range(120)] + [
        "", "   ", "the", "ththe the", "a a a a a", "ab ab abab",
        "the' s do g!", "AB aB Ab ab",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got_expr = {
        r["id"]: r["tokens"]
        for r in bpe_encode_expr(df, merges).collect()
    }
    got_pd = {
        r["id"]: r["tokens"]
        for r in bpe_encode_pandas(df, merges).collect()
    }
    con = duckdb.connect()
    sql = oracle_bpe_tokens_sql(merges, "t")
    for i, t in enumerate(texts):
        want = encode_text_python(t, merges)
        assert got_expr[i] == want, (i, t)
        assert got_pd[i] == want, (i, t)
        (joined,) = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS t)", [t]
        ).fetchone()
        assert joined.split() == want, (i, t)


def test_tokens_rebuild_normalized_text(spark):
    """Lossless: concatenated tokens == normalized text minus spaces."""
    merges = bpe_train(CORPUS, num_merges=24)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    from transitlog_hfp_sink_spark.operators.dedup import normalize_text

    rows = df.select(
        bpe_tokens_expr(F.col("text"), merges).alias("toks"),
        F.replace(normalize_text("text"), F.lit(" "), F.lit("")).alias("flat"),
    ).collect()
    assert rows
    for r in rows:
        assert "".join(r["toks"]) == r["flat"]


def test_encode_compresses_trained_words(spark):
    """Trained merges reduce token counts vs raw characters on text
    drawn from the training distribution."""
    merges = bpe_train(CORPUS, num_merges=32)
    df = spark.createDataFrame([(0, CORPUS[0])], "doc_id bigint, text string")
    (row,) = bpe_encode_expr(df, merges).collect()
    n_chars = len(CORPUS[0].replace(" ", ""))
    assert 0 < row["n_tokens"] < n_chars
    # the full word 'the' became one token
    assert "the" in row["tokens"]


def test_expr_plan_stays_codegen(spark):
    """No Python evaluation in the expression path: a single projection,
    no BatchEvalPython/ArrowEvalPython nodes."""
    merges = bpe_train(CORPUS, num_merges=16)
    df = spark.createDataFrame([(0, "the dog")], "doc_id bigint, text string")
    plan = bpe_encode_expr(df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


@pytest.mark.parametrize("nm", [1, 4, 48])
def test_num_merges_cap_respected(nm):
    assert len(bpe_train(CORPUS, num_merges=nm)) <= nm


def test_token_ids_roundtrip(spark):
    from transitlog_hfp_sink_spark.operators.bpe import (
        bpe_ids_expr,
        bpe_tokens_expr,
        full_vocab,
    )

    merges = bpe_train(CORPUS, num_merges=24)
    vocab = full_vocab(merges)
    assert vocab[:36] == list("abcdefghijklmnopqrstuvwxyz0123456789")
    assert len(vocab) == len(set(vocab))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS[:6] + ["", "zz9"])],
        "doc_id bigint, text string",
    )
    rows = df.select(
        bpe_tokens_expr(F.col("text"), merges).alias("toks"),
        bpe_ids_expr(F.col("text"), merges).alias("ids"),
    ).collect()
    for r in rows:
        assert len(r["toks"]) == len(r["ids"])
        # ids decode back to the exact token strings (no OOV on the
        # default alphabet)
        assert [vocab[i] for i in r["ids"]] == r["toks"]
        assert all(i >= 0 for i in r["ids"])


def test_merge_table_persistence_roundtrip(spark, tmp_path):
    from transitlog_hfp_sink_spark.operators.bpe import df_to_merges, merges_to_df

    merges = bpe_train(CORPUS, num_merges=24)
    p = str(tmp_path / "merges")
    merges_to_df(spark, merges).write.parquet(p)
    # repartitioned read must restore exact rank order
    back = df_to_merges(spark.read.parquet(p).repartition(7))
    assert back == merges


def test_train_encode_agree_on_repeated_runs():
    """A trainer that segments differently from its own encoder learns
    dead merges; on repeated-symbol runs both must use the replace-pass
    semantics. 'aaaaa' must collapse to ONE trained token at encode."""
    merges = bpe_train(["aaaaa"] * 10, num_merges=8)
    assert encode_text_python("aaaaa", merges) == ["aaaaa"]
    # every learned merge product is reachable at encode time: encoding
    # the training word step-by-step exercises each merge in rank order
    partial = []
    for k in range(1, len(merges) + 1):
        partial.append(encode_text_python("aaaaa", merges[:k]))
    assert all(len(p) < 5 for p in partial)
    assert [len(p) for p in partial] == sorted([len(p) for p in partial], reverse=True)


def test_fuzz_random_merge_tables(spark):
    """Property fuzz beyond trained tables: ARBITRARY (even degenerate)
    merge lists — repeated operands, chained products, self-pairs — must
    keep the three-way identity Spark == DuckDB == Python referee."""
    rng = random.Random(23)
    con = duckdb.connect()
    for trial in range(12):
        syms = ["a", "b", "c"]
        merges = []
        for _ in range(rng.randrange(1, 6)):
            x, y = rng.choice(syms), rng.choice(syms)
            merges.append((x, y))
            syms.append(x + y)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randrange(1, 7)))
                for _ in range(rng.randrange(0, 6))
            )
            for _ in range(20)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {r["id"]: r["tokens"] for r in bpe_encode_expr(df, merges).collect()}
        sql = oracle_bpe_tokens_sql(merges, "t")
        for i, t in enumerate(texts):
            want = encode_text_python(t, merges)
            assert got[i] == want, (trial, merges, t)
            (joined,) = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS t)", [t]
            ).fetchone()
            assert joined.split() == want, (trial, merges, t)
