"""Byte-pair-encoding tokenizer: train + encode, Spark-first.

A training-data pipeline ultimately feeds a tokenizer; regex token
counting (textanalysis.token_count) approximates cost, but exporting
token ids needs a real subword vocabulary. This module implements
classic BPE (Sennrich et al. 2016, arXiv:1508.07909) with Spark's
execution model in mind:

- bpe_train: the merge table is learned DRIVER-SIDE on a bounded,
  seeded sample (the same collect-budget pattern as IVF k-means
  training, similarity.py:239-270: a vocabulary is a few-KB artifact —
  learning it from a <=100k-doc sample is statistically
  indistinguishable from the full corpus, and the corpus never funnels
  through the driver).
- bpe_tokens_expr / bpe_encode_expr: encoding as a PURE COLUMN
  EXPRESSION — the document's characters are spaced out (word gaps kept
  as DOUBLE spaces so merges cannot bridge words) and each merge is
  applied as two non-overlapping string `replace` passes in rank order.
  ONE chain evaluation per row, no UDF, whole-stage codegen — and since
  `replace` exists verbatim in DuckDB, oracle_bpe_tokens_sql() generates
  the bit-identical SQL twin from the SAME merge list, so the driver
  hash-checks every merge application.
- bpe_encode_pandas: the Arrow-batched fast path (mapInPandas) running
  the identical replace-pass algorithm via vectorized pandas str ops —
  value-identical to the expression mode (asserted in tests/test_bpe.py),
  preferred once the merge table is large (the expression tree grows 2
  codegen nodes per merge; the pandas cost is flat per pass and the
  merge loop runs C-level over the whole Arrow batch).

Merge-application semantics (deterministic, engine-independent): merges
apply strictly in rank order; each merge runs as NON-OVERLAPPING
LEFT-TO-RIGHT simultaneous replace passes over the spaced symbol
string, twice. Two passes reach the fixpoint: a pass can only skip an
occurrence whose leading space was consumed by the immediately
preceding match, so survivors are isolated and the second pass (a fresh
scan) merges them all; replacement tokens are concatenations (never
equal to either operand), so a pass cannot create new occurrences of
its own pair. This is the apply-in-rank-order BPE encode with
simultaneous-pass run segmentation; it can differ from
lowest-rank-first / greedy-pairwise variants on repeated-symbol runs
('aaaaa' segments as (aa,a,aa), not greedy (aa,aa,a)) and when a later
merge recreates an earlier pair. What matters for corpus tokenization
is that TRAIN and ENCODE agree — bpe_train re-segments with these
exact pass semantics, so learned merges fire at encode time — and that
the semantics are engine-independent, pinned by a three-way
Spark/DuckDB/Python fuzz (tests/test_bpe.py).

Word-gap invariant (why double spaces survive the chain): a match
ending at a gap consumes only the gap's FIRST space and its replacement
re-emits a trailing space, so the gap stays double; a match starting at
a gap anchors on the gap's SECOND space and the replacement re-emits a
leading space — word isolation holds through any number of merges.

Reference parity: the reference app (HSLdevcom/transitlog-hfp-sink) has
no tokenizer; this belongs to the beyond-reference LLM-pipeline family
(BASELINE.json north-star ops).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import normalize_text


def encode_text_python(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python referee implementing the module's exact semantics
    on a whole (already raw) document string."""
    norm = " ".join(
        "".join(c if c.isalnum() and c.isascii() else " " for c in text.lower()).split()
    )
    if not norm:
        return []
    spaced = " " + "".join(
        (c + " ") if c != " " else "  " for c in norm
    )
    spaced = spaced.replace("   ", "  ")
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        spaced = spaced.replace(pat, rep).replace(pat, rep)
    return spaced.split()


def bpe_train(
    docs: list[str] | DataFrame,
    num_merges: int = 48,
    text_col: str = "text",
    sample_rows: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn a merge table. DataFrame input is sampled to <= sample_rows
    via the deterministic md5 permutation (one bounded collect — the
    only driver materialization, same budget pattern as
    similarity.ivf_centroids) and normalized like every text operator.

    Classic BPE: count word frequencies once, then repeatedly merge the
    most frequent adjacent symbol pair. Deterministic tie-break: highest
    count, then lexicographically smallest (left, right) — the same
    sample yields the same table in any engine/locale. Stops early when
    no pair occurs twice."""
    if isinstance(docs, DataFrame):
        rows = (
            docs.select(normalize_text(text_col).alias("t"))
            .where(F.length("t") > 0)
            .orderBy(F.md5(F.col("t")))
            .limit(sample_rows)
            .collect()
        )
        texts = [r["t"] for r in rows]
    else:
        texts = [
            " ".join(
                "".join(
                    c if c.isalnum() and c.isascii() else " " for c in t.lower()
                ).split()
            )
            for t in docs
        ]

    word_freq: Counter = Counter()
    for t in texts:
        word_freq.update(t.split())

    words: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_freq.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        # re-segment with the ENCODER's exact semantics (two
        # non-overlapping replace passes) — a greedy pairwise scan
        # segments repeated-symbol runs differently ('aaaaa' ->
        # (aa,aa,a) greedy vs (aa,a,aa) replace), and a trainer that
        # disagrees with its own encoder learns merges that never fire
        # at encode time
        pat, rep = f" {a} {b} ", f" {a}{b} "
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            s = " " + " ".join(syms) + " "
            key = tuple(s.replace(pat, rep).replace(pat, rep).split())
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    return merges


#: default alphabet: normalize_text limits characters to [a-z0-9], so
#: char-level fallback ids over this alphabet make every encodable token
#: id-mappable (no OOV possible unless callers bypass normalization).
DEFAULT_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def full_vocab(
    merges: list[tuple[str, str]], alphabet: str = DEFAULT_ALPHABET
) -> list[str]:
    """Token id space: the single-character alphabet first (stable ids
    independent of the merge table), then merge products in rank order —
    the id layout GPT-style vocabularies use (bytes, then merges)."""
    vocab = list(alphabet)
    seen = set(vocab)
    for a, b in merges:
        m = a + b
        if m not in seen:
            seen.add(m)
            vocab.append(m)
    return vocab


def bpe_ids_expr(
    text: Column | str,
    merges: list[tuple[str, str]],
    alphabet: str = DEFAULT_ALPHABET,
) -> Column:
    """array<int> of token ids: the token array mapped through a LITERAL
    map expression (vocab is tens-to-thousands of entries — an in-plan
    constant, no join, no shuffle, no broadcast variable to manage).
    Unknown tokens (only possible with a non-default alphabet) map to -1."""
    vocab = full_vocab(merges, alphabet)
    kv: list[Column] = []
    for i, tok in enumerate(vocab):
        kv.append(F.lit(tok))
        kv.append(F.lit(i))
    m = F.create_map(*kv)
    return F.transform(
        bpe_tokens_expr(text, merges),
        lambda t: F.coalesce(F.element_at(m, t), F.lit(-1)).cast("int"),
    )


def merges_to_df(spark, merges: list[tuple[str, str]]):
    """Persistable merge table: (rank, left, right). A tokenizer
    vocabulary is an ARTIFACT — train once, write with
    df.write.parquet(...), and every later job round-trips it with
    df_to_merges; the table is a few KB and broadcasts trivially."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def df_to_merges(df) -> list[tuple[str, str]]:
    """Inverse of merges_to_df; rank order restored regardless of the
    storage partitioning (one bounded collect — the table is tiny)."""
    rows = df.select("rank", "left", "right").collect()
    return [(r["left"], r["right"]) for r in sorted(rows, key=lambda r: r["rank"])]


def _spaced_doc(norm: Column) -> Column:
    """normalized text -> spaced symbols with DOUBLE-space word gaps:
    'ab cd' -> ' a b  c d '."""
    spaced = F.concat(F.lit(" "), F.regexp_replace(norm, "(.)", "$1 "))
    return F.replace(spaced, F.lit("   "), F.lit("  "))


def bpe_tokens_expr(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE tokens for a whole document — one replace
    chain per ROW (2 * len(merges) codegen nodes), zero Python."""
    chain = _spaced_doc(normalize_text(text))
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        chain = F.replace(F.replace(chain, pat, rep), pat, rep)
    toks = F.split(F.trim(chain), " +")
    return F.filter(toks, lambda t: t != "")


def bpe_encode_expr(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — the oracle-able encode."""
    return df.select(
        F.col(id_col).alias("id"),
        bpe_tokens_expr(F.col(text_col), merges).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_encode_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched fast path: mapInPandas, vectorized str.replace
    passes. Value-identical to bpe_encode_expr (same algorithm on the
    same normalized text; asserted in tests/test_bpe.py)."""
    pairs = [(f" {a} {b} ", f" {a}{b} ") for a, b in merges]
    out_schema = "id bigint, tokens array<string>, n_tokens int"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            txt = (
                pdf[text_col]
                .fillna("")
                .str.lower()
                .str.replace(r"[^a-z0-9\s]", " ", regex=True)
                .str.replace(r"\s+", " ", regex=True)
                .str.strip()
            )
            spaced = (" " + txt.str.replace(r"(.)", r"\1 ", regex=True)).str.replace(
                "   ", "  ", regex=False
            )
            for pat, rep in pairs:
                spaced = spaced.str.replace(pat, rep, regex=False).str.replace(
                    pat, rep, regex=False
                )
            tokens = spaced.str.split()
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "tokens": tokens,
                    "n_tokens": tokens.str.len().astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_bpe_tokens_sql(
    merges: list[tuple[str, str]],
    text_expr: str = "text",
) -> str:
    """DuckDB VARCHAR expression computing the space-joined BPE token
    sequence of `text_expr` — generated from the SAME merge list as the
    Spark expression, so both engines execute the identical replace
    plan (the technique of the geohash/Z-order twins: one bit/merge plan,
    two renderings)."""
    norm = (
        "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9\\s]', ' ', 'g'),"
        " '\\s+', ' ', 'g'))"
    ).format(t=text_expr)
    spaced = (
        "replace(' ' || regexp_replace({n}, '(.)', '\\1 ', 'g'), '   ', '  ')"
    ).format(n=norm)
    chain = spaced
    for a, b in merges:
        pat, rep = _sql_quote(f" {a} {b} "), _sql_quote(f" {a}{b} ")
        chain = f"replace(replace({chain}, {pat}, {rep}), {pat}, {rep})"
    return "trim(regexp_replace({c}, '\\s+', ' ', 'g'))".format(c=chain)
