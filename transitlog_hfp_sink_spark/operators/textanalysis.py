"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

Everything is built-in expressions (codegen, fully distributed, no
shuffle — these are map-only projections) and every scoring rule is also
expressible in ANSI SQL so DuckDB can oracle-check it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.dedup import normalize_text, word_grams

#: ASCII token pattern shared with the oracle SQL — a BPE-ish split:
#: letter runs, digit runs, or single punctuation marks.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

#: tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "une"),
    "es": ("el", "los", "las", "que", "una"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

#: quality_score rule set — ONE definition shared by the single-column
#: helper and analyze_documents' staged projection (round-2 ADVICE: the
#: two used to repeat these literals and could drift silently)
QUALITY_LENGTH_RANGE = (10, 10000)  # whitespace-token count
QUALITY_WORDLEN_RANGE = (2.0, 12.0)  # average word length
QUALITY_STOPWORD_MIN = 0.05  # stopword ratio
QUALITY_PUNCT_MAX = 0.2  # punctuation ratio
QUALITY_WEIGHTS = (0.3, 0.2, 0.3, 0.2)  # length, wordlen, stopword, punct


def _quality_from_parts(n_ws: Column, wl: Column, sw: Column, pr: Column) -> Column:
    """Composite quality from the four precomputed signals."""
    w_len, w_wl, w_sw, w_pr = QUALITY_WEIGHTS
    lo, hi = QUALITY_LENGTH_RANGE
    wlo, whi = QUALITY_WORDLEN_RANGE
    length_ok = F.when((n_ws >= lo) & (n_ws <= hi), F.lit(1.0)).otherwise(F.lit(0.0))
    wordlen_ok = F.when((wl >= wlo) & (wl <= whi), F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ok = F.when(sw >= QUALITY_STOPWORD_MIN, F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(pr <= QUALITY_PUNCT_MAX, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        w_len * length_ok + w_wl * wordlen_ok + w_sw * sw_ok + w_pr * punct_ok, 4
    )


def _argmax_lang(scores: dict[str, Column]) -> Column:
    """Argmax of marker-hit counts; ties break in alphabetical language
    order; zero hits -> 'und'. Shared by detect_language and
    analyze_documents so the winner rule has one definition."""
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in sorted(scores):  # alphabetical; strict > keeps first winner
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def _marker_scores(distinct_words: Column) -> dict[str, Column]:
    """Marker-hit counts per language over a distinct-word array."""
    return {
        lang: F.size(
            F.array_intersect(distinct_words, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in LANG_MARKERS.items()
    }


def token_count(col: Column | str) -> Column:
    """Tokens per the shared BPE-ish pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


def whitespace_token_count(col: Column | str) -> Column:
    """0 for blank text: split('') yields [''] in both engines, which
    would count an empty document as one phantom token — visible as a
    unit of budget in pack_chunks and as a off-by-one in every
    length gate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def _word_array(col: Column | str) -> Column:
    from transitlog_hfp_sink_spark.operators.dedup import normalized_words

    return normalized_words(col)


def stopword_ratio(col: Column | str) -> Column:
    words = _word_array(col)
    sw = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return sw / F.size(words)


def punct_ratio(col: Column | str) -> Column:
    """0.0 for empty text (ANSI mode makes x/0 an error, and an empty
    document legitimately exists in a real corpus — it has no
    punctuation, not undefined punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[A-Za-z0-9 \\t\\n\\r]", "")
    return F.when(
        F.length(c) > 0, F.length(stripped) / F.length(c)
    ).otherwise(F.lit(0.0))


def avg_word_length(col: Column | str) -> Column:
    words = _word_array(col)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.size(words)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word length,
    some stopwords, little punctuation. Deterministic, SQL-mirrorable."""
    return _quality_from_parts(
        whitespace_token_count(col),
        avg_word_length(col),
        stopword_ratio(col),
        punct_ratio(col),
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit counts per language over the word set."""
    return _marker_scores(F.array_distinct(_word_array(col)))


def detect_language(col: Column | str) -> Column:
    """Argmax of marker-hit counts; ties break in alphabetical language
    order; zero hits -> 'und' (undetermined)."""
    return _argmax_lang(lang_scores(col))


def duplicate_line_fraction(col: Column | str) -> Column:
    """Repetition signal (Gopher-style): fraction of non-empty lines that
    repeat an earlier line. Boilerplate/scraped pages score high; 0.0 for
    texts with at most one non-empty line.

    Lines split on \r?\n so CRLF documents don't carry a trailing \r into
    line-level regex anchors (Java's '$' matches before a final \r, RE2's
    does not — a cross-engine divergence on Windows line endings)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\r?\n"), lambda l: F.trim(l) != "")
    n = F.size(lines)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))) / n
    ).otherwise(F.lit(0.0))


def duplicate_ngram_fraction(col: Column | str, n: int = 3) -> Column:
    """Repetition signal: fraction of word n-grams that repeat an earlier
    occurrence (over the normalized text). Looping/spammy generation
    scores high; 0.0 when the text is too short for any n-gram."""
    grams = word_grams(col, n)
    size = F.size(grams)
    return F.when(
        size > 0, (size - F.size(F.array_distinct(grams))) / size
    ).otherwise(F.lit(0.0))


#: C4/Gopher structural filter rule set (Raffel et al. 2020 §2.2 "C4";
#: Rae et al. 2021 appendix A "Gopher rules") — doc-level adaptations:
#: C4 keeps docs without code braces / boilerplate markers and with a
#: minimum length; Gopher bounds word count, mean word length,
#: symbol-to-word ratio, bullet/ellipsis line shares, and the fraction
#: of words containing an alphabetic character. One definition, shared
#: by the column helpers and analyze_documents' staged projection.
C4_MIN_WORDS = 5
C4_BAD_SUBSTRINGS = ("{", "lorem ipsum")
GOPHER_WORDS_RANGE = (50, 100_000)
GOPHER_WORDLEN_RANGE = (3.0, 10.0)
GOPHER_SYMBOL_RATIO_MAX = 0.1
GOPHER_ALPHA_FRAC_MIN = 0.8
GOPHER_BULLET_FRAC_MAX = 0.9
GOPHER_ELLIPSIS_FRAC_MAX = 0.3
TERMINAL_PUNCT_RE = "[.!?\"']$"
BULLET_RE = "^[-*]"


def _line_frac(lines: Column, pred) -> Column:
    n = F.size(lines)
    return F.round(
        F.when(n > 0, F.size(F.filter(lines, pred)) / n).otherwise(F.lit(0.0)), 4
    )


def _occurrences(c: Column, sub: str) -> Column:
    """Non-overlapping substring occurrence count via replace-length
    delta (identical semantics in DuckDB for the twin)."""
    return (F.length(c) - F.length(F.replace(c, F.lit(sub), F.lit("")))) / len(sub)


def structure_signals(
    text: Column, lines: Column, ws_tokens: Column, awl: Column
) -> dict[str, Column]:
    """The C4/Gopher signal columns over STAGED lines/ws-token arrays and
    a precomputed average-word-length column (see analyze_documents' perf
    note — callers stage the expensive derivations once). Returns a dict
    of named columns; keep-verdicts included."""
    # blank text: ws_tokens is [''] (split semantics), which is zero
    # real tokens — the fractions are 0.0, not 1/1 or an ANSI 0/0 error
    n_ws = F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(ws_tokens))
    term_frac = _line_frac(lines, lambda l: F.trim(l).rlike(TERMINAL_PUNCT_RE))
    short_frac = _line_frac(
        lines, lambda l: F.size(F.split(F.trim(l), r"\s+")) < 3
    )
    bullet_frac = _line_frac(lines, lambda l: F.trim(l).rlike(BULLET_RE))
    ellipsis_frac = _line_frac(lines, lambda l: F.endswith(F.trim(l), F.lit("...")))
    alpha_frac = F.round(
        F.when(
            n_ws > 0,
            F.size(F.filter(ws_tokens, lambda w: w.rlike("[A-Za-z]"))) / n_ws,
        ).otherwise(F.lit(0.0)),
        4,
    )
    symbol_ratio = F.round(
        F.when(
            n_ws > 0, (_occurrences(text, "#") + _occurrences(text, "...")) / n_ws
        ).otherwise(F.lit(0.0)),
        4,
    )
    wl_lo, wl_hi = GOPHER_WORDLEN_RANGE
    w_lo, w_hi = GOPHER_WORDS_RANGE
    c4_keep = (n_ws >= C4_MIN_WORDS) & ~F.lower(text).contains(
        C4_BAD_SUBSTRINGS[0]
    ) & ~F.lower(text).contains(C4_BAD_SUBSTRINGS[1])
    gopher_keep = (
        n_ws.between(w_lo, w_hi)
        & awl.between(wl_lo, wl_hi)
        & (symbol_ratio <= GOPHER_SYMBOL_RATIO_MAX)
        & (alpha_frac >= GOPHER_ALPHA_FRAC_MIN)
        & (bullet_frac <= GOPHER_BULLET_FRAC_MAX)
        & (ellipsis_frac <= GOPHER_ELLIPSIS_FRAC_MAX)
    )
    return {
        "term_punct_line_frac": term_frac,
        "short_line_frac": short_frac,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "symbol_word_ratio": symbol_ratio,
        "c4_keep": c4_keep,
        "gopher_keep": gopher_keep,
    }


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.
    (The rolling-hash/winnowing variant lives in dedup.word_shingles +
    minhash; this is the cheap exact-match fingerprint.)"""
    return F.md5(normalize_text(col))


def analyze_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
    structural: bool = True,
) -> DataFrame:
    """One-pass text-analysis projection over a documents table.
    `extra_cols` are passed through untouched (e.g. a ground-truth lang
    label to score lang_pred against).

    PERF NOTE: staged projections, not one flat select. The helper
    functions each re-derive normalize_text/split from the raw text, and
    higher-order-function lambdas block codegen subexpression elimination
    (see dedup.word_grams), so a flat select re-runs the regex-normalize
    chain ~10x per row. Materializing norm/words/lines/grams as aliased
    columns first makes each computed ONCE; CollapseProject keeps the
    stages separate because the aliases are non-cheap and multiply
    referenced. Measured ~4x on the sf0.1 documents table."""
    c = F.col(text_col)
    words = F.col("__words")
    lines = F.col("__lines")
    grams = F.col("__grams")
    n_words = F.size(words)
    n_lines = F.size(lines)
    n_grams = F.size(grams)
    sw = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))) / n_words
    wl = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words
    pr = punct_ratio(c)
    # shared definitions (_marker_scores/_argmax_lang/_quality_from_parts)
    # applied to the STAGED columns, so the rule set has one source of
    # truth while the expensive derivations still run once per row
    best_lang = _argmax_lang(_marker_scores(F.array_distinct(words)))
    # three stages so each expensive derivation runs ONCE: norm (regex
    # chain) -> words (split) -> grams/lines; CollapseProject leaves the
    # stages intact because each alias is non-cheap and multiply used
    from transitlog_hfp_sink_spark.operators.dedup import grams_from_words

    # round 11: words via the staged raw-split -> fixup fast tokenizer
    # (value-identical to split(normalize_text(c), " ")); the normalized
    # STRING is reconstructed as concat_ws(" ", words) — identical to
    # the regex chain's output (words joined by single spaces, "" for
    # zero-word text, NULL for NULL text), one regex pass instead of
    # three per row
    from transitlog_hfp_sink_spark.operators.dedup import fixup_words, raw_words

    stage_raw = df.select(
        F.col(id_col),
        *[F.col(x) for x in extra_cols],
        c.alias(text_col),
        raw_words(c).alias("__w0"),
    )
    stage_words = stage_raw.select(
        F.col(id_col),
        *[F.col(x) for x in extra_cols],
        F.col(text_col),
        fixup_words(F.col("__w0")).alias("__words"),
    ).withColumn(
        "__norm",
        F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat_ws(" ", F.col("__words"))
        ),
    )
    staged = stage_words.select(
        F.col(id_col),
        *[F.col(x) for x in extra_cols],
        F.col(text_col),
        F.col("__norm"),
        F.col("__words"),
        F.filter(F.split(c, "\r?\n"), lambda l: F.trim(l) != "").alias("__lines"),
        grams_from_words(F.col("__words"), 3).alias("__grams"),
        F.split(F.trim(c), r"\s+").alias("__ws"),
    )
    n_ws_staged = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(F.col("__ws")))
    # structural=False skips the C4/Gopher columns (bench keeps the
    # pre-round-3 projection timable under its original name)
    struct = structure_signals(c, lines, F.col("__ws"), wl) if structural else {}
    return staged.select(
        F.col(id_col),
        *[F.col(x) for x in extra_cols],
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars"),
        F.round(wl, 4).alias("avg_word_len"),
        F.round(sw, 4).alias("stopword_ratio"),
        F.round(pr, 4).alias("punct_ratio"),
        _quality_from_parts(n_ws_staged, wl, sw, pr).alias("quality"),
        F.round(
            F.when(n_lines > 0, (n_lines - F.size(F.array_distinct(lines))) / n_lines)
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(n_grams > 0, (n_grams - F.size(F.array_distinct(grams))) / n_grams)
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_trigram_frac"),
        best_lang.alias("lang_pred"),
        F.md5(F.col("__norm")).alias("fingerprint"),
        *[col.alias(name) for name, col in struct.items()],
    )
