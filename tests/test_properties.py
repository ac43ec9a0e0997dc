"""Property-based tests (hypothesis): the safe-parse family must agree
with a pure-Python reference on arbitrary inputs — the fuzzing the
reference never had (SURVEY §5)."""

import re

import pytest
from hypothesis import given, settings, strategies as st

TIME_RE = re.compile(r"^([01]?\d|2[0-3]):([0-5]\d)(:[0-5]\d)?$")


def py_safe_parse_time(s):
    if s is None:
        return None
    m = TIME_RE.match(s)
    if not m:
        return None
    return f"{int(m.group(1)):02d}:{m.group(2)}"


def py_safe_parse_int(s):
    """Python model of safeParseInt: Java Integer.parseInt throws on
    int32 overflow (-> null), and Spark ``try_cast(... AS INT)`` matches
    that — so the model must return None outside [-2^31, 2^31-1]."""
    if s is None:
        return None
    try:
        v = int(s.strip())
    except ValueError:
        return None
    return v if -(2**31) <= v <= 2**31 - 1 else None


# strategy: plausible-ish time strings + pure noise
time_like = st.one_of(
    st.from_regex(r"[0-9]{1,3}:[0-9]{2}(:[0-9]{2})?", fullmatch=True),
    st.text(alphabet="0123456789:x. -", min_size=0, max_size=10),
)

int_like = st.one_of(
    st.integers(-(2**31), 2**31 - 1).map(str),
    st.text(alphabet="0123456789-+x. ", min_size=0, max_size=12),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(time_like, min_size=1, max_size=50))
def test_safe_parse_time_matches_python(spark, values):
    from transitlog_hfp_sink_spark.functions.timeparse import safe_parse_time

    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [r["t"] for r in df.select(safe_parse_time("raw").alias("t")).collect()]
    assert got == [py_safe_parse_time(v) for v in values]


@settings(max_examples=20, deadline=None)
@given(st.lists(int_like, min_size=1, max_size=50))
def test_try_cast_int_matches_python(spark, values):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [r["i"] for r in df.select(F.col("raw").try_cast("int").alias("i")).collect()]
    assert got == [py_safe_parse_int(v) for v in values]


def py_norm_words(text):
    import re as _re

    norm = _re.sub(r"\s+", " ", _re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    return set(norm.split(" "))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc XYZ.,123", min_size=1, max_size=40),
        min_size=2,
        max_size=12,
    )
)
@pytest.mark.slow
def test_jaccard_pairs_match_python(spark, texts):
    """ngram_jaccard_pairs (unigram, unblocked) vs pure-Python set math on
    arbitrary messy text."""
    from transitlog_hfp_sink_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", None, 1, 0.0).collect()
    }
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            wa, wb = py_norm_words(texts[a]), py_norm_words(texts[b])
            expect = round(len(wa & wb) / len(wa | wb), 6) if wa | wb else None
            if expect is None:
                continue
            assert got.get((a, b)) == pytest.approx(expect, abs=1e-6), (a, b)
