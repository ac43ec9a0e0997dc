"""PII detection and redaction — regex scrubbing for training corpora.

A standard pre-training step: find and mask emails, phone numbers, IP
addresses, and SSN-shaped ids before text reaches a training set. All
pure `regexp_extract_all` / `regexp_replace` expressions — codegen,
map-only, no shuffle, no Python in the hot path — so a 100 TB scrub is
a single scan.

The patterns are deliberately restricted to the regex subset with
identical semantics in Java regex (Spark) and RE2 (DuckDB/Go): ASCII
classes, bounded repetition, `\\b` word boundaries, no backreferences,
no lookaround. That keeps every count and every redacted byte
oracle-checkable bit-for-bit (see queries/ml.py pii_redact_documents).

No counterpart in the reference (HSLdevcom/transitlog-hfp-sink); part
of the training-data-pipeline family alongside operators/textanalysis.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) applied in this order. Order matters for
#: overlapping shapes: emails first (their local part may contain digits),
#: then SSN (dash-only, 3-2-4) before phone (3-3-4) before IPv4 (the
#: dotted-phone form never parses as 4 dot-separated octets, but the
#: fixed order makes redaction deterministic regardless).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (on the ORIGINAL text, before any
    replacement — kinds are counted independently)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Text with every PII match replaced by its `<KIND>` token, patterns
    applied in PII_PATTERNS order (each global)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def scrub_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass PII profile + scrub: per-kind counts, the redacted text,
    and its md5 (the cheap equality witness when the full text is too
    wide to ship around)."""
    counts = pii_counts(text_col)
    return df.select(
        F.col(id_col),
        *[v.alias(f"n_{k}") for k, v in counts.items()],
        redact_pii(text_col).alias("redacted"),
        F.md5(redact_pii(text_col)).alias("redacted_md5"),
    )
