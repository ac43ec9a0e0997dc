"""PII redaction (operators/redact.py): planted examples, no-PII
passthrough, and fuzz vs a Python `re` reference over the shared
Java/RE2-safe pattern subset."""

import random
import re

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.redact import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    scrub_documents,
)


def _py_redact(text):
    for _, pat, rep in PII_PATTERNS:
        text = re.sub(pat, rep, text)
    return text


def _py_counts(text):
    return {kind: len(re.findall(pat, text)) for kind, pat, _ in PII_PATTERNS}


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return scrub_documents(df).orderBy("doc_id").collect()


def test_planted_kinds(spark):
    rows = _run(
        spark,
        [
            "reach me at jane.doe+x@mail.example.org thanks",
            "call 555-867-5309 or 555.123.4567 today",
            "host 192.168.0.1 and 10.0.255.254 are up",
            "ssn 123-45-6789 on file",
            "no pii here at all",
        ],
    )
    assert [r["n_email"] for r in rows] == [1, 0, 0, 0, 0]
    assert [r["n_phone"] for r in rows] == [0, 2, 0, 0, 0]
    assert [r["n_ipv4"] for r in rows] == [0, 0, 2, 0, 0]
    assert [r["n_ssn"] for r in rows] == [0, 0, 0, 1, 0]
    assert rows[0]["redacted"] == "reach me at <EMAIL> thanks"
    assert rows[1]["redacted"] == "call <PHONE> or <PHONE> today"
    assert rows[2]["redacted"] == "host <IP> and <IP> are up"
    assert rows[3]["redacted"] == "ssn <SSN> on file"
    assert rows[4]["redacted"] == "no pii here at all"


def test_ssn_not_eaten_by_phone(spark):
    # 3-2-4 (SSN) and 3-3-4 (phone) are disjoint shapes; both redact to
    # their own token whatever the application order
    rows = _run(spark, ["a 123-45-6789 b 123-456-7890 c"])
    assert rows[0]["redacted"] == "a <SSN> b <PHONE> c"


def test_fuzz_vs_python(spark):
    rng = random.Random(11)
    frags = [
        "plain words",
        "x@y.io",
        "bob.smith@corp.example.com",
        "555-123-4567",
        "555.123.4567",
        "1.2.3.4",
        "999-99-9999",
        "12.34",
        "not-a-phone 12-34-56",
        "almost@nope",
        "3.4.5",
        "tail",
    ]
    texts = [
        " ".join(rng.choice(frags) for _ in range(rng.randrange(0, 8)))
        for _ in range(60)
    ]
    rows = _run(spark, texts)
    for t, r in zip(texts, rows):
        want = _py_counts(t)
        assert {
            "email": r["n_email"],
            "ssn": r["n_ssn"],
            "phone": r["n_phone"],
            "ipv4": r["n_ipv4"],
        } == want, t
        assert r["redacted"] == _py_redact(t), t


def test_map_only_plan(spark):
    from transitlog_hfp_sink_spark.plans.inspect import explain_str

    df = spark.createDataFrame([(1, "a@b.co")], "doc_id bigint, text string")
    plan = explain_str(scrub_documents(df), "simple")
    assert "Exchange" not in plan  # pure projection: no shuffle


def test_counts_and_redact_agree(spark):
    # every counted match disappears from the redacted text
    df = spark.createDataFrame(
        [(1, "a@b.co 1.2.3.4 555-123-4567 123-45-6789")],
        "doc_id bigint, text string",
    )
    out = df.select(
        redact_pii("text").alias("red"), *[v.alias(k) for k, v in pii_counts("text").items()]
    ).collect()[0]
    assert out["red"] == "<EMAIL> <IP> <PHONE> <SSN>"
    for kind, pat, _ in PII_PATTERNS:
        assert not re.search(pat, out["red"])
