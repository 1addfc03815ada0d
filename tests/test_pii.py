"""PII scan/redact (operators/pii.py) vs a pure-Python `re` reference:
the default dialect-portable patterns must behave identically under
Java regex (Spark), RE2 (DuckDB) and Python `re` on ASCII text."""

import re

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.pii import PII_PATTERNS, pii_scan, redact_pii

DOCS = [
    (1, "mail me at alice.smith+spam@example.co.uk or bob@x.io today"),
    (2, "server 192.168.1.254 and 10.0.0.7 are up; port 8080 is not an ip"),
    (3, "call 415-555-0134 or 800-555-9999 now"),
    (4, "no pii here, just words and the number 12345"),
    (5, ""),
    (6, "mixed: carol@corp.com at 172.16.254.1 dials 212-555-0000"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _ref_counts(text):
    return {name: len(re.findall(p, text)) for name, p in PII_PATTERNS.items()}


def test_pii_scan_matches_re(spark):
    got = {r["doc_id"]: r.asDict() for r in pii_scan(_df(spark)).collect()}
    for doc_id, text in DOCS:
        ref = _ref_counts(text)
        row = got[doc_id]
        for name, n in ref.items():
            assert row[f"n_{name}"] == n, (doc_id, name)
        assert row["n_pii"] == sum(ref.values())
    # spot-check absolute values so the reference itself is validated
    assert got[1]["n_email"] == 2 and got[1]["n_pii"] == 2
    assert got[2]["n_ipv4"] == 2 and got[2]["n_email"] == 0
    assert got[3]["n_phone"] == 2
    assert got[4]["n_pii"] == 0 and got[5]["n_pii"] == 0
    assert got[6]["n_pii"] == 3


def test_redact_pii_matches_re(spark):
    got = {r["doc_id"]: r.asDict() for r in redact_pii(_df(spark)).collect()}
    for doc_id, text in DOCS:
        cur, n = text, 0
        for name, p in sorted(PII_PATTERNS.items()):
            n += len(re.findall(p, cur))
            cur = re.sub(p, f"[{name.upper()}]", cur)
        assert got[doc_id]["redacted_text"] == cur, doc_id
        assert got[doc_id]["n_redacted"] == n, doc_id
    assert "[EMAIL]" in got[1]["redacted_text"]
    assert "[IPV4]" in got[2]["redacted_text"]
    assert "[PHONE]" in got[3]["redacted_text"]
    assert got[6]["n_redacted"] == 3


def test_redact_no_double_count(spark):
    # the email's digits must not be re-counted by phone after redaction
    df = spark.createDataFrame(
        [(1, "x 123-456-7890@example.com y")], "doc_id int, text string"
    )
    row = redact_pii(df).collect()[0]
    # email pattern consumes the whole address (local part allows digits/-)
    assert row["redacted_text"] == "x [EMAIL] y"
    assert row["n_redacted"] == 1
    # the scan, by contrast, reports each family independently on raw text
    scan = pii_scan(df).collect()[0]
    assert scan["n_email"] == 1 and scan["n_phone"] == 1 and scan["n_pii"] == 2


def test_pii_custom_patterns_and_errors(spark):
    df = _df(spark)
    got = pii_scan(df, patterns={"ssn": r"\b\d{3}-\d{2}-\d{4}\b"}).columns
    assert got == ["doc_id", "n_ssn", "n_pii"]
    with pytest.raises(DataFrameValidationError):
        pii_scan(df, patterns={})
    with pytest.raises(DataFrameValidationError):
        pii_scan(df, patterns={"bad name": "x"})
    with pytest.raises(DataFrameValidationError):
        redact_pii(df.drop("text"))
