"""PII detection/redaction operator (operators/pii.py): progressive
per-class counts, sequential redaction, precision edges (an SSN is not
a phone, an email-embedded SSN shape counts as email, an invalid octet
is not an IP). The cross-engine value-level check is the doc_pii_scrub
parity entry; these tests pin the operator semantics the registry
query builds on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import pii

ROWS = [
    (1, "mail me at jo.doe+x@sub.example.org today"),
    (2, "ssn 123-45-6789 and phone 555-014-2233"),
    (3, "server at 192.168.0.1 and 10.0.0.255"),
    (4, "clean text with digits 12345 and a date 2024-01-02"),
    (5, "two mails a@b.io c@d.co and ip 8.8.8.8"),
    # round-8 classes
    (6, "card 4111-1111-1111-1234 and iban GB82WEST12345698765432"),
    (7, "call (212) 555-0123 or +1-202-555-0199"),
    (8, "nic 00:1a:2b:3c:4d:5e up at 10.0.0.7"),
    # precision edges: invalid octets are not an IP; a version string
    # of valid octets still is (documented recall-leaning trade-off)
    (9, "bogus 999.999.999.999 but version 1.2.3.4"),
    # overlap: the SSN/phone-shaped local part belongs to the EMAIL —
    # progressive counting must not also bill it to ssn/phone
    (10, "reach 123-45-6789@x.com please"),
]


@pytest.fixture(scope="module")
def scanned(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r.doc_id: r for r in pii.pii_scan(df).collect()}


def test_counts_per_class(scanned):
    assert (scanned[1].n_email, scanned[1].n_ssn, scanned[1].n_phone, scanned[1].n_ipv4) == (1, 0, 0, 0)
    assert (scanned[2].n_email, scanned[2].n_ssn, scanned[2].n_phone, scanned[2].n_ipv4) == (0, 1, 1, 0)
    assert (scanned[3].n_email, scanned[3].n_ssn, scanned[3].n_phone, scanned[3].n_ipv4) == (0, 0, 0, 2)
    assert (scanned[4].n_email, scanned[4].n_ssn, scanned[4].n_phone, scanned[4].n_ipv4) == (0, 0, 0, 0)
    assert scanned[5].n_email == 2 and scanned[5].n_ipv4 == 1


def test_round8_classes(scanned):
    assert (scanned[6].n_cc, scanned[6].n_iban) == (1, 1)
    assert (scanned[7].n_phone_paren, scanned[7].n_phone_intl, scanned[7].n_phone) == (1, 1, 0)
    assert (scanned[8].n_mac, scanned[8].n_ipv4) == (1, 1)


def test_ipv4_valid_octets_only(scanned):
    # 999.* is rejected; 1.2.3.4 (all valid octets) still redacts
    assert scanned[9].n_ipv4 == 1
    assert scanned[9].redacted_text == "bogus 999.999.999.999 but version <IP>"


def test_progressive_counts_resolve_overlap(scanned):
    # 123-45-6789@x.com: email wins; ssn/phone see the <EMAIL> token
    assert scanned[10].n_email == 1
    assert scanned[10].n_ssn == 0 and scanned[10].n_phone == 0
    assert scanned[10].redacted_text == "reach <EMAIL> please"


def test_has_pii_and_clean_text_untouched(scanned):
    assert not scanned[4].has_pii
    assert scanned[4].redacted_text == ROWS[3][1]
    assert all(scanned[i].has_pii for i in (1, 2, 3, 5, 6, 7, 8, 9, 10))


def test_redaction_tokens(scanned):
    assert scanned[1].redacted_text == "mail me at <EMAIL> today"
    assert scanned[2].redacted_text == "ssn <SSN> and phone <PHONE>"
    assert scanned[3].redacted_text == "server at <IP> and <IP>"
    assert scanned[5].redacted_text == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert scanned[6].redacted_text == "card <CC> and iban <IBAN>"
    assert scanned[7].redacted_text == "call <PHONE> or <PHONE>"
    assert scanned[8].redacted_text == "nic <MAC> up at <IP>"


def test_ssn_is_not_a_phone_and_date_is_not_an_ssn(scanned):
    # 3-2-4 (SSN) must not satisfy the 3-3-4 phone shape, and the
    # ISO date 2024-01-02 (4-2-2) must not satisfy the SSN shape
    assert scanned[2].n_phone == 1  # only 555-014-2233
    assert scanned[4].n_ssn == 0


def test_progressive_counts_sum_to_replacements(scanned):
    # every n_<class> total must equal the number of <TOKEN>s the
    # redaction emitted — the reconciliation the r7 advice asked for
    import re

    for r in scanned.values():
        n_tokens = len(re.findall(r"<(?:EMAIL|IBAN|CC|SSN|PHONE|MAC|IP)>", r.redacted_text))
        n_counts = sum(r[f"n_{name}"] for name, _p, _t in pii.PII_PATTERNS)
        assert n_counts == n_tokens, (r.doc_id, n_counts, n_tokens)


def test_scan_is_shuffle_free(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = pii.pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_count_cols_match_manual(spark):
    # one pattern, many matches on one line — replace-all semantics
    df = spark.createDataFrame([(1, "a@b.io x c@d.co y e@f.gg")], "doc_id long, text string")
    row = df.select(*pii.pii_count_cols("text"), pii.redact_pii("text").alias("r")).first()
    assert row.n_email == 3
    assert row.r == "<EMAIL> x <EMAIL> y <EMAIL>"


def test_pii_scan_composes_with_structured_streaming(spark, tmp_path):
    """The scan is pure column expressions, so the SAME operator runs
    unchanged inside a streaming pipeline (the scrub-at-ingest shape):
    a file stream of documents through pii_scan drains to exactly the
    batch result."""
    from netcdf_olap_spark.streaming.runner import run_to_memory

    d = str(tmp_path / "docs")
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    df.coalesce(2).write.parquet(d)
    batch = {tuple(r) for r in pii.pii_scan(spark.read.parquet(d)).collect()}
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    got = {tuple(r) for r in run_to_memory(pii.pii_scan(stream)).collect()}
    assert got == batch and len(got) == len(ROWS)
