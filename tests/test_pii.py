"""PII detection/redaction operator (operators/pii.py): per-class
counts, sequential redaction, precision edges (an SSN is not a phone,
an email's dotted digits are not an IP). The cross-engine value-level
check is the doc_pii_scrub parity entry; these tests pin the operator
semantics the registry query builds on."""

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


def test_has_pii_and_clean_text_untouched(scanned):
    assert not scanned[4].has_pii
    assert scanned[4].redacted_text == ROWS[3][1]
    assert all(scanned[i].has_pii for i in (1, 2, 3, 5))


def test_redaction_tokens(scanned):
    assert scanned[1].redacted_text == "mail me at <EMAIL> today"
    assert scanned[2].redacted_text == "ssn <SSN> and phone <PHONE>"
    assert scanned[3].redacted_text == "server at <IP> and <IP>"
    assert scanned[5].redacted_text == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_ssn_is_not_a_phone_and_date_is_not_an_ssn(scanned):
    # 3-2-4 (SSN) must not satisfy the 3-3-4 phone shape, and the
    # ISO date 2024-01-02 (4-2-2) must not satisfy the SSN shape
    assert scanned[2].n_phone == 1  # only 555-014-2233
    assert scanned[4].n_ssn == 0


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
