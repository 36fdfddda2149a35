"""PII detection + redaction over text columns (LLM-pipeline core).

Training corpora are scrubbed of personally identifiable information
before anything else happens to them; the standard recipe (C4, Dolma,
FineWeb pipelines) is regex families per PII class applied map-side.
This module keeps every pattern inside the Java∩RE2 portable regex
subset (character classes, ``\\d``, ``\\b``, bounded repetition — no
lookaround), so the SAME pattern string drives Spark's JVM
``regexp_count``/``regexp_replace`` and the DuckDB oracle
(``regexp_extract_all`` / ``regexp_replace(..., 'g')``), and both
engines agree match-for-match.

100 TB shape: detection and redaction are pure column expressions —
no shuffle, no UDF, no Python on the hot path; they run inside
whole-stage codegen wherever the text scan runs. The only exchange a
PII job needs is whatever aggregation the caller adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (class name, pattern, replacement token), in REDACTION ORDER.
#: Order matters once a class's text could feed a later pattern:
#: emails go first (their local part may contain digits and dots),
#: SSN before the generic phone shape, IPv4 last (dots everywhere).
#: Patterns are deliberately precision-leaning — a corpus scrubber
#: would rather leave an ambiguous token than destroy clean text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_count_cols(text_col: Column | str = "text") -> list[Column]:
    """One ``n_<class>`` count column per PII class, each counted on
    the ORIGINAL text (counts are independent per class; redaction
    order cannot change them)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]


def redact_pii(text_col: Column | str = "text") -> Column:
    """The text with every PII class replaced by its ``<CLASS>``
    token, applied in ``PII_PATTERNS`` order (sequential
    ``regexp_replace`` — replace-all per pattern)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII profile: the input columns plus ``n_<class>``
    counts, ``has_pii``, and the redacted text. Pure map — composes
    with any downstream filter/aggregate without adding a shuffle."""
    counts = pii_count_cols(text_col)
    out = df.select("*", *counts)
    any_pii = None
    for name, _p, _t in PII_PATTERNS:
        col = F.col(f"n_{name}") > 0
        any_pii = col if any_pii is None else (any_pii | col)
    return out.select(
        "*",
        any_pii.alias("has_pii"),
        redact_pii(text_col).alias("redacted_text"),
    )
