"""PII detection + redaction over text columns (LLM-pipeline core).

Training corpora are scrubbed of personally identifiable information
before anything else happens to them; the standard recipe (C4, Dolma,
FineWeb pipelines) is regex families per PII class applied map-side.
This module keeps every pattern inside the Java∩RE2 portable regex
subset (character classes, ``\\d``, ``\\b``, bounded repetition,
non-capturing groups — no lookaround, no backreferences), so the SAME
pattern string drives Spark's JVM ``regexp_count``/``regexp_replace``
and the DuckDB oracle (``regexp_extract_all`` /
``regexp_replace(..., 'g')``), and both engines agree match-for-match.

Counting is PROGRESSIVE (round-8): class *i* is counted on the text
already redacted by classes *0..i-1*, so every ``n_<class>`` agrees
exactly with what the sequential redaction replaced — an SSN-shaped
local part inside ``123-45-6789@x.com`` counts as email, never as a
phantom SSN.  Replacement tokens contain no digits, ``@``, ``:`` or
``+``, so a later class can never match INSIDE a replacement token —
though a replacement can still expose a word boundary that lets a
``\\b``-anchored later pattern fire beside it (e.g. the IPv4 in
``9user@x.com1.2.3.4`` becomes matchable once the email is redacted).
That is fine for reconciliation: both engines replay the identical
progressive sequence, so every count agrees exactly with the redaction
it was measured on.

Precision notes (deliberate, documented trade-offs):
- The credit-card shape accepts mixed separators (``4111-1111 1111``):
  RE2 has no backreferences, so a uniform-separator constraint is not
  expressible in the portable subset.
- IPv4 requires valid octets (0-255) but still redacts version-like
  strings (``1.2.3.4`` → ``<IP>``) — recall-leaning for this one
  class; a dotted quad of valid octets is indistinguishable from an
  address without context.
- IBAN-lite checks country-prefix shape + length only (no mod-97
  checksum — not expressible as a regex).

100 TB shape: detection and redaction are pure column expressions —
no shuffle, no UDF, no Python on the hot path; they run inside
whole-stage codegen wherever the text scan runs. The only exchange a
PII job needs is whatever aggregation the caller adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: One valid IPv4 octet (0-255), no leading zeros beyond a bare 0.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"

#: (class name, pattern, replacement token), in REDACTION ORDER.
#: Order matters because counting is progressive and one class's text
#: can embed another's shape: emails first (the local part may contain
#: SSN/phone/dotted-digit shapes), IBAN/credit-card before the phone
#: family (long digit runs), international and parenthesized phones
#: before the bare NANP shape (they CONTAIN it), IPv4 last (dots
#: everywhere). Patterns are precision-leaning — a corpus scrubber
#: would rather leave an ambiguous token than destroy clean text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone_paren", r"\(\d{3}\)[ ]?\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("phone_intl", r"\+\d{1,2}[-. ]?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("mac", r"\b[0-9A-Fa-f]{2}(?::[0-9A-Fa-f]{2}){5}\b", "<MAC>"),
    ("ipv4", r"\b" + _OCTET + r"(?:\." + _OCTET + r"){3}\b", "<IP>"),
]


def pii_progressive_counts(text_col: Column | str = "text") -> list[Column]:
    """One ``n_<class>`` count column per PII class, each counted on
    the text as redacted by every EARLIER class — the counts sum to
    exactly the number of replacements ``redact_pii`` performs."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    cols = []
    for name, pat, tok in PII_PATTERNS:
        cols.append(F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, tok)
    return cols


def pii_count_cols(text_col: Column | str = "text") -> list[Column]:
    """Per-class counts on the ORIGINAL (un-redacted) text — the raw
    per-class match census, which can exceed the progressive counts
    when one class's text embeds another's shape. Use
    :func:`pii_progressive_counts` when the counts must reconcile with
    ``redact_pii``'s output (the registry query does)."""
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
    """Per-row PII profile: the input columns plus progressive
    ``n_<class>`` counts, ``has_pii``, and the redacted text. Pure
    map — composes with any downstream filter/aggregate without
    adding a shuffle."""
    counts = pii_progressive_counts(text_col)
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
