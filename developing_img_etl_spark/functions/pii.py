"""PII detection + redaction column builders (training-data mandate).

Scrubbing personally identifiable information is a standard pass over
a pretraining corpus. Everything here is Catalyst regexp expressions —
JVM-side, codegen'd, no UDF — so redaction runs at scan speed over
100 TB. Patterns are kept ASCII and dialect-portable (valid under both
Java regex and RE2) so the DuckDB oracle mirrors them verbatim.

Redaction order is part of the contract: EMAIL first (its pattern
contains digits and dots that the looser patterns could clip), then
PHONE, then IPV4. Counting uses the same patterns, so
``pii_count(text) == 0`` after ``redact(text)`` by construction.

Counting semantics (ADVICE r3): per-type counts are RAW PATTERN HITS
on the original text and may overlap across types — a phone number
embedded in an email local part ('555-123-4567@x.org') increments both
``phone_count`` and ``email_count`` yet is redacted once, as <EMAIL>,
by the ordered pass. So per-type counts are detection telemetry (an
upper bound on replacements of that type), NOT replacement counts;
only the aggregate guarantee "every count is 0 after redact()" is
exact. Callers needing replacement-exact per-type counts should count
on the progressively-redacted text between passes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# (pattern, replacement token) in contract order.
PATTERNS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def email_count(text: Column) -> Column:
    return _count(text, EMAIL_RE)


def phone_count(text: Column) -> Column:
    return _count(text, PHONE_RE)


def ipv4_count(text: Column) -> Column:
    return _count(text, IPV4_RE)


def redact(text: Column) -> Column:
    """Replace every PII match with its type token, in contract order."""
    out = text
    for pattern, token in PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out
