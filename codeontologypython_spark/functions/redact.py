"""PII redaction for a training-data pipeline: regex-scrub emails, IPv4
addresses and phone numbers from document text, with per-document match
counts (the audit signal corpus curation reports track).

Scale-first: pure JVM-side column expressions (sequential ``regexp_replace``
inside whole-stage codegen — no Python, no shuffle; the operator is
embarrassingly parallel and survives any scale the scan survives).

Engine portability: every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences — so the
DuckDB oracle in ``__spark_entry__.py`` reproduces the redacted bytes
exactly. Patterns are applied in a fixed order (email, then IPv4, then
phone) on both engines; the phone pattern cannot match the inserted
placeholder tokens (they contain no digit runs), so ordering is stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# common Java-regex/RE2 subset; \b is supported by both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# international-ish phone: +CC then 7-14 digits, or NNN-NNN-NNNN
PHONE_RE = r"\+[0-9]{7,15}|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

_PATTERNS = [(EMAIL_RE, "[EMAIL]"), (IPV4_RE, "[IP]"), (PHONE_RE, "[PHONE]")]


def redact_pii(text: Column) -> Column:
    """Redacted text: each PII class replaced by its placeholder, applied
    email -> IPv4 -> phone (same order as the SQL oracle)."""
    out = text
    for pat, repl in _PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def _n_matches(text: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the ORIGINAL text (counted before any
    replacement so classes never shadow each other)."""
    return {
        "n_emails": _n_matches(text, EMAIL_RE),
        "n_ips": _n_matches(text, IPV4_RE),
        "n_phones": _n_matches(text, PHONE_RE),
    }
