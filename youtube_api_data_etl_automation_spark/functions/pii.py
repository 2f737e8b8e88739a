"""PII detection / redaction scalars for LLM-data curation.

A training-data pipeline must strip personally identifiable information
before corpora ship (the reference itself handles channel/video identifiers
— the analogous capture surface — `fetch_youtube_data.py:129-141`; redaction
is the standard curation step layered on top, cf. C4/Dolma-style pipelines).

All pure Column regexp expressions — JVM-side, codegen'd, zero Python on the
data path — and deliberately written in the regex subset Java's engine and
DuckDB's RE2 interpret identically (no backrefs, no lookaround), so every
function has an exact DuckDB oracle mirror (`plans/curation.py`).

At 100 TB this is a map-only projection: no shuffle, scales linearly, and
the redacted text can replace the original in the same scan-to-sink pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared Java/RE2 subset (word-boundary + classes + counted repetition only).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# Redaction order is part of the contract (email first: its char-class
# could otherwise consume a preceding replacement token's brackets — never
# the reverse, since '[EMAIL]' contains no digits or dots).
REDACTIONS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (PHONE_RE, "[PHONE]"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def email_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(EMAIL_RE)).cast("int")


def ipv4_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(IPV4_RE)).cast("int")


def phone_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(PHONE_RE)).cast("int")


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its bracket token, in REDACTIONS order."""
    out = _c(col)
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
