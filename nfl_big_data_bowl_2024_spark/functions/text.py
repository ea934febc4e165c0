"""Text-scrubbing column functions (PII redaction).

A 100 TB web-crawl corpus cannot ship raw emails / phone numbers / IP
addresses into a training set; redaction must be a map-only column
expression (no shuffle, no Python boundary) so it composes into the
curation funnel at zero extra passes. Patterns are kept inside the
RE2 <-> Java-regex common subset (``\\d``, ``\\b``, bounded ``{m,n}``
quantifiers, character classes) so the DuckDB oracle can mirror the
exact chain; Spark's ``regexp_replace`` is global by default, DuckDB
needs the ``'g'`` flag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Applied IN ORDER: the email pattern must run before the phone/IP ones so
# digits inside a local-part are consumed as <EMAIL>, not re-matched later.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Replace every email / IPv4 / short-form phone match with a typed
    placeholder token. Pure JVM ``regexp_replace`` chain — whole-stage
    codegen keeps it inside the scan's projection."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def count_pii(col: Column) -> Column:
    """Number of PII matches that :func:`redact_pii` would replace —
    counted against the SAME pattern order (the email count is taken
    first, then IP/phone are counted on the email-redacted text, so a
    digit-bearing local-part is never double-counted)."""
    total = F.lit(0).cast("long")
    cur = col
    for pattern, token in PII_PATTERNS:
        total = total + F.regexp_count(cur, F.lit(pattern)).cast("long")
        cur = F.regexp_replace(cur, pattern, token)
    return total
