"""PII scrubbing expressions (shared by the registered pii_scrub query
and the end-to-end curation composite).

Patterns are deliberately dialect-neutral (character classes, +, {n}
only — identical semantics in Java regex and DuckDB's RE2); replacement
order email -> phone -> IPv4 is fixed and pinned by the registered
query's scrubbed-text md5 oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
PHONE_RE = "555-[0-9]{4}"
IP_RE = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"


def scrub_text(text: Column) -> Column:
    """Redact emails, phone numbers, and IPv4s, in that order."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ),
        IP_RE,
        "[IP]",
    )


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in text, pre-scrub."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
        F.regexp_count(text, F.lit(IP_RE)).cast("long"),
    )
