"""PII scrubbing expressions — email / IPv4 / phone redaction.

A training-data pipeline redacts contact information before a corpus ships
(SURVEY §2.D training-pipeline extensions; the reference's nearest string
op is the identifier cleanse, ``utils.py:267-295``).  Everything here is a
chain of JVM ``regexp_replace`` / ``regexp_count`` expressions — no UDFs,
fully whole-stage-codegen'd, so redaction rides the scan for free at any
scale.

Pattern dialect: Java regex on the Spark side, RE2 in the DuckDB oracle —
the patterns below deliberately use only the common subset (character
classes, bounded quantifiers, ``\\b``) so both engines match identically.
Redaction ORDER matters and is fixed (email → IPv4 → phone): emails eat
the digits that would otherwise look like phone fragments, and IPv4 must
go before the phone pattern sees digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Common-subset (Java ∩ RE2) patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(c: Column | str) -> Column:
    """Text with emails, IPv4 addresses, and phone numbers replaced by
    placeholder tokens, in that order."""
    out = F.regexp_replace(_col(c), EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def email_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(EMAIL_RE))


def ipv4_count(c: Column | str) -> Column:
    """IPv4 matches in the text AFTER email redaction (an address inside an
    email never double-counts)."""
    return F.regexp_count(
        F.regexp_replace(_col(c), EMAIL_RE, EMAIL_TOKEN), F.lit(IPV4_RE)
    )


def phone_count(c: Column | str) -> Column:
    """Phone matches AFTER email+IPv4 redaction (IP octet runs never
    double-count as phones)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(_col(c), EMAIL_RE, EMAIL_TOKEN), IPV4_RE, IP_TOKEN
    )
    return F.regexp_count(scrubbed, F.lit(PHONE_RE))
