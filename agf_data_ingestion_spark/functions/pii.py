"""PII detection / redaction for training-data curation (OP-X-TEXT).

A standard pre-training scrub pass: find and mask emails, phone numbers,
and IPv4 addresses.  Pure ``regexp_replace`` / ``regexp_extract_all``
column expressions — JVM-side, whole-stage-codegen, no UDFs — so the scrub
runs at scan throughput on any corpus size.

The pattern set is deliberately small and auditable (the curation-pipeline
norm is a reviewed allowlist of patterns, not a kitchen sink); callers
compose additional patterns with ``redact(col, pattern, token)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: local-part@domain.tld — conservative: word chars, dots, +, - only
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: international-ish phone: optional +CC, groups of digits with -/./space,
#: at least 7 digits total.  The lookarounds anchor on digit boundaries —
#: without them the pattern matches INSIDE any long digit run, mangling
#: floats, timestamps, and numeric IDs in scientific data
PHONE_RE = (
    r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ]?)?"
    r"\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}(?![0-9])"
)
#: dotted-quad IPv4 (octet range not enforced — redaction favors recall)
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
#: full-form IPv6 (8 hex groups, case-insensitive classes); the common
#: ::-compressed forms are also caught by allowing 2–7 groups before a
#: trailing '::'-joined tail — recall-favoring like IPV4_RE, anchored on
#: word boundaries so hex-ish prose ("be:ef") never trips it
IPV6_RE = (
    r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
    r"|\b(?:[0-9A-Fa-f]{1,4}:){1,6}:(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5})?\b"
)


def redact(col: Column | str, pattern: str, token: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, token)


def count_matches(col: Column | str, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def scrub_pii(col: Column | str) -> Column:
    """Mask emails → <EMAIL>, phones → <PHONE>, IPv4 → <IP>, IPv6 → <IP6>
    (in that order: emails first so their digits never half-match the
    phone pattern; IPv6 last — its groups are ≤4 hex chars, too short for
    the 10-digit phone pattern to span, so earlier passes can't mangle
    it)."""
    c = F.col(col) if isinstance(col, str) else col
    c = redact(c, EMAIL_RE, "<EMAIL>")
    c = redact(c, PHONE_RE, "<PHONE>")
    c = redact(c, IPV4_RE, "<IP>")
    c = redact(c, IPV6_RE, "<IP6>")
    return c


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category match counts — the audit metric the scrub
    pass reports (how much PII a source contains drives source-level
    filtering decisions)."""
    c = F.col(col) if isinstance(col, str) else col
    # phones counted AFTER the email redaction exactly as the scrub
    # applies it (token replacement, not empty-string strip — stripping
    # could concatenate surrounding digits into a phone the scrub never
    # actually masks, making the audit disagree with the redaction)
    return F.struct(
        count_matches(c, EMAIL_RE).alias("emails"),
        count_matches(redact(c, EMAIL_RE, "<EMAIL>"), PHONE_RE).alias("phones"),
        count_matches(c, IPV4_RE).alias("ips"),
        count_matches(c, IPV6_RE).alias("ips6"),
    )
