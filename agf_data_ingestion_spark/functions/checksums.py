"""SHA-256 checksum validation/normalization.

Reference ``validate_checksum`` (``lambda/agf_ingestion_lambda.py:96-112``):
strip any ``sha256:`` prefix, trim, require exactly 64 hex chars, lowercase.
Invalid checksums raise in the reference; here validity is a predicate so
bad rows go to quarantine (record-level isolation, OP-STRM-ERR).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHA256_RE = "^[a-fA-F0-9]{64}$"


def _cleaned(checksum: Column) -> Column:
    # str.replace removes every occurrence, not just a prefix — replicate.
    return F.trim(F.regexp_replace(checksum, "sha256:", ""))


def is_valid_checksum(checksum: Column) -> Column:
    # NULL input must be INVALID (false), not NULL — a NULL verdict is
    # excluded by both sides of a filter/~filter split, silently losing
    # the row (same rule as paths.is_valid_raw_key)
    return F.coalesce(_cleaned(checksum).rlike(SHA256_RE), F.lit(False))


def normalize_checksum(checksum: Column) -> Column:
    """Lower-cased 64-hex digest; NULL when invalid (caller quarantines)."""
    clean = _cleaned(checksum)
    return F.when(clean.rlike(SHA256_RE), F.lower(clean))
