"""Timestamp parsing with the reference's lenient/strict dichotomy.

Reference ``parse_timestamp`` (``lambda/agf_ingestion_lambda.py:42-68``):
ISO-8601 with optional 'Z' suffix; empty/unparseable input either falls back
to "now" with a warning (lenient, the default) or raises (strict — prod
config ``agf-lambda-stack.yaml:132-133``).

Spark translation: a null-on-failure cast; lenient = ``coalesce(parsed,
now)``; strict = leave null so the caller can split the rows into a
quarantine output (OP-SINK-DLQ) instead of failing the batch.

Determinism note (SURVEY.md §7 risk register): "now" is an explicit
parameter — callers pass a fixed instant for reproducible runs/tests;
``None`` falls back to ``current_timestamp()``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def now_column(now: _dt.datetime | None) -> Column:
    if now is None:
        return F.current_timestamp()
    if now.tzinfo is not None:
        # convert to UTC BEFORE stripping tzinfo: a bare .replace(tzinfo=
        # None) keeps the local wall-clock digits, shifting the pinned
        # instant by the offset in the UTC session (e.g. --now ...+05:00
        # would land 5 hours late)
        now = now.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return F.lit(now).cast("timestamp")


def parse_iso_timestamp(
    ts: Column, *, strict: bool = False, now: _dt.datetime | None = None
) -> Column:
    """Parse an ISO-8601 string column to TimestampType.

    ``try_cast`` accepts the same shapes ``datetime.fromisoformat`` does
    after the reference's ``Z -> +00:00`` normalization (date-time with 'T'
    or ' ', optional fraction, optional offset) and yields NULL on garbage
    (ANSI-safe). Empty strings cast to NULL too, matching the reference's
    treatment of empty as invalid (:54-58).
    """
    parsed = F.regexp_replace(F.trim(ts), "Z$", "+00:00").try_cast("timestamp")
    if strict:
        return parsed
    return F.coalesce(parsed, now_column(now))


def epoch_seconds(ts: Column) -> Column:
    """Timestamp → integral epoch seconds (reference ``Decimal(str(int(ts)))``
    at :215,:223,:280,:285,:411-412,:449-450)."""
    return ts.cast("long")
