"""Path parsing/derivation expressions.

Replicates the reference's key-structure semantics exactly (including its
quirks) as JVM-side column expressions:

* key validation        — reference ``lambda/agf_ingestion_lambda.py:71-93``
* positional extraction — ``:187-191``
* basename/extension    — ``:399-400, 437-438``
* payload-path rewrite  — ``:379-393``
* experiment-id synth   — ``:359-377``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DIGITS = "^[0-9]+$"


def _segments(key: Column | str) -> Column:
    return F.split(F.col(key) if isinstance(key, str) else key, "/")


def path_segment(key: Column, i: int) -> Column:
    """1-based positional segment of a '/'-separated key (null past end)."""
    return F.element_at(_segments(key), i)


def is_valid_raw_key(key: Column) -> Column:
    """Structural validation of a raw-zone key.

    Mirrors reference ``validate_s3_path`` (:71-93): must start ``raw/``,
    have >= 6 segments, and segments 3-5 (1-based; YYYY/MM/DD) all digits.
    Expressed as a boolean column so invalid rows route to quarantine
    instead of raising (OP-STRM-ERR record isolation).
    """
    parts = _segments(key)
    # coalesce: a NULL key must be INVALID (false), not NULL — a NULL
    # verdict is excluded by BOTH split_valid filters (neither `_valid`
    # nor `~_valid` is true for NULL), silently losing the row instead of
    # quarantining it
    return F.coalesce(
        key.startswith("raw/")
        & (F.size(parts) >= 6)
        & F.element_at(parts, 3).rlike(_DIGITS)
        & F.element_at(parts, 4).rlike(_DIGITS)
        & F.element_at(parts, 5).rlike(_DIGITS),
        F.lit(False),
    )


def basename(path: Column) -> Column:
    """Last '/'-segment (reference :399 ``file_path.split('/')[-1]``)."""
    return F.substring_index(path, "/", -1)


def dirname(path: Column) -> Column:
    """Everything before the last '/'; '' when no '/' present.

    Reference :383 ``'/'.join(key.split('/')[:-1])``.
    """
    return F.when(
        path.contains("/"), F.regexp_replace(path, "/[^/]*$", "")
    ).otherwise(F.lit(""))


def file_extension(name: Column) -> Column:
    """Lower-cased extension, 'unknown' when the name has no dot.

    Reference :400 ``name.split('.')[-1].lower() if '.' in name else 'unknown'``.
    """
    return F.when(
        name.contains("."), F.lower(F.substring_index(name, ".", -1))
    ).otherwise(F.lit("unknown"))


def payload_s3_key(run_json_key: Column, manifest_path: Column) -> Column:
    """Physical S3 key of a manifest file entry.

    The sync agent inserts ``payload/`` after the staff segment, so manifest
    path ``staff/exp/f.txt`` lives at ``<run_dir>/staff/payload/exp/f.txt``
    (reference :379-393, including the single-segment branch :389-391 which
    degenerately produces ``<seg>/payload/<seg>``).
    """
    parts = F.split(manifest_path, "/")
    head = F.element_at(parts, 1)
    multi = F.concat_ws(
        "/", head, F.lit("payload"), F.array_join(F.slice(parts, 2, F.size(parts) - 1), "/")
    )
    single = F.concat_ws("/", head, F.lit("payload"), F.substring_index(manifest_path, "/", -1))
    rewritten = F.when(F.size(parts) > 1, multi).otherwise(single)
    return F.concat_ws("/", dirname(run_json_key), rewritten)


def synth_experiment_id(manifest_path: Column, staff_name: Column, run_id: Column) -> Column:
    """Experiment-id synthesis for run-manifest file entries.

    Reference :359-377: ``{folder}_{staff}`` when segment 2 exists and is
    not the final (file) segment, else ``standalone_{staff}_{run_id}``.
    ``staff_name`` here must already be defaulted to the first path segment
    (caller does ``coalesce(entry.staff_name, element_at(parts, 1))``).
    """
    parts = F.split(manifest_path, "/")
    folder = F.when(F.size(parts) >= 2, F.element_at(parts, 2))
    is_real_folder = folder.isNotNull() & (folder != F.element_at(parts, -1))
    # plain concat null-propagates: a NULL run_id would null the WHOLE id
    # (then fail keyed upserts downstream) where the reference f-string
    # (:374) still renders 'standalone_{staff}_None' — coalesce to the
    # literal the reference would print
    return F.when(
        is_real_folder, F.concat_ws("_", folder, staff_name)
    ).otherwise(
        F.concat(
            F.lit("standalone_"),
            F.coalesce(staff_name, F.lit("None")),
            F.lit("_"),
            F.coalesce(run_id, F.lit("None")),
        )
    )
