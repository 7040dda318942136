"""Bucketed-table helpers: pre-shuffled layouts for repeated co-located
joins (the "co-locate joins via bucketing" scale lever).

A fact table joined on the same key by many downstream queries pays one
shuffle per query; bucketing pays the shuffle ONCE at write time — both
sides bucketed by the join key into the same bucket count join with zero
exchange (verified in tests: no ``Exchange`` above the scan in the
executed plan).  At 100 TB the write-side sort/bucket cost amortizes over
every subsequent join, and bucket pruning serves point lookups.

Spark requires the session catalog (``saveAsTable``) for bucket metadata —
plain ``.parquet(path)`` writes lose it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 16,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-merged-ready)
    catalog table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_bucketed_snapshot(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 16,
    sort_by: list[str] | None = None,
    mode: str = "append",
    op: str | None = None,
) -> int:
    """Commit ``df`` to a SNAPSHOT table in the BUCKETED file layout (r6):
    the batch is written by Spark's bucketed writer (bucket id encoded in
    each file name) through a throwaway external scratch table, and the
    produced files are linked into the snapshot as one atomic commit
    (``snapshot_commit_files``).  The store gets OCC / time travel /
    expiry from the snapshot format AND the exchange-free probe layout
    from bucketing (``bucketed_snapshot_frame``) — the combination
    neither gives alone.

    The pre-write ``repartition(n_buckets, *bucket_by)`` aligns task
    partitioning with the bucket hash (both murmur3 % n), so each commit
    produces ~one file per non-empty bucket instead of tasks × buckets."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_commit_files

    spark = df.sparkSession
    scratch_dir = os.path.join(table, "_scratch", uuid.uuid4().hex)
    scratch_tbl = f"agf_bucketed_scratch_{uuid.uuid4().hex}"
    writer = (
        df.repartition(n_buckets, *bucket_by)
        .write.option("path", scratch_dir)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.mode("overwrite").saveAsTable(scratch_tbl)
    try:
        return snapshot_commit_files(
            table, scratch_dir, schema_from=df, mode=mode, op=op
        )
    finally:
        # external table: DROP keeps the files; the commit linked them
        # into the data dir, so the scratch copies can go
        spark.sql(f"DROP TABLE IF EXISTS {scratch_tbl}")
        shutil.rmtree(scratch_dir, ignore_errors=True)


def bucketed_snapshot_frame(
    spark: SparkSession,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 16,
    sort_by: list[str] | None = None,
    version: int | None = None,
) -> DataFrame:
    """A DataFrame over one snapshot VERSION of a bucketed snapshot store
    that Spark plans as a BUCKETED scan: the version's files (bucket ids
    in their basenames) are hardlinked into an immutable per-version
    probe dir, and a catalog table with the matching ``CLUSTERED BY``
    spec is created over it.  A join against this frame needs NO Exchange
    on the store side — only the (small) probe side shuffles to
    ``n_buckets`` (plan-pinned in tests/test_neardup_stream.py).

    The probe dir is content-addressed by version: concurrent readers
    race benignly on creation (atomic rename, first wins), later calls
    reuse it; expiry removes probe dirs of expired versions.  Creation is
    O(files) METADATA (one hardlink per live file — no data copied), the
    same per-commit trade the segment-manifest derivation already makes;
    the data bytes are never duplicated."""
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_manifest,
        snapshot_schema,
    )

    v = current_version(table) if version is None else version
    m = read_manifest(table, v)
    from agf_data_ingestion_spark.sources.snapshots import (
        _fields_of,
        _is_identity,
    )

    if (
        any(f.get("dv") for f in m["files"])
        or m.get("eq_deletes")
        or not _is_identity(_fields_of(m))
    ):
        # a hardlinked bucketed scan cannot apply deletion vectors,
        # equality deletes, or a renamed field registry; fall back to the
        # registry-driven merge-on-read path (correct, loses the
        # exchange-free layout) until compaction / a rewrite restores it
        from agf_data_ingestion_spark.sources.snapshots import _read_entries

        return _read_entries(
            spark,
            m["files"],
            eq_deletes=m.get("eq_deletes"),
            fields=_fields_of(m),
        )
    probe_dir = os.path.join(table, "_probe", f"v{v:08d}")
    if not os.path.isdir(probe_dir):
        tmp = f"{probe_dir}.tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp)
        for f in m["files"]:
            os.link(f["path"], os.path.join(tmp, os.path.basename(f["path"])))
        try:
            os.rename(tmp, probe_dir)
        except OSError:  # concurrent creator won — identical content
            shutil.rmtree(tmp, ignore_errors=True)
    cols = ", ".join(f"`{n}` {t}" for n, t in snapshot_schema(table, v))
    bcols = ", ".join(f"`{c}`" for c in bucket_by)
    name = f"agf_probe_{hashlib.md5(f'{table}@{v}'.encode()).hexdigest()[:16]}"
    sort_clause = (
        f" SORTED BY ({', '.join(f'`{c}`' for c in sort_by)})" if sort_by else ""
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({bcols}){sort_clause} INTO {n_buckets} BUCKETS "
        f"LOCATION '{probe_dir}'"
    )
    return spark.table(name)


def prune_probe_dirs(
    spark: SparkSession, table: str, *, keep_last: int = 2
) -> int:
    """Drop per-version probe dirs (and their session catalog tables)
    older than the newest ``keep_last`` versions that have one — the
    in-stream growth bound for continuous writers (a per-batch probe dir
    is O(files) hardlinks; N batches would otherwise accumulate N dirs).
    Deleting a hardlink under an OPEN scan is safe on POSIX (the inode
    survives until the handle closes); readers pinned to an expired-probe
    version simply re-create the dir from the still-live data files."""
    root = os.path.join(table, "_probe")
    if not os.path.isdir(root):
        return 0
    versions = sorted(
        int(n[1:]) for n in os.listdir(root)
        if n.startswith("v") and n[1:].isdigit()
    )
    dropped = 0
    for v in versions[:-keep_last] if keep_last else versions:
        shutil.rmtree(os.path.join(root, f"v{v:08d}"), ignore_errors=True)
        name = f"agf_probe_{hashlib.md5(f'{table}@{v}'.encode()).hexdigest()[:16]}"
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:  # catalog may be gone mid-shutdown; best-effort
            pass
        dropped += 1
    return dropped


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    *,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed tables — plans with no shuffle on
    either side when bucket specs match.

    ``force_sort_merge`` pins the merge strategy (useful when one side is
    under the broadcast threshold but you specifically want the
    exchange-free bucketed SMJ, e.g. to benchmark it)."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
