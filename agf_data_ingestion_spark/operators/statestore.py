"""Crash-safe small-state store: versioned parquet + atomic CURRENT
pointer swap — the commit discipline shared by every read-modify-rewrite
state table in the engine (streaming sketch sinks, the streaming SCD2
dimension).  Spark's in-place ``mode("overwrite")`` deletes the target
before writing, so a crash mid-rewrite destroys the ENTIRE previous
state; with the pointer, a crash at any instant leaves either the old
committed version or the new one, never nothing.

Read rule (the neardup_stream._read_or_none discipline): absent store →
None, CORRUPT store → raise.  Swallowing a read error as "first write"
would silently reset accumulated state — and for sinks carrying a
batch-id idempotency guard, double-count the next redelivery.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def state_read(spark: SparkSession, root: str) -> DataFrame | None:
    """The committed state version (via CURRENT), or the legacy flat
    layout; absent → None; corrupt → raise."""
    cur = os.path.join(root, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as fh:
            return spark.read.parquet(os.path.join(root, fh.read().strip()))
    if not os.path.isdir(root):
        return None
    try:
        df = spark.read.parquet(root)
        df.schema  # force analysis
        return df
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


def state_write(df: DataFrame, root: str, version_hint: int = 0, *, keep_last: int = 1) -> None:
    """Commit ``df`` as the new state ATOMICALLY: fresh version dir →
    CURRENT pointer swap (os.replace) → best-effort cleanup of old
    versions.

    ``keep_last`` retains that many SUPERSEDED versions as a read grace
    window (r4 ADVICE): readers take no lock, so an out-of-process reader
    holding a lazy DataFrame over the previous CURRENT must still find
    its files when its action finally runs — deleting all old versions at
    swap time raced exactly that reader.  One retained predecessor covers
    any reader that resolved CURRENT before the swap; state frames are
    KiB-scale, so the cost is a second tiny dir until the next commit.
    """
    os.makedirs(root, exist_ok=True)
    # the dir the outgoing CURRENT names is what a lock-free reader may
    # have already resolved — it must survive THIS cleanup pass no matter
    # how version names sort (r4 ADVICE: two dirs sharing a replayed
    # batch's version_hint differ only in the random uuid suffix, so a
    # name sort alone retains an arbitrary one)
    try:
        with open(os.path.join(root, "CURRENT")) as fh:
            prev_current = fh.read().strip()
    except FileNotFoundError:
        prev_current = None
    vname = f"v-{version_hint:012d}-{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, vname))
    tmp = os.path.join(root, f"CURRENT.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(root, "CURRENT"))
    # commit order = (hint, mtime): the hint is monotone per caller
    # (batch id / commit count); mtime breaks replayed-batch ties
    def _commit_key(name: str):
        try:
            mtime = os.path.getmtime(os.path.join(root, name))
        except OSError:
            mtime = 0.0
        return (name[:14], mtime, name)

    old = sorted(
        (n for n in os.listdir(root) if n.startswith("v-") and n != vname),
        key=_commit_key,
    )
    keep = set(old[len(old) - keep_last :]) if keep_last > 0 else set()
    if prev_current is not None:
        keep.add(prev_current)
    for name in old:
        if name not in keep:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
