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
    vname = f"v-{version_hint:012d}-{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, vname))
    tmp = os.path.join(root, f"CURRENT.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(root, "CURRENT"))
    # version names sort by (hint, uuid); the hint is monotone per caller
    # (batch id / commit count), so lexicographic order == commit order
    old = sorted(n for n in os.listdir(root) if n.startswith("v-") and n != vname)
    for name in old[: max(0, len(old) - keep_last)]:
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
