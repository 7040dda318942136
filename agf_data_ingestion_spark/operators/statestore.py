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


def state_write(df: DataFrame, root: str, version_hint: int = 0) -> None:
    """Commit ``df`` as the new state ATOMICALLY: fresh version dir →
    CURRENT pointer swap (os.replace) → best-effort cleanup of old
    versions."""
    os.makedirs(root, exist_ok=True)
    vname = f"v-{version_hint:012d}-{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, vname))
    tmp = os.path.join(root, f"CURRENT.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(root, "CURRENT"))
    for name in os.listdir(root):
        if name.startswith("v-") and name != vname:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
