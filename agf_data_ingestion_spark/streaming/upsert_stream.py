"""Continuous CDC upsert into a snapshot table (OP-X-EQDELETE ×
OP-STRM-*): a Structured Streaming change feed applies one micro-batch
at a time through ``snapshot_merge(mode='eq')`` — each batch commits
O(batch) bytes with ZERO reads of the target (the whole point of the
equality-delete rung: the reference's conditional-put ingest semantics,
``agf_ingestion_lambda.py:227-236``, running continuously against a
table position deletes would have to scan).

Exactly-once follows the ann_stream/mv pattern verbatim: the micro-batch
id is recorded AS the snapshot commit op label
(``cdc_upsert@[<stream>#]<batch_id>``) so the replay bookmark and the
data move in ONE atomic manifest swap, and a durable per-stream
high-water mark (``<table>/_snapshots/upsert_hwm.json``, tmp+replace)
survives snapshot expiry dropping the commit from retained history; the
history check covers the microsecond window between a commit and its HWM
write.  The checkpoint location IS the stream identity — a fresh
checkpoint dir (batch ids restart at 0) is a new stream, never deduped
against an old one.

Micro-batch semantics:

* ``order_col`` (optional): a CDC feed may carry several changes to one
  key inside a batch — the LAST one (max ``order_col``, unique-key
  tiebreak) wins, computed with a batch-sized window before the merge
  (``snapshot_merge`` refuses duplicate keys by design).
* ``delete_col`` (optional boolean): rows flagged deleted become
  delete-WITHOUT-replacement keys, folded into the SAME equality-delete
  item as the upserts' keys — one atomic commit nets the whole batch,
  and CDC readers see delete(old) [+ insert(new) for replacements].

Scale shape: per micro-batch, one O(batch) file write + one O(batch)
key-fileset write + an O(delta) manifest commit — independent of table
size; the deferred cost lands at read (one bounded anti-join) until
``snapshot_compact`` applies the accumulated deletes, which is the
steady-state maintenance loop this format already runs for small files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from agf_data_ingestion_spark.operators.locking import table_lock
from agf_data_ingestion_spark.sources.snapshots import (
    NoSuchVersionError,
    _manifest_op,
    _snap_path,
    current_version,
    snapshot_merge,
)

_OP_PREFIX = "cdc_upsert@"


def _parse_op(op: str | None) -> tuple[str, int] | None:
    if not op or not op.startswith(_OP_PREFIX):
        return None
    tail = op[len(_OP_PREFIX):]
    if "#" in tail:
        sid, bid = tail.rsplit("#", 1)
        return sid, int(bid)
    return "", int(tail)


def _hwm_path(table: str) -> str:
    return os.path.join(_snap_path(table), "upsert_hwm.json")


def _hwm_entry(table: str, stream_id: str) -> tuple[int, int]:
    """(max-applied-batch-id, its commit version) for ``stream_id`` —
    (-1, 0) if none.  Pre-r8 HWM files stored the bare batch id; those
    read back with version 0, which simply disables the scan bound."""
    try:
        with open(_hwm_path(table)) as fh:
            v = json.load(fh).get(stream_id, -1)
    except FileNotFoundError:
        return (-1, 0)
    if isinstance(v, list):
        return (int(v[0]), int(v[1]))
    return (int(v), 0)


def upsert_batch_hwm(table: str, stream_id: str = "") -> int:
    """The durable max-applied-batch-id for ``stream_id`` (-1 if none)."""
    return _hwm_entry(table, stream_id)[0]


def _record_hwm(table: str, stream_id: str, batch_id: int, version: int) -> None:
    p = _hwm_path(table)
    try:
        with open(p) as fh:
            hwm = json.load(fh)
    except FileNotFoundError:
        hwm = {}
    prev = hwm.get(stream_id, -1)
    if batch_id <= (int(prev[0]) if isinstance(prev, list) else int(prev)):
        return
    hwm[stream_id] = [batch_id, version]
    os.makedirs(_snap_path(table), exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as fh:
        json.dump(hwm, fh)
    os.replace(tmp, p)


def upsert_applied_batch_ids(
    table: str, stream_id: str | None = None, *, stop_at: int = 0
) -> set[int]:
    """Batch ids already merged, read off retained commit op labels
    (O(retained versions) tiny reads — ``_manifest_op`` never resolves
    file lists).  Not a sufficient replay guard alone — expiry can drop
    the commit — which is why :func:`cdc_upsert_batch` also consults the
    durable HWM.  ``stop_at`` bounds the scan to versions STRICTLY above
    it: per-stream batch ids are monotone, so any commit at or below the
    HWM's own commit version carries a batch id the HWM check already
    rejects (ADVICE r7: the unbounded scan was O(n) per micro-batch)."""
    out = set()
    for v in range(current_version(table), max(stop_at, 0), -1):
        try:
            parsed = _parse_op(_manifest_op(table, v))
        except NoSuchVersionError:
            continue
        if parsed is not None and (stream_id is None or parsed[0] == stream_id):
            out.add(parsed[1])
    return out


def net_last_change_per_key(
    batch: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Last change per key wins (batch-sized window, never the table); a
    unique key column breaks exact order ties.  Extracted from
    ``cdc_upsert_batch`` for the structural sweep (plan_registry, r12)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(k) for k in keys]
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )


def cdc_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    table: str,
    keys: list[str],
    *,
    stream_id: str = "",
    order_col: str | None = None,
    delete_col: str | None = None,
) -> int | None:
    """The ``foreachBatch`` body: net one change micro-batch and merge it
    exactly once with zero target reads.  Returns the committed version,
    or None for a replayed batch (crash between sink commit and offset
    commit).  The lock serializes only this sink's check-then-commit
    against its own replays; other writers compose through snapshot OCC.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    with table_lock(table):
        hwm_batch, hwm_version = _hwm_entry(table, stream_id)
        if batch_id <= hwm_batch or batch_id in (
            upsert_applied_batch_ids(table, stream_id, stop_at=hwm_version)
        ):
            return None
        batch = batch_df.localCheckpoint(eager=True)
        if order_col is not None:
            batch = net_last_change_per_key(batch, keys, order_col)
        dels = None
        if delete_col is not None:
            flag = F.coalesce(F.col(delete_col), F.lit(False))
            dels = batch.filter(flag).select(*keys)
            batch = batch.filter(~flag).drop(delete_col)
        label = f"{stream_id}#{batch_id}" if stream_id else str(batch_id)
        v = snapshot_merge(
            batch,
            table,
            list(keys),
            mode="eq",
            op=f"{_OP_PREFIX}{label}",
            delete_keys=dels,
        )
        _record_hwm(table, stream_id, batch_id, v)
        return v


def start_cdc_upsert_stream(
    changes: DataFrame,
    table: str,
    checkpoint_dir: str,
    keys: list[str],
    *,
    order_col: str | None = None,
    delete_col: str | None = None,
    available_now: bool = False,
    processing_time: str = "1 seconds",
) -> StreamingQuery:
    """Start the continuous CDC upsert over a streaming change frame.
    ``available_now=True`` drains what is available and stops (backfill
    twin); the checkpoint location is the stream identity for replay
    bookmarks."""
    sid = os.path.abspath(checkpoint_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cdc_upsert_batch(
            batch_df,
            batch_id,
            table,
            keys,
            stream_id=sid,
            order_col=order_col,
            delete_col=delete_col,
        )

    writer = changes.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
