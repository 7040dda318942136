"""Continuous ANN index maintenance (OP-X-ANNINC × OP-STRM-*): a
Structured Streaming vector feed folds into the persisted IVF-PQ index
(operators/ann_index.py) one micro-batch at a time.

Because appends under the frozen codebook state are a pure fold (the
table after any append sequence is bit-identical to a from-scratch
encode of the union corpus — tests/test_ann_index.py), streaming
maintenance is just ``foreachBatch`` → :func:`ann_index_append`, and the
only real problem is exactly-once.  Two complementary bookmarks solve it:

* the micro-batch id is recorded AS the snapshot commit operation label
  (``ann_append@[<stream>#]<batch_id>``), so the replay bookmark and the
  data move in ONE atomic manifest swap — no side table, no dedup keys,
  no idempotent-write assumptions about the vector payload;
* a durable per-stream **high-water mark** file next to the codebook
  state (``<table>.index_state/batch_hwm.json``, atomic tmp+replace) is
  advanced right after each commit.  The commit-history bookmark alone
  is only as durable as snapshot retention: if ``expire_snapshots`` with
  a small ``keep_last`` runs between a sink commit and a crash-restart
  replay while other writers advance the table, the replayed batch id is
  no longer in history and the batch would fold twice.  The HWM survives
  expiry, and the history check covers the microsecond window between a
  commit and its HWM write.  Batch ids are monotone per checkpoint, so
  ``batch_id <= hwm`` is exact; the HWM is keyed by a stream identity
  (the checkpoint location) so a FRESH checkpoint dir — whose batch ids
  restart at 0 — is a new stream, never deduped against an old one.

Scale shape: each micro-batch costs O(batch) encode (one map-only Arrow
pass; codebooks ride in the closure) + O(delta) manifest commit (segment
manifests since r5), independent of index size — the index can absorb a
continuous 1e9-vector/day feed without retraining or rewrites, and
readers (``ann_index_search``) see atomic index versions throughout.
The reference has no ANN surface; this is part of the 100 TB extension
(SURVEY §2.9).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from agf_data_ingestion_spark.operators.ann_index import _state_dir, ann_index_append
from agf_data_ingestion_spark.operators.locking import table_lock
from agf_data_ingestion_spark.sources.snapshots import (
    NoSuchVersionError,
    _manifest_op,
    current_version,
)

_OP_PREFIX = "ann_append@"


def _parse_op(op: str | None) -> tuple[str, int] | None:
    """(stream_id, batch_id) from an ``ann_append@`` commit label, or None.
    Legacy / default-stream labels (``ann_append@<id>``) parse with the
    empty stream id."""
    if not op or not op.startswith(_OP_PREFIX):
        return None
    tail = op[len(_OP_PREFIX):]
    if "#" in tail:
        sid, bid = tail.rsplit("#", 1)
        return sid, int(bid)
    return "", int(tail)


def _hwm_path(table: str) -> str:
    return os.path.join(_state_dir(table), "batch_hwm.json")


def ann_batch_hwm(table: str, stream_id: str = "") -> int:
    """The durable max-applied-batch-id for ``stream_id`` (-1 if none) —
    the bookmark that survives ``expire_snapshots`` dropping the commit
    from retained history."""
    try:
        with open(_hwm_path(table)) as fh:
            return int(json.load(fh).get(stream_id, -1))
    except FileNotFoundError:
        return -1


def _record_hwm(table: str, stream_id: str, batch_id: int) -> None:
    """Advance the HWM monotonically (tmp + os.replace — the statestore
    pointer discipline; the file is a tiny {stream: id} map).  Called
    under the maintainer's table lock, right after the snapshot commit."""
    p = _hwm_path(table)
    try:
        with open(p) as fh:
            hwm = json.load(fh)
    except FileNotFoundError:
        hwm = {}
    if batch_id <= int(hwm.get(stream_id, -1)):
        return
    hwm[stream_id] = batch_id
    os.makedirs(_state_dir(table), exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as fh:
        json.dump(hwm, fh)
    os.replace(tmp, p)


def ann_applied_batch_ids(table: str, stream_id: str | None = None) -> set[int]:
    """Micro-batch ids already folded into the index — read straight off
    the retained commit history (the bookmark IS the commit op label).
    ``stream_id=None`` returns ids across ALL streams; a specific id
    scopes to that stream (legacy unscoped labels count as stream "").
    History length is bounded by snapshot retention (expire_snapshots) —
    which is exactly why :func:`ann_apply_batch` ALSO consults the
    durable HWM; this set alone is not a sufficient replay guard.
    The scan reads only each retained manifest's op label
    (``_manifest_op`` — no file-list resolution), so the per-batch cost
    stays O(retained versions), not O(versions × files)."""
    out = set()
    for v in range(current_version(table), 0, -1):
        try:
            parsed = _parse_op(_manifest_op(table, v))
        except NoSuchVersionError:
            continue  # expired hole; tagged versions may survive below
        if parsed is not None and (stream_id is None or parsed[0] == stream_id):
            out.add(parsed[1])
    return out


def ann_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table: str,
    *,
    cluster_files: int | None = None,
    stream_id: str = "",
) -> int | None:
    """The ``foreachBatch`` body: fold one (vec_id, embedding) micro-batch
    into the index exactly once.  Returns the committed version, or None
    when ``batch_id`` was already applied (a replayed batch after a crash
    between sink commit and offset commit).

    Replay detection = durable HWM (survives snapshot expiry) OR commit
    history (covers a crash in the microsecond window between the commit
    and its HWM write).  The lock serializes ONLY this maintainer's
    check-then-commit against its own replays/competing maintainers on
    the same table; unlabeled concurrent ``ann_index_append`` writers
    still compose lock-free through the snapshot OCC."""
    with table_lock(table):
        if batch_id <= ann_batch_hwm(table, stream_id) or batch_id in (
            ann_applied_batch_ids(table, stream_id)
        ):
            return None
        # pin the micro-batch before the multi-action write path
        # (repartitionByRange samples; the source frame is one-shot)
        batch_df = batch_df.localCheckpoint(eager=True)
        label = f"{stream_id}#{batch_id}" if stream_id else str(batch_id)
        v = ann_index_append(
            batch_df,
            table,
            cluster_files=cluster_files,
            op=f"{_OP_PREFIX}{label}",
        )
        _record_hwm(table, stream_id, batch_id)
        return v


def start_ann_index_stream(
    vectors: DataFrame,
    table: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
    processing_time: str = "1 seconds",
    cluster_files: int | None = None,
) -> StreamingQuery:
    """Start continuous index maintenance over a streaming (vec_id,
    embedding) frame.  ``available_now=True`` drains what is currently
    available and stops (backfill twin); otherwise the query tails the
    feed at ``processing_time`` cadence.  The index table must already
    exist (``ann_index_create`` trains and commits v1) — maintenance
    never retrains.  The checkpoint location IS the stream identity for
    replay bookmarks: restarting on the same checkpoint dedups, a fresh
    checkpoint dir (batch ids restart at 0) is a new stream."""
    sid = os.path.abspath(checkpoint_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ann_apply_batch(
            batch_df, batch_id, table, cluster_files=cluster_files, stream_id=sid
        )

    writer = vectors.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
