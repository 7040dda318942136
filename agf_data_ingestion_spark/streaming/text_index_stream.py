"""Continuous BM25 index maintenance: a document stream folds into the
persisted inverted index (operators/text_index.py) one atomic two-table
commit per micro-batch — searches see each batch's postings AND stats
together or not at all, and the index after any run ≡ a from-scratch
build of the union corpus (the operator invariant, extended here across
restarts).

Exactly-once on top of at-least-once foreachBatch (the upsert_stream
bookmark pattern): the batch id rides IN the commit op label
(``tidx_append:<stream>#<batch>`` — no separate pointer race), a replayed
batch is rejected by (1) the durable HWM file under the index root and
(2) the retained-op-label scan bounded to versions above the HWM's own
commit (per-stream batch ids are monotone, so the scan is O(new
versions), never O(history)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from agf_data_ingestion_spark.operators.text_index import (
    _postings_tbl,
    text_index_append,
)
from agf_data_ingestion_spark.sources.snapshots import (
    NoSuchVersionError,
    _manifest_op,
    _snap_path,
    current_version,
)

_OP_PREFIX = "tidx_append:"


def _parse_op(op: str | None):
    if not op or not op.startswith(_OP_PREFIX):
        return None
    tail = op[len(_OP_PREFIX):]
    if "#" not in tail:
        return None
    sid, bid = tail.rsplit("#", 1)
    return sid, int(bid)


def _hwm_path(root: str) -> str:
    return os.path.join(_snap_path(_postings_tbl(root)), "tidx_hwm.json")


def _hwm_entry(root: str, stream_id: str) -> tuple[int, int]:
    try:
        with open(_hwm_path(root)) as fh:
            v = json.load(fh).get(stream_id, [-1, 0])
    except FileNotFoundError:
        return (-1, 0)
    return (int(v[0]), int(v[1]))


def _record_hwm(root: str, stream_id: str, batch_id: int, version: int) -> None:
    p = _hwm_path(root)
    try:
        with open(p) as fh:
            hwm = json.load(fh)
    except FileNotFoundError:
        hwm = {}
    if batch_id <= int(hwm.get(stream_id, [-1, 0])[0]):
        return
    hwm[stream_id] = [batch_id, version]
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as fh:
        json.dump(hwm, fh)
    os.replace(tmp, p)


def tidx_applied_batch_ids(
    root: str, stream_id: str, *, stop_at: int = 0
) -> set[int]:
    """Batch ids already committed, read off retained postings op labels
    above ``stop_at`` — the post-expiry fallback is the durable HWM."""
    tbl = _postings_tbl(root)
    out = set()
    for v in range(current_version(tbl), max(stop_at, 0), -1):
        try:
            parsed = _parse_op(_manifest_op(tbl, v))
        except NoSuchVersionError:
            continue
        if parsed is not None and parsed[0] == stream_id:
            out.add(parsed[1])
    return out


def text_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    *,
    stream_id: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict | None:
    """Fold one micro-batch into the index exactly once; None when the
    batch id was already applied (checkpoint replay after a crash)."""
    hwm, hwm_v = _hwm_entry(root, stream_id)
    if batch_id <= hwm:
        return None
    if batch_id in tidx_applied_batch_ids(root, stream_id, stop_at=hwm_v):
        # committed but the HWM write crashed: repair it, apply nothing
        _record_hwm(root, stream_id, batch_id, current_version(_postings_tbl(root)))
        return None
    res = text_index_append(
        batch_df,
        root,
        text_col=text_col,
        id_col=id_col,
        op=f"{_OP_PREFIX}{stream_id}#{batch_id}",
    )
    _record_hwm(root, stream_id, batch_id, res[_postings_tbl(root)])
    return res


def start_text_index_stream(
    stream: DataFrame,
    root: str,
    checkpoint: str,
    *,
    stream_id: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
):
    """Attach continuous index maintenance to a document stream."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        text_index_batch(
            batch,
            batch_id,
            root,
            stream_id=stream_id,
            text_col=text_col,
            id_col=id_col,
        )

    writer = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
