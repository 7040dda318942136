"""Continuous curation: a document stream folds into a published
release through ``curate_incremental`` (operators/curation.py) — one
ten-table txn per micro-batch, so a trainer tailing the release sees
each batch's shards, lineage, index delta, probe-store delta, and
funnel rows together or not at all.

Exactly-once on top of at-least-once foreachBatch (the
upsert_stream/text_index_stream bookmark pattern): the (stream, batch)
identity rides IN the commit op label
(``curate_inc:<stream>#<batch>:<seed>:<budget>`` — the marker and the
data move in ONE atomic txn, no separate pointer race); a replayed
batch is rejected by (1) the durable HWM file under the shards table
and (2) the retained-op-label scan bounded to versions above the HWM's
own commit (per-stream batch ids are monotone, so the scan is O(new
versions), never O(history)).

An input batch that gates down to ZERO surviving documents still
commits (empty ten-table appends carrying the op label) — the label
trail is what makes the replay decision durable; skipping the commit
would re-gate the batch on every replay.  A batch that arrives EMPTY
is skipped outright (its replay is empty by checkpoint determinism)
with only the HWM advanced.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from agf_data_ingestion_spark.sources.snapshots import (
    NoSuchVersionError,
    _manifest_op,
    _snap_path,
    current_version,
)

_OP_PREFIX = "curate_inc:"


def _shards_tbl(out_root: str) -> str:
    return os.path.join(out_root, "shards")


def _parse_op(op: str | None):
    """``curate_inc:<stream>#<batch>:<seed>:<budget>`` → (stream, batch)."""
    if not op or not op.startswith(_OP_PREFIX):
        return None
    label = op[len(_OP_PREFIX):].rsplit(":", 2)[0]
    if "#" not in label:
        return None
    sid, bid = label.rsplit("#", 1)
    try:
        return sid, int(bid)
    except ValueError:
        return None


def _hwm_path(out_root: str) -> str:
    return os.path.join(_snap_path(_shards_tbl(out_root)), "curate_hwm.json")


def _hwm_entry(out_root: str, stream_id: str) -> tuple[int, int]:
    try:
        with open(_hwm_path(out_root)) as fh:
            v = json.load(fh).get(stream_id, [-1, 0])
    except FileNotFoundError:
        return (-1, 0)
    return (int(v[0]), int(v[1]))


def _record_hwm(
    out_root: str, stream_id: str, batch_id: int, version: int
) -> None:
    p = _hwm_path(out_root)
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


def curate_applied_batch_ids(
    out_root: str, stream_id: str, *, stop_at: int = 0
) -> set[int]:
    """Batch ids already committed, read off retained shards op labels
    above ``stop_at`` — the post-expiry fallback is the durable HWM."""
    tbl = _shards_tbl(out_root)
    out = set()
    for v in range(current_version(tbl), max(stop_at, 0), -1):
        try:
            parsed = _parse_op(_manifest_op(tbl, v))
        except NoSuchVersionError:
            continue
        if parsed is not None and parsed[0] == stream_id:
            out.add(parsed[1])
    return out


def curate_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_root: str,
    *,
    stream_id: str = "",
    seed: str = "0",
    budget_tokens: int = 2000,
) -> dict | None:
    """Gate-and-append one micro-batch exactly once; None when the batch
    id was already applied (checkpoint replay after a crash) or the
    input batch is empty."""
    from agf_data_ingestion_spark.operators.curation import curate_incremental

    hwm, hwm_v = _hwm_entry(out_root, stream_id)
    if batch_id <= hwm:
        return None
    if batch_id in curate_applied_batch_ids(out_root, stream_id, stop_at=hwm_v):
        # committed but the HWM write crashed: repair it, apply nothing
        _record_hwm(
            out_root, stream_id, batch_id, current_version(_shards_tbl(out_root))
        )
        return None
    if batch_df.isEmpty():
        _record_hwm(
            out_root, stream_id, batch_id, current_version(_shards_tbl(out_root))
        )
        return None
    rep = curate_incremental(
        batch_df.sparkSession,
        batch_df,
        out_root,
        batch_label=f"{stream_id}#{batch_id}",
        seed=seed,
        budget_tokens=budget_tokens,
    )
    _record_hwm(
        out_root, stream_id, batch_id, rep["txn"]["versions"][_shards_tbl(out_root)]
    )
    return rep


def start_curate_stream(
    stream: DataFrame,
    out_root: str,
    checkpoint: str,
    *,
    stream_id: str = "",
    seed: str = "0",
    budget_tokens: int = 2000,
    available_now: bool = False,
):
    """Attach continuous curation to a document stream (needs the
    documents-table column set: doc_id, text, lang, source, n_chars)."""
    sid = stream_id or os.path.abspath(checkpoint)

    def fn(batch: DataFrame, batch_id: int) -> None:
        curate_batch(
            batch,
            batch_id,
            out_root,
            stream_id=sid,
            seed=seed,
            budget_tokens=budget_tokens,
        )

    writer = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
