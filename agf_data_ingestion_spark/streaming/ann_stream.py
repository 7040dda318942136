"""Continuous ANN index maintenance (OP-X-ANNINC × OP-STRM-*): a
Structured Streaming vector feed folds into the persisted IVF-PQ index
(operators/ann_index.py) one micro-batch at a time.

Because appends under the frozen codebook state are a pure fold (the
table after any append sequence is bit-identical to a from-scratch
encode of the union corpus — tests/test_ann_index.py), streaming
maintenance is just ``foreachBatch`` → :func:`ann_index_append`, and the
only real problem is exactly-once.  That is solved the mv way
(operators/mv.py): the micro-batch id is recorded AS the snapshot commit
operation label (``ann_append@<batch_id>``), so the replay bookmark and
the data move in ONE atomic manifest swap.  A crash between the sink
commit and the streaming offset commit re-delivers the same batch id;
the maintainer sees it in the table history and makes the replay a
no-op.  No side table, no dedup keys, no idempotent-write assumptions
about the vector payload.

Scale shape: each micro-batch costs O(batch) encode (one map-only Arrow
pass; codebooks ride in the closure) + O(delta) manifest commit (segment
manifests since r5), independent of index size — the index can absorb a
continuous 1e9-vector/day feed without retraining or rewrites, and
readers (``ann_index_search``) see atomic index versions throughout.
The reference has no ANN surface; this is part of the 100 TB extension
(SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from agf_data_ingestion_spark.operators.ann_index import ann_index_append
from agf_data_ingestion_spark.operators.locking import table_lock
from agf_data_ingestion_spark.sources.snapshots import snapshot_history

_OP_PREFIX = "ann_append@"


def ann_applied_batch_ids(table: str) -> set[int]:
    """Micro-batch ids already folded into the index — read straight off
    the retained commit history (the bookmark IS the commit op label).
    History length is bounded by snapshot retention (expire_snapshots),
    which also bounds how far back a streaming checkpoint may be rolled;
    a checkpoint older than retention must restart from a fresh
    checkpoint dir anyway (its offsets are gone)."""
    return {
        int(h["op"][len(_OP_PREFIX):])
        for h in snapshot_history(table)
        if (h.get("op") or "").startswith(_OP_PREFIX)
    }


def ann_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table: str,
    *,
    cluster_files: int | None = None,
) -> int | None:
    """The ``foreachBatch`` body: fold one (vec_id, embedding) micro-batch
    into the index exactly once.  Returns the committed version, or None
    when ``batch_id`` was already applied (a replayed batch after a crash
    between sink commit and offset commit).

    The lock serializes ONLY this maintainer's check-then-commit against
    its own replays/competing maintainers on the same table; unlabeled
    concurrent ``ann_index_append`` writers still compose lock-free
    through the snapshot OCC."""
    with table_lock(table):
        if batch_id in ann_applied_batch_ids(table):
            return None
        # pin the micro-batch before the multi-action write path
        # (repartitionByRange samples; the source frame is one-shot)
        batch_df = batch_df.localCheckpoint(eager=True)
        return ann_index_append(
            batch_df,
            table,
            cluster_files=cluster_files,
            op=f"{_OP_PREFIX}{batch_id}",
        )


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
    never retrains."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ann_apply_batch(batch_df, batch_id, table, cluster_files=cluster_files)

    writer = vectors.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
