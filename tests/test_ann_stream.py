"""Streaming ANN index maintenance (streaming/ann_stream.py): the
streamed index is bit-identical to a batch rebuild, replayed micro-
batches are no-ops (exactly-once via the commit-op bookmark), and
search over the streamed index matches the batch twin exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.ann_index import (
    ann_index_create,
    ann_index_search,
)
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    snapshot_history,
    snapshot_read,
)
from agf_data_ingestion_spark.streaming.ann_stream import (
    ann_applied_batch_ids,
    ann_apply_batch,
    start_ann_index_stream,
)

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(
        (int(r.vec_id), int(r.cell), tuple(int(c) for c in r.code))
        for r in df.collect()
    )


def _seed_feed(spark, tmp_path, split=300):
    """Train+create the index on vec_id < split; stage the rest as three
    parquet files for the file-source stream (one micro-batch each)."""
    v = _vectors(spark)
    seed = v.filter(F.col("vec_id") < split)
    table = str(tmp_path / "idx")
    ann_index_create(seed, table, cluster_files=4)

    feed = str(tmp_path / "feed")
    rest = v.filter(F.col("vec_id") >= split)
    hi = rest.agg(F.max("vec_id")).collect()[0][0]
    step = (int(hi) + 1 - split) // 3 + 1
    for i in range(3):
        lo, up = split + i * step, split + (i + 1) * step
        rest.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < up)
        ).coalesce(1).write.mode("append").parquet(feed)
    return v, seed, table, feed


def test_stream_equals_batch_rebuild(spark, tmp_path):
    v, seed, table, feed = _seed_feed(spark, tmp_path)

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = start_ann_index_stream(
        stream,
        table,
        str(tmp_path / "ckpt"),
        available_now=True,
        cluster_files=4,
    )
    q.awaitTermination(120)

    # same frozen state → the streamed table is bit-identical to a
    # from-scratch encode of the union corpus
    from agf_data_ingestion_spark.operators.ann_index import load_state

    full = str(tmp_path / "full")
    ann_index_create(v, full, state=load_state(table), cluster_files=4)
    assert _rows(snapshot_read(spark, table)) == _rows(snapshot_read(spark, full))

    # every micro-batch committed with its bookmark; maxFilesPerTrigger=1
    # over 3 files → 3 labeled commits
    assert len(ann_applied_batch_ids(table)) == 3

    # search agrees exactly (int64 ADC scores)
    queries = v.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r_stream = sorted(map(tuple, ann_index_search(spark, table, queries, k=3).collect()))
    r_full = sorted(map(tuple, ann_index_search(spark, full, queries, k=3).collect()))
    assert r_stream == r_full and len(r_stream) == 9


def test_replayed_batch_is_noop(spark, tmp_path):
    """Crash between sink commit and offset commit re-delivers the same
    batch id — the bookmark in the commit history absorbs it."""
    v, seed, table, feed = _seed_feed(spark, tmp_path)
    batch = spark.read.parquet(feed)

    v1 = ann_apply_batch(batch, 0, table, cluster_files=4)
    assert v1 == current_version(table)
    n = snapshot_read(spark, table).count()

    # replay: same batch id → no new commit, no new rows
    assert ann_apply_batch(batch, 0, table, cluster_files=4) is None
    assert current_version(table) == v1
    assert snapshot_read(spark, table).count() == n

    # a NEW batch id still commits
    v2 = ann_apply_batch(batch.limit(0), 1, table, cluster_files=4)
    assert v2 == v1 + 1
    assert ann_applied_batch_ids(table) == {0, 1}


def test_replay_survives_snapshot_expiry(spark, tmp_path):
    """The ADVICE-flagged hole: if expire_snapshots (small keep_last)
    drops the ann_append commit from retained history between a sink
    commit and a crash-restart replay — while other writers advance the
    table — the history bookmark is gone.  The durable HWM written
    alongside the codebook state must still make the replay a no-op."""
    from agf_data_ingestion_spark.operators.ann_index import ann_index_append
    from agf_data_ingestion_spark.sources.snapshots import expire_snapshots
    from agf_data_ingestion_spark.streaming.ann_stream import ann_batch_hwm

    v, seed, table, feed = _seed_feed(spark, tmp_path)
    batch = spark.read.parquet(feed)

    assert ann_apply_batch(batch, 0, table, cluster_files=4) is not None
    assert ann_batch_hwm(table) == 0
    n = snapshot_read(spark, table).count()

    # other (unlabeled) writers advance the table, then aggressive
    # expiry rolls the labeled commit out of retained history
    for _ in range(3):
        ann_index_append(batch.limit(0), table, cluster_files=4)
    expire_snapshots(table, keep_last=1, orphan_grace_s=0.0)
    assert ann_applied_batch_ids(table) == set()  # history bookmark gone

    # the crash-restart replay of batch 0 is STILL a no-op
    assert ann_apply_batch(batch, 0, table, cluster_files=4) is None
    assert snapshot_read(spark, table).count() == n

    # a fresh checkpoint dir (new stream identity) restarting at batch 0
    # is NOT deduped against the old stream's HWM
    assert (
        ann_apply_batch(batch.limit(0), 0, table, cluster_files=4, stream_id="s2")
        is not None
    )


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop after the first micro-batch; a restarted query (same
    checkpoint) drains only the remainder — no duplicate folds."""
    v, seed, table, feed = _seed_feed(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )

    seen = []
    # the crashing maintainer must use the SAME stream identity the real
    # restart will derive from the checkpoint dir — a mismatched id would
    # model a different (fresh-checkpoint) scenario and hide a double-fold
    import os as _os

    sid = _os.path.abspath(ckpt)

    def _one(batch_df, batch_id):
        ann_apply_batch(batch_df, batch_id, table, cluster_files=4, stream_id=sid)
        seen.append(batch_id)
        if batch_id >= 1:
            # crash BETWEEN the sink commit and the offset commit: the
            # restart will RE-DELIVER this batch id — the exactly-once
            # window the HWM/commit-op bookmarks exist for
            raise RuntimeError("injected crash")

    q = stream.writeStream.foreachBatch(_one).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # the injected crash surfaces as a query exception

    # restart with the real maintainer drains the rest
    q2 = start_ann_index_stream(
        (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        ),
        table,
        ckpt,
        available_now=True,
        cluster_files=4,
    )
    q2.awaitTermination(120)

    from agf_data_ingestion_spark.operators.ann_index import load_state

    full = str(tmp_path / "full")
    ann_index_create(v, full, state=load_state(table), cluster_files=4)
    assert _rows(snapshot_read(spark, table)) == _rows(snapshot_read(spark, full))
    # history shows one commit per distinct micro-batch, none duplicated
    ids = [
        h["op"]
        for h in snapshot_history(table)
        if (h.get("op") or "").startswith("ann_append@")
    ]
    assert len(ids) == len(set(ids)) == 3
